package org.kgcn.tpu.knime.nodes.AtomFeatureExtractor;

import org.knime.core.node.defaultnodesettings.*;

public class AtomFeatureExtractorNodeDialog extends DefaultNodeSettingsPane {

    protected AtomFeatureExtractorNodeDialog() {
        super();
        // no settings
    }
}
