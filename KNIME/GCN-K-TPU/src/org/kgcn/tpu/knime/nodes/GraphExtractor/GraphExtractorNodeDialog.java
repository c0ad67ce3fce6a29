package org.kgcn.tpu.knime.nodes.GraphExtractor;

import org.knime.core.node.defaultnodesettings.*;

public class GraphExtractorNodeDialog extends DefaultNodeSettingsPane {

    protected GraphExtractorNodeDialog() {
        super();
        // no settings
    }
}
