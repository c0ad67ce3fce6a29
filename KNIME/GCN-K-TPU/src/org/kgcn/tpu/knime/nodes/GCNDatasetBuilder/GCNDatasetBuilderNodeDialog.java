package org.kgcn.tpu.knime.nodes.GCNDatasetBuilder;

import org.knime.core.node.defaultnodesettings.*;

public class GCNDatasetBuilderNodeDialog extends DefaultNodeSettingsPane {

    protected GCNDatasetBuilderNodeDialog() {
        super();
        // no settings
    }
}
