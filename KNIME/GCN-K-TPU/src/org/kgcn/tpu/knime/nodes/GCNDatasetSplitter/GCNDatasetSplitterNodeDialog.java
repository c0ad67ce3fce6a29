package org.kgcn.tpu.knime.nodes.GCNDatasetSplitter;

import org.knime.core.node.defaultnodesettings.*;

public class GCNDatasetSplitterNodeDialog extends DefaultNodeSettingsPane {

    protected GCNDatasetSplitterNodeDialog() {
        super();
        addDialogComponent(new DialogComponentNumber(new SettingsModelDouble("ratio", 0.9), "ratio", 1));
    }
}
