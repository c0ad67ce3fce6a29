package org.kgcn.tpu.knime.nodes.GCNDatasetBuilder;

import org.knime.core.node.defaultnodesettings.*;

public class GCNDatasetBuilderNodeDialog extends DefaultNodeSettingsPane {

    protected GCNDatasetBuilderNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("csv_file", ""), "csv_file"));
    }
}
