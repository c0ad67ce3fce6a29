package org.kgcn.tpu.knime.nodes.GCNScoreViewer;

import org.knime.core.node.defaultnodesettings.*;

public class GCNScoreViewerNodeDialog extends DefaultNodeSettingsPane {

    protected GCNScoreViewerNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("output_dir", ""), "output_dir"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("plot_multitask", false), "plot_multitask"));
    }
}
