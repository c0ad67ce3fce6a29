package org.kgcn.tpu.knime.nodes.GCNGraphViewer;

import org.knime.core.node.defaultnodesettings.*;

public class GCNGraphViewerNodeDialog extends DefaultNodeSettingsPane {

    protected GCNGraphViewerNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("output_dir", ""), "output_dir"));
    }
}
