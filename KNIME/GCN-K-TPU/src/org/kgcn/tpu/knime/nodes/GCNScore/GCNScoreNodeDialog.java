package org.kgcn.tpu.knime.nodes.GCNScore;

import org.knime.core.node.defaultnodesettings.*;

public class GCNScoreNodeDialog extends DefaultNodeSettingsPane {

    protected GCNScoreNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("output_csv", ""), "output_csv"));
    }
}
