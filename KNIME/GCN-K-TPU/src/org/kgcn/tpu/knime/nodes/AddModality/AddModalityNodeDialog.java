package org.kgcn.tpu.knime.nodes.AddModality;

import org.knime.core.node.defaultnodesettings.*;

public class AddModalityNodeDialog extends DefaultNodeSettingsPane {

    protected AddModalityNodeDialog() {
        super();
        // no settings
    }
}
