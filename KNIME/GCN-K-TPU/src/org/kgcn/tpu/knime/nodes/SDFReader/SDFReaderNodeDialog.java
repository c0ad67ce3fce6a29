package org.kgcn.tpu.knime.nodes.SDFReader;

import org.knime.core.node.defaultnodesettings.*;

public class SDFReaderNodeDialog extends DefaultNodeSettingsPane {

    protected SDFReaderNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("sdf_file", ""), "sdf_file"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("atom_num_limit", 70), "atom_num_limit", 1));
        addDialogComponent(new DialogComponentString(new SettingsModelString("work_dir", ""), "work_dir"));
    }
}
