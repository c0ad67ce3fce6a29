package org.kgcn.tpu.knime.nodes.AdditionalModalityPreprocessor;

import org.knime.core.node.defaultnodesettings.*;

public class AdditionalModalityPreprocessorNodeDialog extends DefaultNodeSettingsPane {

    protected AdditionalModalityPreprocessorNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("modality", ""), "modality"));
        addDialogComponent(new DialogComponentString(new SettingsModelString("csv_file", ""), "csv_file"));
        addDialogComponent(new DialogComponentString(new SettingsModelString("work_dir", ""), "work_dir"));
    }
}
