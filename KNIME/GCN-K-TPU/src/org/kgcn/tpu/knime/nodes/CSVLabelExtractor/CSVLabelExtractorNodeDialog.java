package org.kgcn.tpu.knime.nodes.CSVLabelExtractor;

import org.knime.core.node.defaultnodesettings.*;

public class CSVLabelExtractorNodeDialog extends DefaultNodeSettingsPane {

    protected CSVLabelExtractorNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("csv_file", ""), "csv_file"));
        addDialogComponent(new DialogComponentString(new SettingsModelString("work_dir", ""), "work_dir"));
    }
}
