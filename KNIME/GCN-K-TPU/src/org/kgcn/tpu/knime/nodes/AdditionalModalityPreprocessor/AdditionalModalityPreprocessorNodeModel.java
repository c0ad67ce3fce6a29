package org.kgcn.tpu.knime.nodes.AdditionalModalityPreprocessor;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** AdditionalModalityPreprocessor node: see kgcn_tpu.knime.helpers for the Python contract. */
public class AdditionalModalityPreprocessorNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_modality = new SettingsModelString("Modality", "");
    private final SettingsModelString m_csv_file = new SettingsModelString("CSVFile", "");
    private final SettingsModelString m_work_dir = new SettingsModelString("WorkingDirectory", "");

    protected AdditionalModalityPreprocessorNodeModel() {
        super(0, 1);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String workDir = m_work_dir.getStringValue();
        String out0 = ("" + m_work_dir.getStringValue() + "/modality.jbl").replace("\"", "");
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/preprocess_modality.py");
        cmd.add(("--" + m_modality.getStringValue() + "").replace("\"", ""));
        cmd.add(("" + m_csv_file.getStringValue() + "").replace("\"", ""));
        cmd.add(("--output").replace("\"", ""));
        cmd.add(("" + out0 + "").replace("\"", ""));
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"Modality File"}, new String[] {out0});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(1);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {
        m_modality.saveSettingsTo(settings);
        m_csv_file.saveSettingsTo(settings);
        m_work_dir.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_modality.loadSettingsFrom(settings);
        m_csv_file.loadSettingsFrom(settings);
        m_work_dir.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_modality.validateSettings(settings);
        m_csv_file.validateSettings(settings);
        m_work_dir.validateSettings(settings);
    }
}
