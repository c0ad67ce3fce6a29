package org.kgcn.tpu.knime.nodes.GCNScore;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GCNScore node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GCNScoreNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_output_csv = new SettingsModelString("output_csv", "");

    protected GCNScoreNodeModel() {
        super(1, 0);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Prediction Data File", inData[0]);
        String workDir = new java.io.File(in0).getParent();
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/gcn_score.py");
        cmd.add(("--prediction_data").replace("\"", ""));
        cmd.add(("" + in0 + "").replace("\"", ""));
        cmd.add(("--output").replace("\"", ""));
        cmd.add(("" + m_output_csv.getStringValue() + "").replace("\"", ""));
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {}, new String[] {});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(0);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {
        m_output_csv.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_output_csv.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_output_csv.validateSettings(settings);
    }
}
