package org.kgcn.tpu.knime.nodes.GCNScoreViewer;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GCNScoreViewer node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GCNScoreViewerNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_output_dir = new SettingsModelString("output_dir", "");
    private final SettingsModelBoolean m_plot_multitask = new SettingsModelBoolean("PlotMultitask", false);

    protected GCNScoreViewerNodeModel() {
        super(1, 0);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Prediction Data File", inData[0]);
        String workDir = new java.io.File(in0).getParent();
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/gcn_score_viewer.py");
        cmd.add(("--prediction_data").replace("\"", ""));
        cmd.add(("" + in0 + "").replace("\"", ""));
        cmd.add(("--output").replace("\"", ""));
        cmd.add(("" + m_output_dir.getStringValue() + "").replace("\"", ""));
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
        m_output_dir.saveSettingsTo(settings);
        m_plot_multitask.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_output_dir.loadSettingsFrom(settings);
        m_plot_multitask.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_output_dir.validateSettings(settings);
        m_plot_multitask.validateSettings(settings);
    }
}
