package org.kgcn.tpu.knime.nodes.GCNDatasetSplitter;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GCNDatasetSplitter node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GCNDatasetSplitterNodeModel extends GCNTpuNodeModel {

    private final SettingsModelDouble m_ratio = new SettingsModelDouble("Ratio", 0.9);

    protected GCNDatasetSplitterNodeModel() {
        super(1, 2);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Dataset File", inData[0]);
        String workDir = new java.io.File(in0).getParent();
        String out0 = ("" + workDir + "/dataset_split1.jbl").replace("\"", "");
        String out1 = ("" + workDir + "/dataset_split2.jbl").replace("\"", "");
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/split_dataset.py");
        cmd.add(("--dataset").replace("\"", ""));
        cmd.add(("" + in0 + "").replace("\"", ""));
        cmd.add(("--ratio").replace("\"", ""));
        cmd.add(("" + m_ratio.getDoubleValue() + "").replace("\"", ""));
        cmd.add(("--output1").replace("\"", ""));
        cmd.add(("" + out0 + "").replace("\"", ""));
        cmd.add(("--output2").replace("\"", ""));
        cmd.add(("" + out1 + "").replace("\"", ""));
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"Dataset File", "Dataset File"}, new String[] {out0, out1});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(2);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {
        m_ratio.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_ratio.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_ratio.validateSettings(settings);
    }
}
