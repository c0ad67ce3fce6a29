package org.kgcn.tpu.knime.nodes.GCNDatasetBuilder;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GCNDatasetBuilder node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GCNDatasetBuilderNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_csv_file = new SettingsModelString("CSVFile", "");

    protected GCNDatasetBuilderNodeModel() {
        super(3, 1);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Label File", inData[0]);
        String in1 = getInPortFile("Adjacent File", inData[1]);
        String in2 = getInPortFile("Atom Feature File", inData[2]);
        String workDir = new java.io.File(in0).getParent();
        String out0 = ("" + workDir + "/dataset.jbl").replace("\"", "");
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/prep_dataset.py");
        cmd.add(("--label").replace("\"", ""));
        cmd.add(("" + in0 + "").replace("\"", ""));
        cmd.add(("--adjacent").replace("\"", ""));
        cmd.add(("" + in1 + "").replace("\"", ""));
        cmd.add(("--atom_feature").replace("\"", ""));
        cmd.add(("" + in2 + "").replace("\"", ""));
        cmd.add(("--output").replace("\"", ""));
        cmd.add(("" + out0 + "").replace("\"", ""));
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"Dataset File"}, new String[] {out0});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(1);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {
        m_csv_file.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_csv_file.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_csv_file.validateSettings(settings);
    }
}
