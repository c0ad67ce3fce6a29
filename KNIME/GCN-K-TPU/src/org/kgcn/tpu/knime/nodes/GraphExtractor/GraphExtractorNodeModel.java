package org.kgcn.tpu.knime.nodes.GraphExtractor;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GraphExtractor node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GraphExtractorNodeModel extends GCNTpuNodeModel {



    protected GraphExtractorNodeModel() {
        super(1, 1);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Mol Info File", inData[0]);
        String workDir = new java.io.File(in0).getParent();
        String out0 = ("" + workDir + "/adjacent.jbl").replace("\"", "");
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/prep_adj.py");
        cmd.add(("--mol_info").replace("\"", ""));
        cmd.add(("" + in0 + "").replace("\"", ""));
        cmd.add(("--output").replace("\"", ""));
        cmd.add(("" + out0 + "").replace("\"", ""));
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"Adjacent File"}, new String[] {out0});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(1);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {

    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {

    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {

    }
}
