package org.kgcn.tpu.knime.nodes;

import java.io.File;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.List;

import org.knime.core.data.DataCell;
import org.knime.core.data.DataColumnSpec;
import org.knime.core.data.DataColumnSpecCreator;
import org.knime.core.data.DataRow;
import org.knime.core.data.DataTableSpec;
import org.knime.core.data.RowKey;
import org.knime.core.data.def.DefaultRow;
import org.knime.core.data.def.StringCell;
import org.knime.core.node.BufferedDataContainer;
import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.CanceledExecutionException;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.ExecutionMonitor;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeModel;

/** Shared base: file-path tables between nodes + subprocess plumbing
 *  (contract identical to the reference plugin's GCNNodeModel). */
public abstract class GCNTpuNodeModel extends NodeModel {

    protected GCNTpuNodeModel(int nrIn, int nrOut) {
        super(nrIn, nrOut);
    }

    protected String getInPortFile(final String key, BufferedDataTable table)
            throws Exception {
        int col = table.getDataTableSpec().findColumnIndex(key);
        for (DataRow row : table) {
            if (row.getKey().getString().equals("Files")) {
                return ((StringCell) row.getCell(col)).getStringValue();
            }
        }
        throw new InvalidSettingsException("no Files row with column " + key);
    }

    protected void checkEnvironment() {
        if (System.getenv("GCNK_PYTHON_PATH") == null)
            setWarningMessage("Set GCNK_PYTHON_PATH");
        if (System.getenv("GCNK_SOURCE_PATH") == null)
            setWarningMessage("Set GCNK_SOURCE_PATH");
    }

    protected void runCommand(List<String> cmd, String workDir)
            throws Exception {
        ProcessBuilder pb = new ProcessBuilder(cmd);
        pb.redirectErrorStream(true);
        Path log = Paths.get(workDir, getClass().getSimpleName() + ".log");
        pb.redirectOutput(log.toFile());
        pb.directory(new File(workDir));
        Process proc = pb.start();
        int rc = proc.waitFor();
        if (rc != 0)
            throw new IllegalStateException(
                "command failed (rc=" + rc + "), see " + log);
    }

    protected void runClean(String in, String out, String workDir)
            throws Exception {
        List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH")
                + "/KNIME/py/clean_dataset.py");
        cmd.add("--dataset"); cmd.add(in);
        cmd.add("--output"); cmd.add(out);
        runCommand(cmd, workDir);
    }

    protected DataTableSpec[] makeOutputSpecs(int n) {
        DataTableSpec[] specs = new DataTableSpec[n];
        for (int i = 0; i < n; i++)
            specs[i] = null;  // file columns are named per-execute
        return specs;
    }

    protected BufferedDataTable[] makeOutputTables(
            ExecutionContext exec, String[] portNames, String[] files) {
        BufferedDataTable[] out = new BufferedDataTable[portNames.length];
        for (int i = 0; i < portNames.length; i++) {
            DataColumnSpec col =
                new DataColumnSpecCreator(portNames[i], StringCell.TYPE)
                    .createSpec();
            BufferedDataContainer c =
                exec.createDataContainer(new DataTableSpec(col));
            c.addRowToTable(new DefaultRow(new RowKey("Files"),
                new DataCell[] { new StringCell(files[i]) }));
            c.close();
            out[i] = c.getTable();
        }
        return out;
    }

    @Override protected void reset() { }
    @Override protected void loadInternals(File d, ExecutionMonitor m)
        throws CanceledExecutionException { }
    @Override protected void saveInternals(File d, ExecutionMonitor m)
        throws CanceledExecutionException { }
}
