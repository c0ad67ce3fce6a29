package org.kgcn.tpu.knime.nodes.SDFReader;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** SDFReader node: see kgcn_tpu.knime.helpers for the Python contract. */
public class SDFReaderNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_sdf_file = new SettingsModelString("SDFFile", "");
    private final SettingsModelInteger m_atom_num_limit = new SettingsModelInteger("AtomNumLimit", 70);
    private final SettingsModelString m_work_dir = new SettingsModelString("WorkingDirectory", "");

    protected SDFReaderNodeModel() {
        super(0, 1);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String workDir = m_work_dir.getStringValue();
        String out0 = ("" + m_work_dir.getStringValue() + "/mol_info.jbl").replace("\"", "");
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/KNIME/py/prep_mol_info.py");
        cmd.add(("--sdf").replace("\"", ""));
        cmd.add(("" + m_sdf_file.getStringValue() + "").replace("\"", ""));
        cmd.add(("--atom_num_limit").replace("\"", ""));
        cmd.add(("" + m_atom_num_limit.getIntValue() + "").replace("\"", ""));
        cmd.add(("--output").replace("\"", ""));
        cmd.add(("" + out0 + "").replace("\"", ""));
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"Mol Info File"}, new String[] {out0});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(1);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {
        m_sdf_file.saveSettingsTo(settings);
        m_atom_num_limit.saveSettingsTo(settings);
        m_work_dir.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_sdf_file.loadSettingsFrom(settings);
        m_atom_num_limit.loadSettingsFrom(settings);
        m_work_dir.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_sdf_file.validateSettings(settings);
        m_atom_num_limit.validateSettings(settings);
        m_work_dir.validateSettings(settings);
    }
}
