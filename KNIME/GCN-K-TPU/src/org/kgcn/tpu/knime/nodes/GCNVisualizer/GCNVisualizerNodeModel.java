package org.kgcn.tpu.knime.nodes.GCNVisualizer;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GCNVisualizer node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GCNVisualizerNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_model_py = new SettingsModelString("model.py", "sample_chem.singletask.solubility.model");
    private final SettingsModelBoolean m_with_feature = new SettingsModelBoolean("With Feature", true);
    private final SettingsModelBoolean m_with_node_embedding = new SettingsModelBoolean("With Node Embedding", false);
    private final SettingsModelInteger m_embedding_dim = new SettingsModelInteger("Embedding Dim", 10);
    private final SettingsModelBoolean m_normalize_adj_flag = new SettingsModelBoolean("Normalize Adj Flag", false);
    private final SettingsModelBoolean m_split_adj_flag = new SettingsModelBoolean("Split Adj Flag", false);
    private final SettingsModelInteger m_order = new SettingsModelInteger("Order", 1);

    protected GCNVisualizerNodeModel() {
        super(2, 1);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Model File", inData[0]);
        String in1 = getInPortFile("Dataset File", inData[1]);
        String workDir = new java.io.File(in0).getParent();
        String out0 = ("" + workDir + "/visualization").replace("\"", "");
        String cfgPath = workDir + "/visualize.json";
        java.io.PrintWriter pw = new java.io.PrintWriter(cfgPath);
        pw.println("{");
        pw.println("    \"model.py\" : " + "\"" + m_model_py.getStringValue() + "\"" + ",");
        pw.println("    \"load_model\" : " + "\"" + in0 + "\"" + ",");
        String clean1 = in1.replace(".jbl", "_clean.jbl");
        runClean(in1, clean1, workDir);
        pw.println("    \"dataset\" : " + "\"" + clean1 + "\"" + ",");
        pw.println("    \"with_feature\" : " + String.valueOf(m_with_feature.getBooleanValue()) + ",");
        pw.println("    \"with_node_embedding\" : " + String.valueOf(m_with_node_embedding.getBooleanValue()) + ",");
        pw.println("    \"embedding_dim\" : " + String.valueOf(m_embedding_dim.getIntValue()) + ",");
        pw.println("    \"normalize_adj_flag\" : " + String.valueOf(m_normalize_adj_flag.getBooleanValue()) + ",");
        pw.println("    \"split_adj_flag\" : " + String.valueOf(m_split_adj_flag.getBooleanValue()) + ",");
        pw.println("    \"order\" : " + String.valueOf(m_order.getIntValue()) + "");
        pw.println("}");
        pw.close();
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/gcn.py");
        cmd.add("visualize");
        cmd.add("--config");
        cmd.add(cfgPath);
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"IG Directory"}, new String[] {out0});
    }

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {
        checkEnvironment();
        return makeOutputSpecs(1);
    }

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {
        m_model_py.saveSettingsTo(settings);
        m_with_feature.saveSettingsTo(settings);
        m_with_node_embedding.saveSettingsTo(settings);
        m_embedding_dim.saveSettingsTo(settings);
        m_normalize_adj_flag.saveSettingsTo(settings);
        m_split_adj_flag.saveSettingsTo(settings);
        m_order.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_model_py.loadSettingsFrom(settings);
        m_with_feature.loadSettingsFrom(settings);
        m_with_node_embedding.loadSettingsFrom(settings);
        m_embedding_dim.loadSettingsFrom(settings);
        m_normalize_adj_flag.loadSettingsFrom(settings);
        m_split_adj_flag.loadSettingsFrom(settings);
        m_order.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_model_py.validateSettings(settings);
        m_with_feature.validateSettings(settings);
        m_with_node_embedding.validateSettings(settings);
        m_embedding_dim.validateSettings(settings);
        m_normalize_adj_flag.validateSettings(settings);
        m_split_adj_flag.validateSettings(settings);
        m_order.validateSettings(settings);
    }
}
