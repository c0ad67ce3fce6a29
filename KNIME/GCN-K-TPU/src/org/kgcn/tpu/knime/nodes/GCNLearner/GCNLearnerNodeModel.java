package org.kgcn.tpu.knime.nodes.GCNLearner;

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import org.kgcn.tpu.knime.nodes.GCNTpuNodeModel;

/** GCNLearner node: see kgcn_tpu.knime.helpers for the Python contract. */
public class GCNLearnerNodeModel extends GCNTpuNodeModel {

    private final SettingsModelString m_model_py = new SettingsModelString("model.py", "sample_chem.singletask.solubility.model");
    private final SettingsModelDouble m_validation_data_rate = new SettingsModelDouble("Validation Data Rate", 0.3);
    private final SettingsModelInteger m_epoch = new SettingsModelInteger("Epoch", 50);
    private final SettingsModelInteger m_batch_size = new SettingsModelInteger("Batch Size", 10);
    private final SettingsModelInteger m_patience = new SettingsModelInteger("Patience", 0);
    private final SettingsModelDouble m_learning_rate = new SettingsModelDouble("Learning Rate", 0.3);
    private final SettingsModelBoolean m_shuffle_data = new SettingsModelBoolean("Shuffle Data", false);
    private final SettingsModelBoolean m_with_feature = new SettingsModelBoolean("With Feature", true);
    private final SettingsModelBoolean m_with_node_embedding = new SettingsModelBoolean("With Node Embedding", false);
    private final SettingsModelInteger m_embedding_dim = new SettingsModelInteger("Embedding Dim", 10);
    private final SettingsModelBoolean m_normalize_adj_flag = new SettingsModelBoolean("Normalize Adj Flag", false);
    private final SettingsModelBoolean m_split_adj_flag = new SettingsModelBoolean("Split Adj Flag", false);
    private final SettingsModelInteger m_order = new SettingsModelInteger("Order", 1);
    private final SettingsModelInteger m_save_interval = new SettingsModelInteger("Save Interval", 10);
    private final SettingsModelBoolean m_make_plot = new SettingsModelBoolean("Make Plot", false);
    private final SettingsModelBoolean m_profile = new SettingsModelBoolean("Profile", false);

    protected GCNLearnerNodeModel() {
        super(1, 1);
    }

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {
        String in0 = getInPortFile("Dataset File", inData[0]);
        String workDir = new java.io.File(in0).getParent();
        String out0 = ("" + workDir + "/model.ckpt").replace("\"", "");
        String cfgPath = workDir + "/train.json";
        java.io.PrintWriter pw = new java.io.PrintWriter(cfgPath);
        pw.println("{");
        pw.println("    \"model.py\" : " + "\"" + m_model_py.getStringValue() + "\"" + ",");
        String clean0 = in0.replace(".jbl", "_clean.jbl");
        runClean(in0, clean0, workDir);
        pw.println("    \"dataset\" : " + "\"" + clean0 + "\"" + ",");
        pw.println("    \"validation_data_rate\" : " + String.valueOf(m_validation_data_rate.getDoubleValue()) + ",");
        pw.println("    \"epoch\" : " + String.valueOf(m_epoch.getIntValue()) + ",");
        pw.println("    \"batch_size\" : " + String.valueOf(m_batch_size.getIntValue()) + ",");
        pw.println("    \"learning_rate\" : " + String.valueOf(m_learning_rate.getDoubleValue()) + ",");
        pw.println("    \"with_feature\" : " + String.valueOf(m_with_feature.getBooleanValue()) + ",");
        pw.println("    \"with_node_embedding\" : " + String.valueOf(m_with_node_embedding.getBooleanValue()) + ",");
        pw.println("    \"embedding_dim\" : " + String.valueOf(m_embedding_dim.getIntValue()) + ",");
        pw.println("    \"normalize_adj_flag\" : " + String.valueOf(m_normalize_adj_flag.getBooleanValue()) + ",");
        pw.println("    \"split_adj_flag\" : " + String.valueOf(m_split_adj_flag.getBooleanValue()) + ",");
        pw.println("    \"order\" : " + String.valueOf(m_order.getIntValue()) + ",");
        pw.println("    \"patience\" : " + String.valueOf(m_patience.getIntValue()) + ",");
        pw.println("    \"shuffle_data\" : " + String.valueOf(m_shuffle_data.getBooleanValue()) + ",");
        pw.println("    \"save_interval\" : " + String.valueOf(m_save_interval.getIntValue()) + ",");
        pw.println("    \"make_plot\" : " + String.valueOf(m_make_plot.getBooleanValue()) + ",");
        pw.println("    \"profile\" : " + String.valueOf(m_profile.getBooleanValue()) + ",");
        pw.println("    \"save_model\" : " + "\"" + out0 + "\"" + "");
        pw.println("}");
        pw.close();
        java.util.List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH") + "/gcn.py");
        cmd.add("train");
        cmd.add("--config");
        cmd.add(cfgPath);
        runCommand(cmd, workDir);
        return makeOutputTables(exec, new String[] {"Model File"}, new String[] {out0});
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
        m_validation_data_rate.saveSettingsTo(settings);
        m_epoch.saveSettingsTo(settings);
        m_batch_size.saveSettingsTo(settings);
        m_patience.saveSettingsTo(settings);
        m_learning_rate.saveSettingsTo(settings);
        m_shuffle_data.saveSettingsTo(settings);
        m_with_feature.saveSettingsTo(settings);
        m_with_node_embedding.saveSettingsTo(settings);
        m_embedding_dim.saveSettingsTo(settings);
        m_normalize_adj_flag.saveSettingsTo(settings);
        m_split_adj_flag.saveSettingsTo(settings);
        m_order.saveSettingsTo(settings);
        m_save_interval.saveSettingsTo(settings);
        m_make_plot.saveSettingsTo(settings);
        m_profile.saveSettingsTo(settings);
    }

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_model_py.loadSettingsFrom(settings);
        m_validation_data_rate.loadSettingsFrom(settings);
        m_epoch.loadSettingsFrom(settings);
        m_batch_size.loadSettingsFrom(settings);
        m_patience.loadSettingsFrom(settings);
        m_learning_rate.loadSettingsFrom(settings);
        m_shuffle_data.loadSettingsFrom(settings);
        m_with_feature.loadSettingsFrom(settings);
        m_with_node_embedding.loadSettingsFrom(settings);
        m_embedding_dim.loadSettingsFrom(settings);
        m_normalize_adj_flag.loadSettingsFrom(settings);
        m_split_adj_flag.loadSettingsFrom(settings);
        m_order.loadSettingsFrom(settings);
        m_save_interval.loadSettingsFrom(settings);
        m_make_plot.loadSettingsFrom(settings);
        m_profile.loadSettingsFrom(settings);
    }

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {
        m_model_py.validateSettings(settings);
        m_validation_data_rate.validateSettings(settings);
        m_epoch.validateSettings(settings);
        m_batch_size.validateSettings(settings);
        m_patience.validateSettings(settings);
        m_learning_rate.validateSettings(settings);
        m_shuffle_data.validateSettings(settings);
        m_with_feature.validateSettings(settings);
        m_with_node_embedding.validateSettings(settings);
        m_embedding_dim.validateSettings(settings);
        m_normalize_adj_flag.validateSettings(settings);
        m_split_adj_flag.validateSettings(settings);
        m_order.validateSettings(settings);
        m_save_interval.validateSettings(settings);
        m_make_plot.validateSettings(settings);
        m_profile.validateSettings(settings);
    }
}
