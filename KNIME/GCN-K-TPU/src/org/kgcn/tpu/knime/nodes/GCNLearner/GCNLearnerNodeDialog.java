package org.kgcn.tpu.knime.nodes.GCNLearner;

import org.knime.core.node.defaultnodesettings.*;

public class GCNLearnerNodeDialog extends DefaultNodeSettingsPane {

    protected GCNLearnerNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("model_py", "sample_chem.singletask.solubility.model"), "model_py"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelDouble("validation_data_rate", 0.3), "validation_data_rate", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("epoch", 50), "epoch", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("batch_size", 10), "batch_size", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("patience", 0), "patience", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelDouble("learning_rate", 0.3), "learning_rate", 1));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("shuffle_data", false), "shuffle_data"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("with_feature", true), "with_feature"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("with_node_embedding", false), "with_node_embedding"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("embedding_dim", 10), "embedding_dim", 1));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("normalize_adj_flag", false), "normalize_adj_flag"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("split_adj_flag", false), "split_adj_flag"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("order", 1), "order", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("save_interval", 10), "save_interval", 1));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("make_plot", false), "make_plot"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("profile", false), "profile"));
    }
}
