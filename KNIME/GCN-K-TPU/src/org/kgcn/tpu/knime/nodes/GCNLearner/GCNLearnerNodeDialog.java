package org.kgcn.tpu.knime.nodes.GCNLearner;

import org.knime.core.node.defaultnodesettings.*;

public class GCNLearnerNodeDialog extends DefaultNodeSettingsPane {

    protected GCNLearnerNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("model_py", "gcn"), "model_py"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelDouble("validation_data_rate", 0.2), "validation_data_rate", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("epoch", 50), "epoch", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("batch_size", 32), "batch_size", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelDouble("learning_rate", 0.01), "learning_rate", 1));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("with_feature", true), "with_feature"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("with_node_embedding", false), "with_node_embedding"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("embedding_dim", 10), "embedding_dim", 1));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("normalize_adj_flag", true), "normalize_adj_flag"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("split_adj_flag", false), "split_adj_flag"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("order", 1), "order", 1));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("patience", 0), "patience", 1));
    }
}
