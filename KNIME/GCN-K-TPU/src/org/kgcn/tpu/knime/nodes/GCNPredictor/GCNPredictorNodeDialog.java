package org.kgcn.tpu.knime.nodes.GCNPredictor;

import org.knime.core.node.defaultnodesettings.*;

public class GCNPredictorNodeDialog extends DefaultNodeSettingsPane {

    protected GCNPredictorNodeDialog() {
        super();
        addDialogComponent(new DialogComponentString(new SettingsModelString("model_py", "sample_chem.singletask.solubility.model"), "model_py"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("with_feature", true), "with_feature"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("with_node_embedding", false), "with_node_embedding"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("embedding_dim", 10), "embedding_dim", 1));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("normalize_adj_flag", false), "normalize_adj_flag"));
        addDialogComponent(new DialogComponentBoolean(new SettingsModelBoolean("split_adj_flag", false), "split_adj_flag"));
        addDialogComponent(new DialogComponentNumber(new SettingsModelInteger("order", 1), "order", 1));
    }
}
