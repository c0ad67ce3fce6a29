package org.kgcn.tpu.knime.nodes.GCNPredictor;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNPredictorNodeFactory extends NodeFactory<GCNPredictorNodeModel> {

    @Override
    public GCNPredictorNodeModel createNodeModel() {
        return new GCNPredictorNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNPredictorNodeModel> createNodeView(final int viewIndex,
            final GCNPredictorNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNPredictorNodeDialog();
    }
}
