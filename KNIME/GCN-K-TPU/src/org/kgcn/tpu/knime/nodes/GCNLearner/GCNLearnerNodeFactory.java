package org.kgcn.tpu.knime.nodes.GCNLearner;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNLearnerNodeFactory extends NodeFactory<GCNLearnerNodeModel> {

    @Override
    public GCNLearnerNodeModel createNodeModel() {
        return new GCNLearnerNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNLearnerNodeModel> createNodeView(final int viewIndex,
            final GCNLearnerNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNLearnerNodeDialog();
    }
}
