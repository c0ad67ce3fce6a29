package org.kgcn.tpu.knime.nodes.GCNScore;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNScoreNodeFactory extends NodeFactory<GCNScoreNodeModel> {

    @Override
    public GCNScoreNodeModel createNodeModel() {
        return new GCNScoreNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNScoreNodeModel> createNodeView(final int viewIndex,
            final GCNScoreNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNScoreNodeDialog();
    }
}
