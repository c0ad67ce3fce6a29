package org.kgcn.tpu.knime.nodes.GCNScoreViewer;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNScoreViewerNodeFactory extends NodeFactory<GCNScoreViewerNodeModel> {

    @Override
    public GCNScoreViewerNodeModel createNodeModel() {
        return new GCNScoreViewerNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNScoreViewerNodeModel> createNodeView(final int viewIndex,
            final GCNScoreViewerNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNScoreViewerNodeDialog();
    }
}
