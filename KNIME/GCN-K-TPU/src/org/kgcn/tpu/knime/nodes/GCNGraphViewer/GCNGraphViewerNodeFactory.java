package org.kgcn.tpu.knime.nodes.GCNGraphViewer;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNGraphViewerNodeFactory extends NodeFactory<GCNGraphViewerNodeModel> {

    @Override
    public GCNGraphViewerNodeModel createNodeModel() {
        return new GCNGraphViewerNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNGraphViewerNodeModel> createNodeView(final int viewIndex,
            final GCNGraphViewerNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNGraphViewerNodeDialog();
    }
}
