package org.kgcn.tpu.knime.nodes.GCNVisualizer;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNVisualizerNodeFactory extends NodeFactory<GCNVisualizerNodeModel> {

    @Override
    public GCNVisualizerNodeModel createNodeModel() {
        return new GCNVisualizerNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNVisualizerNodeModel> createNodeView(final int viewIndex,
            final GCNVisualizerNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNVisualizerNodeDialog();
    }
}
