package org.kgcn.tpu.knime.nodes.GCNDatasetSplitter;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNDatasetSplitterNodeFactory extends NodeFactory<GCNDatasetSplitterNodeModel> {

    @Override
    public GCNDatasetSplitterNodeModel createNodeModel() {
        return new GCNDatasetSplitterNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNDatasetSplitterNodeModel> createNodeView(final int viewIndex,
            final GCNDatasetSplitterNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNDatasetSplitterNodeDialog();
    }
}
