package org.kgcn.tpu.knime.nodes.GCNDatasetBuilder;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GCNDatasetBuilderNodeFactory extends NodeFactory<GCNDatasetBuilderNodeModel> {

    @Override
    public GCNDatasetBuilderNodeModel createNodeModel() {
        return new GCNDatasetBuilderNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GCNDatasetBuilderNodeModel> createNodeView(final int viewIndex,
            final GCNDatasetBuilderNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GCNDatasetBuilderNodeDialog();
    }
}
