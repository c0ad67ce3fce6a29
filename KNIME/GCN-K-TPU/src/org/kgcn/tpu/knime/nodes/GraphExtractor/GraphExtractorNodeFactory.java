package org.kgcn.tpu.knime.nodes.GraphExtractor;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class GraphExtractorNodeFactory extends NodeFactory<GraphExtractorNodeModel> {

    @Override
    public GraphExtractorNodeModel createNodeModel() {
        return new GraphExtractorNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<GraphExtractorNodeModel> createNodeView(final int viewIndex,
            final GraphExtractorNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new GraphExtractorNodeDialog();
    }
}
