package org.kgcn.tpu.knime.nodes.AtomFeatureExtractor;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class AtomFeatureExtractorNodeFactory extends NodeFactory<AtomFeatureExtractorNodeModel> {

    @Override
    public AtomFeatureExtractorNodeModel createNodeModel() {
        return new AtomFeatureExtractorNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<AtomFeatureExtractorNodeModel> createNodeView(final int viewIndex,
            final AtomFeatureExtractorNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new AtomFeatureExtractorNodeDialog();
    }
}
