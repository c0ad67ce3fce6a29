package org.kgcn.tpu.knime.nodes.AdditionalModalityPreprocessor;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class AdditionalModalityPreprocessorNodeFactory extends NodeFactory<AdditionalModalityPreprocessorNodeModel> {

    @Override
    public AdditionalModalityPreprocessorNodeModel createNodeModel() {
        return new AdditionalModalityPreprocessorNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<AdditionalModalityPreprocessorNodeModel> createNodeView(final int viewIndex,
            final AdditionalModalityPreprocessorNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new AdditionalModalityPreprocessorNodeDialog();
    }
}
