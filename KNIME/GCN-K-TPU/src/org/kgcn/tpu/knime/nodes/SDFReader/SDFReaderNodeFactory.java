package org.kgcn.tpu.knime.nodes.SDFReader;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class SDFReaderNodeFactory extends NodeFactory<SDFReaderNodeModel> {

    @Override
    public SDFReaderNodeModel createNodeModel() {
        return new SDFReaderNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<SDFReaderNodeModel> createNodeView(final int viewIndex,
            final SDFReaderNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new SDFReaderNodeDialog();
    }
}
