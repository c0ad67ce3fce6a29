package org.kgcn.tpu.knime.nodes.AddModality;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class AddModalityNodeFactory extends NodeFactory<AddModalityNodeModel> {

    @Override
    public AddModalityNodeModel createNodeModel() {
        return new AddModalityNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<AddModalityNodeModel> createNodeView(final int viewIndex,
            final AddModalityNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new AddModalityNodeDialog();
    }
}
