package org.kgcn.tpu.knime.nodes.CSVLabelExtractor;

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class CSVLabelExtractorNodeFactory extends NodeFactory<CSVLabelExtractorNodeModel> {

    @Override
    public CSVLabelExtractorNodeModel createNodeModel() {
        return new CSVLabelExtractorNodeModel();
    }

    @Override
    public int getNrNodeViews() {
        return 0;
    }

    @Override
    public NodeView<CSVLabelExtractorNodeModel> createNodeView(final int viewIndex,
            final CSVLabelExtractorNodeModel nodeModel) {
        return null;
    }

    @Override
    public boolean hasDialog() {
        return true;
    }

    @Override
    public NodeDialogPane createNodeDialog() {
        return new CSVLabelExtractorNodeDialog();
    }
}
