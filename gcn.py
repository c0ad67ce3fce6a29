#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``gcn.py`` script surface.

The KNIME GCN-K nodes shell out to ``$GCNK_SOURCE_PATH/gcn.py {train,infer,
visualize,train_cv} --config <file>`` (reference:
KNIME/GCN-K/src/org/gcnk/knime/nodes/GCNLearner/GCNLearnerNodeModel.java:275-277)
— pointing GCNK_SOURCE_PATH at this repository drives the TPU framework
from the unchanged Java nodes.  Same subcommands and config schema as
``python -m kgcn_tpu.cli.main``.
"""
from kgcn_tpu.cli.main import main

if __name__ == "__main__":
    main()
