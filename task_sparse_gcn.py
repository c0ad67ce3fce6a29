#!/usr/bin/env python
"""Drop-in for the reference's ``task_sparse_gcn.py`` (TFRecord streaming
sparse-GCN engine): ``task_sparse_gcn.py {train,train_cv,infer} --config …``."""
from kgcn_tpu.cli.sparse import main

if __name__ == "__main__":
    main()
