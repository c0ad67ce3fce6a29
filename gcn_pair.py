#!/usr/bin/env python
"""Drop-in for the reference's ``gcn_pair.py`` (pairwise RankNet engine):
``gcn_pair.py {train,infer} --config <file>``."""
from kgcn_tpu.cli.pair import main

if __name__ == "__main__":
    main()
