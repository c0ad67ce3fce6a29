#!/usr/bin/env python
"""Drop-in for the reference's ``gcn_gen.py`` (graph VAE engine):
``gcn_gen.py {train,reconstruct,generate} --config <file>``."""
from kgcn_tpu.cli.gen import main

if __name__ == "__main__":
    main()
