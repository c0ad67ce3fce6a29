#!/usr/bin/env python
"""KNIME node helper (reference: KNIME/GCN-K/py/prep_mol_info.py) — thin shim over
kgcn_tpu.knime.helpers.  Import path is resolved relative to this repo so
the KNIME plugin only needs GCNK_SOURCE_PATH."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from kgcn_tpu.knime.helpers import main_prep_mol_info  # noqa: E402

if __name__ == "__main__":
    main_prep_mol_info()
