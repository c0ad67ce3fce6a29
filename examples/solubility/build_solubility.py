#!/usr/bin/env python
"""Build the REAL-chemistry solubility datasets from the reference's shipped
SDF (KNIME/testdata/singletask/SDF_wash.sdf — 623 molecules, the ESOL-style
aqueous-solubility set with <SOL> values, <SOL_classification> buckets and
per-molecule classification labels in labels.csv).

Produces two .jbl files consumed IDENTICALLY by this framework and by the
mounted TF reference (same joblib schema, docs/dataset_file.md):

* solubility_cls.jbl — binary classification (labels.csv one-hot rows)
* solubility_reg.jbl — regression on the SOL value

No RDKit: molecules come from kgcn_tpu.data.molparse, features are the
standard 81-dim atom vectors (kgcn/preprocessing/utils.py:20-56 semantics).
"""
import os
import sys

import joblib
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kgcn_tpu.data import featurizer as fz  # noqa: E402
from kgcn_tpu.data import molparse  # noqa: E402

SDF = "/root/reference/KNIME/testdata/singletask/SDF_wash.sdf"
LABELS = "/root/reference/KNIME/testdata/singletask/labels.csv"


def main(out_dir: str = None):
    out_dir = out_dir or os.path.dirname(os.path.abspath(__file__))
    mols = molparse.parse_sdf(SDF)
    with open(LABELS) as f:
        labels = np.asarray(
            [[float(x) for x in line.split(",")] for line in f if line.strip()]
        )
    assert len(mols) == len(labels) == 623
    max_atoms = max(m.GetNumAtoms() for m in mols if m is not None)
    print(f"[INFO] {len(mols)} molecules, max atoms {max_atoms}")

    cls = fz.build_chem_dataset(
        mols, labels=labels, atom_num_limit=max_atoms, generate_mol_info=False
    )
    joblib.dump(cls, os.path.join(out_dir, "solubility_cls.jbl"), compress=3)
    print(f"[SAVE] solubility_cls.jbl  label shape {cls['label'].shape}")

    # indexed by ORIGINAL mols position (build_chem_dataset selects rows via
    # its own keep list), so unparseable records get a NaN placeholder instead
    # of shifting every subsequent label
    sol = np.asarray(
        [[float(m.GetProp("SOL"))] if m is not None else [np.nan]
         for m in mols],
        np.float32,
    )
    reg = fz.build_chem_dataset(
        mols, labels=sol, atom_num_limit=max_atoms, generate_mol_info=False
    )
    joblib.dump(reg, os.path.join(out_dir, "solubility_reg.jbl"), compress=3)
    print(f"[SAVE] solubility_reg.jbl  label shape {reg['label'].shape}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
