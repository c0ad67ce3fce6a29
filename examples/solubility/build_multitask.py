"""Multitask fixture over the reference's real 623-molecule solubility SDF.

The reference's CPI multitask protocol
(/root/reference/sample_chem/compound-protein_interaction/README.md:26-58)
needs assay data that is not shipped in the reference tree (its
build_dataset.sh expects a downloaded `sample/` assay dir), so this builds
the same *shape* of problem from the real molecules that ARE shipped:

* task 0 — the measured solubility class (labels.csv column, real assay);
* task 1 — molecular weight above the dataset median;
* task 2 — contains ≥1 aromatic atom;

with 20 % of task entries masked at random (the NaN→mask convention of
assay matrices, kgcn/preprocessing/chem.py:436-490).  Output:
solubility_mt.jbl in the standard multitask .jbl schema (label +
mask_label), loadable by BOTH frameworks.
"""
import os
import sys

import joblib
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from kgcn_tpu.data import featurizer as fz  # noqa: E402
from kgcn_tpu.data import molparse  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SDF = "/root/reference/KNIME/testdata/singletask/SDF_wash.sdf"
LABELS = "/root/reference/KNIME/testdata/singletask/labels.csv"

ATOMIC_MASS = {
    "H": 1.008, "C": 12.011, "N": 14.007, "O": 15.999, "F": 18.998,
    "P": 30.974, "S": 32.06, "Cl": 35.45, "Br": 79.904, "I": 126.904,
    "B": 10.81, "Si": 28.085, "Se": 78.971, "As": 74.922, "Na": 22.990,
    "K": 39.098, "Ca": 40.078, "Mg": 24.305, "Zn": 65.38, "Fe": 55.845,
}


def mol_weight(mol) -> float:
    w = 0.0
    for a in mol.GetAtoms():
        w += ATOMIC_MASS.get(a.GetSymbol(), 50.0)
        w += a.GetTotalNumHs() * ATOMIC_MASS["H"]
    return w


def main(out_dir: str = None):
    out_dir = out_dir or HERE
    mols = molparse.parse_sdf(SDF)
    with open(LABELS) as f:
        cls = np.asarray(
            [[float(x) for x in line.split(",")] for line in f if line.strip()]
        )
    assert len(mols) == len(cls) == 623
    # labels.csv is one-hot [neg, pos]; take the positive column
    task0 = cls[:, 1] if cls.shape[1] == 2 else cls[:, 0]
    mw = np.asarray([mol_weight(m) if m else np.nan for m in mols])
    task1 = (mw > np.nanmedian(mw)).astype(np.float64)
    task2 = np.asarray(
        [float(any(a.GetIsAromatic() for a in m.GetAtoms())) if m else 0.0
         for m in mols]
    )
    labels = np.stack([task0, task1, task2], axis=1)
    rng = np.random.RandomState(0)
    mask = (rng.random_sample(labels.shape) > 0.2).astype(np.float64)

    max_atoms = max(m.GetNumAtoms() for m in mols if m is not None)
    data = fz.build_chem_dataset(
        mols, labels=labels, atom_num_limit=max_atoms, generate_mol_info=False
    )
    data["mask_label"] = mask
    joblib.dump(data, os.path.join(out_dir, "solubility_mt.jbl"), compress=3)
    print(f"[SAVE] solubility_mt.jbl  label {data['label'].shape} "
          f"mask density {mask.mean():.3f} "
          f"task prevalences {labels.mean(0).round(3)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
