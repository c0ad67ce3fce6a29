"""Dependency-free molecular parsing (molparse) + featuriser protocol seam.

Covers VERDICT task 7: the chemistry path now executes end-to-end WITHOUT
RDKit — SDF/SMILES → molecule protocol → 81-dim features → jbl dict — and is
validated on the reference's shipped real dataset
(/root/reference/KNIME/testdata/singletask/SDF_wash.sdf, 623 solubility
molecules with <SOL>/<smiles> data fields).
"""
import os

import numpy as np
import pytest

from kgcn_tpu.data import featurizer as fz
from kgcn_tpu.data import molparse

SDF = "/root/reference/KNIME/testdata/singletask/SDF_wash.sdf"


def test_smiles_pentane():
    mol = molparse.parse_smiles("CCCCC")
    assert mol.GetNumAtoms() == 5
    assert mol.GetNumBonds() == 4
    a0, a1 = mol.GetAtoms()[0], mol.GetAtoms()[1]
    assert a0.GetSymbol() == "C" and a0.GetDegree() == 1
    assert a0.GetTotalNumHs() == 3 and a1.GetTotalNumHs() == 2
    assert a0.GetHybridization() == "SP3"
    assert not a0.GetIsAromatic()


@pytest.mark.parametrize("smi", ["c1ccccc1", "C1=CC=CC=C1"])
def test_benzene_aromatic_both_notations(smi):
    mol = molparse.parse_smiles(smi)
    assert mol.GetNumAtoms() == 6 and mol.GetNumBonds() == 6
    for a in mol.GetAtoms():
        assert a.GetIsAromatic(), smi
        assert a.GetHybridization() == "SP2"
        assert a.GetTotalNumHs() == 1
        assert a.GetDegree() == 2


def test_heteroaromatics():
    pyridine = molparse.parse_smiles("c1ccncc1")
    n = [a for a in pyridine.GetAtoms() if a.GetSymbol() == "N"][0]
    assert n.GetIsAromatic() and n.GetTotalNumHs() == 0
    furan = molparse.parse_smiles("c1ccoc1")
    o = [a for a in furan.GetAtoms() if a.GetSymbol() == "O"][0]
    assert o.GetIsAromatic() and o.GetTotalNumHs() == 0
    pyrrole = molparse.parse_smiles("c1cc[nH]c1")
    nh = [a for a in pyrrole.GetAtoms() if a.GetSymbol() == "N"][0]
    assert nh.GetIsAromatic() and nh.GetTotalNumHs() == 1
    # kekulized pyridine perceives aromatic too
    kek = molparse.parse_smiles("C1=CC=NC=C1")
    assert all(a.GetIsAromatic() for a in kek.GetAtoms())


def test_charges_and_brackets():
    mol = molparse.parse_smiles("[NH4+]")
    a = mol.GetAtoms()[0]
    assert a.GetFormalCharge() == 1 and a.GetTotalNumHs() == 4
    ac = molparse.parse_smiles("CC(=O)[O-]")
    om = [a for a in ac.GetAtoms() if a.GetSymbol() == "O"
          and a.GetFormalCharge() == -1][0]
    assert om.GetTotalNumHs() == 0
    carbonyl_c = ac.GetAtoms()[1]
    assert carbonyl_c.GetHybridization() == "SP2"
    nitrile = molparse.parse_smiles("CC#N")
    assert nitrile.GetAtoms()[1].GetHybridization() == "SP"


def test_branches_rings_fragments():
    iso = molparse.parse_smiles("CC(C)C")
    assert iso.GetAtoms()[1].GetDegree() == 3
    naph = molparse.parse_smiles("c1ccc2ccccc2c1")
    assert naph.GetNumAtoms() == 10 and naph.GetNumBonds() == 11
    assert all(a.GetIsAromatic() for a in naph.GetAtoms())
    fused = [a for a in naph.GetAtoms() if a.GetDegree() == 3]
    assert len(fused) == 2 and all(a.GetTotalNumHs() == 0 for a in fused)
    salt = molparse.parse_smiles("[Na+].[Cl-]")
    assert salt.GetNumAtoms() == 2 and salt.GetNumBonds() == 0
    ring_pct = molparse.parse_smiles("C%10CC%10")
    assert ring_pct.GetNumBonds() == 3


def test_parse_errors_return_none():
    assert molparse.parse_smiles("C1CC") is None      # unclosed ring
    assert molparse.parse_smiles("C(") is None        # unclosed branch...
    assert molparse.parse_smiles("Xx") is None        # unknown element
    assert molparse.parse_smiles("") is None


def test_features_without_rdkit_match_schema():
    mol = molparse.parse_smiles("c1ccccc1O")  # phenol
    feats = np.stack([fz.atom_features(a) for a in mol.GetAtoms()])
    assert feats.shape == (7, 81)
    # aromatic flag slot: 44 + 17 + 7 + 2 + 5 = 75
    assert feats[0, 75] == 1.0
    # oxygen row: symbol one-hot slot 2 ("O"), 1 H (phenol OH)
    o_row = feats[6]
    assert o_row[2] == 1.0
    adj = fz.adjacency_matrix(mol)
    assert adj.shape == (7, 7) and np.all(np.diag(adj) == 1)


def test_molblock_roundtrip_pentane():
    mols = molparse.parse_sdf(SDF) if os.path.exists(SDF) else []
    if not mols:
        pytest.skip("reference SDF not mounted")
    m0 = mols[0]
    assert m0.name == "n-pentane"
    assert m0.GetNumAtoms() == 5 and m0.GetNumBonds() == 4
    assert m0.GetProp("smiles") == "CCCCC"
    assert float(m0.GetProp("SOL")) == pytest.approx(-3.18)
    assert m0.GetAtoms()[0].GetTotalNumHs() == 3


@pytest.mark.skipif(not os.path.exists(SDF), reason="reference SDF absent")
def test_full_solubility_sdf_parses_and_matches_smiles():
    """All 623 molecules parse; SDF graph vs our SMILES parse of the
    embedded <smiles> agree on heavy-atom count, bond count, and degree
    sequence for every molecule both parsers handle."""
    mols = molparse.parse_sdf(SDF)
    assert len(mols) == 623
    assert all(m is not None for m in mols)
    checked = 0
    for m in mols:
        smi = m.props.get("smiles")
        if not smi:
            continue
        sm = molparse.parse_smiles(smi)
        if sm is None:
            continue
        assert sm.GetNumAtoms() == m.GetNumAtoms(), smi
        assert sm.GetNumBonds() == m.GetNumBonds(), smi
        deg_sdf = sorted(a.GetDegree() for a in m.GetAtoms())
        deg_smi = sorted(a.GetDegree() for a in sm.GetAtoms())
        assert deg_sdf == deg_smi, smi
        checked += 1
    # the overwhelming majority of the set is within our SMILES subset
    assert checked >= 550, f"only {checked} molecules cross-checked"


@pytest.mark.skipif(not os.path.exists(SDF), reason="reference SDF absent")
def test_build_chem_dataset_from_sdf_no_rdkit():
    mols = molparse.parse_sdf(SDF)[:32]
    labels = np.stack([
        np.array([1.0, 0.0]) if float(m.GetProp("SOL")) > -3 else
        np.array([0.0, 1.0]) for m in mols
    ])
    data = fz.build_chem_dataset(mols, labels=labels, atom_num_limit=60)
    assert data["feature"].shape[0] == 32
    assert data["feature"].shape[2] == 81
    assert len(data["adj"]) == 32
    idx, vals, shape = data["adj"][0]
    assert shape[0] == mols[0].GetNumAtoms()
    # mol_info survives pickling (visualization dump path)
    import pickle

    back = pickle.loads(pickle.dumps(data["mol_info"]))
    assert back["obj_list"][0].GetNumAtoms() == mols[0].GetNumAtoms()


def test_morgan_fallback_deterministic_and_distinct():
    a = fz.morgan_fingerprint(molparse.parse_smiles("c1ccccc1"))
    b = fz.morgan_fingerprint(molparse.parse_smiles("c1ccccc1"))
    c = fz.morgan_fingerprint(molparse.parse_smiles("CCO"))
    assert a.shape == (2048,)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_morgan_fingerprint_stable_across_hash_seeds():
    """ADVICE r2: builtin hash() is PYTHONHASHSEED-randomised — fingerprints
    saved to .jbl must be identical across processes."""
    import subprocess
    import sys

    code = (
        "from kgcn_tpu.data import molparse\n"
        "fp = molparse.morgan_fingerprint(molparse.parse_smiles('CC(=O)Oc1ccccc1C(=O)O'))\n"
        "print(','.join(str(i) for i in fp.nonzero()[0]))\n"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code],
            env={**os.environ, "PYTHONHASHSEED": seed},
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        for seed in ("0", "12345")  # two seeds suffice to catch drift
    }
    assert len(outs) == 1, "fingerprint bits differ across hash seeds"


def test_hybridization_hypervalent_and_bracket_valence():
    """ADVICE r2: sulfone S is SP3 (tetrahedral hypervalent), allene centre
    is SP; bracket-H atoms report implicit valence 0 (RDKit's split)."""
    sulfone = molparse.parse_smiles("CS(=O)(=O)C")  # dimethyl sulfone
    s = next(a for a in sulfone.GetAtoms() if a.GetSymbol() == "S")
    assert str(s.GetHybridization()) == "SP3"
    allene = molparse.parse_smiles("C=C=C")
    mid = allene.GetAtoms()[1]
    assert str(mid.GetHybridization()) == "SP"
    co2 = molparse.parse_smiles("O=C=O")
    assert str(co2.GetAtoms()[1].GetHybridization()) == "SP"
    pyrrole = molparse.parse_smiles("c1cc[nH]1")
    n = next(a for a in pyrrole.GetAtoms() if a.GetSymbol() == "N")
    assert n.GetImplicitValence() == 0  # bracket H is explicit in RDKit
    assert n.GetTotalNumHs() == 1
