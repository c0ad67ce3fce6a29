"""Preprocessing CLI tests (kg / cv-splitter / join; chem gated on RDKit)."""
import os

import joblib
import numpy as np
import pytest

from kgcn_tpu.data.synthetic import make_ring_dataset


def test_kg_cli_end_to_end(tmp_path):
    from kgcn_tpu.cli.kg import main as kg_main

    tsv = tmp_path / "triples.tsv"
    rng = np.random.RandomState(0)
    with open(tsv, "w") as f:
        for i in range(40):
            f.write(f"e{i}\tr{i % 2}\te{(i + 1) % 40}\n")
    out = tmp_path / "kg.jbl"
    kg_main(["--input", str(tsv), "--output", str(out), "--test-rate", "0.1"])
    data = joblib.load(out)
    assert data["node_num"] == 40
    assert len(data["adj"][0]) == 2  # one channel per relation
    assert data["label_list"][0].shape[1] == 6
    # reverse + self edges present
    idx, val, shape = data["adj"][0][0]
    pairs = set(map(tuple, idx))
    assert (0, 0) in pairs  # self loop
    some = next(iter(p for p in pairs if p[0] != p[1]))
    assert (some[1], some[0]) in pairs  # reverse edge
    # it trains
    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.models.kg import KGBatcher, KGLinkPredictor
    from kgcn_tpu.runtime.config import default_config
    from kgcn_tpu.runtime.train import Trainer

    cfg = default_config()
    cfg.update({"with_feature": False, "with_node_embedding": True,
                "task": "link_prediction", "save_interval": 0})
    ds, info = build_dataset(data, cfg)
    model = KGLinkPredictor(all_node_num=40, embedding_dim=8,
                            channels=info.adj_channel_num)
    trainer = Trainer(model, cfg, info)
    kb = KGBatcher(ds, info, label_batch_size=32, seed=0)
    state = trainer.init_state(next(kb.batches()), seed=0)
    state, cost, _, _ = trainer.run_epoch(state, kb)
    assert np.isfinite(cost)


def test_cv_splitter_cli(tmp_path):
    from kgcn_tpu.cli.cv_splitter import main as cv_main

    src = tmp_path / "data.jbl"
    joblib.dump(make_ring_dataset(num_pairs=10, seed=0), src)
    cv_main(["--input", str(src), "--output-dir", str(tmp_path), "--fold", "4"])
    files = sorted(p for p in os.listdir(tmp_path) if "fold" in p)
    assert len(files) == 8  # 4 folds × train/test
    tr = joblib.load(tmp_path / "data.fold0.train.jbl")
    te = joblib.load(tmp_path / "data.fold0.test.jbl")
    assert len(tr["label"]) + len(te["label"]) == 20
    assert tr["feature"].shape[1:] == (10, 3)
    # folds are loadable by the training pipeline
    from kgcn_tpu.data import build_dataset

    ds, info = build_dataset(tr, {})
    assert ds.num == len(tr["label"])


def test_join_cli(tmp_path):
    from kgcn_tpu.cli.data_join import main as join_main

    a = tmp_path / "a.jbl"
    b = tmp_path / "b.jbl"
    joblib.dump(make_ring_dataset(num_pairs=5, seed=0), a)
    joblib.dump(make_ring_dataset(num_pairs=7, seed=1), b)
    out = tmp_path / "joined.jbl"
    join_main(["--input", str(a), str(b), "--output", str(out)])
    data = joblib.load(out)
    assert len(data["label"]) == 24
    assert data["dense_adj"].shape == (24, 10, 10)

    # modal attach
    mat = np.random.RandomState(0).standard_normal((24, 6)).astype(np.float32)
    np.savetxt(tmp_path / "modal.csv", mat, delimiter=",")
    out2 = tmp_path / "with_modal.jbl"
    join_main(["--input", str(out), "--output", str(out2),
               "--modal-csv", str(tmp_path / "modal.csv"),
               "--modal-name", "profeat"])
    d2 = joblib.load(out2)
    assert d2["profeat"].shape == (24, 6)


def test_chem_featurizer_pure_parts():
    from kgcn_tpu.data.featurizer import FEATURE_DIM, one_of_k, encode_protein_sequence

    assert FEATURE_DIM == 81  # reference's documented 81-dim features
    assert one_of_k("C", ["C", "N", "Unknown"]) == [True, False, False]
    assert one_of_k("Xx", ["C", "N", "Unknown"]) == [False, False, True]
    seq = encode_protein_sequence("ACDX", 6)
    assert seq.tolist() == [1, 2, 3, 21, 0, 0]


def test_chem_cli_end_to_end_without_rdkit(tmp_path):
    """The full kgcn-tpu-chem CLI runs on the molparse backend: SMILES file +
    label file → jbl → loadable by build_dataset and trainable shapes
    (reference pipeline: kgcn/preprocessing/chem.py:552-770, no RDKit)."""
    import joblib

    from kgcn_tpu.cli.chem import main as chem_main
    from kgcn_tpu.data import build_dataset

    smi = tmp_path / "mols.smi"
    smi.write_text("CCO\nc1ccccc1\nCC(=O)O\nCCN\nc1ccncc1\nCCCC\n")
    lab = tmp_path / "labels.txt"
    lab.write_text("1,0\n0,1\n1,0\n0,1\n1,0\n0,1\n")
    out = tmp_path / "d.jbl"
    chem_main([
        "--smiles", str(smi), "--label", str(lab), "-o", str(out),
        "--atom-num-limit", "20", "--morgan-fingerprint",
    ])
    data = joblib.load(out)
    assert data["feature"].shape == (6, 20, 81)
    assert data["label"].shape == (6, 2)
    assert data["chemical_fp"].shape == (6, 2048)
    ds, info = build_dataset(data, {})
    assert info.feature_dim == 81 and ds.num == 6


def test_chem_cli_assay_csv_pseudo_negative(tmp_path):
    """Assay-matrix mode (NaN → mask) + pseudo-negative balancing, the CPI
    preprocessing protocol (chem.py:436-490, 193-226) — RDKit-free."""
    import joblib

    from kgcn_tpu.cli.chem import main as chem_main

    csvf = tmp_path / "assay.csv"
    csvf.write_text(
        "smiles,t1,t2\nCCO,1,\nc1ccccc1,1,1\nCC(=O)O,,1\nCCN,,\nCCC,0,0\n"
        "CCCC,,\nCCCCC,,\nCCOC,,\n"
    )
    out = tmp_path / "cpi.jbl"
    chem_main(["--assay-csv", str(csvf), "-o", str(out),
               "--atom-num-limit", "20", "--pseudo-negative"])
    data = joblib.load(out)
    lab, msk = data["label"], data["mask_label"]
    # 4 actives, 2 inactives, 10 free cells → 2 pseudo-negatives added
    active = int((lab[msk == 1] == 1).sum())
    inactive = int((lab[msk == 1] == 0).sum())
    assert active == inactive == 4  # balanced by pseudo negatives
    assert msk.sum() == 8


def test_chem_summary_smiles_and_jbl(tmp_path, capsys):
    """kgcn-tpu-chem-summary: reference chem_summary.py:28-122 semantics,
    RDKit-free fallback + the extra .jbl mode."""
    from kgcn_tpu.cli.chem_summary import main, smiles_atoms, summarize_mols

    # tokenizer: organic subset, aromatics, brackets, two-letter elements
    assert len(smiles_atoms("CCO")) == 3
    assert len(smiles_atoms("c1ccccc1")) == 6
    assert len(smiles_atoms("[Na+].[Cl-]")) == 2
    assert len(smiles_atoms("C[Si](C)(C)Cl")) == 5
    assert len(smiles_atoms("CC(=O)Oc1ccccc1C(=O)O")) == 13

    smi = tmp_path / "mols.smi"
    smi.write_text("CCO ethanol\nc1ccccc1 benzene\nCC(=O)O acetic\n")
    info = summarize_mols(str(smi), "smiles", bins=3)
    assert info["size"] == 3
    assert info["max_atom_num"] == 6
    assert info["min_atom_num"] == 3
    out = capsys.readouterr().out
    assert "Histgram (atom number)" in out  # reference's exact header

    # SDF fallback reads the V2000 counts line
    sdf = tmp_path / "m.sdf"
    sdf.write_text(
        "mol\n  prog\n\n  2  1  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 C   0  0\n"
        "    0.0000    0.0000    0.0000 O   0  0\n"
        "  1  2  1  0\nM  END\n$$$$\n"
    )
    info = summarize_mols(str(sdf), "sdf", bins=2)
    assert info["size"] == 1 and info["max_atom_num"] == 2

    # .jbl dataset mode
    main(["-p", "example_jbl/synthetic.jbl"])
    out = capsys.readouterr().out
    assert "Dataset size: 200" in out


def test_atom_feature_extras_with_stub_rdkit(monkeypatch):
    """Electronegativity/Gasteiger extras: insertion point (after aromatic,
    before numH — utils.py:44-51), Pauling lookup by atomic number, and
    NaN-gasteiger → 0."""
    import sys
    import types

    import numpy as np

    hyb = types.SimpleNamespace(SP="SP", SP2="SP2", SP3="SP3",
                                SP3D="SP3D", SP3D2="SP3D2")
    chem = types.SimpleNamespace(rdchem=types.SimpleNamespace(
        HybridizationType=hyb))
    rdkit = types.ModuleType("rdkit")
    rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", rdkit)
    monkeypatch.setitem(sys.modules, "rdkit.Chem", chem)

    class FakeAtom:
        def __init__(self, gasteiger):
            self._g = gasteiger

        def GetSymbol(self):
            return "N"

        def GetDegree(self):
            return 2

        def GetImplicitValence(self):
            return 1

        def GetFormalCharge(self):
            return 0

        def GetNumRadicalElectrons(self):
            return 0

        def GetHybridization(self):
            return "SP2"

        def GetIsAromatic(self):
            return True

        def GetTotalNumHs(self):
            return 1

        def GetAtomicNum(self):
            return 7  # nitrogen

        def GetDoubleProp(self, name):
            assert name == "_GasteigerCharge"
            return self._g

    from kgcn_tpu.data.featurizer import FEATURE_DIM, PAULING_EN, atom_features

    base = atom_features(FakeAtom(0.25))
    assert base.shape == (FEATURE_DIM,)

    both = atom_features(FakeAtom(0.25), use_electronegativity=True,
                         use_gasteiger=True)
    assert both.shape == (FEATURE_DIM + 2,)
    # extras sit right before the 5-dim numH one-hot
    assert both[-7] == np.float32(PAULING_EN[6])  # N = 3.04
    assert both[-6] == np.float32(0.25)
    np.testing.assert_array_equal(both[-5:], base[-5:])
    np.testing.assert_array_equal(both[:-7], base[:-5])

    nan_g = atom_features(FakeAtom(float("nan")), use_gasteiger=True)
    assert nan_g[-6] == 0.0


def test_generate_pseudo_negatives_balances():
    import numpy as np

    from kgcn_tpu.data.featurizer import generate_pseudo_negatives

    rng = np.random.RandomState(0)
    M, T = 40, 5
    labels = np.zeros((M, T))
    mask = np.zeros((M, T), np.int64)
    # 30 actives, 10 inactives labeled
    mi, ti = np.where(rng.rand(M, T) < 0.25)
    mi, ti = mi[:40], ti[:40]
    mask[mi, ti] = 1
    labels[mi[:30], ti[:30]] = 1
    labels[mi[30:], ti[30:]] = 0
    lab2, msk2, n = generate_pseudo_negatives(labels, mask, seed=1)
    i, j = np.where(msk2 == 1)
    active = int((lab2[i, j] == 1).sum())
    inactive = int((lab2[i, j] == 0).sum())
    assert active == inactive, (active, inactive)
    assert n == active - 10
    # originals untouched
    assert mask.sum() < msk2.sum()
    np.testing.assert_array_equal(labels[mi[:30], ti[:30]], 1)
    # already-balanced input is a no-op
    _, _, n0 = generate_pseudo_negatives(lab2, msk2, seed=2)
    assert n0 == 0


def test_cv_splitter_slices_sparse_labels(tmp_path):
    """label_sparse must be row-sliced per fold — the full matrix in every
    fold silently misaligns labels."""
    import scipy.sparse as sp

    from kgcn_tpu.cli.cv_splitter import split_jbl_obj

    n = 12
    feats = np.random.RandomState(0).rand(n, 5, 3)
    adjs = [
        (np.array([[0, 1], [1, 0]]), np.ones(2, np.float32), (5, 5))
        for _ in range(n)
    ]
    lab = sp.csr_matrix(np.eye(n, 4, dtype=np.float64))
    obj = {"feature": feats, "adj": adjs, "label_sparse": lab,
           "mask_label_sparse": sp.csr_matrix(np.ones((n, 4))),
           "max_node_num": np.int64(5)}
    idx = np.array([2, 5, 7])
    sub = split_jbl_obj(obj, idx)
    assert sub["label_sparse"].shape == (3, 4)
    np.testing.assert_array_equal(
        sub["label_sparse"].toarray(), lab[idx].toarray())
    assert sub["mask_label_sparse"].shape == (3, 4)


def test_data_join_repads_node_axis():
    from kgcn_tpu.cli.data_join import join_jbl_objs

    a = {"feature": np.ones((2, 4, 3)), "dense_adj": np.ones((2, 4, 4)),
         "label": np.ones((2, 2)), "max_node_num": np.int64(4)}
    b = {"feature": np.ones((3, 6, 3)), "dense_adj": np.ones((3, 6, 6)),
         "label": np.ones((3, 2)), "max_node_num": np.int64(6)}
    out = join_jbl_objs([a, b])
    assert out["feature"].shape == (5, 6, 3)
    assert out["dense_adj"].shape == (5, 6, 6)
    assert int(out["max_node_num"]) == 6
    # padding rows are zero
    assert out["feature"][0, 4:].sum() == 0


def test_multi_dense_adj_enabled_counts_active_rows():
    from kgcn_tpu.data import build_dataset

    G, N, real = 2, 8, 3
    m = np.zeros((N, N))
    m[:real, :real] = np.eye(real)
    data = {"multi_dense_adj": [[m.copy(), m.copy()] for _ in range(G)],
            "feature": np.ones((G, N, 2)),
            "label": np.eye(2)[[0, 1]],
            "max_node_num": np.int64(N)}
    ds, info = build_dataset(data, {})
    np.testing.assert_array_equal(ds.enabled_node_nums, [real, real])


def test_smiles_tokenizer_organic_subset():
    """Unbracketed two-letter matches are limited to Cl/Br — 'In1cccc1'
    means I + aromatic n, never indium."""
    from kgcn_tpu.cli.chem_summary import smiles_atoms

    assert smiles_atoms("In1cccc1") == ["I", "N", "C", "C", "C", "C"]
    assert smiles_atoms("Sc1ccccc1") == ["S", "C", "C", "C", "C", "C", "C"]
    assert smiles_atoms("ClCCBr") == ["Cl", "C", "C", "Br"]
    assert smiles_atoms("[Sn](C)(C)C") == ["Sn", "C", "C", "C"]
    assert smiles_atoms("[nH]1cccc1") == ["N", "C", "C", "C", "C"]


def test_sybyl_atom_types():
    """SYBYL typing (featurizer.sybyl_atom_type — functional equivalent of
    the oddt typer the reference imports, kgcn/preprocessing/utils.py:22-28)
    on molecules with known types, via the RDKit-free molparse backend."""
    from kgcn_tpu.data import featurizer as fz
    from kgcn_tpu.data.molparse import parse_smiles as mol_from_smiles

    def types(smiles):
        mol = mol_from_smiles(smiles)
        return [fz.sybyl_atom_type(a) for a in mol.GetAtoms()]

    assert types("c1ccccc1") == ["C.ar"] * 6                 # benzene
    assert types("CC") == ["C.3", "C.3"]                     # ethane
    assert types("C=C") == ["C.2", "C.2"]                    # ethene
    assert types("C#C") == ["C.1", "C.1"]                    # ethyne
    assert types("CC(=O)N") == ["C.3", "C.2", "O.2", "N.am"]  # acetamide
    assert types("CC(=O)[O-]") == ["C.3", "C.2", "O.co2", "O.co2"]
    assert types("CS(=O)C") == ["C.3", "S.O", "O.2", "C.3"]   # DMSO
    t = types("CS(=O)(=O)C")                                  # dimethylsulfone
    assert t[1] == "S.o2" and t.count("O.2") == 2
    assert types("NC(=[NH2+])N")[1] == "C.cat"                # guanidinium
    assert types("c1ccncc1")[3] == "N.ar"                     # pyridine N
    assert types("C[NH3+]")[1] == "N.4"
    # sp2 N+ must NOT be N.4 (oddt gates N.4 on degree-4 or sp3+charge)
    assert types("C[N+](=O)[O-]")[1] == "N.2"                 # nitromethane
    assert types("CC=[NH+]C")[2] == "N.2"                     # iminium N


def test_sybyl_feature_vector_and_cli(tmp_path):
    """--use-sybyl: 97-dim vector (60 SYBYL types + the standard tail),
    flows through build_chem_dataset and the kgcn-chem CLI."""
    import subprocess
    import sys

    import joblib

    from kgcn_tpu.data import featurizer as fz
    from kgcn_tpu.data.molparse import parse_smiles as mol_from_smiles

    mol = mol_from_smiles("CC(=O)N")
    f = fz.atom_features(mol.GetAtomWithIdx(0), use_sybyl=True)
    expected = (len(fz.SYBYL_LIST) + fz.DEGREE_DIM + len(fz.VALENCE_SET)
                + 2 + 5 + 1 + len(fz.NUM_H_SET))
    assert f.shape == (expected,)
    assert f[: len(fz.SYBYL_LIST)].sum() == 1.0
    assert f[fz.SYBYL_LIST.index("C.3")] == 1.0

    smi = tmp_path / "in.smi"
    smi.write_text("CC(=O)N\nc1ccccc1\n")
    lab = tmp_path / "labels.csv"
    lab.write_text("1\n0\n")
    out = tmp_path / "ds.jbl"
    r = subprocess.run(
        [sys.executable, "-m", "kgcn_tpu.cli.chem", "--smiles", str(smi),
         "--label", str(lab), "--use-sybyl", "-o", str(out),
         "--atom-num-limit", "10"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = joblib.load(out)
    assert data["feature"].shape[-1] == expected


def test_gaff_atom_types():
    """GAFF typing (featurizer.gaff_atom_type — openbabel-free functional
    equivalent of the reference's force-field typer,
    kgcn/preprocessing/utils.py:57-79) on molecules with known types."""
    from kgcn_tpu.data import featurizer as fz
    from kgcn_tpu.data.molparse import parse_smiles as mol_from_smiles

    def types(smiles):
        mol = mol_from_smiles(smiles)
        return [fz.gaff_atom_type(a) for a in mol.GetAtoms()]

    assert types("CC") == ["c3", "c3"]                        # ethane
    assert types("C=C") == ["c2", "c2"]                       # ethene
    assert types("C#C") == ["c1", "c1"]                       # ethyne
    assert types("c1ccccc1") == ["ca"] * 6                    # benzene
    assert types("CC(=O)N") == ["c3", "c", "o", "n"]          # acetamide
    assert types("CC(=O)O") == ["c3", "c", "o", "oh"]         # acetic acid
    assert types("CC(=O)OC") == ["c3", "c", "o", "os", "c3"]  # methyl acetate
    assert types("CO") == ["c3", "oh"]                        # methanol
    assert types("COC") == ["c3", "os", "c3"]                 # dimethyl ether
    assert types("CN") == ["c3", "n3"]                        # methylamine
    assert types("C[NH3+]")[1] == "n4"                        # methylammonium
    assert types("CC#N") == ["c3", "c1", "n1"]                # acetonitrile
    assert types("C[N+](=O)[O-]")[1] == "no"                  # nitromethane
    assert types("c1ccncc1")[3] == "nb"                       # pyridine N
    assert types("c1cc[nH]c1")[3] == "na"                     # pyrrole N
    assert types("Nc1ccccc1")[0] == "nh"                      # aniline N
    assert types("NC(=[NH2+])N")[1] == "cz"                   # guanidinium C
    assert types("CS") == ["c3", "sh"]                        # methanethiol
    assert types("CSC") == ["c3", "ss", "c3"]                 # thioether
    t = types("CS(=O)(=O)C")                                  # sulfone
    assert t[1] == "s6"
    assert types("CS(=O)C")[1] == "s4"                        # sulfoxide
    assert types("C=S")[1] == "s"                             # thioformaldehyde C=S
    assert types("CP(C)C")[1] == "p3"                         # trimethylphosphine
    t = types("COP(=O)(OC)OC")                                # trimethyl phosphate
    assert t[2] == "p5"
    assert types("FC(Cl)(Br)I")[0] == "f"
    assert types("FC(Cl)(Br)I")[2:] == ["cl", "br", "i"]
    assert types("C1CC1") == ["cx", "cx", "cx"]               # cyclopropane


def test_gaff_conjugation_splitting():
    """Round-5 Kekulé-alternation typing (featurizer._gaff_conj): the
    cc/cd, ce/cf, nc/nd, ne/nf pairs and the biphenyl cp bridge, pinned
    against antechamber's literature assignments (GAFF bond law: same-type
    pairs joined by conjugated single bonds, different-type by the Kekulé
    double bonds — gaff.dat cc-cc 1.43 Å vs cc-cd 1.37 Å)."""
    from kgcn_tpu.data import featurizer as fz
    from kgcn_tpu.data.molparse import parse_smiles as mol_from_smiles

    def types(smiles):
        mol = mol_from_smiles(smiles)
        return [fz.gaff_atom_type(a) for a in mol.GetAtoms()]

    # 5-ring heteroaromatics: alpha carbons cc, betas cd, heteroatom fixed
    assert types("c1cc[nH]c1") == ["cd", "cd", "cc", "na", "cc"]  # pyrrole
    assert types("c1ccoc1") == ["cd", "cd", "cc", "os", "cc"]     # furan
    assert types("c1ccsc1") == ["cd", "cd", "cc", "ss", "cc"]     # thiophene
    # imidazole: both N-adjacent carbons cc; pyridine-type ring N nc/nd
    t = types("c1cnc[nH]1")
    assert t[0] == t[3] == "cc" and t[1] == "cd"
    assert t[2] in ("nc", "nd")
    assert t[4] == "na"
    # conjugated chains: inner atoms split, terminals stay c2
    assert types("C=CC=C") == ["c2", "ce", "ce", "c2"]      # butadiene
    assert types("C=CC=CC=C") == [
        "c2", "ce", "ce", "cf", "cf", "c2"]                 # hexatriene
    assert types("C=NC=C") == ["c2", "ne", "ce", "c2"]      # 1-aza-butadiene
    # furan-2-yl ketone: ring splitting survives exocyclic conjugation;
    # the carbonyl carbon stays the dedicated 'c' type
    assert types("CC(=O)c1ccco1") == [
        "c3", "c", "o", "cc", "cd", "cd", "cc", "os"]
    # pyrrole-imine chain: ring cc/cd + inner chain carbon ce; the imine N
    # is terminal (methyl on the other side) so it stays n2
    assert types("c1cc[nH]c1/C=N/C") == [
        "cd", "cd", "cc", "na", "cc", "ce", "n2", "c3"]
    # biphenyl: ipso carbons cp, the rest pure-aromatic ca
    t = types("c1ccc(-c2ccccc2)cc1")
    assert t.count("cp") == 2 and t.count("ca") == 10
    # 6-ring aromatics and fused 5+6 systems are NOT split: pyridine nb,
    # benzene/naphthalene all ca, indole 5-ring-only carbons cc/cd
    assert types("c1ccncc1")[3] == "nb"
    assert set(types("c1ccc2ccccc2c1")) == {"ca"}            # naphthalene
    t = types("c1ccc2[nH]ccc2c1")                            # indole
    assert t[5] == "cc" and t[6] == "cd"
    assert t.count("ca") == 6 and t[4] == "na"


def test_gaff_feature_vector_and_cli(tmp_path):
    """--use-gaff: the 71-type one-hot IS the whole feature vector
    (reference create_feature_matrix, utils.py:156-161), exclusive of the
    other feature flags (chem.py:139-140)."""
    import subprocess
    import sys

    import joblib

    from kgcn_tpu.data import featurizer as fz
    from kgcn_tpu.data.molparse import parse_smiles as mol_from_smiles

    mol = mol_from_smiles("CC(=O)N")
    f = fz.mol_gaff_features(mol)
    assert f.shape == (4, len(fz.GAFF_LIST))
    assert (f.sum(axis=1) == 1.0).all()
    assert f[0, fz.GAFF_LIST.index("c3")] == 1.0
    assert f[1, fz.GAFF_LIST.index("c")] == 1.0

    smi = tmp_path / "in.smi"
    smi.write_text("CC(=O)N\nc1ccccc1\n")
    lab = tmp_path / "labels.csv"
    lab.write_text("1\n0\n")
    out = tmp_path / "ds.jbl"
    r = subprocess.run(
        [sys.executable, "-m", "kgcn_tpu.cli.chem", "--smiles", str(smi),
         "--label", str(lab), "--use-gaff", "-o", str(out),
         "--atom-num-limit", "10"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    data = joblib.load(out)
    assert data["feature"].shape[-1] == len(fz.GAFF_LIST)

    # exclusivity matches the reference's documented constraint
    r2 = subprocess.run(
        [sys.executable, "-m", "kgcn_tpu.cli.chem", "--smiles", str(smi),
         "--label", str(lab), "--use-gaff", "--use-sybyl", "-o", str(out)],
        capture_output=True, text=True)
    assert r2.returncode != 0
