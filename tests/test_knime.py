"""KNIME node support: the Python helper pipeline every Java node invokes
(kgcn_tpu/knime/helpers.py ↔ reference KNIME/GCN-K/py/*.py) runs end to end
on real SDF data, its dataset output trains through the CLI, and the plugin
generator emits the full 16-node source tree."""
import json
import os
import subprocess
import sys

import joblib
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SDF = "/root/reference/KNIME/testdata/singletask/SDF_wash.sdf"
LABELS = "/root/reference/KNIME/testdata/singletask/labels.csv"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Run the full preprocessing chain once (truncated SDF for speed)."""
    if not os.path.exists(SDF):
        pytest.skip("reference testdata missing")
    from kgcn_tpu.knime import helpers as H

    d = tmp_path_factory.mktemp("knime")
    # first 40 molecules + labels, atom limit low enough to drop some
    records = open(SDF).read().split("$$$$\n")[:40]
    sdf = d / "mols.sdf"
    sdf.write_text("$$$$\n".join(records) + "$$$$\n")
    lab = d / "labels.csv"
    lab.write_text(
        "".join(line for i, line in enumerate(open(LABELS)) if i < 40)
    )

    H.prep_mol_info(str(sdf), 12, str(d / "mol_info.jbl"))
    H.prep_adj(str(d / "mol_info.jbl"), str(d / "adjacent.jbl"))
    H.prep_feat(str(d / "mol_info.jbl"), str(d / "atom_feature.jbl"))
    H.prep_label(str(lab), str(d / "label.jbl"))
    H.prep_dataset(str(d / "label.jbl"), str(d / "adjacent.jbl"),
                   str(d / "atom_feature.jbl"), str(d / "dataset.jbl"))
    H.clean_dataset(str(d / "dataset.jbl"), str(d / "dataset_clean.jbl"))
    return d


def test_pipeline_schema(pipeline):
    d = pipeline
    raw = joblib.load(d / "dataset.jbl")
    clean = joblib.load(d / "dataset_clean.jbl")
    assert raw["max_node_num"] == 12
    assert len(raw["adj"]) == 40 == len(raw["label"])
    dropped = sum(1 for a in raw["adj"] if a is None)
    assert dropped > 0, "atom limit should drop some molecules"
    assert len(clean["adj"]) == 40 - dropped == len(clean["label"])
    assert clean["feature"][0].shape == (12, 81)  # padded 81-dim schema
    idx, val, shape = clean["adj"][0]
    assert (idx[:, 0] == idx[:, 1]).any()  # self loops present


def test_split_dataset(pipeline):
    from kgcn_tpu.knime import helpers as H

    d = pipeline
    o1, o2 = H.split_dataset(str(d / "dataset_clean.jbl"), 0.5,
                             str(d / "s1.jbl"), str(d / "s2.jbl"))
    n = len(joblib.load(d / "dataset_clean.jbl")["adj"])
    assert len(o1["adj"]) + len(o2["adj"]) == n
    assert abs(len(o1["adj"]) - n // 2) <= 1


def test_clean_dataset_trains_through_cli(pipeline, tmp_path):
    """The node chain's output is a valid dataset for GCNLearner's exact
    invocation: python gcn.py train --config <generated json>."""
    d = pipeline
    cfg = {
        "model.py": "gcn",
        "dataset": str(d / "dataset_clean.jbl"),
        "validation_data_rate": 0.3,
        "epoch": 2,
        "batch_size": 8,
        "learning_rate": 0.01,
        "normalize_adj_flag": True,
        "task": "classification",
        "save_model_path": str(tmp_path / "model"),
        "make_plot": False,
    }
    cfg_path = tmp_path / "train.json"
    cfg_path.write_text(json.dumps(cfg))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "gcn.py"), "train",
         "--config", str(cfg_path), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**os.environ, "KGCN_PREFETCH": "0"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "training time" in out.stdout


def test_modality_helpers(pipeline, tmp_path):
    from kgcn_tpu.knime import helpers as H

    pf = tmp_path / "profeat.csv"
    pf.write_text("\n".join("1.0,2.0,3.0" for _ in range(5)) + "\n")
    sq = tmp_path / "seq.csv"
    sq.write_text("1,2,3\n4,5\n1\n2,2,2,2\n3\n")
    mod = H.preprocess_modality(str(tmp_path / "mod.jbl"),
                                profeat=str(pf), sequence=str(sq))
    assert mod["profeat"].shape == (5, 3)
    assert mod["sequence"].shape == (5, 4)
    assert mod["sequence_symbol_num"] == 6
    merged = H.add_modality(str(pipeline / "dataset_clean.jbl"),
                            str(tmp_path / "mod.jbl"),
                            str(tmp_path / "merged.jbl"))
    assert "profeat" in merged and "adj" in merged


def test_gcn_score_csv(tmp_path):
    from kgcn_tpu.knime import helpers as H

    pred = np.random.RandomState(0).random_sample((6, 2))
    joblib.dump({"prediction_data": pred}, tmp_path / "p.jbl")
    H.gcn_score(str(tmp_path / "p.jbl"), str(tmp_path / "score.csv"))
    rows = [r for r in open(tmp_path / "score.csv").read().splitlines() if r]
    assert len(rows) == 6
    np.testing.assert_allclose(
        [float(x) for x in rows[0].split(",")], pred[0]
    )


def test_py_shims_exist_and_run(tmp_path):
    """One shim per reference helper script; each runs standalone."""
    ref_scripts = {
        "prep_mol_info", "prep_adj", "prep_feat", "prep_label",
        "prep_dataset", "clean_dataset", "split_dataset", "add_modality",
        "preprocess_modality", "gcn_score", "gcn_score_viewer",
        "graph_viewer",
    }
    have = {f[:-3] for f in os.listdir(os.path.join(REPO, "KNIME", "py"))
            if f.endswith(".py")}
    assert ref_scripts <= have, ref_scripts - have
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "KNIME", "py", "prep_label.py"),
         "--label", "/dev/null", "--output", str(tmp_path / "l.jbl")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-1500:]


REF_PLUGIN = "/root/reference/KNIME/GCN-K"


@pytest.mark.skipif(not os.path.isdir(REF_PLUGIN),
                    reason="reference KNIME plugin not mounted")
def test_plugin_structural_parity_with_reference():
    """Golden-diff of the COMMITTED generated plugin (KNIME/GCN-K-TPU)
    against the reference Eclipse plugin's structure (VERDICT r04 #9 —
    compile verification is impossible without a JDK, structural parity is
    the checkable contract):

    * every reference node dir exists with NodeFactory/NodeModel/NodeDialog
      + a NodeFactory.xml;
    * plugin.xml registers every node factory;
    * MANIFEST.MF mirrors the reference bundle wiring (same Require-Bundle
      set, one Export-Package per node, lazy activation, an Activator);
    * per-node KNIME settings keys are a SUPERSET of the reference
      NodeModel's CFGKEY strings — a workflow saved with the reference
      plugin loads into this one.
    """
    import re

    ours = os.path.join(REPO, "KNIME", "GCN-K-TPU")
    ref_nodes_dir = os.path.join(REF_PLUGIN, "src/org/gcnk/knime/nodes")
    our_nodes_dir = os.path.join(ours, "src/org/kgcn/tpu/knime/nodes")
    ref_nodes = sorted(
        d for d in os.listdir(ref_nodes_dir)
        if os.path.isdir(os.path.join(ref_nodes_dir, d))
    )
    assert ref_nodes, "reference plugin has no node dirs?"

    plugin_xml = open(os.path.join(ours, "plugin.xml")).read()
    manifest = open(os.path.join(ours, "META-INF", "MANIFEST.MF")).read()

    for node in ref_nodes:
        d = os.path.join(our_nodes_dir, node)
        assert os.path.isdir(d), f"missing node dir {node}"
        for role in ("NodeFactory.java", "NodeModel.java",
                     "NodeDialog.java", "NodeFactory.xml"):
            assert os.path.isfile(os.path.join(d, f"{node}{role}")), (
                node, role)
        assert f"{node}.{node}NodeFactory" in plugin_xml, node
        assert f"org.kgcn.tpu.knime.nodes.{node}" in manifest, node

        # settings-key superset: CFGKEY strings from the reference model
        ref_model = open(os.path.join(
            ref_nodes_dir, node, f"{node}NodeModel.java")).read()
        ref_keys = set(re.findall(
            r'CFGKEY_[A-Z_0-9]+\s*=\s*"([^"]*)"', ref_model))
        our_model = open(os.path.join(d, f"{node}NodeModel.java")).read()
        our_keys = set(re.findall(
            r'new\s+SettingsModel\w+\("([^"]*)"', our_model))
        missing = ref_keys - our_keys
        assert not missing, (node, missing)

    # bundle wiring: the reference's Require-Bundle set, verbatim
    ref_manifest = open(os.path.join(REF_PLUGIN, "META-INF",
                                     "MANIFEST.MF")).read()

    def bundles(m):
        block = re.search(r"Require-Bundle:(.*?)(?=\n\S)", m, re.S)
        return {b.strip() for b in block.group(1).split(",") if b.strip()}

    assert bundles(manifest) == bundles(ref_manifest)
    assert "Bundle-ActivationPolicy: lazy" in manifest
    assert "Bundle-Activator: org.kgcn.tpu.knime.nodes.Activator" in manifest
    assert os.path.isfile(os.path.join(our_nodes_dir, "Activator.java"))


def test_plugin_generator_covers_all_reference_nodes(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "KNIME"))
    import plugin_gen

    ref_nodes = {
        "SDFReader", "CSVLabelExtractor", "AtomFeatureExtractor",
        "GraphExtractor", "AddModality", "AdditionalModalityPreprocessor",
        "GCNDatasetBuilder", "GCNDatasetSplitter", "GCNLearner",
        "GCNPredictor", "GCNScore", "GCNScoreViewer", "GCNGraphViewer",
        "GCNVisualizer",
    }
    assert ref_nodes <= set(plugin_gen.NODE_SPECS)
    files = plugin_gen.generate(str(tmp_path / "plugin"))
    assert len(files) >= 4 * len(plugin_gen.NODE_SPECS) + 2
    # every generated java file is balanced and references the base class
    for f in files:
        if f.endswith("NodeModel.java") and "GCNTpuNodeModel" not in f:
            src = open(f).read()
            assert src.count("{") == src.count("}"), f
            assert "GCNTpuNodeModel" in src
    xml = open(str(tmp_path / "plugin" / "plugin.xml")).read()
    for n in plugin_gen.NODE_SPECS:
        assert f"{n}.{n}NodeFactory" in xml
