"""Generate the tutorial notebooks (mirrors /root/reference/Notebook/:
kGCN_solpred.ipynb + kGCN_linkpred.ipynb, rebuilt for the TPU-native
framework).  Cells are kept in this script so tests can execute the exact
same sources headlessly (tests/test_notebooks.py)."""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

SOLPRED_CELLS = [
    ("markdown", """# Solubility prediction with kgcn_tpu

This tutorial mirrors the reference kGCN `kGCN_solpred.ipynb` notebook: a
toy single-task molecular property prediction from SMILES strings, using
the TPU-native framework.  No RDKit required — the built-in `molparse`
SMILES/SDF parser feeds the same 81-dimensional atom featurization.

Everything here runs on CPU or a TPU chip unchanged (JAX picks the
backend)."""),
    ("code", """import numpy as np

from kgcn_tpu.data import build_dataset, split_dataset, Batcher
from kgcn_tpu.data import featurizer as fz
from kgcn_tpu.data import molparse"""),
    ("markdown", """## 1. Dataset from SMILES

30 small molecules with binary solubility labels (the reference
notebook's toy set).  `build_chem_dataset` converts parsed molecules into
the standard `.jbl`-schema dict: per-graph adjacency COO channels +
padded `[G, N, 81]` atom features."""),
    ("code", """smiles = [
    "CCO", "CC(=O)O", "c1ccccc1", "CCN(CC)CC", "CC(C)O", "CCCCCC",
    "c1ccc2ccccc2c1", "CC(=O)Oc1ccccc1C(=O)O", "CCOC(=O)C", "CCCCO",
    "OCC(O)CO", "CC(C)(C)O", "c1ccncc1", "CC(N)=O", "CCOCC", "CCCCCCCC",
    "Clc1ccccc1", "OC(=O)c1ccccc1", "CNC", "CCC(=O)O", "CC#N", "CCCl",
    "c1ccc(cc1)O", "CC(C)CC(C)(C)C", "NCCO", "CCCCCl", "COC", "CCBr",
    "OCCO", "Cc1ccccc1",
]
labels = np.array(
    [[0, 1], [0, 1], [1, 0], [0, 1], [0, 1], [1, 0],
     [1, 0], [0, 1], [0, 1], [0, 1], [0, 1], [0, 1],
     [0, 1], [0, 1], [0, 1], [1, 0], [1, 0], [0, 1],
     [0, 1], [0, 1], [0, 1], [1, 0], [0, 1], [1, 0],
     [0, 1], [1, 0], [0, 1], [1, 0], [0, 1], [1, 0]], np.float32)

mols = [molparse.parse_smiles(s) for s in smiles]
data = fz.build_chem_dataset(mols, labels=labels, atom_num_limit=50,
                             generate_mol_info=False)
print("features:", data["feature"].shape, " graphs:", len(data["adj"]))"""),
    ("markdown", """## 2. Build the device dataset and batcher

`build_dataset` applies the configured adjacency transforms (Kipf
normalisation here) and returns the host `Dataset` plus its static
`DatasetInfo`; the `Batcher` assembles fixed-shape device batches so the
jitted train step compiles exactly once."""),
    ("code", """config = {
    "task": "classification",
    "normalize_adj_flag": True,
    "learning_rate": 0.01,
    "epoch": 20,
    "batch_size": 10,
    "save_model_path": "/tmp/nb_sol_model",
}
ds, info = build_dataset(data, config)
train_ds, valid_ds, _, _ = split_dataset(ds, 0.3, seed=0)
print(f"train={train_ds.num} valid={valid_ds.num} "
      f"feature_dim={info.feature_dim} max_nodes={info.graph_node_num}")"""),
    ("markdown", """## 3. Model + training

Models come from the registry (`gcn` = the reference's 3-layer GCN,
`example_model/model.py`).  `Trainer.fit` is the full epoch loop:
validation, early stopping, best/last checkpoints — all jit-compiled,
device-resident when the dataset fits HBM."""),
    ("code", """from kgcn_tpu.models.registry import build_model
from kgcn_tpu.runtime.train import Trainer

model = build_model("gcn", info, config)
trainer = Trainer(model, config, info)
tb = Batcher(train_ds, info, config["batch_size"], seed=0)
vb = Batcher(valid_ds, info, config["batch_size"], seed=0)
state = trainer.init_state(tb.make_batch(np.arange(tb.batch_size)), seed=0)
state, fit_info = trainer.fit(state, tb, vb)
print("best validation cost:", fit_info["best_validation_cost"])"""),
    ("markdown", """## 4. Evaluate"""),
    ("code", """ev = trainer.evaluate(state, vb, "validation_")
print("validation accuracy:", float(ev["metrics"]["validation_accuracy"]))
probs = np.asarray(ev["prediction"])
print("per-molecule P(soluble):", probs[:5, 1].round(3))"""),
    ("markdown", """## 5. Explain predictions with Integrated Gradients

The IG program (forward, 100-step Riemann sum, completeness check) runs
as ONE jitted scan — atom attributions plus the completeness oracle
`sum(IG) ≈ F(1) − F(0)` the reference saves with every visualisation."""),
    ("code", """import jax

from kgcn_tpu.explain.ig import integrated_gradients

b1 = Batcher(valid_ds, info, 1)
variables = {"params": state.params, "batch_stats": state.batch_stats}
igs, check = integrated_gradients(
    jax.tree_util.Partial(model.apply), variables,
    b1.make_batch(np.asarray([0])), target="max", steps=50,
)
print("atom attribution matrix:", igs["features_IG"].shape)
print("completeness:", check)"""),
]

LINKPRED_CELLS = [
    ("markdown", """# Link prediction on a knowledge graph with kgcn_tpu

Mirror of the reference `kGCN_linkpred.ipynb`: DistMult link prediction
over one whole graph (the reference's `sample_kg` protocol — batch=1,
preference pairs with negative sampling), TPU-native: the whole epoch is
one jitted dispatch, and the same model scales to sharded multi-chip
training via `parallel/big_graph.py`."""),
    ("code", """import numpy as np

from kgcn_tpu.data import build_dataset
from kgcn_tpu.data.synthetic import make_kg_dataset
from kgcn_tpu.models.registry import build_model
from kgcn_tpu.models.kg import KGBatcher
from kgcn_tpu.runtime.train import Trainer"""),
    ("markdown", """## 1. A toy knowledge graph

`make_kg_dataset` builds the `.jbl` KG schema: per-relation adjacency
channels (+ inverse and self-loop edges) and a `label_list` of
(positive, negative) triple pairs — the reference's
`kgcn/preprocessing/kg.py` layout."""),
    ("code", """data = make_kg_dataset(num_entities=200, num_relations=2, seed=0)
config = {
    "task": "link_prediction",
    "learning_rate": 0.01,
    "epoch": 20,
    "with_feature": False,
    "with_node_embedding": True,   # featureless mode: learn an embedding
    "embedding_dim": 64,
    "save_model_path": "/tmp/nb_kg_model",
}
ds, info = build_dataset(data, config)
print("entities:", info.all_node_num, " channels:", info.adj_channel_num)"""),
    ("markdown", """## 2. Train DistMult"""),
    ("code", """model = build_model("kg_distmult", info, config)
trainer = Trainer(model, config, info)
kb = KGBatcher(ds, info, seed=0)
state = trainer.init_state(kb.init_batch(), seed=0)
for epoch in range(config["epoch"]):
    state, cost, metrics, _ = trainer.run_epoch(state, kb)
    if epoch % 5 == 0 or epoch == config["epoch"] - 1:
        tc = sum(float(m["correct_count"]) for m in metrics)
        tn = sum(float(m["count"]) for m in metrics)
        print(f"epoch {epoch}: cost {float(cost):.4f} "
              f"rank-acc {tc / max(tn, 1):.3f}")"""),
    ("markdown", """## 3. Score and rank entities

`DistMult.score` scores (head, relation, tail) triples;
`left_prediction`/`right_prediction` score EVERY entity as head/tail for
ranking metrics (MRR, hits@k) — the reference's `compute_score`
interface (kgcn/layers.py:321-347)."""),
    ("code", """import jax.numpy as jnp

variables = {"params": state.params}
batch = kb.init_batch()
# score every entity as head for two (relation, tail) queries
scores = model.apply(
    variables, batch, jnp.asarray([2, 3]), jnp.asarray([0, 0]),
    method=model.left_prediction,
)
ranks = (scores >= scores[np.arange(2), [0, 1]][:, None]).sum(axis=1)
print("all-entity score matrix:", scores.shape, " example ranks:",
      np.asarray(ranks))"""),
]


def build(cells):
    nb = {
        "cells": [],
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    for kind, src in cells:
        cell = {
            "cell_type": kind,
            "metadata": {},
            "source": src.splitlines(keepends=True),
        }
        if kind == "code":
            cell.update({"execution_count": None, "outputs": []})
        nb["cells"].append(cell)
    return nb


def main():
    for name, cells in (("kgcn_tpu_solpred.ipynb", SOLPRED_CELLS),
                        ("kgcn_tpu_linkpred.ipynb", LINKPRED_CELLS)):
        path = os.path.join(HERE, name)
        with open(path, "w") as f:
            json.dump(build(cells), f, indent=1)
        print("[SAVE]", path)


if __name__ == "__main__":
    main()
