"""Knowledge-graph IG visualisation.

Reference: ``KnowledgeGraphVisualizer`` (kgcn/visualization.py:289-386) —
integrated gradients on the NODE-EMBEDDING layer of a whole-graph KG model,
restricted to a subgraph within ``graph_distance`` hops of the target nodes,
dumped as node/edge CSVs for downstream graph tooling.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kgcn_tpu.data.batcher import Batch


def embedding_ig(
    model,
    variables,
    batch: Batch,
    target_triples: np.ndarray,
    *,
    steps: int = 100,
) -> np.ndarray:
    """IG of the positive-triple scores w.r.t. the embedding table rows.

    ``target_triples``: [K, >=3] (h, r, t) — the score attributed is
    ``Σ_k s(h_k, r_k, t_k)``.  Returns [V, dim] attributions over node
    embeddings (reference scales the embedded layer, visualization.py:289-340).
    """
    emb_table = variables["params"]["embed"]["embedding"]

    def score_at(table):
        """F evaluated at this embedding table."""
        v = jax.tree_util.tree_map(lambda x: x, variables)
        v = {
            **v,
            "params": {**v["params"], "embed": {"embedding": table}},
        }
        z = model.apply(v, batch, method=model.node_embeddings)
        h = jnp.asarray(target_triples[:, 0])
        r = jnp.asarray(target_triples[:, 1])
        t = jnp.asarray(target_triples[:, 2])
        return jnp.sum(
            model.apply(v, z[h], z[t], r,
                        method=lambda m, zh, zt, rr: m.distmult.score(zh, zt, rr))
        )

    # IG with zero baseline: (1/m) Σ_k F'(x·s_k) ⊙ x — the gradient is taken
    # AT the scaled table so no spurious scale factor enters the Riemann sum
    grad_fn = jax.grad(score_at)

    def body(acc, scale):
        g = grad_fn(emb_table * scale)
        return acc + g, None

    scales = (jnp.arange(steps, dtype=jnp.float32) + 1.0) / steps
    acc, _ = jax.lax.scan(body, jnp.zeros_like(emb_table), scales)
    return np.asarray((acc / steps) * emb_table)


def subgraph_within(adjs, targets: Sequence[int], hops: int = 2):
    """Node set within ``hops`` of targets over the union adjacency
    (reference uses networkx ego graphs, visualization.py:345-366)."""
    import networkx as nx

    G = nx.Graph()
    for (r, c, v) in adjs:
        G.add_edges_from(zip(map(int, r), map(int, c)))
    keep = set()
    for t in targets:
        if int(t) in G:
            keep |= set(
                nx.single_source_shortest_path_length(G, int(t), cutoff=hops)
            )
        else:
            keep.add(int(t))
    return sorted(keep), G


def run_kg_visualization(config, raw=None) -> None:
    """CLI driver for KG embedding IG (reference:
    ``cal_feature_IG_for_kg``, kgcn/visualization.py:389-440, reached from
    ``kgcn visualize`` when ``visualize_type`` is not 'graph',
    gcn.py:651-658): per target triple, IG of its score on the embedding
    table, dumped as ``edgepred-{h}-{t}`` node/edge CSVs restricted to
    ``graph_distance`` hops."""
    import joblib

    from kgcn_tpu.data import build_dataset
    from kgcn_tpu.models.kg import KGBatcher
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.train import Trainer

    # load the raw dict once: build_dataset consumes it AND it carries the
    # id→name vocabulary (kgcn-tpu-kg's 'node_vocab') for the CSVs;
    # the CLI may pass its routing probe through to avoid a second load
    if raw is None:
        raw = joblib.load(config["dataset"])
    ds, info = build_dataset(raw, config)
    node_names = raw.get("node_vocab") if isinstance(raw, dict) else None
    model_name = config.get("model.py", "kg_distmult")
    if model_name in ("model", "gcn"):
        model_name = "kg_distmult"
    model = build_model(model_name, info, config)
    trainer = Trainer(model, config, info)
    kb = KGBatcher(ds, info, label_batch_size=config.get("label_batch_size"),
                   seed=int(config.get("seed", 0)))
    batch = kb.init_batch()
    state = trainer.init_state(batch, seed=0)
    path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.last.ckpt"
    )
    state = trainer.restore(state, path)
    print(f"[LOAD] {path}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    triples = np.asarray(ds.label_list[0], dtype=np.int32)[:, :3]  # (h, r, t)
    target = config.get("visualize_target")
    if target is None:
        n = int(config.get("visualize_num", len(triples)) or len(triples))
        targets = range(min(n, len(triples)))
    else:
        targets = [int(target)]
    outdir = config.get("visualize_path", "./visualization/")
    steps = int(config.get("ig_divide_number", 30))
    hops = int(config.get("graph_distance", 2))
    for t in targets:
        h, r, tl = (int(x) for x in triples[t])
        ig = embedding_ig(model, variables, batch, triples[t:t + 1],
                          steps=steps)
        print(f"edge target = {t} => {h}-{tl}")
        # the triple index keeps filenames unique — the reference's plain
        # edgepred-{h}-{t} silently overwrites same-pair triples
        dump_kg_ig_csv(outdir, ig, ds.adjs[0], targets=[h, tl], hops=hops,
                       node_names=node_names,
                       prefix=f"edgepred-{h}-{tl}-{t}")


def dump_kg_ig_csv(
    outdir: str,
    node_ig: np.ndarray,
    adjs,
    targets: Sequence[int],
    *,
    hops: int = 2,
    node_names: Optional[dict] = None,
    prefix: str = "kg",
):
    """Write node/edge CSVs for the IG-scored subgraph
    (reference: visualization.py:368-386)."""
    os.makedirs(outdir, exist_ok=True)
    nodes, G = subgraph_within(adjs, targets, hops)
    scores = node_ig.sum(axis=1)
    node_path = os.path.join(outdir, f"{prefix}_nodes.csv")
    with open(node_path, "w") as f:
        f.write("node,name,ig_score,is_target\n")
        tset = set(int(t) for t in targets)
        for n in nodes:
            name = (node_names or {}).get(n, str(n))
            f.write(f"{n},{name},{scores[n]:.6g},{int(n in tset)}\n")
    edge_path = os.path.join(outdir, f"{prefix}_edges.csv")
    nset = set(nodes)
    with open(edge_path, "w") as f:
        f.write("source,target,ig_score\n")
        for u, v in G.edges():
            if u in nset and v in nset:
                f.write(f"{u},{v},{(scores[u] + scores[v]) / 2:.6g}\n")
    print(f"[SAVE] {node_path}")
    print(f"[SAVE] {edge_path}")
    return node_path, edge_path
