"""Integrated Gradients explainability.

TPU-native rewrite of the reference visualizer (kgcn/visualization.py:22-287):
the reference runs 100 sequential ``sess.run`` calls with re-scaled
feed_dicts; here the whole IG sum is ONE jit-compiled ``lax.scan`` over
scaling steps — gradients via ``jax.grad`` on a closure over the batch.

Methods (reference ``cal_integrated_gradients``, kgcn/visualization.py:187-266):
``ig`` (sum of grad·input over scalings), ``grad``, ``grad_prod``,
``smooth_grad``, ``smooth_ig``.  The completeness oracle
``sum(IG) ≈ F(1) − F(0)`` is computed exactly as the reference's ``check_IG``
(kgcn/visualization.py:279-287) and saved with every dump.

Output: per-sample joblib dicts with the reference's schema —
``features``, ``features_IG``, ``adjs``, ``adjs_IG``, ``check_score``,
``sum_of_IG`` (kgcn/visualization.py:134-162) — readable by gcnvisualizer.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kgcn_tpu.data.batcher import Batch


def _scale_batch(batch: Batch, scale, noise_rng=None, noise_scale: float = 0.1):
    """Scale the IG target modalities (features + adjacency values) by
    ``scale``; optionally add Gaussian noise (smooth-grad variants,
    reference: kgcn/feed.py:88-89,120-131)."""
    g = batch.graph
    nodes = g.nodes
    if nodes is not None:
        if noise_rng is not None:
            nodes = nodes + noise_scale * jax.random.normal(
                noise_rng, nodes.shape
            )
        nodes = nodes * scale
    ew = g.edge_weights * scale
    vm = batch.vector_modal
    if vm is not None:
        vm = tuple(v * scale for v in vm)
    return batch.replace(
        graph=g.replace(nodes=nodes, edge_weights=ew), vector_modal=vm
    )


def make_target_score(mode, label_index: Optional[int] = None):
    """Select the scalar output to attribute
    (reference ig_label_target: kgcn/visualization.py:497-530)."""

    def score(prediction, labels):
        pred = prediction
        if pred.ndim == 3:  # multitask [B, T, 2] → positive-class slice
            pred = pred[..., 1]
        if mode == "max":
            return jnp.sum(jnp.max(pred, axis=-1))
        if mode == "label":
            idx = jnp.argmax(labels, axis=-1)
            return jnp.sum(jnp.take_along_axis(pred, idx[:, None], axis=-1))
        if mode == "index":
            return jnp.sum(pred[..., label_index])
        raise ValueError(mode)

    return score


from functools import partial


@partial(jax.jit, static_argnames=("method", "target", "label_index", "noisy"))
def _ig_core(apply_fn, variables, batch, scales, rngs, *, method, target,
             label_index, noisy):
    """The entire IG computation — scaling scan, gradient accumulation, and
    completeness oracle — as ONE jitted program.  Compiled once per
    (shape, method, target); the reference pays 100 sess.run round trips
    per compound for the same quantity (kgcn/visualization.py:201-212)."""
    score_fn = make_target_score(target, label_index)
    vm0 = batch.vector_modal  # tuple of [B, D_m] arrays, or None

    def forward(nodes, edge_weights, vm, b: Batch):
        g = b.graph.replace(nodes=nodes, edge_weights=edge_weights)
        nb = b.replace(graph=g)
        if vm is not None:
            nb = nb.replace(vector_modal=vm)
        out = apply_fn(variables, nb, train=False)
        return score_fn(out.prediction, b.labels)

    # vector modalities are scaled AND differentiated alongside features and
    # adjacency — the gradient path must see the same scaled inputs the
    # completeness oracle evaluates, or sum(IG) can never match F(1)−F(0)
    argnums = (0, 1, 2) if vm0 is not None else (0, 1)
    grad_fn = jax.grad(forward, argnums=argnums)
    nodes0 = batch.graph.nodes
    ew0 = batch.graph.edge_weights

    def body(carry, inp):
        scale, key = inp
        nb = _scale_batch(batch, scale, key if noisy else None)
        g = grad_fn(nb.graph.nodes, nb.graph.edge_weights,
                    nb.vector_modal if vm0 is not None else None, batch)
        return jax.tree_util.tree_map(jnp.add, carry, tuple(g)), None

    init = (jnp.zeros_like(nodes0), jnp.zeros_like(ew0))
    if vm0 is not None:
        init = init + (tuple(jnp.zeros_like(v) for v in vm0),)
    gsum, _ = jax.lax.scan(body, init, (scales, rngs))
    gsum_n, gsum_e = gsum[0], gsum[1]
    gsum_vm = gsum[2] if vm0 is not None else None
    k = scales.shape[0]
    if method in ("ig", "grad_prod", "smooth_ig"):
        ig_nodes = (gsum_n / k) * nodes0
        ig_edges = (gsum_e / k) * ew0
        ig_vm = (
            tuple((gv / k) * v for gv, v in zip(gsum_vm, vm0))
            if vm0 is not None else None
        )
    else:  # pure gradients
        ig_nodes = gsum_n / k
        ig_edges = gsum_e / k
        ig_vm = (
            tuple(gv / k for gv in gsum_vm) if vm0 is not None else None
        )

    # completeness: F(1) - F(0)  (kgcn/visualization.py:279-287)
    def f_at(scale):
        nb = _scale_batch(batch, scale)
        out = apply_fn(variables, nb, train=False)
        return score_fn(out.prediction, batch.labels)

    check_score = f_at(1.0) - f_at(0.0)
    sum_of_ig = jnp.sum(ig_nodes) + jnp.sum(ig_edges)
    if ig_vm is not None:
        for v in ig_vm:
            sum_of_ig = sum_of_ig + jnp.sum(v)
    return ig_nodes, ig_edges, ig_vm, check_score, sum_of_ig


def integrated_gradients(
    apply_fn,
    variables,
    batch: Batch,
    *,
    steps: int = 100,
    method: str = "ig",
    target: str = "max",
    label_index: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Compute IG for node features and adjacency values of ``batch``.

    Returns ``(igs, check)`` where ``igs`` has ``features_IG`` [V, F] and
    ``adjs_IG`` [C, E] (per-edge attributions), and ``check`` carries the
    completeness oracle (``check_score`` = F(1) − F(0), ``sum_of_IG``).
    """
    if not isinstance(apply_fn, jax.tree_util.Partial):
        apply_fn = jax.tree_util.Partial(apply_fn)  # jit-traceable callable
    if method in ("ig", "smooth_ig"):
        scales = (jnp.arange(steps, dtype=jnp.float32) + 1.0) / steps
    elif method in ("grad", "grad_prod", "smooth_grad"):
        scales = jnp.ones((steps if method == "smooth_grad" else 1,), jnp.float32)
    else:
        raise ValueError(method)

    noisy = method in ("smooth_grad", "smooth_ig")
    rngs = (
        jax.random.split(rng if rng is not None else jax.random.PRNGKey(0),
                         len(scales))
        if noisy
        else jnp.zeros((len(scales), 2), jnp.uint32)
    )

    ig_nodes, ig_edges, ig_vm, check_score, sum_of_ig = _ig_core(
        apply_fn, variables, batch, scales, rngs,
        method=method, target=target, label_index=label_index, noisy=noisy,
    )
    igs = {"features_IG": np.asarray(ig_nodes), "adjs_IG": np.asarray(ig_edges)}
    if ig_vm is not None:
        igs["vector_modal_IG"] = [np.asarray(v) for v in ig_vm]
    return (
        igs,
        {"check_score": float(check_score), "sum_of_IG": float(sum_of_ig)},
    )


@partial(jax.jit, static_argnames=("model", "steps", "target", "label_index"))
def _embedded_ig_core(model, variables, batch, *, steps, target,
                      label_index):
    """Module-level jitted core — a per-call ``@jax.jit`` closure would
    retrace the grad-of-scan for EVERY sample.  The flax module is a frozen
    (hashable) dataclass, so it keys the cache as a static argument."""
    score_fn = make_target_score(target, label_index)
    emb0 = model.apply(variables, batch.sequences, method=model.embedding)

    def forward(emb):
        out = model.apply(variables, batch, train=False, embedded=emb)
        return score_fn(out.prediction, batch.labels)

    grad_fn = jax.grad(forward)
    scales = (jnp.arange(steps, dtype=jnp.float32) + 1.0) / steps

    def body(acc, s):
        return acc + grad_fn(emb0 * s), None

    gsum, _ = jax.lax.scan(body, jnp.zeros_like(emb0), scales)
    ig = (gsum / steps) * emb0
    check = forward(emb0) - forward(jnp.zeros_like(emb0))
    return emb0, ig, check


def embedded_layer_ig(
    model,
    variables,
    batch: Batch,
    *,
    steps: int = 100,
    target: str = "max",
    label_index: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, float]]:
    """IG on the SEQUENCE-EMBEDDING layer output — integer sequences are not
    differentiable, so the reference scales the embedded layer instead
    (``feed_embedded_layer=True``, kgcn/visualization.py:64,123-126,302-320;
    model hook ``embedding()``, example_model/model_multimodal.py:122-126).

    Returns ``(embedded_layer [B,L,D], embedded_layer_IG, check)``.
    """
    emb0, ig, check_score = _embedded_ig_core(
        model, variables, batch,
        steps=steps, target=target, label_index=label_index,
    )
    ig = np.asarray(ig)
    return (
        np.asarray(emb0),
        ig,
        {"check_score": float(check_score), "sum_of_IG": float(np.sum(ig))},
    )


def edge_ig_to_dense(graph, ig_edges: np.ndarray) -> np.ndarray:
    """Scatter per-edge IG into dense [C, B, N, N] (what gcnvisualizer's
    adjacency heatmap expects)."""
    C, E = ig_edges.shape
    B, N = graph.n_graph, graph.max_nodes
    out = np.zeros((C, B, N, N), np.float32)
    s = np.asarray(graph.senders)
    r = np.asarray(graph.receivers)
    ne = np.asarray(graph.n_edge)
    for c in range(C):
        k = int(ne[c])
        b = r[c, :k] // N
        # np.add.at: fancy-index += would drop duplicate (r, s) pairs
        # (multigraphs / duplicate KG triples)
        np.add.at(out[c], (b, r[c, :k] % N, s[c, :k] % N), ig_edges[c, :k])
    return out


def run_visualization(config) -> None:
    """Drive IG over a dataset, one sample at a time, dumping per-sample jbl
    files (reference: gcn.py:637-657 + cal_feature_IG,
    kgcn/visualization.py:442-574)."""
    import joblib

    from kgcn_tpu.data import Batcher, load_jbl
    from kgcn_tpu.models.registry import build_model
    from kgcn_tpu.runtime.train import Trainer

    ds, info = load_jbl(config["dataset"], config)
    model = build_model(config["model.py"], info, config)
    trainer = Trainer(model, config, info)
    b1 = Batcher(ds, info, batch_size=1)
    state = trainer.init_state(b1.make_batch(np.arange(1)), seed=0)
    load_path = config.get("load_model") or os.path.join(
        config.get("save_model_path", "model"), "model.best.ckpt"
    )
    state = trainer.restore(state, load_path)
    print(f"[LOAD] {load_path}")

    outdir = config.get("visualize_path", "./visualization/")
    os.makedirs(outdir, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    target = config.get("visualize_type", "max")
    if target == "graph":  # the reference's dispatch value (gcn.py:651) —
        target = "max"     # it selects THIS path, not an IG target mode
    num = int(config.get("visualize_num", ds.num) or ds.num)
    steps = int(config.get("ig_divide_number", 100))
    # ig | grad | grad_prod | smooth_grad | smooth_ig (module docstring)
    method = str(config.get("visualize_method", "ig"))
    if ds.features is None:
        raise ValueError(
            "IG visualization needs dense node features; embedding-mode "
            "graphs (with_node_embedding / KG) use the kg_ig visualizer "
            "(task: link_prediction routes there automatically)"
        )

    apply_fn = jax.tree_util.Partial(model.apply)
    for i in range(min(num, ds.num)):
        batch = b1.make_batch(np.asarray([i]))
        # target-selection modes (reference ig_label_target,
        # kgcn/visualization.py:497-530): correct/uncorrect filter samples by
        # predicted-vs-true class; 'all' loops every class; int = class index
        ig_target, label_index = target, None
        if isinstance(target, (int, np.integer)) or (
            isinstance(target, str) and target.isdigit()
        ):
            # reference class-index mode (ig_label_target = int)
            ig_target, label_index = "index", int(target)
        if target in ("correct", "uncorrect", "all"):
            out = apply_fn(variables, batch, train=False)
            pred = np.asarray(out.prediction)
            pred2 = pred[..., 1] if pred.ndim == 3 else pred
            pred_cls = int(np.argmax(pred2[0]))
            true_cls = int(np.argmax(np.asarray(batch.labels)[0]))
            if target == "correct" and pred_cls != true_cls:
                continue
            if target == "uncorrect" and pred_cls == true_cls:
                continue
            if target == "all":
                for cls in range(pred2.shape[-1]):
                    igs, check = _compute_igs(
                        apply_fn, model, variables, batch, steps,
                        "index", cls, method,
                    )
                    _dump_ig(outdir, i, f"class{cls}", batch, igs, check, info)
                continue
            ig_target, label_index = "index", pred_cls
        igs, check = _compute_igs(
            apply_fn, model, variables, batch, steps, ig_target, label_index,
            method,
        )
        _dump_ig(outdir, i, str(target), batch, igs, check, info)


def _compute_igs(apply_fn, model, variables, batch, steps, target,
                 label_index, method="ig"):
    """All modality IGs for one sample — per-input IG plus the
    embedded-layer IG for sequence models (every target mode, including the
    per-class 'all' loop)."""
    igs, check = integrated_gradients(
        apply_fn, variables, batch, steps=steps, target=target,
        label_index=label_index, method=method,
    )
    if batch.sequences is not None and hasattr(model, "embedding"):
        emb, emb_ig, emb_check = embedded_layer_ig(
            model, variables, batch, steps=steps, target=target,
            label_index=label_index,
        )
        igs["embedded_layer"] = emb
        igs["embedded_layer_IG"] = emb_ig
        check["embedded_check_score"] = emb_check["check_score"]
        check["embedded_sum_of_IG"] = emb_check["sum_of_IG"]
    return igs, check


def _squeeze_c(dense):
    """[C, N, N] → [N, N] for the common single-channel case."""
    return dense[0] if dense.shape[0] == 1 else dense


def _dump_ig(outdir, i, tag, batch, igs, check, info) -> None:
    import joblib

    g = batch.graph
    N = g.max_nodes
    out = {
        "features": np.asarray(g.nodes).reshape(N, -1),
        "features_IG": igs["features_IG"].reshape(N, -1),
        # [C, N, N] (channel 0 only would drop multi-relation attributions);
        # single-channel datasets keep the legacy [N, N] shape
        "adjs": _squeeze_c(edge_ig_to_dense(g, np.asarray(g.edge_weights))[:, 0]),
        "adjs_IG": _squeeze_c(edge_ig_to_dense(g, igs["adjs_IG"])[:, 0]),
        **check,
    }
    if "vector_modal_IG" in igs:
        out["vector_modal"] = [np.asarray(v)[0] for v in batch.vector_modal]
        out["vector_modal_IG"] = [v[0] for v in igs["vector_modal_IG"]]
    if "embedded_layer_IG" in igs:
        out["embedded_layer"] = igs["embedded_layer"][0]
        out["embedded_layer_IG"] = igs["embedded_layer_IG"][0]
    if info.mol_info is not None and "obj_list" in info.mol_info:
        try:
            out["mol"] = info.mol_info["obj_list"][i]
        except Exception:
            pass
    path = os.path.join(outdir, f"mol_{i:05d}_{tag}.jbl")
    joblib.dump(out, path)
    rel_err = (
        abs(check["sum_of_IG"] - check["check_score"])
        / (abs(check["check_score"]) + 1e-12)
    )
    print(
        f"[SAVE] {path} (check: F(1)-F(0)={check['check_score']:.4f} "
        f"sum_IG={check['sum_of_IG']:.4f} rel_err={rel_err:.3f})"
    )
