"""``spmm_backend`` resolution: map a dataset's shape to an execution path.

The reference selects its native ops with build-time flags that default ON
(kgcn/layers.py:19-29) — a user gets the fast bspmm/bconv kernels without
writing anything in the config.  ``spmm_backend: "auto"`` (our default,
runtime/config.py:66) mirrors that: the heuristic below picks the fastest
shipped path for the dataset at build time, while any explicit backend name
in the config still wins.

Decision table (measured regimes, docs/performance.md + MEASURED.md):

* ``dense``  — padded node count ≤ ``DENSE_MAX_NODES`` (molecular graphs):
               aggregation is a batched MXU matmul, ~100× the scatter paths.
* ``stream`` — whole-graph workloads (``task: link_prediction`` /
               ``with_node_embedding``) beyond the dense threshold: the
               receiver-sorted streaming scatter kernel
               (ops/stream_spmm.py), 3.5× ELL-XLA on scattered graphs.
* ``tiled``  — block-diagonal mega-batches beyond the dense threshold
               (reaction-scale batches, batch_size > 1): the one-hot MXU
               kernel (ops/tiled_spmm.py) with graph-aligned tiles.
* ``xla``    — fallback when nothing above applies.
"""
from __future__ import annotations

DENSE_MAX_NODES = 256

_EXPLICIT = ("dense", "xla", "pallas", "tiled", "stream")


def choose_backend(config: dict, info) -> str:
    """Resolve the config's ``spmm_backend`` against the dataset ``info``.

    Explicit names pass through untouched; ``"auto"`` applies the decision
    table above using the padded per-graph node count
    (``info.graph_node_num``), the whole-graph node count
    (``info.all_node_num``) and the task routing keys.
    """
    name = str(config.get("spmm_backend", "auto"))
    if name in _EXPLICIT:
        return name
    whole_graph = (
        config.get("task") == "link_prediction"
        or bool(config.get("with_node_embedding"))
    )
    n = int(getattr(info, "graph_node_num", 0) or 0)
    v = int(getattr(info, "all_node_num", 0) or 0)
    if whole_graph:
        return "dense" if 0 < max(n, v) <= DENSE_MAX_NODES else "stream"
    if 0 < n <= DENSE_MAX_NODES:
        return "dense"
    # beyond the dense threshold: block-diagonal batches take the tiled
    # MXU kernel; a single big graph (node-centric tasks) streams
    if int(config.get("batch_size", 1) or 1) > 1:
        return "tiled"
    return "stream" if max(n, v) > DENSE_MAX_NODES else "xla"


def apply_backend(name: str, config: dict | None = None, *,
                  log: bool = True) -> None:
    """Flip the process-global execution switches for ``name``.

    dense → batched-MXU dense adjacency path (scatter backends off);
    everything else → dense path off + the named sparse backend, with the
    tiled/stream compute dtype from ``config['tiled_compute_dtype']``.
    """
    import importlib

    from kgcn_tpu.graph.batch import set_dense_path

    # NB: `from kgcn_tpu.ops import spmm` would grab the re-exported
    # FUNCTION, not the module
    spmm_mod = importlib.import_module("kgcn_tpu.ops.spmm")

    if name == "dense":
        set_dense_path(True)
        spmm_mod.set_backend("xla")
    else:
        set_dense_path(False)
        spmm_mod.set_backend(name)
        if name in ("tiled", "stream"):
            from kgcn_tpu.ops import stream_spmm as stream_mod
            from kgcn_tpu.ops import tiled_spmm as tiled_mod

            dt = (config or {}).get("tiled_compute_dtype", "bfloat16")
            tiled_mod.set_compute_dtype(dt)
            stream_mod.set_compute_dtype(dt)
    if log:
        print(f"[spmm] backend: {name}")


def resolve_and_apply(config: dict, info) -> str:
    """One-shot: choose from ``info`` (when the config says auto), apply,
    and pin the choice into ``config['_spmm_resolved']`` so repeat dataset
    loads (validation set, CV folds, infer) keep the same path."""
    pinned = config.get("_spmm_resolved")
    if pinned:
        apply_backend(pinned, config, log=False)
        return pinned
    name = choose_backend(config, info)
    apply_backend(name, config)
    config["_spmm_resolved"] = name
    return name
