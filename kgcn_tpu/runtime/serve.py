"""Serving runtime — production inference for trained models.

The reference's deployment story is a frozen GraphDef (gcn.py:335-341) or the
KNIME GCNPredictor node shelling out a fresh ``kgcn infer`` process per call —
every request pays process start-up, graph build, and checkpoint restore.

Here serving is a first-class runtime: a ``Predictor`` restores a checkpoint
once, compiles ONE fixed-shape batched inference executable (shapes pinned by
``serve_max_nodes``/``batch_size`` so XLA's compile cache is hit forever
after), and answers requests by padding them into that executable — after the
first call every request runs at device speed with zero recompiles and zero
Python graph rebuilding.  ``kgcn-tpu-serve`` (cli/serve.py) wraps it in an
HTTP JSON API.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Any, Dict, Optional

import numpy as np


def payload_to_data(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a JSON request body (nested lists) into the in-memory jbl
    schema ``build_dataset`` consumes (docs/dataset_file.md)."""
    data: Dict[str, Any] = {}
    for key, val in payload.items():
        if key == "adj":
            data[key] = [
                [
                    (
                        np.asarray(t[0], np.int32),
                        np.asarray(t[1], np.float32),
                        tuple(int(x) for x in t[2]),
                    )
                    for t in graph_channels
                ]
                for graph_channels in val
            ]
        elif key == "graph_index_list":
            data[key] = [tuple(int(x) for x in pair) for pair in val]
        elif key in ("max_node_num", "node_num"):
            data[key] = int(val)
        elif key == "mol_info":
            data[key] = val
        elif key in ("node", "label_list", "test_label_list"):
            data[key] = [np.asarray(v, np.int32) for v in val]
        elif key in ("sequence", "sequence_length", "sequence_symbol_num"):
            data[key] = np.asarray(val, np.int32)
        else:
            data[key] = np.asarray(val, np.float32)
    return data


class Predictor:
    """Checkpoint-backed batched predictor with pinned static shapes.

    Parameters
    ----------
    config: the TRAINING config (model.py, task, feature flags …).  Serving
        adds: ``serve_max_nodes`` (node padding contract; defaults to the
        first request's), ``label_dim`` (head width when requests carry no
        labels), ``batch_size`` (compiled batch).
    checkpoint: path override; defaults to ``load_model`` or
        ``<save_model_path>/model.best.ckpt`` (falling back to ``.last``).
    """

    def __init__(self, config: Dict[str, Any],
                 checkpoint: Optional[str] = None):
        self.config = dict(config)
        self._load_serve_info()
        self.batch_size = int(self.config.get("batch_size", 32))
        self.max_nodes = int(self.config.get("serve_max_nodes", 0)) or None
        self._ckpt = checkpoint or self._default_ckpt()
        self._lock = threading.Lock()
        self._trainer = None
        self._state = None
        self._info = None
        self.requests = 0
        self.graphs_served = 0

    def _load_serve_info(self) -> None:
        """Merge the train-time sidecar (<save_model_path>/serve_info.json,
        written by ``kgcn-tpu train``) under the explicit config: the shape
        contract label-less requests cannot carry."""
        import json

        path = os.path.join(
            self.config.get("save_model_path", "model"), "serve_info.json"
        )
        if not os.path.exists(path):
            return
        try:
            with open(path) as f:
                side = json.load(f)
        except (OSError, ValueError):
            return
        for src, dst in (("label_dim", "label_dim"),
                         ("graph_node_num", "serve_max_nodes"),
                         ("model.py", "model.py"), ("task", "task")):
            if side.get(src) and not self.config.get(dst):
                self.config[dst] = side[src]

    def _default_ckpt(self) -> str:
        if self.config.get("load_model"):
            return self.config["load_model"]
        base = self.config.get("save_model_path", "model")
        best = os.path.join(base, "model.best.ckpt")
        return best if os.path.exists(best) else os.path.join(
            base, "model.last.ckpt"
        )

    @staticmethod
    def _ensure_labels(ds, label_dim: int):
        """Inference requests carry no labels; the models still compute a
        (meaningless) cost term, so give them zeros of the trained head
        width."""
        if ds.labels is None and ds.node_label is None:
            ds.labels = np.zeros((ds.num, max(label_dim, 1)), np.float32)
            if ds.mask_label is None:
                ds.mask_label = np.zeros_like(ds.labels)
        return ds

    # ------------------------------------------------------------------ #
    def _build(self, data: Dict[str, Any]) -> None:
        """Build model + restore checkpoint from the first request's schema."""
        from kgcn_tpu.data import Batcher, build_dataset
        from kgcn_tpu.models.registry import build_model
        from kgcn_tpu.runtime.train import Trainer

        if self.max_nodes:
            data = dict(data)
            data["max_node_num"] = self.max_nodes
        ds, info = build_dataset(data, self.config, test_mode=True)
        if self.config.get("label_dim"):
            info.label_dim = int(self.config["label_dim"])
        ds = self._ensure_labels(ds, info.label_dim)
        model = build_model(self.config.get("model.py", "gcn"), info, self.config)
        trainer = Trainer(model, self.config, info)
        b = Batcher(ds, info, self.batch_size)
        sample = b.make_batch(np.arange(min(self.batch_size, ds.num)))
        state = trainer.init_state(sample, seed=0)
        state = trainer.restore(state, self._ckpt)
        self.max_nodes = b.max_nodes
        self._trainer, self._state, self._info = trainer, state, info
        # warm the executable so the first real request is fast
        trainer.eval_step(state.params, state.batch_stats, sample)

    # ------------------------------------------------------------------ #
    def predict_data(self, data: Dict[str, Any]) -> Dict[str, Any]:
        """Run inference on an in-memory jbl-schema dict; returns prediction
        (list-of-lists) + timing."""
        from kgcn_tpu.data import Batcher, build_dataset

        t0 = time.time()
        with self._lock:
            if self._trainer is None:
                self._build(data)
            if self.max_nodes:
                data = dict(data)
                data["max_node_num"] = self.max_nodes
            ds, _ = build_dataset(data, self.config, test_mode=True)
            ds = self._ensure_labels(ds, self._info.label_dim)
            b = Batcher(ds, self._info, self.batch_size)
            ev = self._trainer.evaluate(self._state, b)
            self.requests += 1
            self.graphs_served += int(ds.num)
        pred = ev["prediction"]
        latency = (time.time() - t0) * 1000.0
        if isinstance(pred, dict):
            out = {k: np.asarray(v).tolist() for k, v in pred.items()}
        else:
            out = np.asarray(pred).tolist()
        return {
            "prediction": out,
            "num": int(ds.num),
            "latency_ms": latency,
            "checkpoint": self._ckpt,
        }

    def predict(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        """JSON request body → prediction response."""
        return self.predict_data(payload_to_data(payload))

    def health(self) -> Dict[str, Any]:
        import jax

        return {
            "status": "ok",
            "model": self.config.get("model.py", "gcn"),
            "checkpoint": self._ckpt,
            "ready": self._trainer is not None,
            "requests": self.requests,
            "graphs_served": self.graphs_served,
            "backend": jax.default_backend(),
            "batch_size": self.batch_size,
            "max_nodes": self.max_nodes,
        }


class DynamicBatcher:
    """Coalesces concurrent requests into one device call.

    On a tunnel/remote-attached TPU each dispatch carries fixed latency, so
    N concurrent 1-graph requests cost N dispatches through the plain
    Predictor.  The micro-batcher holds arrivals for ``window_ms``, merges
    requests with identical schemas into one jbl dict, runs ONE compiled
    inference, and splits the prediction rows back per request — classic
    dynamic batching, off by default (``kgcn-tpu-serve --dynamic-batching``).
    """

    _MERGE_AXIS0 = ("feature", "dense_adj", "multi_dense_adj", "label",
                    "mask_label", "vector_modal", "sequence", "sequence_length")

    def __init__(self, predictor: Predictor, *, window_ms: float = 5.0,
                 max_graphs: int = 256):
        self.p = predictor
        self.window = float(window_ms) / 1000.0
        self.max_graphs = int(max_graphs)
        self._cv = threading.Condition()
        self._queue: list = []
        self._alive = True
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.coalesced_calls = 0

    # -- request side ---------------------------------------------------- #
    def predict(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        data = payload_to_data(payload)
        n = self._num_graphs(data)
        slot = {"data": data, "n": n, "event": threading.Event(),
                "result": None, "error": None}
        with self._cv:
            if not self._alive:
                # the worker is gone — enqueueing would block this caller
                # forever on an event nothing will ever set
                raise RuntimeError("DynamicBatcher is closed")
            self._queue.append(slot)
            self._cv.notify()
        slot["event"].wait()
        if slot["error"] is not None:
            raise slot["error"]
        return slot["result"]

    def health(self) -> Dict[str, Any]:
        h = self.p.health()
        h["dynamic_batching"] = {
            "window_ms": self.window * 1000.0,
            "max_graphs": self.max_graphs,
            "coalesced_calls": self.coalesced_calls,
        }
        return h

    def close(self) -> None:
        with self._cv:
            self._alive = False
            self._cv.notify()

    # -- worker side ------------------------------------------------------ #
    @staticmethod
    def _num_graphs(data: Dict[str, Any]) -> int:
        for key in ("feature", "dense_adj", "multi_dense_adj", "adj"):
            if key in data:
                return len(data[key])
        raise ValueError("request carries no adjacency/feature arrays")

    @staticmethod
    def _schema(data: Dict[str, Any]):
        """Requests merge only when their key sets and per-graph shapes
        agree."""
        sig = []
        for k in sorted(data):
            v = data[k]
            if isinstance(v, np.ndarray):
                sig.append((k, v.shape[1:], str(v.dtype)))
            else:
                sig.append((k, None, type(v).__name__))
        return tuple(sig)

    def _merge(self, datas):
        out: Dict[str, Any] = {}
        for k in datas[0]:
            vals = [d[k] for d in datas]
            if k in self._MERGE_AXIS0:
                out[k] = np.concatenate(vals, axis=0)
            elif k in ("adj", "node"):
                out[k] = [g for v in vals for g in v]
            elif k == "max_node_num":
                out[k] = max(int(v) for v in vals)
            else:  # scalars that must agree (schema-matched already)
                out[k] = vals[0]
        return out

    # keys whose merged semantics are defined above; a request carrying any
    # OTHER per-graph key (graph_index_list pairings, mol_info, ad-hoc modal
    # matrices) must not coalesce — keeping vals[0] would misalign graphs
    _SCALAR_KEYS = ("max_node_num", "node_num", "sequence_symbol_num")

    def _coalescable(self, data) -> bool:
        for k, v in data.items():
            if k in self._MERGE_AXIS0 or k in ("adj", "node"):
                continue
            if k in self._SCALAR_KEYS or np.ndim(v) == 0:
                continue
            return False
        return True

    def _run(self) -> None:
        while True:
            with self._cv:
                while self._alive and not self._queue:
                    self._cv.wait()
                if not self._alive and not self._queue:
                    return
            time.sleep(self.window)  # let concurrent arrivals land
            with self._cv:
                batch, self._queue = self._queue, []
            # group by schema, preserve arrival order inside a group;
            # requests with unmergeable per-graph keys run alone
            groups: Dict[Any, list] = {}
            for si, slot in enumerate(batch):
                key = (
                    self._schema(slot["data"])
                    if self._coalescable(slot["data"])
                    else ("solo", si)
                )
                groups.setdefault(key, []).append(slot)
            for slots in groups.values():
                while slots:
                    take, total = [], 0
                    while slots and (not take
                                     or total + slots[0]["n"] <= self.max_graphs):
                        s = slots.pop(0)
                        take.append(s)
                        total += s["n"]
                    self._execute(take)

    def _execute(self, slots) -> None:
        try:
            if len(slots) == 1:
                slots[0]["result"] = self.p.predict_data(slots[0]["data"])
                return
            merged = self._merge([s["data"] for s in slots])
            resp = self.p.predict_data(merged)
            self.coalesced_calls += 1
            pred = resp["prediction"]
            off = 0
            for s in slots:
                n = s["n"]
                sub = (
                    {k: v[off : off + n] for k, v in pred.items()}
                    if isinstance(pred, dict)
                    else pred[off : off + n]
                )
                s["result"] = {
                    "prediction": sub, "num": n,
                    "latency_ms": resp["latency_ms"],
                    "checkpoint": resp["checkpoint"],
                    "coalesced": len(slots),
                }
                off += n
        except Exception as e:
            if len(slots) > 1:
                # isolate the failing request: retry individually
                for s in slots:
                    self._execute([s])
            else:
                slots[0]["error"] = e
        finally:
            for s in slots:
                s["event"].set()

    def predict_data(self, data):  # API parity with Predictor
        return self.p.predict_data(data)


class ExportPredictor:
    """Serve a ``jax.export`` StableHLO artifact (runtime/export.py) —
    parameters baked in, shapes fixed by the exported signature."""

    def __init__(self, path: str, config: Optional[Dict[str, Any]] = None):
        import jax

        from kgcn_tpu.runtime.export import _register_pytrees

        _register_pytrees()
        self.config = dict(config or {})
        with open(path, "rb") as f:
            self._exported = jax.export.deserialize(bytearray(f.read()))
        self._fn = self._exported.call
        self._path = path
        self._lock = threading.Lock()
        self.requests = 0
        # the exported executable has ONE fixed traced shape — recover the
        # batch/node contract from the serialized signature, not the config
        self.batch_size, self.max_nodes = self._traced_shape()

    def _traced_shape(self):
        """(n_graph, max_nodes) the artifact was traced with."""
        import jax

        try:
            args, _ = jax.tree_util.tree_unflatten(
                self._exported.in_tree, list(self._exported.in_avals)
            )
            g = args[0].graph
            return int(g.n_graph), int(g.max_nodes)
        except Exception:
            return int(self.config.get("batch_size", 32)), None

    def _coerce(self, batch):
        """Cast the request batch's leaves to the exported signature's dtypes
        (jax.export calls are dtype-strict; requests arrive as JSON floats)."""
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(batch)
        avals = self._exported.in_avals
        if len(leaves) != len(avals):
            raise ValueError(
                f"request batch has {len(leaves)} array leaves but the "
                f"exported signature expects {len(avals)} — the request's "
                "modalities/optional fields must match what the model was "
                "exported with"
            )
        leaves = [
            np.asarray(leaf, aval.dtype)
            if getattr(leaf, "dtype", None) != aval.dtype
            else leaf
            for leaf, aval in zip(leaves, avals)
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def predict(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        from kgcn_tpu.data import Batcher, build_dataset

        t0 = time.time()
        data = payload_to_data(payload)
        if self.max_nodes:  # requests must pad into the traced node shape
            data = dict(data)
            data["max_node_num"] = self.max_nodes
        ds, info = build_dataset(data, self.config, test_mode=True)
        # the exported pytree was traced WITH label arrays; feed zeros
        ds = Predictor._ensure_labels(
            ds, int(self.config.get("label_dim", info.label_dim or 1))
        )
        bs = self.batch_size  # the artifact's one traced batch shape
        b = Batcher(ds, info, bs)
        preds = []
        with self._lock:
            for start in range(0, ds.num, bs):
                idx = np.arange(start, min(start + bs, ds.num))
                out = self._fn(self._coerce(b.make_batch(idx)))
                preds.append(
                    {k: np.asarray(v)[: len(idx)] for k, v in out.items()}
                    if isinstance(out, dict)
                    else np.asarray(out)[: len(idx)]
                )
            self.requests += 1
        if not preds:
            pred = np.zeros((0,)).tolist()
        elif isinstance(preds[0], dict):
            pred = {
                k: np.concatenate([p[k] for p in preds]).tolist()
                for k in preds[0]
            }
        else:
            pred = np.concatenate(preds).tolist()
        return {
            "prediction": pred,
            "num": int(ds.num),
            "latency_ms": (time.time() - t0) * 1000.0,
            "checkpoint": self._path,
        }

    def health(self) -> Dict[str, Any]:
        return {"status": "ok", "export": self._path, "ready": True,
                "requests": self.requests}
