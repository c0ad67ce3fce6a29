"""Model export — the TPU-native equivalent of the reference's frozen-graph
export (gcn.py:335-341 convert_variables_to_constants + write_graph, and the
estimator BestExporter SavedModel, task_sparse_gcn.py:218-245).

Exports the inference function with parameters baked in as serialised
StableHLO via ``jax.export`` — a self-contained, runtime-loadable artifact —
plus a msgpack parameter bundle for pure-JAX reloading.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

_REGISTERED = False


def _register_pytrees() -> None:
    """Register our batch pytrees for jax.export serialisation (their static
    aux data — n_graph/max_nodes — is JSON-encoded)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from kgcn_tpu.data.batcher import Batch
    from kgcn_tpu.graph.batch import GraphBatch
    from kgcn_tpu.models.pair import PairBatch

    for cls, name in (
        (GraphBatch, "kgcn_tpu.GraphBatch"),
        (Batch, "kgcn_tpu.Batch"),
        (PairBatch, "kgcn_tpu.PairBatch"),
    ):
        try:
            jax.export.register_pytree_node_serialization(
                cls,
                serialized_name=name,
                # aux data is a flat tuple of static ints (e.g. GraphBatch's
                # (n_graph, max_nodes)) — JSON round-trips it exactly
                serialize_auxdata=lambda aux: json.dumps(list(aux)).encode(),
                deserialize_auxdata=lambda blob: tuple(json.loads(blob)),
            )
        except ValueError:
            pass  # already registered
    _REGISTERED = True


def export_model(model, variables: Dict[str, Any], sample_batch, path: str):
    """Serialise the jitted inference fn (params closed over) to ``path``.

    Produces ``<path>`` (StableHLO bytes, loadable with
    ``jax.export.deserialize``) and ``<path>.params`` (msgpack variables).
    """
    from flax import serialization

    _register_pytrees()

    def infer(batch):
        out = model.apply(variables, batch, train=False)
        return out.prediction

    exported = jax.export.export(jax.jit(infer))(sample_batch)
    blob = exported.serialize()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".params", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    print(f"[SAVE] {path} ({len(blob)} bytes StableHLO)")
    return path


def load_exported(path: str):
    """Deserialise an exported model; returns a callable(batch) → prediction."""
    _register_pytrees()
    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    return exported.call


def export_savedmodel(model, variables: Dict[str, Any], sample_batch,
                      path: str):
    """TF SavedModel export via ``jax2tf`` — the compatibility bridge to the
    reference's TF-consumable artifacts (frozen GraphDef, gcn.py:335-341;
    estimator BestExporter SavedModel, task_sparse_gcn.py:218-226) so
    external TF tooling can load and serve our models.

    The serving signature takes the batch's pytree LEAVES as positional
    tensors (None leaves dropped); ``<path>/kgcn_signature.json`` records
    each tensor's pytree path, shape and dtype so callers can assemble the
    feed without our code.  Parameters are baked in as constants (the
    reference's convert_variables_to_constants semantics).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    leaves_kp = jax.tree_util.tree_flatten_with_path(sample_batch)[0]
    treedef = jax.tree_util.tree_structure(sample_batch)
    leaves = [l for _, l in leaves_kp]
    names = [jax.tree_util.keystr(kp) for kp, _ in leaves_kp]

    def infer_flat(*flat):
        batch = jax.tree_util.tree_unflatten(treedef, flat)
        return model.apply(variables, batch, train=False).prediction

    tf_fn = jax2tf.convert(infer_flat, with_gradient=False)
    specs = [
        tf.TensorSpec(np.shape(l), jax2tf.dtype_of_val(l)) for l in leaves
    ]
    mod = tf.Module()
    mod.f = tf.function(tf_fn, input_signature=specs, autograph=False)
    tf.saved_model.save(mod, path)
    with open(os.path.join(path, "kgcn_signature.json"), "w") as f:
        json.dump(
            [
                {"path": n, "shape": list(np.shape(l)),
                 "dtype": str(np.asarray(l).dtype)}
                for n, l in zip(names, leaves)
            ],
            f, indent=2,
        )
    print(f"[SAVE] {path} (TF SavedModel, {len(leaves)} input tensors)")
    return path
