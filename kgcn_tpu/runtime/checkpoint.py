"""Checkpoint / resume.

Policy parity with the reference Saver usage (kgcn/core.py:224-229,314-368):
periodic ``model.<NNN>`` every ``save_interval`` epochs, rolling
``model.best`` on validation-cost improvement (restored before final eval),
``model.last`` at the end, per-fold prefixes for CV.  The checkpoint tree is
{params, batch_stats, opt_state, step/epoch, rng, best_cost} serialised with
flax msgpack — a single self-describing file per checkpoint.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, tree: Dict[str, Any], fmt: str = "msgpack") -> str:
    """fmt='msgpack' (single self-describing file, default) or 'orbax'
    (directory tree via orbax — useful for very large / sharded params).

    Multi-process: replicated state is written ONCE by process 0 (every
    process holds the same values), with a named barrier after the write so
    a follow-up ``load_checkpoint`` on any process sees the finished file —
    no N-way filesystem race.  Sharded state goes through ``save_sharded``
    (orbax is multi-controller-aware and writes shard-by-shard).
    """
    if fmt == "orbax":
        return _save_orbax(path, jax.device_get(tree))
    if jax.process_count() > 1:
        from kgcn_tpu.parallel.mesh import barrier

        if jax.process_index() == 0:
            _write_msgpack(path, jax.device_get(tree))
        barrier(f"ckpt:{os.path.basename(path)}")
        return path
    _write_msgpack(path, jax.device_get(tree))
    return path


def _write_msgpack(path: str, tree) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def _save_orbax(path: str, tree) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    if os.path.isdir(path):  # orbax directory checkpoint
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target)
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def save_sharded(path: str, tree) -> str:
    """Orbax save WITHOUT host gathering: sharded jax.Arrays (e.g. a
    big-graph embedding table spread over the mesh) are written shard-by-
    shard by their owning devices/hosts.  (Unlike ``save_checkpoint``, the
    tree is NOT device_get — that is the whole point.)"""
    return _save_orbax(path, tree)


def load_sharded(path: str, target):
    """Restore an orbax checkpoint INTO the target's shardings: each leaf
    comes back as a jax.Array with the same mesh placement as the matching
    leaf of ``target`` (concrete arrays or ShapeDtypeStructs)."""
    import jax
    import orbax.checkpoint as ocp

    def abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path), jax.tree_util.tree_map(abstract, target)
    )

    def replace(r, t):
        # orbax may land scalar/replicated leaves on one device; pin every
        # leaf back to the target's placement so downstream jits see one
        # consistent device set
        if isinstance(t, jax.Array) and getattr(r, "sharding", None) != t.sharding:
            return jax.device_put(r, t.sharding)
        return r

    return jax.tree_util.tree_map(replace, restored, target)


def ckpt_name(base_dir: str, tag, fold: Optional[int] = None) -> str:
    """model.<fold>.<tag>.ckpt naming, mirroring reference prefixes
    (kgcn/core.py:314-330, gcn.py:154-167)."""
    if fold is None:
        return os.path.join(base_dir, f"model.{tag}.ckpt")
    return os.path.join(base_dir, f"model.{fold}.{tag}.ckpt")
