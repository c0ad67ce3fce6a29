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


def save_checkpoint(path: str, tree: Dict[str, Any]) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tree = jax.device_get(tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def ckpt_name(base_dir: str, tag, fold: Optional[int] = None) -> str:
    """model.<fold>.<tag>.ckpt naming, mirroring reference prefixes
    (kgcn/core.py:314-330, gcn.py:154-167)."""
    if fold is None:
        return os.path.join(base_dir, f"model.{tag}.ckpt")
    return os.path.join(base_dir, f"model.{fold}.{tag}.ckpt")
