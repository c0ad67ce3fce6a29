"""Optimizer / learning-rate-schedule factory.

The reference hardwires bare Adam (kgcn/core.py:121-127).  The TPU build
keeps that default but exposes the standard production knobs through the
same JSON config:

* ``optimizer``:      adam (default) | adamw | sgd | momentum | rmsprop | lamb
* ``lr_schedule``:    constant (default) | cosine | warmup_cosine | exponential
* ``warmup_steps``:   linear warmup steps for warmup_cosine (default 0)
* ``decay_steps``:    horizon for cosine/exponential (default: epoch count ×
                      steps-per-epoch is unknown here, so callers pass it or
                      the schedule defaults to 10_000 steps)
* ``decay_rate``:     exponential decay factor per ``decay_steps`` (default 0.96)
* ``gradient_clip``:  global-norm clip (prepended to the chain)
* ``weight_decay``:   decoupled weight decay (adamw/lamb take it natively;
                      other optimizers get ``optax.add_decayed_weights``)
* ``grad_accum_steps``: accumulate N micro-batch gradients before applying
                      one optimizer update (``optax.MultiSteps``) —
                      N× the effective batch size at constant memory

Everything returns a plain ``optax.GradientTransformation`` so every trainer
(single-device, DP, TP, big-graph) can share it.
"""
from __future__ import annotations

from typing import Any, Dict

import optax


def make_schedule(config: Dict[str, Any]):
    """Learning-rate schedule from config; returns a float or an optax
    schedule callable (both are valid optax learning rates)."""
    lr = float(config.get("learning_rate", 1e-3))
    kind = str(config.get("lr_schedule", "constant"))
    decay_steps = int(config.get("decay_steps", 10_000))
    if kind == "constant":
        return lr
    if kind == "cosine":
        return optax.cosine_decay_schedule(lr, decay_steps=decay_steps)
    if kind == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=int(config.get("warmup_steps", 0)),
            decay_steps=decay_steps,
        )
    if kind == "exponential":
        return optax.exponential_decay(
            lr,
            transition_steps=decay_steps,
            decay_rate=float(config.get("decay_rate", 0.96)),
        )
    raise ValueError(f"unknown lr_schedule {kind!r}")


def make_optimizer(config: Dict[str, Any]) -> optax.GradientTransformation:
    """Build the configured optimizer chain (clip → decay → optimizer)."""
    lr = make_schedule(config)
    name = str(config.get("optimizer", "adam")).lower()
    wd = float(config.get("weight_decay") or 0.0)
    if name == "adam":
        # keep the historical shortcut: weight_decay on plain adam means adamw
        opt = optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)
        wd = 0.0
    elif name == "adamw":
        opt = optax.adamw(lr, weight_decay=wd)
        wd = 0.0
    elif name == "sgd":
        opt = optax.sgd(lr)
    elif name == "momentum":
        opt = optax.sgd(lr, momentum=float(config.get("momentum", 0.9)))
    elif name == "rmsprop":
        opt = optax.rmsprop(lr)
    elif name == "lamb":
        opt = optax.lamb(lr, weight_decay=wd)
        wd = 0.0
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    parts = []
    clip = config.get("gradient_clip")
    if clip:
        parts.append(optax.clip_by_global_norm(float(clip)))
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(opt)
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    accum = int(config.get("grad_accum_steps") or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
