"""Model protocol.

The reference protocol is ``build_placeholders`` + ``build_model`` returning
``(model, prediction, cost_opt, cost_sum, metrics)``
(example_model/model.py:16-71, kgcn/core.py:138-166).  The TPU-native
equivalent is a flax Module whose ``__call__(batch, train)`` returns a
:class:`ModelOutput` — placeholders are gone (the ``Batch`` pytree plays that
role), and the returned fields map one-to-one onto the reference tuple.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

from kgcn_tpu.data.batcher import Batch  # noqa: F401  (re-export for models)


@struct.dataclass
class ModelOutput:
    """prediction: per-example outputs ([B, ...] array or dict of arrays for
    VAE-style models); cost_opt: scalar mean loss (optimised); cost_sum:
    scalar summed loss (reported); metrics: reference metric-dict protocol
    (correct_count / count / each_* / error_sum)."""

    prediction: Any
    cost_opt: jnp.ndarray
    cost_sum: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]
