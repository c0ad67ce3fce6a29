"""Device mesh construction and sharding rules.

The reference has NO distributed backend — parallelism was shell scripts
pinning processes to GPUs (reference: gcn.py:749-753,
sample_chem/compound-protein_interaction/run.sh).  Here the mesh is a
first-class module: a ``data × model`` mesh over whatever devices exist
(TPU slice, or host-platform virtual devices in tests), with XLA collectives
over ICI doing the communication.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[Dict[str, int]] = None,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a named mesh.

    ``axes``: ordered {axis_name: size}; a single ``-1`` size absorbs the
    remaining devices.  Default: all devices on one ``data`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes or {"data": len(devices)})
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {axes} needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (per-device) axis of a stacked batch."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
