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
        if known <= 0 or len(devices) % known != 0:
            raise ValueError(
                f"mesh {axes}: {len(devices)} devices do not divide evenly "
                f"by the fixed axes (product {known}) — a floored -1 axis "
                "would silently strand devices"
            )
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total <= 0 or total > len(devices):
        raise ValueError(f"mesh {axes} needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (per-device) axis of a stacked batch."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(config: Optional[Dict] = None) -> bool:
    """Start the multi-host runtime (``jax.distributed.initialize``).

    Call ONCE per process, before any other jax op, on every host of the
    slice/cluster.  After it, ``jax.devices()`` spans all hosts and
    ``make_mesh`` builds global meshes whose collectives ride ICI
    intra-slice and DCN across slices.

    ``config`` keys (config file ``"distributed": {...}``, all optional —
    on TPU pods jax autodetects everything and an empty dict suffices):
    ``coordinator_address`` ("host:port"), ``num_processes``,
    ``process_id``, ``local_device_ids``.  Returns True if initialization
    ran, False if it was skipped (already initialized).
    """
    import jax._src.distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return False  # already initialized
    cfg = dict(config or {})
    kwargs = {}
    for key in ("coordinator_address", "num_processes", "process_id",
                "local_device_ids"):
        if cfg.get(key) is not None:
            kwargs[key] = cfg[key]
    jax.distributed.initialize(**kwargs)
    return True


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process).

    Used around filesystem rendezvous: e.g. process 0 writes a checkpoint,
    everyone barriers, then all processes read it back (runtime/checkpoint).
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_view(tree):
    """Bring a pytree of (possibly non-addressable) jax.Arrays to host numpy.

    Single-process this is ``jax.device_get``; multi-process, sharded leaves
    are allgathered across processes first (tiled along their sharded axis)
    so every process sees the same full array — the multi-controller
    equivalent of "fetch the predictions for metrics/serialisation".
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(fetch, tree)


def process_index_range(n_items: int, num_processes: Optional[int] = None,
                        process_id: Optional[int] = None):
    """This process's contiguous [start, stop) slice of a global dataset.

    The multi-host input-pipeline contract: each host loads ONLY its slice
    (sharded jbl / tfrecord ingest), builds per-device batches from it, and
    the global batch is assembled by the mesh sharding — no host ever
    materialises the full dataset.  Every process must use the same
    ``n_items``; sizes differ by at most one item across processes.
    """
    np_ = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    base, extra = divmod(n_items, np_)
    start = pid * base + min(pid, extra)
    stop = start + base + (1 if pid < extra else 0)
    return start, stop
