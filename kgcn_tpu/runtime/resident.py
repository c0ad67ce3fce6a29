"""Device-resident datasets: whole-epoch training under ONE jit dispatch.

The reference rebuilds a Python feed_dict per step (kgcn/feed.py:91-234 — its
known bottleneck); our default Batcher already amortises that to one host
assembly + transfer per batch.  This module removes even that: for datasets
that fit in HBM (molecular workloads easily do), the dataset is uploaded ONCE
as padded per-graph arrays, batches are assembled **on device** by pure
gathers from a permutation, and a whole epoch runs as a single
``lax.scan`` over train steps inside one jit — zero host↔device traffic in
the steady state beyond a [steps×B] int32 permutation per epoch.

Layout: per-graph fixed budgets (edges padded to the dataset max per channel,
nodes to ``max_nodes``), so a batch gather is
``dd.senders[idx]  [B, C, Eg] → +b·N offset → [C, B·Eg]`` — identical
semantics to the Batcher's packed layout except padding edges are interleaved,
which is why the resulting ``GraphBatch`` carries an explicit ``edge_valid``
mask instead of relying on packed-first counts.

Shuffling stays a pure host-side function of (seed, epoch) — the SAME
permutation the Batcher would use — so deterministic resume (SURVEY §5) and
step-for-step parity with the streaming path are preserved.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from kgcn_tpu.data.batcher import Batch
from kgcn_tpu.data.dataset import Dataset, DatasetInfo
from kgcn_tpu.graph.batch import GraphBatch

# Default HBM budget for keeping a dataset resident (bytes).  v5e has 16 GB;
# leave plenty for activations/params.
DEFAULT_RESIDENT_BUDGET = 4 * 1024 * 1024 * 1024


@struct.dataclass
class DeviceDataset:
    """Whole dataset as device-resident, per-graph padded arrays."""

    senders: jnp.ndarray  # [G, C, Eg] int32, graph-LOCAL node indices
    receivers: jnp.ndarray  # [G, C, Eg]
    weights: jnp.ndarray  # [G, C, Eg] float32 (0 = padding slot)
    n_edge: jnp.ndarray  # [G, C] int32 valid-edge counts
    node_mask: jnp.ndarray  # [G, N] float32
    features: Optional[jnp.ndarray] = None  # [G, N, F]
    node_ids: Optional[jnp.ndarray] = None  # [G, N] int32
    labels: Optional[jnp.ndarray] = None
    mask_label: Optional[jnp.ndarray] = None
    node_label: Optional[jnp.ndarray] = None
    mask_node_label: Optional[jnp.ndarray] = None
    sequences: Optional[jnp.ndarray] = None
    sequences_len: Optional[jnp.ndarray] = None
    vector_modal: Optional[tuple] = None
    ell_idx: Optional[jnp.ndarray] = None  # [G, C, N, K] graph-local
    ell_w: Optional[jnp.ndarray] = None  # [G, C, N, K]
    num: int = struct.field(pytree_node=False, default=0)
    max_nodes: int = struct.field(pytree_node=False, default=1)


def supports_resident(ds: Dataset, *, allow_index_list: bool = False) -> bool:
    """The resident path covers the standard Batcher protocol; engines with
    their own feed logic (KG label lists) keep the streaming path.
    ``allow_index_list``: the pair engine consumes ``graph_index_list``
    itself (its ResidentPairBatcher takes the pairs explicitly), so for it
    the field does not disqualify the dataset."""
    return (
        ds.adjs is not None
        and ds.label_list is None
        and (allow_index_list or ds.graph_index_list is None)
    )


def resident_flag(config) -> str:
    """Normalise config ``device_resident`` to 'off' | 'force' | 'auto'.
    Every engine must route through this (or :func:`resident_enabled`) —
    ad-hoc comparisons drift (e.g. missing the string "off")."""
    flag = config.get("device_resident", "auto")
    if flag in (False, "false", "off", 0, "0"):
        return "off"
    if flag in (True, "true", "force", 1, "1"):
        return "force"
    return "auto"


def resident_enabled(config, ds: Dataset, info: DatasetInfo, *,
                     allow_index_list: bool = False) -> bool:
    """THE gate, shared by every engine: config ``device_resident``
    true / false / "auto" (default).  ``true`` bypasses the HBM budget;
    ``auto`` enforces it; unsupported datasets always decline (with a
    message when the user asked explicitly)."""
    flag = resident_flag(config)
    if flag == "off":
        return False
    import importlib
    _spmm = importlib.import_module("kgcn_tpu.ops.spmm")

    if _spmm.get_backend() in ("tiled", "stream"):
        # the tiled/stream Pallas structures are packed host-side per batch;
        # the device-resident on-device batch assembly cannot carry them
        if flag == "force":
            print(f"[resident] spmm_backend={_spmm.get_backend()} needs "
                  "host batching; streaming batcher")
        return False
    if not supports_resident(ds, allow_index_list=allow_index_list):
        if flag == "force":
            print("[resident] dataset unsupported; streaming batcher")
        return False
    if flag == "force":
        return True
    budget = int(config.get("resident_budget_bytes", DEFAULT_RESIDENT_BUDGET))
    return estimate_bytes(ds, _aligned_max_nodes(ds, info)) <= budget


def estimate_bytes(ds: Dataset, max_nodes: int) -> int:
    """Upper-bound the resident dataset's device footprint, mirroring
    build_device_dataset's actual padding (aligned edge budget, features
    padded to the aligned N, possible ELL arrays, labels/ids/sequences)."""
    if ds.adjs is None:
        return 1 << 62
    G = ds.num
    C = len(ds.adjs[0])
    N = max_nodes
    eg = max((len(ch[0]) for gs in ds.adjs for ch in gs), default=1)
    eg = ((max(eg, 1) + 7) // 8) * 8
    total = G * C * eg * 12 + G * C * 4  # senders+receivers+weights, n_edge
    total += G * N * 4  # node mask
    if ds.features is not None:
        total += G * N * ds.features.shape[-1] * 4
    if ds.nodes is not None:
        total += G * N * 4
    # potential ELL arrays — the gate may add [G, C, N, K] idx + weights;
    # bound K by the shared gate limit scaled by the waste cap (2E/(G·C·N))
    from kgcn_tpu.ops.ell import ELL_MAX_DEGREE

    total_edges = sum(len(ch[0]) for gs in ds.adjs for ch in gs)
    k_cap = min(ELL_MAX_DEGREE,
                int(2.0 * max(total_edges, 1) / max(G * C * N, 1)) + 1)
    total += G * C * N * k_cap * 8
    for arr in (ds.labels, ds.mask_label, ds.node_label, ds.mask_node_label,
                ds.sequences, ds.sequences_len):
        if arr is not None:
            total += np.asarray(arr).size * 4
    for v in ds.vector_modal or []:
        total += np.asarray(v).size * 4
    return total


def _pad_node_axis(x, n: int):
    """Pad a [G, N_ds, ...] per-node array's node axis up to ``n``."""
    if x is None:
        return None
    x = np.asarray(x)
    pad = n - x.shape[1]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return np.pad(x, widths)


def _aligned_max_nodes(ds: Dataset, info: DatasetInfo) -> int:
    n = int(ds.max_node_num or info.graph_node_num)
    if n > 128:  # lane-align, mirroring Batcher (MEASURED.md: 20x step win)
        n = ((n + 127) // 128) * 128
    return n


def build_device_dataset(
    ds: Dataset, info: DatasetInfo, *, max_nodes: Optional[int] = None
) -> DeviceDataset:
    """Host-side one-time packing of a Dataset into per-graph padded arrays
    (uploaded to the default device by the first jitted use)."""
    assert supports_resident(
        ds, allow_index_list=True  # index lists are consumed by callers
    ), "dataset not supported by the resident path"
    N = max_nodes or _aligned_max_nodes(ds, info)
    G = ds.num
    C = len(ds.adjs[0])
    eg = max((len(ch[0]) for gs in ds.adjs for ch in gs), default=1)
    eg = ((max(eg, 1) + 7) // 8) * 8  # sublane-align the per-graph budget

    senders = np.zeros((G, C, eg), np.int32)
    receivers = np.zeros((G, C, eg), np.int32)
    weights = np.zeros((G, C, eg), np.float32)
    n_edge = np.zeros((G, C), np.int32)
    for g, chans in enumerate(ds.adjs):
        for c, (r, cc, v) in enumerate(chans):
            k = len(r)
            r = np.asarray(r, np.int32)
            cc = np.asarray(cc, np.int32)
            if k and (r.max() >= N or cc.max() >= N):
                # gather_batch offsets by b·N — an out-of-range index would
                # silently bleed into the neighbouring graph's block (the
                # streaming batch_graphs path hard-errors identically)
                raise ValueError(
                    f"graph {g} channel {c} has node index "
                    f"{int(max(r.max(), cc.max()))} >= max_nodes {N}"
                )
            receivers[g, c, :k] = r
            senders[g, c, :k] = cc
            weights[g, c, :k] = np.asarray(v, np.float32)
            n_edge[g, c] = k

    if ds.enabled_node_nums is not None:
        nn = np.asarray(ds.enabled_node_nums, np.int32)
    elif ds.features is not None:
        nn = np.maximum(
            (np.abs(ds.features).sum(axis=-1) > 0).sum(axis=-1), 1
        ).astype(np.int32)
    else:
        nn = np.full((G,), N, np.int32)
    node_mask = (np.arange(N)[None, :] < nn[:, None]).astype(np.float32)

    features = None
    if ds.features is not None:
        features = np.zeros((G, N, ds.features.shape[-1]), np.float32)
        m = min(N, ds.features.shape[1])
        features[:, :m] = ds.features[:, :m]

    node_ids = None
    if ds.nodes is not None:
        node_ids = np.zeros((G, N), np.int32)
        for g, row in enumerate(ds.nodes):
            row = np.asarray(row, np.int32)
            node_ids[g, : len(row)] = row

    # per-graph ELL (scatter-free path) under the SAME gate as the streaming
    # Batcher (shared in kgcn_tpu/ops/ell.py, so path selection never drifts)
    ell_idx = ell_w = None
    from kgcn_tpu.ops.ell import coo_to_ell, ell_layout_ok, scan_ell_stats

    max_deg, total_edges = scan_ell_stats(ds.adjs)
    if ell_layout_ok(max_deg, G * C * N, total_edges):
        K = max_deg
        ell_idx = np.zeros((G, C, N, K), np.int32)
        ell_w = np.zeros((G, C, N, K), np.float32)
        for g, gs in enumerate(ds.adjs):
            for c, (r, cc, v) in enumerate(gs):
                ei, ew = coo_to_ell(cc, r, v, N, max_degree=K)
                ell_idx[g, c] = ei
                ell_w[g, c] = ew

    def j(x):
        return None if x is None else jnp.asarray(x)

    return DeviceDataset(
        senders=j(senders),
        receivers=j(receivers),
        weights=j(weights),
        n_edge=j(n_edge),
        node_mask=j(node_mask),
        features=j(features),
        node_ids=j(node_ids),
        labels=j(ds.labels),
        mask_label=j(ds.mask_label),
        # per-node label arrays must match the (lane-aligned) node padding
        node_label=j(_pad_node_axis(ds.node_label, N)),
        mask_node_label=j(_pad_node_axis(ds.mask_node_label, N)),
        sequences=j(ds.sequences),
        sequences_len=j(ds.sequences_len),
        vector_modal=(
            tuple(jnp.asarray(v) for v in ds.vector_modal)
            if ds.vector_modal
            else None
        ),
        ell_idx=j(ell_idx),
        ell_w=j(ell_w),
        num=G,
        max_nodes=N,
    )


def gather_batch(dd: DeviceDataset, idx: jnp.ndarray, valid: jnp.ndarray) -> Batch:
    """Assemble one fixed-shape Batch from graph indices — pure device
    gathers, traceable under jit/scan.  ``idx``: [B] int32 (pad slots may
    repeat index 0), ``valid``: [B] float32 1.0 for real examples."""
    B = idx.shape[0]
    N = dd.max_nodes
    C = dd.senders.shape[1]
    eg = dd.senders.shape[2]

    offs = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    s = jnp.transpose(dd.senders[idx] + offs, (1, 0, 2)).reshape(C, B * eg)
    r = jnp.transpose(dd.receivers[idx] + offs, (1, 0, 2)).reshape(C, B * eg)
    w = dd.weights[idx] * valid[:, None, None]
    w = jnp.transpose(w, (1, 0, 2)).reshape(C, B * eg)
    ne = dd.n_edge[idx]  # [B, C]
    iota = jnp.arange(eg, dtype=jnp.int32)[None, None, :]
    ev = (iota < ne[:, :, None]).astype(jnp.float32) * valid[:, None, None]
    ev = jnp.transpose(ev, (1, 0, 2)).reshape(C, B * eg)
    node_mask = (dd.node_mask[idx] * valid[:, None]).reshape(B * N)

    ell_s = ell_w = None
    if dd.ell_idx is not None:
        K = dd.ell_idx.shape[-1]
        gi = dd.ell_idx[idx]  # [B, C, N, K]
        gw = dd.ell_w[idx] * valid[:, None, None, None]
        gi = gi + offs[..., None] * (gw != 0)
        ell_s = jnp.transpose(gi, (1, 0, 2, 3)).reshape(C, B * N, K)
        ell_w = jnp.transpose(gw, (1, 0, 2, 3)).reshape(C, B * N, K)

    graph = GraphBatch(
        senders=s,
        receivers=r,
        edge_weights=w,
        n_edge=jnp.sum(ne * valid[:, None].astype(ne.dtype), axis=0),
        n_node=jnp.sum(
            dd.node_mask[idx] * valid[:, None], axis=1
        ).astype(jnp.int32),
        node_mask=node_mask,
        nodes=(
            (dd.features[idx] * valid[:, None, None]).reshape(B * N, -1)
            if dd.features is not None
            else None
        ),
        node_ids=(
            (dd.node_ids[idx] * valid[:, None].astype(jnp.int32)).reshape(B * N)
            if dd.node_ids is not None
            else None
        ),
        ell_senders=ell_s,
        ell_weights=ell_w,
        edge_valid=ev,
        n_graph=B,
        max_nodes=N,
    )

    def take(x):
        """Gather per-example rows; padding slots zeroed (exactly the
        streaming Batcher's zero-padding of the last partial batch)."""
        if x is None:
            return None
        g = x[idx]
        v = valid.astype(g.dtype).reshape((B,) + (1,) * (g.ndim - 1))
        return g * v

    return Batch(
        graph=graph,
        labels=take(dd.labels),
        mask_label=take(dd.mask_label),
        node_label=take(dd.node_label),
        mask_node_label=take(dd.mask_node_label),
        sequences=take(dd.sequences),
        sequences_len=take(dd.sequences_len),
        vector_modal=(
            tuple(take(v) for v in dd.vector_modal)
            if dd.vector_modal is not None
            else None
        ),
        pad_mask=valid,
    )


class ResidentBatcher:
    """Batcher-compatible facade over a DeviceDataset.

    ``epoch_schedule`` feeds the Trainer's scanned whole-epoch path;
    ``batches`` serves the generic evaluate loop (device-side gathers, one
    jitted gather per batch — still no host assembly).
    """

    def __init__(self, ds: Dataset, info: DatasetInfo, batch_size: int,
                 *, seed: int = 0, max_nodes: Optional[int] = None,
                 device_data: Optional[DeviceDataset] = None):
        self.ds = ds
        self.info = info
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self._rng = np.random.RandomState(self.seed)
        # callers that already hold the uploaded dataset (fold-parallel CV,
        # device-parallel HPO trials) pass it in — no duplicate HBM upload
        self.device_data = (
            device_data if device_data is not None
            else build_device_dataset(ds, info, max_nodes=max_nodes)
        )
        self.max_nodes = self.device_data.max_nodes
        self._gather = jax.jit(gather_batch, static_argnums=())

    # --- Batcher API used by Trainer -----------------------------------
    @property
    def num_batches(self) -> int:
        return (self.ds.num + self.batch_size - 1) // self.batch_size

    @property
    def valid_per_epoch(self) -> int:
        return self.ds.num

    def batch_valid_counts(self):
        n, bs = self.ds.num, self.batch_size
        return [min(bs, n - s) for s in range(0, n, bs)]

    def epoch_indices(self, shuffle: bool = True,
                      epoch: Optional[int] = None) -> np.ndarray:
        """Identical permutation law to Batcher.epoch_indices (shared
        implementation) — resident and streaming paths see the same order."""
        from kgcn_tpu.data.batcher import epoch_permutation

        return epoch_permutation(
            self.ds.num, self.seed, epoch if shuffle else None,
            rng=self._rng if shuffle else None,
        )

    def epoch_schedule(self, shuffle: bool = True,
                       epoch: Optional[int] = None):
        """[S, B] int32 indices + [S, B] float32 validity for one epoch."""
        idx = self.epoch_indices(shuffle, epoch=epoch)
        B = self.batch_size
        S = self.num_batches
        pad = S * B - len(idx)
        sched = np.concatenate([idx, np.zeros(pad, idx.dtype)]).astype(np.int32)
        valid = (np.arange(S * B) < len(idx)).astype(np.float32)
        return sched.reshape(S, B), valid.reshape(S, B)

    def batches(self, shuffle: bool = True, epoch: Optional[int] = None):
        sched, valid = self.epoch_schedule(shuffle, epoch=epoch)
        for i in range(sched.shape[0]):
            yield self._gather(
                self.device_data, jnp.asarray(sched[i]), jnp.asarray(valid[i])
            )

    def make_batch(self, idx: np.ndarray) -> Batch:
        idx = np.asarray(idx)
        B = self.batch_size
        pad = B - len(idx)
        sched = np.concatenate([idx, np.zeros(pad, np.int64)]).astype(np.int32)
        valid = (np.arange(B) < len(idx)).astype(np.float32)
        return self._gather(
            self.device_data, jnp.asarray(sched), jnp.asarray(valid)
        )


class ResidentVAEBatcher(ResidentBatcher):
    """Resident batcher for the VAE engine: graphs gathered on device,
    reparameterisation ε generated ON DEVICE per scanned step (replacing the
    host-fed epsilon placeholder, reference kgcn/feed_index.py:107-109) —
    zero per-step transfers via the Trainer's generic scan protocol.

    Derives all batch accounting and the schedule/padding law from
    :class:`ResidentBatcher`; only the ε plumbing lives here."""

    def __init__(self, ds: Dataset, info: DatasetInfo, batch_size: int,
                 latent_dim: int, *, seed: int = 0):
        super().__init__(ds, info, batch_size, seed=seed)
        self.latent_dim = int(latent_dim)
        self._epoch_counter = [0]

    def epoch_scan_inputs(self, shuffle: bool = True, epoch=None):
        sched, valid = self.epoch_schedule(shuffle, epoch=epoch)
        S = sched.shape[0]
        e = epoch if epoch is not None else self._epoch_counter[0]
        self._epoch_counter[0] += 1
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(self.seed), e), S
        )
        # ε template carries the static shape into make_scan_batch
        template = jnp.zeros(
            (self.batch_size, self.max_nodes, self.latent_dim), jnp.float32
        )
        return (self.device_data, template), (
            jnp.asarray(sched), jnp.asarray(valid), keys,
        )

    @staticmethod
    def make_scan_batch(const, x) -> Batch:
        dd, template = const
        idxb, vb, key = x
        batch = gather_batch(dd, idxb, vb)
        eps = jax.random.normal(key, template.shape, template.dtype)
        return batch.replace(rng_normal=eps)

    def make_batch(self, idx: np.ndarray) -> Batch:
        batch = super().make_batch(idx)
        eps = jnp.asarray(
            self._rng.normal(
                size=(self.batch_size, self.max_nodes, self.latent_dim)
            ).astype(np.float32)
        )
        return batch.replace(rng_normal=eps)

    def batches(self, shuffle: bool = True, epoch=None):
        # keeps the legacy draw order (shuffle then per-batch ε from the
        # same host rng) so streaming/resident VAE trajectories stay
        # comparable
        idx = np.arange(self.ds.num)
        if shuffle:
            self._rng.shuffle(idx)
        for start in range(0, len(idx), self.batch_size):
            yield self.make_batch(idx[start : start + self.batch_size])
