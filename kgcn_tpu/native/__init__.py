"""ctypes bindings for the native batch assembler (libkgcn_native.so).

Builds on demand with ``make -C kgcn_tpu/native`` (g++, no external deps).
All entry points fall back to NumPy implementations when the library is
absent, so the framework never hard-requires the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libkgcn_native.so")


def _load(build_if_missing: bool = False) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED and not build_if_missing:
        return None
    _TRIED = True
    if not os.path.exists(_SO) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.pack_edges.restype = ctypes.c_int
    lib.pack_edges.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # rows/cols/vals
        ctypes.c_void_p, ctypes.c_void_p,  # block_off/block_len
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.gather_pad_features.restype = None
    lib.gather_pad_features.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.crc32c_native.restype = ctypes.c_uint32
    lib.crc32c_native.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _LIB = lib
    return lib


def available(build: bool = True) -> bool:
    return _load(build_if_missing=build) is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def pack_edges(rows, cols, vals, block_off, block_len, n_graph, n_channel,
               max_nodes, edge_budget):
    """Native COO → padded [C, E] packing; returns (senders, receivers,
    weights, n_edge).  Raises RuntimeError on budget overflow."""
    lib = _load()
    assert lib is not None, "native library not built"
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    block_off = np.ascontiguousarray(block_off, np.int64)
    block_len = np.ascontiguousarray(block_len, np.int64)
    senders = np.empty((n_channel, edge_budget), np.int32)
    receivers = np.empty((n_channel, edge_budget), np.int32)
    weights = np.empty((n_channel, edge_budget), np.float32)
    n_edge = np.zeros((n_channel,), np.int32)
    rc = lib.pack_edges(
        _ptr(rows), _ptr(cols), _ptr(vals), _ptr(block_off), _ptr(block_len),
        n_graph, n_channel, max_nodes, edge_budget,
        _ptr(senders), _ptr(receivers), _ptr(weights), _ptr(n_edge),
    )
    if rc != 0:
        raise RuntimeError(
            "edge budget exceeded in native pack_edges" if rc == -1
            else "node index out of range in native pack_edges"
        )
    return senders, receivers, weights, n_edge


def gather_pad_features(features, idx, batch_graphs):
    lib = _load()
    assert lib is not None, "native library not built"
    features = np.ascontiguousarray(features, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    G, rows, feat = features.shape
    out = np.empty((batch_graphs, rows, feat), np.float32)
    lib.gather_pad_features(
        _ptr(features), _ptr(idx), len(idx), batch_graphs, rows, feat,
        _ptr(out),
    )
    return out


def crc32c(data: bytes) -> int:
    lib = _load()
    if lib is None:
        from kgcn_tpu.data.tfrecord import crc32c as py_crc

        return py_crc(data)
    buf = np.frombuffer(data, np.uint8)
    return int(lib.crc32c_native(_ptr(np.ascontiguousarray(buf)), len(buf)))


def _register_tfrecord(lib) -> bool:
    if getattr(lib, "_tfrecord_registered", False):
        return True
    if not hasattr(lib, "tfrecord_num_records"):
        return False
    lib.tfrecord_num_records.restype = ctypes.c_int64
    lib.tfrecord_num_records.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
    ]
    lib.tfrecord_count.restype = ctypes.c_int64
    lib.tfrecord_count.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.tfrecord_extract.restype = ctypes.c_int64
    lib.tfrecord_extract.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib._tfrecord_registered = True
    return True


def parse_tfrecord_arrays(path: str, keys, verify_crc: bool = True):
    """Parse every record of a TFRecord file in native code.

    Returns ``{key: (values, offsets)}`` where ``values`` is one flat
    float32/int64 array over ALL records and ``offsets`` is ``[n_records+1]``
    prefix sums — record ``i``'s values are ``values[offsets[i]:offsets[i+1]]``.
    Keys absent from the file map to empty arrays.  Returns None when the
    native library is unavailable (callers fall back to the Python codec).
    """
    lib = _load(build_if_missing=True)
    if lib is None or not _register_tfrecord(lib):
        return None
    with open(path, "rb") as f:
        buf = np.frombuffer(f.read(), np.uint8)
    if buf.size == 0:
        return {k: (np.empty(0, np.float32), np.zeros(1, np.int64)) for k in keys}
    keys = list(keys)
    key_blob = "".join(keys).encode()
    key_lens = np.asarray([len(k.encode()) for k in keys], np.int32)
    nk = len(keys)
    key_types = np.zeros(nk, np.int32)
    n = lib.tfrecord_num_records(_ptr(buf), buf.size, 1 if verify_crc else 0)
    if n < 0:
        raise ValueError(f"malformed TFRecord file {path} (code {n})")
    counts = np.zeros((n, nk), np.int64)
    rc = lib.tfrecord_count(
        _ptr(buf), buf.size, 0, key_blob, _ptr(key_lens), nk,
        _ptr(key_types), _ptr(counts),
    )
    if rc < 0:
        raise ValueError(f"malformed Example proto in {path} (code {rc})")
    offsets = np.zeros((nk, n + 1), np.int64)
    np.cumsum(counts.T, axis=1, out=offsets[:, 1:])
    out_arrays = []
    for k in range(nk):
        total = int(offsets[k, -1])
        dt = np.int64 if key_types[k] == 3 else np.float32
        out_arrays.append(np.empty(total, dt))
    ptrs = (ctypes.c_void_p * nk)(*[int(a.ctypes.data) for a in out_arrays])
    rc = lib.tfrecord_extract(
        _ptr(buf), buf.size, key_blob, _ptr(key_lens), nk,
        _ptr(key_types), _ptr(np.ascontiguousarray(offsets)), ptrs,
    )
    if rc < 0:
        raise ValueError(f"malformed Example proto in {path} (code {rc})")
    return {
        keys[k]: (out_arrays[k], offsets[k]) for k in range(nk)
    }
