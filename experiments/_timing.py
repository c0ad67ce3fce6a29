"""Shared honest timing for on-chip experiments — re-export of the
canonical readback-slope implementation (kgcn_tpu/runtime/timing.py).

Kept as a module so the experiment scripts' ``from experiments._timing
import force, slope_time`` imports keep working (each script inserts the
repo root on sys.path itself); the logic lives in ONE place."""
from __future__ import annotations

from kgcn_tpu.runtime.timing import chain_time, force, slope_time  # noqa: F401
