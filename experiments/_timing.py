"""Shared honest timing for on-chip experiments — re-export of the
canonical readback-slope implementation (kgcn_tpu/runtime/timing.py).

Kept as a module so the experiment scripts' ``from _timing import force,
slope_time`` imports keep working when run from this directory; the logic
lives in ONE place."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kgcn_tpu.runtime.timing import chain_time, force, slope_time  # noqa: E402,F401
