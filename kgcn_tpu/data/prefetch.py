"""Threaded batch prefetching.

Batch assembly + host→device transfer runs in a background thread while the
device executes the current step — the standard double-buffered input
pipeline (the reference had no overlap at all: feed_dict building blocked
every ``sess.run``, kgcn/core.py:267-269).  Especially important on
tunnel-attached TPUs where each transfer carries tens of ms of latency.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def _enabled() -> bool:
    """Prefetch threads hurt on tunnel-attached TPUs (background-thread
    transfers serialise against the tunnel — measured 15x slower epochs), so
    it is opt-in there.  KGCN_PREFETCH=1/0 overrides."""
    import os

    env = os.environ.get("KGCN_PREFETCH")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from jax._src import xla_bridge

        # the axon plugin (tunnel-attached TPU) reports itself in
        # platform_version; its transfers are tunnel round-trips
        if "axon" in str(
            getattr(xla_bridge.get_backend(), "platform_version", "")
        ).lower():
            return False
    except Exception:
        pass
    return True


def prefetch(iterable: Iterable[T], size: int = 2) -> Iterator[T]:
    """Wrap an iterator so ``size`` items are prepared ahead in a thread."""
    if not _enabled():
        yield from iterable
        return
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator — a plain q.put would block this thread forever,
        # pinning `size` prepared device batches for the process lifetime
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer exited (normally, exception, or GC of the generator):
        # release the producer, JOIN it, then drain — a producer blocked in
        # _put can complete its put after stop.set(), so draining before it
        # exits would leave one prepared (possibly device-resident) batch
        # pinned in the abandoned queue until GC
        stop.set()
        t.join(timeout=5.0)
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
