"""Multi-process launcher and per-process distributed bring-up.

The reference's only multi-process story is hand-written shell scripts that
pin one python process per GPU (reference: sample_chem/compound-protein_
interaction/run.sh, script_cv/02run_fold.sh) — no shared mesh, no
collectives, results merged by the filesystem.  The TPU-native equivalent is
a real multi-controller runtime: every process calls
``jax.distributed.initialize``, ``jax.devices()`` spans all hosts, and ONE
SPMD program runs over the global mesh (scaling-book recipe: mesh +
shardings + XLA collectives).

Two pieces:

* ``kgcn-tpu-launch --nprocs N -- <any kgcn command>`` — spawn N worker
  processes on this host with the coordination env set, stream their output
  with ``[pK]`` prefixes, and propagate failures.  On a real TPU pod each
  host runs the command directly (jax autodetects the slice topology) and
  this launcher is only needed for single-host simulation / CPU testing.
* ``initialize_from_env()`` — called from ``setup_jax`` in every CLI entry
  point: if the launcher's env vars are present, join the cluster before
  the first backend touch.  On CPU the gloo collectives backend is enabled
  so cross-process psum/all-gather work without TPU ICI.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
import threading
from typing import Dict, List, Optional, Sequence

ENV_COORDINATOR = "KGCN_DIST_COORDINATOR"
ENV_NUM_PROCESSES = "KGCN_DIST_NUM_PROCESSES"
ENV_PROCESS_ID = "KGCN_DIST_PROCESS_ID"
ENV_PLATFORM = "KGCN_DIST_PLATFORM"


def initialize_from_env() -> bool:
    """Join the distributed runtime described by the launcher env vars.

    Returns True if initialization ran (this process is part of a
    multi-process run), False when the env is absent or jax.distributed is
    already up.  Must run before the first JAX backend initialisation.
    """
    coord = os.environ.get(ENV_COORDINATOR)
    if not coord:
        return False
    import jax

    platform = os.environ.get(ENV_PLATFORM)
    if platform:
        # the axon TPU plugin in this image ignores JAX_PLATFORMS, so force
        # the platform through jax.config (same workaround as tests/conftest)
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        # CPU has no ICI; gloo (TCP) provides cross-process collectives
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from kgcn_tpu.parallel.mesh import initialize_distributed

    return initialize_distributed({
        "coordinator_address": coord,
        "num_processes": int(os.environ[ENV_NUM_PROCESSES]),
        "process_id": int(os.environ[ENV_PROCESS_ID]),
    })


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _with_device_count(flags: str, n: int) -> str:
    """Rewrite XLA_FLAGS so each worker gets n virtual host devices."""
    parts = [
        p for p in flags.split()
        if not p.startswith("--xla_force_host_platform_device_count")
    ]
    parts.append(f"--xla_force_host_platform_device_count={n}")
    return " ".join(parts)


def launch(
    nprocs: int,
    command: Sequence[str],
    *,
    port: Optional[int] = None,
    platform: Optional[str] = None,
    devices_per_process: Optional[int] = None,
    env: Optional[Dict[str, str]] = None,
    timeout: Optional[float] = None,
    stream: bool = True,
) -> List[subprocess.CompletedProcess]:
    """Spawn ``nprocs`` copies of ``command`` as one distributed job.

    Each worker gets ``KGCN_DIST_*`` env vars; ``initialize_from_env`` (wired
    into ``setup_jax``) makes any kgcn CLI command join the job.  Output is
    streamed line-by-line with ``[pK]`` prefixes (interleaving preserved per
    worker).  Returns one CompletedProcess per worker, stdout+stderr merged.
    """
    port = port or _free_port()
    procs = []
    for pid in range(nprocs):
        wenv = dict(os.environ)
        wenv.update(env or {})
        wenv[ENV_COORDINATOR] = f"127.0.0.1:{port}"
        wenv[ENV_NUM_PROCESSES] = str(nprocs)
        wenv[ENV_PROCESS_ID] = str(pid)
        if platform:
            wenv[ENV_PLATFORM] = platform
        if devices_per_process:
            wenv["XLA_FLAGS"] = _with_device_count(
                wenv.get("XLA_FLAGS", ""), devices_per_process
            )
        procs.append(subprocess.Popen(
            list(command), env=wenv, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))

    outputs = [[] for _ in procs]

    def pump(i, p):
        for line in p.stdout:
            outputs[i].append(line)
            if stream:
                sys.stdout.write(f"[p{i}] {line}")
                sys.stdout.flush()

    threads = [
        threading.Thread(target=pump, args=(i, p), daemon=True)
        for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    results = []
    try:
        # one shared deadline across ALL workers (a per-wait timeout would
        # grant each subsequent worker a fresh budget, up to nprocs×timeout)
        import time

        deadline = None if timeout is None else time.monotonic() + timeout
        for i, p in enumerate(procs):
            p.wait(timeout=None if deadline is None
                   else max(0.0, deadline - time.monotonic()))
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise
    finally:
        for t in threads:
            t.join(timeout=10)
    for i, p in enumerate(procs):
        results.append(subprocess.CompletedProcess(
            list(command), p.returncode, "".join(outputs[i]), None
        ))
    return results


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="kgcn-tpu-launch",
        description="Run a kgcn command as N cooperating distributed "
                    "processes on this host (single-host pod simulation; "
                    "on a real pod run the command directly on each host).",
    )
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform in workers (e.g. cpu)")
    ap.add_argument("--devices-per-process", type=int, default=None,
                    help="virtual host devices per worker (CPU testing)")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("command", nargs=argparse.REMAINDER,
                    help="-- followed by the worker command")
    args = ap.parse_args(argv)
    cmd = list(args.command)
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no worker command given (use: kgcn-tpu-launch --nprocs 2 "
                 "-- kgcn-tpu train --config c.json)")
    results = launch(
        args.nprocs, cmd, port=args.port, platform=args.platform,
        devices_per_process=args.devices_per_process,
    )
    rc = max(r.returncode for r in results)
    if rc:
        bad = [i for i, r in enumerate(results) if r.returncode]
        print(f"[launch] FAILED workers: {bad}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
