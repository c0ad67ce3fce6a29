"""Process-level JAX setup shared by every CLI entry point.

Persistent compilation cache: each CLI invocation is a fresh process (the
KNIME nodes shell out per run, HPO spawns a process per trial), so without
a disk cache every run pays the full XLA compile (20-40 s on a tunnel-
attached TPU).  Enabling `jax_compilation_cache_dir` makes repeat
invocations hit the cache.  Config key `compile_cache_dir` overrides the
location; set it to "" / false to disable.
"""
from __future__ import annotations

import os


def cpu_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT cache entries encode the *compile-time* machine features;
    loading them on a host with fewer features logs errors and can SIGILL.
    Keying the cache dir by the actual feature set (not just the arch)
    makes a shared/NFS HOME safe across heterogeneous x86 hosts.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofp"


def setup_jax(config: dict | None = None, *, cpu: bool = False) -> None:
    import platform

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
        # the explicit CLI flag wins over any launcher --platform value:
        # initialize_from_env applies ENV_PLATFORM, so align it (this also
        # makes it enable the gloo TCP collectives the CPU backend needs)
        from kgcn_tpu.parallel.launch import ENV_COORDINATOR, ENV_PLATFORM

        if os.environ.get(ENV_COORDINATOR):
            os.environ[ENV_PLATFORM] = "cpu"
    # under `kgcn-tpu-launch` every CLI process joins the distributed job
    # before the first backend touch (no-op when the env is absent) — ALSO
    # under --cpu: two launcher workers that silently skip the join would
    # run as independent single-process jobs clobbering each other's output
    from kgcn_tpu.parallel.launch import initialize_from_env

    initialize_from_env()
    cache = (config or {}).get(
        "compile_cache_dir",
        os.environ.get(
            "KGCN_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "kgcn_tpu", "xla"),
        ),
    )
    if cache:
        try:
            # segregate by jax version + host arch so a shared/NFS HOME never
            # serves AOT code compiled for a different machine (observed:
            # XLA "target machine feature ... not supported" → SIGILL risk)
            cache = os.path.join(
                str(cache),
                f"{jax.__version__}-{platform.machine()}-{cpu_fingerprint()}",
            )
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            # cache even fast compiles — CLI processes are short-lived
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass  # cache is an optimisation; never fail a run over it
    # multi-host runtime: config '"distributed": {}' (or with explicit
    # coordinator_address / num_processes / process_id) starts
    # jax.distributed so jax.devices() spans every host of the slice —
    # run the SAME CLI command on each host
    dist = (config or {}).get("distributed")
    if dist is not None and not cpu:
        from kgcn_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(dist if isinstance(dist, dict) else {})
