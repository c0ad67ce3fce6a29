"""Test config: run on a virtual 8-device CPU mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4: multi-host logic testable
single-host via xla_force_host_platform_device_count).

NB: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so we
force CPU through jax.config before any backend is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
_PLATFORM = os.environ.get("KGCN_TEST_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _PLATFORM)

import jax  # noqa: E402

jax.config.update("jax_platforms", _PLATFORM)
# Numerical tests compare against NumPy float32 references.
jax.config.update("jax_default_matmul_precision", "highest")

if _PLATFORM == "cpu":
    assert jax.default_backend() == "cpu"

# Persistent XLA compile cache for the suite: most test wall-time on this
# 2-core box is CPU compiles of jitted train steps, repeated identically
# every run.  First run populates; repeat runs (every later round) hit disk.
_cache = os.environ.get(
    "KGCN_TEST_COMPILE_CACHE",
    os.path.expanduser("~/.cache/kgcn_tpu/xla-tests"),
)
if _cache:
    try:
        # key by CPU feature set: stale AOT entries compiled on a beefier
        # host log loader errors and can SIGILL (see jax_setup.cpu_fingerprint)
        from kgcn_tpu.runtime.jax_setup import cpu_fingerprint

        _cache = os.path.join(_cache, cpu_fingerprint())
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass


# Scheduling: xdist --dist loadfile hands whole files to workers in
# collection (alphabetical) order.  test_multiprocess.py is one indivisible
# ~60 s chunk (a 2-process distributed job behind a module fixture) — picked
# up mid-alphabet it lands in the tail and extends the suite by most of its
# duration.  Front-load ONLY that file: its fixture then overlaps the many
# cheap early files.  (Front-loading every heavy file was measured SLOWER —
# all the contention-heavy tests then run simultaneously on 2 cores.)


def pytest_collection_modifyitems(config, items):
    items.sort(
        key=lambda it: 0 if it.fspath.basename == "test_multiprocess.py"
        else 1)
