"""Test harness configuration.

Tests run on CPU with a fake 8-device mesh and x64 enabled:
- CPU: TPU compiles go through a minutes-scale remote AOT helper
  (SURVEY.md §7 environment notes); numerics are identical on CPU.
- 8 fake devices: ``shard_map`` tests exercise the same code path as a real
  v5e-8 (SURVEY.md §4 item 5 — the "fake backend" answer).
- x64: the accuracy bar is rtol=1e-6 against SciPy f64 baselines.

NOTE: this environment pre-imports jax at interpreter startup
(sitecustomize), so JAX_PLATFORMS/env vars are already snapshotted —
``jax.config.update`` is the only override that works. XLA_FLAGS is still
read lazily at first CPU-client creation, so setting it here works as long
as no test touches a backend before conftest import.
"""

import os

# XLA:CPU's JIT mmaps code pages per compiled executable and never
# unmaps them for live executables; a full-suite process accumulates
# memory maps at ~80/s on this host (measured round 5) and hits the
# kernel's default vm.max_map_count=65530 ~15 min in, at which point
# mmap fails inside LLVM and the process SIGSEGVs mid-compile (the
# late-suite crash; reproduced with the persistent compile cache ON and
# OFF, at whichever big program happened to sit past the cliff). Raise
# the tunable when we can (CI images run as root); otherwise the
# compile-heavy-first collection order below keeps the biggest programs
# clear of the cliff and a warm .jax_cache keeps total compiles low.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _maps_limit = int(f.read())
    if _maps_limit < 1048576:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1048576")
except OSError:
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: stepper compiles dominate suite wall
# time on this 1-core host (~20 min cold). The cache keys on HLO, so
# identical programs re-built by different test modules — and by repeat
# suite runs — deserialize instead of recompiling. Safe cross-run: keys
# include jaxlib version and compile options.
#
# TPUSYSBIO_DISABLE_COMPILE_CACHE=1 turns it off (diagnostic escape
# hatch). Round-5 controlled experiment: the late-suite segfault occurs
# with the cache OFF too — the fault is in XLA:CPU *compilation* itself
# (see the collection-order note below), not the AOT cache path.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
if os.environ.get("TPUSYSBIO_DISABLE_COMPILE_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Compile-heaviest modules first: defense in depth for the map-count
# cliff above when the vm.max_map_count raise is not permitted
# (non-root). The biggest programs (the Radau 2n-embedded stepper with
# 30 jvp sensitivity columns; the full sensitivity matrix suites) then
# compile while the process is young; ordering is otherwise the default
# collection order, and single-module runs are unaffected.
_COMPILE_HEAVY_FIRST = ("test_solvers.py", "test_sens.py")


def pytest_collection_modifyitems(config, items):
    def rank(item):
        name = os.path.basename(str(item.fspath))
        return (_COMPILE_HEAVY_FIRST.index(name)
                if name in _COMPILE_HEAVY_FIRST
                else len(_COMPILE_HEAVY_FIRST))

    items.sort(key=rank)  # stable: preserves order within each group


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    """Load-or-generate SciPy golden trajectories (SURVEY.md §4 item 1).

    Fixtures are .npz files produced by ``bench/make_golden.py`` at tight
    tolerance (rtol=1e-8/atol=1e-11); if one is missing it is generated on
    the fly and cached, so the suite is self-bootstrapping.
    """
    from bench import make_golden

    def load(name: str):
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        if not os.path.exists(path):
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            make_golden.generate(name, path)
        return np.load(path)

    return load
