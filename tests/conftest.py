"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Tests never touch the real TPU; multi-chip sharding paths are validated on
the host-platform device farm exactly as the driver's dryrun does.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms via jax.config.update; claw it back to CPU for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cache even fast CPU compiles; the suite re-traces many static variants
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
# XLA:CPU cache entries are host-specific AOT code — pin per host
# fingerprint so another machine's entries are never replayed here
# (see mrg_slam_tpu/utils/hostcache.py)
from mrg_slam_tpu.utils.hostcache import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(
    os.environ["JAX_COMPILATION_CACHE_DIR"]))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    """Periodically drop live compiled executables during a long
    single-process run.

    XLA:CPU has segfaulted inside backend_compile_and_load after ~75-120
    tests' worth of compiles in one process (reproducible late-suite,
    passes in isolation). This clearing delays but does NOT prevent it —
    pytest.ini therefore forces `-n 4 --dist=loadfile` worker processes;
    the hook remains as defense-in-depth for `-p no:xdist` runs.
    """
    seen = set()
    for item in items:
        if item.fspath not in seen and seen:
            item.add_marker(pytest.mark.usefixtures("_clear_jax_caches"))
        seen.add(item.fspath)


@pytest.fixture
def _clear_jax_caches():
    # Only clear in single-process runs. Under xdist each worker runs
    # ~N/4 tests — below the XLA:CPU live-executable segfault threshold —
    # and clearing at every file boundary would force full re-traces of
    # cross-file shared programs (the static/traced config split makes
    # the heavy solver/pair programs file-agnostic, so reuse is common).
    if "PYTEST_XDIST_WORKER" not in os.environ:
        jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
