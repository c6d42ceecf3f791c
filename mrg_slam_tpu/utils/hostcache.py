"""Per-host compilation-cache pinning for XLA:CPU AOT artifacts.

The JAX persistent compilation cache stores XLA:CPU results as AOT object
code compiled for the *build* machine's CPU features. Loading them on a
host with a different feature set emits "Machine type used for XLA:CPU
compilation doesn't match the machine type for execution ... could lead to
execution errors such as SIGILL" (observed in MULTICHIP_r02's tail when
the driver replayed the repo cache on another box). TPU executables are
keyed by device and don't have this problem.

`cpu_cache_dir(base)` returns `<base>/cpu-<fingerprint>` where the
fingerprint hashes the host CPU feature flags, so each machine keeps its
own XLA:CPU AOT namespace under the shared repo cache.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{feats}"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def cpu_cache_dir(base: str) -> str:
    """Per-host XLA:CPU cache directory under `base` (created on demand)."""
    d = os.path.join(base, f"cpu-{host_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    return d
