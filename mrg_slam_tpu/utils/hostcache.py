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


# cpuinfo lines that determine XLA:CPU's target features. `flags` alone is
# NOT enough: XLA adds pseudo-features like +prefer-no-gather from the
# microcode-level gather-data-sampling mitigation, which surfaces in the
# `bugs`/`microcode` lines while the `flags` line stays identical — two
# such hosts hashed equal and replayed each other's AOT code (the
# machine-feature mismatch warnings in MULTICHIP_r02's tail reappeared in
# round 3 despite the flags-only fingerprint).
_CPUINFO_KEYS = ("vendor_id", "cpu family", "model name", "model",
                 "stepping", "microcode", "flags", "features", "bugs")

# Kernel mitigation state directory. The +prefer-no-gather/-no-scatter
# pseudo-features XLA bakes into AOT code track the KERNEL's mitigation
# status (e.g. gather_data_sampling "Mitigation: Microcode" vs "Not
# affected"), which two VMs with byte-identical /proc/cpuinfo first blocks
# can disagree on — the round-3 collision (MULTICHIP_r03 tail) was exactly
# such a pair. Hash every vulnerability file's content too.
_VULN_DIR = "/sys/devices/system/cpu/vulnerabilities"


def host_fingerprint(cpuinfo_path: str = "/proc/cpuinfo",
                     vuln_dir: str = _VULN_DIR) -> str:
    """Short stable hash of this host's CPU identity + feature set +
    kernel mitigation state."""
    parts = []
    try:
        with open(cpuinfo_path) as f:
            seen = set()
            for line in f:
                if not line.strip():
                    break  # first processor block only
                k = line.split(":", 1)[0].strip().lower()
                if k in _CPUINFO_KEYS and k not in seen:
                    seen.add(k)
                    v = " ".join(sorted(line.split(":", 1)[1].split()))
                    parts.append(f"{k}={v}")
    except OSError:
        pass
    try:
        for name in sorted(os.listdir(vuln_dir)):
            try:
                with open(os.path.join(vuln_dir, name)) as f:
                    parts.append(f"vuln:{name}={f.read().strip()}")
            except OSError:
                pass
    except OSError:
        pass
    key = f"{platform.machine()}|" + ";".join(sorted(parts))
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def cpu_cache_dir(base: str) -> str:
    """Per-host XLA:CPU cache directory under `base` (created on demand)."""
    d = os.path.join(base, f"cpu-{host_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    return d
