"""Persistent XLA compile-cache setup, keyed by host + CPU features.

XLA's persistent cache stores AOT-compiled CPU artifacts; loading one on
a machine with different CPU features can SIGILL. Keying the cache
directory by hostname alone is not enough (the same hostname can move
between machine types in a scheduled fleet), so the key also hashes the
/proc/cpuinfo feature flags: a different microarchitecture gets a fresh
directory instead of a poisoned one.

Residual noise: XLA:CPU embeds LLVM *tuning preferences*
(+prefer-no-scatter/+prefer-no-gather) in its AOT artifacts, and the
loader's host-feature probe never reports those, so cpu_aot_loader
prints a "machine features don't match / could SIGILL" error even when
the artifact was compiled on THIS machine. That warning is benign
(tuning flags, not ISA extensions); the keying here addresses the real
risk — artifacts crossing microarchitectures.
"""

from __future__ import annotations

import hashlib
import os
import platform


def cpu_cache_signature() -> str:
    """Short stable id of (arch, CPU feature flags) for cache keying."""
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = line.split(":", 1)[1].split()
                    sig += ":" + " ".join(sorted(feats))
                    break
    except OSError:
        pass
    return hashlib.sha1(sig.encode()).hexdigest()[:12]


def setup_compile_cache(min_compile_secs: float = 2.0) -> str:
    """Point jax at a per-(host, CPU-features) persistent cache dir.

    Must run after ``import jax`` but before compiles. Returns the dir.
    """
    import jax

    cache_dir = os.environ.get(
        "SHAPY_TPU_COMPILE_CACHE",
        f"/tmp/shapy_tpu_xla_cache_{platform.node()}_"
        f"{cpu_cache_signature()}",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
