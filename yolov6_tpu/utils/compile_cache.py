"""Machine-fingerprinted persistent JAX compile cache.

XLA:CPU AOT artifacts are machine-specific: loading a cache entry compiled
on a host with different CPU features fails with ``cpu_aot_loader.cc``
feature-mismatch errors on EVERY lookup, turning the cache into pure
overhead (this burned the round-2 multi-chip dryrun).  Key the cache
directory by a fingerprint of the host (platform + CPU feature flags) so a
workspace migrated between machines gets a fresh cache instead of a
poisoned one.

KNOWN LOG NOISE (measured, benign): this jaxlib's CPU AOT loader rejects
even SAME-MACHINE entries — compile-time target features include tuning
flags (``+prefer-no-scatter``, ``+prefer-no-gather``) that host feature
detection never reports, so every cross-process lookup logs two ~3 KB
``cpu_aot_loader.cc:210`` E-lines. The load then falls back to the cached
optimized HLO and only re-runs backend codegen: a yolov6n fwd+decode
compile measured 24 s cold vs 5.5 s warm WITH the E-lines. Treat the
messages as noise, not as cache poisoning — poisoning shows up as warm
times equal to cold times.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable hash of the host's architecture + CPU feature flags."""
    parts = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:10]


def cache_dir(root: str | None = None) -> str:
    """Per-machine cache dir (``.cache/jax-<fingerprint>``).

    ``YOLOV6_TPU_TEST_CACHE`` overrides the whole path (no fingerprint —
    the caller owns it).
    """
    override = os.environ.get("YOLOV6_TPU_TEST_CACHE")
    if override:
        return override
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, ".cache", f"jax-{machine_fingerprint()}")


def enable_persistent_cache(root: str | None = None, min_compile_secs: float = 2.0) -> str:
    """Point JAX's persistent compile cache at the per-machine dir."""
    import jax

    d = cache_dir(root)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return d
