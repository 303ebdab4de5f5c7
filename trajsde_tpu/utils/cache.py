"""Compile-cache directory helpers.

XLA:CPU executables bake the host ISA into the emitted code, and jax's
persistent compilation cache key does NOT include the CPU feature set —
artifacts written on one VM boot can be reloaded on a later boot with
different CPU features, where they SIGILL or fail in ways that look like
flaky tests (observed once in round 4: a deserialized executable from a
previous boot produced a spurious "Array has been deleted" failure under
a contended run; the loader printed SIGILL warnings).  ``cpu_cache_dir``
fingerprints the cache path with the host's CPU flags + the jax version
so cross-boot artifacts are structurally unreachable.

The TPU-side cache (``/tmp/jax_cache_trajsde``) is unaffected: its
executables target the device, not the host ISA.
"""
from __future__ import annotations

import hashlib
import platform


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            feats = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:  # non-Linux: degrade to the coarse identifier
        feats = platform.processor() or platform.machine()
    import jax

    return hashlib.sha256(
        f"{feats}|{jax.__version__}".encode()
    ).hexdigest()[:10]


def cpu_cache_dir(base: str = "/tmp/jax_cache_trajsde_cpu") -> str:
    """Persistent-cache dir for XLA:CPU, keyed by host CPU features."""
    return f"{base}_{_host_fingerprint()}"
