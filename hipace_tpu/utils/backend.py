"""Backend liveness probe.

The tunneled TPU backend used in this environment can go UNAVAILABLE in a
way where ``jax.devices()`` HANGS indefinitely rather than raising.  Any
entry point that touches the default backend (CLI, bench, driver entry)
must probe it in a subprocess first so it can fail fast with an
explanatory message instead of freezing.
"""

from __future__ import annotations

import os
import subprocess
import sys


def backend_known_safe() -> bool:
    """True when the default platform is forced to CPU, so jax.devices()
    cannot touch a tunneled device plugin."""
    return os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu"


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (best-effort).

    The production step at 1023^2 with occupancy-bucketed beam ops
    (hipace.beam_buckets=4) compiles ~10 min cold on the tunneled v5e;
    with the cache warm it loads in seconds. The axon PJRT backend
    serves the cache fine (verified: entries written + hit on reload).
    Safe to call multiple times; ignored if jax is already initialized
    with a cache or the filesystem is read-only.
    """
    import jax

    try:
        cache_dir = path or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


def probe_backend(timeout: float = 100.0) -> bool:
    """Probe the default jax backend in a subprocess; False if it hangs
    or errors. Cheap shortcut when JAX_PLATFORMS=cpu."""
    if backend_known_safe():
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
