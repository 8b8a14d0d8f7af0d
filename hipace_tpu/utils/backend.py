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
