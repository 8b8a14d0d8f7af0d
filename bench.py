"""Benchmark: zeta-slices/sec/chip on the reference's transverse benchmark.

Runs the reference's own examples/benchmarks/inputs_transverse_benchmark
deck (fixed_weight_pdf beam, 1 ppc plasma, explicit solver) at nxy=1023,
reduced to HIPACE_BENCH_NZ slices with the beam particle count scaled to
keep the reference's per-slice beam density (nxy*nxy*10 per 1000 slices,
ref inputs_transverse_benchmark:29).

Reports one JSON line. `value` is zeta-slices/sec/chip; `vs_baseline` is
relative to the round-1 recorded measurement (27.677 slices/s at 1023^2,
BENCH_r01.json) because the reference publishes no absolute numbers
(BASELINE.md) and no CUDA hardware is available here for a side-by-side.

Also prints (stderr) measured ns/push with subcycles counted — the
reference's end-of-run perf counters (ref Hipace.cpp:509-553) — and an HBM
roofline estimate for the deposit/gather path.

Env overrides: HIPACE_BENCH_NXY (default 1023), HIPACE_BENCH_NZ (128),
HIPACE_BENCH_STEPS (4: 1 warmup+compile, 3 measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax.numpy as jnp

ROUND1_BASELINE = 27.677  # slices/s, BENCH_r01.json


def _probe_backend(timeout=100):
    """The tunneled TPU backend can go UNAVAILABLE and then jax.devices()
    HANGS (not raises); probe in a subprocess so the bench fails fast
    (<60 s) with an explanatory record instead of hanging the driver."""
    from hipace_tpu.utils.backend import probe_backend
    return probe_backend(timeout)


def main():
    if not _probe_backend():
        print(json.dumps({
            "metric": "zeta-slices/sec/chip at 1023^2 transverse "
                      "(transverse_benchmark, pdf beam)",
            "value": 0.0,
            "unit": "slices/s",
            "vs_baseline": None,
            "error": "TPU backend unavailable (device probe hung); "
                     "last recorded measurement: 16.4 slices/s at nz=32, "
                     "W=32/K=8192 defaults",
        }))
        return 1
    nxy = int(os.environ.get("HIPACE_BENCH_NXY", "1023"))
    nz = int(os.environ.get("HIPACE_BENCH_NZ", "128"))
    steps = int(os.environ.get("HIPACE_BENCH_STEPS", "4"))
    npart = int(os.environ.get("HIPACE_BENCH_NPART",
                               max(1024, int(nxy * nxy * 10 * nz / 1000))))

    from hipace_tpu.parser import Inputs
    from hipace_tpu.pipeline.simulation import Simulation

    extra = os.environ.get("HIPACE_BENCH_OVERRIDES", "")
    inputs = Inputs.from_file(
        "/root/reference/examples/benchmarks/inputs_transverse_benchmark",
        overrides=[
            f"my_constants.nxy={nxy}",
            f"amr.n_cell={nxy} {nxy} {nz}",
            f"beam.num_particles={npart}",
            "max_step=0", "hipace.dt=1.0",
            "diagnostic.output_period=0",
        ] + ([o for o in extra.split(";") if o] if extra else []))
    sim = Simulation(inputs, verbose=0)

    def sync(res):
        # force device->host readback: block_until_ready does not
        # synchronize through the axon RPC tunnel
        return float(jnp.sum(res["binned"]["x"]))

    # warmup (compile)
    res = sim.run_step(0)
    sync(res)

    t0 = time.perf_counter()
    measured = max(1, steps - 1)
    for s in range(measured):
        sim.binned = res["binned"]
        sim.time += float(sim.dt)
        res = sim.run_step(s + 1)
    sync(res)
    wall = time.perf_counter() - t0

    n_slices = nz * measured
    slices_per_sec = n_slices / wall

    # ---- measured per-push / per-cell counters (subcycles counted,
    # ref Hipace.cpp:509-553)
    n_plasma = sum(sim.geom.nx * sim.geom.ny * p.ppc[0] * p.ppc[1]
                   * max(1, p.n_subcycles)
                   for p in sim.plasma_cfgs)
    plasma_pushes = n_plasma * n_slices
    beam_pushes = sum((b.num_particles or 0) * max(1, b.n_subcycles)
                      for b in sim.beam_cfgs) * measured
    pushes = plasma_pushes + beam_pushes
    cells = sim.geom.nx * sim.geom.ny * n_slices
    print(f"# measured: {wall:.3f} s for {n_slices} slices "
          f"({plasma_pushes:.3g} plasma + {beam_pushes:.3g} beam pushes)",
          file=sys.stderr)
    print(f"# ns/push (all, subcycled): {1e9 * wall / pushes:.3f}",
          file=sys.stderr)
    print(f"# ns/cell: {1e9 * wall / cells:.3f}", file=sys.stderr)
    # HBM roofline for the banded deposit/gather (ROADMAP perf notes): the
    # (K, NX) one-hot traffic dominates; v5e HBM ~= 820 GB/s
    K = sim.cfg.banded_K
    W = sim.cfg.banded_W
    n_p = sum(sim.geom.nx * sim.geom.ny * p.ppc[0] * p.ppc[1]
              for p in sim.plasma_cfgs)
    onehot_bytes = 8 * n_p * (sim.geom.nx + 2 * sim.geom.nguards)
    print(f"# roofline: one-hot traffic/slice ~ {onehot_bytes / 1e9:.2f} GB "
          f"(K={K}, W={W}) -> >= {onehot_bytes / 820e9 * 1e3:.1f} ms/slice "
          "per banded op at 820 GB/s HBM", file=sys.stderr)

    print(json.dumps({
        "metric": f"zeta-slices/sec/chip at {nxy}^2 transverse "
                  "(transverse_benchmark, pdf beam)",
        "value": round(slices_per_sec, 3),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / ROUND1_BASELINE, 3),
        "baseline_ref": "round-1 measurement 27.677 slices/s "
                        "(reference publishes no absolute numbers)",
        "ns_per_push": round(1e9 * wall / pushes, 3),
        "ns_per_cell": round(1e9 * wall / cells, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
