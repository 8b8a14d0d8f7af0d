"""Benchmark: zeta-slices/sec/chip on the blowout_wake configuration.

North-star metric per BASELINE.json: slices/sec/chip at 1023^2 transverse
(blowout_wake deck, explicit solver, 1 ppc plasma, Gaussian drive beam).
The reference publishes no absolute numbers (BASELINE.md); vs_baseline is
reported as null until a CUDA reference measurement exists.

Env overrides: HIPACE_BENCH_NXY (default 1023), HIPACE_BENCH_NZ (default 64),
HIPACE_BENCH_STEPS (default 2: 1 warmup+compile, 1 measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


DECK = """
amr.n_cell = {nxy} {nxy} {nz}
hipace.normalized_units = 1
max_step = 0
hipace.dt = 1.0
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -8. -8. -6.
geometry.prob_hi =  8.  8.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = {npart}
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.3 0.3 1.41
beam.zmin = -5.9
beam.zmax = 1.9
beam.density = 3.
beam.u_mean = 0. 0. 2000.
beam.u_std = 0. 0. 0.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 0
diagnostic.field_data = Ez
"""


def main():
    nxy = int(os.environ.get("HIPACE_BENCH_NXY", "1023"))
    nz = int(os.environ.get("HIPACE_BENCH_NZ", "32"))
    steps = int(os.environ.get("HIPACE_BENCH_STEPS", "2"))
    npart = min(1_000_000, 100 * nz)

    from hipace_tpu.parser import Inputs
    from hipace_tpu.pipeline.simulation import Simulation

    inputs = Inputs(DECK.format(nxy=nxy, nz=nz, npart=npart))
    sim = Simulation(inputs, verbose=0)

    def sync(res):
        # force device->host readback: block_until_ready does not synchronize
        # through the axon RPC tunnel
        return float(jnp.sum(res["binned"]["x"]))

    # warmup (compile)
    res = sim.run_step(0)
    sync(res)

    t0 = time.perf_counter()
    for s in range(max(1, steps - 1)):
        sim.binned = res["binned"]
        sim.time += float(sim.dt)
        res = sim.run_step(s + 1)
    sync(res)
    wall = time.perf_counter() - t0

    n_slices = nz * max(1, steps - 1)
    slices_per_sec = n_slices / wall
    print(json.dumps({
        "metric": f"zeta-slices/sec/chip at {nxy}^2 transverse (blowout_wake)",
        "value": round(slices_per_sec, 3),
        "unit": "slices/s",
        "vs_baseline": None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
