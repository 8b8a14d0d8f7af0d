"""Slipped-beam overflow accounting.

The reference moves ALL particles that slip behind the current slice into
the Next slice (ref /root/reference/src/particles/sorting/SliceSort.H:16-24).
Here the per-slice slip carry has fixed capacity `hipace.slip_cap`; overflow
beyond it is emitted partially pushed and MUST be counted and surfaced
(`slip_overflow`), like the banded `lost` counter.
"""

import numpy as np

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

# slow beam (uz=1 -> vz ~ 0.58c) + huge dt: essentially every particle slips
# more than one slice during its subcycled push
DECK = """
amr.n_cell = 16 16 8
hipace.normalized_units = 1
max_step = 0
hipace.dt = 20.
hipace.slip_cap = {cap}
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -8. -8. -4.
geometry.prob_hi =  8.  8.  4.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 256
beam.profile = gaussian
beam.position_mean = 0. 0. 0.
beam.position_std = 0.3 0.3 1.0
beam.zmin = -3.9
beam.zmax = 3.9
beam.density = 1e-6
beam.u_mean = 0. 0. 1.
beam.u_std = 0. 0. 0.
beam.n_subcycles = 4
diagnostic.output_period = 0
"""


def _run(cap):
    sim = Simulation(Inputs(DECK.format(cap=cap)), verbose=0)
    res = sim.run_step(0)
    return sim, res


def test_overflow_counted_and_no_partial_emission_within_cap():
    # tiny cap: almost all 256 slipping particles overflow
    sim, res = _run(cap=4)
    assert "slip_overflow" in res
    over = int(res["slip_overflow"])
    assert over > 0, "expected slip_cap=4 to overflow with 256 slow particles"

    # generous cap: nothing overflows, and no emitted particle carries
    # unfinished subcycles
    sim2, res2 = _run(cap=4096)
    assert int(res2["slip_overflow"]) == 0
    v = np.asarray(res2["binned"]["valid"].reshape(-1))
    nsub = np.asarray(res2["binned"]["nsub"].reshape(-1))
    assert not np.any(v & (nsub > 0)), \
        "emitted beam particles must have completed their subcycles"
