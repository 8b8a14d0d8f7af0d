"""Exact slipped-beam handling.

The reference moves ALL particles that slip behind the current slice into
the Next slice (ref /root/reference/src/particles/sorting/SliceSort.H:16-24).
Here the per-slice slip carry has fixed capacity `hipace.slip_cap`; when a
slice overflows it, the host driver grows the capacity (next power of two)
and re-runs the step from identical inputs, so results are EXACT — no
particle is ever emitted partially pushed (VERDICT r2 item 4).
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


def test_overflow_grows_cap_and_completes_all_subcycles():
    # tiny cap: almost all 256 slipping particles would overflow; the
    # driver must grow slip_cap and re-run until exact
    sim, res = _run(cap=4)
    assert sim.cfg.slip_cap > 4, "slip_cap should have been grown"
    assert int(res["slip_overflow"]) == 0
    v = np.asarray(res["binned"]["valid"].reshape(-1))
    nsub = np.asarray(res["binned"]["nsub"].reshape(-1))
    assert not np.any(v & (nsub > 0)), \
        "every emitted beam particle must have completed its subcycles"


def test_grown_cap_matches_generous_cap_exactly():
    # the re-run with grown capacity must equal a run that started with a
    # generous capacity (same RNG inputs; the step fn is deterministic)
    _, res_grown = _run(cap=4)
    _, res_big = _run(cap=4096)
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        a = np.asarray(res_grown["binned"][k].reshape(-1))
        b = np.asarray(res_big["binned"][k].reshape(-1))
        va = np.asarray(res_grown["binned"]["valid"].reshape(-1))
        vb = np.asarray(res_big["binned"]["valid"].reshape(-1))
        assert va.sum() == vb.sum()
        # compare as multisets (bin order within a slice may differ)
        np.testing.assert_allclose(np.sort(a[va]), np.sort(b[vb]),
                                   rtol=0, atol=0)


def test_no_overflow_within_generous_cap():
    sim2, res2 = _run(cap=4096)
    assert int(res2["slip_overflow"]) == 0
    assert sim2.cfg.slip_cap == 4096
    v = np.asarray(res2["binned"]["valid"].reshape(-1))
    nsub = np.asarray(res2["binned"]["nsub"].reshape(-1))
    assert not np.any(v & (nsub > 0))
