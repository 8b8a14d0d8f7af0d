"""Nonlinear blowout wake: cross-validation and physics sanity.

The reference validates blowout via checksums (no analytic theory). Here the
two independent Bx/By solvers (explicit multigrid vs predictor-corrector
FFT fixed-point) are cross-checked in the nonlinear regime, plus physical
sanity: cavity formation (electron evacuation) and the accelerating field
spike at the back of the bubble. Deck follows
/root/reference/examples/blowout_wake/inputs_normalized (reduced size).
"""

import numpy as np
import pytest

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

DECK = """
amr.n_cell = 48 48 100
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.
hipace.depos_order_xy = 2
hipace.deposit_rho = 1
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -8. -8. -6.
geometry.prob_hi =  8.  8.  6.
beams.names = beam
beam.injection_type = fixed_ppc
beam.profile = gaussian
beam.zmin = -5.9
beam.zmax = 5.9
beam.radius = 1.2
beam.density = 3.
beam.u_mean = 0. 0. 2000.
beam.u_std = 0. 0. 0.
beam.position_mean = 0. 0. 0.
beam.position_std = 0.3 0.3 1.41
beam.ppc = 1 1 1
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 0
diagnostic.field_data = Ez rho ExmBy
"""


def _axis(arr):
    nz, ny, nx = arr.shape
    return 0.25 * (arr[:, ny // 2 - 1, nx // 2 - 1]
                   + arr[:, ny // 2 - 1, nx // 2]
                   + arr[:, ny // 2, nx // 2 - 1]
                   + arr[:, ny // 2, nx // 2])


def _run(solver):
    inputs = Inputs(DECK, overrides=[f"hipace.bxby_solver={solver}"])
    sim = Simulation(inputs, verbose=0)
    res = sim.run_step(0)
    return sim, np.asarray(res["diag"])


def test_blowout_explicit_vs_predictor_corrector():
    sim, d_ex = _run("explicit")
    _, d_pc = _run("predictor-corrector")
    comps = sim.cfg.diag_comps
    ez_ex = _axis(d_ex[:, comps.index("Ez")])
    ez_pc = _axis(d_pc[:, comps.index("Ez")])
    err = np.sum((ez_ex - ez_pc) ** 2) / np.sum(ez_ex ** 2)
    assert err < 0.01, f"solver cross-validation L2 err {err}"


def test_blowout_cavity_and_field_sanity():
    sim, diag = _run("explicit")
    comps = sim.cfg.diag_comps
    g = sim.geom
    rho = diag[:, comps.index("rho")]
    ez = _axis(diag[:, comps.index("Ez")])
    zeta = (np.arange(g.nz) + 0.5) * g.dz + g.prob_lo[2]

    # cavity: on-axis net charge density approaches +1 (full electron
    # evacuation, bare ions) somewhere behind the driver
    rho_axis = _axis(rho)
    behind = zeta < -1.0
    assert rho_axis[behind].max() > 0.8, \
        f"no blowout cavity: max on-axis rho {rho_axis[behind].max()}"

    # strong accelerating field at the back of the bubble, decelerating
    # inside the driver; |Ez| well into the nonlinear range
    assert ez.min() < -0.35
    # the full accelerating spike lies beyond the domain tail at this box
    # size; require a substantial positive Ez near the tail
    assert ez.max() > 0.15
    # wake trails the driver: Ez ahead of the beam head is ~0
    ahead = zeta > 5.0
    assert np.max(np.abs(ez[ahead])) < 0.05

    # focusing field inside the cavity: ExmBy ~ x/2 (ion column)
    exmby = diag[:, comps.index("ExmBy")]
    isl = np.argmin(np.abs(zeta + 2.0))  # a slice in the cavity
    ny, nx = exmby.shape[1:]
    x = (np.arange(nx) + 0.5) * g.dx + g.prob_lo[0]
    line = 0.5 * (exmby[isl, ny // 2 - 1] + exmby[isl, ny // 2])
    core = np.abs(x) < 0.75
    slope = np.polyfit(x[core], line[core], 1)[0]
    assert abs(slope - 0.5) < 0.15, f"ion-column slope {slope} != 0.5"
