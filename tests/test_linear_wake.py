"""End-to-end: linear plasma wake vs theory.

Mirrors /root/reference/examples/linear_wake/analysis.py: the on-axis charge
density response to a flattop drive beam follows (Mehrling thesis p.41)
    n1(zeta) = nb(zeta) + (1/kp) int dzeta' sin(kp (zeta - zeta')) nb''(zeta')
with the same L2 tolerance (0.025). Exercises plasma init, the zeta pusher,
current deposition, the Poisson solves, and the explicit Bx/By solve.
"""

import numpy as np
import pytest

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

DECK = """
amr.n_cell = 32 32 200
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.
hipace.depos_order_xy = 2
hipace.deposit_rho = 1
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -10. -10. -7.5
geometry.prob_hi =  10.  10.  2.
beams.names = beam
beam.injection_type = fixed_ppc
beam.profile = flattop
beam.zmin = -1.
beam.zmax = 1.
beam.radius = 3.
beam.density = 0.01
beam.u_mean = 0. 0. 2000.
beam.u_std = 0. 0. 0.
beam.ppc = 1 1 1
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.u_mean = 0. 0. 0.
plasma.element = electron
diagnostic.output_period = 0
diagnostic.field_data = Ez rho
"""


def _rho_theory(zeta, dz, nb_array, kp=1.0):
    nz = len(zeta)
    nb_dzdz = np.zeros(nz)
    nb_dzdz[1:nz - 1] = (nb_array[0:nz - 2] - 2 * nb_array[1:nz - 1]
                         + nb_array[2:nz]) / dz**2
    # response integral as in the reference analysis (analysis.py:92-99)
    n_th = np.zeros(nz)
    for i in range(nz):
        # sum over sources ahead of zeta_i (zeta' > zeta_i)
        jj = np.arange(i, nz)
        n_th[i] = np.sum(dz / kp * np.sin(kp * dz * (i - jj)) * nb_dzdz[jj])
    return n_th + nb_array


@pytest.mark.parametrize("solver,pusher", [
    ("explicit", "leapfrog"),
    ("predictor-corrector", "leapfrog"),
    # AB5 multistep pusher (ref HIPACE_USE_AB5_PUSH compile option,
    # PlasmaParticleAdvance.cpp:218-305) must satisfy the same wake theory
    ("explicit", "ab5"),
])
def test_linear_wake_rho(solver, pusher):
    inputs = Inputs(DECK, overrides=[f"hipace.bxby_solver={solver}",
                                     f"hipace.plasma_pusher={pusher}"])
    sim = Simulation(inputs, verbose=0)
    res = sim.run_step(0)
    diag = np.asarray(res["diag"])  # (nz, ncomp, ny, nx)
    comps = sim.cfg.diag_comps
    rho = diag[:, comps.index("rho")]
    nz, ny, nx = rho.shape
    rho_axis = 0.25 * (rho[:, ny // 2 - 1, nx // 2 - 1]
                       + rho[:, ny // 2 - 1, nx // 2]
                       + rho[:, ny // 2, nx // 2 - 1]
                       + rho[:, ny // 2, nx // 2])
    g = sim.geom
    zeta = (np.arange(nz) + 0.5) * g.dz + g.prob_lo[2]
    nb = np.where((zeta >= -1.0) & (zeta <= 1.0), 0.01, 0.0)
    rho_th = _rho_theory(zeta, g.dz, nb)
    err = np.sum((rho_axis - rho_th) ** 2) / np.sum(rho_th ** 2)
    assert err < 0.025, f"L2 rel err {err} (solver={solver})"
