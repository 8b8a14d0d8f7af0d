"""Open (free-space) boundary conditions: off-center can beam in vacuum.

Mirrors the reference's beam_in_vacuum_open_boundary test
(ref tests/beam_in_vacuum_open_boundary.normalized.1Rank.sh +
examples/beam_in_vacuum/analysis_open_boundary.py): a flattop beam of
radius R = 1 centered at (2, -1) in a domain only [-4, 4]^2 — the analytic
azimuthal B field (including the 1/r far field) is only reproduced if the
multipole open-boundary values are correct.
"""

import numpy as np

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation


DECK = """
amr.n_cell = 128 128 4
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.
hipace.depos_order_xy = 0
hipace.bxby_solver = predictor-corrector
hipace.predcorr_B_mixing_factor = 0.95
hipace.predcorr_max_iterations = 5
boundary.field = Open
boundary.particle = Absorbing
geometry.prob_lo = -4. -4. -2.
geometry.prob_hi =  4.  4.  2.
beams.names = beam
beam.injection_type = fixed_ppc
beam.profile = flattop
beam.zmin = -10.
beam.zmax = 10.
beam.radius = 1.
beam.density = 1.0
beam.u_mean = 0. 0. 1.e3
beam.u_std = 0. 0. 0.
beam.ppc = 2 2 1
beam.position_mean = 2. -1. 0.
plasmas.names = no_plasma
diagnostic.output_period = 0
diagnostic.field_data = Bx By ExmBy EypBx
"""

X_MID, Y_MID, R = 2.0, -1.0, 1.0


def _theory(r):
    """B_phi of an infinite can beam with jz0 = -1, mu0 = 1."""
    inside = np.abs(r) < R
    return np.where(inside, -r / 2.0, -R * R / (2.0 * np.where(inside, 1.0,
                                                               r)))


def test_open_boundary_can_beam():
    inputs = Inputs(DECK)
    sim = Simulation(inputs, verbose=0)
    res = sim.run_step(0)
    comps = sim.cfg.diag_comps
    diag = np.asarray(res["diag"])
    g = sim.geom
    isl = g.nz // 2
    xs = g.prob_lo[0] + (np.arange(g.nx) + 0.5) * g.dx
    ys = g.prob_lo[1] + (np.arange(g.ny) + 0.5) * g.dy
    iy_mid = int(np.argmin(np.abs(ys - Y_MID)))
    ix_mid = int(np.argmin(np.abs(xs - X_MID)))

    by = diag[isl, comps.index("By")][iy_mid, :]
    by_th = _theory(xs - X_MID)
    err_by = np.sum((by - by_th) ** 2) / np.sum(by_th ** 2)
    assert err_by < 0.015, f"By error {err_by}"

    bx = diag[isl, comps.index("Bx")][:, ix_mid]
    bx_th = -_theory(ys - Y_MID)
    err_bx = np.sum((bx - bx_th) ** 2) / np.sum(bx_th ** 2)
    assert err_bx < 0.005, f"Bx error {err_bx}"

    # Ex = ExmBy + c*By; with jz0 = rho0 = -1 theory equals By's
    ex = diag[isl, comps.index("ExmBy")][iy_mid, :] + by
    err_ex = np.sum((ex - by_th) ** 2) / np.sum(by_th ** 2)
    assert err_ex < 0.015, f"Ex error {err_ex}"

    ey = diag[isl, comps.index("EypBx")][:, ix_mid] - bx
    ey_th = -bx_th
    err_ey = np.sum((ey - ey_th) ** 2) / np.sum(ey_th ** 2)
    assert err_ey < 0.005, f"Ey error {err_ey}"
