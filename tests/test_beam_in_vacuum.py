"""End-to-end: can beam in vacuum vs magnetostatic theory.

Mirrors /root/reference/examples/beam_in_vacuum/analysis.py: for a flattop
(can) beam of radius R and density 1 in normalized units,
    By(x) = mu0 jz0 x/2            (|x| < R)
    By(x) = mu0 jz0 R^2/(2x)       (|x| > R),  jz0 = -1
"""

import numpy as np

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

DECK = """
amr.n_cell = 128 128 8
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.0
boundary.field = Dirichlet
boundary.particle = Absorbing
geometry.prob_lo = -32. -32. -2.
geometry.prob_hi =  32.  32.  2.

beams.names = beam
beam.injection_type = fixed_ppc
beam.profile = flattop
beam.zmin = -10.
beam.zmax = 10.
beam.radius = 1.
beam.density = 1.
beam.u_mean = 0. 0. 1000.
beam.u_std = 0. 0. 0.
beam.ppc = 2 2 1
diagnostic.output_period = 0
"""


def _run(extra=()):
    inputs = Inputs(DECK, overrides=extra)
    sim = Simulation(inputs, verbose=0)
    res = sim.run_step(0)
    return sim, res


def test_beam_in_vacuum_by_field():
    sim, res = _run()
    diag = np.asarray(res["diag"])  # (nz, ncomp, ny, nx)
    comps = sim.cfg.diag_comps
    by = diag[4, comps.index("By")]  # mid slice
    ny, nx = by.shape
    x = (np.arange(nx) + 0.5) * sim.geom.dx + sim.geom.prob_lo[0]
    by_line = 0.5 * (by[ny // 2 - 1, :] + by[ny // 2, :])

    jz0 = -1.0
    by_th = np.where(np.abs(x) < 1.0, jz0 * x / 2.0,
                     jz0 / (2.0 * np.where(np.abs(x) < 1.0, 1.0, x)))
    # same L2 metric and tolerance as the reference analysis
    # (ref examples/beam_in_vacuum/analysis.py:137-149)
    err_l2 = np.sum((by_line - by_th) ** 2) / np.sum(by_th ** 2)
    assert err_l2 < 0.015, f"L2 rel err {err_l2}"
    # Bx on the x axis should vanish by symmetry
    bx = diag[4, comps.index("Bx")]
    bx_line = 0.5 * (bx[ny // 2 - 1, :] + bx[ny // 2, :])
    assert np.max(np.abs(bx_line)) < 0.01 * np.max(np.abs(by_th))


def test_beam_in_vacuum_exmby():
    # ExmBy = Ex - By: for an ultrarelativistic beam Ex ~ -By (focusing
    # cancellation ~ 1/gamma^2), so ExmBy ~ jz0*x (twice By’s magnitude,
    # opposite sign relation Ex = rho0/eps0 x/2 with rho0 = -1)
    sim, res = _run()
    diag = np.asarray(res["diag"])
    comps = sim.cfg.diag_comps
    ny = diag.shape[2]
    exmby = diag[4, comps.index("ExmBy")]
    line = 0.5 * (exmby[ny // 2 - 1, :] + exmby[ny // 2, :])
    x = (np.arange(line.size) + 0.5) * sim.geom.dx + sim.geom.prob_lo[0]
    rho0 = -1.0
    ex_th = np.where(np.abs(x) < 1.0, rho0 * x / 2.0,
                     rho0 / (2.0 * np.where(np.abs(x) < 1.0, 1.0, x)))
    by_th = -ex_th  # jz0 = rho0 (v=c): By = mu0 jz0 x/2 = -Ex... sign check
    th = ex_th - by_th * 0  # ExmBy theory: Ex - c*By = Ex - (-Ex) = 2Ex? no:
    # Ex = rho0 x /(2 eps0), By = mu0 jz0 x/2 with jz0 = rho0 c (v~c).
    # ExmBy = Ex - c By = (rho0/(2 eps0))x - (rho0/(2 eps0))x * beta ~ Ex/gamma^2 ~ 0
    # For uz=1000, ExmBy ~ Ex/gamma^2 -> essentially zero compared to Ex.
    assert np.max(np.abs(line)) < 0.02 * np.max(np.abs(ex_th))


def test_beam_propagation_vacuum_statistics():
    # free drift: a beam with emittance expands ballistically
    deck_extra = [
        "beam.injection_type=fixed_weight",
        "beam.num_particles=10000",
        "beam.profile=gaussian",
        "beam.position_mean= 0. 0. 0.",
        "beam.position_std = 0.1 0.1 1.",
        "beam.density=0.0001",
        "beam.u_std = 1. 1. 10.",
        "beam.u_mean = 0. 0. 1000.",
        "beam.zmin=-2", "beam.zmax=2",
        "beam.radius=100.",
        "max_step=1",
        "hipace.dt=10.",
    ]
    inputs = Inputs(DECK, overrides=deck_extra)
    sim = Simulation(inputs, verbose=0)
    b0 = {k: np.asarray(sim.binned[k].reshape(-1)) for k in
          ("x", "ux", "uz", "w")}
    v0 = np.asarray(sim.binned["valid"].reshape(-1))
    res = sim.run_step(0)
    b1 = {k: np.asarray(res["binned"][k].reshape(-1)) for k in
          ("x", "ux", "uz", "w")}
    v1 = np.asarray(res["binned"]["valid"].reshape(-1))
    assert v1.sum() == v0.sum(), "particles lost in vacuum push"
    # sigma_x after drift dt: sigma_x^2 + (sigma_ux/uz * dt)^2 (gamma>>1)
    gam = 1000.0
    sig0 = np.std(b0["x"][v0])
    sig_exp = np.sqrt(sig0**2 + (1.0 / gam * 10.0) ** 2)
    sig1 = np.std(b1["x"][v1])
    assert abs(sig1 - sig_exp) / sig_exp < 0.05
    # uz unchanged in vacuum (no Ez on axis for symmetric beam... Ez~0)
    np.testing.assert_allclose(np.mean(b1["uz"][v1]), 1000.0, rtol=1e-3)
