"""Transverse mesh refinement: fine-level accuracy vs a uniform-fine run.

The reference has no MR regression test (no examples/tests set
amr.max_level > 0), so this validates physics directly: a coarse run with a
refined patch (ref /root/reference/src/Hipace.cpp:327-374, mr_lev1.*;
fine plasma patch ref PlasmaParticleContainerInit.cpp:95-160) must
reproduce a uniformly-fine "truth" run inside the patch far better than the
pure coarse run does.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

BASE = """
amr.n_cell = {nx} {nx} 24
hipace.normalized_units = 1
max_step = 0
hipace.dt = 1.0
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -8. -8. -6.
geometry.prob_hi =  8.  8.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 30000
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.3 0.3 1.0
beam.zmin = -5.9
beam.zmax = 1.9
beam.density = 0.01
beam.u_mean = 0. 0. 1000.
beam.u_std = 0. 0. 0.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 2 2
plasma.element = electron
diagnostic.output_period = 1
{extra}
"""

MR = """amr.max_level = 1
mr_lev1.n_cell = 32 32
mr_lev1.patch_lo = -2. -2. -4.
mr_lev1.patch_hi =  2.  2.  0.
plasma.fine_patch(x,y) = (abs(x)<2.3)*(abs(y)<2.3)
plasma.fine_ppc = 8 8
diagnostic.names = lev0 lev1
lev1.base_geometry = level_1
lev1.field_data = Ez
"""


def test_mr_fine_level_beats_coarse():
    """Fine-level Ez inside the patch: ~4x resolution => much closer to the
    uniformly-fine truth than the coarse-only run."""
    s_mr = Simulation(Inputs(BASE.format(nx=32, extra=MR)), verbose=0)
    r_mr = s_mr.run_step(0)
    s_tr = Simulation(Inputs(BASE.format(nx=128, extra="")), verbose=0)
    r_tr = s_tr.run_step(0)
    s_co = Simulation(Inputs(BASE.format(nx=32, extra="")), verbose=0)
    r_co = s_co.run_step(0)

    gf = s_mr.mr_levels[0].geom
    assert (s_mr.mr_levels[0].zeta_lo, s_mr.mr_levels[0].zeta_hi) == (5, 18)
    # fine dx == truth dx (0.125): sample truth at the fine cell centers
    xt = (np.arange(gf.nx) + 0.5) * gf.dx + gf.prob_lo[0]
    it = np.round((xt + 8.0) / 0.125 - 0.5).astype(int)
    itc = np.round((xt + 8.0) / 0.5 - 0.5).astype(int)
    cc = s_tr.cfg.diag_comps.index("Ez")
    ca = s_co.cfg.diag_comps.index("Ez")

    for z in (14, 7):
        fine = np.asarray(r_mr["diagf_lev1"][z, 0])
        truth = np.asarray(r_tr["diag"][z, cc])[np.ix_(it, it)]
        coarse = np.asarray(r_co["diag"][z, ca])[np.ix_(itc, itc)]
        den = np.abs(truth).max()
        err_fine = np.abs(fine - truth).max() / den
        err_coarse = np.abs(coarse - truth).max() / den
        assert err_fine < 0.10, f"z={z}: fine err {err_fine}"
        assert err_fine < 0.35 * err_coarse, \
            f"z={z}: fine {err_fine} vs coarse {err_coarse}"


def test_level_coupler_interpolation():
    """Order-2 coarse->fine interpolation reproduces smooth fields."""
    from hipace_tpu.geometry import Geometry
    from hipace_tpu.fields.mr import LevelCoupler
    from hipace_tpu.fields import slices as sl

    gc = Geometry(n_cell=(32, 32, 1), prob_lo=(-8., -8., 0.),
                  prob_hi=(8., 8., 1.))
    gf = Geometry(n_cell=(64, 64, 1), prob_lo=(-2., -2., 0.),
                  prob_hi=(2., 2., 1.))
    coup = LevelCoupler(gc, gf, jnp.float64)
    G = gc.nguards
    NYc, NXc = gc.slice_shape
    xc = (np.arange(NXc) - G + 0.5) * gc.dx + gc.prob_lo[0]
    yc = (np.arange(NYc) - G + 0.5) * gc.dy + gc.prob_lo[1]
    Xc, Yc = np.meshgrid(xc, yc)

    def fn(x, y):
        return np.sin(0.3 * x) * np.cos(0.25 * y) + 0.1 * x * y

    c = jnp.asarray(fn(Xc, Yc))
    f = np.asarray(coup.up_full(c))
    NYf, NXf = gf.slice_shape
    xf = (np.arange(NXf) - G + 0.5) * gf.dx + gf.prob_lo[0]
    yf = (np.arange(NYf) - G + 0.5) * gf.dy + gf.prob_lo[1]
    Xf, Yf = np.meshgrid(xf, yf)
    # order-2 B-spline evaluation is a smoother: O(dxc^2 f'') bias, not an
    # exact interpolant (same as the reference's compute_shape_factor path)
    np.testing.assert_allclose(f, fn(Xf, Yf), atol=5e-3)


def test_mr_fine_poisson_with_coarse_bc():
    """Fine-patch Poisson solve with Van Loan BCs from the coarse solution
    (ref Fields.cpp:628-760) matches a global fine solve to ~1%."""
    from hipace_tpu.geometry import Geometry
    from hipace_tpu.fields.mr import LevelCoupler
    from hipace_tpu.fields.poisson import DirichletPoissonSolver
    from hipace_tpu.fields import slices as sl

    gc = Geometry(n_cell=(32, 32, 1), prob_lo=(-8., -8., 0.),
                  prob_hi=(8., 8., 1.))
    gf = Geometry(n_cell=(64, 64, 1), prob_lo=(-2., -2., 0.),
                  prob_hi=(2., 2., 1.))
    dt = jnp.float64

    def rhs_fn(x, y):
        return np.exp(-(x ** 2 + y ** 2) / 0.5)

    def interior(g):
        x = (np.arange(g.nx) + 0.5) * g.dx + g.prob_lo[0]
        y = (np.arange(g.ny) + 0.5) * g.dy + g.prob_lo[1]
        return np.meshgrid(x, y)

    Xc, Yc = interior(gc)
    sc = DirichletPoissonSolver(gc.nx, gc.ny, gc.dx, gc.dy, dt,
                                variant="fast")
    uc = sc.solve(jnp.asarray(rhs_fn(Xc, Yc))[None])[0]
    uc_pad = sl.set_interior(jnp.zeros(gc.slice_shape, dt), uc, gc)

    coup = LevelCoupler(gc, gf, dt)
    Xf, Yf = interior(gf)
    rhs_f = coup.apply_bc(jnp.asarray(rhs_fn(Xf, Yf)), uc_pad, 1.0, 1.0)
    sf = DirichletPoissonSolver(gf.nx, gf.ny, gf.dx, gf.dy, dt,
                                variant="fast")
    uf = np.asarray(sf.solve(rhs_f[None])[0])

    gt = Geometry(n_cell=(256, 256, 1), prob_lo=(-8., -8., 0.),
                  prob_hi=(8., 8., 1.))
    Xt, Yt = interior(gt)
    st = DirichletPoissonSolver(gt.nx, gt.ny, gt.dx, gt.dy, dt,
                                variant="fast")
    ut = np.asarray(st.solve(jnp.asarray(rhs_fn(Xt, Yt))[None])[0])
    ixt = np.round((Xf[0, :] + 8.0) / gt.dx - 0.5).astype(int)
    iyt = np.round((Yf[:, 0] + 8.0) / gt.dy - 0.5).astype(int)
    ut_f = ut[np.ix_(iyt, ixt)]
    err = np.abs(uf - ut_f).max() / np.abs(ut_f).max()
    assert err < 0.02, f"fine-with-BC vs truth err {err}"


def test_mr_two_levels_smoke():
    """amr.max_level = 2: both fine levels run, solve, and roughly agree
    with each other inside the lev2 patch."""
    deck = BASE.format(nx=32, extra="""amr.max_level = 2
mr_lev1.n_cell = 32 32
mr_lev1.patch_lo = -2. -2. -4.
mr_lev1.patch_hi =  2.  2.  0.
mr_lev2.n_cell = 32 32
mr_lev2.patch_lo = -0.9 -0.9 -3.
mr_lev2.patch_hi =  0.9  0.9 -1.
plasma.fine_patch(x,y) = (abs(x)<2.3)*(abs(y)<2.3)
plasma.fine_ppc = 8 8
diagnostic.names = lev0 lev1 lev2
lev1.base_geometry = level_1
lev1.field_data = Ez
lev2.base_geometry = level_2
lev2.field_data = Ez
""")
    sim = Simulation(Inputs(deck), verbose=0)
    assert len(sim.mr_levels) == 2
    res = sim.run_step(0)
    lv2 = sim.mr_levels[1]
    g1, g2 = sim.mr_levels[0].geom, lv2.geom
    z = (lv2.zeta_lo + lv2.zeta_hi) // 2
    ez1 = np.asarray(res["diagf_lev1"][z, 0])
    ez2 = np.asarray(res["diagf_lev2"][z, 0])
    assert np.isfinite(ez2).all()
    # sample lev1 at lev2 cell centers (2nd-order-ish comparison)
    x2 = (np.arange(g2.nx) + 0.5) * g2.dx + g2.prob_lo[0]
    i1 = np.clip(((x2 - g1.prob_lo[0]) / g1.dx - 0.5).round().astype(int),
                 0, g1.nx - 1)
    ez1_on2 = ez1[np.ix_(i1, i1)]
    den = max(np.abs(ez1_on2).max(), 1e-30)
    err = np.abs(ez2 - ez1_on2).max() / den
    assert err < 0.35, f"lev2 vs lev1 disagreement {err}"


def test_mr_with_laser_smoke():
    """Laser-driven wake + fine level: aabs propagates to the fine level
    (ref MultiLaser.cpp:289-291) and the fine solve stays finite."""
    deck = """
amr.n_cell = 24 24 24
amr.max_level = 1
mr_lev1.n_cell = 24 24
mr_lev1.patch_lo = -2.5e-5 -2.5e-5 -6.e-5
mr_lev1.patch_hi =  2.5e-5  2.5e-5  0.
hipace.normalized_units = 0
max_step = 0
hipace.dt = 10.e-6/clight
my_constants.kp_inv = 10.e-6
geometry.prob_lo = -8.*kp_inv -8.*kp_inv -8.*kp_inv
geometry.prob_hi =  8.*kp_inv  8.*kp_inv  6.*kp_inv
boundary.field = Dirichlet
boundary.particle = Periodic
lasers.names = laser
lasers.lambda0 = .8e-6
lasers.solver_type = fft
laser.a0 = 1.5
laser.position_mean = 0. 0. 0.
laser.w0 = 2.*kp_inv
laser.L0 = 2.*kp_inv
plasmas.names = plasma
plasma.density(x,y,z) = 1.1027e24
plasma.ppc = 2 2
plasma.fine_patch(x,y) = (abs(x)<3.e-5)*(abs(y)<3.e-5)
plasma.fine_ppc = 4 4
plasma.element = electron
beams.names = no_beam
diagnostic.output_period = 1
diagnostic.names = lev0 lev1
lev1.base_geometry = level_1
lev1.field_data = Ez
"""
    sim = Simulation(Inputs(deck), verbose=0)
    res = sim.run_step(0)
    lv = sim.mr_levels[0]
    z = (lv.zeta_lo + lv.zeta_hi) // 2
    ez1 = np.asarray(res["diagf_lev1"][z, 0])
    ez0 = np.asarray(res["diag"][z, sim.cfg.diag_comps.index("Ez")])
    assert np.isfinite(ez1).all()
    assert np.abs(ez1).max() > 0.1 * np.abs(ez0).max(), \
        "fine level missed the laser wake"


def test_mr_predictor_corrector():
    """MR with the predictor-corrector solver (ref Hipace.cpp:936-1031
    current_N_level loop, Fields.cpp:1008-1078 per-level B solves): the
    fine level must reproduce the uniformly-fine PC truth far better than
    the coarse-only PC run does."""
    ov = ["hipace.bxby_solver=predictor-corrector"]
    s_mr = Simulation(Inputs(BASE.format(nx=32, extra=MR), overrides=ov),
                      verbose=0)
    r_mr = s_mr.run_step(0)
    s_tr = Simulation(Inputs(BASE.format(nx=128, extra=""), overrides=ov),
                      verbose=0)
    r_tr = s_tr.run_step(0)
    s_co = Simulation(Inputs(BASE.format(nx=32, extra=""), overrides=ov),
                      verbose=0)
    r_co = s_co.run_step(0)

    gf = s_mr.mr_levels[0].geom
    xt = (np.arange(gf.nx) + 0.5) * gf.dx + gf.prob_lo[0]
    it = np.round((xt + 8.0) / 0.125 - 0.5).astype(int)
    itc = np.round((xt + 8.0) / 0.5 - 0.5).astype(int)
    cc = s_tr.cfg.diag_comps.index("Ez")
    for z in (14, 7):
        fine = np.asarray(r_mr["diagf_lev1"][z, 0])
        truth = np.asarray(r_tr["diag"][z, cc])[np.ix_(it, it)]
        coarse = np.asarray(r_co["diag"][z, cc])[np.ix_(itc, itc)]
        den = np.abs(truth).max()
        err_fine = np.abs(fine - truth).max() / den
        err_coarse = np.abs(coarse - truth).max() / den
        assert err_fine < 0.06, f"z={z}: PC fine err {err_fine}"
        assert err_fine < 0.2 * err_coarse, \
            f"z={z}: PC fine {err_fine} vs coarse {err_coarse}"
