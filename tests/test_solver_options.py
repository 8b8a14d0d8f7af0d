"""fields.poisson_solver variants and the plasma density table."""

import numpy as np
import jax
import jax.numpy as jnp

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation


def test_fast_dst_matches_expanded():
    from hipace_tpu.ops.dst import dst1, dst1_fast, dst1_2d, dst1_2d_fast
    rng = np.random.default_rng(3)
    for n in (15, 31, 127):
        x = jnp.asarray(rng.standard_normal((4, n)))
        np.testing.assert_allclose(np.asarray(dst1_fast(x)),
                                   np.asarray(dst1(x)), atol=1e-12)
    x2 = jnp.asarray(rng.standard_normal((2, 31, 15)))
    np.testing.assert_allclose(np.asarray(dst1_2d_fast(x2)),
                               np.asarray(dst1_2d(x2)), atol=1e-12)


def test_poisson_solver_variants_agree():
    """Fast / Expanded / MGDirichlet must solve the same Dirichlet problem."""
    from hipace_tpu.fields.poisson import (DirichletPoissonSolver,
                                           MGDirichletPoissonSolver)
    nx = ny = 63
    dx, dy = 0.11, 0.13
    rng = np.random.default_rng(5)
    rhs = jnp.asarray(rng.standard_normal((2, ny, nx)))
    a = DirichletPoissonSolver(nx, ny, dx, dy, jnp.float64,
                               variant="expanded").solve(rhs)
    b = DirichletPoissonSolver(nx, ny, dx, dy, jnp.float64,
                               variant="fast").solve(rhs)
    c = MGDirichletPoissonSolver(nx, ny, dx, dy, jnp.float64).solve(rhs)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-12)
    scale = np.abs(np.asarray(a)).max()
    assert np.abs(np.asarray(c) - np.asarray(a)).max() / scale < 1e-6


DECK = """
hipace.normalized_units = 1
amr.n_cell = 31 31 16
max_step = 0
hipace.dt = 1.0
geometry.prob_lo = -8. -8. -6.
geometry.prob_hi =  8.  8.  6.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 2000
beam.density = 1.
beam.u_mean = 0. 0. 1000.
beam.u_std = 0. 0. 0.
beam.position_mean = 0. 0. 0.
beam.position_std = 0.3 0.3 1.41
plasmas.names = elec
elec.density(x,y,z) = 1.
elec.ppc = 1 1
elec.element = electron
diagnostic.output_period = 0
diagnostic.field_data = Ez
"""


def test_poisson_solver_deck_option():
    ref = None
    for solver in ("FFTDirichletExpanded", "FFTDirichletFast", "MGDirichlet"):
        inputs = Inputs(DECK, overrides=[f"fields.poisson_solver={solver}"])
        sim = Simulation(inputs, verbose=0)
        d = np.asarray(sim.run_step(0)["diag"])
        if ref is None:
            ref = d
        else:
            scale = np.abs(ref).max()
            assert np.abs(d - ref).max() / scale < 1e-5, solver


def test_density_table(tmp_path):
    tf = tmp_path / "table.txt"
    tf.write_text("# comment line\n"
                  "4.0 1.0\n"
                  "10.0 2.0\n"
                  "20.0 0.5*4.\n")
    inputs = Inputs(DECK, overrides=[
        f"elec.density_table_file={tf}", "max_step=3", "hipace.dt=4.0"])
    sim = Simulation(inputs, verbose=0)
    assert sim.plasma_cfgs[0].density_table == (
        (4.0, "1.0"), (10.0, "2.0"), (20.0, "0.5*4."))
    seen = []
    orig = sim._apply_density_table

    def spy():
        orig()
        seen.append(sim.plasma_cfgs[0].density_expr)

    sim._apply_density_table = spy
    sim.evolve(write_output=False)
    # t = 0, 4, 8, 12 -> c*t rounds up to 4, 4, 10, 20
    assert seen == ["1.0", "1.0", "2.0", "0.5*4."]


def test_do_beam_jz_minus_rho():
    """hipace.do_beam_jz_minus_rho adds the beam's rho - jz/c to the Psi
    source (ref Hipace.cpp:853-857): significant for a slow beam,
    negligible for an ultra-relativistic one."""
    deck = """
amr.n_cell = 32 32 16
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -8. -8. -4.
geometry.prob_hi =  8.  8.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 5000
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.5 0.5 1.0
beam.zmin = -3.9
beam.zmax = 1.9
beam.density = 1.
beam.u_mean = 0. 0. {uz}
beam.u_std = 0. 0. 0.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 1
"""

    def exmby(uz, flag):
        ov = [f"hipace.do_beam_jz_minus_rho={int(flag)}"]
        sim = Simulation(Inputs(deck.format(uz=uz), overrides=ov), verbose=0)
        res = sim.run_step(0)
        return np.asarray(res["diag"][:, sim.cfg.diag_comps.index("ExmBy")])

    slow_off = exmby(3.0, False)
    slow_on = exmby(3.0, True)
    fast_off = exmby(2000.0, False)
    fast_on = exmby(2000.0, True)
    d_slow = np.abs(slow_on - slow_off).max() / np.abs(slow_off).max()
    d_fast = np.abs(fast_on - fast_off).max() / np.abs(fast_off).max()
    assert d_slow > 0.03, f"slow-beam effect missing: {d_slow}"
    assert d_fast < 0.01 * d_slow / 0.03, \
        f"ultra-relativistic limit broken: {d_fast} vs {d_slow}"


def test_boundary_particle_box():
    """boundary.particle_lo/hi restricts the plasma particle box at init
    and applies the particle BC there (ref Hipace.cpp:217-231,
    PlasmaParticleContainerInit.cpp:30-35)."""
    import jax
    import jax.numpy as jnp
    from hipace_tpu.particles import plasma as pl
    from hipace_tpu.constants import make_constants
    from hipace_tpu.geometry import Geometry

    inputs = Inputs("""
boundary.particle_lo = -3. -2.
boundary.particle_hi =  3.  2.
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
""")
    pc = make_constants(True)
    cfg = pl.PlasmaConfig.from_inputs(inputs, "plasma", pc, "Absorbing")
    assert cfg.particle_bounds == (-3.0, -2.0, 3.0, 2.0)
    g = Geometry(n_cell=(32, 32, 8), prob_lo=(-8., -8., -4.),
                 prob_hi=(8., 8., 2.))
    p = pl.init_plasma(cfg, g, jax.random.PRNGKey(0), jnp.float64, 0.0, True)
    x = np.asarray(p["x"])[np.asarray(p["valid"])]
    y = np.asarray(p["y"])[np.asarray(p["valid"])]
    assert x.min() >= -3.0 and x.max() < 3.0
    assert y.min() >= -2.0 and y.max() < 2.0
    # absorbing BC at the tighter box
    xo, yo, ux, uy, w, valid = pl.enforce_particle_bc(
        jnp.asarray([2.9, 3.1, 0.0]), jnp.asarray([0.0, 0.0, -2.5]),
        jnp.zeros(3), jnp.zeros(3), jnp.ones(3),
        jnp.ones(3, bool), g, "Absorbing", bounds=cfg.particle_bounds)
    assert list(np.asarray(valid)) == [True, False, False]
