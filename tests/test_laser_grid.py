"""Separate laser grid (lasers.n_cell/patch_lo/patch_hi).

Mirrors the reference's independent laser geometry
(ref /root/reference/src/laser/MultiLaser.cpp:59-110 MakeLaserGeometry,
:215-290 UpdateLaserAabs, :335-410 InterpolateChi).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.constants as scc

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

WAKE_DECK = """
amr.n_cell = 16 16 32
hipace.normalized_units = 0
max_step = 1
hipace.dt = 30.e-6/clight
my_constants.kp_inv = 10.e-6
geometry.prob_lo = -6.*kp_inv -6.*kp_inv -8.*kp_inv
geometry.prob_hi =  6.*kp_inv  6.*kp_inv  6.*kp_inv
boundary.field = Dirichlet
boundary.particle = Periodic
lasers.names = laser
lasers.lambda0 = .8e-6
lasers.solver_type = fft
laser.a0 = 1.5
laser.position_mean = 0. 0. 0.
laser.w0 = 2.*kp_inv
laser.L0 = 2.*kp_inv
laser.focal_distance = 0.001
plasmas.names = plasma
plasma.density(x,y,z) = 1.1027e24
plasma.ppc = 1 1
plasma.element = electron
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 400
beam.profile = gaussian
beam.position_mean = 0. 0. -4.*kp_inv
beam.position_std = 0.5*kp_inv 0.5*kp_inv 1.*kp_inv
beam.zmin = -7.9*kp_inv
beam.zmax = 5.9*kp_inv
beam.density = 1.e22
beam.u_mean = 0. 0. 1000.
beam.u_std = 0. 0. 0.
diagnostic.output_period = 0
"""

EXPLICIT_GRID = """
lasers.n_cell = 16 16
lasers.patch_lo = -6.*kp_inv -6.*kp_inv -8.*kp_inv
lasers.patch_hi =  6.*kp_inv  6.*kp_inv  6.*kp_inv
"""


def test_explicit_laser_grid_matches_default():
    """A laser grid explicitly set to the field grid must reproduce the
    default (shared-grid) path exactly."""
    s1 = Simulation(Inputs(WAKE_DECK), verbose=0)
    s2 = Simulation(Inputs(WAKE_DECK + EXPLICIT_GRID), verbose=0)
    assert s2.laser_geom == s2.geom  # same grid -> identity fast path

    key = jax.random.PRNGKey(1)
    r1 = s1._step_fn(s1.binned, s1.dtype(0.0), s1.dtype(s1.dt), key,
                     jnp.asarray(0, jnp.int32), s1.laser_stream)
    r2 = s2._step_fn(s2.binned, s2.dtype(0.0), s2.dtype(s2.dt), key,
                     jnp.asarray(0, jnp.int32), s2.laser_stream)
    np.testing.assert_allclose(np.asarray(r1["laser_stream"][0]),
                               np.asarray(r2["laser_stream"][0]),
                               rtol=0, atol=0)


FINE_LASER = """
lasers.n_cell = 64 64
lasers.patch_lo = -4.*kp_inv -4.*kp_inv -8.*kp_inv
lasers.patch_hi =  4.*kp_inv  4.*kp_inv  6.*kp_inv
"""

VACUUM_DECK = """
max_step = 6
hipace.dt = 140.e-6/clight
amr.n_cell = 16 16 24
my_constants.kp_inv = 10.e-6
geometry.prob_lo = -6.*kp_inv -6.*kp_inv -8.*kp_inv
geometry.prob_hi =  6.*kp_inv  6.*kp_inv  6.*kp_inv
lasers.names = laser
lasers.lambda0 = .8e-6
lasers.solver_type = fft
laser.a0 = 1
laser.position_mean = 0. 0. 0
laser.w0 = 2.*kp_inv
laser.L0 = 2.*kp_inv
laser.focal_distance = 0.001
boundary.field = Dirichlet
boundary.particle = Periodic
beams.names = no_beam
plasmas.names = no_plasma
diagnostic.output_period = 0
"""


def test_fine_laser_grid_vacuum_diffraction():
    """The envelope lives on its own 64^2 patch inside a coarse 16^2 field
    grid; vacuum diffraction must follow gaussian-beam optics."""
    sim = Simulation(Inputs(VACUUM_DECK + FINE_LASER), verbose=0)
    lg = sim.laser_geom
    assert lg.n_cell[:2] == (64, 64)

    lam, w0, zfoc = 0.8e-6, 20.e-6, 0.001
    zr = math.pi * w0 ** 2 / lam
    G = lg.nguards
    NY, NX = lg.slice_shape
    x = (np.arange(lg.nx) + 0.5) * lg.dx + lg.prob_lo[0]

    widths, amps, zs = [], [], []
    for step in range(sim.max_step + 1):
        sim.run_step(step)
        sim.time += sim.dt
        a = np.asarray(sim.laser_stream[0])[:, G:NY - G, G:NX - G]
        aa = np.abs(a) ** 2
        W = 2.0 * math.sqrt(np.sum(aa * x[None, None, :] ** 2) / np.sum(aa))
        widths.append(W)
        amps.append(np.abs(a).max())
        zs.append(sim.time * scc.c)

    zs = np.array(zs)
    w_th = w0 * np.sqrt(1 + (zs - zfoc) ** 2 / zr ** 2)
    a_th = 1.0 * w0 / w_th
    assert np.std((w_th - np.array(widths)) / w_th) < 6e-3
    assert np.std((a_th - np.array(amps)) / a_th) < 9e-3
