"""Laser envelope: vacuum diffraction vs gaussian-beam optics.

Mirrors /root/reference/examples/laser/analysis_laser_vacuum.py: a gaussian
pulse diffracts with w(z) = w0 sqrt(1 + (z - z_foc)^2 / zR^2) and
a(z) = a0 w0 / w(z); checks both envelope solvers.
"""

import math

import numpy as np
import pytest
import scipy.constants as scc

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

DECK = """
max_step = 8
hipace.dt = 140.e-6/clight
amr.n_cell = 64 64 24
my_constants.kp_inv = 10.e-6
geometry.prob_lo = -6.*kp_inv -6.*kp_inv -8.*kp_inv
geometry.prob_hi =  6.*kp_inv  6.*kp_inv  6.*kp_inv
lasers.names = laser
lasers.lambda0 = .8e-6
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


def _width_and_amp(sim):
    """RMS width (x) and peak |a| from the current envelope stream."""
    a = np.asarray(sim.laser_stream[0])  # np1 = envelope at the new time
    G = sim.geom.nguards
    NY, NX = sim.geom.slice_shape
    a = a[:, G:NY - G, G:NX - G]
    aa = np.abs(a) ** 2
    x = (np.arange(sim.geom.nx) + 0.5) * sim.geom.dx + sim.geom.prob_lo[0]
    W = 2.0 * math.sqrt(np.sum(aa * x[None, None, :] ** 2) / np.sum(aa))
    return W, np.max(np.abs(a))


@pytest.mark.parametrize("solver", ["fft", "multigrid"])
def test_laser_vacuum_diffraction(solver):
    sim = Simulation(Inputs(DECK, overrides=[f"lasers.solver_type={solver}"]),
                     verbose=0)
    lam = 0.8e-6
    w0 = 20.e-6
    zfoc = 0.001
    zr = math.pi * w0**2 / lam

    widths, amps, zs = [], [], []
    for step in range(sim.max_step + 1):
        sim.run_step(step)
        sim.time += sim.dt
        W, A = _width_and_amp(sim)
        widths.append(W)
        amps.append(A)
        zs.append(sim.time * scc.c)

    zs = np.array(zs)
    widths = np.array(widths)
    amps = np.array(amps)
    w_th = w0 * np.sqrt(1 + (zs - zfoc) ** 2 / zr**2)
    a_th = 1.0 * w0 / w_th
    # reference tolerances: std 2e-3 (width), 4e-3 (amplitude); slightly
    # looser here due to the reduced grid
    assert np.std((w_th - widths) / w_th) < 5e-3, \
        f"width err {np.std((w_th - widths) / w_th)}"
    assert np.std((a_th - amps) / a_th) < 8e-3, \
        f"amp err {np.std((a_th - amps) / a_th)}"
