"""Adaptive time step (ref /root/reference/src/utils/AdaptiveTimeStep.cpp)."""

import math

import numpy as np

from hipace_tpu.constants import NORMALIZED
from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation
from hipace_tpu.utils import adaptive_dt as adt


def test_dt_formula_cold_beam():
    cfg = adt.AdaptiveTimeStepConfig(enabled=True, nt_per_betatron=20.0,
                                     predict_step=False)
    from hipace_tpu.particles.beam import BeamConfig
    from hipace_tpu.particles.plasma import PlasmaConfig
    beam = BeamConfig(charge=-1.0, mass=1.0, u_mean=(0, 0, 2000.0))
    plasma = PlasmaConfig(charge=-1.0, density_expr="1.")
    mom = {"sum_w": 1.0, "sum_w_uz": 2000.0, "sum_w_uz2": 2000.0**2,
           "min_uz": 2000.0, "min_acc": 0.0}
    dt, min_uz_mq = adt.calculate_from_min_uz(cfg, mom, beam, (plasma,),
                                              NORMALIZED, 0.0, 1e30)
    omega_b = math.sqrt(1.0 / (2.0 * 2000.0))
    assert abs(dt - 2 * math.pi / omega_b / 20.0) / dt < 1e-12
    assert abs(min_uz_mq - 2000.0) < 1e-9


def test_phase_advance_uniform_density_keeps_dt():
    cfg = adt.AdaptiveTimeStepConfig(enabled=True)
    from hipace_tpu.particles.plasma import PlasmaConfig
    plasma = PlasmaConfig(density_expr="1.")
    dt = adt.calculate_from_density(cfg, (plasma,), NORMALIZED, 0.0, 5.0,
                                    2000.0)
    assert dt == 5.0


def test_phase_advance_gradient_reduces_dt():
    cfg = adt.AdaptiveTimeStepConfig(enabled=True)
    from hipace_tpu.particles.plasma import PlasmaConfig
    # density doubling over the step -> omega_b mismatch -> dt reduced
    plasma = PlasmaConfig(density_expr="1. + z/10.")
    dt = adt.calculate_from_density(cfg, (plasma,), NORMALIZED, 0.0, 10.0,
                                    2000.0)
    assert 0.0 < dt < 10.0


DECK = """
amr.n_cell = 16 16 32
hipace.normalized_units = 1
max_step = 1
hipace.dt = adaptive
hipace.nt_per_betatron = 10
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -6. -6. -4.
geometry.prob_hi =  6.  6.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 500
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.3 0.3 0.5
beam.zmin = -3.9
beam.zmax = 1.9
beam.density = 1.
beam.u_mean = 0. 0. 1000.
beam.u_std = 0. 0. 10.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 0
"""


def test_e2e_adaptive_dt():
    sim = Simulation(Inputs(DECK), verbose=0)
    # initial dt from initial moments: min uz ~ 1000 - 4*10
    omega_b = math.sqrt(1.0 / (2.0 * 960.0))
    assert abs(sim.dt - 2 * math.pi / omega_b / 10.0) / sim.dt < 0.05
    dt0 = sim.dt
    sim.evolve(write_output=False)
    assert np.isfinite(sim.dt) and sim.dt > 0
    # uniform plasma, almost no uz change over one step
    assert abs(sim.dt - dt0) / dt0 < 0.2
