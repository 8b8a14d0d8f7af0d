"""Hosing instability seeding and ion motion.

Mirrors the reference's hosing and ion-motion test configurations
(ref /root/reference/tests/hosing.2Rank.sh: blowout deck with a z-tilted
beam and a mobile ion species; ion_motion via mobile ions in the blowout
deck). The reference validates by checksum; here we assert the physics
signatures directly.
"""

import numpy as np
import pytest

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

HOSING_DECK = """
amr.n_cell = 32 32 40
hipace.normalized_units = 1
max_step = 2
hipace.dt = 8.0
boundary.field = Dirichlet
boundary.particle = Absorbing
geometry.prob_lo = -8. -8. -6.
geometry.prob_hi =  8.  8.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 30000
beam.profile = gaussian
beam.position_mean = "0.15*(z+1.)" "0." -1.
beam.position_std = 0.3 0.3 1.41
beam.zmin = -5.5
beam.zmax = 1.9
beam.density = 8.
beam.u_mean = 0. 0. 2000.
beam.u_std = 0. 0. 0.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 0
"""


def _centroids(binned, nz, nbins=8):
    z = np.asarray(binned["z"].reshape(-1))
    x = np.asarray(binned["x"].reshape(-1))
    w = np.asarray(binned["w"].reshape(-1))
    v = np.asarray(binned["valid"].reshape(-1))
    z, x, w = z[v], x[v], w[v]
    edges = np.linspace(-5.0, 1.5, nbins + 1)
    cents = []
    for i in range(nbins):
        m = (z >= edges[i]) & (z < edges[i + 1])
        cents.append((x[m] * w[m]).sum() / max(w[m].sum(), 1e-30))
    return np.array(cents)


def test_hosing_tail_amplification():
    """A z-correlated x tilt seeds hosing: the transverse wake amplifies
    the tail centroid offset while the head stays put."""
    sim = Simulation(Inputs(HOSING_DECK), verbose=0)
    c0 = _centroids(sim.binned, sim.geom.nz)
    sim.evolve(write_output=False)
    c1 = _centroids(sim.binned, sim.geom.nz)

    # head (last bins: largest z) is barely deflected
    assert abs(c1[-1] - c0[-1]) < 0.25 * abs(c0[0] - c0[-1])
    # tail centroid moved significantly more than the head moved
    tail_change = abs(c1[0] - c0[0])
    head_change = abs(c1[-1] - c0[-1])
    assert tail_change > 3.0 * max(head_change, 1e-6), \
        f"tail {tail_change} vs head {head_change}"
    # and the x symmetry is genuinely broken (y stays symmetric)
    y = np.asarray(sim.binned["y"].reshape(-1))
    w = np.asarray(sim.binned["w"].reshape(-1))
    v = np.asarray(sim.binned["valid"].reshape(-1))
    y_cent = abs((y[v] * w[v]).sum() / w[v].sum())
    assert y_cent < 0.02


ION_DECK = """
amr.n_cell = 32 32 40
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.
hipace.deposit_rho_individual = 1
boundary.field = Dirichlet
boundary.particle = Absorbing
geometry.prob_lo = -8. -8. -6.
geometry.prob_hi =  8.  8.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 30000
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.3 0.3 1.41
beam.zmin = -5.5
beam.zmax = 1.9
beam.density = 40.
beam.u_mean = 0. 0. 2000.
beam.u_std = 0. 0. 0.
plasmas.names = elec ions
elec.density(x,y,z) = 1.
elec.ppc = 1 1
elec.element = electron
elec.neutralize_background = 0
ions.density(x,y,z) = 1.
ions.ppc = 1 1
ions.charge = 1.
ions.mass = {mass}
ions.neutralize_background = 0
diagnostic.output_period = 1
diagnostic.field_data = Ez rho_ions
"""


def test_ion_motion():
    """A very dense beam pulls the (light-ion) background: rho_ions is
    perturbed on axis behind the beam; heavy ions barely move (mirrors the
    reference's ion-motion configuration, mobile second species)."""
    sim_l = Simulation(Inputs(ION_DECK.format(mass=100.0)), verbose=0)
    res_l = sim_l.run_step(0)
    sim_h = Simulation(Inputs(ION_DECK.format(mass=183600.0)), verbose=0)
    res_h = sim_h.run_step(0)

    ci = sim_l.cfg.diag_comps.index("rho_ions")
    rho_l = np.asarray(res_l["diag"][:, ci])
    rho_h = np.asarray(res_h["diag"][:, ci])
    # perturbation relative to the unperturbed ion density (=1)
    pert_l = np.abs(rho_l - 1.0).max()
    pert_h = np.abs(rho_h - 1.0).max()
    assert pert_l > 0.02, f"light ions did not move: {pert_l}"
    assert pert_l > 5.0 * pert_h, \
        f"mass scaling broken: light {pert_l} vs heavy {pert_h}"
