"""Coulomb collisions: anisotropic temperature relaxation + conservation.

An electron plasma with Tx >> Ty isotropizes through intra-species
collisions (Perez 2012); the collision kicks conserve momentum and energy
pairwise.
"""

import numpy as np
import jax

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation
from hipace_tpu.particles import collisions as coll

DECK = """
amr.n_cell = 8 8 128
hipace.normalized_units = 1
max_step = 0
hipace.dt = 0.
hipace.background_density_SI = 1e28
hipace.collisions = c1
c1.species = plasma plasma
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -4. -4. -64.
geometry.prob_hi =  4.  4.  64.
beams.names = no_beam
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 4 4
plasma.element = electron
plasma.u_std = 0.05 0.005 0.005
diagnostic.output_period = 0
"""


def test_intra_species_isotropization():
    sim = Simulation(Inputs(DECK), verbose=0)
    # initial plasma state
    p0 = sim._init_plasma_state(jax.random.PRNGKey(1), 0.0)[0]
    v = np.asarray(p0["valid"])
    sx0 = np.std(np.asarray(p0["ux"])[v])
    sy0 = np.std(np.asarray(p0["uy"])[v])
    assert sx0 > 5 * sy0

    # collide the same population repeatedly (standalone, no fields)
    p = p0
    key = jax.random.PRNGKey(2)
    cfgp = sim.plasma_cfgs[0]
    for i in range(200):
        key, sub = jax.random.split(key)
        p, _ = coll.plasma_plasma_collision(
            p, p, sim.geom, cfgp, cfgp, sim.pc, -1.0,
            1e28, True, sub, True)
    v = np.asarray(p["valid"])
    ux = np.asarray(p["ux"])[v]
    uy = np.asarray(p["uy"])[v]
    sx1 = np.std(ux)
    sy1 = np.std(uy)
    # x-temperature decreased, y-temperature increased
    assert sx1 < 0.95 * sx0, f"sx {sx0} -> {sx1}"
    assert sy1 > 1.5 * sy0, f"sy {sy0} -> {sy1}"
    # total energy conserved to ~1% (pairwise elastic kicks)
    def energy(pp):
        vv = np.asarray(pp["valid"])
        g = (1 + np.asarray(pp["ux"])[vv]**2 + np.asarray(pp["uy"])[vv]**2
             + np.asarray(pp["psi"])[vv]**2) / (2*np.asarray(pp["psi"])[vv])
        return np.sum(g - 1.0)
    e0 = energy(p0)
    e1 = energy(p)
    assert abs(e1 - e0) / e0 < 0.02, f"energy {e0} -> {e1}"


def test_collisions_in_full_step():
    # smoke: the full step with collisions enabled runs and keeps fields sane
    sim = Simulation(Inputs(DECK, overrides=["amr.n_cell=8 8 16",
                                             "geometry.prob_lo=-4. -4. -8.",
                                             "geometry.prob_hi=4. 4. 8."]),
                     verbose=0)
    assert sim.cfg.collisions == (("pp", 0, 0, True, -1.0),)
    res = sim.run_step(0)
    assert np.isfinite(np.asarray(res["diag"])).all()


def test_odd_cell_cyclic_reuse_collides_every_particle():
    """Same-species cells with ODD particle counts: the reference runs
    ceil(n/2) pairs with cyclic reuse, so EVERY particle in the cell
    collides (ref ElasticCollisionPerez.H:146-188, CoulombCollision.cpp:122).
    With 3 particles/cell, floor(n/2) pairing would leave 1/3 untouched."""
    deck = DECK.replace("plasma.ppc = 4 4", "plasma.ppc = 3 1")
    sim = Simulation(Inputs(deck), verbose=0)
    p0 = sim._init_plasma_state(jax.random.PRNGKey(1), 0.0)[0]
    cfgp = sim.plasma_cfgs[0]
    p1, _ = coll.plasma_plasma_collision(
        p0, p0, sim.geom, cfgp, cfgp, sim.pc, -1.0, 1e28, True,
        jax.random.PRNGKey(3), True)
    v = np.asarray(p0["valid"])
    changed = (np.asarray(p1["ux"]) != np.asarray(p0["ux"]))[v]
    # every particle is in at least one pair; kicks are continuous draws so
    # an untouched ux means an unpaired particle
    assert changed.mean() > 0.99, f"only {changed.mean():.2%} collided"
    # pairwise elastic kicks (incl. the sequential wrap pair) conserve energy
    def energy(pp):
        vv = np.asarray(pp["valid"])
        g = (1 + np.asarray(pp["ux"])[vv]**2 + np.asarray(pp["uy"])[vv]**2
             + np.asarray(pp["psi"])[vv]**2) / (2*np.asarray(pp["psi"])[vv])
        return np.sum(g - 1.0)
    assert abs(energy(p1) - energy(p0)) / energy(p0) < 1e-6
