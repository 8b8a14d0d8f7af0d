"""Serial vs pipelined equivalence on a virtual CPU mesh.

Mirrors the reference's 1-rank vs 2-rank equivalence checks
(ref /root/reference/examples/beam_in_vacuum/analysis_2ranks.py and the
*.2Rank.sh tests): running N time steps sequentially on one device must give
the same beam as running them pipelined across N mesh devices with slice
streaming.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation
from hipace_tpu.parallel.pipeline import pipelined_evolve

DECK = """
amr.n_cell = 16 16 48
hipace.normalized_units = 1
max_step = 1
hipace.dt = 2.0
hipace.depos_order_xy = 2
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -6. -6. -6.
geometry.prob_hi =  6.  6.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 2000
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.3 0.3 1.0
beam.zmin = -5.
beam.zmax = 1.8
beam.density = 1.
beam.u_mean = 0. 0. 1000.
beam.u_std = 0. 0. 0.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 0
"""


@pytest.mark.parametrize("n_dev", [2, 4])
def test_pipelined_matches_serial(n_dev):
    devices = jax.devices()
    assert len(devices) >= n_dev, "test needs the virtual CPU mesh"

    inputs = Inputs(DECK, overrides=[f"max_step={n_dev - 1}"])
    sim = Simulation(inputs, verbose=0)
    key = jax.random.PRNGKey(7)

    binned0 = {k: v for k, v in sim.binned.items() if k != "n_dropped"}

    # sequential: n_dev steps on one device
    binned = sim.binned
    for step in range(n_dev):
        sim.key = key  # same plasma-init key each step (u_std=0: unused)
        res = sim._step_fn(binned, sim.dtype(step * sim.dt),
                           sim.dtype(sim.dt), key)
        binned = res["binned"]
    seq_valid = np.asarray(binned["valid"].reshape(-1))
    seq = {k: np.asarray(binned[k].reshape(-1))[seq_valid]
           for k in ("x", "y", "z", "ux", "uy", "uz", "w")}

    # pipelined: one step per device
    final, _min_uz, _laser = pipelined_evolve(sim.cfg, sim.dtype, binned0,
                                              sim.dt, key,
                                              devices=devices[:n_dev])
    pip_valid = np.asarray(final["valid"].reshape(-1))
    pip = {k: np.asarray(final[k].reshape(-1))[pip_valid]
           for k in ("x", "y", "z", "ux", "uy", "uz", "w")}

    assert seq_valid.sum() == pip_valid.sum(), \
        f"particle count mismatch: {seq_valid.sum()} vs {pip_valid.sum()}"

    # match particles by sorting on z (unique with random gaussian init)
    i_seq = np.argsort(seq["z"], kind="stable")
    i_pip = np.argsort(pip["z"], kind="stable")
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        np.testing.assert_allclose(seq[k][i_seq], pip[k][i_pip],
                                   rtol=1e-9, atol=1e-11, err_msg=k)


LASER_DECK = """
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


def test_pipelined_laser_matches_serial():
    """Laser slices stream through the device ring like the reference's
    MultiBuffer laser components (ref MultiBuffer.H:110-122)."""
    n_dev = 2
    devices = jax.devices()
    assert len(devices) >= n_dev

    inputs = Inputs(LASER_DECK, overrides=[f"max_step={n_dev - 1}"])
    sim = Simulation(inputs, verbose=0)
    key = jax.random.PRNGKey(3)

    binned0 = {k: v for k, v in sim.binned.items() if k != "n_dropped"}

    binned = sim.binned
    stream = None
    for step in range(n_dev):
        res = sim._step_fn(binned, sim.dtype(step * sim.dt),
                           sim.dtype(sim.dt), key,
                           jnp.asarray(step, jnp.int32), stream)
        binned = res["binned"]
        stream = res["laser_stream"]
    seq_valid = np.asarray(binned["valid"].reshape(-1))
    seq = {k: np.asarray(binned[k].reshape(-1))[seq_valid]
           for k in ("x", "y", "z", "ux", "uy", "uz", "w")}

    final, _min_uz, pip_stream = pipelined_evolve(
        sim.cfg, sim.dtype, binned0, sim.dt, key, devices=devices[:n_dev])
    pip_valid = np.asarray(final["valid"].reshape(-1))
    pip = {k: np.asarray(final[k].reshape(-1))[pip_valid]
           for k in ("x", "y", "z", "ux", "uy", "uz", "w")}

    assert seq_valid.sum() == pip_valid.sum()
    i_seq = np.argsort(seq["z"], kind="stable")
    i_pip = np.argsort(pip["z"], kind="stable")
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        np.testing.assert_allclose(seq[k][i_seq], pip[k][i_pip],
                                   rtol=1e-9, atol=1e-20, err_msg=k)

    # the streamed laser state after n_dev steps must match the serial one
    for a, b, name in ((stream[0], pip_stream[0], "np1"),
                       (stream[1], pip_stream[1], "n00")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12, err_msg=name)


MR_DECK = DECK + """
amr.max_level = 1
mr_lev1.n_cell = 16 16
mr_lev1.patch_lo = -2. -2. -4.
mr_lev1.patch_hi =  2.  2.  0.
plasma.fine_patch(x,y) = (abs(x)<2.4)*(abs(y)<2.4)
plasma.fine_ppc = 2 2
"""


def test_pipelined_mr_matches_serial():
    """Mesh refinement inside the device pipeline: the fine level state is
    ordinary per-device carry, so pipelined == serial must hold."""
    n_dev = 2
    devices = jax.devices()
    assert len(devices) >= n_dev

    inputs = Inputs(MR_DECK, overrides=[f"max_step={n_dev - 1}"])
    sim = Simulation(inputs, verbose=0)
    key = jax.random.PRNGKey(7)
    binned0 = {k: v for k, v in sim.binned.items() if k != "n_dropped"}

    binned = sim.binned
    for step in range(n_dev):
        res = sim._step_fn(binned, sim.dtype(step * sim.dt),
                           sim.dtype(sim.dt), key)
        binned = res["binned"]
    seq_valid = np.asarray(binned["valid"].reshape(-1))
    seq = {k: np.asarray(binned[k].reshape(-1))[seq_valid]
           for k in ("x", "y", "z", "ux", "uy", "uz", "w")}

    final, _min_uz, _laser = pipelined_evolve(sim.cfg, sim.dtype, binned0,
                                              sim.dt, key,
                                              devices=devices[:n_dev])
    pip_valid = np.asarray(final["valid"].reshape(-1))
    pip = {k: np.asarray(final[k].reshape(-1))[pip_valid]
           for k in ("x", "y", "z", "ux", "uy", "uz", "w")}

    assert seq_valid.sum() == pip_valid.sum()
    i_seq = np.argsort(seq["z"], kind="stable")
    i_pip = np.argsort(pip["z"], kind="stable")
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        np.testing.assert_allclose(seq[k][i_seq], pip[k][i_pip],
                                   rtol=1e-9, atol=1e-11, err_msg=k)
