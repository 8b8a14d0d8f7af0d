"""Laser from_file with rt (lasy) geometry + multi-pulse composition.

The reference reads openPMD LaserEnvelope files in xyt, xyz, and rt
geometry (ref /root/reference/src/laser/Laser.cpp:119-330: axisLabels
select the branch; rt uses azimuthal modes, order-1 interpolation, unitSI
scaling). Acceptance (VERDICT item 8): an rt-geometry file sampled from
the gaussian pulse must reproduce the gaussian-init evolution.
"""

import numpy as np
import scipy.constants as scc

import h5py

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation
from hipace_tpu.geometry import Geometry
from hipace_tpu.fields.laser import LaserConfig, envelope_slice

DECK = """
max_step = 1
hipace.dt = 30.e-6/clight
amr.n_cell = 48 48 24
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


def _radial_profile(lcfg, sim, nr, rmax):
    """Sample the axisymmetric gaussian pulse on an (nt, nr) rt grid by
    evaluating the analytic envelope on a thin cartesian strip with the
    x-axis playing the role of r (y ~ 0)."""
    g = sim.laser_geom
    dr = rmax / nr
    eps = 1e-9
    G = 2
    strip = Geometry(n_cell=(nr, 2, 1),
                     prob_lo=(-dr / 2, -eps, 0.0),
                     prob_hi=(rmax - dr / 2, eps, 1.0),
                     nguards=G)
    z = (np.arange(g.nz) + 0.5) * g.dz + g.prob_lo[2]
    rows = []
    for zk in z[::-1]:          # t ascending <-> z descending
        env = np.asarray(envelope_slice(lcfg, strip, float(zk),
                                        np.float64))
        rows.append(env[G, G:G + nr])   # first interior y row (y ~ -eps/2)
    return np.stack(rows), z.max(), dr


def _write_rt_file(path, arr, dt_file, dr):
    """lasy-style openPMD rt file: dataset (modes, t, r), mode 0 only."""
    with h5py.File(path, "w") as f:
        base = f.create_group("data/0")
        base.attrs["time"] = 0.0
        base.attrs["dt"] = 0.0
        mesh = base.create_group("fields")
        ds = mesh.create_dataset("laserEnvelope", data=arr[None])
        ds.attrs["axisLabels"] = np.array([np.bytes_("t"), np.bytes_("r")])
        ds.attrs["gridSpacing"] = np.array([dt_file, dr], np.float64)
        ds.attrs["gridGlobalOffset"] = np.array([0.0, 0.0], np.float64)
        ds.attrs["position"] = np.array([0.0, 0.0], np.float64)
        ds.attrs["unitSI"] = 1.0


def test_rt_from_file_matches_gaussian(tmp_path):
    sim_a = Simulation(Inputs(DECK), verbose=0)
    lcfg = LaserConfig.from_inputs(Inputs(DECK), sim_a.pc)

    g = sim_a.laser_geom
    rmax = 1.5 * np.hypot(g.prob_hi[0], g.prob_hi[1])
    arr, z_top, dr = _radial_profile(lcfg, sim_a, nr=768, rmax=rmax)
    dt_file = g.dz / scc.c
    path = str(tmp_path / "laser_rt.h5")
    _write_rt_file(path, arr, dt_file, dr)

    sim_b = Simulation(Inputs(DECK, overrides=[
        "laser.init_type=from_file",
        f"laser.input_file={path}",
        "laser.iteration=0",
        "laser.openPMD_laser_name=laserEnvelope"]), verbose=0)

    # initial stream: rt interpolation vs analytic
    assert sim_b.laser_stream is not None
    a_b = np.asarray(sim_b.laser_stream[0])
    from hipace_tpu.fields.laser import load_laser_from_file
    a_a = np.asarray(load_laser_from_file(
        lcfg, g, sim_a.dtype, zeta_lo=sim_a.laser_zeta[0],
        nz_global=sim_a.geom.nz, clight=scc.c))
    scale = np.abs(a_a).max()
    assert scale > 0.5  # a0 = 1 pulse is present
    assert np.abs(a_b - a_a).max() / scale < 5e-4

    # one step of vacuum propagation matches the gaussian-init run
    ra = sim_a.run_step(0)
    sim_a.laser_stream = ra["laser_stream"]
    rb = sim_b.run_step(0)
    sim_b.laser_stream = rb["laser_stream"]
    ea = np.asarray(sim_a.laser_stream[0])
    eb = np.asarray(sim_b.laser_stream[0])
    assert np.abs(eb - ea).max() / np.abs(ea).max() < 2e-3


def test_multi_pulse_from_file_plus_gaussian(tmp_path):
    """A from_file pulse and an analytic pulse compose by summation
    (ref MultiLaser InitLaserSlice sums over lasers)."""
    two = DECK.replace("lasers.names = laser",
                       "lasers.names = laser laser2")
    two += """
laser2.a0 = 0.5
laser2.position_mean = 0. 0. -2.e-5
laser2.w0 = 2.e-5
laser2.L0 = 1.5e-5
laser2.focal_distance = 0.001
"""
    sim_two = Simulation(Inputs(two), verbose=0)
    lcfg_two = LaserConfig.from_inputs(Inputs(two), sim_two.pc)
    g = sim_two.laser_geom

    # file for pulse 1 only
    one = Inputs(DECK)
    lcfg_one = LaserConfig.from_inputs(one, sim_two.pc)
    rmax = 1.5 * np.hypot(g.prob_hi[0], g.prob_hi[1])
    arr, _, dr = _radial_profile(lcfg_one, sim_two, nr=768, rmax=rmax)
    path = str(tmp_path / "laser1_rt.h5")
    _write_rt_file(path, arr, g.dz / scc.c, dr)

    mixed = Simulation(Inputs(two, overrides=[
        "laser.init_type=from_file",
        f"laser.input_file={path}",
        "laser.iteration=0",
        "laser.openPMD_laser_name=laserEnvelope"]), verbose=0)
    from hipace_tpu.fields.laser import load_laser_from_file
    ref = np.asarray(load_laser_from_file(
        lcfg_two, g, sim_two.dtype, zeta_lo=sim_two.laser_zeta[0],
        nz_global=sim_two.geom.nz, clight=scc.c))
    got = np.asarray(mixed.laser_stream[0])
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-4
