"""fixed_weight_pdf sampling statistics and from_file restart round-trip.

Restart mirrors /root/reference/tests/restart.normalized.1Rank.sh: run,
write openPMD output, re-run with beam.injection_type=from_file reading the
previous output, and compare the beams.
"""

import os

import numpy as np

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

BASE = """
amr.n_cell = 16 16 48
hipace.normalized_units = 1
max_step = 0
hipace.dt = 1.0
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -6. -6. -6.
geometry.prob_hi =  6.  6.  2.
plasmas.names = no_plasma
diagnostic.output_period = 1
"""


def test_fixed_weight_pdf_statistics():
    deck = BASE + """
beams.names = beam
beam.injection_type = fixed_weight_pdf
beam.num_particles = 40000
beam.pdf(z) = exp(-(z+2)^2 / (2*0.64))
beam.position_mean = 0.1*z 0.
beam.position_std = 0.3 0.2
beam.u_mean = 0. 0. 1000.+100.*z
beam.u_std = 2. 1. 10.
beam.density = 1.
"""
    sim = Simulation(Inputs(deck), verbose=0)
    b = sim.beams_flat[0]
    v = np.asarray(b["valid"])
    z = np.asarray(b["z"])[v]
    x = np.asarray(b["x"])[v]
    y = np.asarray(b["y"])[v]
    uz = np.asarray(b["uz"])[v]
    # z distribution: gaussian mean -2, sigma 0.8
    assert abs(z.mean() + 2.0) < 0.02
    assert abs(z.std() - 0.8) < 0.02
    # x tracks the tilt 0.1*z plus sigma 0.3
    assert abs(x.std() - np.sqrt(0.3**2 + (0.1 * 0.8) ** 2)) < 0.02
    assert abs(y.std() - 0.2) < 0.01
    # uz chirp: mean 1000 + 100*mean(z) = 800
    assert abs(uz.mean() - (1000.0 + 100.0 * z.mean())) < 2.0
    # weights: peak density 1 at the pdf peak
    w = np.asarray(b["w"])[v]
    assert w.min() == w.max() > 0


def test_restart_from_file(tmp_path):
    os.chdir(tmp_path)
    deck = BASE + """
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 3000
beam.profile = gaussian
beam.position_mean = 0. 0. -2.
beam.position_std = 0.3 0.3 0.8
beam.zmin = -5.9
beam.zmax = 1.9
beam.density = 1.
beam.u_mean = 0. 0. 500.
beam.u_std = 1. 1. 5.
"""
    sim = Simulation(Inputs(deck), verbose=0)
    sim.evolve(write_output=True)
    out = str(tmp_path / "diags/hdf5/openpmd_000000.h5")
    assert os.path.exists(out)

    deck2 = BASE + f"""
beams.names = beam
beam.injection_type = from_file
beam.input_file = {out}
beam.iteration = 0
"""
    sim2 = Simulation(Inputs(deck2), verbose=0)
    b2 = sim2.beams_flat[0]
    v2 = np.asarray(b2["valid"])
    b1 = sim.beams_flat[0]
    v1 = np.asarray(b1["valid"])
    assert v2.sum() == v1.sum()
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        a = np.sort(np.asarray(b1[k])[v1])
        b = np.sort(np.asarray(b2[k])[v2])
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-300,
                                   err_msg=k)
    # and the restarted run produces the same fields (fresh sim: evolve()
    # above already advanced the original's beam state)
    sim1b = Simulation(Inputs(deck), verbose=0)
    res1 = sim1b.run_step(0)
    res2 = sim2.run_step(0)
    np.testing.assert_allclose(np.asarray(res1["diag"]),
                               np.asarray(res2["diag"]), rtol=1e-8,
                               atol=1e-12)
