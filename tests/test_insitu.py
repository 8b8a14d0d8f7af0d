"""In-situ reduced diagnostics: format round-trip and physics sanity."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from hipace_tpu.parser import Inputs
from hipace_tpu.pipeline.simulation import Simulation

DECK = """
amr.n_cell = 16 16 32
hipace.normalized_units = 1
max_step = 1
hipace.dt = 1.0
boundary.field = Dirichlet
boundary.particle = Periodic
geometry.prob_lo = -6. -6. -4.
geometry.prob_hi =  6.  6.  2.
beams.names = beam
beams.insitu_period = 1
beam.injection_type = fixed_weight
beam.num_particles = 2000
beam.profile = gaussian
beam.position_mean = 0. 0. -1.
beam.position_std = 0.4 0.4 0.8
beam.zmin = -3.9
beam.zmax = 1.9
beam.density = 0.5
beam.u_mean = 0. 0. 1000.
beam.u_std = 1. 1. 5.
plasmas.names = plasma
plasmas.insitu_period = 1
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
fields.insitu_period = 1
diagnostic.output_period = 0
"""


def test_insitu_roundtrip(tmp_path):
    os.chdir(tmp_path)
    sim = Simulation(Inputs(DECK), verbose=0)
    sim.evolve(write_output=True)

    import read_insitu_diagnostics as diag
    data = diag.read_file(str(tmp_path / "diags/insitu/reduced_beam.*.txt"))
    assert data.shape == (2,)
    assert list(data["step"]) == [0, 1]
    # total weight conserved and positive
    assert data["total"]["sum(w)"][0] > 0
    np.testing.assert_allclose(data["total"]["sum(w)"][0],
                               data["total"]["sum(w)"][1], rtol=1e-9)
    # projected mean gamma ~ 1000
    ga = diag.gamma_mean(data["average"])
    assert abs(ga[0] - 1000.0) / 1000.0 < 1e-3
    # projected emittance ~ sigma_x * sigma_ux = 0.4
    eps = diag.emittance_x(data["average"])
    assert abs(eps[0] - 0.4) / 0.4 < 0.1
    # per-slice arrays have the right length
    assert data["[x]"].shape == (2, 32)

    fdata = diag.read_file(str(tmp_path / "diags/field_insitu/reduced_field.*.txt"))
    assert fdata["[Ez^2]"].shape == (2, 32)
    assert fdata["[Ez^2]"].sum() > 0
    pdata = diag.read_file(str(tmp_path / "diags/plasma_insitu/reduced_plasma.*.txt"))
    assert pdata["total"]["sum(w)"][0] > 0
