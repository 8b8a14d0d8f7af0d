import numpy as np
import pytest

from hipace_tpu.parser import Inputs


DECK = """
# comment
amr.n_cell = 64 64 100
max_step = 20
hipace.normalized_units = 1
hipace.dt = 4.4
geometry.prob_lo = -8. -8. -6
geometry.prob_hi = 8. 8. 6
my_constants.kp_inv = 10.
my_constants.w0 = 2 * kp_inv
beams.names = beam drive
beam.position_std = 0.3 0.3 1.41
plasma.density(x,y,z) = exp(-(x^2+y^2)/(2*w0^2))
beam.u_mean = 0. 0. 2000
boundary.field = Dirichlet
"""


def test_basic_types():
    inp = Inputs(DECK)
    assert inp.get_list("amr.n_cell", int) == [64, 64, 100]
    assert inp.get("max_step", int) == 20
    assert inp.get("hipace.dt", float) == 4.4
    assert inp.get("hipace.normalized_units", bool) is True
    assert inp.get_list("geometry.prob_lo", float) == [-8.0, -8.0, -6.0]
    assert inp.get_list("beams.names", str) == ["beam", "drive"]


def test_my_constants_chain():
    inp = Inputs(DECK)
    assert inp.my_constants["kp_inv"] == 10.0
    assert inp.my_constants["w0"] == 20.0


def test_expression_values():
    inp = Inputs("a.x = 2*pi\nb.y = sqrt(4.)")
    assert np.isclose(inp.get("a.x"), 2 * np.pi)
    assert inp.get("b.y") == 2.0


def test_function_param():
    inp = Inputs(DECK)
    f = inp.get_function("plasma.density", ("x", "y", "z"))
    val = np.asarray(f(np.array([0.0, 20.0]), np.array([0.0, 0.0]), 0.0))
    assert np.isclose(val[0], 1.0)
    assert np.isclose(val[1], np.exp(-1.0 / 2.0))


def test_query_defaults():
    inp = Inputs(DECK)
    assert inp.query("missing.key", 7, int) == 7
    assert inp.query("max_step", 0, int) == 20


def test_prefix_view():
    inp = Inputs(DECK)
    pp = inp.prefix("beam")
    assert pp.get_list("u_mean", float) == [0.0, 0.0, 2000.0]


def test_overrides():
    inp = Inputs(DECK, overrides=["max_step=5", "hipace.dt = 1.0"])
    assert inp.get("max_step", int) == 5
    assert inp.get("hipace.dt") == 1.0


def test_missing_raises():
    inp = Inputs(DECK)
    with pytest.raises(KeyError):
        inp.get("not.there")


def test_string_brace_interpolation():
    """{...} in string parameters pastes my_constants / evaluates
    expressions (ref parameters.rst:37-38)."""
    inputs = Inputs("""
my_constants.run = 3
my_constants.tag = 0.5
hipace.file_prefix = diags/run_{run}
other.name = x_{2*run}_{tag}
""")
    assert inputs.query("hipace.file_prefix", "", str) == "diags/run_3"
    assert inputs.query("other.name", "", str) == "x_6_0.5"


def test_quoted_key_with_parentheses():
    # AMReX ParmParse quotes keys containing parentheses
    # (ref inputs_ion_motion_SI: "elec.density(x,y,z)" = ne)
    from hipace_tpu.parser import Inputs
    inp = Inputs('my_constants.ne = 2.5\n"elec.density(x,y,z)" = ne\n')
    f = inp.prefix("elec").get_function("density", ("x", "y", "z"))
    assert f is not None
    import numpy as np
    assert float(f(np.array(0.0), np.array(0.0), np.array(0.0))) == 2.5
