"""Legacy HiPACE-C raw beam conversion (tools/convert_legacy_beam.py).

Mirrors the reference's tools/convert_hipace_to_hipace++_file.py behavior
(axis switch x1->z, charge scale from cell volume or --q_beam) and checks
the output loads through beam.injection_type = from_file.
"""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

h5py = pytest.importorskip("h5py")

from convert_legacy_beam import convert, SI_c, SI_e, SI_m_e, SI_eps0  # noqa


def _write_legacy(path, n=100, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "x1": rng.normal(-2.0, 1.0, n),   # zeta
        "x2": rng.normal(0.0, 0.3, n),    # x
        "x3": rng.normal(0.0, 0.3, n),    # y
        "p1": rng.normal(1000.0, 10.0, n),
        "p2": rng.normal(0.0, 1.0, n),
        "p3": rng.normal(0.0, 1.0, n),
        "q": np.abs(rng.normal(1.0, 0.1, n)),
    }
    with h5py.File(path, "w") as f:
        for k, v in data.items():
            f.create_dataset(k, data=v)
        f.attrs["NX"] = np.array([64, 32, 32])
        f.attrs["XMIN"] = np.array([-8.0, -4.0, -4.0])
        f.attrs["XMAX"] = np.array([8.0, 4.0, 4.0])
        f.attrs["TIME"] = np.array([0.0])
        f.attrs["DT"] = np.array([1.0])
    return data


def test_axis_switch_and_charge_scale(tmp_path):
    src = str(tmp_path / "raw_beam.h5")
    out = str(tmp_path / "beam_conv.h5")
    data = _write_legacy(src)
    n0 = 7.2e21
    convert(src, out, n0=n0)
    with h5py.File(out, "r") as f:
        gp = f["data/0/particles/beam"]
        np.testing.assert_allclose(gp["position/z"][...], data["x1"])
        np.testing.assert_allclose(gp["position/x"][...], data["x2"])
        np.testing.assert_allclose(gp["position/y"][...], data["x3"])
        np.testing.assert_allclose(gp["momentum/z"][...], data["p1"])
        kp = math.sqrt(n0 * (SI_e / SI_m_e) * (SI_e / SI_eps0)) / SI_c
        assert gp["position/x"].attrs["unitSI"] == pytest.approx(1.0 / kp)
        # charge scale = legacy cell volume * e * n0 / kp^3
        dv = (16.0 / 64) * (8.0 / 32) * (8.0 / 32)
        assert gp["weighting"].attrs["unitSI"] == pytest.approx(
            dv * SI_e * n0 / kp ** 3)


def test_q_beam_renormalization(tmp_path):
    src = str(tmp_path / "raw_beam.h5")
    out = str(tmp_path / "beam_conv.h5")
    data = _write_legacy(src)
    convert(src, out, q_beam=-3.2e-10, apply_si=True)
    with h5py.File(out, "r") as f:
        w = f["data/0/particles/beam/weighting"][...]
    # applied scale: weights now sum to q_beam
    assert np.sum(w) == pytest.approx(-3.2e-10, rel=1e-12)
    assert np.allclose(w / data["q"], -3.2e-10 / np.sum(data["q"]))


def test_loads_as_from_file_beam(tmp_path):
    src = str(tmp_path / "raw_beam.h5")
    out = str(tmp_path / "beam_conv.h5")
    data = _write_legacy(src)
    convert(src, out)
    from hipace_tpu.diagnostics.openpmd import read_beam
    b = read_beam(out, 0, "beam")
    np.testing.assert_allclose(b["z"], data["x1"])
    np.testing.assert_allclose(b["ux"], data["p2"])
    np.testing.assert_allclose(b["w"], data["q"])
