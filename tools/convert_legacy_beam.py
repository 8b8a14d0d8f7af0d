#!/usr/bin/env python3
"""Convert a legacy HiPACE-C 'raw' HDF5 beam file to an openPMD beam file
usable with `beam.injection_type = from_file`.

Equivalent of the reference's tools/convert_hipace_to_hipace++_file.py
(ref file:520-660): reads the legacy raw datasets (x1 = zeta, x2 = x,
x3 = y, p1 = uz, p2 = ux, p3 = uy, q = weights, with grid attributes
NX/XMIN/XMAX/TIME/DT) and writes the openPMD HDF5 layout this framework's
beam reader (hipace_tpu/diagnostics/openpmd.py read_beam) consumes.
Note the axis switch: legacy HiPACE-C is C-ordered with the longitudinal
axis first, so (x1, x2, x3) -> (z, x, y).

Per-particle charge normalization follows the reference: with --q_beam,
each weight is scaled so the weights sum to the given total charge;
otherwise the per-unit-weight charge is the legacy cell volume times
e * n0 / kp^3. The computed scale is stored as the openPMD unitSI
attribute of the weighting record (and applied to the data itself with
--apply-si, for SI-unit runs; normalized-unit runs read the raw
normalized values, which is the default).

Usage:
    python tools/convert_legacy_beam.py raw_beam_001.h5 out_beam.h5 \
        [--n0 7.2e21] [--q_beam -6.0e-10] [--beam-name beam]
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

SI_c = 299792458.0
SI_e = 1.602176634e-19
SI_m_e = 9.1093837015e-31
SI_eps0 = 8.8541878128e-12


def read_legacy_raw(path: str):
    """Read the legacy raw datasets + attributes. Returns (arrays, attrs);
    arrays keyed z/x/y/uz/ux/uy/w (axis switch applied)."""
    import h5py
    with h5py.File(path, "r") as hf:
        if "NULLCHECK" in hf.attrs and int(np.ravel(hf.attrs["NULLCHECK"])[0]):
            print(f"warning: {path} flags itself corrupted (NULLCHECK != 0)",
                  file=sys.stderr)
        arrays = {
            "z": np.asarray(hf["x1"], np.float64),
            "x": np.asarray(hf["x2"], np.float64),
            "y": np.asarray(hf["x3"], np.float64),
            "uz": np.asarray(hf["p1"], np.float64),
            "ux": np.asarray(hf["p2"], np.float64),
            "uy": np.asarray(hf["p3"], np.float64),
            "w": np.asarray(hf["q"], np.float64),
        }
        attrs = {}
        for k in ("NX", "XMIN", "XMAX", "TIME", "DT"):
            if k in hf.attrs:
                attrs[k] = np.ravel(np.asarray(hf.attrs[k])).astype(np.float64)
    return arrays, attrs


def convert(in_path: str, out_path: str, n0: float = 1.0,
            q_beam: float | None = None, beam_name: str = "beam",
            apply_si: bool = False, zeta_range=None):
    arrays, attrs = read_legacy_raw(in_path)
    if zeta_range is not None:
        lo, hi = zeta_range
        sel = (arrays["z"] >= lo) & (arrays["z"] < hi)
        arrays = {k: v[sel] for k, v in arrays.items()}

    kp = math.sqrt(n0 * (SI_e / SI_m_e) * (SI_e / SI_eps0)) / SI_c
    if q_beam is not None:
        sum_w = float(np.sum(arrays["w"]))
        if sum_w == 0.0:
            raise ValueError("legacy weights sum to zero; cannot "
                             "renormalize to --q_beam")
        q_si = q_beam / sum_w
    else:
        if "NX" not in attrs:
            raise ValueError("legacy file has no NX/XMIN/XMAX attributes; "
                             "pass --q_beam to set the charge scale")
        dx = [(attrs["XMAX"][d] - attrs["XMIN"][d]) / attrs["NX"][d]
              for d in range(3)]
        q_si = dx[0] * dx[1] * dx[2] * SI_e * n0 / kp ** 3
    if n0 == 1.0 and q_beam is None:
        print("note: --n0 not given; output is only meaningful for "
              "normalized-unit runs", file=sys.stderr)

    unit = {"position": 1.0 / kp, "momentum": 1.0, "weighting": q_si}
    if apply_si:
        for c in ("x", "y", "z"):
            arrays[c] = arrays[c] * unit["position"]
        arrays["w"] = arrays["w"] * unit["weighting"]
        unit = {k: 1.0 for k in unit}

    import h5py
    t = float(attrs["TIME"][0]) if "TIME" in attrs else 0.0
    with h5py.File(out_path, "w") as f:
        f.attrs["openPMD"] = np.bytes_("1.1.0")
        f.attrs["basePath"] = np.bytes_("/data/%T/")
        f.attrs["particlesPath"] = np.bytes_("particles/")
        base = f.create_group("data/0")
        base.attrs["time"] = t
        base.attrs["dt"] = float(attrs["DT"][0]) if "DT" in attrs else 0.0
        gp = base.create_group(f"particles/{beam_name}")
        gp.attrs["HiPACE++_Plasma_Density"] = float(n0)
        for comp, key in (("position/x", "x"), ("position/y", "y"),
                          ("position/z", "z"), ("weighting", "w"),
                          ("momentum/x", "ux"), ("momentum/y", "uy"),
                          ("momentum/z", "uz")):
            ds = gp.create_dataset(comp, data=arrays[key])
            ds.attrs["unitSI"] = unit[comp.split("/")[0]]
    return arrays["z"].size


def main():
    p = argparse.ArgumentParser(
        description="Convert a legacy HiPACE-C raw beam file to openPMD")
    p.add_argument("input", help="legacy raw .h5 file (must contain 'raw' "
                   "datasets x1..x3, p1..p3, q)")
    p.add_argument("output", help="output openPMD .h5 path")
    p.add_argument("--n0", type=float, default=1.0,
                   help="plasma density in SI (1/m^3) for unit conversion")
    p.add_argument("--q_beam", type=float, default=None,
                   help="total beam charge in SI; overrides the legacy "
                   "cell-volume charge scale")
    p.add_argument("--beam-name", default="beam")
    p.add_argument("--apply-si", action="store_true",
                   help="bake unitSI into the data (for SI-unit runs)")
    p.add_argument("--zeta-range", type=float, nargs=2, default=None,
                   help="keep only particles with lo <= zeta < hi")
    args = p.parse_args()
    n = convert(args.input, args.output, n0=args.n0, q_beam=args.q_beam,
                beam_name=args.beam_name, apply_si=args.apply_si,
                zeta_range=args.zeta_range)
    print(f"wrote {n} particles to {args.output}")


if __name__ == "__main__":
    main()
