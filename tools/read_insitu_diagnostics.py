#!/usr/bin/env python3
"""Reader for hipace_tpu in-situ reduced diagnostics.

The files are a JSON dtype header followed by one binary structured record
per step (the same on-disk format as the reference's
tools/read_insitu_diagnostics.py expects), so either reader works on either
code's output.

Usage:
    import read_insitu_diagnostics as diag
    data = diag.read_file("diags/insitu/reduced_beam.*.txt")
    eps_x = diag.emittance_x(data["average"])   # projected emittance
    z = diag.slice_positions(data)               # zeta of each slice
"""

from __future__ import annotations

import glob
import json

import numpy as np


def _load(path):
    with open(path, "rb") as f:
        raw = f.read()
    obj, offset = json.JSONDecoder().raw_decode(raw.decode(errors="replace"))
    return np.frombuffer(raw, dtype=np.dtype(obj), offset=offset)


def read_file(pattern):
    """Read all matching files into one structured array sorted by time."""
    parts = [_load(p) for p in sorted(glob.glob(pattern))]
    if not parts:
        raise FileNotFoundError(pattern)
    return np.sort(np.concatenate(parts), order="time")


def slice_positions(data):
    """zeta coordinate of each slice center (one row of data)."""
    d = data[0] if data.ndim else data
    n = int(d["n_slices"])
    dz = (d["z_hi"] - d["z_lo"]) / n
    return d["z_lo"] + (np.arange(n) + 0.5) * dz


def emittance_x(d):
    """Normalized emittance from second moments; works per-slice on the
    full record or projected on d = data['average']."""
    return np.sqrt(np.abs((d["[x^2]"] - d["[x]"] ** 2)
                          * (d["[ux^2]"] - d["[ux]"] ** 2)
                          - (d["[x*ux]"] - d["[x]"] * d["[ux]"]) ** 2))


def emittance_y(d):
    return np.sqrt(np.abs((d["[y^2]"] - d["[y]"] ** 2)
                          * (d["[uy^2]"] - d["[uy]"] ** 2)
                          - (d["[y*uy]"] - d["[y]"] * d["[uy]"]) ** 2))


def gamma_mean(d):
    return d["[ga]"]


def gamma_spread(d):
    return np.sqrt(np.abs(d["[ga^2]"] - d["[ga]"] ** 2))


def position_mean_x(d):
    return d["[x]"]


def position_std_x(d):
    return np.sqrt(np.abs(d["[x^2]"] - d["[x]"] ** 2))


def energy_spectrum(data, bins=100):
    """Histogram of per-slice mean gamma weighted by slice charge."""
    w = data["sum(w)"]
    ga = data["[ga]"]
    return np.histogram(ga, bins=bins, weights=w)


if __name__ == "__main__":
    import sys
    data = read_file(sys.argv[1] if len(sys.argv) > 1
                     else "diags/insitu/reduced_beam.*.txt")
    print("steps:", data["step"])
    print("projected emittance_x:", emittance_x(data["average"]))
    print("mean gamma:", gamma_mean(data["average"]))
