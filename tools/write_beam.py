#!/usr/bin/env python3
"""Generate an openPMD beam file for `beam.injection_type = from_file`.

Equivalent of the reference's tools/write_beam.py: writes particle arrays
x, y, z (positions), ux, uy, uz (dimensionless gamma*beta, the reference's
openPMD convention) and weights into the openPMD HDF5 layout this framework
reads back.

Usage:
    python tools/write_beam.py out.h5 --n 10000 --uz 1000 \
        --position-std 0.3 0.3 1.41 --density 3.0
or import `write_beam(path, arrays)` from Python.
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def write_beam(path: str, x, y, z, ux, uy, uz, w, iteration: int = 0,
               beam_name: str = "beam", time: float = 0.0):
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from hipace_tpu.diagnostics.openpmd import OpenPMDWriter

    class _G:  # minimal geometry stand-in for mesh attributes (unused here)
        dx = dy = dz = 1.0
        prob_lo = (0.0, 0.0, 0.0)

    w_ = OpenPMDWriter(file_prefix=path.rsplit("/", 1)[0] or ".")
    import h5py
    with h5py.File(path, "w") as f:
        f.attrs["openPMD"] = np.bytes_("1.1.0")
        f.attrs["basePath"] = np.bytes_("/data/%T/")
        f.attrs["particlesPath"] = np.bytes_("particles/")
        base = f.create_group(f"data/{iteration}")
        base.attrs["time"] = float(time)
        base.attrs["dt"] = 0.0
        gp = base.create_group(f"particles/{beam_name}")
        for comp, arr in (("position/x", x), ("position/y", y),
                          ("position/z", z), ("weighting", w),
                          ("momentum/x", ux), ("momentum/y", uy),
                          ("momentum/z", uz)):
            ds = gp.create_dataset(comp, data=np.asarray(arr, np.float64))
            ds.attrs["unitSI"] = 1.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--uz", type=float, default=1000.0)
    p.add_argument("--u-std", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--position-mean", type=float, nargs=3,
                   default=[0.0, 0.0, 0.0])
    p.add_argument("--position-std", type=float, nargs=3,
                   default=[0.3, 0.3, 1.41])
    p.add_argument("--density", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beam-name", default="beam")
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    mean = args.position_mean
    std = args.position_std
    x = rng.normal(mean[0], std[0], args.n)
    y = rng.normal(mean[1], std[1], args.n)
    z = rng.normal(mean[2], std[2], args.n)
    ux = rng.normal(0.0, args.u_std[0], args.n)
    uy = rng.normal(0.0, args.u_std[1], args.n)
    uz = rng.normal(args.uz, args.u_std[2], args.n)
    total_w = args.density * np.prod([s * math.sqrt(2 * math.pi)
                                      for s in std])
    w = np.full(args.n, total_w / args.n)
    write_beam(args.output, x, y, z, ux, uy, uz, w,
               beam_name=args.beam_name)
    print(f"wrote {args.n} particles to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
