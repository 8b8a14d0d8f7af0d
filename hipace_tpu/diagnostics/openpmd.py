"""openPMD-layout HDF5 output written directly with h5py.

The reference uses openPMD-api (ref: /root/reference/src/diagnostics/
OpenPMDWriter.{H,cpp}) writing file-based series diags/openpmd_%06T.h5 with
meshes (fields) and particle species. openPMD is a naming/attribute
convention on HDF5; since openpmd-api is not available in this environment
we write the same layout with h5py so that openPMD readers (and the
reference's checksum harness style of analysis) work on our output.

Fields are written as (nz, ny, nx) datasets with axisLabels ("z","y","x");
beams as 1D particle record components x/y/z, w, ux/uy/uz (momenta stored as
gamma*beta like the reference, ref OpenPMDWriter.H:79-95).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class OpenPMDWriter:
    def __init__(self, file_prefix: str = "diags/hdf5",
                 normalized_units: bool = True):
        self.prefix = file_prefix
        self.normalized = normalized_units
        if h5py is not None:
            os.makedirs(file_prefix, exist_ok=True)

    def _path(self, it: int) -> str:
        return os.path.join(self.prefix, f"openpmd_{it:06d}.h5")

    def write(self, it: int, time: float, dt: float, fields: dict | None,
              geom, beams: dict | None = None, field_geom=None,
              field_meta: dict | None = None):
        """Write one iteration.

        fields: dict name -> np.ndarray (nz, ny, nx) (or (ny, nx) slices of
        reduced diagnostics). beams: dict beam-name -> dict of 1D arrays
        {x,y,z,w,ux,uy,uz} (already masked to valid particles).
        field_meta: optional dict name -> (spacing tuple, offset tuple)
        matching the dataset's trailing axes.
        """
        if h5py is None:
            raise RuntimeError("h5py not available")
        fg = field_geom or geom
        field_meta = field_meta or {}
        with h5py.File(self._path(it), "w") as f:
            f.attrs["openPMD"] = np.bytes_("1.1.0")
            f.attrs["openPMDextension"] = np.uint32(0)
            f.attrs["basePath"] = np.bytes_("/data/%T/")
            f.attrs["meshesPath"] = np.bytes_("fields/")
            f.attrs["particlesPath"] = np.bytes_("particles/")
            f.attrs["iterationEncoding"] = np.bytes_("fileBased")
            f.attrs["iterationFormat"] = np.bytes_("openpmd_%06T")
            base = f.create_group(f"data/{it}")
            base.attrs["time"] = float(time)
            base.attrs["dt"] = float(dt)
            base.attrs["timeUnitSI"] = 1.0

            if fields:
                mesh = base.create_group("fields")
                for name, arr in fields.items():
                    arr = np.asarray(arr)
                    ds = mesh.create_dataset(name, data=arr)
                    nd = arr.ndim
                    labels = ["z", "y", "x"][-nd:]
                    if name in field_meta:
                        meta = field_meta[name]
                        spacing = list(meta[0])[-nd:]
                        offset = list(meta[1])[-nd:]
                        if len(meta) > 2:
                            labels = list(meta[2])[-nd:]
                    else:
                        spacing = [fg.dz, fg.dy, fg.dx][-nd:]
                        offset = [fg.prob_lo[2], fg.prob_lo[1],
                                  fg.prob_lo[0]][-nd:]
                    ds.attrs["axisLabels"] = np.array(
                        [np.bytes_(a) for a in labels])
                    ds.attrs["gridSpacing"] = np.array(spacing, np.float64)
                    ds.attrs["gridGlobalOffset"] = np.array(offset, np.float64)
                    ds.attrs["position"] = np.array([0.5] * nd, np.float64)
                    ds.attrs["dataOrder"] = np.bytes_("C")
                    ds.attrs["geometry"] = np.bytes_("cartesian")
                    ds.attrs["gridUnitSI"] = 1.0
                    ds.attrs["unitSI"] = 1.0
                    ds.attrs["unitDimension"] = np.zeros(7, np.float64)

            if beams:
                part = base.create_group("particles")
                for bname, b in beams.items():
                    gp = part.create_group(bname)
                    for comp, key in (("position/x", "x"), ("position/y", "y"),
                                      ("position/z", "z"), ("weighting", "w"),
                                      ("momentum/x", "ux"), ("momentum/y", "uy"),
                                      ("momentum/z", "uz")):
                        ds = gp.create_dataset(comp, data=np.asarray(b[key]))
                        ds.attrs["unitSI"] = 1.0
                        ds.attrs["unitDimension"] = np.zeros(7, np.float64)
                    if "id" in b:
                        gp.create_dataset("id", data=np.asarray(b["id"]))


def read_field(path: str, it: int, name: str):
    """Convenience reader used by tests."""
    with h5py.File(path, "r") as f:
        return np.array(f[f"data/{it}/fields/{name}"])


def read_beam(path: str, it: int, beam: str):
    out = {}
    with h5py.File(path, "r") as f:
        gp = f[f"data/{it}/particles/{beam}"]
        for comp, key in (("position/x", "x"), ("position/y", "y"),
                          ("position/z", "z"), ("weighting", "w"),
                          ("momentum/x", "ux"), ("momentum/y", "uy"),
                          ("momentum/z", "uz")):
            out[key] = np.array(gp[comp])
    return out
