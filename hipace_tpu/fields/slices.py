"""Slice-array helpers: padded-array derivatives, interior views, RHS assembly.

The per-level slice MultiFab of the reference (ref Fields.H:84-491) becomes a
dict of (NY, NX) = (ny+2G, nx+2G) padded jnp arrays. These helpers mirror the
derivative functors (ref Fields.cpp:222-277) and interior staging logic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import Geometry


def interior(f: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    G = geom.nguards
    NY, NX = geom.slice_shape
    return f[..., G:NY - G, G:NX - G]


def set_interior(f: jnp.ndarray, u: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    G = geom.nguards
    NY, NX = geom.slice_shape
    return f.at[..., G:NY - G, G:NX - G].set(u)


def ddx_interior(f: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Centered x derivative of a padded array, returned on the interior."""
    G = geom.nguards
    NY, NX = geom.slice_shape
    return (f[..., G:NY - G, G + 1:NX - G + 1]
            - f[..., G:NY - G, G - 1:NX - G - 1]) * (0.5 / geom.dx)


def ddy_interior(f: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    G = geom.nguards
    NY, NX = geom.slice_shape
    return (f[..., G + 1:NY - G + 1, G:NX - G]
            - f[..., G - 1:NY - G - 1, G:NX - G]) * (0.5 / geom.dy)


def grad_neg_full(psi: jnp.ndarray, geom: Geometry):
    """(-dPsi/dx, -dPsi/dy) on the padded array except the outermost ring
    (ref Fields.cpp:931-956: computed on grown(nguards-1) box)."""
    dx_inv = 0.5 / geom.dx
    dy_inv = 0.5 / geom.dy
    exmby = jnp.zeros_like(psi)
    eypbx = jnp.zeros_like(psi)
    exmby = exmby.at[..., :, 1:-1].set(
        -(psi[..., :, 2:] - psi[..., :, :-2]) * dx_inv)
    eypbx = eypbx.at[..., 1:-1, :].set(
        -(psi[..., 2:, :] - psi[..., :-2, :]) * dy_inv)
    return exmby, eypbx


def zero_slice(geom: Geometry, dtype) -> jnp.ndarray:
    return jnp.zeros(geom.slice_shape, dtype)


def make_field_set(names, geom: Geometry, dtype) -> dict:
    return {name: zero_slice(geom, dtype) for name in names}


def symmetrize(f: jnp.ndarray, geom: Geometry, symm_x: int, symm_y: int):
    """4-fold transverse symmetrization (ref Fields.cpp:1080-1114)."""
    fx = f[..., :, ::-1] * symm_x
    fy = f[..., ::-1, :] * symm_y
    fxy = f[..., ::-1, ::-1] * (symm_x * symm_y)
    return 0.25 * (f + fx + fy + fxy)
