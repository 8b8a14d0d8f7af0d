"""2D geometric multigrid for -a(x,y)*u + Laplacian(u) = rhs, Dirichlet BC.

TPU-native re-design of the reference's hand-rolled hpmg::MultiGrid
(ref: /root/reference/src/mg_solver/HpMultiGrid.{H,cpp}), used for the
explicit Bx/By solve (ref: Hipace.cpp:793-933) and the laser envelope
(complex variant, ref: MultiLaser.cpp:430-607). Everything is expressed as
dense jnp array ops (checkerboard-masked red-black Gauss-Seidel, shift-based
grid transfer), which XLA fuses into a handful of kernels per level.

Two grid conventions, as in the reference (HpMultiGrid.cpp:1050-1065):

- even domain sizes ("cell-centered"): Dirichlet u=0 at the cell *faces* of
  the domain boundary. The boundary-row Laplacian uses the one-sided
  (4/3, -4) stencil (ref: HpMultiGrid.cpp:163-182). Coarsening: 2x2 cell
  averaging / piecewise-constant prolongation.

- odd domain sizes ("node-centered", recommended 2^N-1): Dirichlet u=0 at
  the ghost *nodes* one cell outside the domain, identical to the DST
  solver's convention. Full-weighting restriction / bilinear prolongation.

Supports real systems with shared a-coefficient batched over a leading
component axis (system type 1: Bx,By) and complex systems (type 2: laser),
like hpmg solve1/solve2/solve3 (ref: HpMultiGrid.H:20-36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lap_offdiag_cc(u, facx, facy):
    """Off-diagonal part of the Laplacian, cell-centered face-Dirichlet."""
    ny, nx = u.shape[-2:]
    z = jnp.zeros_like(u[..., :, :1])
    uW = jnp.concatenate([z, u[..., :, :-1]], axis=-1)
    uE = jnp.concatenate([u[..., :, 1:], z], axis=-1)
    zr = jnp.zeros_like(u[..., :1, :])
    uS = jnp.concatenate([zr, u[..., :-1, :]], axis=-2)
    uN = jnp.concatenate([u[..., 1:, :], zr], axis=-2)
    lap = facx * (uW + uE) + facy * (uN + uS)
    # boundary rows/cols: neighbor coefficient is 4/3 instead of 1
    # (ref: HpMultiGrid.cpp laplacian() 4./3. terms)
    third = 1.0 / 3.0
    lap = lap.at[..., :, 0].add(third * facx * uE[..., :, 0])
    lap = lap.at[..., :, -1].add(third * facx * uW[..., :, -1])
    lap = lap.at[..., 0, :].add(third * facy * uN[..., 0, :])
    lap = lap.at[..., -1, :].add(third * facy * uS[..., -1, :])
    return lap


def _diag_cc(shape, facx, facy, dtype):
    """Diagonal of the Laplacian, cell-centered convention."""
    ny, nx = shape
    dgx = jnp.full((nx,), -2.0 * facx, dtype=dtype)
    dgx = dgx.at[0].set(-4.0 * facx).at[-1].set(-4.0 * facx)
    dgy = jnp.full((ny,), -2.0 * facy, dtype=dtype)
    dgy = dgy.at[0].set(-4.0 * facy).at[-1].set(-4.0 * facy)
    return dgx[None, :] + dgy[:, None]


def _lap_offdiag_nd(u, facx, facy):
    """Off-diagonal Laplacian, ghost-node Dirichlet (zero outside)."""
    z = jnp.zeros_like(u[..., :, :1])
    uW = jnp.concatenate([z, u[..., :, :-1]], axis=-1)
    uE = jnp.concatenate([u[..., :, 1:], z], axis=-1)
    zr = jnp.zeros_like(u[..., :1, :])
    uS = jnp.concatenate([zr, u[..., :-1, :]], axis=-2)
    uN = jnp.concatenate([u[..., 1:, :], zr], axis=-2)
    return facx * (uW + uE) + facy * (uN + uS)


def _restrict_cc(f):
    ny, nx = f.shape[-2:]
    s = f.shape[:-2]
    return 0.25 * f.reshape(s + (ny // 2, 2, nx // 2, 2)).sum(axis=(-3, -1))


def _prolong_add_cc(u, c):
    rep = jnp.repeat(jnp.repeat(c, 2, axis=-2), 2, axis=-1)
    return u + rep


def _restrict_nd(f):
    """Full-weighting: coarse interior node ic <-> fine interior 2*ic+1."""
    fp = jnp.pad(f, [(0, 0)] * (f.ndim - 2) + [(1, 1), (1, 1)])
    ny, nx = f.shape[-2:]
    nyc, nxc = (ny - 1) // 2, (nx - 1) // 2
    # fine padded index of coarse ic is 2*ic+2
    c = jnp.zeros(f.shape[:-2] + (nyc, nxc), dtype=f.dtype)
    w = [0.0625, 0.125, 0.0625, 0.125, 0.25, 0.125, 0.0625, 0.125, 0.0625]
    k = 0
    for dyy in (-1, 0, 1):
        for dxx in (-1, 0, 1):
            c = c + w[k] * jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(fp, 2 + dyy, 2 + dyy + 2 * nyc - 1, 2, axis=-2),
                2 + dxx, 2 + dxx + 2 * nxc - 1, 2, axis=-1)
            k += 1
    return c


def _prolong_add_nd(u, c):
    """Bilinear prolongation (transpose of full weighting x4), added to u."""
    ny, nx = u.shape[-2:]
    # zero-stuff coarse values at fine interior positions 2*ic+1
    up = jnp.zeros(u.shape[:-2] + (ny + 2, nx + 2), dtype=u.dtype)
    up = up.at[..., 3:ny + 1:2, 3:nx + 1:2].set(c)
    w = [0.25, 0.5, 0.25, 0.5, 1.0, 0.5, 0.25, 0.5, 0.25]
    out = u
    k = 0
    for dyy in (-1, 0, 1):
        for dxx in (-1, 0, 1):
            out = out + w[k] * up[..., 1 + dyy:1 + dyy + ny, 1 + dxx:1 + dxx + nx]
            k += 1
    return out


class MultiGrid:
    """Geometric multigrid solver; construct once per grid, reuse across jit."""

    def __init__(self, nx: int, ny: int, dx: float, dy: float,
                 dtype=jnp.float32):
        assert nx % 2 == ny % 2, "nx and ny must have the same parity"
        self.cell_centered = (nx % 2 == 0)
        self.dtype = dtype
        self.shapes = []
        self.facs = []
        n_x, n_y, ddx, ddy = nx, ny, dx, dy
        min_w = 2 if self.cell_centered else 3
        while True:
            self.shapes.append((n_y, n_x))
            self.facs.append((1.0 / (ddx * ddx), 1.0 / (ddy * ddy)))
            if self.cell_centered:
                if n_x % 2 or n_y % 2 or n_x // 2 < min_w or n_y // 2 < min_w:
                    break
                n_x //= 2
                n_y //= 2
            else:
                if (n_x - 1) % 2 or (n_y - 1) % 2 or (n_x - 1) // 2 < min_w \
                        or (n_y - 1) // 2 < min_w:
                    break
                n_x = (n_x - 1) // 2
                n_y = (n_y - 1) // 2
            ddx *= 2.0
            ddy *= 2.0
        self.nlevels = len(self.shapes)
        # checkerboard masks per level
        self.masks = []
        for (n_y, n_x) in self.shapes:
            iy, ix = np.mgrid[0:n_y, 0:n_x]
            self.masks.append(jnp.asarray((ix + iy) % 2 == 0))

    # ------------------------------------------------------------------
    def _offdiag(self, u, lev):
        facx, facy = self.facs[lev]
        if self.cell_centered:
            return _lap_offdiag_cc(u, facx, facy)
        return _lap_offdiag_nd(u, facx, facy)

    def _diag(self, lev, real_dtype):
        facx, facy = self.facs[lev]
        if self.cell_centered:
            return _diag_cc(self.shapes[lev], facx, facy, real_dtype)
        return jnp.asarray(-2.0 * (facx + facy), dtype=real_dtype)

    def apply_op(self, u, acf, lev=0):
        """A(u) = Laplacian(u) - acf*u."""
        return self._offdiag(u, lev) + self._diag(lev, u.real.dtype) * u - acf * u

    def _smooth(self, u, rhs, acf, lev, sweeps):
        """`sweeps` red-black Gauss-Seidel iterations (each = red + black)."""
        mask = self.masks[lev]
        diag = self._diag(lev, u.real.dtype) - acf
        inv_diag = 1.0 / diag

        def one_color(u, m):
            upd = (rhs - self._offdiag(u, lev)) * inv_diag
            return jnp.where(m, upd, u)

        for _ in range(sweeps):
            u = one_color(u, mask)
            u = one_color(u, ~mask)
        return u

    def _restrict(self, r):
        return _restrict_cc(r) if self.cell_centered else _restrict_nd(r)

    def _prolong_add(self, u, c):
        return _prolong_add_cc(u, c) if self.cell_centered else _prolong_add_nd(u, c)

    def _coarsen_acf(self, acf):
        """Averaged-down a-coefficients per level (ref: average_down_acoef)."""
        acfs = [acf]
        for lev in range(1, self.nlevels):
            if jnp.ndim(acf) == 0:
                acfs.append(acf)
            else:
                a = acfs[-1]
                if self.cell_centered:
                    acfs.append(_restrict_cc(a))
                else:
                    acfs.append(_restrict_nd(a) /
                                (_restrict_nd(jnp.ones_like(a)) + 1e-30))
        return acfs

    def _vcycle(self, u, rhs, acfs, lev=0, nu1=2, nu2=2):
        u = self._smooth(u, rhs, acfs[lev], lev, nu1)
        if lev + 1 < self.nlevels:
            res = rhs - self.apply_op(u, acfs[lev], lev)
            crhs = self._restrict(res)
            cu = jnp.zeros_like(crhs)
            cu = self._vcycle(cu, crhs, acfs, lev + 1, nu1, nu2)
            u = self._prolong_add(u, cu)
            u = self._smooth(u, rhs, acfs[lev], lev, nu2)
        else:
            u = self._smooth(u, rhs, acfs[lev], lev, 8)
        return u

    # ------------------------------------------------------------------
    def solve(self, u0, rhs, acf, tol_rel=1e-4, tol_abs=0.0, max_iters=40,
              nu1=2, nu2=2):
        """Solve Laplacian(u) - acf*u = rhs starting from u0.

        u0/rhs may have a leading batch axis (e.g. (2, ny, nx) for Bx,By with
        shared acf, as in hpmg solve1). acf is (ny, nx), scalar, or complex
        scalar for the complex system. Uses a lax.while_loop with max-norm
        convergence matching hpmg (ref: HpMultiGrid.cpp:1308-1380).
        """
        acfs = self._coarsen_acf(acf)

        res0 = rhs - self.apply_op(u0, acfs[0], 0)
        resnorm0 = jnp.max(jnp.abs(res0))
        rhsnorm0 = jnp.max(jnp.abs(rhs))
        target = jnp.maximum(tol_abs, jnp.maximum(tol_rel, 1e-16)
                             * jnp.maximum(resnorm0, rhsnorm0))

        def cond(carry):
            u, resnorm, it = carry
            return (resnorm > target) & (it < max_iters)

        def body(carry):
            u, _, it = carry
            u = self._vcycle(u, rhs, acfs, 0, nu1, nu2)
            res = rhs - self.apply_op(u, acfs[0], 0)
            return (u, jnp.max(jnp.abs(res)), it + 1)

        u, resnorm, it = jax.lax.while_loop(cond, body, (u0, resnorm0,
                                                         jnp.zeros((), jnp.int32)))
        return u
