"""2D geometric multigrid for -a(x,y)*u + Laplacian(u) = rhs, Dirichlet BC.

TPU-native re-design of the reference's hand-rolled hpmg::MultiGrid
(ref: /root/reference/src/mg_solver/HpMultiGrid.{H,cpp}), used for the
explicit Bx/By solve (ref: Hipace.cpp:793-933) and the laser envelope
(complex variant, ref: MultiLaser.cpp:430-607).

Everything is expressed in TPU-friendly dense ops: red-black Gauss-Seidel
with checkerboard masks, Laplacian boundary terms as precomputed coefficient
arrays (no in-place edge updates), and grid transfer as strided
`lax.conv_general_dilated` calls — stride-2 slicing lowers to slow gathers
on TPU, strided convolution runs on the conv unit.

Two grid conventions, as in the reference (HpMultiGrid.cpp:1050-1065):

- even domain sizes ("cell-centered"): Dirichlet u=0 at the cell *faces*;
  boundary rows use the one-sided (4/3, -4) stencil
  (ref: HpMultiGrid.cpp:163-182). 2x2 cell-average restriction /
  piecewise-constant prolongation.

- odd domain sizes ("node-centered", recommended 2^N-1): Dirichlet u=0 at
  the ghost nodes, identical to the DST solver's convention. Full-weighting
  restriction / bilinear prolongation.

Supports real systems batched over a leading component axis with shared
a-coefficient (hpmg solve1: Bx,By) and complex systems (solve2: laser).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


_RESTRICT_ND = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0
_PROLONG_ND = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 4.0
_RESTRICT_CC = np.full((2, 2), 0.25, np.float32)


def _conv(x, kernel, strides, padding, lhs_dilation=(1, 1)):
    """2D conv on (..., ny, nx) arrays with a (kh, kw) kernel."""
    batch = x.shape[:-2]
    xr = x.reshape((-1, 1) + x.shape[-2:])
    k = jnp.asarray(kernel, x.dtype)[None, None]
    out = jax.lax.conv_general_dilated(
        xr, k, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(batch + out.shape[-2:])


def _conv_complex(x, kernel, strides, padding, lhs_dilation=(1, 1)):
    if jnp.iscomplexobj(x):
        return (_conv(x.real, kernel, strides, padding, lhs_dilation)
                + 1j * _conv(x.imag, kernel, strides, padding, lhs_dilation))
    return _conv(x, kernel, strides, padding, lhs_dilation)


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

        # checkerboard masks and boundary-coefficient arrays per level
        self.masks = []
        self.coefs = []   # (cW, cE, cS, cN) neighbor multipliers
        self.diags = []
        rdt = jnp.float32 if dtype in (jnp.float32, jnp.complex64) else \
            jnp.float64
        for lev, (n_y, n_x) in enumerate(self.shapes):
            iy, ix = np.mgrid[0:n_y, 0:n_x]
            self.masks.append(jnp.asarray((ix + iy) % 2 == 0))
            facx, facy = self.facs[lev]
            if self.cell_centered:
                # neighbor coefficient 4/3 on the boundary-facing side
                # (ref HpMultiGrid.cpp laplacian())
                cW = np.ones((n_y, n_x), np.float64)
                cE = np.ones((n_y, n_x), np.float64)
                cS = np.ones((n_y, n_x), np.float64)
                cN = np.ones((n_y, n_x), np.float64)
                cE[:, 0] = 4.0 / 3.0   # at i=0 the E neighbor gets 4/3
                cW[:, -1] = 4.0 / 3.0
                cN[0, :] = 4.0 / 3.0
                cS[-1, :] = 4.0 / 3.0
                dgx = np.full((n_x,), -2.0 * facx)
                dgx[0] = dgx[-1] = -4.0 * facx
                dgy = np.full((n_y,), -2.0 * facy)
                dgy[0] = dgy[-1] = -4.0 * facy
                diag = dgx[None, :] + dgy[:, None]
                self.coefs.append(tuple(jnp.asarray(c, rdt)
                                        for c in (cW, cE, cS, cN)))
                self.diags.append(jnp.asarray(diag, rdt))
            else:
                self.coefs.append(None)
                self.diags.append(jnp.asarray(-2.0 * (facx + facy), rdt))

    # ------------------------------------------------------------------
    def _offdiag(self, u, lev):
        facx, facy = self.facs[lev]
        z = jnp.zeros_like(u[..., :, :1])
        uW = jnp.concatenate([z, u[..., :, :-1]], axis=-1)
        uE = jnp.concatenate([u[..., :, 1:], z], axis=-1)
        zr = jnp.zeros_like(u[..., :1, :])
        uS = jnp.concatenate([zr, u[..., :-1, :]], axis=-2)
        uN = jnp.concatenate([u[..., 1:, :], zr], axis=-2)
        if self.cell_centered:
            cW, cE, cS, cN = self.coefs[lev]
            return facx * (uW * cW + uE * cE) + facy * (uS * cS + uN * cN)
        return facx * (uW + uE) + facy * (uN + uS)

    def apply_op(self, u, acf, lev=0):
        """A(u) = Laplacian(u) - acf*u."""
        return self._offdiag(u, lev) + (self.diags[lev] - acf) * u

    def _smooth(self, u, rhs, acf, lev, sweeps):
        """Red-black Gauss-Seidel (each sweep = red + black)."""
        mask = self.masks[lev]
        inv_diag = 1.0 / (self.diags[lev] - acf)

        def one_color(u, m):
            upd = (rhs - self._offdiag(u, lev)) * inv_diag
            return jnp.where(m, upd, u)

        for _ in range(sweeps):
            u = one_color(u, mask)
            u = one_color(u, ~mask)
        return u

    # ------------------------------------------------------------------
    def _restrict(self, r):
        if self.cell_centered:
            return _conv_complex(r, _RESTRICT_CC, (2, 2), "VALID")
        return _conv_complex(r, _RESTRICT_ND, (2, 2), "VALID")

    def _prolong_add(self, u, c):
        if self.cell_centered:
            rep = jnp.repeat(jnp.repeat(c, 2, axis=-2), 2, axis=-1)
            return u + rep
        # bilinear: zero-stuff (lhs_dilation=2) + 3x3 tent kernel; coarse
        # node ic sits at fine 2ic+1, so pad 2 on the leading side
        up = _conv_complex(c, _PROLONG_ND, (1, 1),
                           [(2, 2), (2, 2)], lhs_dilation=(2, 2))
        return u + up

    def _coarsen_acf(self, acf):
        """Averaged-down a-coefficients per level (ref average_down_acoef)."""
        acfs = [acf]
        for lev in range(1, self.nlevels):
            a = acfs[-1]
            if jnp.ndim(a) == 0:
                acfs.append(a)
            elif self.cell_centered:
                acfs.append(_conv_complex(a, _RESTRICT_CC, (2, 2), "VALID"))
            else:
                num = _conv_complex(a, _RESTRICT_ND, (2, 2), "VALID")
                den = _conv_complex(jnp.ones_like(a), _RESTRICT_ND, (2, 2),
                                    "VALID")
                acfs.append(num / den)
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

        u0/rhs may have a leading batch axis ((2, ny, nx) for Bx,By with
        shared acf, as in hpmg solve1). acf is (ny, nx), scalar, or complex.
        lax.while_loop with max-norm convergence matching hpmg
        (ref: HpMultiGrid.cpp:1308-1380)."""
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

        u, resnorm, it = jax.lax.while_loop(
            cond, body, (u0, resnorm0, jnp.zeros((), jnp.int32)))
        return u
