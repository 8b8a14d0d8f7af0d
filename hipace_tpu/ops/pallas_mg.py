"""Fused single-kernel multigrid solve: the whole V-cycle ladder in VMEM.

TPU analogue of the reference's fused shared-memory GSRB kernels and its
single-block coarse regime (ref /root/reference/src/mg_solver/
HpMultiGrid.cpp:412-560 runs 4 smoother iterations per shared-memory
round-trip; :1073-1096 runs whole <=32-cell levels inside one GPU
block). Here the ENTIRE solve — every level's red-black sweeps, the
residual/restriction/prolongation transfers, and the convergence
while_loop over V-cycles — executes inside ONE pallas_call with all
levels resident in VMEM:

  * at 1023^2 x 2 channels the full ladder (u, rhs, inv-diag and
    diag-minus-acf per level, transfer matrices, masks) is ~55 MB,
    comfortably inside the v5e VMEM budget (112 MB);
  * HBM traffic for the whole solve is one read of (u0, rhs, per-level
    coefficient arrays) + one write of u — the XLA formulation in
    fields/multigrid.py pays a full-level read+write per *color pass*
    (8+ per level per V-cycle);
  * grid transfers stay on the MXU as dense separable matmuls, exactly
    like the XLA path (see fields/multigrid.py module docstring).

Design notes:

  * node-centered (odd 2^N-1 sizes, the reference's recommended perf
    resolutions, ref docs parameters.rst:169) only; even cell-centered
    grids keep the XLA path (their 4/3 edge stencils need four extra
    coefficient arrays per level — not worth VMEM for a convention the
    bench decks never use).
  * every level is padded to (8, 128)-aligned shapes with AT LEAST one
    zero ghost row/column beyond the domain, so the +-1 neighbor shifts
    are CIRCULAR rolls: the wrapped lane always lands on a zero ghost
    (Dirichlet) and no edge masking is needed in the stencil itself.
    Interior masks gate the smoother writes and the residual, keeping
    the ghost ring zero for the whole solve.
  * real systems only, batched over a leading channel axis with shared
    acf (hpmg solve1: Bx,By; solve3: single). The complex laser system
    (solve2) keeps the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_dim(n: int, tile: int) -> int:
    """Round n up to a tile multiple, guaranteeing >= 1 ghost slot."""
    return ((n + 1 + tile - 1) // tile) * tile


def _roll(arr, shift: int, axis: int, interpret: bool):
    if interpret:
        return jnp.roll(arr, shift, axis=axis)
    return pltpu.roll(arr, shift=shift % arr.shape[axis], axis=axis)


def _mg_kernel(target_ref, u_ref, rhs_ref, *args, L, facs, nu1, nu2,
               coarse_sweeps, max_iters, C, interpret):
    """One pallas call = the full solve. refs layout:
    invd[0..L-1], dma[0..L-1], Ry[0..L-2], Rx[0..L-2].

    Interior and checkerboard masks are synthesized in-kernel (interior
    from invd != 0 — invd is zero-masked outside the domain and the
    d == 0 guard keeps it nonzero inside — parity from broadcasted
    iotas) instead of being passed as three per-level mask pyramids:
    at 1023^2 those inputs cost ~16 MB of pinned single-buffered VMEM,
    which pushed the whole ladder 2 MB past the 128 MB v5e budget."""
    refs, out_ref = args[:-1], args[-1]
    invd = [refs[i][:] for i in range(L)]
    dma = [refs[L + i][:] for i in range(L)]
    Ry = [refs[2 * L + i][:] for i in range(L - 1)]
    Rx = [refs[3 * L - 1 + i][:] for i in range(L - 1)]
    interior = [iv != 0 for iv in invd]

    def parity(lev):
        ny, nx = invd[lev].shape
        iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        return (iy + ix) & 1

    def offdiag(u, lev):
        facx, facy = facs[lev]
        uW = _roll(u, 1, u.ndim - 1, interpret)
        uE = _roll(u, -1, u.ndim - 1, interpret)
        uS = _roll(u, 1, u.ndim - 2, interpret)
        uN = _roll(u, -1, u.ndim - 2, interpret)
        return facx * (uW + uE) + facy * (uS + uN)

    def smooth(u, rhs, lev, sweeps):
        par = parity(lev)
        for _ in range(sweeps):
            for color in (0, 1):
                cmask = interior[lev] & (par == color)
                upd = (rhs - offdiag(u, lev)) * invd[lev]
                u = jnp.where(cmask, upd, u)
        return u

    def residual(u, rhs, lev):
        return jnp.where(interior[lev],
                         rhs - offdiag(u, lev) - dma[lev] * u, 0.0)

    def restrict(r, lev):
        # Ry @ r @ Rx^T per channel on the MXU
        outs = []
        for c in range(C):
            t = jnp.dot(Ry[lev], r[c], preferred_element_type=r.dtype)
            outs.append(jax.lax.dot_general(
                t, Rx[lev], (((1,), (1,)), ((), ())),
                preferred_element_type=r.dtype))
        return jnp.stack(outs)

    def prolong(cu, lev):
        # (2Ry)^T @ cu @ (2Rx) per channel
        outs = []
        for c in range(C):
            t = jax.lax.dot_general(
                Ry[lev], cu[c], (((0,), (0,)), ((), ())),
                preferred_element_type=cu.dtype)
            outs.append(jnp.dot(t, Rx[lev],
                                preferred_element_type=cu.dtype))
        return 4.0 * jnp.stack(outs)

    rhs0 = rhs_ref[:]

    def vcycle(u):
        us = [u] + [None] * (L - 1)
        rhss = [rhs0] + [None] * (L - 1)
        for lev in range(L - 1):
            us[lev] = smooth(us[lev], rhss[lev], lev, nu1)
            res = residual(us[lev], rhss[lev], lev)
            rhss[lev + 1] = restrict(res, lev)
            us[lev + 1] = jnp.zeros_like(rhss[lev + 1])
        us[L - 1] = smooth(us[L - 1], rhss[L - 1], L - 1, coarse_sweeps)
        for lev in range(L - 2, -1, -1):
            u_l = us[lev] + prolong(us[lev + 1], lev)
            us[lev] = smooth(u_l, rhss[lev], lev, nu2)
        return us[0]

    target = target_ref[0, 0]
    u0 = u_ref[:]
    res0 = jnp.max(jnp.abs(residual(u0, rhs0, 0)))

    def cond(state):
        _, resnorm, it = state
        return (resnorm > target) & (it < max_iters)

    def body(state):
        u, _, it = state
        u = vcycle(u)
        resnorm = jnp.max(jnp.abs(residual(u, rhs0, 0)))
        return u, resnorm, it + 1

    u, _, _ = jax.lax.while_loop(
        cond, body, (u0, res0, jnp.zeros((), jnp.int32)))
    out_ref[:] = u


class FusedMG:
    """Constructed from a fields.multigrid.MultiGrid instance; builds the
    padded per-level coefficient/mask/transfer operands once and reuses
    them across jit."""

    def __init__(self, mg, nchan: int):
        assert not mg.cell_centered, "fused path is node-centered only"
        self.mg = mg
        self.C = nchan
        self.L = mg.nlevels
        self.facs = tuple(mg.facs)
        rdt = np.float32 if mg.dtype in (jnp.float32, jnp.complex64) \
            else np.float64
        tile = 8 if rdt == np.float32 else 8  # f32/f64 sublane tile
        self.pshapes = [( _pad_dim(ny, tile), _pad_dim(nx, 128))
                        for ny, nx in mg.shapes]
        self.interior = []
        for (ny, nx), (pny, pnx) in zip(mg.shapes, self.pshapes):
            iy, ix = np.mgrid[0:pny, 0:pnx]
            inside = (iy < ny) & (ix < nx)
            self.interior.append(jnp.asarray(inside.astype(rdt)))
        self.Ryp = []
        self.Rxp = []
        for lev in range(self.L - 1):
            fy, fx = self.pshapes[lev]
            cy, cx = self.pshapes[lev + 1]
            ry = np.zeros((cy, fy), rdt)
            rx = np.zeros((cx, fx), rdt)
            ry[:mg.Ry_np[lev].shape[0], :mg.Ry_np[lev].shape[1]] = \
                mg.Ry_np[lev]
            rx[:mg.Rx_np[lev].shape[0], :mg.Rx_np[lev].shape[1]] = \
                mg.Rx_np[lev]
            self.Ryp.append(jnp.asarray(ry))
            self.Rxp.append(jnp.asarray(rx))

    def _pad(self, a, lev):
        ny, nx = self.mg.shapes[lev]
        pny, pnx = self.pshapes[lev]
        pad = [(0, 0)] * (a.ndim - 2) + [(0, pny - ny), (0, pnx - nx)]
        return jnp.pad(a, pad)

    def solve(self, u0, rhs, acf, tol_rel=1e-4, tol_abs=0.0, max_iters=40,
              nu1=2, nu2=2, coarse_sweeps=8, interpret=False):
        """Same contract as MultiGrid.solve (real systems)."""
        mg = self.mg
        squeeze = u0.ndim == 2
        if squeeze:
            u0, rhs = u0[None], rhs[None]
        assert u0.shape[0] == self.C
        dt = u0.dtype
        acfs = mg._coarsen_acf(jnp.asarray(acf, dt))
        invd, dma = [], []
        for lev in range(self.L):
            d = (mg.diags[lev] - acfs[lev]) * jnp.ones(mg.shapes[lev], dt)
            dmap = self._pad(d, lev)
            interior = self.interior[lev].astype(dt)
            invd.append(jnp.where(interior > 0, 1.0 / jnp.where(
                dmap == 0, 1.0, dmap), 0.0) * interior)
            dma.append(dmap * interior)

        # convergence target, matching MultiGrid.solve / hpmg
        res0 = rhs - mg.apply_op(u0, acfs[0], 0)
        target = jnp.maximum(
            tol_abs, jnp.maximum(tol_rel, 1e-16)
            * jnp.maximum(jnp.max(jnp.abs(res0)), jnp.max(jnp.abs(rhs))))
        target = jnp.asarray(target, dt).reshape(1, 1)

        u0p = self._pad(u0, 0)
        rhsp = self._pad(rhs, 0)
        operands = [target, u0p, rhsp] + invd + dma + self.Ryp + self.Rxp
        kern = functools.partial(
            _mg_kernel, L=self.L,
            facs=self.facs, nu1=nu1, nu2=nu2, coarse_sweeps=coarse_sweeps,
            max_iters=max_iters, C=self.C, interpret=interpret)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(operands) - 1)
        up = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(u0p.shape, dt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(*operands)
        u = up[:, :mg.shapes[0][0], :mg.shapes[0][1]]
        return u[0] if squeeze else u
