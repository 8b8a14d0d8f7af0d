"""Banded matmul particle kernels: deposition and gather on the MXU.

XLA's scatter/gather lowers random particle access to ~20 ns/element on TPU
— 30x slower than everything else in the slice step. These kernels instead
express deposition and interpolation as dense one-hot matrix products over
*bands* of rows, the TPU-native equivalent of the reference's shared-memory
tile deposition (ref: /root/reference/src/particles/deposition/
DepositionUtil.H:40-120: sort by tile, accumulate in on-chip memory).

Particles must be pre-sorted by their leftmost row index iy0 (the caller
sorts once per slice, which also plays the role of the reference's
ReorderParticles). The sorted stream is processed in chunks of K; each chunk
deposits into / gathers from a W-row window anchored at its first particle's
row. Contributions that fall outside the window (only possible when a chunk
spans more than W - my rows, i.e. fewer than K/W particles per row) are
dropped and counted in `lost` — callers treat lost > 0 as a capacity error.

  deposit:  window += Wy^T (W x K) @ [values x Wx] (K x NX*C)   [MXU]
  gather:   tmp = Wy (K x W) @ window (W x NX*C)                 [MXU]
            out[k, c] = sum_i Wx[k, i] * tmp[k, i, c]            [batched dot]
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _onehot_w(rel, weights, width):
    """(K, width) matrix with `weights` placed at columns rel..rel+m-1."""
    K, m = weights.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, width), 1)
    out = jnp.zeros((K, width), weights.dtype)
    for a in range(m):
        out = out + weights[:, a:a + 1] * (cols == (rel + a)[:, None])
    return out


@partial(jax.jit, static_argnames=("W", "K", "NY", "NX"))
def banded_deposit(fields, iy0, wy, ix0, wx, values, NY, NX, W=16, K=512):
    """Deposit values (N, C) with separable weights into fields (C, NY, NX).

    iy0/ix0: leftmost padded-array indices (already offset by guards),
    sorted ascending in iy0. Returns (fields, lost_count).
    """
    C = fields.shape[0]
    N = iy0.shape[0]
    nchunk = N // K
    my = wy.shape[1]

    iy0c = iy0.reshape(nchunk, K)
    ix0c = ix0.reshape(nchunk, K)
    wyc = wy.reshape(nchunk, K, my)
    wxc = wx.reshape(nchunk, K, wx.shape[1])
    vc = values.reshape(nchunk, K, C)

    def body(carry, chunk):
        acc, lost = carry
        ciy0, cix0, cwy, cwx, cv = chunk
        anchor = jnp.clip(jnp.min(ciy0), 0, NY - W)
        rel = ciy0 - anchor
        ok = (rel >= 0) & (rel + my <= W)
        lost = lost + jnp.sum(~ok & (jnp.abs(cv).sum(axis=1) > 0)
                              ).astype(lost.dtype)
        Wy = _onehot_w(jnp.where(ok, rel, 0), cwy, W) \
            * ok[:, None].astype(cwy.dtype)
        # fold the (narrow) values into Wy: payload is (K, W*C), not NX-wide
        WyV = (Wy[:, :, None] * cv[:, None, :]).reshape(K, W * C)
        Wx = _onehot_w(cix0, cwx, NX)                      # (K, NX)
        contrib = jax.lax.dot_general(
            WyV, Wx, (((0,), (0,)), ((), ())),
            preferred_element_type=acc.dtype)              # (W*C, NX)
        contrib = contrib.reshape(W, C, NX)
        zero = jnp.zeros((), anchor.dtype)
        win = jax.lax.dynamic_slice(acc, (zero, anchor, zero), (C, W, NX))
        acc = jax.lax.dynamic_update_slice(
            acc, win + jnp.transpose(contrib, (1, 0, 2)), (zero, anchor, zero))
        return (acc, lost), None

    (acc, lost), _ = jax.lax.scan(
        body, (fields, jnp.zeros((), jnp.int32)),
        (iy0c, ix0c, wyc, wxc, vc))
    return acc, lost


@partial(jax.jit, static_argnames=("W", "K", "NY", "NX"))
def banded_gather(stack, iy0, wy, ix0, wx, NY, NX, W=16, K=512):
    """Gather stack (NY, NX, C) at separable-weight stencils -> (N, C).

    Same banding contract as banded_deposit. Out-of-window particles read
    garbage-free zeros (their Wy row is zeroed); the caller's lost counter
    from the paired deposit covers detection.
    """
    C = stack.shape[2]
    N = iy0.shape[0]
    nchunk = N // K
    my = wy.shape[1]

    iy0c = iy0.reshape(nchunk, K)
    ix0c = ix0.reshape(nchunk, K)
    wyc = wy.reshape(nchunk, K, my)
    wxc = wx.reshape(nchunk, K, wx.shape[1])

    def body(_, chunk):
        ciy0, cix0, cwy, cwx = chunk
        anchor = jnp.clip(jnp.min(ciy0), 0, NY - W)
        rel = ciy0 - anchor
        ok = (rel >= 0) & (rel + my <= W)
        Wy = _onehot_w(jnp.where(ok, rel, 0), cwy, W) \
            * ok[:, None].astype(cwy.dtype)
        zero = jnp.zeros((), anchor.dtype)
        win = jax.lax.dynamic_slice(
            stack, (anchor, zero, zero), (W, NX, C))
        # contract x FIRST so the intermediate is (K, W*C), never (K, NX*C)
        winx = jnp.transpose(win, (1, 0, 2)).reshape(NX, W * C)
        Wx = _onehot_w(cix0, cwx, NX)                      # (K, NX)
        tmp = jax.lax.dot_general(
            Wx, winx, (((1,), (0,)), ((), ())),
            preferred_element_type=win.dtype)              # (K, W*C)
        out = jnp.sum(Wy[:, :, None] * tmp.reshape(K, W, C), axis=1)
        return None, out

    _, outs = jax.lax.scan(body, None, (iy0c, ix0c, wyc, wxc))
    return outs.reshape(N, C)


@partial(jax.jit, static_argnames=("W", "K", "NY", "NX"))
def banded_deposit_multi(fields, iy0, ysets, ix0, wx, NY, NX, W=16, K=512):
    """Deposit several (y-weights, values) sets sharing ONE x one-hot.

    The (K, NX) one-hot matrix is the HBM-bandwidth cost of a banded
    deposit; any deposits with the same (ix0, wx) should share it. ysets is
    a tuple of (wy_i, values_i (N, C_i)); fields is (sum C_i, NY, NX) with
    the channel blocks in yset order. Returns (fields, lost).
    """
    C = fields.shape[0]
    N = iy0.shape[0]
    nchunk = N // K
    my = ysets[0][0].shape[1]

    iy0c = iy0.reshape(nchunk, K)
    ix0c = ix0.reshape(nchunk, K)
    wxc = wx.reshape(nchunk, K, wx.shape[1])
    ysc = tuple((wy.reshape(nchunk, K, my), v.reshape(nchunk, K, -1))
                for wy, v in ysets)

    def body(carry, chunk):
        acc, lost = carry
        ciy0, cix0, cwx = chunk[:3]
        cys = chunk[3:]
        anchor = jnp.clip(jnp.min(ciy0), 0, NY - W)
        rel = ciy0 - anchor
        ok = (rel >= 0) & (rel + my <= W)
        relc = jnp.where(ok, rel, 0)
        okf = ok[:, None].astype(cwx.dtype)
        blocks = []
        any_val = jnp.zeros((K,), bool)
        for i in range(0, len(cys), 2):
            cwy, cv = cys[i], cys[i + 1]
            Wy = _onehot_w(relc, cwy, W) * okf
            blocks.append((Wy[:, :, None] * cv[:, None, :]).reshape(
                K, W * cv.shape[1]))
            any_val = any_val | (jnp.abs(cv).sum(axis=1) > 0)
        lost = lost + jnp.sum(~ok & any_val).astype(lost.dtype)
        WyV = jnp.concatenate(blocks, axis=1)              # (K, W*C)
        Wx = _onehot_w(cix0, cwx, NX)                      # (K, NX)
        contrib = jax.lax.dot_general(
            WyV, Wx, (((0,), (0,)), ((), ())),
            preferred_element_type=acc.dtype)              # (W*C, NX)
        # each block's rows are (W, C_i)-ordered; bring to (C_total, W, NX)
        parts = []
        off = 0
        for i in range(1, len(cys), 2):
            ci = cys[i].shape[-1]
            parts.append(jnp.transpose(
                contrib[off:off + W * ci].reshape(W, ci, NX), (1, 0, 2)))
            off += W * ci
        contrib = jnp.concatenate(parts, axis=0)
        zero = jnp.zeros((), anchor.dtype)
        win = jax.lax.dynamic_slice(acc, (zero, anchor, zero), (C, W, NX))
        acc = jax.lax.dynamic_update_slice(acc, win + contrib,
                                           (zero, anchor, zero))
        return (acc, lost), None

    xs = (iy0c, ix0c, wxc) + tuple(a for pair in ysc for a in pair)
    (acc, lost), _ = jax.lax.scan(
        body, (fields, jnp.zeros((), jnp.int32)), xs)
    return acc, lost


@partial(jax.jit, static_argnames=("W", "K", "NY", "NX"))
def banded_gather_main(stack, iy0, wy, dwy, ix0, wx, dwx, NY, NX,
                       W=16, K=512):
    """Fused main-fields gather on the MXU (banded variant of
    gather_main_fields, ref FieldGather.H:45-97).

    stack: (NY, NX, 5) with channel 0 = Psi, 1..4 = Ez, Bx, By, Bz.
    wy/wx are the m-tap shapes, dwy/dwx the nodal derivative shapes (same
    leftmost index). Returns (exmby_raw, eypbx_raw, ez, bx, by, bz, lost)
    where the caller multiplies the raw Psi derivatives by 1/dx, 1/dy and
    lost counts in-range particles whose window overflowed (read zeros).
    """
    N = iy0.shape[0]
    nchunk = N // K
    my = wy.shape[1]

    iy0c = iy0.reshape(nchunk, K)
    ix0c = ix0.reshape(nchunk, K)
    wyc = wy.reshape(nchunk, K, my)
    dwyc = dwy.reshape(nchunk, K, my)
    wxc = wx.reshape(nchunk, K, wx.shape[1])
    dwxc = dwx.reshape(nchunk, K, dwx.shape[1])

    def body(lost, chunk):
        ciy0, cix0, cwy, cdwy, cwx, cdwx = chunk
        anchor = jnp.clip(jnp.min(ciy0), 0, NY - W)
        rel = ciy0 - anchor
        okb = (rel >= 0) & (rel + my <= W)
        # iy0 >= NY marks invalid lanes (sentinel), not window overflow
        lost = lost + jnp.sum(~okb & (ciy0 < NY)).astype(lost.dtype)
        ok = okb.astype(cwy.dtype)[:, None]
        relc = jnp.where(okb, rel, 0)
        Wy = _onehot_w(relc, cwy, W) * ok
        dWy = _onehot_w(relc, cdwy, W) * ok
        zero = jnp.zeros((), anchor.dtype)
        win = jax.lax.dynamic_slice(stack, (anchor, zero, zero), (W, NX, 5))
        winx = jnp.transpose(win, (1, 0, 2)).reshape(NX, W * 5)
        Wx = _onehot_w(cix0, cwx, NX)
        dWx = _onehot_w(cix0, cdwx, NX)
        tmp = jax.lax.dot_general(
            Wx, winx, (((1,), (0,)), ((), ())),
            preferred_element_type=win.dtype).reshape(K, W, 5)
        winx_psi = jnp.transpose(win[:, :, 0], (1, 0))      # (NX, W)
        tmp_dx = jax.lax.dot_general(
            dWx, winx_psi, (((1,), (0,)), ((), ())),
            preferred_element_type=win.dtype)               # (K, W)
        # the nodal derivative factors already carry the ExmBy = -dxPsi sign
        # convention (same as ops/gather.py gather_main_fields)
        exmby = jnp.sum(Wy * tmp_dx, axis=1)
        eypbx = jnp.sum(dWy * tmp[:, :, 0], axis=1)
        rest = jnp.sum(Wy[:, :, None] * tmp[:, :, 1:], axis=1)  # (K, 4)
        return lost, (exmby, eypbx, rest)

    lost, (exmby, eypbx, rest) = jax.lax.scan(
        body, jnp.zeros((), jnp.int32), (iy0c, ix0c, wyc, dwyc, wxc, dwxc))
    rest = rest.reshape(N, 4)
    return (exmby.reshape(N), eypbx.reshape(N),
            rest[:, 0], rest[:, 1], rest[:, 2], rest[:, 3], lost)


def pad_to_chunk(arrs: dict, N: int, K: int, pad_vals: dict):
    """Pad 1D/2D arrays to a multiple of K with given fill values."""
    rem = (-N) % K
    if rem == 0:
        return arrs, N
    out = {}
    for k, a in arrs.items():
        fill = pad_vals.get(k, 0)
        pad_shape = (rem,) + a.shape[1:]
        out[k] = jnp.concatenate(
            [a, jnp.full(pad_shape, fill, a.dtype)], axis=0)
    return out, N + rem
