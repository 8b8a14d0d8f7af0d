"""Pallas TPU deposit/gather kernels with VMEM-resident fields.

Round-3 rewrite of the banded MXU kernels (ops/banded.py) as real Pallas
kernels. The XLA version materializes a (K, NX) one-hot matrix per chunk in
HBM (~8.6 GB/slice/op at 1023^2) and is pinned to that memory floor; here
the weight matrices live only in VMEM and the whole field stack is
VMEM-resident (v5e has ~128 MB of VMEM), so HBM traffic drops to the
particle data itself (~30 MB/slice/op) and the MXU work shrinks from
(K, NX) one-hots to (S, WXS) windows.

Design (TPU-native equivalent of the reference's shared-memory tiled
deposition, ref /root/reference/src/particles/deposition/DepositionUtil.H:
40-120):

- Particles arrive stripe-snake sorted (pipeline/step.py _row_sort with
  stripe_h = h): stripes of h rows, x-ascending boustrophedon, so a
  sub-chunk of S consecutive particles spans <= 2 stripes in y and a
  contiguous x-range.
- Grid over sub-chunks of S particles. Per-sub-chunk window anchors
  (ay, ax) are computed OUTSIDE the kernel (cheap XLA segment mins) and
  scalar-prefetched. ay is 8-aligned; ax is UNALIGNED — Mosaic requires
  dynamic lane offsets to be 128-aligned, so the kernel computes against
  the narrow unaligned window and lane-rotates the result into a
  128-aligned store window with pltpu.roll ("roll trick": halves the
  weight-matrix build + dot cost vs a 128-aligned compute window).
- In-kernel, the shape factors are evaluated DIRECTLY at every window
  position (u = pos - col) exploiting the B-spline's compact support —
  no tap loop, no one-hot compares. Weight matrices are built transposed,
  (W, S) and (WXS, S), with particles on lanes, matching the natural
  layout of the (1, S) position rows (no in-kernel transposes).
- One MXU contraction per sub-chunk: deposit contrib (C*W, WXS) =
  [WyT x values] (C*W, S) . WxT (WXS, S)^T; gather tmp (C*W, S) =
  window (C*W, WXS) . WxT.
- The deposit accumulator / gather field stack is a single VMEM-resident
  (C, NYP, NXP) block across all grid steps (output revisiting).
- f32 matmul precision: the MXU is bf16-native. "bf16x3" (default) splits
  both operands into bf16 hi+lo and sums 3 passes (~2e-6 relative, the
  classic f32-emulation trick); "highest" uses Mosaic's 6-pass f32;
  "bf16" is the raw 1-pass mode (~4e-3 relative). The dots are ~0.3 ms
  per pass at 1M particles — the VPU weight build dominates, which is
  why WXS defaults small (128).

Exactness: lanes whose x-taps overflow the narrow window (extreme
transverse density gradients, e.g. across a blown-out cavity) are handled
IN-KERNEL by a predicated full-row-width fallback dot — exact and paid
only by sub-chunks that need it. Lanes whose y-taps overflow W (possible
only from transverse motion after the sort, or sort_period > 1 drift) are
patched by a caller-side 0/1-trip corrective pass. Nothing is ever
dropped (matching ref SliceSort/DepositionUtil).

W / h requirement: a sub-chunk spans <= 2 stripes; with 8-aligned anchors
the worst-case row span is 2h + (m-1) + 8 <= W for stencil taps m <= 6
(order 3, centered derivative), so the default (h=8, W=32) is exact for
every supported order/deriv_type at sort time (the corrective pass covers
post-push drift).

The kernels compile for TPU; on CPU (fp64 checksum tests) the wrappers
run in Pallas interpret mode, which follows jnp semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shape import _bspline, _bspline_deriv, _leftmost

# window defaults, measured on v5e at 1023^2 / 1M particles
DEF_W = 32
DEF_WXS = 128
DEF_S = 512
DEF_H = 8


# ----------------------------------------------------------------------
# shape-factor evaluation at window positions (direct, no tap loop)
# ----------------------------------------------------------------------
def _ntaps(order, deriv_type):
    return order + 1 if deriv_type < 0 else order + deriv_type + 1


def _i0(xm, order, deriv_type):
    """Leftmost stencil index (matches ops/shape.py)."""
    if deriv_type in (-1, 0):
        return _leftmost(xm, order)
    if deriv_type == 1:
        return _leftmost(xm, order + 1)
    if deriv_type == 2:
        return _leftmost(xm, order) - 1
    raise ValueError(f"unsupported deriv_type {deriv_type}")


def _wfun(u, order, deriv_type, kind):
    """Weight evaluated at offset u = pos - cell, valid at ANY cell (the
    compact support covers the stencil).  kind "w" is the order-p shape;
    "dw" the derivative factor of the given type (ops/shape.py
    shape_weights_derivative, ref ShapeFactors.H:203-466)."""
    if kind == "w":
        return _bspline(u, order)
    if deriv_type == 0:
        return -_bspline_deriv(u, order)
    if deriv_type == 1:
        return -_bspline_deriv(u, order + 1)
    if deriv_type == 2:
        # w_{i+1} = B_p(x - c_{i+1}) = B_p(u - 1) as a function of this
        # cell's offset u: dxf = (B_p(u - 1) - B_p(u + 1)) / 2
        return 0.5 * (_bspline(u - 1.0, order) - _bspline(u + 1.0, order))
    raise ValueError(f"unsupported deriv_type {deriv_type}")


def _wmat(pos, rel_iota, base, order, deriv_type, kind):
    """(Wdim, S) weight matrix: rows = window offsets, lanes = particles.
    pos (1, S) cell positions; rel_iota (Wdim, S) int iota over rows;
    base scalar-or-(1, S) int window origin (anchor)."""
    u = pos - (rel_iota + base).astype(pos.dtype)
    return _wfun(u, order, deriv_type, kind)


# ----------------------------------------------------------------------
# anchors + masks (shared by kernels and the corrective pass)
# ----------------------------------------------------------------------
def _pad_shape(NY, NX):
    return ((NY + 7) // 8) * 8, ((NX + 127) // 128) * 128


def live_threshold(NY):
    """Live-lane predicate threshold: lanes with guard-offset cell position
    ym below this are treated as live. Shared by the kernels
    (_anchors_wide / kernel bodies, which see PADDED grids) and the
    stripe-sort key builders (beam.py _stripe_key), so sort-time
    classification and in-kernel classification can never disagree."""
    return 1.5 * _pad_shape(NY, 1)[0]


def _superchunk(N, S):
    """Largest multiple of S that divides N, capped at 16*S (corrective
    pass granularity)."""
    nsub = N // S
    c = 1
    for cand in range(2, 17):
        if nsub % cand == 0:
            c = cand
    return c * S


def _pad_particles(S, ym, xm, *arrays, sentinel):
    """Pad the particle dimension to a multiple of S with sentinel
    positions / zero values. Returns (npad, ym, xm, *arrays)."""
    N = ym.shape[0]
    npad = (-N) % S
    if npad == 0:
        return (0, ym, xm) + arrays
    ym = jnp.pad(ym, (0, npad), constant_values=sentinel)
    xm = jnp.pad(xm, (0, npad), constant_values=sentinel)
    out = tuple(jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, npad)])
                for a in arrays)
    return (npad, ym, xm) + out


def _anchors_wide(ym, xm, NYP, NXP, order, deriv_type, W, WXS, S):
    """Per-sub-chunk window anchors and the y-overflow masks.

    ym/xm (N,) guard-offset cell positions (invalid lanes = sentinel
    >= 2*NYP, sorted to the tail). Returns (ay (nsub,) 8-aligned,
    ax (nsub,) unaligned, ay2 (nsub,) 8-aligned second anchor,
    ywide (nsub, S) first-window miss, ywide2 (nsub, S) both-window
    miss, alive (nsub,)).

    ywide lanes (post-sort transverse motion or sort_period > 1 drift)
    cluster in adjacent rows, so a SECOND window anchored at their own
    min row covers almost all of them; the gather AND deposit kernels
    resolve ywide & ~ywide2 lanes in-kernel (the exact gather/scatter
    correctives these replace were the two dominant per-slice costs in
    the round-5 bench trace at ~10 ms a firing). Only ywide2 lanes go
    to the caller-side corrective pass. x-overflow lanes are handled
    in-kernel by the full-row fallback.
    """
    N = ym.shape[0]
    nsub = N // S
    m = _ntaps(order, deriv_type)
    ymc = ym.reshape(nsub, S)
    xmc = xm.reshape(nsub, S)
    iy0 = _i0(ymc, order, deriv_type)
    ix0 = _i0(xmc, order, deriv_type)
    live = ymc < 1.5 * NYP
    ay = jnp.min(jnp.where(live, iy0, NYP), axis=1)
    ay = jnp.clip((ay // 8) * 8, 0, max(NYP - W, 0))
    ax = jnp.min(jnp.where(live, ix0, NXP), axis=1)
    # the aligned store window [align128(ax), +WXS+128) must fit NXP;
    # with NXP/WXS multiples of 128, ax <= NXP-WXS-1 <=> align128(ax) <=
    # NXP-WXS-128, and the compute window still reaches the right edge
    ax = jnp.clip(ax, 0, max(NXP - WXS - 1, 0))
    rely = iy0 - ay[:, None]
    ywide = ((rely < 0) | (rely + m > W)) & live
    # second window from the missed lanes' own min row (handed to the
    # gather kernel as a prefetch scalar)
    ay2 = jnp.min(jnp.where(ywide, iy0, NYP), axis=1)
    ay2 = jnp.clip((ay2 // 8) * 8, 0, max(NYP - W, 0))
    rely2 = iy0 - ay2[:, None]
    ywide2 = ((rely2 < 0) | (rely2 + m > W)) & ywide
    # per-sub-chunk occupancy flag: all-sentinel sub-chunks (tail padding;
    # beam slices run at ~15% occupancy) skip the weight build + dots
    # entirely in-kernel
    alive = jnp.any(live, axis=1).astype(jnp.int32)
    return ay, ax, ay2, ywide, ywide2, alive


# ----------------------------------------------------------------------
# precision-controlled MXU dot
# ----------------------------------------------------------------------
def _dot_nt(A, B, precision, dims=(1, 1)):
    """Precision-controlled MXU dot; dims = (contract dim of A, of B).
    Default contracts the last (lane) dim of both operands."""
    dn = (((dims[0],), (dims[1],)), ((), ()))
    if A.dtype != jnp.float32 or precision == "highest":
        prec = (jax.lax.Precision.HIGHEST if A.dtype == jnp.float32
                else None)
        return jax.lax.dot_general(A, B, dn, precision=prec,
                                   preferred_element_type=A.dtype)
    if precision == "bf16":
        return jax.lax.dot_general(A, B, dn,
                                   preferred_element_type=jnp.float32)
    # bf16x3: split both operands hi/lo; drop the lo*lo term (~1e-13 rel)
    ah = A.astype(jnp.bfloat16)
    al = (A - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = B.astype(jnp.bfloat16)
    bl = (B - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _interp_default(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _roll_lanes(arr, shift, interpret):
    """Dynamic circular shift along the last (lane) axis."""
    if interpret:
        # pltpu.roll is TPU-only; jnp.roll matches its semantics
        return jnp.roll(arr, shift, axis=-1)
    return pltpu.roll(arr, shift=shift, axis=arr.ndim - 1)


# ----------------------------------------------------------------------
# deposit
# ----------------------------------------------------------------------
def _deposit_kernel(ay_ref, ax_ref, ay2_ref, alive_ref, ym_ref, xm_ref,
                    *refs, blocks, order, deriv_type, W, WXS, S,
                    NYP, NXP, precision, interpret):
    """blocks: static tuple of (ykind, xkind, ci) channel blocks sharing
    the particle positions. One dot per distinct xkind; channels land in
    block order. All-sentinel sub-chunks skip the body entirely."""
    C = sum(ci for _, _, ci in blocks)
    val_refs = refs[:C]
    out_ref = refs[C]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(alive_ref[i] > 0)
    def _():
        # anchors read inside the gate: dead sub-chunks skip even the
        # scalar loads
        ay = ay_ref[i]
        ax = ax_ref[i]
        ay2 = ay2_ref[i]
        _deposit_body(ay, ax, ay2, ym_ref, xm_ref, val_refs, out_ref,
                      blocks=blocks, order=order, deriv_type=deriv_type,
                      W=W, WXS=WXS, S=S, NYP=NYP, NXP=NXP,
                      precision=precision, interpret=interpret)


def _deposit_body(ay, ax, ay2, ym_ref, xm_ref, val_refs, out_ref, *,
                  blocks, order, deriv_type, W, WXS, S,
                  NYP, NXP, precision, interpret):
    C = sum(ci for _, _, ci in blocks)
    ym = ym_ref[0]                                   # (1, S)
    xm = xm_ref[0]
    m = _ntaps(order, deriv_type)
    iy0 = _i0(ym, order, deriv_type)
    ix0 = _i0(xm, order, deriv_type)
    rely = iy0 - ay
    relx = ix0 - ax
    live = ym < 1.5 * NYP
    oky = (rely >= 0) & (rely + m <= W) & live
    okx = (relx >= 0) & (relx + m <= WXS)

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, S), 0)
    xkinds = tuple(dict.fromkeys(xk for _, xk, _ in blocks))

    def contrib_for(lane_mask, xbase, width, aybase=None):
        """(C, W, width) contribution: one dot per distinct xkind,
        reassembled in block channel order. y-weights anchored at aybase
        (default: the primary anchor ay)."""
        mf = lane_mask.astype(ym.dtype)
        yb = ay if aybase is None else aybase
        cols = jax.lax.broadcasted_iota(jnp.int32, (width, S), 0)
        wyts = {}
        parts = {}
        c0 = 0
        for yk, xk, ci in blocks:
            if yk not in wyts:
                wyts[yk] = _wmat(ym, rows, yb, order, deriv_type, yk) * mf
            parts.setdefault(xk, []).append(
                (c0, [wyts[yk] * val_refs[c][0]
                      for c in range(c0, c0 + ci)]))
            c0 += ci
        pieces = [None] * len(blocks)
        for xk in xkinds:
            wxt = _wmat(xm, cols, xbase, order, deriv_type, xk)
            A = jnp.concatenate(sum((rows_ for _, rows_ in parts[xk]),
                                    []), axis=0)
            out = _dot_nt(A, wxt, precision)          # (Cg*W, width)
            r0 = 0
            for bi, (yk2, xk2, ci) in enumerate(blocks):
                if xk2 != xk:
                    continue
                pieces[bi] = out[r0:r0 + ci * W].reshape(ci, W, width)
                r0 += ci * W
        return jnp.concatenate(pieces, axis=0)        # (C, W, width)

    def deposit_y2(ymiss):
        """Second-window pass: lanes the primary y-window missed deposit
        into a W-row window anchored at their own min row (ay2,
        precomputed in _anchors_wide), full row width. The exact-scatter
        corrective this replaces fired ~13 superchunks/slice at ~10 ms a
        firing in the round-5 bench trace (fusion.73 = the C=13 fused
        plasma deposit's corrective scatter); this pass is one extra
        predicated MXU dot (~20 us). Residual lanes (span > W even from
        ay2) stay masked for the wrapper's corrective (ywide2)."""
        rely2 = iy0 - ay2
        oky2 = (rely2 >= 0) & (rely2 + m <= W) & ymiss
        c2 = contrib_for(oky2, 0, NXP, aybase=ay2)
        ay2d = pl.multiple_of(ay2, 8)
        cur = out_ref[:, pl.ds(ay2d, W), :]
        out_ref[:, pl.ds(ay2d, W), :] = cur + c2

    ayd = pl.multiple_of(ay, 8)
    full_row = WXS >= NXP
    if full_row:
        # narrow grids: one full-width window, no roll, no x fallback
        contrib = contrib_for(oky, 0, NXP)
        cur = out_ref[:, pl.ds(ayd, W), :]
        out_ref[:, pl.ds(ayd, W), :] = cur + contrib
        ymiss = live & ~oky

        @pl.when(jnp.any(ymiss))
        def _():
            deposit_y2(ymiss)
        return

    contrib = contrib_for(oky & okx, ax, WXS)         # (C, W, WXS)
    # roll trick: rotate the narrow unaligned window into the 128-aligned
    # store window [axd, axd + WXS + 128)
    axd = pl.multiple_of((ax // 128) * 128, 128)
    shift = ax - axd                                  # in [0, 128)
    padded = jnp.concatenate(
        [contrib.reshape(C * W, WXS),
         jnp.zeros((C * W, 128), contrib.dtype)], axis=1)
    placed = _roll_lanes(padded, shift, interpret).reshape(C, W, WXS + 128)
    cur = out_ref[:, pl.ds(ayd, W), pl.ds(axd, WXS + 128)]
    out_ref[:, pl.ds(ayd, W), pl.ds(axd, WXS + 128)] = cur + placed

    # rare exact fallback: lanes whose x-taps overflow the narrow window
    # (extreme transverse density gradients) deposit into the FULL row
    # width of the y-window. Predicated: costs nothing unless a lane in
    # this sub-chunk needs it.
    misx = oky & ~okx

    @pl.when(jnp.any(misx))
    def _():
        c2 = contrib_for(misx, 0, NXP)
        cur = out_ref[:, pl.ds(ayd, W), :]
        out_ref[:, pl.ds(ayd, W), :] = cur + c2

    ymiss = live & ~oky

    @pl.when(jnp.any(ymiss))
    def _():
        deposit_y2(ymiss)


def _deposit_delta(ym, xm, val_list, NY, NX, order, deriv_type, blocks,
                   W, WXS, S, h, precision, interpret, anchors):
    """Raw kernel call: deposit the per-channel value rows -> delta grid
    (C, NY, NX). y-overflow lanes excluded (wrapper corrective pass)."""
    C = len(val_list)
    N = ym.shape[0]
    nsub = N // S
    NYP, NXP = _pad_shape(NY, NX)
    W = min(W, NYP)
    WXS = min(WXS, NXP)
    ay, ax, ay2, alive = anchors
    ymc = ym.reshape(nsub, 1, S)
    xmc = xm.reshape(nsub, 1, S)
    vcs = [v.reshape(nsub, 1, S) for v in val_list]

    spec = pl.BlockSpec((1, 1, S), lambda i, *_: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsub,),
        in_specs=[spec, spec] + [spec] * C,
        out_specs=pl.BlockSpec((C, NYP, NXP), lambda i, *_: (0, 0, 0)),
    )
    interp = _interp_default(interpret)
    kern = functools.partial(
        _deposit_kernel, blocks=blocks, order=order, deriv_type=deriv_type,
        W=W, WXS=WXS, S=S, NYP=NYP, NXP=NXP,
        precision=precision, interpret=interp)
    delta = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, NYP, NXP), val_list[0].dtype),
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )(ay, ax, ay2, alive, ymc, xmc, *vcs)
    return delta[:, :NY, :NX]


def _corrective_deposit(acc, ym, xm, val_list, ywide, NY, NX, order,
                        deriv_type, blocks, S):
    """Exact scatter-add of y-overflow lanes, grouped into superchunks of
    16 sub-chunks so the 0/1-trip cost stays per-superchunk (see
    ops/banded.py corrective pass)."""
    from .banded import _scatter_deposit_chunk
    N = ym.shape[0]
    K = _superchunk(N, S)
    nchunk = N // K
    ymc = ym.reshape(nchunk, K)
    xmc = xm.reshape(nchunk, K)
    vc = jnp.stack([v.reshape(nchunk, K) for v in val_list], axis=1)
    widec = ywide.reshape(nchunk, K)

    def corrective(state):
        acc, _ = state

        def cbody(a, chunk):
            cym, cxm, cv, cw = chunk

            def do(aa):
                off = 0
                for yk, xk, ci in blocks:
                    cvi = (cv[off:off + ci] * cw[None].astype(cv.dtype)).T
                    aa = aa.at[off:off + ci].set(_scatter_deposit_chunk(
                        aa[off:off + ci], cym, cxm, cvi, order,
                        deriv_type, yk, xk))
                    off += ci
                return aa

            a = jax.lax.cond(jnp.any(cw), do, lambda aa: aa, a)
            return a, None

        acc, _ = jax.lax.scan(cbody, acc, (ymc, xmc, vc, widec))
        return acc, jnp.zeros((), bool)

    acc, _ = jax.lax.while_loop(
        lambda s: s[1], corrective, (acc, jnp.any(ywide)))
    return acc


def _deposit_common(fields, ym, xm, val_list, NY, NX, order, deriv_type,
                    blocks, W, S, WXS, h, precision, interpret):
    val_list = list(val_list)
    pad = _pad_particles(S, ym, xm, *val_list, sentinel=2.0 * NY)
    ym, xm = pad[1], pad[2]
    val_list = list(pad[3:])
    NYP, NXP = _pad_shape(NY, NX)
    ay, ax, ay2, _ywide1, ywide, alive = _anchors_wide(
        ym, xm, NYP, NXP, order, deriv_type, min(W, NYP),
        min(WXS, NXP), S)
    delta = _deposit_delta(ym, xm, val_list, NY, NX, order, deriv_type,
                           blocks, W, WXS, S, h, precision,
                           interpret, (ay, ax, ay2, alive))
    acc = fields + delta
    acc = _corrective_deposit(acc, ym, xm, val_list, ywide, NY, NX, order,
                              deriv_type, blocks, S)
    return acc, jnp.zeros((), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "NY", "NX", "order", "deriv_type", "ykind", "xkind", "W", "S", "WXS",
    "h", "precision", "interpret"))
def pallas_deposit(fields, ym, xm, values_cn, NY, NX, order,
                   W=DEF_W, S=DEF_S, WXS=DEF_WXS, h=DEF_H,
                   deriv_type=-1, ykind="w", xkind="w",
                   precision="bf16x3", interpret=None):
    """Deposit values (C, N) into fields (C, NY, NX) at guard-offset cell
    positions ym/xm (invalid lanes >= 2*NY sentinel, sorted to the tail;
    stripe-snake sorted with stripe height h). Drop-in Pallas equivalent
    of ops/banded.py banded_deposit (values channel-MAJOR).
    Returns (fields, lost=0): overflow lanes are added exactly by the
    in-kernel fallback / corrective pass."""
    C = values_cn.shape[0]
    return _deposit_common(fields, ym, xm, [values_cn[c] for c in range(C)],
                           NY, NX, order, deriv_type, ((ykind, xkind, C),),
                           W, S, WXS, h, precision, interpret)


@functools.partial(jax.jit, static_argnames=(
    "ykinds", "NY", "NX", "order", "deriv_type", "W", "S", "WXS", "h",
    "precision", "interpret"))
def pallas_deposit_multi(fields, ym, xm, values_cn, ykinds, NY, NX, order,
                         deriv_type, W=DEF_W, S=DEF_S, WXS=DEF_WXS,
                         h=DEF_H, precision="bf16x3", interpret=None):
    """Deposit several y-weight/value channel blocks sharing ONE x weight
    matrix (Pallas equivalent of banded_deposit_multi; values channel-
    major). ykinds: static tuple of (kind, C_i), kind in {"w", "dw"}."""
    C = values_cn.shape[0]
    blocks = tuple((yk, "w", ci) for yk, ci in ykinds)
    return _deposit_common(fields, ym, xm, [values_cn[c] for c in range(C)],
                           NY, NX, order, deriv_type, blocks,
                           W, S, WXS, h, precision, interpret)


@functools.partial(jax.jit, static_argnames=(
    "blocks", "NY", "NX", "order", "deriv_type", "W", "S", "WXS", "h",
    "precision", "interpret"))
def pallas_deposit_blocks(fields, ym, xm, values_cn, blocks, NY, NX,
                          order, deriv_type, W=DEF_W, S=DEF_S,
                          WXS=DEF_WXS, h=DEF_H, precision="bf16x3",
                          interpret=None):
    """Fully fused deposit of channel blocks with per-block (ykind, xkind)
    weight selection, sharing ONE pass over the particle positions —
    e.g. the explicit path's main currents + Sx/Sy coefficient channels
    (w,w) + dwy channels (dw,w) + dwx channels (w,dw) in a single kernel.
    blocks: static tuple of (ykind, xkind, C_i)."""
    C = values_cn.shape[0]
    return _deposit_common(fields, ym, xm, [values_cn[c] for c in range(C)],
                           NY, NX, order, deriv_type, blocks,
                           W, S, WXS, h, precision, interpret)


# ----------------------------------------------------------------------
# fused main-fields gather
# ----------------------------------------------------------------------
def _gather_main_kernel(ay_ref, ax_ref, ay2_ref, alive_ref, ym_ref, xm_ref,
                        stack_ref, exmby_ref, eypbx_ref, ez_ref, bx_ref,
                        by_ref, bz_ref, *, order, W, WXS, S, NYP, NXP,
                        precision, interpret):
    i = pl.program_id(0)
    out_refs = (exmby_ref, eypbx_ref, ez_ref, bx_ref, by_ref, bz_ref)

    @pl.when(alive_ref[i] == 0)
    def _():
        for ref in out_refs:
            ref[0] = jnp.zeros_like(ref[0])

    @pl.when(alive_ref[i] > 0)
    def _():
        ay = ay_ref[i]
        ax = ax_ref[i]
        ay2 = ay2_ref[i]
        _gather_main_body(ay, ax, ay2, ym_ref, xm_ref, stack_ref,
                          out_refs, order=order, W=W, WXS=WXS, S=S,
                          NYP=NYP, NXP=NXP, precision=precision,
                          interpret=interpret)


def _gather_main_body(ay, ax, ay2, ym_ref, xm_ref, stack_ref,
                      out_refs, *, order, W, WXS, S, NYP, NXP, precision,
                      interpret):
    (exmby_ref, eypbx_ref, ez_ref, bx_ref, by_ref, bz_ref) = out_refs
    ym = ym_ref[0]
    xm = xm_ref[0]
    m = _ntaps(order, 1)
    iy0 = _i0(ym, order, 1)
    ix0 = _i0(xm, order, 1)
    rely = iy0 - ay
    relx = ix0 - ax
    live = ym < 1.5 * NYP
    oky = (rely >= 0) & (rely + m <= W) & live
    okx = (relx >= 0) & (relx + m <= WXS)

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, S), 0)
    ayd = pl.multiple_of(ay, 8)
    full_row = WXS >= NXP

    def emit(lane_mask, win, xbase, width, first, aybase=None):
        """Gather against win (5, W, width) with x-weights anchored at
        xbase and y-weights at aybase (default: the primary anchor ay);
        write lanes in lane_mask (overwrite others when first)."""
        mf = lane_mask.astype(ym.dtype)
        yb = ay if aybase is None else aybase
        # nodal (deriv_type=1) shape + derivative factors, like
        # banded_gather_main (ref FieldGather.H:45-97)
        wyt = _wmat(ym, rows, yb, order, 1, "w") * mf
        dwyt = _wmat(ym, rows, yb, order, 1, "dw") * mf
        cols = jax.lax.broadcasted_iota(jnp.int32, (width, S), 0)
        wxt = _wmat(xm, cols, xbase, order, 1, "w")
        dwxt = _wmat(xm, cols, xbase, order, 1, "dw")
        win2 = win.reshape(5 * W, width)
        tmp = _dot_nt(win2, wxt, precision, dims=(1, 0)).reshape(5, W, S)
        tmp_dx = _dot_nt(win[0], dwxt, precision, dims=(1, 0))   # (W, S)
        e = jnp.sum(wyt * tmp_dx, axis=0, keepdims=True)
        p = jnp.sum(dwyt * tmp[0], axis=0, keepdims=True)
        rs = [jnp.sum(wyt * tmp[c], axis=0, keepdims=True)
              for c in range(1, 5)]
        refs = (exmby_ref, eypbx_ref, ez_ref, bx_ref, by_ref, bz_ref)
        for ref, val in zip(refs, (e, p) + tuple(rs)):
            ref[0] = val if first else jnp.where(lane_mask, val, ref[0])

    def emit_y2(ymiss):
        """Second-window pass: lanes the primary y-window missed
        (post-sort motion / sort-period drift) gather against a second
        W-row window anchored at their own min row (ay2, precomputed in
        _anchors_wide), full row width. Resolves nearly all former
        corrective-pass lanes in-kernel — the exact-gather corrective
        was the top per-slice cost in the round-5 bench trace. Residual
        lanes (span > W even from ay2) stay masked for the wrapper's
        corrective (ywide2)."""
        rely2 = iy0 - ay2
        oky2 = (rely2 >= 0) & (rely2 + m <= W) & ymiss
        ay2d = pl.multiple_of(ay2, 8)
        emit(oky2, stack_ref[:, pl.ds(ay2d, W), :], 0, NXP, False,
             aybase=ay2)

    if full_row:
        win = stack_ref[:, pl.ds(ayd, W), :]
        emit(oky, win, 0, NXP, True)
        ymiss = live & ~oky

        @pl.when(jnp.any(ymiss))
        def _():
            emit_y2(ymiss)
        return

    # roll trick: read the 128-aligned (WXS + 128)-wide window and rotate
    # it so column 0 lines up with the unaligned anchor ax
    axd = pl.multiple_of((ax // 128) * 128, 128)
    shift = ax - axd
    win = stack_ref[:, pl.ds(ayd, W), pl.ds(axd, WXS + 128)]
    winr = _roll_lanes(win.reshape(5 * W, WXS + 128),
                       WXS + 128 - shift, interpret)
    winr = winr[:, :WXS].reshape(5, W, WXS)
    emit(oky & okx, winr, ax, WXS, True)

    # rare exact fallback (see _deposit_kernel)
    misx = oky & ~okx

    @pl.when(jnp.any(misx))
    def _():
        emit(misx, stack_ref[:, pl.ds(ayd, W), :], 0, NXP, False)

    ymiss = live & ~oky

    @pl.when(jnp.any(ymiss))
    def _():
        emit_y2(ymiss)


@functools.partial(jax.jit, static_argnames=(
    "NY", "NX", "order", "W", "S", "WXS", "h", "precision", "interpret"))
def pallas_gather_main(stack, ym, xm, NY, NX, order,
                       W=DEF_W, S=DEF_S, WXS=DEF_WXS, h=DEF_H,
                       precision="bf16x3", interpret=None):
    """Fused main-fields gather (Pallas equivalent of banded_gather_main).

    stack: (5, NY, NX) channel-MAJOR with 0 = Psi, 1..4 = Ez, Bx, By, Bz.
    Returns (exmby_raw, eypbx_raw, ez, bx, by, bz, lost=0); the caller
    multiplies the raw Psi derivatives by 1/dx, 1/dy. Overflow lanes are
    patched exactly by the in-kernel fallback / corrective pass."""
    N_out = ym.shape[0]
    _np, ym, xm = _pad_particles(S, ym, xm, sentinel=2.0 * NY)
    N = ym.shape[0]
    nsub = N // S
    NYP, NXP = _pad_shape(NY, NX)
    W = min(W, NYP)
    WXS = min(WXS, NXP)
    ay, ax, ay2, _ywide1, ywide, alive = _anchors_wide(
        ym, xm, NYP, NXP, order, 1, W, WXS, S)
    stackp = jnp.pad(stack, ((0, 0), (0, NYP - NY), (0, NXP - NX)))
    ymc = ym.reshape(nsub, 1, S)
    xmc = xm.reshape(nsub, 1, S)

    spec = pl.BlockSpec((1, 1, S), lambda i, *_: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsub,),
        in_specs=[spec, spec,
                  pl.BlockSpec((5, NYP, NXP), lambda i, *_: (0, 0, 0))],
        out_specs=[spec] * 6,
    )
    interp = _interp_default(interpret)
    kern = functools.partial(_gather_main_kernel, order=order, W=W,
                             WXS=WXS, S=S, NYP=NYP, NXP=NXP,
                             precision=precision, interpret=interp)
    dt = stack.dtype
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nsub, 1, S), dt)] * 6,
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )(ay, ax, ay2, alive, ymc, xmc, stackp)
    exmby, eypbx = outs[0].reshape(N), outs[1].reshape(N)
    rest = jnp.stack([o.reshape(N) for o in outs[2:]], axis=-1)

    # corrective pass: patch y-overflow lanes (post-sort motion / sort
    # drift) with the exact elementwise gather in a 0/1-trip while_loop
    from .banded import _elem_gather_chunk
    K = _superchunk(N, S)
    nchunk = N // K
    stack_l = jnp.moveaxis(stack, 0, -1)               # (NY, NX, 5)
    ymk = ym.reshape(nchunk, K)
    xmk = xm.reshape(nchunk, K)
    widek = ywide.reshape(nchunk, K)
    restk = rest.reshape(nchunk, K, 4)
    ek = exmby.reshape(nchunk, K)
    pk = eypbx.reshape(nchunk, K)

    def corrective(state):
        ek, pk, restk, _ = state

        def cbody(_, chunk):
            cym, cxm, cwide, pe, pp, pr = chunk

            def patch(args):
                pe, pp, pr = args
                out, fe, fp = _elem_gather_chunk(stack_l, cym, cxm, order,
                                                 1, main=True)
                return (jnp.where(cwide, fe, pe),
                        jnp.where(cwide, fp, pp),
                        jnp.where(cwide[:, None], out[:, 1:], pr))

            return None, jax.lax.cond(jnp.any(cwide), patch, lambda a: a,
                                      (pe, pp, pr))

        _, (ek, pk, restk) = jax.lax.scan(
            cbody, None, (ymk, xmk, widek, ek, pk, restk))
        return ek, pk, restk, jnp.zeros((), bool)

    ek, pk, restk, _ = jax.lax.while_loop(
        lambda s: s[3], corrective, (ek, pk, restk, jnp.any(ywide)))
    rest = restk.reshape(N, 4)[:N_out]
    lost = jnp.zeros((), jnp.int32)
    return (ek.reshape(N)[:N_out], pk.reshape(N)[:N_out],
            rest[:, 0], rest[:, 1], rest[:, 2], rest[:, 3], lost)
