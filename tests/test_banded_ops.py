"""Banded matmul deposit/gather vs the scatter/gather reference ops."""

import numpy as np
import jax
import jax.numpy as jnp

from hipace_tpu.geometry import Geometry
from hipace_tpu.ops.shape import shape_weights
from hipace_tpu.ops.deposit import deposit_multi
from hipace_tpu.ops.gather import gather_fields
from hipace_tpu.ops.banded import banded_deposit, banded_gather


def _setup(n=3000, order=2, seed=0):
    g = Geometry(n_cell=(48, 40, 8), prob_lo=(-6, -5, -2), prob_hi=(6, 5, 2))
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (n,), jnp.float64, -5.8, 5.8)
    y = jax.random.uniform(jax.random.fold_in(key, 1), (n,), jnp.float64,
                           -4.8, 4.8)
    G = g.nguards
    # guard-offset cell positions (the banded kernels' input contract)
    xm = (x - g.x_pos_offset) / g.dx + G
    ym = (y - g.y_pos_offset) / g.dy + G
    # sort by row
    iy0 = shape_weights(ym, order)[0]
    perm = jnp.argsort(iy0)
    return g, x[perm], y[perm], ym[perm], xm[perm]


def _pad(a, rem, fill):
    return jnp.concatenate(
        [a, jnp.full((rem,) + a.shape[1:], fill, a.dtype)])


def test_banded_deposit_matches_scatter():
    g, x, y, ym, xm = _setup()
    NY, NX = g.slice_shape
    n = x.shape[0]
    vals = jnp.stack([jnp.sin(x), jnp.cos(y), x * y], axis=-1)
    F0 = jnp.zeros((3, NY, NX), jnp.float64)
    ref = deposit_multi(F0, x, y, [vals[:, 0], vals[:, 1], vals[:, 2]], g, 2)
    K = 256
    rem = (-n) % K
    out, lost = banded_deposit(F0, _pad(ym, rem, 2 * NY),
                               _pad(xm, rem, 2 * NX), _pad(vals, rem, 0),
                               NY, NX, 2, W=16, K=K)
    assert int(lost) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_banded_gather_matches_indexed():
    g, x, y, ym, xm = _setup(seed=3)
    NY, NX = g.slice_shape
    n = x.shape[0]
    key = jax.random.PRNGKey(9)
    fields = {
        "A": jax.random.normal(key, (NY, NX), jnp.float64),
        "B": jax.random.normal(jax.random.fold_in(key, 1), (NY, NX),
                               jnp.float64),
    }
    ref = gather_fields(x, y, fields, ["A", "B"], g, 2)
    K = 256
    rem = (-n) % K
    stack = jnp.stack([fields["A"], fields["B"]], axis=-1)
    out = banded_gather(stack, _pad(ym, rem, 2 * NY), _pad(xm, rem, 2 * NX),
                        NY, NX, 2, W=16, K=K)[:n]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ref[0]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(ref[1]),
                               rtol=1e-12, atol=1e-12)


def test_banded_wide_window_conserves_charge():
    # a too-small window used to drop contributions; the scatter fallback
    # now conserves total deposited charge exactly
    g, x, y, ym, xm = _setup(n=512)
    NY, NX = g.slice_shape
    vals = jnp.ones((512, 1), jnp.float64)
    F0 = jnp.zeros((1, NY, NX), jnp.float64)
    out, lost = banded_deposit(F0, ym, xm, vals, NY, NX, 2, W=4, K=512)
    assert int(lost) == 0
    np.testing.assert_allclose(float(jnp.sum(out)), 512.0, rtol=1e-12)


def test_banded_deposit_wide_chunk_fallback():
    """Chunks spanning more than W rows take the exact scatter fallback
    instead of dropping contributions (sparse rows under absorbing
    boundaries, ref DepositionUtil/SliceSort never drop)."""
    g, x, y, ym, xm = _setup(n=512)
    NY, NX = g.slice_shape
    vals = jnp.stack([jnp.sin(x), jnp.cos(y), x * y], axis=-1)
    F0 = jnp.zeros((3, NY, NX), jnp.float64)
    ref = deposit_multi(F0, x, y, [vals[:, 0], vals[:, 1], vals[:, 2]], g, 2)
    # K = whole array, W tiny: every chunk is wide -> pure fallback
    out, lost = banded_deposit(F0, ym, xm, vals, NY, NX, 2, W=4, K=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_banded_deposit_derivative_kinds():
    """ykind/xkind select the derivative factors; must match an explicit
    dense wy (x) dwx accumulation."""
    from hipace_tpu.ops.shape import shape_weights_derivative
    g, x, y, ym, xm = _setup(n=512, order=2)
    NY, NX = g.slice_shape
    vals = jnp.stack([jnp.cos(x * y)], axis=-1)
    iy0, wy, dwy = shape_weights_derivative(ym, 2, 1)
    ix0, wx, dwx = shape_weights_derivative(xm, 2, 1)
    ref = np.zeros((NY, NX))
    jy = np.clip(np.asarray(iy0)[:, None, None]
                 + np.arange(4)[None, :, None], 0, NY - 1)
    jx = np.clip(np.asarray(ix0)[:, None, None]
                 + np.arange(4)[None, None, :], 0, NX - 1)
    w = np.asarray(wy)[:, :, None] * np.asarray(dwx)[:, None, :]
    np.add.at(ref, (jy, jx), w * np.asarray(vals[:, 0])[:, None, None])
    out, _ = banded_deposit(jnp.zeros((1, NY, NX), jnp.float64), ym, xm,
                            vals, NY, NX, 2, W=16, K=512, deriv_type=1,
                            ykind="w", xkind="dw")
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-12,
                               atol=1e-12)


def test_banded_gather_wide_chunk_fallback():
    g, x, y, ym, xm = _setup(n=512, seed=3)
    NY, NX = g.slice_shape
    key = jax.random.PRNGKey(9)
    stack = jax.random.normal(key, (NY, NX, 3), jnp.float64)
    fields = {f"c{i}": stack[:, :, i] for i in range(3)}
    ref = gather_fields(x, y, fields, ["c0", "c1", "c2"], g, 2)
    out = banded_gather(stack, ym, xm, NY, NX, 2, W=4, K=512)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out[:, i]),
                                   np.asarray(ref[i]),
                                   rtol=1e-12, atol=1e-12)
