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
    xm = (x - g.x_pos_offset) / g.dx
    ym = (y - g.y_pos_offset) / g.dy
    ix0, wx = shape_weights(xm, order)
    iy0, wy = shape_weights(ym, order)
    iy0 = iy0 + G
    ix0 = ix0 + G
    # sort by row
    perm = jnp.argsort(iy0)
    return g, x[perm], y[perm], iy0[perm], ix0[perm], wy[perm], wx[perm]


def test_banded_deposit_matches_scatter():
    g, x, y, iy0, ix0, wy, wx = _setup()
    NY, NX = g.slice_shape
    n = x.shape[0]
    vals = jnp.stack([jnp.sin(x), jnp.cos(y), x * y], axis=-1)
    F0 = jnp.zeros((3, NY, NX), jnp.float64)
    ref = deposit_multi(F0, x, y, [vals[:, 0], vals[:, 1], vals[:, 2]], g, 2)
    # pad to chunk
    K = 256
    rem = (-n) % K
    pad = lambda a, fill=0: jnp.concatenate(
        [a, jnp.full((rem,) + a.shape[1:], fill, a.dtype)])
    out, lost = banded_deposit(F0, pad(iy0, NY - 1), pad(wy), pad(ix0),
                               pad(wx), pad(vals), NY, NX, W=16, K=K)
    assert int(lost) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_banded_gather_matches_indexed():
    g, x, y, iy0, ix0, wy, wx = _setup(seed=3)
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
    pad = lambda a, fill=0: jnp.concatenate(
        [a, jnp.full((rem,) + a.shape[1:], fill, a.dtype)])
    stack = jnp.stack([fields["A"], fields["B"]], axis=-1)
    out = banded_gather(stack, pad(iy0, NY - 1), pad(wy), pad(ix0), pad(wx),
                        NY, NX, W=16, K=K)[:n]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ref[0]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(ref[1]),
                               rtol=1e-12, atol=1e-12)


def test_banded_lost_counter():
    # artificially tiny window forces out-of-band drops to be counted
    g, x, y, iy0, ix0, wy, wx = _setup(n=512)
    NY, NX = g.slice_shape
    vals = jnp.ones((512, 1), jnp.float64)
    F0 = jnp.zeros((1, NY, NX), jnp.float64)
    out, lost = banded_deposit(F0, iy0, wy, ix0, wx, vals, NY, NX, W=4,
                               K=512)
    assert int(lost) > 0
