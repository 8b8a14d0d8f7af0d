"""Op-level profile of one banded_deposit / banded_gather_main call.

Uses the position-based in-kernel-weights API (pass guard-offset ym/xm
cell positions plus the shape order; B-splines are computed inside the
chunk scan — see tools/bench_banded.py).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from hipace_tpu.ops.banded import banded_deposit, banded_gather_main
from hipace_tpu.ops.shape import shape_weights
from profile_slice import summarize

N, NXY, G, order = 1048576, 1023, 3, 2
NY = NX = NXY + 2 * G
key = jax.random.PRNGKey(0)
kx, ky = jax.random.split(key)
xm = jax.random.uniform(kx, (N,), jnp.float32, 0.0, float(NXY)) + G
ym = jax.random.uniform(ky, (N,), jnp.float32, 0.0, float(NXY)) + G
# row-sort (the production kernels require iy0-sorted input)
perm = jnp.argsort(shape_weights(ym, order)[0])
xm, ym = xm[perm], ym[perm]
vals = jnp.stack([xm, ym, xm * ym, xm + ym, xm - ym, xm * xm], axis=-1)
F0 = jnp.zeros((6, NY, NX), jnp.float32)
stack = jnp.zeros((NY, NX, 5), jnp.float32)

W, K = 32, 8192
r = banded_deposit(F0, ym, xm, vals, NY, NX, order, W=W, K=K)
float(jnp.sum(r[0]))
g = banded_gather_main(stack, ym, xm, NY, NX, order, W=W, K=K)
float(jnp.sum(g[0]))
with jax.profiler.trace("/tmp/banded_trace"):
    for _ in range(5):
        r = banded_deposit(F0, ym, xm, vals, NY, NX, order, W=W, K=K)
    float(jnp.sum(r[0]))
    for _ in range(5):
        g = banded_gather_main(stack, ym, xm, NY, NX, order, W=W, K=K)
    float(jnp.sum(g[0]))
summarize("/tmp/banded_trace", top=25)
