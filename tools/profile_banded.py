"""Op-level profile of one banded_deposit / banded_gather_main call."""
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
x = jax.random.uniform(kx, (N,), jnp.float32, 0.0, float(NXY))
y = jax.random.uniform(ky, (N,), jnp.float32, 0.0, float(NXY))
ix0, wx = shape_weights(x, order, transposed=True)
iy0, wy = shape_weights(y, order, transposed=True)
ix0, iy0 = ix0 + G, iy0 + G
vals = jnp.stack([x, y, x*y, x+y, x-y, x*x], axis=0)
perm = jnp.argsort(iy0)
iy0, ix0 = iy0[perm], ix0[perm]
wy, wx, vals = wy[:, perm], wx[:, perm], vals[:, perm]
F0 = jnp.zeros((6, NY, NX), jnp.float32)
stack = jnp.zeros((NY, NX, 5), jnp.float32)

W, K = 16, 8192
r = banded_deposit(F0, iy0, wy, ix0, wx, vals, NY, NX, W=W, K=K)
float(jnp.sum(r[0]))
g = banded_gather_main(stack, iy0, wy, wy, ix0, wx, wx, NY, NX, W=W, K=K)
float(jnp.sum(g[0]))
with jax.profiler.trace("/tmp/banded_trace"):
    for _ in range(5):
        r = banded_deposit(F0, iy0, wy, ix0, wx, vals, NY, NX, W=W, K=K)
    float(jnp.sum(r[0]))
    for _ in range(5):
        g = banded_gather_main(stack, iy0, wy, wy, ix0, wx, wx, NY, NX,
                               W=W, K=K)
    float(jnp.sum(g[0]))
summarize("/tmp/banded_trace", top=25)
