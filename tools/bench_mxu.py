"""v5e MXU rate microbench: f32 vs bf16 dots, amortized inside one jit
dispatch (the axon tunnel costs ~1.5-2 ms per dispatch)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from functools import partial

REPS = 50

@partial(jax.jit, static_argnames=("dt",))
def dotloop(a, b, dt):
    a = a.astype(dt); b = b.astype(dt)
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a + acc[0, 0].astype(dt) * 0, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:8, :8]
    return jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 8), jnp.float32))

def t(f, *a):
    r = f(*a); float(jnp.sum(r))
    t0 = time.perf_counter()
    r = f(*a); float(jnp.sum(r))
    return (time.perf_counter() - t0)*1e3 / REPS

key = jax.random.PRNGKey(0)
for (m, k, n) in [(8192, 96, 1029), (8192, 96, 1152), (2048, 512, 80),
                  (2048, 512, 512), (4096, 4096, 4096)]:
    a = jax.random.normal(key, (m, k), jnp.float32)
    b = jax.random.normal(key, (k, n), jnp.float32)
    fl = 2*m*k*n
    for dt in (jnp.float32, jnp.bfloat16):
        ms = t(dotloop, a, b, dt)
        print(f"({m},{k})@({k},{n}) {dt.__name__:9s} {ms:7.3f} ms "
              f"{fl/ms/1e9:9.1f} GF/s")
