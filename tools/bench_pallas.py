"""Microbench: Pallas vs XLA banded kernels on the real TPU.

Chain-based timing: every iteration's inputs depend on the previous
output, so nothing can be hoisted out of the scan, CSE'd, or deduped by
the runtime (naive repeat-same-call loops measure garbage through the
axon tunnel — see .claude/skills/verify: block_until_ready does not
synchronize; readback forces it).

Usage: python tools/bench_pallas.py [pallas|xla|all] [N] [NXY]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from hipace_tpu.ops.banded import (banded_deposit, banded_gather_main,
                                   banded_deposit_multi)
from hipace_tpu.ops.pallas_banded import (pallas_deposit,
                                          pallas_deposit_multi,
                                          pallas_gather_main)

R = 10
EPS = 1e-30


def make_data(N, NXY, h, dtype, seed=0):
    """Stripe-snake sorted uniform particles on an (NXY+2G)^2 grid."""
    G = 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    NX = NXY + 2 * G
    x = jax.random.uniform(k1, (N,), jnp.float32, 0., float(NXY)) + G
    y = jax.random.uniform(k2, (N,), jnp.float32, 0., float(NXY)) + G
    col = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, NX)
    row = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, NX)
    stripe = row // h
    colkey = jnp.where(stripe % 2 == 0, col, NX - col)
    keyv = stripe * (NX + 2) + colkey
    _, x, y = jax.lax.sort([keyv, x, y], num_keys=1)
    return x.astype(dtype), y.astype(dtype)


def bench(name, make_body, carry0):
    @jax.jit
    def chain(c, seed):
        def body(c, _):
            return make_body(c, seed), None
        return jax.lax.scan(body, c, None, length=R)[0]

    out = chain(carry0, jnp.float32(0))
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    out = chain(carry0, jnp.float32(1))
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name}: {dt:6.2f} ms/call", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1048576
    NXY = int(sys.argv[3]) if len(sys.argv) > 3 else 1023
    G = 3
    NY = NX = NXY + 2 * G
    order = 2

    xm, ym = make_data(N, NXY, 8, jnp.float32)
    vals6 = jnp.stack([xm * 0 + 1, xm, ym, xm * ym, xm + ym, xm - ym])
    vals10 = jnp.concatenate([vals6, vals6[:4] * 0.5])
    F6 = jnp.zeros((6, NY, NX), jnp.float32)
    F10 = jnp.zeros((10, NY, NX), jnp.float32)
    stack_cm = jax.random.normal(jax.random.PRNGKey(1), (5, NY, NX),
                                 jnp.float32)
    stack_lm = jnp.moveaxis(stack_cm, 0, -1)

    if which in ("all", "pallas"):
        def body_pd(c, seed):
            ym2 = ym + (c[0, 0, 0] * EPS + seed * 0.0)
            return pallas_deposit(jnp.zeros_like(c), ym2, xm, vals6,
                                  NY, NX, order)[0] + c * EPS
        bench("pallas dep6   ", body_pd, F6 + 1.0)

        def body_pm(c, seed):
            ym2 = ym + (c[0, 0, 0] * EPS + seed * 0.0)
            return pallas_deposit_multi(
                jnp.zeros_like(c), ym2, xm, vals10, (("w", 8), ("dw", 2)),
                NY, NX, order, 1)[0] + c * EPS
        bench("pallas multi10", body_pm, F10 + 1.0)

        def body_pg(c, seed):
            ym2 = ym + (c[0, 0, 0] * EPS + seed * 0.0)
            r = pallas_gather_main(c, ym2, xm, NY, NX, order)
            return c + r[0][0] * EPS
        bench("pallas gmain  ", body_pg, stack_cm)

    if which in ("all", "xla"):
        def body_xd(c, seed):
            ym2 = ym + (c[0, 0, 0] * EPS + seed * 0.0)
            return banded_deposit(jnp.zeros_like(c), ym2, xm, vals6.T,
                                  NY, NX, order, W=32, K=8192)[0] + c * EPS
        bench("XLA dep6      ", body_xd, F6 + 1.0)

        def body_xm(c, seed):
            ym2 = ym + (c[0, 0, 0] * EPS + seed * 0.0)
            return banded_deposit_multi(
                jnp.zeros_like(c), ym2, xm, vals10.T,
                (("w", 8), ("dw", 2)), NY, NX, order, 1,
                W=32, K=8192)[0] + c * EPS
        bench("XLA multi10   ", body_xm, F10 + 1.0)

        def body_xg(c, seed):
            ym2 = ym + (c[0, 0, 0] * EPS + seed * 0.0)
            r = banded_gather_main(c, ym2, xm, NY, NX, order,
                                   W=32, K=8192)
            return c + r[0][0] * EPS
        bench("XLA gmain     ", body_xg, stack_lm)


if __name__ == "__main__":
    main()
