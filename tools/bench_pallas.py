"""Microbench: Pallas deposit/gather kernels on the real TPU.

Times pallas_deposit / pallas_gather_main / pallas_deposit_multi at
transverse-benchmark scale (1M particles, 1023^2, f32) against the XLA
banded kernels, across (W, S, WXS) and precision settings.

Usage: python tools/bench_pallas.py [N] [NXY]
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


def make_data(N, NXY, h, dtype):
    G = 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
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


def timeit(f, reps=30):
    r = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    NXY = int(sys.argv[2]) if len(sys.argv) > 2 else 1023
    G = 3
    NY = NX = NXY + 2 * G
    order = 2
    dtype = jnp.float32

    for h, W, S, WXS in [(8, 32, 512, 256), (8, 32, 1024, 256),
                         (16, 48, 1024, 256), (8, 32, 2048, 384)]:
        xm, ym = make_data(N, NXY, h, dtype)
        vals6 = jnp.stack([xm * 0 + 1, xm, ym, xm * ym, xm + ym, xm - ym])
        vals10 = jnp.concatenate([vals6, vals6[:4] * 0.5])
        stack_cm = jax.random.normal(jax.random.PRNGKey(1), (5, NY, NX),
                                     dtype)
        for prec in ("bf16x3", "highest", "bf16"):
            F0 = jnp.zeros((6, NY, NX), dtype)
            t_dep = timeit(lambda: pallas_deposit(
                F0, ym, xm, vals6, NY, NX, order, W=W, S=S, WXS=WXS, h=h,
                precision=prec))
            t_g = timeit(lambda: pallas_gather_main(
                stack_cm, ym, xm, NY, NX, order, W=W, S=S, WXS=WXS, h=h,
                precision=prec))
            F1 = jnp.zeros((10, NY, NX), dtype)
            t_multi = timeit(lambda: pallas_deposit_multi(
                F1, ym, xm, vals10, (("w", 8), ("dw", 2)), NY, NX, order,
                1, W=W, S=S, WXS=WXS, h=h, precision=prec))
            print(f"pallas h={h} W={W} S={S} WXS={WXS} {prec:8s}: "
                  f"dep6 {t_dep:6.2f}  gmain {t_g:6.2f}  "
                  f"multi10 {t_multi:6.2f} ms", flush=True)

    # XLA banded reference (W=32, K=8192 production defaults)
    xm, ym = make_data(N, NXY, 0 or 8, dtype)
    vals6 = jnp.stack([xm * 0 + 1, xm, ym, xm * ym, xm + ym, xm - ym])
    vals10 = jnp.concatenate([vals6, vals6[:4] * 0.5])
    F0 = jnp.zeros((6, NY, NX), dtype)
    t_dep = timeit(lambda: banded_deposit(F0, ym, xm, vals6.T, NY, NX,
                                          order, W=32, K=8192))
    stack_lm = jax.random.normal(jax.random.PRNGKey(1), (NY, NX, 5), dtype)
    t_g = timeit(lambda: banded_gather_main(stack_lm, ym, xm, NY, NX,
                                            order, W=32, K=8192))
    F1 = jnp.zeros((10, NY, NX), dtype)
    t_multi = timeit(lambda: banded_deposit_multi(
        F1, ym, xm, vals10.T, (("w", 8), ("dw", 2)), NY, NX, order, 1,
        W=32, K=8192))
    print(f"XLA banded W=32 K=8192:       dep6 {t_dep:6.2f}  "
          f"gmain {t_g:6.2f}  multi10 {t_multi:6.2f} ms")


if __name__ == "__main__":
    main()
