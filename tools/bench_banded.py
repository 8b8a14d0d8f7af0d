"""Microbench: banded deposit/gather kernels on the real TPU.

Times banded_deposit / banded_gather_main / banded_deposit_multi at
transverse-benchmark scale (1M particles, 1023^2, f32) across (W, K)
settings with the position-based in-kernel-weights API.

Usage: python tools/bench_banded.py [N] [NXY]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from hipace_tpu.ops.banded import (banded_deposit, banded_gather_main,
                                   banded_deposit_multi)
from hipace_tpu.ops.shape import shape_weights


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    NXY = int(sys.argv[2]) if len(sys.argv) > 2 else 1023
    G = 3
    NY = NX = NXY + 2 * G
    order = 2
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    xm = jax.random.uniform(kx, (N,), dtype, 0.0, float(NXY)) + G
    ym = jax.random.uniform(ky, (N,), dtype, 0.0, float(NXY)) + G
    iy0 = shape_weights(ym, order)[0]
    perm = jnp.argsort(iy0)
    xm, ym = xm[perm], ym[perm]
    x, y = xm, ym
    vals = jnp.stack([x, y, x * y, x + y, x - y, x * x], axis=-1)

    def timeit(f, reps=10):
        r = f()
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        return (time.perf_counter() - t0) / reps * 1e3

    configs = [(16, 8192), (16, 4096), (8, 4096), (8, 8192), (12, 8192)]
    print(f"N={N} grid={NY}x{NX} order={order} dtype={dtype.__name__}")
    print(f"{'W':>3} {'K':>5} {'dep6 ms':>8} {'gmain ms':>9} "
          f"{'multi8 ms':>9} {'dep21 ms':>9}")
    for W, K in configs:
        F0 = jnp.zeros((6, NY, NX), dtype)
        t_dep = timeit(lambda: banded_deposit(
            F0, ym, xm, vals, NY, NX, order, W=W, K=K))

        stack = jnp.zeros((NY, NX, 5), dtype)
        t_g = timeit(lambda: banded_gather_main(
            stack, ym, xm, NY, NX, order, W=W, K=K))

        F1 = jnp.zeros((8, NY, NX), dtype)
        v8 = jnp.concatenate([vals, vals[:, :2]], axis=1)
        t_m = timeit(lambda: banded_deposit_multi(
            F1, ym, xm, v8, (("w", 6), ("dw", 2)), NY, NX, order, 1,
            W=W, K=K))

        F2 = jnp.zeros((21, NY, NX), dtype)
        v21 = jnp.concatenate([vals, vals, vals, vals[:, :3]], axis=1)
        t_d21 = timeit(lambda: banded_deposit(
            F2, ym, xm, v21, NY, NX, order, W=W, K=K, deriv_type=1))
        print(f"{W:>3} {K:>5} {t_dep:8.2f} {t_g:9.2f} {t_m:9.2f} "
              f"{t_d21:9.2f}")


if __name__ == "__main__":
    main()
