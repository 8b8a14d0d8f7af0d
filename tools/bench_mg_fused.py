#!/usr/bin/env python3
"""A/B the fused single-kernel MG solve vs the XLA formulation on the
live backend, at the bench shape, plus a lax.while_loop iteration
overhead probe (the fused kernel moves the V-cycle while_loop inside
Mosaic, so loop-dispatch overhead is part of what it removes).

Usage: python tools/bench_mg_fused.py [nxy] [nchan]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(name, fn, *args, n=3, k=4):
    sync(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{name:44s} {best * 1e3:9.3f} ms", flush=True)
    return best


def main():
    nxy = int(sys.argv[1]) if len(sys.argv) > 1 else 1023
    nchan = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from hipace_tpu.fields.multigrid import MultiGrid

    dt = jnp.float32
    mg = MultiGrid(nxy, nxy, 0.05, 0.05, dt)
    rng = np.random.default_rng(0)
    # blowout-ish: smooth rhs, nonnegative chi
    iy, ix = np.mgrid[0:nxy, 0:nxy]
    base = np.exp(-((ix - nxy / 2) ** 2 + (iy - nxy / 2) ** 2)
                  / (nxy / 8) ** 2)
    rhs = jnp.asarray(np.stack([base * np.sin(ix * 0.05)] * nchan), dt)
    acf = jnp.asarray(base * 5.0, dt)
    u0 = jnp.zeros_like(rhs)

    xla = jax.jit(lambda u, r, a: mg.solve(u, r, a, fused=False))
    fus = jax.jit(lambda u, r, a: mg.solve(u, r, a, fused=True))
    # correctness cross-check at bench shape
    sx = np.asarray(xla(u0, rhs, acf))
    sf = np.asarray(fus(u0, rhs, acf))
    scale = max(1e-30, float(np.max(np.abs(sx))))
    print(f"# max|xla-fused|/max|xla| = "
          f"{float(np.max(np.abs(sx - sf))) / scale:.3e}")
    timeit(f"MG solve XLA      ({nxy}^2, C={nchan})", xla, u0, rhs, acf)
    timeit(f"MG solve fused    ({nxy}^2, C={nchan})", fus, u0, rhs, acf)
    # warm-started (previous-slice guess), the production pattern
    timeit("MG solve XLA   warm-start", xla, jnp.asarray(sx, dt), rhs, acf)
    timeit("MG solve fused warm-start", fus, jnp.asarray(sf, dt), rhs, acf)

    # ---- while_loop iteration overhead probe
    @jax.jit
    def loop(x, iters):
        def body(s):
            i, v = s
            return i + 1, v * 1.000001 + 1e-7
        return jax.lax.while_loop(lambda s: s[0] < iters, body,
                                  (jnp.zeros((), jnp.int32), x))[1]

    x = jnp.ones((8, 128), jnp.float32)
    t10 = timeit("while_loop 10 iters (tiny body)", loop, x,
                 jnp.asarray(10, jnp.int32))
    t1000 = timeit("while_loop 1000 iters (tiny body)", loop, x,
                   jnp.asarray(1000, jnp.int32))
    print(f"# per-iteration overhead ~ {(t1000 - t10) / 990 * 1e6:.2f} us")


if __name__ == "__main__":
    sys.exit(main())
