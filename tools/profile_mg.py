"""Profile the explicit-solver MG BxBy solve on REAL slice data.

profile_slice.py uses synthetic sine fields, which distort data-dependent
costs (MG iteration count, pallas fallback paths). This tool replays the
MG solve on fields dumped from a real run of the bench deck:

1. Run the bench deck once with per-slice xyz diagnostics:
     python -m hipace_tpu <bench deck> "amr.n_cell=1023 1023 8" max_step=0 \
         diagnostic.output_period=1 diagnostic.diag_type=xyz \
         "diagnostic.field_data=Bx By chi Sy Sx"
2. python tools/profile_mg.py <diags/hdf5/openpmd_000000.h5>

Prints per-slice V-cycle counts and the solve wall time on the live
backend (warm-started from the adjacent slice's solution, exactly like
pipeline/step.py _explicit_bxby_solve).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from hipace_tpu.fields.multigrid import MultiGrid


def solve_counted(mg, u0, rhs, acf, tol_rel, tol_abs, max_iters=40):
    """mg.solve with the iteration count exposed."""
    acfs = mg._coarsen_acf(acf)
    res0 = rhs - mg.apply_op(u0, acfs[0], 0)
    resnorm0 = jnp.max(jnp.abs(res0))
    rhsnorm0 = jnp.max(jnp.abs(rhs))
    target = jnp.maximum(tol_abs, jnp.maximum(tol_rel, 1e-16)
                         * jnp.maximum(resnorm0, rhsnorm0))

    def cond(c):
        return (c[1] > target) & (c[2] < max_iters)

    def body(c):
        u, _, it = c
        u = mg._vcycle(u, rhs, acfs, 0, 2, 2)
        res = rhs - mg.apply_op(u, acfs[0], 0)
        return (u, jnp.max(jnp.abs(res)), it + 1)

    u, resnorm, it = jax.lax.while_loop(
        cond, body, (u0, resnorm0, jnp.zeros((), jnp.int32)))
    return u, it


def main():
    path = sys.argv[1]
    tol_rel = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    f = h5py.File(path)
    it0 = list(f["data"])[0]
    mesh = f[f"data/{it0}/fields"]
    # (nz, ny, nx) xyz layout
    bx = np.array(mesh["Bx"])
    by = np.array(mesh["By"])
    chi = np.array(mesh["chi"])
    sy = np.array(mesh["Sy"])
    sx = np.array(mesh["Sx"])
    nz, ny, nx = bx.shape
    gs = mesh["Bx"].attrs.get("gridSpacing", [1.0, 1.0, 1.0])
    dy, dx = float(gs[-2]), float(gs[-1])
    print(f"# {path}: nz={nz} ny={ny} nx={nx} dx={dx:.4g} dy={dy:.4g} "
          f"backend={jax.default_backend()} tol_rel={tol_rel}")

    dt = jnp.float32
    mg = MultiGrid(nx, ny, dx, dy, dt)
    solve = jax.jit(lambda u0, rhs, acf: solve_counted(
        mg, u0, rhs, acf, tol_rel, 0.0))

    # the zeta sweep runs islice = nz-1 .. 0; warm start for slice i is
    # the solution of slice i+1 (first computed slice starts from zero)
    total = 0.0
    iters = []
    for i in range(nz - 1, -1, -1):
        warm = (jnp.zeros((2, ny, nx), dt) if i == nz - 1
                else jnp.asarray(np.stack([bx[i + 1], by[i + 1]]), dt))
        rhs = jnp.asarray(np.stack([sy[i], sx[i]]), dt)
        acf = jnp.asarray(chi[i], dt)
        u, it = solve(warm, rhs, acf)           # compile on first call
        if i == nz - 1:
            jnp.sum(u).block_until_ready()
        t0 = time.perf_counter()
        u, it = solve(warm, rhs, acf)
        got = float(jnp.sum(u))                  # force readback (axon)
        wall = time.perf_counter() - t0
        total += wall
        n_it = int(it)
        iters.append(n_it)
        # compare to the committed solution
        err = float(jnp.max(jnp.abs(u[0] - jnp.asarray(bx[i], dt))))
        print(f"slice {i:3d}: {n_it:2d} V-cycles, {wall * 1e3:7.2f} ms, "
              f"max|Bx-ref| {err:.3e}")
    print(f"# mean V-cycles {np.mean(iters):.2f}, "
          f"mean wall {total / nz * 1e3:.2f} ms/slice")


if __name__ == "__main__":
    main()
