"""Beam banded (Pallas) deposits/gathers vs the XLA scatter/gather path.

The beam, unlike the plasma, is transversely tight and unsorted; the
banded beam path stripe-snake sorts lanes locally (deposit) or once per
slice (advance) and uses wider windows (beam_pallas_W/h). Runs in Pallas
interpret mode on the CPU mesh (fp64), pinning agreement with the exact
scatter deposit / XLA gather push, including sparse head/tail sub-chunks
that overflow the y-window (corrective pass) and invalid lanes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipace_tpu.constants import make_constants
from hipace_tpu.geometry import Geometry
from hipace_tpu.ops.banded import BandedOpts
from hipace_tpu.particles import beam as bm


OPTS = BandedOpts(backend="pallas", W=64, h=24, S=512, WXS=128,
                  precision="highest")


def _geom(nxy=64, nz=4):
    return Geometry((nxy, nxy, nz), (-6.0, -6.0, -12.0), (6.0, 6.0, 6.0))


def _beam_cfg(**kw):
    return bm.BeamConfig(name="b", injection_type="fixed_weight",
                         n_subcycles=4, do_z_push=True, **kw)


def _make_beam(key, n, cap, geom, tight=True):
    """A gaussian beam slice dict with invalid tail lanes (capacity
    padding) — mirrors bin_beam's compacted layout."""
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    sx = 0.3 if tight else 2.0
    x = sx * jax.random.normal(ks[0], (n,), jnp.float64)
    y = sx * jax.random.normal(ks[1], (n,), jnp.float64)
    z = geom.prob_lo[2] + 1.7 * geom.dz \
        + geom.dz * jax.random.uniform(ks[2], (n,), jnp.float64)
    ux = 0.1 * jax.random.normal(ks[3], (n,), jnp.float64)
    uy = 0.1 * jax.random.normal(ks[4], (n,), jnp.float64)
    uz = 2000.0 + jax.random.normal(ks[5], (n,), jnp.float64)
    w = jnp.full((n,), 0.7, jnp.float64)
    pad = cap - n
    bp = {"x": x, "y": y, "z": z, "ux": ux, "uy": uy, "uz": uz, "w": w,
          "sx": jnp.zeros((n,)), "sy": jnp.zeros((n,)),
          "sz": jnp.ones((n,))}
    bp = {k: jnp.pad(v, (0, pad)) for k, v in bp.items()}
    bp["valid"] = jnp.arange(cap) < n
    bp["nsub"] = jnp.zeros((cap,), jnp.int32)
    bp["beam_id"] = jnp.zeros((cap,), jnp.int32)
    return bp


def _fields(key, geom):
    NY, NX = geom.slice_shape
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    names = ("Psi", "Ez", "Bx", "By", "Bz")
    out = {}
    for k, nme in zip(ks, names):
        # smooth fields: random low-order polynomial surface
        cy = jax.random.normal(k, (3, 3), jnp.float64)
        yy = jnp.linspace(-1, 1, NY)[:, None]
        xx = jnp.linspace(-1, 1, NX)[None, :]
        f = sum(cy[i, j] * yy ** i * xx ** j
                for i in range(3) for j in range(3))
        out[nme] = f
    return out


@pytest.mark.parametrize("tight", [True, False])
def test_beam_banded_deposit_matches_scatter(tight):
    geom = _geom()
    pc = make_constants(True)
    cfg = _beam_cfg()
    bp = _make_beam(3, 900, 1024, geom, tight)
    NY, NX = geom.slice_shape
    fields = {"jz_beam": jnp.zeros((NY, NX), jnp.float64),
              "jx_beam": jnp.zeros((NY, NX), jnp.float64),
              "jy_beam": jnp.zeros((NY, NX), jnp.float64)}
    cmap = {"jx": "jx_beam", "jy": "jy_beam", "jz": "jz_beam"}
    ref = bm.deposit_beam_slice(bp, cmap, fields, geom, cfg, pc, 2, True)
    out = bm.deposit_beam_slice(bp, cmap, fields, geom, cfg, pc, 2, True,
                                banded=OPTS)
    for c in cmap.values():
        np.testing.assert_allclose(np.array(out[c]), np.array(ref[c]),
                                   rtol=1e-12, atol=1e-13)


def test_beam_banded_advance_matches_gather():
    geom = _geom()
    pc = make_constants(True)
    cfg = _beam_cfg()
    bp = _make_beam(7, 700, 1024, geom)
    fields = _fields(11, geom)
    dt = jnp.asarray(0.5, jnp.float64)
    min_z = geom.prob_lo[2] + 1.0 * geom.dz
    ref = bm.advance_all_beams(bp, fields, geom, (cfg,), pc, dt, min_z,
                               order=2)
    out = bm.advance_all_beams(bp, fields, geom, (cfg,), pc, dt, min_z,
                               order=2, banded=OPTS)

    def canon(d):
        o = np.lexsort((np.array(d["y"]), np.array(d["x"]),
                        np.array(d["z"]), ~np.array(d["valid"])))
        return {k: np.array(v)[o] for k, v in d.items()}

    r, u = canon(ref), canon(out)
    nv = int(np.sum(np.array(ref["valid"])))
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        np.testing.assert_allclose(u[k][:nv], r[k][:nv],
                                   rtol=1e-12, atol=1e-13, err_msg=k)
    np.testing.assert_array_equal(u["nsub"][:nv], r["nsub"][:nv])


def test_beam_banded_in_slice_step():
    """End-to-end: a blowout-style deck with hipace.use_banded=1 and the
    pallas backend (interpret on CPU) matches the scatter path."""
    from hipace_tpu.parser import Inputs
    from hipace_tpu.pipeline.simulation import Simulation

    deck = """
amr.n_cell = 32 32 8
hipace.normalized_units = 1
max_step = 0
hipace.dt = 1.
boundary.field = Dirichlet
boundary.particle = Absorbing
geometry.prob_lo = -6. -6. -6.
geometry.prob_hi =  6.  6.  2.
beams.names = beam
beam.injection_type = fixed_weight
beam.num_particles = 2000
beam.profile = gaussian
beam.position_mean = 0. 0. -2.
beam.position_std = 0.3 0.3 1.41
beam.zmin = -5.9
beam.zmax = 1.9
beam.density = 3.
beam.u_mean = 0. 0. 2000.
beam.u_std = 0. 0. 0.
plasmas.names = plasma
plasma.density(x,y,z) = 1.
plasma.ppc = 1 1
plasma.element = electron
diagnostic.output_period = 0
"""
    import jax as _jax
    key = _jax.random.PRNGKey(0)
    sims = {}
    for tag, ov in (("ref", ["hipace.use_banded=0"]),
                    ("pal", ["hipace.use_banded=1",
                             "hipace.banded_backend=pallas"])):
        sim = Simulation(Inputs(deck, overrides=ov), verbose=0)
        t = jnp.asarray(0.0, sim.dtype)
        dtv = jnp.asarray(sim.dt, sim.dtype)
        res = sim._time_step(sim.binned, t, dtv, key)
        sims[tag] = res

    rb, pb = sims["ref"]["binned"], sims["pal"]["binned"]
    for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
        r = np.sort(np.array(rb[k])[np.array(rb["valid"])])
        p = np.sort(np.array(pb[k])[np.array(pb["valid"])])
        np.testing.assert_allclose(p, r, rtol=2e-13, atol=1e-13,
                                   err_msg=k)


def test_stripe_aligned_sort_no_overflow():
    """With S > 0 the stripe-snake sort gap-fills every stripe to a
    multiple of S, so no sub-chunk spans two stripes and the pallas
    y-overflow mask is empty at sort time — even for a sparse gaussian
    beam whose edge stripes hold far fewer than S lanes (the case that
    forced the corrective pass on every subcycle)."""
    from hipace_tpu.ops.pallas_banded import _anchors_wide, _pad_shape
    geom = _geom(nxy=256)
    h, S, W = 16, 128, 32
    cap = 8192
    bp = _make_beam(3, 900, cap, geom, tight=True)
    out = bm.sort_beam_slice(bp, geom, h, S)
    ym, xm = bm._beam_cell_pos(out["x"], out["y"], out["valid"], geom)
    NY, NX = geom.slice_shape
    NYP, NXP = _pad_shape(NY, NX)
    _ay, _ax, _ay2, ywide, _ywide2, alive = _anchors_wide(
        ym, xm, NYP, NXP, 2, 1, W, min(256, NXP), S)
    assert int(jnp.sum(ywide)) == 0
    # each live sub-chunk holds lanes of exactly one stripe
    stripes = jnp.where(ym < 1.5 * NY,
                        jnp.clip(jnp.floor(ym).astype(int), 0,
                                 2 * NY) // h, -1).reshape(-1, S)
    for c in range(stripes.shape[0]):
        s = np.asarray(stripes[c])
        s = s[s >= 0]
        assert len(np.unique(s)) <= 1
    # the tail chunks are flagged dead (occupancy skipping)
    assert int(jnp.sum(alive)) < stripes.shape[0]
    # sort is a permutation: no lane lost or duplicated
    np.testing.assert_allclose(
        np.sort(np.asarray(out["x"])), np.sort(np.asarray(bp["x"])))


def test_stripe_aligned_sort_pad_exhaustion_stays_exact():
    """When there are not enough sentinel lanes to gap-fill every stripe,
    alignment degrades but deposits stay exact (corrective pass)."""
    from hipace_tpu.ops.banded import dispatch_deposit
    geom = _geom(nxy=128)
    h, S = 16, 512
    cap = 1024                    # nearly full: 1000 live, 24 sentinels
    bp = _make_beam(5, 1000, cap, geom, tight=False)
    opts = OPTS._replace(W=32, h=h, S=S)
    out = bm.sort_beam_slice(bp, geom, h, S)
    ym, xm = bm._beam_cell_pos(out["x"], out["y"], out["valid"], geom)
    NY, NX = geom.slice_shape
    vals = [jnp.where(out["valid"], out["w"], 0.0)]
    F0 = jnp.zeros((1, NY, NX), jnp.float64)
    got, _ = dispatch_deposit(F0, ym, xm, vals, opts, NY, NX, 2)
    # exact reference: plain scatter
    from hipace_tpu.ops.deposit import deposit_multi
    ref = deposit_multi(jnp.zeros((1, NY, NX), jnp.float64),
                        out["x"], out["y"], vals, geom, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
