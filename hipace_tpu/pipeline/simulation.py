"""Simulation driver: configuration, the jitted time step, the Evolve loop.

TPU-native re-design of the Hipace driver singleton (ref: /root/reference/
src/Hipace.cpp:74-554). One full time step — plasma re-init, neutralizing
background, the zeta-sweep scan, beam re-binning — is a single jitted
function; the Python loop over time steps handles IO and (later) the
multi-device pipeline.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import make_constants
from ..geometry import Geometry
from ..parser import Inputs
from ..particles import beam as bm
from ..particles import plasma as pl
from ..diagnostics.openpmd import OpenPMDWriter
from .step import (SimConfig, init_field_state, make_slice_step, empty_slip,
                   zero_moments)
from ..utils import adaptive_dt as adt


class Simulation:
    """End-to-end simulation (ref main.cpp:15-25: InitData + Evolve)."""

    def __init__(self, inputs: Inputs, dtype=None, verbose: int | None = None):
        self.inputs = inputs
        self.normalized_units = inputs.query("hipace.normalized_units", False, bool)
        self.pc = make_constants(self.normalized_units)
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype

        depos_order = inputs.query("hipace.depos_order_xy", 2, int)
        self.geom = Geometry.from_inputs(inputs, depos_order)

        self.max_step = inputs.query("max_step", 0, int)
        self.adt_cfg = adt.AdaptiveTimeStepConfig.from_inputs(inputs)
        if self.adt_cfg.enabled:
            self.dt = 0.0  # set after beam init from the initial moments
        else:
            self.dt = inputs.query("hipace.dt", 0.0)
        self.initial_time = 0.0
        self.verbose = verbose if verbose is not None else \
            inputs.query("hipace.verbose", 1, int)

        solver = inputs.query("hipace.bxby_solver", "explicit", str)
        particle_bc = inputs.query("boundary.particle", "Absorbing", str)

        plasma_names = inputs.query_list("plasmas.names", [], str)
        if plasma_names == ["no_plasma"]:
            plasma_names = []
        plasma_cfgs = [
            pl.PlasmaConfig.from_inputs(inputs, n, self.pc, particle_bc)
            for n in plasma_names]

        # field ionization wiring: attach ADK constants, compute product
        # spawn capacities and slot bases (static per-parent slot blocks)
        bg_si = inputs.query("hipace.background_density_SI", 0.0)
        ionization_pairs = []
        self._spawn_extra = [0] * len(plasma_cfgs)
        for i, pcfg in enumerate(plasma_cfgs):
            if pcfg.can_ionize and pcfg.ionization_product:
                import dataclasses as _dc
                adk = pl.adk_constants(pcfg, self.geom.dz,
                                       self.normalized_units, bg_si)
                plasma_cfgs[i] = _dc.replace(pcfg, adk=adk)
                j = plasma_names.index(pcfg.ionization_product)
                parent_count = (self.geom.nx * self.geom.ny
                                * pcfg.ppc[0] * pcfg.ppc[1])
                own = (self.geom.nx * self.geom.ny
                       * plasma_cfgs[j].ppc[0] * plasma_cfgs[j].ppc[1])
                spawn_base = own + self._spawn_extra[j]
                self._spawn_extra[j] += parent_count * len(adk)
                ionization_pairs.append(
                    (i, j, spawn_base, plasma_cfgs[j].init_ion_lev))
        self.plasma_cfgs = tuple(plasma_cfgs)
        self.ionization_pairs = tuple(ionization_pairs)

        beam_names = inputs.query_list("beams.names", [], str)
        if beam_names == ["no_beam"]:
            beam_names = []
        self.beam_cfgs = tuple(
            bm.BeamConfig.from_inputs(inputs, n, self.pc, self.geom,
                                      self.normalized_units)
            for n in beam_names)

        diag_type = inputs.query("diagnostic.diag_type", "xyz", str)
        self.diag_type = diag_type
        self.output_period = inputs.query("diagnostic.output_period", -1, int)
        field_data = inputs.query_list(
            "diagnostic.field_data",
            ["ExmBy", "EypBx", "Ez", "Bx", "By", "Bz", "Psi"], str)

        from ..fields.laser import LaserConfig
        laser_cfg = LaserConfig.from_inputs(inputs, self.pc)
        self.laser_stream = None  # (n00, nm1) complex (nz, NY, NX) arrays

        self.cfg = SimConfig(
            geom=self.geom,
            pc=self.pc,
            use_laser=laser_cfg.use_laser,
            laser=laser_cfg if laser_cfg.use_laser else None,
            normalized_units=self.normalized_units,
            explicit=(solver == "explicit"),
            depos_order_xy=depos_order,
            depos_derivative_type=inputs.query(
                "hipace.depos_derivative_type", 2, int),
            do_beam_jx_jy_deposition=inputs.query(
                "hipace.do_beam_jx_jy_deposition", True, bool),
            deposit_rho=inputs.query("hipace.deposit_rho", False, bool),
            do_symmetrize=inputs.query("fields.do_symmetrize", False, bool),
            predcorr_B_error_tolerance=inputs.query(
                "hipace.predcorr_B_error_tolerance", 4e-2),
            predcorr_max_iterations=inputs.query(
                "hipace.predcorr_max_iterations", 30, int),
            predcorr_B_mixing_factor=inputs.query(
                "hipace.predcorr_B_mixing_factor", 0.05),
            MG_tolerance_rel=inputs.query("hipace.MG_tolerance_rel", 1e-4),
            MG_tolerance_abs=inputs.query("hipace.MG_tolerance_abs", 0.0),
            plasmas=self.plasma_cfgs,
            beams=self.beam_cfgs,
            diag_comps=tuple(field_data),
            background_density_SI=inputs.query(
                "hipace.background_density_SI", 0.0),
            grid_current=self._grid_current_cfg(inputs),
            ionization_pairs=self.ionization_pairs,
            insitu_beam_period=max(
                [inputs.query(f"{b.name}.insitu_period",
                              inputs.query("beams.insitu_period", 0, int), int)
                 for b in self.beam_cfgs] or [0]),
            insitu_field_period=inputs.query("fields.insitu_period", 0, int),
            insitu_plasma_period=max(
                [inputs.query(f"{p.name}.insitu_period",
                              inputs.query("plasmas.insitu_period", 0, int),
                              int)
                 for p in self.plasma_cfgs] or [0]),
            insitu_radius=inputs.query("beams.insitu_radius",
                                       float("inf")),
            salame_n_iter=inputs.query("hipace.salame_n_iter", 3, int),
            salame_do_advance=inputs.query("hipace.salame_do_advance",
                                           True, bool),
            salame_tolerance=inputs.query("hipace.salame_relative_tolerance",
                                          1e-4),
            salame_target_expr=(
                inputs.raw("hipace.salame_Ez_target(zeta,zeta_initial,"
                           "Ez_initial)") or "Ez_initial"),
            salame_consts=tuple(sorted(
                (k, float(v)) for k, v in inputs.my_constants.items()
                if isinstance(v, (int, float)))),
            collisions=self._collision_cfg(inputs, plasma_names,
                                           [b.name for b in self.beam_cfgs]),
            use_banded=self._banded_auto(inputs),
            banded_W=inputs.query("hipace.banded_W", 16, int),
            banded_K=inputs.query("hipace.banded_K", 4096, int),
            banded_sort_period=inputs.query("hipace.banded_sort_period",
                                            1, int),
        )
        self._insitu_writers = {}

        seed = inputs.query("hipace.random_seed", 0, int)
        self.key = jax.random.PRNGKey(seed)

        # ---- beam init (flat) + capacity planning + binning
        self.beams_flat = []
        for bcfg in self.beam_cfgs:
            self.key, sub = jax.random.split(self.key)
            self.beams_flat.append(
                bm.init_beam(bcfg, self.geom, sub, dtype,
                             self.normalized_units, self.pc))
        self.beam_merged = (bm.merge_beams(self.beams_flat)
                            if self.beams_flat else _empty_beam(dtype))
        self.beam_cap = self._plan_capacity()
        self.binned = bm.bin_beam(self.beam_merged, self.geom,
                                  self.beam_cap if self.beams_flat else 1)

        # initial adaptive dt from the initial beam moments
        # (ref AdaptiveTimeStep.cpp GatherMinUzSlice(initial=true) + Hipace.cpp:275-281)
        self._min_uz_mq = float("inf")
        if self.adt_cfg.enabled and self.beam_cfgs:
            mom = self._initial_beam_moments()
            self.dt, self._min_uz_mq = adt.calculate_from_min_uz(
                self.adt_cfg, mom, self.beam_cfgs[0], self.plasma_cfgs,
                self.pc, 0.0, 1e30)

        self.time = self.initial_time
        self.writer = OpenPMDWriter(
            inputs.query("hipace.file_prefix", "diags/hdf5", str),
            self.normalized_units)

        self._step_fn = jax.jit(partial(self._time_step))

    @staticmethod
    def _collision_cfg(inputs, plasma_names, beam_names):
        """ref CoulombCollision.cpp:8-60: hipace.collisions + <name>.species."""
        names = inputs.query_list("hipace.collisions", [], str)
        out = []
        for cname in names:
            sp = inputs.get_list(f"{cname}.species", str)
            clog = inputs.query(f"{cname}.CoulombLog", -1.0)
            if sp[0] in beam_names:
                out.append(("bp", beam_names.index(sp[0]),
                            plasma_names.index(sp[1]), False, clog))
            elif sp[1] in beam_names:
                out.append(("bp", beam_names.index(sp[1]),
                            plasma_names.index(sp[0]), False, clog))
            else:
                out.append(("pp", plasma_names.index(sp[0]),
                            plasma_names.index(sp[1]), sp[0] == sp[1], clog))
        return tuple(out)

    def _banded_auto(self, inputs) -> bool:
        """Banded MXU particle kernels: on by default for large plasmas.

        Disabled with ionization (product spawn slots are keyed to the parent
        array position, which the per-slice row sort would remap)."""
        default = (not self.ionization_pairs
                   and self._total_plasma_n() >= 65536)
        on = inputs.query("hipace.use_banded", default, bool)
        if on and self.ionization_pairs:
            raise ValueError("hipace.use_banded is incompatible with field "
                             "ionization (spawn slots are position-keyed)")
        return on

    def _total_plasma_n(self) -> int:
        g = self.geom
        return sum(g.nx * g.ny * p.ppc[0] * p.ppc[1]
                   for p in self.plasma_cfgs)

    @staticmethod
    def _grid_current_cfg(inputs):
        """ref utils/GridCurrent.cpp: grid_current.use_grid_current etc."""
        pp = inputs.prefix("grid_current")
        if not pp.query("use_grid_current", False, bool):
            return None
        return (pp.get("peak_current_density"),
                tuple(pp.get_list("position_mean")),
                tuple(pp.get_list("position_std")))

    # ------------------------------------------------------------------
    def _plan_capacity(self) -> int:
        if not self.beams_flat:
            return 1
        z = np.asarray(self.beam_merged["z"])
        v = np.asarray(self.beam_merged["valid"])
        isl = np.floor((z - self.geom.prob_lo[2]) / self.geom.dz).astype(int)
        isl = isl[v & (isl >= 0) & (isl < self.geom.nz)]
        if isl.size == 0:
            return 1
        counts = np.bincount(isl, minlength=self.geom.nz)
        return int(counts.max() * 1.25) + 16

    # ------------------------------------------------------------------
    def _init_plasma_state(self, key, c_t):
        states = []
        for i, pcfg in enumerate(self.plasma_cfgs):
            key, sub = jax.random.split(key)
            st = pl.init_plasma(pcfg, self.geom, sub, self.dtype, c_t,
                                self.normalized_units)
            extra = self._spawn_extra[i] if hasattr(self, "_spawn_extra") else 0
            if self.cfg.use_banded:
                # banded kernels process fixed K-particle chunks
                n = st["x"].size + extra
                extra += (-n) % self.cfg.banded_K
            if extra:
                # pre-allocated (invalid) slots for ionization products /
                # chunk padding; psi pads with 1 so 1/psi stays finite
                pad = {}
                for k, v in st.items():
                    fill = 1.0 if k in ("psi", "psi_half") else 0
                    z = jnp.full((extra,), fill, v.dtype)
                    pad[k] = jnp.concatenate([v, z])
                st = pad
            states.append(st)
        return states

    def _time_step(self, binned, time, dt, key, step=0, laser_stream=None):
        """One full time step: the jitted hot path."""
        cfg = self.cfg
        g = self.geom
        fields = init_field_state(cfg, self.dtype)

        # fresh plasma for this step (ref Hipace.cpp:450)
        plasmas = self._init_plasma_state(key, self.pc.c * time)

        # neutralizing background (ref Hipace.cpp:455-472)
        rhomjz_ion = fields["RhomJzIons"]["rhomjz"]
        for p, pcfg in zip(plasmas, self.plasma_cfgs):
            if pcfg.neutralize_background:
                tmp, _ = pl.deposit_plasma(
                    p, ["rhomjz"], {"rhomjz": rhomjz_ion}, g, pcfg, self.pc,
                    cfg.depos_order_xy, cfg.normalized_units,
                    flip_charge=True)
                rhomjz_ion = tmp["rhomjz"]
        fields = dict(fields, RhomJzIons={"rhomjz": rhomjz_ion})

        carry = {
            "fields": fields,
            "plasma": plasmas,
            "slip": empty_slip(cfg.slip_cap, self.dtype),
            "dt": dt,
            "time": time,
            "min_uz": jnp.asarray(jnp.inf, self.dtype),
            "beam_moments": zero_moments(self.dtype),
            "step": step,
        }
        if cfg.ionization_pairs or cfg.collisions:
            key, sub = jax.random.split(key)
            carry["key"] = sub
        if cfg.salame_active:
            from .salame import empty_salame_state
            carry["salame"] = empty_salame_state(g, self.dtype)
        nz = g.nz
        if cfg.use_laser:
            from ..fields.laser import laser_empty_state, initial_chi
            carry["laser"] = laser_empty_state(g, self.dtype)
            carry["chi_initial"] = initial_chi(
                cfg.laser, self.plasma_cfgs, g, self.pc, self.pc.c * time,
                self.dtype)
        beam_next = {k: jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]])
                     for k, v in binned.items() if k != "n_dropped"}
        beam_next["valid"] = beam_next["valid"].at[0].set(False)
        xs = {
            "islice": jnp.arange(nz),
            "beam_this": {k: v for k, v in binned.items() if k != "n_dropped"},
            "beam_next": beam_next,
        }
        if cfg.use_laser:
            ctype = jnp.complex64 if self.dtype == jnp.float32 \
                else jnp.complex128
            if laser_stream is None:
                zc = jnp.zeros((nz,) + g.slice_shape, ctype)
                laser_stream = (zc, zc)
            xs["laser_n00"] = laser_stream[0]
            xs["laser_nm1"] = laser_stream[1]
        slice_step = make_slice_step(cfg, self.dtype)
        carry, ys = jax.lax.scan(slice_step, carry, xs, reverse=True)

        # merge emitted beam + final slip, re-bin by new z
        flat = {}
        for k in bm.BEAM_ATTRS + bm.BEAM_INT_ATTRS + ("valid",):
            flat[k] = jnp.concatenate([ys["beam_out"][k].reshape(-1),
                                       carry["slip"][k]])
        new_binned = bm.bin_beam(flat, g, self.beam_cap)

        out = {
            "binned": new_binned,
            "diag": ys["diag"],
            "min_uz": carry["min_uz"],
            "beam_moments": carry["beam_moments"],
            "pc_iters": ys["pc_iters"],
        }
        if cfg.use_laser:
            # stream for the next step: n00 <- np1, nm1 <- n00
            out["laser_stream"] = (ys["laser_np1"], ys["laser_n00"])
        for k in ("insitu_beam", "insitu_field", "insitu_plasma",
                  "salame_W", "salame_dbg", "salame_is_sal"):
            if k in ys:
                out[k] = ys[k]
        if "banded_lost" in ys:
            out["banded_lost"] = jnp.sum(ys["banded_lost"])
        return out

    # ------------------------------------------------------------------
    def run_step(self, step: int):
        self.key, sub = jax.random.split(self.key)
        res = self._step_fn(self.binned, jnp.asarray(self.time, self.dtype),
                            jnp.asarray(self.dt, self.dtype), sub,
                            jnp.asarray(step, jnp.int32), self.laser_stream)
        if self.cfg.use_laser:
            self.laser_stream = res["laser_stream"]
        if "banded_lost" in res:
            lost = int(res["banded_lost"])
            if lost > 0:
                import sys
                print(f"WARNING: step {step}: {lost} banded deposit "
                      "contributions dropped — increase hipace.banded_W "
                      "or decrease hipace.banded_K", file=sys.stderr)
        return res

    def _initial_beam_moments(self):
        import numpy as np
        b = self.beams_flat[0]
        v = np.asarray(b["valid"])
        w = np.asarray(b["w"])[v]
        uz = np.asarray(b["uz"])[v] / self.pc.c
        if w.sum() == 0.0:
            return adt.initial_moments(self.beam_cfgs[0])
        return {"sum_w": float(w.sum()),
                "sum_w_uz": float((w * uz).sum()),
                "sum_w_uz2": float((w * uz * uz).sum()),
                "min_uz": float(uz.min()), "min_acc": 0.0}

    def evolve(self, write_output: bool = True):
        """Time loop (ref Hipace.cpp:393-507)."""
        for step in range(self.max_step + 1):
            if self.adt_cfg.enabled:
                # phase-advance control through density gradients
                self.dt = adt.calculate_from_density(
                    self.adt_cfg, self.plasma_cfgs, self.pc, self.time,
                    self.dt, self._min_uz_mq)
            if self.verbose >= 1:
                print(f"Rank 0 started step {step} at time {self.time}"
                      f" with dt {self.dt}")
            pre_push_binned = self.binned
            res = self.run_step(step)
            if write_output and self._do_output(step):
                self._write_diagnostics(step, res["diag"], pre_push_binned,
                                        res.get("laser_stream"))
            if write_output:
                self._write_insitu(step, res)
            self.binned = res["binned"]
            self.time += self.dt
            if self.adt_cfg.enabled and self.beam_cfgs:
                mom = {k: float(v) for k, v in res["beam_moments"].items()}
                mom["min_uz"] = float(res["min_uz"])
                self.dt, self._min_uz_mq = adt.calculate_from_min_uz(
                    self.adt_cfg, mom, self.beam_cfgs[0], self.plasma_cfgs,
                    self.pc, self.time, self.dt)
        return self

    def _do_output(self, step: int) -> bool:
        p = self.output_period
        if p < 0:
            return step == self.max_step
        if p == 0:
            return False
        return (step % p == 0) or step == self.max_step

    # ------------------------------------------------------------------
    def _write_insitu(self, step, res):
        """Write reduced diagnostics (ref Hipace.cpp:487-490)."""
        from ..diagnostics import insitu as ins
        inputs = self.inputs
        cfg = self.cfg

        def writer(kind, name, default_prefix, key):
            prefix = inputs.query(key, default_prefix, str)
            wkey = (kind, name)
            if wkey not in self._insitu_writers:
                self._insitu_writers[wkey] = ins.InsituWriter(prefix, name)
            return self._insitu_writers[wkey]

        if "insitu_beam" in res and cfg.insitu_beam_period \
                and step % cfg.insitu_beam_period == 0:
            b = self.beam_cfgs[0]
            rec = ins.beam_record(step, self.time,
                                  res["insitu_beam"], b.charge, b.mass,
                                  self.geom, self.normalized_units)
            writer("beam", b.name, "diags/insitu",
                   f"{b.name}.insitu_file_prefix").write_record(rec)
        if "insitu_field" in res and cfg.insitu_field_period \
                and step % cfg.insitu_field_period == 0:
            rec = ins.field_record(step, self.time,
                                   res["insitu_field"], self.geom,
                                   self.normalized_units)
            writer("field", "field", "diags/field_insitu",
                   "fields.insitu_file_prefix").write_record(rec)
        if "insitu_plasma" in res and cfg.insitu_plasma_period \
                and step % cfg.insitu_plasma_period == 0:
            for i, p in enumerate(self.plasma_cfgs):
                rec = ins.plasma_record(step, self.time,
                                        res["insitu_plasma"][:, i],
                                        p.charge, p.mass, self.geom,
                                        self.normalized_units)
                writer("plasma", p.name, "diags/plasma_insitu",
                       f"{p.name}.insitu_file_prefix").write_record(rec)

    def _slice_diag(self, arr):
        """Apply the diag_type slicing to a (nz, ny, nx) array."""
        if self.diag_type == "xz":
            ny = arr.shape[1]
            if ny % 2 == 0:
                return 0.5 * (arr[:, ny // 2 - 1, :] + arr[:, ny // 2, :])
            return arr[:, ny // 2, :]
        if self.diag_type == "yz":
            nx = arr.shape[2]
            if nx % 2 == 0:
                return 0.5 * (arr[:, :, nx // 2 - 1] + arr[:, :, nx // 2])
            return arr[:, :, nx // 2]
        return arr

    def _write_diagnostics(self, step: int, diag, pre_binned,
                           laser_stream=None):
        diag = np.asarray(diag)  # (nz, ncomp, ny, nx)
        fields = {}
        if laser_stream is not None:
            G = self.geom.nguards
            NY, NX = self.geom.slice_shape
            a = np.asarray(laser_stream[1])[:, G:NY - G, G:NX - G]
            fields["laserEnvelope"] = self._slice_diag(a)
        for ic, name in enumerate(self.cfg.diag_comps):
            fields[name] = self._slice_diag(diag[:, ic])
        beams = {}
        bid = np.asarray(pre_binned["beam_id"].reshape(-1))
        v_all = np.asarray(pre_binned["valid"].reshape(-1))
        for ib, bcfg in enumerate(self.beam_cfgs):
            v = v_all & (bid == ib)
            beams[bcfg.name] = {
                k: np.asarray(pre_binned[k].reshape(-1))[v]
                for k in bm.BEAM_ATTRS}
        self.writer.write(step, self.time, self.dt, fields, self.geom,
                          beams=beams)


def _empty_beam(dtype):
    out = {k: jnp.zeros((1,), dtype) for k in bm.BEAM_ATTRS}
    out["nsub"] = jnp.zeros((1,), jnp.int32)
    out["beam_id"] = jnp.zeros((1,), jnp.int32)
    out["valid"] = jnp.zeros((1,), bool)
    return out
