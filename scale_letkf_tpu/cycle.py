"""The DA cycle driver: forecast → H(x) → LETKF analysis, cycling.

Python/JAX equivalent of the reference's bash workflow layer (reference:
scale/run/cycle.sh:141-345 — the per-cycle step sequence scale_pp →
scale_init → scale-rm_ens → obsope → letkf; the step table is
scale/run/src/func_cycle.sh:14-28). Single-controller JAX eliminates the
staging/machinefile machinery: the "steps" are jitted functions over
sharded arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import Config
from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.state import (
    state_trans, state_trans_inv, state_to_history, ensemble_mean,
    ensemble_spread,
)
from scale_letkf_tpu.model.dycore import (
    DycoreConfig, DycoreState, rk3_step, make_vgrid, to_collocated,
    from_collocated,
)
from scale_letkf_tpu.model.physics import kessler_step
from scale_letkf_tpu.da.obsope import obsope_ensemble, compute_hx_single
from scale_letkf_tpu.da.letkf_obs import build_obs_context
from scale_letkf_tpu.da.letkf import analyze
from scale_letkf_tpu.da.monitor import monit_dep, DepartureStats, ObsDepRecord
from scale_letkf_tpu.da.obsmake import obsmake
from scale_letkf_tpu.obs.types import Observations, QC_GOOD
from scale_letkf_tpu.utils.timing import Timer


@dataclass
class CycleResult:
    stats_gues: list[DepartureStats] = field(default_factory=list)
    stats_anal: list[DepartureStats] = field(default_factory=list)
    rmse_gues: list[float] = field(default_factory=list)   # vs truth (OSSE)
    rmse_anal: list[float] = field(default_factory=list)
    spread: list[float] = field(default_factory=list)
    infl_field: np.ndarray | None = None


class CycleDriver:
    """Cycling DA driver composing the forecast model from config:

    - core: 'explicit' (acoustic-resolving RK3, dt limited by the vertical
      sound CFL) or 'si' (split-explicit HEVI, model/dycore_si.py — the
      reference's TIME_DT=30 s / TIME_DT_ATMOS_DYN=3 s regime,
      config/2015summer_18km/config.nml.scale PARAM_TIME)
    - terrain metrics when topography is present (model/terrain.py;
      scale_calc_z, common_scale.f90:1434)
    - stretched vertical levels when the Grid has non-uniform fz
    - Davies lateral-boundary relaxation toward file/parent targets
      (model/boundary.py; workflow BDY_FORMAT options,
      config/example/config.main.hakushu:72-78)
    """

    def __init__(self, grid: Grid, cfg: Config, dycfg: DycoreConfig,
                 rho_ref, p_ref, use_physics: bool = False,
                 phys_interval: int = 5, topo=None, phys_cfg=None,
                 mesh=None, core: str = "explicit", n_small: int = 6,
                 bdy=None, bdy_width: int = 0, bdy_tau: float = 300.0):
        self.grid = grid
        self.cfg = cfg
        self.dycfg = dycfg
        self.rho_ref = rho_ref
        self.p_ref = p_ref
        self.use_physics = use_physics
        self.mesh = mesh
        self.core = core
        self.timer = Timer()
        # prepared topography (read_topo equivalent, common_scale.f90:785)
        topo = jnp.zeros((grid.ny, grid.nx)) if topo is None \
            else jnp.asarray(topo)
        self.topo = topo
        self.z_full = grid.calc_z(topo)
        self.z_centers = jnp.asarray(grid.cz, jnp.float32)

        # stretched vertical metric (None on uniform grids)
        dzs = np.diff(np.asarray(grid.fz))
        self.vg = (make_vgrid(grid.cz, grid.fz)
                   if not np.allclose(dzs, dzs[0]) else None)
        self.dz_col = (self.vg.dzc if self.vg is not None else dycfg.dz)
        # the physics suite's PBL diffusion assumes uniform spacing; on
        # stretched grids it runs with the lowest-level thickness (where
        # PBL mixing concentrates) — column-aware physics is a known
        # simplification vs the reference's external SCALE physics
        self.dz_phys = dycfg.dz if self.vg is None else float(dzs[0])

        # terrain metrics when any topography is present
        self.metrics = None
        if bool(np.any(np.asarray(topo) != 0.0)):
            from scale_letkf_tpu.model.terrain import make_metrics
            self.metrics = make_metrics(jnp.asarray(topo, jnp.float32),
                                        grid.cz, grid.fz, grid.dx, grid.dy)

        # lateral boundary forcing (Davies relaxation). bdy may also be
        # attached later (nesting parents assign per-cycle targets), so the
        # relaxation weight exists whenever a buffer width is configured.
        self.bdy = bdy
        self._bdy_w2d = None
        if bdy_width > 0:
            from scale_letkf_tpu.model.boundary import relaxation_weight
            self._bdy_w2d = relaxation_weight(grid.ny, grid.nx, bdy_width,
                                              bdy_tau)

        if core == "si":
            from scale_letkf_tpu.model.dycore_si import (
                SplitConfig, rk3_step_si)
            split = SplitConfig(dtau=dycfg.dt / n_small)

            def dyn_step(s):
                return rk3_step_si(s, dycfg, split, rho_ref, p_ref,
                                   self.z_centers, n_small, self.vg,
                                   self.metrics)
        elif self.metrics is not None:
            from scale_letkf_tpu.model.terrain import rk3_step_terrain

            def dyn_step(s):
                return rk3_step_terrain(s, dycfg, rho_ref, p_ref,
                                        self.z_centers, self.metrics,
                                        vg=self.vg)
        else:
            def dyn_step(s):
                return rk3_step(s, dycfg, rho_ref, p_ref, self.z_centers,
                                self.vg)

        def apply_bdy(s, t, bdy):
            """Davies nudging toward the time-interpolated target. `bdy` is
            the (state0, state1, t0, t1) runtime tuple — an ARGUMENT of the
            jitted forecast, so per-cycle boundary updates (file sequences,
            nesting parents) take effect without retracing."""
            from scale_letkf_tpu.model.boundary import (
                apply_boundary_relaxation)
            b0, b1, bt0, bt1 = bdy
            denom = jnp.maximum(bt1 - bt0, 1e-9)
            a = jnp.clip((t - bt0) / denom, 0.0, 1.0)
            target = DycoreState(*((1.0 - a) * x0 + a * x1
                                   for x0, x1 in zip(b0, b1)))
            return apply_boundary_relaxation(s, target, self._bdy_w2d,
                                             dycfg.dt)

        def run_steps(s, nsteps, t0, bdy=None):
            """nsteps dynamics steps (+ per-step boundary relaxation)."""
            def body(c, i):
                c = dyn_step(c)
                if self._bdy_w2d is not None and bdy is not None:
                    t = t0 + (i.astype(jnp.float32) + 1.0) * jnp.float32(
                        dycfg.dt)
                    c = apply_bdy(c, t, bdy)
                return c, None
            s, _ = jax.lax.scan(body, s, jnp.arange(nsteps))
            return s

        def fcst_phys(s: DycoreState, nsteps: int, t0, tsfc0, bdy=None):
            """Full-suite forecast threading the slab skin state: tsfc0
            None ⇒ initialize from the lowest-level air temperature (cold
            start); else continue the persisted state (the reference's
            land/ocean restart carrying skin state between forecasts,
            common_scale.f90:60-98). Returns (state, tsfc)."""
            from scale_letkf_tpu.model.physics_suite import (
                init_physics_state, physics_step)
            chunk = min(phys_interval, nsteps)
            n_chunks, rem = divmod(nsteps, chunk)
            phys = init_physics_state(s, self.dz_phys, phys_cfg)
            if tsfc0 is not None:
                phys = phys._replace(tsfc=jnp.asarray(tsfc0, phys.tsfc.dtype))

            def body(carry, i):
                c, ph = carry
                tc = t0 + i.astype(jnp.float32) * jnp.float32(
                    chunk * dycfg.dt)
                c = run_steps(c, chunk, tc, bdy)
                c, ph = physics_step(c, ph, i, phys_cfg,
                                     dycfg.dt * chunk, self.dz_phys,
                                     self.z_centers)
                return (c, ph), None

            (s, phys), _ = jax.lax.scan(body, (s, phys),
                                        jnp.arange(n_chunks))
            if rem:
                s = run_steps(
                    s, rem, t0 + jnp.float32(n_chunks * chunk * dycfg.dt),
                    bdy)
                s, phys = physics_step(s, phys,
                                       jnp.int32(n_chunks), phys_cfg,
                                       dycfg.dt * rem, self.dz_phys,
                                       self.z_centers)
            return s, phys.tsfc

        def fcst_one(s: DycoreState, nsteps: int,
                     t0=jnp.float32(0.0), bdy=None) -> DycoreState:
            if not use_physics and phys_cfg is None:
                return run_steps(s, nsteps, t0, bdy)
            # interleave physics every phys_interval dynamics steps
            # (the reference's TIME_DT vs TIME_DT_ATMOS_PHY_* split)
            chunk = min(phys_interval, nsteps)
            n_chunks, rem = divmod(nsteps, chunk)

            if phys_cfg is not None:
                s, _tsfc = fcst_phys(s, nsteps, t0, None, bdy)
                return s

            def body(c, i):
                tc = t0 + i.astype(jnp.float32) * jnp.float32(
                    chunk * dycfg.dt)
                c = run_steps(c, chunk, tc, bdy)
                c = kessler_step(c, dycfg.dt * chunk, self.dz_col)
                return c, None

            s, _ = jax.lax.scan(body, s, jnp.arange(n_chunks))
            if rem:
                s = run_steps(s, rem,
                              t0 + jnp.float32(n_chunks * chunk * dycfg.dt),
                              bdy)
                s = kessler_step(s, dycfg.dt * rem, self.dz_col)
            return s

        # explicit ppermute halo backend (DycoreConfig.halo; SURVEY §2.8
        # item 4: COMM_vars8-equivalent exchange, optionally overlapped)
        halo_mode = dycfg.halo
        if halo_mode not in ("gspmd", "explicit", "explicit_overlap"):
            raise ValueError(f"unknown halo backend {halo_mode!r}")
        if halo_mode != "gspmd":
            if core not in ("explicit", "si"):
                raise NotImplementedError(
                    f"halo='explicit*' supports the explicit and SI cores "
                    f"(got core={core!r})")
            if core == "explicit" and self.metrics is not None:
                raise NotImplementedError(
                    "halo='explicit*' with terrain requires core='si' "
                    "(tendencies_terrain rides the SI halo step)")
            if use_physics or phys_cfg is not None:
                # the physics suite's column schemes are halo-free but its
                # composition with the per-stage exchange is untested —
                # documented exclusion (physics runs on the GSPMD path)
                raise NotImplementedError(
                    "halo='explicit*' does not compose with physics yet")
            if mesh is None:
                raise ValueError("halo='explicit*' requires a device mesh")

        def fcst_ens_halo(ens, nsteps, t0, bdy=None):
            from scale_letkf_tpu.parallel.halo import (
                rk3_step_halo_ens, rk3_step_si_halo_ens)
            if core == "si":
                from scale_letkf_tpu.model.dycore_si import SplitConfig
                split = SplitConfig(dtau=dycfg.dt / n_small)

            def body(c, i):
                if core == "si":
                    c = rk3_step_si_halo_ens(
                        c, dycfg, split, rho_ref, p_ref, self.z_centers,
                        self.mesh, n_small, vg=self.vg,
                        metrics=self.metrics,
                        overlap=(halo_mode == "explicit_overlap"))
                else:
                    c = rk3_step_halo_ens(
                        c, dycfg, rho_ref, p_ref, self.z_centers,
                        self.mesh, vg=self.vg,
                        overlap=(halo_mode == "explicit_overlap"))
                if self._bdy_w2d is not None and bdy is not None:
                    t = t0 + (i.astype(jnp.float32) + 1.0) * jnp.float32(
                        dycfg.dt)
                    c = apply_bdy(c, t, bdy)   # broadcasts over members
                return c, None
            out, _ = jax.lax.scan(body, ens, jnp.arange(nsteps))
            return out

        def fcst_ens(ens: DycoreState, nsteps: int, t0,
                     bdy=None) -> DycoreState:
            if halo_mode != "gspmd":
                return fcst_ens_halo(ens, nsteps, t0, bdy)
            if self.mesh is not None:
                from scale_letkf_tpu.parallel.mesh import constrain_ensemble
                ens = constrain_ensemble(self.mesh, ens)
            # bdy (when present) is shared by all members (one-way forcing
            # from a deterministic parent file); per-member boundary
            # ensembles map over axis 0 instead
            bdy_axes = None if bdy is None else (0, 0, None, None)                 if (bdy[0].rho.ndim == 4) else None
            out = jax.vmap(fcst_one, in_axes=(0, None, None, bdy_axes))(
                ens, nsteps, t0, bdy)
            if self.mesh is not None:
                out = constrain_ensemble(self.mesh, out)
            return out

        def fcst_ens_phys(ens: DycoreState, nsteps: int, t0, tsfc_ens,
                          bdy=None):
            if self.mesh is not None:
                from scale_letkf_tpu.parallel.mesh import constrain_ensemble
                ens = constrain_ensemble(self.mesh, ens)
            # same per-member-vs-broadcast boundary dispatch as fcst_ens:
            # a (K,nz,ny,nx) boundary ensemble maps over axis 0
            bdy_axes = (0, 0, None, None) \
                if (bdy is not None and bdy[0].rho.ndim == 4) else None
            out, tsfc = jax.vmap(fcst_phys,
                                 in_axes=(0, None, None, 0, bdy_axes))(
                ens, nsteps, t0, tsfc_ens, bdy)
            if self.mesh is not None:
                out = constrain_ensemble(self.mesh, out)
            return out, tsfc

        self._fcst_one = fcst_one
        self._fcst_one_jit = jax.jit(fcst_one, static_argnums=1)
        self._fcst_ens = jax.jit(fcst_ens, static_argnums=1)
        self._fcst_ens_phys = (jax.jit(fcst_ens_phys, static_argnums=1)
                               if phys_cfg is not None else None)
        # unjitted physics-suite ensemble forecast for executors that fuse
        # it into larger programs (da/bigcycle.py member-batch streams)
        self._fcst_ens_phys_raw = (fcst_ens_phys if phys_cfg is not None
                                   else None)
        self._phys_cfg = phys_cfg
        # persisted per-member slab skin temperature (K, ny, nx); None until
        # the first physics forecast (cold start) or set from a checkpoint
        self.tsfc = None
        # unjitted ensemble forecast for callers that fuse it into a larger
        # jitted program (da/fastcycle.py)
        self._fcst_ens_raw = fcst_ens

    def _bdy_args(self):
        """Runtime boundary tuple from the stored BoundaryData — traced
        arguments, so self.bdy may be swapped between cycles (file
        sequences, nesting parents) without retracing."""
        if self.bdy is None or self._bdy_w2d is None:
            return None
        b = self.bdy
        return (b.state0, b.state1, jnp.float32(b.t0), jnp.float32(b.t1))

    # -- forecast step (scale-rm_ens equivalent) --
    def forecast(self, ens: DycoreState, nsteps: int,
                 t0: float = 0.0) -> DycoreState:
        """t0: forecast start time [s] relative to the boundary-data clock
        (only meaningful with lateral-boundary forcing). With a physics
        suite, the slab skin state is threaded across calls (self.tsfc)."""
        with self.timer.section("forecast"):
            bdy = self._bdy_args()
            if self._fcst_ens_phys is not None:
                if self.tsfc is None:
                    from scale_letkf_tpu.model.physics_suite import (
                        init_physics_state)
                    self.tsfc = jax.vmap(
                        lambda s: init_physics_state(
                            s, self.dz_phys, self._phys_cfg).tsfc)(ens)
                out, self.tsfc = self._fcst_ens_phys(
                    ens, nsteps, jnp.float32(t0), self.tsfc, bdy)
            else:
                out = self._fcst_ens(ens, nsteps, jnp.float32(t0), bdy)
            jax.block_until_ready(out.rho)
        return out

    def forecast_one(self, s: DycoreState, nsteps: int,
                     t0: float = 0.0) -> DycoreState:
        return self._fcst_one_jit(s, nsteps, jnp.float32(t0),
                                  self._bdy_args())

    def forecast_slots(self, ens: DycoreState, nsteps: int,
                       slot_steps: list[int], t0: float = 0.0
                       ) -> tuple[DycoreState, jax.Array]:
        """Forecast with per-slot history snapshots for 4-D H(x)
        (the reference model's LTIMESLOT history output consumed by
        obsope, obsope_tools.f90:431-508).

        slot_steps: step counts (from forecast start) at which snapshots
        are taken; entries may exceed nsteps (window extending past the
        analysis time). Returns (state at nsteps, hist) with hist
        (K, S, NV3D, nz, ny, nx) in slot_steps order."""
        points = sorted(set(slot_steps) | {nsteps})
        snaps = {}
        state = ens
        state_at_n = ens if nsteps == 0 else None
        cur = 0
        for pt in points:
            if pt > cur:
                state = self.forecast(state, pt - cur,
                                      t0=t0 + cur * self.dycfg.dt)
                cur = pt
            if pt == nsteps:
                state_at_n = state
            if pt in slot_steps:
                snaps[pt] = state_trans(jax.vmap(to_collocated)(state))
        hist = jnp.stack([snaps[s] for s in slot_steps], axis=1)
        return state_at_n, hist

    # -- analysis step (obsope + letkf equivalents) --
    def analysis(self, ens: DycoreState, obs: Observations,
                 infl_field=None, det: DycoreState | None = None,
                 precomputed_hx=None, addi_ens=None,
                 rng: np.random.Generator | None = None,
                 hist_slots=None, slots=None):
        """Returns (analysis DycoreState ensemble, diagnostics dict).

        `det` is the optional deterministic member (DET_RUN,
        common_nml.f90:46): it receives the mean-update weights transmd
        (letkf_tools.f90:489-497) and is returned under key 'det'.
        `precomputed_hx` is an optional (ensval (K,nobs), qc (nobs,)) pair
        from a separate obsope run (the OBSDA_IN path, common_nml.f90:95).
        `addi_ens` is the additive-inflation source ensemble in analysis
        variables (K, NV3D, nz, ny, nx) — required when INFL_ADD > 0
        (reference INFL_ADD_IN_BASENAME files, common_nml.f90:117).
        `hist_slots` + `slots` enable the 4-D observation operator: H(x)
        is evaluated against the per-slot history snapshots
        (K, S, NV3D, nz, ny, nx) from forecast_slots, each obs matched to
        its time slot (obsope_tools.f90:431-508); the analysis update
        itself stays 3-D at the window center."""
        cfg = self.cfg
        with self.timer.section("state_trans") as ts:
            restart = jax.vmap(to_collocated)(ens)       # (K, NV3D, nz, ny, nx)
            gues = state_trans(restart)
            gues_det = (state_trans(to_collocated(det))
                        if det is not None else None)
            ts.sync_on = gues

        with self.timer.section("obsope"):
            if precomputed_hx is not None:
                from scale_letkf_tpu.da.obsope import ObsOpeResult
                lev_pc = (np.asarray(precomputed_hx[2])
                          if len(precomputed_hx) > 2
                          and precomputed_hx[2] is not None else None)
                hx = ObsOpeResult(ensval=np.asarray(precomputed_hx[0]),
                                  qc=np.asarray(precomputed_hx[1]),
                                  lev=lev_pc)
            elif hist_slots is not None:
                # per-slot snapshots carry no slab state; neutral screen
                # diagnostics are used for in-window H(x)
                fields = jax.vmap(
                    lambda g: state_to_history(g, self.z_full, self.topo))(
                    jnp.asarray(hist_slots))     # leading (K, S)
                hx = obsope_ensemble(fields, obs, self.grid, cfg,
                                     self.z_full, slots=slots)
            elif self.tsfc is not None:
                # physics-run screen diagnostics (stability-corrected from
                # the persisted skin state) feed the obs operator
                fields = jax.vmap(
                    lambda g, ts: state_to_history(g, self.z_full,
                                                   self.topo, tsfc=ts))(
                    gues, self.tsfc)
                hx = obsope_ensemble(fields, obs, self.grid, cfg, self.z_full)
            else:
                fields = jax.vmap(
                    lambda g: state_to_history(g, self.z_full, self.topo))(gues)
                hx = obsope_ensemble(fields, obs, self.grid, cfg, self.z_full)
            if det is not None:
                det_fields = state_to_history(gues_det, self.z_full, self.topo)
                y_det, _ = compute_hx_single(det_fields, obs, self.grid,
                                             cfg, self.z_full)
                ensval_det = np.asarray(y_det)
            else:
                ensval_det = None

        with self.timer.section("process_obs"):
            ctx = build_obs_context(obs, hx.ensval, hx.qc, cfg, self.grid,
                                    ensval_det=ensval_det, hx_lev=hx.lev)
            stats_gues = monit_dep(ctx.elem, ctx.dep, ctx.qc)

        with self.timer.section("das_letkf"):
            anal, anal_det, diag = analyze(gues, ctx, cfg, self.grid,
                                           self.z_full,
                                           infl_field=infl_field,
                                           gues_det=gues_det,
                                           mesh=self.mesh,
                                           addi_ens=addi_ens, rng=rng)
            jax.block_until_ready(anal)

        with self.timer.section("state_trans_inv") as ti:
            anal_restart = state_trans_inv(
                anal,
                positive_definite_q=cfg.letkf.positive_definite_q,
                positive_definite_qhyd=cfg.letkf.positive_definite_qhyd)
            ens_out = jax.vmap(from_collocated)(anal_restart)
            det_out = (from_collocated(state_trans_inv(
                anal_det,
                positive_definite_q=cfg.letkf.positive_definite_q,
                positive_definite_qhyd=cfg.letkf.positive_definite_qhyd))
                if anal_det is not None else None)
            ti.sync_on = ens_out

        # O−A statistics from the analysis mean. Use the PREPROCESSED obs
        # values (ctx.dat): radar reflectivity was converted to dBZ by
        # set_letkf_obs-equivalent preprocessing, and H(x) returns dBZ.
        with self.timer.section("monitor"):
            anal_mean_fields = state_to_history(
                ensemble_mean(anal), self.z_full, self.topo,
                tsfc=(jnp.mean(self.tsfc, axis=0)
                      if self.tsfc is not None else None))
            y_a, qc_a = compute_hx_single(anal_mean_fields, obs, self.grid,
                                          cfg, self.z_full)
            y_a = np.asarray(y_a).copy()
            from scale_letkf_tpu.obs.types import ID_H08IR
            m_h08 = ctx.elem == ID_H08IR
            y_a[m_h08] = np.abs(y_a[m_h08])   # drop the cloudy-sky sign flag
            oma = ctx.dat - y_a
            stats_anal = monit_dep(ctx.elem, oma, ctx.qc)
            # per-report-type × variable breakdown (monit_obs_mpi parity,
            # common_mpi_scale.f90:1481-1633)
            from scale_letkf_tpu.da.monitor import monit_dep_bytype
            stats_gues_t = monit_dep_bytype(ctx.elem, ctx.typ, ctx.dep,
                                            ctx.qc)
            stats_anal_t = monit_dep_bytype(ctx.elem, ctx.typ, oma, ctx.qc)
            obsdep = ObsDepRecord(
                elem=ctx.elem, typ=ctx.typ, lon=obs.lon, lat=obs.lat,
                lev=obs.lev, dat=ctx.dat, err=ctx.err, qc=ctx.qc,
                omb=ctx.dep, oma=oma)

        return ens_out, {
            "gues": gues, "anal": anal, "stats_gues": stats_gues,
            "stats_anal": stats_anal, "stats_gues_bytype": stats_gues_t,
            "stats_anal_bytype": stats_anal_t,
            "diag": diag, "obsdep": obsdep,
            "det": det_out,
        }

    # -- full OSSE twin experiment --
    def run_osse(
        self,
        truth0: DycoreState,
        ens0: DycoreState,
        obs_template: Observations,
        n_cycles: int,
        steps_per_cycle: int,
        seed: int = 0,
        verbose: bool = False,
    ) -> tuple[DycoreState, DycoreState, CycleResult]:
        """Perfect-model twin experiment: nature run generates obs each cycle
        (obsmake equivalent), the ensemble assimilates them."""
        rng = np.random.default_rng(seed)
        res = CycleResult()
        truth = truth0
        ens = ens0
        infl = None
        for c in range(n_cycles):
            truth = self.forecast_one(truth, steps_per_cycle)
            ens = self.forecast(ens, steps_per_cycle)

            truth_anal = state_trans(to_collocated(truth))
            nature_fields = state_to_history(truth_anal, self.z_full,
                                             self.topo)
            obs = obsmake(nature_fields, obs_template, self.grid, self.cfg,
                          self.z_full, rng)

            # gues error vs truth (u,v,w,T over the domain)
            gues_stack = state_trans(jax.vmap(to_collocated)(ens))
            gm = ensemble_mean(gues_stack)
            rmse_g = float(jnp.sqrt(jnp.mean(
                (gm[:4] - truth_anal[:4]) ** 2)))
            res.rmse_gues.append(rmse_g)
            res.spread.append(float(jnp.mean(
                ensemble_spread(gues_stack)[3])))

            ens, info = self.analysis(ens, obs, infl_field=infl)
            if info["diag"].infl_field is not None:
                infl = info["diag"].infl_field
            anal_mean = ensemble_mean(info["anal"])
            rmse_a = float(jnp.sqrt(jnp.mean(
                (anal_mean[:4] - truth_anal[:4]) ** 2)))
            res.rmse_anal.append(rmse_a)
            res.stats_gues.append(info["stats_gues"])
            res.stats_anal.append(info["stats_anal"])
            if verbose:
                print(f"cycle {c}: rmse gues={rmse_g:.4f} anal={rmse_a:.4f} "
                      f"spread={res.spread[-1]:.4f}")
        res.infl_field = infl
        return truth, ens, res
