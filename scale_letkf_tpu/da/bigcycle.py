"""Member-streamed full-size DA cycle for domains beyond one chip's HBM.

The reference runs its defining configuration — the COMPLETE cycle
(ensemble forecast → obs operator → LETKF) at 480x360x36 with 50 members —
across 48 MPI ranks x 50 members (reference: scale/run/cycle.sh:141-345;
config/2015summer_18km/config.nml.scale PARAM_PRC/PARAM_INDEX). A single
chip cannot hold that K=50 state (13.7 GB f32) next to forecast workspace
and analysis buffers, but every phase streams:

- the ensemble forecast is embarrassingly parallel over members: member
  batches are streamed through the chip (upload -> jitted forecast ->
  H(x) -> download), exactly as da/letkf_tiled.py streams row tiles;
- the obs operator rides the same stream (the guess batch is already
  device-resident after the forecast — H(x) costs no extra transfer);
- the analysis is the host-streamed tiled executor (da/letkf_tiled.py);
- the analysis-variable -> prognostic-state inverse transform streams
  member batches back.

The stream carries the PRODUCTION model composition (the reference's
flagship configuration, hard-configured at common_mpi_scale.f90:833 and
config/example/config.main.hakushu:72-78):

- physics-suite drivers: the slab skin temperature (the land/ocean restart
  state the reference carries between forecasts, common_scale.f90:60-98)
  is threaded per member batch through a host-resident (K, ny, nx) array;
- per-member lateral-boundary ensembles (the reference's per-member bdy
  files): batch-sliced host-side and uploaded with each member batch;
- terrain + stretched grids ride the composed driver unchanged;
- 4-D assimilation windows: per-slot history snapshots are taken DURING
  the member-batch integration and each obs is matched to its time slot
  (obsope_tools.f90:431-508; SLOT_* in common_nml.f90:89-92) — the
  full-window history never exists in memory at once.

Per-phase wall-clock is reported like the reference's mpi_timer phase
table (letkf.f90:90-255: READ_GUES/OBS_OPERATOR/PROCESS_OBS/DAS_LETKF/
WRITE_ANAL). On a pod slice the member stream becomes the member-axis
sharding and this executor degenerates to the in-core driver; on one chip
it is the capability path for reference-size domains.
"""

from __future__ import annotations

import time

import numpy as np

from scale_letkf_tpu.obs.types import Observations, QC_GOOD, QC_TIME


def _batch_of(K: int, requested: int) -> int:
    """Largest divisor of K not exceeding the request (uniform batches ->
    one compiled program for the whole stream)."""
    b = max(1, min(requested, K))
    while K % b:
        b -= 1
    return b


def _log(msg):
    import sys
    print(f"[bigcycle +{time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def bdy_batch(driver, i0: int, b: int):
    """Boundary tuple for one member batch: per-member boundary ensembles
    ((K, nz, ny, nx) leading axis) are batch-sliced host-side; shared
    (deterministic-parent) boundaries pass through."""
    import jax
    import jax.numpy as jnp
    if driver.bdy is None or driver._bdy_w2d is None:
        return None
    bd = driver.bdy
    if bd.state0.rho.ndim == 4:
        sl = lambda st: jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)[i0:i0 + b]), st)
        return (sl(bd.state0), sl(bd.state1),
                jnp.float32(bd.t0), jnp.float32(bd.t1))
    return driver._bdy_args()


def _slot_parts(obs: Observations, cfg, dt: float, nsteps: int):
    """Partition obs into time slots (obsope_tools.f90:256 slot rule).

    Returns (parts, in_window) where parts is a list of
    (step_point, padded_obs_subset, scatter_idx, n_real) in ascending
    step order (the analysis-time point nsteps is always present, with
    obs=None when no slot lands exactly there), or (None, None) for
    single-slot windows."""
    o = cfg.obsope
    if o.slot_end <= o.slot_start:
        return None, None
    spb = o.slot_tinterval / dt
    if abs(spb - round(spb)) > 1e-6:
        raise ValueError(
            f"slot_tinterval={o.slot_tinterval} must be a multiple of "
            f"the model dt={dt}")
    spb = int(round(spb))
    slots = (np.ceil(np.asarray(obs.dif) / o.slot_tinterval - 0.5)
             + o.slot_base).astype(np.int32)
    in_window = (slots >= o.slot_start) & (slots <= o.slot_end)
    step_of_slot = {
        s: max(0, nsteps + (s - o.slot_base) * spb)
        for s in range(o.slot_start, o.slot_end + 1)}
    by_point: dict[int, list] = {}
    for s, pt in step_of_slot.items():
        m = np.nonzero(in_window & (slots == s))[0]
        if len(m):
            by_point.setdefault(pt, []).append(m)
    parts = []
    for pt in sorted(set(by_point) | {nsteps}):
        groups = by_point.get(pt)
        if groups is None:
            parts.append((pt, None, None, 0))
            continue
        m = np.concatenate(groups)
        nb = 64
        while nb < len(m):
            nb *= 2
        mp = np.concatenate([m, np.full(nb - len(m), m[-1])])
        parts.append((pt, obs.select(mp), m, len(m)))
    return parts, in_window


class StreamedCycle:
    """Full-size cycle executor: member-streamed forecast + obsope,
    host-streamed tiled analysis.

    Parameters
    ----------
    driver : cycle.CycleDriver
        Supplies the composed forecast model, grid, config — including
        physics-suite drivers (phys_cfg), terrain, stretched grids, and
        shared or per-member boundary forcing.
    member_batch : int
        Members per streamed device batch (rounded down to a divisor of K).
    tile_rows : int
        Row-tile height of the tiled analysis executor.
    """

    def __init__(self, driver, member_batch: int = 5, tile_rows: int = 24,
                 pipeline: bool = False, verbose: bool = False):
        """pipeline=True double-buffers both streams (next member-batch
        upload overlaps the current forecast; next analysis tile overlaps
        the current tile) — faster wall-clock, but the per-phase timer
        attribution becomes approximate (the blocking download absorbs
        whatever did not overlap)."""
        self.d = driver
        self.member_batch = member_batch
        self.tile_rows = tile_rows
        self.pipeline = pipeline
        self.verbose = verbose
        self._jit_cache = {}
        self._last_obs = None
        # persisted slab skin temperature (K, ny, nx) float32 host array;
        # None until the first physics forecast (cold start) or set from a
        # checkpoint (the reference's cycled land/ocean restart)
        self.tsfc_host = None

    @property
    def _has_phys(self):
        return self.d._fcst_ens_phys_raw is not None

    # -- jitted per-batch programs (compiled once per (obs, nsteps)) --

    def _programs(self, obs: Observations, nsteps: int):
        import jax
        import jax.numpy as jnp
        from scale_letkf_tpu.state import (
            state_trans, state_trans_inv, state_to_history)
        from scale_letkf_tpu.model.dycore import to_collocated, \
            from_collocated
        from scale_letkf_tpu.da.obsope import compute_hx_single

        d = self.d
        key = (id(obs), nsteps)
        if key in self._jit_cache:
            return self._jit_cache[key]

        dt = d.dycfg.dt
        parts, in_window = _slot_parts(obs, d.cfg, dt, nsteps)
        if parts is None:
            parts = [(nsteps, obs, np.arange(obs.nobs), obs.nobs)]
            in_window = np.ones(obs.nobs, bool)
        self._in_window = in_window
        has_phys = self._has_phys

        def seg(state, tsfc, n, t0c, bdy):
            """Integrate n steps from window time t0c, threading the slab
            state when the driver runs the physics suite."""
            if has_phys:
                return d._fcst_ens_phys_raw(state, n, t0c, tsfc, bdy)
            return d._fcst_ens_raw(state, n, t0c, bdy), tsfc

        def member_fields(gues_k, tsfc_k):
            if tsfc_k is None:
                return jax.vmap(
                    lambda g: state_to_history(g, d.z_full, d.topo))(gues_k)
            return jax.vmap(
                lambda g, ts: state_to_history(g, d.z_full, d.topo,
                                               tsfc=ts))(gues_k, tsfc_k)

        def fcst_hx(ens_b, t0, tsfc_b, bdy):
            """Segmented forecast with slot-matched H(x). Unlike the
            in-core 4-D path (whose per-slot snapshots carry no slab
            state, cycle.py analysis), the stream threads tsfc through
            the segments, so in-window H(x) sees the live skin state."""
            b = ens_b.rho.shape[0]
            y = jnp.zeros((b, obs.nobs))
            qc = jnp.zeros((b, obs.nobs), jnp.int32)
            state, tsfc = ens_b, tsfc_b
            cur = 0
            gues_out = None
            for pt, obs_s, midx, n_real in parts:
                if pt > cur:
                    state, tsfc = seg(state, tsfc, pt - cur,
                                      t0 + jnp.float32(cur * dt), bdy)
                    cur = pt
                snap = state_trans(jax.vmap(to_collocated)(state))
                if pt == nsteps:
                    gues_out = snap
                if obs_s is not None:
                    fields = member_fields(snap, tsfc)
                    y_s, qc_s = jax.vmap(
                        lambda f: compute_hx_single(f, obs_s, d.grid,
                                                    d.cfg, d.z_full))(
                        fields)
                    idx = jnp.asarray(midx)
                    y = y.at[:, idx].set(y_s[:, :n_real])
                    qc = qc.at[:, idx].set(qc_s[:, :n_real])
            return gues_out, y, qc.max(axis=0), tsfc

        def mean_hx(mean_vars, tsfc_mean):
            fields = state_to_history(mean_vars, d.z_full, d.topo,
                                      tsfc=tsfc_mean)
            y, qc = compute_hx_single(fields, obs, d.grid, d.cfg, d.z_full)
            return y

        def inv(anal_b):
            restart = state_trans_inv(
                anal_b,
                positive_definite_q=d.cfg.letkf.positive_definite_q,
                positive_definite_qhyd=d.cfg.letkf.positive_definite_qhyd)
            return jax.vmap(from_collocated)(restart)

        def init_tsfc(ens_b):
            from scale_letkf_tpu.model.physics_suite import (
                init_physics_state)
            return jax.vmap(
                lambda s: init_physics_state(s, d.dz_phys,
                                             d._phys_cfg).tsfc)(ens_b)

        progs = (jax.jit(fcst_hx), jax.jit(mean_hx), jax.jit(inv),
                 jax.jit(init_tsfc) if has_phys else None)
        self._jit_cache = {key: progs}     # latest (obs, nsteps) only
        return progs

    def _bdy_batch(self, i0: int, b: int):
        return bdy_batch(self.d, i0, b)

    # -- phases --

    def forecast_and_hx(self, ens_host, nsteps: int, obs: Observations,
                        t0: float = 0.0):
        """Streamed ensemble forecast + H(x).

        ens_host: DycoreState of host numpy arrays with leading K (left
        untouched). Returns (gues_host (K,NV3D,nz,ny,nx) float32, ensval
        (K,nobs) float32, qc_worst (nobs,), timers dict). The forecast
        result is kept only in analysis variables — the prognostic state
        for the next cycle is reconstructed from the analysis
        (state_trans_inv + from_collocated, as the in-core driver does)."""
        import jax
        import jax.numpy as jnp
        from scale_letkf_tpu.state import NV3D

        d = self.d
        K = ens_host.rho.shape[0]
        b = _batch_of(K, self.member_batch)
        nz, ny, nx = d.grid.nz, d.grid.ny, d.grid.nx
        self._last_obs = obs
        self._last_nsteps = nsteps
        fcst_hx_jit, _, _, init_tsfc_jit = self._programs(obs, nsteps)
        has_phys = self._has_phys
        if has_phys and self.tsfc_host is None:
            self.tsfc_host = np.empty((K, ny, nx), np.float32)
            self._tsfc_cold = True
        else:
            self._tsfc_cold = False

        gues_host = np.empty((K, NV3D, nz, ny, nx), np.float32)
        ensval = np.empty((K, obs.nobs), np.float32)
        qc_worst = np.zeros(obs.nobs, np.int32)
        # the obs operator is FUSED into the forecast program (slot
        # snapshots interleave with integration segments), so OBS_OPERATOR
        # time is part of ENS_FORECAST here
        t = {"upload_s": 0.0, "fcst_s": 0.0,
             "download_s": 0.0, "fcst_compile_s": 0.0, "batches": K // b}

        def upload(i0):
            ens_b = jax.tree.map(
                lambda a: jnp.asarray(a[i0:i0 + b]), ens_host)
            if not has_phys:
                return ens_b, None
            if self._tsfc_cold:
                tsfc_b = init_tsfc_jit(ens_b)
            else:
                tsfc_b = jnp.asarray(self.tsfc_host[i0:i0 + b])
            return ens_b, tsfc_b

        def finish_qc(qc_w):
            # obs outside the assimilation window (QC_TIME, the reference's
            # iqc_time, common_obs_scale.f90:147)
            return np.where(self._in_window, qc_w, QC_TIME)

        if self.pipeline:
            # double-buffered: dispatch forecast+hx, prefetch the next
            # batch upload while they run, then block on the download
            t["pipelined"] = True
            ens_b, tsfc_b = upload(0)
            bdy_b = self._bdy_batch(0, b)
            for i0 in range(0, K, b):
                tt = time.time()
                gues_b, y_b, qc_b, tsfc_o = fcst_hx_jit(
                    ens_b, jnp.float32(t0), tsfc_b, bdy_b)   # async
                if i0 + b < K:
                    ens_b, tsfc_b = upload(i0 + b)          # overlaps
                    bdy_b = self._bdy_batch(i0 + b, b)
                gues_host[i0:i0 + b] = np.asarray(gues_b)   # blocks
                ensval[i0:i0 + b] = np.asarray(y_b)
                qc_worst = np.maximum(qc_worst, np.asarray(qc_b))
                if has_phys:
                    self.tsfc_host[i0:i0 + b] = np.asarray(tsfc_o)
                dt_w = time.time() - tt
                if i0 == 0:
                    t["fcst_compile_s"] = dt_w
                else:
                    t["fcst_s"] += dt_w    # = steady pipelined batch wall
                if self.verbose:
                    _log(f"fcst+hx batch {i0 // b + 1}/{K // b} done")
            if K > b:
                t["fcst_s"] *= K / (K - b)
            return gues_host, ensval, finish_qc(qc_worst), t

        for i0 in range(0, K, b):
            tt = time.time()
            ens_b, tsfc_b = upload(i0)
            bdy_b = self._bdy_batch(i0, b)
            jax.block_until_ready(ens_b.rho)
            t["upload_s"] += time.time() - tt

            tt = time.time()
            gues_b, y_b, qc_b, tsfc_o = fcst_hx_jit(
                ens_b, jnp.float32(t0), tsfc_b, bdy_b)
            jax.block_until_ready(y_b)
            dt_w = time.time() - tt
            if i0 == 0:
                t["fcst_compile_s"] = dt_w  # first batch pays the compile
            else:
                t["fcst_s"] += dt_w

            tt = time.time()
            gues_host[i0:i0 + b] = np.asarray(gues_b)
            ensval[i0:i0 + b] = np.asarray(y_b)
            qc_worst = np.maximum(qc_worst, np.asarray(qc_b))
            if has_phys:
                self.tsfc_host[i0:i0 + b] = np.asarray(tsfc_o)
            t["download_s"] += time.time() - tt
            if self.verbose:
                _log(f"fcst+hx batch {i0 // b + 1}/{K // b} done")
        # steady-state forecast rate excludes the compiled first batch
        if K > b:
            t["fcst_s"] *= K / (K - b)
        return gues_host, ensval, finish_qc(qc_worst), t

    def analysis(self, gues_host, obs: Observations, ensval, qc_worst,
                 infl_field=None):
        """Obs processing + tiled LETKF analysis. The analysis OVERWRITES
        gues_host in place (the tile loop reads each row tile before
        writing it). Returns (anal_host, infl, ctx, timers)."""
        from scale_letkf_tpu.da.letkf_obs import build_obs_context
        from scale_letkf_tpu.da.letkf_tiled import analyze_tiled

        d = self.d
        t = {}
        tt = time.time()
        ctx = build_obs_context(obs, ensval, qc_worst, d.cfg, d.grid)
        t["process_obs_s"] = time.time() - tt

        if self.verbose:
            _log(f"analysis: {ctx.nobs} obs, starting tiled letkf")
        tt = time.time()
        anal, infl, stats = analyze_tiled(
            gues_host, ctx, d.cfg, d.grid, np.asarray(d.z_full),
            infl_field=infl_field, tile_rows=self.tile_rows,
            out=gues_host, pipeline=self.pipeline)
        t["das_letkf_s"] = time.time() - tt
        t.update({f"letkf_{k}": v for k, v in stats.items()})
        return anal, infl, ctx, t

    def to_state(self, anal_host, out: "object | None" = None):
        """Streamed analysis-variables -> prognostic DycoreState.
        Returns a DycoreState of host numpy arrays (written into `out`'s
        buffers when given). Timed as the WRITE_ANAL phase."""
        import jax
        import jax.numpy as jnp
        from scale_letkf_tpu.model.dycore import DycoreState

        d = self.d
        K = anal_host.shape[0]
        b = _batch_of(K, self.member_batch)
        if self._last_obs is None:
            raise RuntimeError("run forecast_and_hx (or cycle) first")
        _, _, inv_jit, _ = self._programs(self._last_obs,
                                          self._last_nsteps)
        nz, ny, nx = d.grid.nz, d.grid.ny, d.grid.nx
        from scale_letkf_tpu.state import NQ
        if out is None:
            out = DycoreState(
                rho=np.empty((K, nz, ny, nx), np.float32),
                rhou=np.empty((K, nz, ny, nx), np.float32),
                rhov=np.empty((K, nz, ny, nx), np.float32),
                rhow=np.empty((K, nz + 1, ny, nx), np.float32),
                rhot=np.empty((K, nz, ny, nx), np.float32),
                rhoq=np.empty((K, NQ, nz, ny, nx), np.float32))
        t = {"trans_inv_s": 0.0}
        for i0 in range(0, K, b):
            tt = time.time()
            s_b = inv_jit(jnp.asarray(anal_host[i0:i0 + b]))
            jax.block_until_ready(s_b.rho)
            for name in out._fields:
                getattr(out, name)[i0:i0 + b] = np.asarray(
                    getattr(s_b, name))
            t["trans_inv_s"] += time.time() - tt
            if self.verbose:
                _log(f"trans_inv batch {i0 // b + 1}/{K // b} done")
        return out, t

    def cycle(self, ens_host, obs: Observations, nsteps: int,
              infl_field=None, t0: float = 0.0, monitor: bool = True):
        """One complete full-size DA cycle. Returns (analysis DycoreState
        host ensemble, infl field, report dict with the per-phase timer
        table and O-B/O-A departure statistics)."""
        import jax
        import jax.numpy as jnp
        from scale_letkf_tpu.da.monitor import monit_dep

        self._last_obs = obs
        self._last_nsteps = nsteps
        total0 = time.time()
        gues_host, ensval, qc_worst, t_f = self.forecast_and_hx(
            ens_host, nsteps, obs, t0)
        anal, infl, ctx, t_a = self.analysis(gues_host, obs, ensval,
                                             qc_worst, infl_field)
        report = {**t_f, **t_a}
        stats_gues = monit_dep(ctx.elem, ctx.dep, ctx.qc)
        report["stats_gues"] = stats_gues

        if monitor:
            # O-A from the analysis-mean H(x) (monit_obs_mpi equivalent)
            tt = time.time()
            _, mean_hx_jit, _, _ = self._programs(obs, nsteps)
            tsfc_mean = (jnp.asarray(self.tsfc_host.mean(axis=0))
                         if self.tsfc_host is not None else None)
            y_a = np.asarray(mean_hx_jit(
                jnp.asarray(anal.mean(axis=0, dtype=np.float32)),
                tsfc_mean)).copy()
            # drop the H08 cloudy-sky sign flag before forming O-A (the
            # in-core driver does the same, cycle.py analysis monitor)
            from scale_letkf_tpu.obs.types import ID_H08IR
            m_h08 = ctx.elem == ID_H08IR
            y_a[m_h08] = np.abs(y_a[m_h08])
            oma = ctx.dat - y_a
            report["stats_anal"] = monit_dep(ctx.elem, oma, ctx.qc)
            report["monitor_s"] = time.time() - tt

        ens_out, t_i = self.to_state(anal)
        report.update(t_i)
        report["total_s"] = time.time() - total0
        return ens_out, infl, report


def phase_table(report: dict) -> str:
    """Reference-style phase timer table (letkf.f90:90-255).

    Rows marked (est) are steady-state extrapolations: the compiled first
    batch/tile is imputed by K/(K-b), so they may exceed measured wall and
    the column does not sum to TOTAL (which is measured)."""
    # fcst_s is extrapolated whenever the stream had >1 batch; the tiled
    # letkf stream_s likewise (letkf_tiled.py pipeline mode)
    fcst_est = report.get("batches", 1) > 1
    letkf_est = bool(report.get("letkf_pipelined"))
    rows = [("READ_GUES (upload)", report.get("upload_s"), False),
            ("ENS_FORECAST", report.get("fcst_s"), fcst_est),
            ("  fcst compile", report.get("fcst_compile_s"), False),
            ("OBS_OPERATOR (fused)", report.get("obsope_s"), False),
            ("GUES download", report.get("download_s"), False),
            ("PROCESS_OBS", report.get("process_obs_s"), False),
            ("DAS_LETKF", report.get("das_letkf_s"), False),
            ("  letkf compute", report.get("letkf_compute_s"), letkf_est),
            ("  letkf transfer", report.get("letkf_transfer_s"), False),
            ("  letkf compile", report.get("letkf_compile_s"), False),
            ("MONITOR (O-A)", report.get("monitor_s"), False),
            ("WRITE_ANAL (inv)", report.get("trans_inv_s"), False),
            ("TOTAL", report.get("total_s"), False)]
    lines = ["== cycle phase timers =="]
    for name, v, est in rows:
        if v is not None:
            tag = " (est)" if est else ""
            lines.append(f"  {name + tag:28s} {v:10.2f} s")
    return "\n".join(lines)
