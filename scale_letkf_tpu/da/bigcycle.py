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

Per-phase wall-clock is reported like the reference's mpi_timer phase
table (letkf.f90:90-255: READ_GUES/OBS_OPERATOR/PROCESS_OBS/DAS_LETKF/
WRITE_ANAL). On a pod slice the member stream becomes the member-axis
sharding and this executor degenerates to the in-core driver; on one chip
it is the capability path for reference-size domains.
"""

from __future__ import annotations

import time

import numpy as np

from scale_letkf_tpu.obs.types import Observations, QC_GOOD


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


class StreamedCycle:
    """Full-size cycle executor: member-streamed forecast + obsope,
    host-streamed tiled analysis.

    Parameters
    ----------
    driver : cycle.CycleDriver
        Supplies the composed forecast model, grid, config. Physics-suite
        drivers (phys_cfg) and per-member boundary ensembles are not
        supported in the stream (use the in-core driver); Kessler
        `use_physics` and file/parent boundary forcing are.
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
        import jax

        if driver._fcst_ens_phys is not None:
            raise NotImplementedError(
                "StreamedCycle does not thread the physics-suite slab "
                "state through member batches; use CycleDriver")
        if driver.bdy is not None and driver.bdy.state0.rho.ndim == 4:
            raise NotImplementedError(
                "per-member boundary ensembles are not batch-sliced in "
                "the stream; use CycleDriver")
        self.d = driver
        self.member_batch = member_batch
        self.tile_rows = tile_rows
        self.pipeline = pipeline
        self.verbose = verbose
        self._jit_cache = {}
        self._last_obs = None

    # -- jitted per-batch programs (compiled once per (nsteps, batch)) --

    def _programs(self, obs: Observations):
        import jax
        import jax.numpy as jnp
        from scale_letkf_tpu.state import (
            state_trans, state_trans_inv, state_to_history)
        from scale_letkf_tpu.model.dycore import to_collocated, \
            from_collocated
        from scale_letkf_tpu.da.obsope import compute_hx_single

        d = self.d
        key = id(obs)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def gues_hx(ens_b):
            gues = state_trans(jax.vmap(to_collocated)(ens_b))
            fields = jax.vmap(
                lambda g: state_to_history(g, d.z_full, d.topo))(gues)
            y, qc = jax.vmap(
                lambda f: compute_hx_single(f, obs, d.grid, d.cfg,
                                            d.z_full))(fields)
            return gues, y, qc.max(axis=0)

        def mean_hx(mean_vars):
            fields = state_to_history(mean_vars, d.z_full, d.topo)
            y, qc = compute_hx_single(fields, obs, d.grid, d.cfg, d.z_full)
            return y

        def inv(anal_b):
            restart = state_trans_inv(
                anal_b,
                positive_definite_q=d.cfg.letkf.positive_definite_q,
                positive_definite_qhyd=d.cfg.letkf.positive_definite_qhyd)
            return jax.vmap(from_collocated)(restart)

        progs = (jax.jit(gues_hx), jax.jit(mean_hx), jax.jit(inv))
        self._jit_cache = {key: progs}     # latest obs template only
        return progs

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
        gues_hx_jit, _, _ = self._programs(obs)
        bdy = d._bdy_args()

        gues_host = np.empty((K, NV3D, nz, ny, nx), np.float32)
        ensval = np.empty((K, obs.nobs), np.float32)
        qc_worst = np.zeros(obs.nobs, np.int32)
        t = {"upload_s": 0.0, "fcst_s": 0.0, "obsope_s": 0.0,
             "download_s": 0.0, "fcst_compile_s": 0.0, "batches": K // b}

        def upload(i0):
            return jax.tree.map(
                lambda a: jnp.asarray(a[i0:i0 + b]), ens_host)

        if self.pipeline:
            # double-buffered: dispatch forecast+hx, prefetch the next
            # batch upload while they run, then block on the download
            t["pipelined"] = True
            ens_b = upload(0)
            for i0 in range(0, K, b):
                tt = time.time()
                ens_f = d._fcst_ens(ens_b, nsteps, jnp.float32(t0), bdy)
                gues_b, y_b, qc_b = gues_hx_jit(ens_f)      # async
                if i0 + b < K:
                    ens_b = upload(i0 + b)                  # overlaps
                gues_host[i0:i0 + b] = np.asarray(gues_b)   # blocks
                ensval[i0:i0 + b] = np.asarray(y_b)
                qc_worst = np.maximum(qc_worst, np.asarray(qc_b))
                dt = time.time() - tt
                if i0 == 0:
                    t["fcst_compile_s"] = dt
                else:
                    t["fcst_s"] += dt      # = steady pipelined batch wall
                if self.verbose:
                    _log(f"fcst+hx batch {i0 // b + 1}/{K // b} done")
            if K > b:
                t["fcst_s"] *= K / (K - b)
            return gues_host, ensval, qc_worst, t

        for i0 in range(0, K, b):
            tt = time.time()
            ens_b = upload(i0)
            jax.block_until_ready(ens_b.rho)
            t["upload_s"] += time.time() - tt

            tt = time.time()
            ens_f = d._fcst_ens(ens_b, nsteps, jnp.float32(t0), bdy)
            jax.block_until_ready(ens_f.rho)
            dt = time.time() - tt
            if i0 == 0:
                t["fcst_compile_s"] = dt    # first batch pays the compile
            else:
                t["fcst_s"] += dt

            tt = time.time()
            gues_b, y_b, qc_b = gues_hx_jit(ens_f)
            jax.block_until_ready(y_b)
            t["obsope_s"] += time.time() - tt

            tt = time.time()
            gues_host[i0:i0 + b] = np.asarray(gues_b)
            ensval[i0:i0 + b] = np.asarray(y_b)
            qc_worst = np.maximum(qc_worst, np.asarray(qc_b))
            t["download_s"] += time.time() - tt
            if self.verbose:
                _log(f"fcst+hx batch {i0 // b + 1}/{K // b} done")
        # steady-state forecast rate excludes the compiled first batch
        if K > b:
            t["fcst_s"] *= K / (K - b)
        return gues_host, ensval, qc_worst, t

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
        _, _, inv_jit = self._programs(self._last_obs)
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
            _, mean_hx_jit, _ = self._programs(obs)
            y_a = np.asarray(mean_hx_jit(
                jnp.asarray(anal.mean(axis=0, dtype=np.float32)))).copy()
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
            ("OBS_OPERATOR", report.get("obsope_s"), False),
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
