"""Full-size flagship-configuration benchmarks (BASELINE configs 3 & 4).

Runs the production `analyze()` at the REFERENCE's native problem sizes —
no domain_overrides — on one chip and reports wall-clock + peak HBM:

- dense-radar analysis: the bda_1km_radar.toml domain (192x192x48, K=50)
  with a ≥1e6-obs synthetic phased-array volume at 1-km localization
  (reference: config/BDA_d3_100m_256p_bf40/config.nml.letkf:38 HORI_LOCAL,
  config.main.K:69-77 MEMBER=100/30-s cycles)
- 18-km Japan analysis: the 2015summer_18km domain (480x360x36, K=50)
  with a synthetic PREPBUFR-style network (reference:
  config/2015summer_18km/config.nml.scale PARAM_PRC/PARAM_INDEX)

The states are synthetic (smooth random perturbations around a balanced
profile): the benchmark measures the analysis engine at full scale, not
forecast skill. Invoked by bench.py; also usable standalone:
    python -m scale_letkf_tpu.bench_fullsize [radar|18km]
"""

from __future__ import annotations

import time

import numpy as np


def _device_mem_gb():
    import jax
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def _smooth_noise(rng, shape, passes=2):
    """Spatially-correlated noise (1-2-1 smoothed) for ensemble perts."""
    a = rng.standard_normal(shape).astype(np.float32)
    for ax in (-1, -2):
        for _ in range(passes):
            a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
    return a


def _synthetic_gues(rng, K, nz, ny, nx, cz):
    """(K, NV3D, nz, ny, nx) float32 analysis-variable ensemble around a
    hydrostatic profile — generated var by var to bound host memory."""
    from scale_letkf_tpu.state import NV3D, IA_U, IA_V, IA_W, IA_T, IA_P, \
        IA_Q0
    from scale_letkf_tpu.constants import RD, GRAV
    t_prof = (300.0 - 0.0065 * cz).astype(np.float32)
    p_prof = (1.0e5 * np.exp(-GRAV * cz / (RD * 280.0))).astype(np.float32)
    out = np.zeros((K, NV3D, nz, ny, nx), np.float32)
    base = {IA_U: 5.0, IA_V: 0.0, IA_W: 0.0}
    amp = {IA_U: 1.0, IA_V: 1.0, IA_W: 0.1, IA_T: 0.5, IA_P: 50.0}
    for v in range(NV3D):
        prof = (t_prof if v == IA_T else p_prof if v == IA_P
                else np.full(nz, base.get(v, 0.0), np.float32))
        a = amp.get(v, 1e-4 if v >= IA_Q0 else 0.5)
        for m in range(K):
            out[m, v] = prof[:, None, None] + a * _smooth_noise(
                rng, (nz, ny, nx))
        if v == IA_Q0:
            out[:, v] = np.abs(out[:, v]) + 1e-3
    return out


def _load_cfg(path):
    from scale_letkf_tpu.cli.main import load_config_and_grid
    return load_config_and_grid(path)


def bench_radar_analysis(config="configs/bda_1km_radar.toml",
                         n_obs_target=1_000_000, seed=0):
    """Full-size dense-radar analysis on device. Returns a result dict."""
    from scale_letkf_tpu.obs.types import (
        Observations, ID_RADAR_REF, ID_RADAR_VR, TYP_PHARAD)
    from scale_letkf_tpu.da.letkf_obs import build_obs_context

    cfg, grid, dycfg, dom = _load_cfg(config)
    K = cfg.ensemble.member
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    rng = np.random.default_rng(seed)

    t0 = time.time()
    gues_np = _synthetic_gues(rng, K, nz, ny, nx, np.asarray(grid.cz))
    gen_s = time.time() - t0

    # synthetic phased-array volume: az × elev × range gates around the
    # domain-center radar (the reference PAWR: 100-m gates, 110 elevations)
    radar_lon = dom.get("radar_lon", 135.5)
    radar_lat = dom.get("radar_lat", 34.8)
    n_az, n_el = 120, 55
    n_gate = max(1, n_obs_target // (n_az * n_el * 2))
    az = np.linspace(0, 360, n_az, endpoint=False)
    el = np.linspace(1.0, 25.0, n_el)
    r = np.linspace(2e3, 58e3, n_gate)
    azg, elg, rg = np.meshgrid(az, el, r, indexing="ij")
    azr = np.deg2rad(azg).ravel()
    elr = np.deg2rad(elg).ravel()
    rr = rg.ravel()
    gx = rr * np.cos(elr) * np.sin(azr)
    gy = rr * np.cos(elr) * np.cos(azr)
    gz = dom.get("radar_z", 80.0) + rr * np.sin(elr)
    # projection → lon/lat via the grid (meters per degree approximation
    # around the basepoint is adequate for a synthetic volume)
    lon = radar_lon + gx / (111e3 * np.cos(np.deg2rad(radar_lat)))
    lat = radar_lat + gy / 111e3
    keep = gz < 15e3
    n2 = int(keep.sum())
    elem = np.empty(2 * n2, np.int32)
    elem[0::2] = ID_RADAR_REF
    elem[1::2] = ID_RADAR_VR
    dup = lambda a: np.repeat(a[keep], 2)
    dat = np.empty(2 * n2)
    dat[0::2] = 10.0 ** (np.clip(
        20.0 + 15.0 * _smooth_noise(rng, (n2,), 0), 5.0, 55.0) / 10.0)
    dat[1::2] = 5.0 * rng.standard_normal(n2)
    err = np.where(elem == ID_RADAR_REF, cfg.obs_error.radar_ref,
                   cfg.obs_error.radar_vr)
    obs = Observations(
        elem=elem, lon=dup(lon), lat=dup(lat), lev=dup(gz), dat=dat,
        err=err, typ=np.full(2 * n2, TYP_PHARAD, np.int32),
        dif=np.zeros(2 * n2),
        meta=np.asarray([radar_lon, radar_lat, dom.get("radar_z", 80.0)]))

    # synthetic ensemble H(x): dat + spread-consistent noise (the bench
    # measures the analysis engine; obsope is benchmarked separately)
    t0 = time.time()
    ensval = (dat[None, :]
              + rng.standard_normal((K, len(dat))).astype(np.float32)
              * err[None, :])
    ctx = build_obs_context(obs, ensval, np.zeros(len(dat), np.int32),
                            cfg, grid)
    prep_s = time.time() - t0

    z_full = np.asarray(grid.calc_z(np.zeros((ny, nx))))

    # the K=50 state (3.9 GB) fits HBM but the analysis working set at
    # 1800-wide radar candidate tables does not — stream y-row tiles
    # through the chip (da/letkf_tiled.py; device compute and host↔device
    # transfer are reported separately)
    from scale_letkf_tpu.da.letkf_tiled import analyze_tiled
    t0 = time.time()
    anal, infl, stats = analyze_tiled(gues_np, ctx, cfg, grid, z_full,
                                      tile_rows=48)
    wall_s = time.time() - t0
    assert np.isfinite(anal).all()
    npts = nz * ny * nx
    return {
        "config": config, "grid": f"{nx}x{ny}x{nz}", "members": K,
        "nobs": int(len(dat)), "nobs_good": int((ctx.qc == 0).sum()),
        "analysis_s": round(wall_s, 1),
        "gridpoints_per_s": round(npts / max(stats["compute_s"], 1e-9), 1),
        "compute_s": round(stats["compute_s"], 2),
        "transfer_s": round(stats["transfer_s"], 2),
        "compile_s": round(stats["compile_s"], 2),
        "tiles": stats["tiles"],
        "peak_hbm_gb": _device_mem_gb(),
        "state_gen_s": round(gen_s, 1), "obs_prep_s": round(prep_s, 1),
    }


def bench_18km_analysis(config="configs/18km_japan.toml", seed=0,
                        tile_rows=20):
    """Full-size 18-km analysis. The K=50 480x360x36 state (13.7 GB f32)
    plus analysis buffers exceed one chip's HBM, so this uses the
    host-streamed tiled executor (da/letkf_tiled.py) — the single-chip
    counterpart of the reference's 48-rank domain decomposition."""
    import jax
    from scale_letkf_tpu.obs.types import Observations, ID_U, ID_V, ID_T, \
        ID_Q, ID_PS
    from scale_letkf_tpu.da.letkf_obs import build_obs_context
    from scale_letkf_tpu.da.letkf_tiled import analyze_tiled

    cfg, grid, dycfg, dom = _load_cfg(config)
    K = cfg.ensemble.member
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    rng = np.random.default_rng(seed)

    t0 = time.time()
    gues_np = _synthetic_gues(rng, K, nz, ny, nx, np.asarray(grid.cz))
    gen_s = time.time() - t0

    # synthetic PREPBUFR-style network: ~700 sondes × 8 levels × 4 vars
    # + 2000 surface pressure reports (JMA-era conventional density)
    lon2d, lat2d = grid.lonlat
    n_sonde, n_ps = 700, 2000
    si = rng.integers(2, nx - 2, n_sonde)
    sj = rng.integers(2, ny - 2, n_sonde)
    levs = np.asarray([925., 850., 700., 500., 400., 300., 250., 200.]) * 100
    rec_elem, rec_lon, rec_lat, rec_lev, rec_err = [], [], [], [], []
    e = cfg.obs_error
    for p in range(n_sonde):
        for lv in levs:
            for el, er in ((ID_U, e.u), (ID_V, e.v), (ID_T, e.t),
                           (ID_Q, e.q)):
                rec_elem.append(el)
                rec_lon.append(lon2d[sj[p], si[p]])
                rec_lat.append(lat2d[sj[p], si[p]])
                rec_lev.append(lv)
                rec_err.append(er)
    pi = rng.integers(2, nx - 2, n_ps)
    pj = rng.integers(2, ny - 2, n_ps)
    for p in range(n_ps):
        rec_elem.append(ID_PS)
        rec_lon.append(lon2d[pj[p], pi[p]])
        rec_lat.append(lat2d[pj[p], pi[p]])
        rec_lev.append(1000.0e2)
        rec_err.append(e.ps)
    elem = np.asarray(rec_elem, np.int32)
    nobs = len(elem)
    dat = np.where(elem == ID_T, 280.0,
                   np.where(elem == ID_PS, 1000e2,
                            np.where(elem == ID_Q, 5e-3, 5.0))).astype(float)
    err = np.asarray(rec_err)
    obs = Observations(elem=elem, lon=np.asarray(rec_lon),
                       lat=np.asarray(rec_lat), lev=np.asarray(rec_lev),
                       dat=dat, err=err, typ=np.zeros(nobs, np.int32),
                       dif=np.zeros(nobs))
    ensval = (dat[None, :] + rng.standard_normal((K, nobs)) * err[None, :]
              ).astype(np.float32)
    t0 = time.time()
    ctx = build_obs_context(obs, ensval, np.zeros(nobs, np.int32), cfg, grid)
    prep_s = time.time() - t0

    z_full = np.asarray(grid.calc_z(np.zeros((ny, nx))))
    t0 = time.time()
    anal, infl, stats = analyze_tiled(gues_np, ctx, cfg, grid, z_full,
                                      tile_rows=tile_rows)
    wall_s = time.time() - t0
    npts = nz * ny * nx
    return {
        "config": config, "grid": f"{nx}x{ny}x{nz}", "members": K,
        "nobs": int(nobs),
        "analysis_s": round(wall_s, 1),
        "gridpoints_per_s": round(npts / max(stats["compute_s"], 1e-9), 1),
        "compute_s": round(stats["compute_s"], 2),
        "transfer_s": round(stats["transfer_s"], 2),
        "compile_s": round(stats["compile_s"], 2),
        "tiles": stats["tiles"], "peak_hbm_gb": _device_mem_gb(),
        "state_gen_s": round(gen_s, 1), "obs_prep_s": round(prep_s, 1),
    }


if __name__ == "__main__":
    import sys
    import json
    which = sys.argv[1] if len(sys.argv) > 1 else "radar"
    if which == "radar":
        print(json.dumps(bench_radar_analysis()))
    else:
        print(json.dumps(bench_18km_analysis()))
