"""Fused (one-jit) DA cycle vs the host pipeline (SURVEY §2.7 / cycle.sh).

The fused path must produce the same analysis as CycleDriver.analysis for
a conventional network where QC outcomes agree, and the fused OSSE scan
must improve on the background."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import Config, EnsembleConfig, LetkfConfig
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.cycle import CycleDriver
from scale_letkf_tpu.model.dycore import DycoreConfig, to_collocated
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble)
from scale_letkf_tpu.da.fastcycle import FusedCycle
from scale_letkf_tpu.da.obsmake import obsmake
from scale_letkf_tpu.obs.types import Observations, ID_T, ID_U, ID_H08IR
from scale_letkf_tpu.state import state_trans, state_to_history


def _setup(K=8, NZ=6, NY=8, NX=8):
    DZ, DX, DY = 500.0, 2000.0, 2000.0
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz=DZ,
                        proj=Projection(kind="LC"))
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.0, infl_mul_adaptive=True,
                                   relax_alpha=0.2))
    cfg.letkf_obs.hori_local = tuple([3.0 * DX] + [-1.0] * 23)
    cfg.obs_error.u = cfg.obs_error.v = cfg.obs_error.t = 0.05
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    s0 = add_warm_bubble(s0, DZ, DX, DY, amplitude=2.0,
                         center=(NX * DX / 2, NY * DY / 2, 1.5e3),
                         radius=(3e3, 3e3, 1e3))
    allp = perturb_ensemble(jax.random.PRNGKey(0), s0, K + 1, amplitude=0.5)
    truth0 = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref)

    rng = np.random.default_rng(0)
    lon2d, lat2d = grid.lonlat
    nsites = 20
    jj = rng.integers(1, NY - 1, nsites)
    ii = rng.integers(1, NX - 1, nsites)
    rec = []
    for p in range(nsites):
        for lv in (960e2, 890e2, 820e2, 750e2):
            for el in (ID_T, ID_U):
                rec.append((el, lon2d[jj[p], ii[p]], lat2d[jj[p], ii[p]], lv))
    elem = np.asarray([r[0] for r in rec], np.int32)
    template = Observations(
        elem=elem, lon=np.asarray([r[1] for r in rec]),
        lat=np.asarray([r[2] for r in rec]),
        lev=np.asarray([r[3] for r in rec]),
        dat=np.zeros(len(rec)), err=np.full(len(rec), 0.05),
        typ=np.zeros(len(rec), np.int32), dif=np.zeros(len(rec)))
    return grid, cfg, driver, truth0, ens, template


def test_fused_matches_host_pipeline():
    grid, cfg, driver, truth0, ens, template = _setup()
    rng = np.random.default_rng(1)

    truth = driver.forecast_one(truth0, 2)
    ens_f = driver.forecast(ens, 2)
    nf = state_to_history(state_trans(to_collocated(truth)),
                         driver.z_full, driver.topo)
    obs = obsmake(nf, template, grid, cfg, driver.z_full, rng)
    # obsmake may drop out-of-domain obs; the fused path needs the template
    # order — this interior network drops none
    assert obs.nobs == template.nobs

    ens_host, info = driver.analysis(ens_f, obs)
    fc = FusedCycle(driver, template, nsteps=2)
    ens_fused, infl, diag = fc.assimilate(
        ens_f, jnp.asarray(obs.dat), fc.initial_inflation())

    for a_h, a_f in zip(ens_host, ens_fused):
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_h),
                                   rtol=1e-3, atol=5e-5)
    assert int(diag["nobs_used"]) == obs.nobs  # clean network: all used
    assert float(diag["oma_rmse"]) < float(diag["omb_rmse"])


def test_fused_qc_mask_rejects_gross_outlier():
    grid, cfg, driver, truth0, ens, template = _setup()
    rng = np.random.default_rng(2)
    truth = driver.forecast_one(truth0, 2)
    ens_f = driver.forecast(ens, 2)
    nf = state_to_history(state_trans(to_collocated(truth)),
                         driver.z_full, driver.topo)
    obs = obsmake(nf, template, grid, cfg, driver.z_full, rng)
    dat = np.asarray(obs.dat).copy()
    dat[0] += 1000.0      # gross outlier → must be masked, not assimilated

    fc = FusedCycle(driver, template, nsteps=2)
    ens_a, infl, diag = fc.assimilate(ens_f, jnp.asarray(dat),
                                      fc.initial_inflation())
    assert int(diag["nobs_used"]) == obs.nobs - 1
    for a in ens_a:
        assert np.isfinite(np.asarray(a)).all()
    # host pipeline on the same corrupted obs must agree (its QC drops the
    # outlier from the arrays; the fused path masks it in-graph)
    obs2 = obs.select(slice(None))
    obs2.dat = dat
    ens_host, _ = driver.analysis(ens_f, obs2)
    for a_h, a_f in zip(ens_host, ens_a):
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_h),
                                   rtol=1e-3, atol=5e-5)


def test_fused_osse_scan_improves():
    grid, cfg, driver, truth0, ens, template = _setup()
    fc = FusedCycle(driver, template, nsteps=2)
    truth, ens_a, series = fc.run_osse(truth0, ens, n_cycles=2, seed=0)
    rmse_g, rmse_a, omb, oma, nused = [np.asarray(s) for s in series]
    assert rmse_a[0] < rmse_g[0]
    assert oma[0] < omb[0]
    assert (nused > 0).all()
    assert np.isfinite(rmse_a).all()


def test_fused_radar_template_structural_pass():
    """The structural build_obs_context pass must not fire value-dependent
    QC or re-preprocess the already-dBZ radar template: no-rain ref-zero
    obs keep their bucket slots and template dat stays intact (regression:
    the old pass ran preprocess_radar_obs + min-member QC on the template,
    corrupting dBZ values and permanently dropping ref-zero obs)."""
    from scale_letkf_tpu.config import RadarConfig
    from scale_letkf_tpu.obs.types import (
        ID_RADAR_REF, ID_RADAR_REF_ZERO, TYP_PHARAD)
    from scale_letkf_tpu.da.letkf_obs import preprocess_radar_obs
    from tests.test_radar_osse import seed_rain

    NZ, NY, NX = 12, 12, 12
    DZ, DX, DY = 500.0, 2000.0, 2000.0
    K = 8
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz=DZ,
                        proj=Projection(kind="LC"))
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.05),
                 radar=RadarConfig(method_ref_calc=3,
                                   min_radar_ref_member=1,
                                   radar_ref_thres_dbz=10.0))
    cfg.letkf_obs.hori_local = tuple([4.0e3] + [-1.0] * 23)
    vl = [0.2] + [-1.0] * 20 + [1500.0, -1.0, -1.0]
    cfg.letkf_obs.vert_local = tuple(vl)
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ,
                                        qv_prof=0.008 * np.ones(NZ))
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref)
    radar_site = (float(grid.lonlat[0][1, 1]),
                  float(grid.lonlat[1][1, 1]), 50.0)

    base = add_warm_bubble(s0, DZ, DX, DY, amplitude=2.0)
    allp = perturb_ensemble(jax.random.PRNGKey(5), base, K + 1,
                            amplitude=0.5)
    scales = np.abs(1.0 + 0.4 * np.random.default_rng(7)
                    .standard_normal(K + 1)).astype(np.float32)
    allp = jax.vmap(seed_rain)(allp, jnp.asarray(scales))
    truth0 = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    truth = driver.forecast_one(truth0, 5)
    ens_f = driver.forecast(ens, 5)

    lon2d, lat2d = grid.lonlat
    recs = []
    for k in range(2, 9, 2):
        for j in range(2, NY - 2, 2):
            for i in range(2, NX - 2, 2):
                recs.append((lon2d[j, i], lat2d[j, i], (k + 0.5) * DZ))
    n = len(recs)
    raw = Observations(
        elem=np.full(n, ID_RADAR_REF, np.int32),
        lon=np.asarray([r[0] for r in recs]),
        lat=np.asarray([r[1] for r in recs]),
        lev=np.asarray([r[2] for r in recs]),
        dat=np.zeros(n), err=np.ones(n),
        typ=np.full(n, TYP_PHARAD, np.int32), dif=np.zeros(n),
        meta=np.asarray(radar_site))
    nf = state_to_history(state_trans(to_collocated(truth)),
                          driver.z_full, driver.topo)
    # real radar files report no-rain gates too (the operator flags them
    # QC_REF_LOW, so obsmake would drop them): build the file content from
    # H(truth) keeping low gates as weak linear-Z echoes, then preprocess
    # → the dBZ + ref-zero-relabeled template the fused path requires
    from scale_letkf_tpu.obs.types import QC_GOOD, QC_REF_LOW
    from scale_letkf_tpu.da.obsope import compute_hx_single
    y, qc = compute_hx_single(nf, raw, grid, cfg, driver.z_full)
    y, qc = np.asarray(y), np.asarray(qc)
    keep = (qc == QC_GOOD) | (qc == QC_REF_LOW)
    obs = raw.select(keep)
    lin = 10.0 ** (y[keep] / 10.0)
    lin[qc[keep] == QC_REF_LOW] = 0.5     # weak echo below MIN_RADAR_REF
    # the seeded blob rains everywhere sampled — force every 7th gate to a
    # weak file echo so the template genuinely mixes rain and no-rain
    # (includes center gates where the background DOES have an echo, which
    # is exactly when the reference assimilates no-rain reflectivity)
    lin[::7] = 0.5
    obs.dat = lin
    obs.err = np.full(obs.nobs, cfg.obs_error.radar_ref)
    template = preprocess_radar_obs(obs, cfg)
    n_zero = int((template.elem == ID_RADAR_REF_ZERO).sum())
    n_rain = int((template.elem == ID_RADAR_REF).sum())
    assert n_zero > 0 and n_rain > 0, "template must mix rain and no-rain"

    fc = FusedCycle(driver, template, nsteps=5)
    # dat intact — no double log10 (25 dBZ must not become 13.98)
    np.testing.assert_array_equal(fc.ctx.dat, template.dat)
    # every template obs keeps its bucket slot (QC is in-graph only)
    in_buckets = sum(len(ct.obs_idx) for ct in fc.ctx.ctypes)
    assert in_buckets == template.nobs
    elems = {ct.elem for ct in fc.ctx.ctypes}
    assert ID_RADAR_REF_ZERO in elems and ID_RADAR_REF in elems

    # the per-cycle in-graph QC must still run — and keep ref-zero obs
    # where the background has an echo
    gues = state_trans(jax.vmap(to_collocated)(ens_f))
    y, qc_worst = fc._hx_ens(gues)
    dep = jnp.asarray(template.dat, y.dtype) - jnp.mean(y, axis=0)
    good = np.asarray(fc._qc_mask(y, qc_worst, dep))
    assert good.any()
    assert good[template.elem == ID_RADAR_REF_ZERO].any(), \
        "no-rain reflectivity must survive the in-graph QC somewhere"

    ens_a, infl, diag = fc.assimilate(
        ens_f, jnp.asarray(template.dat), fc.initial_inflation())
    assert int(diag["nobs_used"]) == int(good.sum())
    for a in ens_a:
        assert np.isfinite(np.asarray(a)).all()


def test_fused_rejects_h08_template():
    grid, cfg, driver, truth0, ens, template = _setup()
    template.elem[0] = ID_H08IR
    with pytest.raises(NotImplementedError, match="H08"):
        FusedCycle(driver, template, nsteps=2)
