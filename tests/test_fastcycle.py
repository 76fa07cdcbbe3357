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


def test_fused_rejects_h08_template():
    grid, cfg, driver, truth0, ens, template = _setup()
    template.elem[0] = ID_H08IR
    with pytest.raises(NotImplementedError, match="H08"):
        FusedCycle(driver, template, nsteps=2)
