"""End-to-end radar-reflectivity/radial-velocity assimilation (OSSE):
exercises the radar operator, dBZ preprocessing/relabeling, z-coordinate
vertical localization, and min-member QC inside the full analysis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import (
    Config, LetkfConfig, EnsembleConfig, RadarConfig,
)
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.model.dycore import DycoreConfig, to_collocated
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble, \
    perturb_ensemble
from scale_letkf_tpu.model.physics import kessler_step
from scale_letkf_tpu.obs.types import (
    Observations, ID_RADAR_REF, ID_RADAR_REF_ZERO, ID_RADAR_VR, TYP_PHARAD,
    QC_GOOD,
)
from scale_letkf_tpu.da.obsmake import obsmake
from scale_letkf_tpu.da.letkf_obs import preprocess_radar_obs
from scale_letkf_tpu.cycle import CycleDriver
from scale_letkf_tpu.state import state_trans, state_to_history, ensemble_mean

NZ, NY, NX = 16, 16, 16
DZ, DX, DY = 500.0, 2000.0, 2000.0
K = 16


def make_radar_template(grid, radar_lonlatz, stride=2):
    """Radar volume scan template: REF + VR at every `stride` gridpoint over
    levels 2-9."""
    lon2d, lat2d = grid.lonlat
    recs = []
    for k in range(2, 10, 2):
        lev = (k + 0.5) * DZ
        for j in range(2, NY - 2, stride):
            for i in range(2, NX - 2, stride):
                for e in (ID_RADAR_REF, ID_RADAR_VR):
                    recs.append((e, lon2d[j, i], lat2d[j, i], lev))
    n = len(recs)
    return Observations(
        elem=np.asarray([r[0] for r in recs], np.int32),
        lon=np.asarray([r[1] for r in recs]),
        lat=np.asarray([r[2] for r in recs]),
        lev=np.asarray([r[3] for r in recs]),
        dat=np.zeros(n), err=np.ones(n),
        typ=np.full(n, TYP_PHARAD, np.int32),
        dif=np.zeros(n),
        meta=np.asarray(radar_lonlatz))


def moist_bubble_setup():
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz=DZ,
                        proj=Projection(kind="LC"))
    radar = (float(grid.lonlat[0][1, 1]), float(grid.lonlat[1][1, 1]), 50.0)
    cfg = Config(
        ensemble=EnsembleConfig(member=K),
        letkf=LetkfConfig(infl_mul=1.05),
        radar=RadarConfig(method_ref_calc=3, min_radar_ref_member=1,
                          radar_ref_thres_dbz=10.0),
    )
    cfg.letkf_obs.hori_local = tuple([4.0e3] + [-1.0] * 23)
    # PHARAD vertical localization in meters (index 21)
    vl = [0.2] + [-1.0] * 20 + [1500.0, -1.0, -1.0]
    cfg.letkf_obs.vert_local = tuple(vl)
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ,
                         sponge_height=6.5e3, sponge_tau=120.0)
    # near-saturated sounding so the bubble rains
    from scale_letkf_tpu.model.microphysics6 import qsat
    from scale_letkf_tpu.model.dycore import hydrostatic_reference
    from scale_letkf_tpu.model.ideal import standard_theta_profile
    from scale_letkf_tpu.constants import RD
    theta = standard_theta_profile(NZ, DZ)
    rho1d, p1d = hydrostatic_reference(theta, DZ)
    t1d = p1d / (rho1d * RD)
    qv = 0.95 * np.asarray(qsat(jnp.asarray(t1d), jnp.asarray(p1d), False))
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ, qv_prof=qv)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref, use_physics=True)
    return grid, cfg, driver, s0, radar


def test_radar_preprocessing():
    cfg = Config()
    obs = Observations(
        elem=np.asarray([ID_RADAR_REF, ID_RADAR_REF, ID_RADAR_REF],
                        np.int32),
        lon=np.zeros(3), lat=np.zeros(3), lev=np.full(3, 2e3),
        dat=np.asarray([100.0, 0.5, -5.0]),    # linear Z: rainy, weak, bad
        err=np.full(3, 5.0), typ=np.full(3, TYP_PHARAD, np.int32),
        dif=np.zeros(3))
    out = preprocess_radar_obs(obs, cfg)
    # strong echo → dBZ
    np.testing.assert_allclose(out.dat[0], 10 * np.log10(100.0))
    # weak echo (< MIN_RADAR_REF=1.0 linear) → relabeled ref-zero at floor
    assert out.elem[1] == ID_RADAR_REF_ZERO
    assert out.dat[1] == cfg.radar.min_radar_ref_dbz + cfg.radar.low_ref_shift
    # negative → undef
    assert out.dat[2] < -1e30


def seed_rain(s, scale=1.0):
    """Inject a rain/cloud blob (convective CI timescales are too slow to
    grow rain from scratch in a unit test; this isolates the radar-DA path)."""
    nz, ny, nx = s.rho.shape
    k, j, i = np.mgrid[0:nz, 0:ny, 0:nx]
    blob = np.exp(-(((i - nx / 2) / 3.0) ** 2 + ((j - ny / 2) / 3.0) ** 2
                    + ((k - 5) / 2.5) ** 2))
    blob_j = jnp.asarray(blob, jnp.float32)
    rhoq = s.rhoq.at[2].add(2.0e-3 * scale * blob_j * s.rho)
    rhoq = rhoq.at[1].add(1.0e-3 * scale * blob_j * s.rho)
    return s._replace(rhoq=rhoq)


@pytest.mark.slow
def test_radar_osse_analysis():
    grid, cfg, driver, s0, radar = moist_bubble_setup()
    base = add_warm_bubble(s0, DZ, DX, DY, amplitude=3.0)
    allp = perturb_ensemble(jax.random.PRNGKey(3), base, K + 1,
                            amplitude=0.6)
    rng0 = np.random.default_rng(42)
    scales = 1.0 + 0.3 * rng0.standard_normal(K + 1)
    allp = jax.vmap(seed_rain)(allp, jnp.asarray(np.abs(scales),
                                                 jnp.float32))
    truth = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    # short spin-up: advect/sediment the hydrometeors differently per member
    truth = driver.forecast_one(truth, 60)
    ens = driver.forecast(ens, 60)

    truth_anal = state_trans(to_collocated(truth))
    # confirm the truth actually has rain (operator has signal)
    assert float(truth_anal[7].max()) > 1e-5, "no rain in nature run"

    nature = state_to_history(truth_anal, driver.z_full)
    template = make_radar_template(grid, radar)
    rng = np.random.default_rng(0)
    obs = obsmake(nature, template, grid, cfg, driver.z_full, rng)
    assert obs.nobs > 100
    # obsmake produced dBZ-domain values? obsmake returns operator output
    # (already dBZ); preprocessing must NOT double-convert: feed as linear Z
    # like real radar files by converting back
    ref_mask = obs.elem == ID_RADAR_REF
    obs.dat[ref_mask] = 10.0 ** (obs.dat[ref_mask] / 10.0)

    ens_a, info = driver.analysis(ens, obs)
    sg, sa = info["stats_gues"], info["stats_anal"]
    assert sg.nobs["REF"] > 0 and sg.nobs["Vr"] > 0
    # radar groups improve (or at worst stay) in obs space
    assert sa.rmse["Vr"] < sg.rmse["Vr"] * 1.0001
    assert sa.rmse["REF"] < sg.rmse["REF"] * 1.0001
    # dynamical fields improve vs truth
    gm = ensemble_mean(info["gues"])
    am = ensemble_mean(info["anal"])
    rg = float(jnp.sqrt(jnp.mean((gm[:3] - truth_anal[:3]) ** 2)))
    ra = float(jnp.sqrt(jnp.mean((am[:3] - truth_anal[:3]) ** 2)))
    # winds must not blow up; marginal noise is expected because the seeded
    # rain is dynamically uncorrelated with the wind perturbations
    assert ra < rg * 1.10, f"winds degraded: {ra} vs {rg}"
    # analysis stays physical
    assert np.isfinite(np.asarray(info["anal"])).all()
