"""Device-resident obs-space pipeline: the (K, nobs) ensemble H(x) must stay
on device from obsope through the analysis (the reference moves it through
MPI allreduce, common_mpi_scale.f90:1879; here device residency replaces the
collective), and the device QC/departure path must agree with the host-numpy
reference path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.config import Config, EnsembleConfig
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.obs.types import (
    Observations, ID_T, ID_RADAR_REF, ID_RADAR_VR, TYP_PHARAD, QC_GOOD,
)
from scale_letkf_tpu.da.letkf_obs import qc_and_departures, build_obs_context


def _mixed_obs(nobs=50, seed=0):
    rng = np.random.default_rng(seed)
    elem = np.where(rng.uniform(size=nobs) < 0.5, ID_T,
                    np.where(rng.uniform(size=nobs) < 0.5,
                             ID_RADAR_REF, ID_RADAR_VR)).astype(np.int32)
    typ = np.where(elem == ID_T, 1, TYP_PHARAD).astype(np.int32)
    obs = Observations(
        elem=elem,
        lon=rng.uniform(139.0, 141.0, nobs),
        lat=rng.uniform(34.0, 36.0, nobs),
        lev=np.where(elem == ID_T, 850e2, rng.uniform(500.0, 5e3, nobs)),
        dat=np.where(elem == ID_T, rng.normal(280.0, 5.0, nobs),
                     rng.uniform(0.0, 30.0, nobs)),
        err=np.full(nobs, 1.0),
        typ=typ,
        dif=np.zeros(nobs))
    obs.meta = np.array([140.0, 35.0, 100.0])
    return obs


def test_qc_departures_device_matches_numpy():
    K = 8
    obs = _mixed_obs()
    rng = np.random.default_rng(1)
    ensval = (obs.dat[None, :] + rng.normal(0, 1.0, (K, obs.nobs))).astype(
        np.float32)
    qc_in = np.zeros(obs.nobs, np.int32)
    cfg = Config(ensemble=EnsembleConfig(member=K))

    dep_h, hdxb_h, qc_h, _ = qc_and_departures(obs, ensval, qc_in, cfg)
    dep_d, hdxb_d, qc_d, _ = qc_and_departures(
        obs, jnp.asarray(ensval), qc_in, cfg)

    # hdxb from the device path IS a device array (no host round-trip)
    assert isinstance(hdxb_d, jax.Array)
    assert isinstance(hdxb_h, np.ndarray)
    np.testing.assert_array_equal(qc_h, qc_d)
    np.testing.assert_allclose(dep_h, dep_d, atol=1e-5)
    np.testing.assert_allclose(hdxb_h, np.asarray(hdxb_d), atol=1e-5)


def test_obs_context_keeps_hdxb_on_device():
    K = 8
    obs = _mixed_obs()
    rng = np.random.default_rng(2)
    ensval = jnp.asarray(
        obs.dat[None, :] + rng.normal(0, 1.0, (K, obs.nobs)), jnp.float32)
    qc_in = np.zeros(obs.nobs, np.int32)
    cfg = Config(ensemble=EnsembleConfig(member=K))
    grid = Grid.uniform(nx=16, ny=16, nz=8, dx=10e3, dy=10e3, dz=500.0,
                        proj=Projection(kind="LC"))

    ctx = build_obs_context(obs, ensval, qc_in, cfg, grid)
    assert isinstance(ctx.hdxb, jax.Array)
    assert isinstance(ctx.dep, np.ndarray)      # (nobs,) host vectors only
    assert (ctx.qc == QC_GOOD).sum() > 0


def test_h08_device_path():
    """H08 cloudy-member sign handling must match between paths."""
    from scale_letkf_tpu.obs.types import ID_H08IR
    TYP_H08IRB = 22          # 0-based index of the H08IRB report type
    K, nobs = 6, 20
    rng = np.random.default_rng(3)
    obs = Observations(
        elem=np.full(nobs, ID_H08IR, np.int32),
        lon=rng.uniform(139.0, 141.0, nobs),
        lat=rng.uniform(34.0, 36.0, nobs),
        lev=np.full(nobs, 9.0),          # channel
        dat=rng.normal(260.0, 10.0, nobs),
        err=np.full(nobs, 1.5),
        typ=np.full(nobs, TYP_H08IRB, np.int32),
        dif=np.zeros(nobs))
    # some members cloudy (negated BT)
    ensval = (obs.dat[None, :] + rng.normal(0, 1.0, (K, nobs))).astype(
        np.float32)
    cloudy = rng.uniform(size=(K, nobs)) < 0.3
    ensval[cloudy] *= -1.0
    qc_in = np.zeros(nobs, np.int32)
    cfg = Config(ensemble=EnsembleConfig(member=K))
    hx_lev = np.full(nobs, 500e2)

    dep_h, hdxb_h, qc_h, _ = qc_and_departures(obs, ensval, qc_in, cfg,
                                               hx_lev=hx_lev)
    dep_d, hdxb_d, qc_d, _ = qc_and_departures(
        obs, jnp.asarray(ensval), qc_in, cfg, hx_lev=hx_lev)
    np.testing.assert_array_equal(qc_h, qc_d)
    np.testing.assert_allclose(dep_h, dep_d, atol=1e-4)
    np.testing.assert_allclose(hdxb_h, np.asarray(hdxb_d), atol=1e-4)
