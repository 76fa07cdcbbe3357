"""NOBS_OUT diagnostic field test."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.config import Config, LetkfConfig, EnsembleConfig
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.da.letkf_obs import build_obs_context
from scale_letkf_tpu.da.letkf import analyze
from scale_letkf_tpu.obs.types import Observations, ID_T
from scale_letkf_tpu.state import NV3D, IA_T, IA_P


def test_nobs_field_output():
    NZ, NY, NX, K = 2, 10, 10, 8
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=2e3, dy=2e3, dz=500.0,
                        proj=Projection(kind="LC"))
    rng = np.random.default_rng(0)
    gues = np.zeros((K, NV3D, NZ, NY, NX))
    gues[:, IA_T] = rng.standard_normal((K, NZ, NY, NX))
    gues[:, IA_P] = 850e2
    gues = jnp.asarray(gues)
    lon2d, lat2d = grid.lonlat
    # a single obs in one corner
    obs = Observations(
        elem=np.asarray([ID_T], np.int32),
        lon=np.asarray([lon2d[2, 2]]), lat=np.asarray([lat2d[2, 2]]),
        lev=np.asarray([850e2]), dat=np.asarray([0.0]),
        err=np.asarray([1.0]), typ=np.zeros(1, np.int32),
        dif=np.zeros(1))
    ensval = np.asarray(gues[:, IA_T, 0, 2, 2]).reshape(K, 1)   # (K, nobs)
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.0, nobs_out=True))
    cfg.letkf_obs.hori_local = tuple([3.0e3] + [-1.0] * 23)
    ctx = build_obs_context(obs, ensval, np.zeros(1, np.int32), cfg, grid)
    z_full = grid.calc_z(jnp.zeros((NY, NX)))
    _, _, diag = analyze(gues, ctx, cfg, grid, z_full)
    assert diag.nobs_field is not None
    assert diag.nobs_field.shape == (NZ, NY, NX)
    # the obs is seen near (2,2) and nowhere far away
    assert diag.nobs_field[0, 2, 2] == 1
    assert diag.nobs_field[0, 8, 8] == 0
    assert diag.nobs_field.sum() > 0
