"""Variable-localization group tests."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.config import (
    Config, LetkfConfig, EnsembleConfig, VarLocalConfig,
)
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.da.letkf_obs import build_obs_context
from scale_letkf_tpu.da.letkf import analyze
from scale_letkf_tpu.obs.types import Observations, ID_T
from scale_letkf_tpu.state import NV3D, IA_T, IA_P, IA_U, IA_Q0


def build_case(var_local=None):
    NZ, NY, NX, K = 3, 10, 10, 32
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=2e3, dy=2e3, dz=500.0,
                        proj=Projection(kind="LC"))
    rng = np.random.default_rng(0)
    gues = np.zeros((K, NV3D, NZ, NY, NX))
    # correlated U and T perturbations so T obs would update U absent
    # variable localization
    base = rng.standard_normal((K, NZ, NY, NX))
    gues[:, IA_T] = 1.0 + base
    gues[:, IA_U] = 2.0 * base
    gues[:, IA_P] = 850e2
    gues = jnp.asarray(gues)
    lon2d, lat2d = grid.lonlat
    jj, ii = np.mgrid[1:NY:2, 1:NX:2]
    nobs = jj.size
    obs = Observations(
        elem=np.full(nobs, ID_T, np.int32),
        lon=lon2d[jj, ii].ravel(), lat=lat2d[jj, ii].ravel(),
        lev=np.full(nobs, 850e2), dat=np.zeros(nobs),
        err=np.full(nobs, 0.5), typ=np.zeros(nobs, np.int32),
        dif=np.zeros(nobs))
    ensval = np.stack([np.asarray(gues[k, IA_T, 1])[jj, ii].ravel()
                       for k in range(K)])
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.0))
    if var_local is not None:
        cfg.var_local = var_local
    cfg.letkf_obs.hori_local = tuple([5.0e3] + [-1.0] * 23)
    ctx = build_obs_context(obs, ensval, np.zeros(nobs, np.int32), cfg, grid)
    z_full = grid.calc_z(jnp.zeros((NY, NX)))
    anal, _, _ = analyze(gues, ctx, cfg, grid, z_full)
    return gues, anal


def test_default_single_group_updates_all():
    gues, anal = build_case()
    dT = float(jnp.abs(anal[:, IA_T] - gues[:, IA_T]).max())
    dU = float(jnp.abs(anal[:, IA_U] - gues[:, IA_U]).max())
    assert dT > 1e-3
    assert dU > 1e-3     # cross-variable update through correlation


def test_var_local_zero_blocks_cross_update():
    """T obs belong to var-local group 1 ('T'); setting that group's factor
    to zero for the wind variables must leave U unchanged while T still
    updates (PARAM_LETKF_VAR_LOCAL semantics)."""
    t_row = [1.0] * NV3D
    t_row[IA_U] = 0.0     # T-group obs do not update U
    t_row[1] = 0.0        # nor V
    vl = VarLocalConfig(t=tuple(t_row))
    gues, anal = build_case(var_local=vl)
    dT = float(jnp.abs(anal[:, IA_T] - gues[:, IA_T]).max())
    dU = float(jnp.abs(anal[:, IA_U] - gues[:, IA_U]).max())
    assert dT > 1e-3, "T no longer updated"
    assert dU < 1e-10, f"U updated despite zero var-local factor: {dU}"


def test_var_local_scaling_reduces_update():
    t_row = [1.0] * NV3D
    t_row[IA_U] = 0.1
    t_row[1] = 0.1
    vl = VarLocalConfig(t=tuple(t_row))
    gues, anal_w = build_case(var_local=vl)
    _, anal_full = build_case()
    dU_w = float(jnp.abs(anal_w[:, IA_U] - gues[:, IA_U]).mean())
    dU_f = float(jnp.abs(anal_full[:, IA_U] - gues[:, IA_U]).mean())
    assert 0 < dU_w < dU_f
