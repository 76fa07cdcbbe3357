"""Capacity-bounded obs selection at radar densities.

The reference bounds per-gridpoint obs work with an incremental-radius
search + QUICKSELECT (letkf_tools.f90:1479-1617). Here the equivalent HBM
bound is the per-cell bucket capacity: at PAWR density (HORI_LOCAL = 1 km,
BDA_d3 config.nml.letkf:38) the unbounded candidate width 9·max_cell_count
would blow device memory; with max_capacity the width is 9·cap independent
of obs density."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.config import Config, EnsembleConfig, LetkfConfig
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.ops.obs_select import build_buckets
from scale_letkf_tpu.da.letkf_obs import build_obs_context
from scale_letkf_tpu.da.letkf import analyze
from scale_letkf_tpu.obs.types import (
    Observations, ID_RADAR_REF, TYP_PHARAD,
)
from scale_letkf_tpu.state import NV3D, IA_T, IA_P


def test_stratified_thinning_is_even():
    rng = np.random.default_rng(0)
    # 100 obs in one cell, 10 in another
    x = np.concatenate([rng.uniform(0, 0.9, 100), rng.uniform(1.1, 1.9, 10)])
    y = np.full(110, 0.5)
    b = build_buckets(x, y, 0.0, 0.0, 2.0, 1.0, spacing=1.0,
                      max_capacity=8)
    assert b.table.shape[-1] == 8
    cell0 = b.table[0, 0]
    cell1 = b.table[0, 1]
    assert (cell0 >= 0).sum() == 8          # overflowing cell capped
    assert (cell1 >= 0).sum() == 10 or b.table.shape[-1] >= 10 or \
        (cell1 >= 0).sum() == 8             # small cell fits (cap 8 < 10!)
    assert b.n_dropped == 100 - 8 + 2       # 92 thinned + 2 over cap
    # kept obs of the big cell are spread across its population (stratified,
    # not first-k): indices should span most of 0..99
    kept = np.sort(cell0[cell0 >= 0])
    assert kept[-1] > 80 and kept[0] < 20


def test_radar_density_bounded_context_and_analysis():
    """2×10⁵ radar obs, 1-km localization: bucket table stays small, the
    analysis runs, and per-gridpoint selections respect the obs limit."""
    NZ, NY, NX, K = 2, 48, 48, 4
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=1000.0, dy=1000.0,
                        dz=500.0, proj=Projection(kind="LC"))
    rng = np.random.default_rng(0)
    nobs = 200_000
    lon2d, lat2d = grid.lonlat
    # random positions inside the domain (fractional grid coords)
    ri = rng.uniform(1, NX - 2, nobs)
    rj = rng.uniform(1, NY - 2, nobs)
    lon, lat = grid.ij_to_lonlat(ri, rj)
    obs = Observations(
        elem=np.full(nobs, ID_RADAR_REF, np.int32),
        lon=np.asarray(lon), lat=np.asarray(lat),
        lev=rng.uniform(200.0, 800.0, nobs),
        dat=10.0 ** (0.1 * rng.uniform(16.0, 45.0, nobs)),  # linear Z
        err=np.full(nobs, 5.0),
        typ=np.full(nobs, TYP_PHARAD, np.int32),
        dif=np.zeros(nobs),
        meta=np.asarray([135.0, 35.0, 0.0]))

    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.0))
    hl = [500.0e3] + [-1.0] * 23
    hl[TYP_PHARAD] = 1.0e3                 # BDA PAWR localization
    cfg.letkf_obs.hori_local = tuple(hl)
    mx = [0] + [-1] * 23
    mx[TYP_PHARAD] = 30
    cfg.letkf_obs.max_nobs_per_grid = tuple(mx)
    vl = list(cfg.letkf_obs.vert_local)
    vl[TYP_PHARAD] = 1000.0
    cfg.letkf_obs.vert_local = tuple(vl)

    ensval = 20.0 + rng.standard_normal((K, nobs))
    ctx = build_obs_context(obs, ensval, np.zeros(nobs, np.int32), cfg,
                            grid)
    assert len(ctx.ctypes) >= 1
    for ct in ctx.ctypes:
        cap = ct.buckets.table.shape[-1]
        assert cap <= 60, cap              # 2 × max_nobs bound
        # candidate width bound ⇒ device arrays stay small: (B, 9·cap)
        assert 9 * cap * NY * NX * 4 < 50e6
        assert ct.buckets.n_dropped > 0    # thinning actually engaged

    gues = np.zeros((K, NV3D, NZ, NY, NX))
    gues[:, IA_T] = 280.0 + rng.standard_normal((K, NZ, NY, NX))
    gues[:, IA_P] = 850e2
    z_full = grid.calc_z(jnp.zeros((NY, NX)))
    anal, _, diag = analyze(jnp.asarray(gues), ctx, cfg, grid, z_full)
    assert np.isfinite(np.asarray(anal)).all()
    # per-gridpoint local obs counts respect the configured limit
    assert diag.nobs_per_level.max() <= 30 + 1e-6


def _sparse_case(sort_spacing=None):
    """Small conventional-density case where no capacity bound binds, so
    coarse (nsch=1) and fine (nsch>1) sort meshes must select EXACTLY the
    same local obs."""
    from scale_letkf_tpu.obs.types import ID_T
    NZ, NY, NX, K = 2, 16, 16, 4
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=2000.0, dy=2000.0,
                        dz=500.0, proj=Projection(kind="LC"))
    rng = np.random.default_rng(3)
    nobs = 300
    ri = rng.uniform(1, NX - 2, nobs)
    rj = rng.uniform(1, NY - 2, nobs)
    lon, lat = grid.ij_to_lonlat(ri, rj)
    obs = Observations(
        elem=np.full(nobs, ID_T, np.int32),
        lon=np.asarray(lon), lat=np.asarray(lat),
        lev=np.full(nobs, 850e2),
        dat=280.0 + rng.standard_normal(nobs),
        err=np.full(nobs, 1.0),
        typ=np.zeros(nobs, np.int32), dif=np.zeros(nobs))
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.0))
    cfg.letkf_obs.hori_local = tuple([6.0e3] + [-1.0] * 23)
    if sort_spacing is not None:
        cfg.letkf_obs.obs_sort_grid_spacing = tuple(
            [sort_spacing] + [-1.0] * 23)
    ensval = 280.0 + rng.standard_normal((K, nobs))
    ctx = build_obs_context(obs, ensval, np.zeros(nobs, np.int32), cfg,
                            grid)
    gues = np.zeros((K, NV3D, NZ, NY, NX))
    gues[:, IA_T] = 280.0 + rng.standard_normal((K, NZ, NY, NX))
    gues[:, IA_P] = 850e2
    z_full = grid.calc_z(jnp.zeros((NY, NX)))
    anal, _, diag = analyze(jnp.asarray(gues), ctx, cfg, grid, z_full)
    return ctx, np.asarray(anal), diag


def test_fine_sort_mesh_matches_coarse():
    """OBS_SORT_GRID_SPACING below the cutoff widens the search halo
    (nsch>1) but must reproduce the coarse-mesh analysis exactly (same
    obs within the cutoff disc — letkf_obs.f90:660-695 mesh sizing)."""
    ctx_c, anal_c, diag_c = _sparse_case()                 # spacing=cutoff
    ctx_f, anal_f, diag_f = _sparse_case(sort_spacing=5.0e3)
    assert ctx_c.ctypes[0].buckets.nsch == 1
    assert ctx_f.ctypes[0].buckets.nsch > 1
    assert ctx_f.ctypes[0].buckets.mesh_shape > ctx_c.ctypes[0].buckets.\
        mesh_shape
    np.testing.assert_array_equal(diag_f.nobs_per_level,
                                  diag_c.nobs_per_level)
    np.testing.assert_allclose(anal_f, anal_c, rtol=1e-6, atol=1e-6)
