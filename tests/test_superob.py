"""Radar superobbing tests."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.obs.types import (
    Observations, ID_RADAR_REF, ID_RADAR_VR, TYP_PHARAD,
)
from scale_letkf_tpu.obs.superob import superob_radar
from scale_letkf_tpu.ops.letkf_core import letkf_core


def make_dense_radar(grid, n_per_box=20, seed=0):
    rng = np.random.default_rng(seed)
    lon2d, lat2d = grid.lonlat
    # cluster many obs around a handful of box centers
    # z centers inside (not on) the 500-m box boundaries
    centers = [(4, 4, 2250.0), (10, 10, 4250.0), (4, 10, 2250.0)]
    recs = []
    for cx, cy, cz in centers:
        for _ in range(n_per_box):
            recs.append((lon2d[cy, cx] + rng.uniform(-0.001, 0.001),
                         lat2d[cy, cx] + rng.uniform(-0.001, 0.001),
                         cz + rng.uniform(-100, 100),
                         30.0 + rng.standard_normal()))
    n = len(recs)
    return Observations(
        elem=np.full(n, ID_RADAR_REF, np.int32),
        lon=np.asarray([r[0] for r in recs]),
        lat=np.asarray([r[1] for r in recs]),
        lev=np.asarray([r[2] for r in recs]),
        dat=np.asarray([r[3] for r in recs]),
        err=np.full(n, 5.0),
        typ=np.full(n, TYP_PHARAD, np.int32),
        dif=np.zeros(n))


def test_superob_reduces_and_averages():
    grid = Grid.uniform(nx=16, ny=16, nz=10, dx=2e3, dy=2e3, dz=500.0)
    obs = make_dense_radar(grid)
    out = superob_radar(obs, grid, box_xy=2e3, box_z=500.0)
    # 3 clusters → 3 superobs
    assert out.nobs == 3
    # values near the cluster mean (30 dBZ)
    np.testing.assert_allclose(out.dat, 30.0, atol=1.5)
    # error reduced by averaging but floored
    assert (out.err < 5.0).all()
    assert (out.err >= 2.5 - 1e-12).all()
    assert (out.typ == TYP_PHARAD).all()


def test_superob_separates_variables():
    grid = Grid.uniform(nx=16, ny=16, nz=10, dx=2e3, dy=2e3, dz=500.0)
    obs = make_dense_radar(grid)
    obs2 = obs.select(slice(None))
    obs2.elem[:] = ID_RADAR_VR
    both = Observations.concatenate([obs, obs2])
    out = superob_radar(both, grid, box_xy=2e3, box_z=500.0)
    assert out.nobs == 6
    assert (out.elem == ID_RADAR_REF).sum() == 3
    assert (out.elem == ID_RADAR_VR).sum() == 3


def test_general_removal():
    from scale_letkf_tpu.obs.superob import general_removal
    grid = Grid.uniform(nx=16, ny=16, nz=10, dx=2e3, dy=2e3, dz=500.0)
    obs = make_dense_radar(grid)
    obs2 = obs.select(slice(None))
    obs2.elem[:] = ID_RADAR_VR
    both = Observations.concatenate([obs, obs2])
    out = general_removal(both, [(TYP_PHARAD, ID_RADAR_VR)])
    assert out.nobs == obs.nobs
    assert (out.elem == ID_RADAR_REF).all()
    # wildcard drops the whole report type
    out2 = general_removal(both, [(TYP_PHARAD, -1)])
    assert out2.nobs == 0


def test_superob_vertical_collapses_columns():
    """A multi-level platform column (same horizontal position) collapses
    into box_z vertical bins; distinct platforms stay separate."""
    from scale_letkf_tpu.obs.superob import superob_vertical
    n_lev = 12
    recs = []
    for plon in (135.0, 136.0):
        for k in range(n_lev):
            recs.append((plon, 35.0, 200.0 + 250.0 * k, 20.0 + k))
    n = len(recs)
    obs = Observations(
        elem=np.full(n, ID_RADAR_REF, np.int32),
        lon=np.asarray([r[0] for r in recs]),
        lat=np.asarray([r[1] for r in recs]),
        lev=np.asarray([r[2] for r in recs]),
        dat=np.asarray([r[3] for r in recs]),
        err=np.full(n, 5.0),
        typ=np.full(n, TYP_PHARAD, np.int32), dif=np.zeros(n))
    out = superob_vertical(obs, box_z=1000.0)
    # 12 levels over 200..2950 m → 3 boxes (0-1km, 1-2km, 2-3km) per platform
    assert out.nobs == 6
    # averaged value of the first box ≈ mean of its member levels
    first = out.dat[np.argsort(out.lev)][0]
    assert 20.0 <= first <= 23.5
    assert (out.err < 5.0).all()


def test_superob_temporal_windows():
    """Repeated reports of one place/level within a time box average into
    one; reports in different boxes stay separate."""
    from scale_letkf_tpu.obs.superob import superob_temporal
    n_rep = 10
    difs = np.concatenate([np.linspace(0, 25, n_rep),        # box 0
                           np.linspace(35, 55, n_rep)])      # box 1
    n = len(difs)
    obs = Observations(
        elem=np.full(n, ID_RADAR_REF, np.int32),
        lon=np.full(n, 135.0), lat=np.full(n, 35.0),
        lev=np.full(n, 2000.0),
        dat=np.concatenate([np.full(n_rep, 30.0), np.full(n_rep, 40.0)]),
        err=np.full(n, 5.0),
        typ=np.full(n, TYP_PHARAD, np.int32), dif=difs)
    out = superob_temporal(obs, box_t=30.0)
    assert out.nobs == 2
    np.testing.assert_allclose(np.sort(out.dat), [30.0, 40.0])


def test_superob_pipeline_order():
    """The chained pipeline applies removal → vertical → grid."""
    from scale_letkf_tpu.obs.superob import superob
    grid = Grid.uniform(nx=16, ny=16, nz=10, dx=2e3, dy=2e3, dz=500.0)
    obs = make_dense_radar(grid)
    obs2 = obs.select(slice(None))
    obs2.elem[:] = ID_RADAR_VR
    both = Observations.concatenate([obs, obs2])
    out = superob(both, grid, drop=[(TYP_PHARAD, ID_RADAR_VR)],
                  box_xy=2e3, box_z=500.0)
    assert out.nobs == 3
    assert (out.elem == ID_RADAR_REF).all()


def test_jacobi_backend_in_letkf_core():
    rng = np.random.default_rng(0)
    B, L, K = 8, 20, 8
    hdxb = jnp.asarray(rng.standard_normal((B, L, K)))
    rdiag = jnp.asarray(rng.uniform(0.5, 2.0, (B, L)))
    rloc = jnp.asarray(rng.uniform(0.05, 1.0, (B, L)))
    dep = jnp.asarray(rng.standard_normal((B, L)))
    infl = jnp.ones(B)
    a = letkf_core(hdxb, rdiag, rloc, dep, infl, infl_update=True)
    b = letkf_core(hdxb, rdiag, rloc, dep, infl, infl_update=True,
                   eigh_impl="jacobi")
    np.testing.assert_allclose(np.asarray(b.trans), np.asarray(a.trans),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(b.transm), np.asarray(a.transm),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(b.infl), np.asarray(a.infl),
                               rtol=1e-10)
