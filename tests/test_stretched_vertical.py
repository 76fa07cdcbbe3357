"""Stretched vertical levels (the reference's FZ grids, PARAM_GRID via
scale_calc_z, common_scale.f90:1434-1470) through the explicit, terrain, and
split-explicit cores."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.model.dycore import (
    DycoreConfig, VGrid, make_vgrid, rk3_step, integrate, tendencies,
)
from scale_letkf_tpu.model.dycore_si import (
    SplitConfig, rk3_step_si, integrate_si,
)
from scale_letkf_tpu.model.terrain import make_metrics, rk3_step_terrain
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble

NZ, NY, NX = 12, 8, 8
DX = DY = 2000.0


def uniform_setup(dz=500.0):
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, dz)
    s = add_warm_bubble(s, dz, DX, DY, amplitude=2.0)
    zc = jnp.asarray((np.arange(NZ) + 0.5) * dz, jnp.float32)
    cfg = DycoreConfig(dx=DX, dy=DY, dz=dz, dt=0.5, ztop=NZ * dz)
    return s, rho_ref, p_ref, zc, cfg


def stretched_setup(dz0=300.0, stretch=1.12):
    grid = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=dz0,
                          stretch=stretch)
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, dz0, cz=grid.cz)
    zc = jnp.asarray(grid.cz, jnp.float32)
    vg = make_vgrid(grid.cz, grid.fz)
    cfg = DycoreConfig(dx=DX, dy=DY, dz=dz0, dt=0.5, ztop=grid.ztop)
    return grid, s, rho_ref, p_ref, zc, vg, cfg


def test_uniform_vgrid_matches_scalar_dz():
    """A VGrid built from uniform levels must reproduce the scalar-dz path
    exactly (same discretization, just array-valued spacings)."""
    s, rho_ref, p_ref, zc, cfg = uniform_setup()
    vg = make_vgrid(np.asarray(zc), np.arange(NZ + 1) * 500.0)
    ref = rk3_step(s, cfg, rho_ref, p_ref, zc)
    out = rk3_step(s, cfg, rho_ref, p_ref, zc, vg)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_uniform_vgrid_matches_scalar_dz_si():
    s, rho_ref, p_ref, zc, cfg = uniform_setup()
    vg = make_vgrid(np.asarray(zc), np.arange(NZ + 1) * 500.0)
    split = SplitConfig(dtau=0.5)
    ref = rk3_step_si(s, cfg, split, rho_ref, p_ref, zc, 4)
    out = rk3_step_si(s, cfg, split, rho_ref, p_ref, zc, 4, vg)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_stretched_balanced_state_stays_quiet_explicit():
    """Hydrostatic balance on a stretched column: w stays ~0 without a
    bubble (discrete balance consistent with the stretched operators)."""
    grid, s, rho_ref, p_ref, zc, vg, cfg = stretched_setup()
    out = integrate(s, cfg, rho_ref, p_ref, zc, 20, vg)
    w_max = float(jnp.abs(out.rhow).max())
    assert np.isfinite(np.asarray(out.rhot)).all()
    assert w_max < 1e-3, w_max


def test_stretched_balanced_state_stays_quiet_si():
    grid, s, rho_ref, p_ref, zc, vg, cfg = stretched_setup()
    split = SplitConfig(dtau=0.5)
    out = integrate_si(s, cfg, split, rho_ref, p_ref, zc, 20, 4, vg=vg)
    w_max = float(jnp.abs(out.rhow).max())
    assert np.isfinite(np.asarray(out.rhot)).all()
    assert w_max < 1e-3, w_max


def test_stretched_bubble_rises_and_stays_stable():
    """Warm bubble on stretched levels: rises, stays finite, conserves
    mass, in both explicit and SI cores, and the two agree closely."""
    grid, s, rho_ref, p_ref, zc, vg, cfg = stretched_setup()
    s = add_warm_bubble(s, 300.0, DX, DY, amplitude=2.0,
                        center=(NX * DX / 2, NY * DY / 2, 800.0),
                        radius=(3e3, 3e3, 500.0))
    mass0 = float(jnp.sum(s.rho * vg.dzc))
    out_ex = integrate(s, cfg, rho_ref, p_ref, zc, 40, vg)
    split = SplitConfig(dtau=0.5)
    out_si = integrate_si(s, cfg, split, rho_ref, p_ref, zc, 40, 1, vg=vg)
    for out in (out_ex, out_si):
        assert np.isfinite(np.asarray(out.rhot)).all()
        mass1 = float(jnp.sum(out.rho * vg.dzc))
        assert abs(mass1 - mass0) / mass0 < 1e-5
        # updraft developed where the bubble is
        assert float(out.rhow[2:6].max()) > 1e-3
    np.testing.assert_allclose(np.asarray(out_si.rhot),
                               np.asarray(out_ex.rhot), rtol=5e-4, atol=0.5)


def test_stretched_terrain_flat_reduces_to_flat_core():
    grid, s, rho_ref, p_ref, zc, vg, cfg = stretched_setup()
    s = add_warm_bubble(s, 300.0, DX, DY, amplitude=2.0)
    m = make_metrics(jnp.zeros((NY, NX)), grid.cz, grid.fz, DX, DY)
    ref = rk3_step(s, cfg, rho_ref, p_ref, zc, vg)
    out = rk3_step_terrain(s, cfg, rho_ref, p_ref, zc, m, vg=vg)
    for a, b in zip(ref, out):
        # f32 rounding differs between the jitted flat step and the eager
        # terrain step (identical tendencies verified exactly in f64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-4)


def test_si_terrain_slow_tendencies():
    """SI core with terrain slow tendencies on stretched levels runs stable
    over a gentle hill and reduces to the flat SI core when topo = 0."""
    grid, s, rho_ref, p_ref, zc, vg, cfg = stretched_setup()
    m0 = make_metrics(jnp.zeros((NY, NX), jnp.float32), grid.cz, grid.fz,
                      DX, DY)
    split = SplitConfig(dtau=0.5)
    ref = rk3_step_si(s, cfg, split, rho_ref, p_ref, zc, 4, vg)
    out0 = rk3_step_si(s, cfg, split, rho_ref, p_ref, zc, 4, vg, m0)
    for a, b in zip(ref, out0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    x = (np.arange(NX) + 0.5) * DX
    y = (np.arange(NY) + 0.5) * DY
    hill = 200.0 * np.exp(-(((x[None] - NX * DX / 2) / 6e3) ** 2
                            + ((y[:, None] - NY * DY / 2) / 6e3) ** 2))
    m = make_metrics(jnp.asarray(hill, jnp.float32), grid.cz, grid.fz,
                     DX, DY)
    out = integrate_si(s, cfg, split, rho_ref, p_ref, zc, 20, 4,
                       vg=vg, metrics=m)
    assert np.isfinite(np.asarray(out.rhot)).all()
    assert float(jnp.abs(out.rhow).max()) < 50.0
