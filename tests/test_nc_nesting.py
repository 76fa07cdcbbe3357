"""NetCDF restart compatibility and one-way nesting tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.io.netcdf import write_restart_nc, read_restart_nc
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
from scale_letkf_tpu.model.dycore import to_collocated, DycoreConfig, rk3_step
from scale_letkf_tpu.model.nesting import (
    NestGeometry, parent_to_child, interp_parent_field,
)
from scale_letkf_tpu.model.boundary import (
    relaxation_weight, apply_boundary_relaxation,
)


def test_netcdf_round_trip(tmp_path):
    grid = Grid.uniform(nx=10, ny=8, nz=6, dx=2e3, dy=2e3, dz=500.0)
    s, _, _ = balanced_state(6, 8, 10, 500.0)
    restart = np.asarray(to_collocated(s))
    p = str(tmp_path / "restart.nc")
    topo = np.zeros((8, 10))
    write_restart_nc(p, restart, grid, topo=topo)
    back, coords = read_restart_nc(p)
    np.testing.assert_allclose(back, restart, rtol=1e-6)
    np.testing.assert_allclose(coords["z"], grid.cz)
    assert coords["lon"].shape == (8, 10)
    # file must be a valid HDF5 with netCDF-style dimension scales
    import h5py
    with h5py.File(p, "r") as f:
        assert f["DENS"].dims[0].values()  # scale attached
        assert "units" in f["z"].attrs


def test_interp_parent_identity():
    """ratio=1 nest at origin reproduces the parent exactly."""
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((5, 8, 8)), jnp.float32)
    geom = NestGeometry(i0=0.0, j0=0.0, ratio=1)
    cj, ci = geom.child_coords(8, 8)
    out = interp_parent_field(f, cj, ci)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_interp_linear_field_exact():
    """Bilinear interpolation is exact on linear fields at refined points."""
    nz, ny, nx = 3, 10, 10
    k, j, i = np.mgrid[0:nz, 0:ny, 0:nx]
    f = jnp.asarray(2.0 * i + 3.0 * j - k, jnp.float32)
    geom = NestGeometry(i0=2.0, j0=3.0, ratio=2)
    cj, ci = geom.child_coords(6, 6)
    out = np.asarray(interp_parent_field(f, cj, ci))
    expect = (2.0 * ci[None, None, :] + 3.0 * cj[None, :, None]
              - np.arange(nz)[:, None, None])
    np.testing.assert_allclose(out, expect, rtol=1e-5)


@pytest.mark.slow
def test_one_way_nested_run():
    """Child driven by parent boundary stays stable and tracks the parent's
    large-scale state in the buffer zone."""
    # parent: coarse 4-km grid; child: 2-km, ratio 2, inside parent
    NZP, NYP, NXP = 10, 16, 16
    NZC, NYC, NXC = 10, 16, 16
    dzp = 500.0
    sp, rho_ref, p_ref = balanced_state(NZP, NYP, NXP, dzp)
    sp = add_warm_bubble(sp, dzp, 4000.0, 4000.0, amplitude=2.0,
                         center=(32e3, 32e3, 2e3), radius=(8e3, 8e3, 2e3))
    cfgp = DycoreConfig(dx=4000.0, dy=4000.0, dz=dzp, dt=1.0,
                        ztop=NZP * dzp)
    cfgc = DycoreConfig(dx=2000.0, dy=2000.0, dz=dzp, dt=1.0,
                        ztop=NZC * dzp)
    zc = jnp.asarray((np.arange(NZP) + 0.5) * dzp, jnp.float32)

    geom = NestGeometry(i0=4.0, j0=4.0, ratio=2)
    child = parent_to_child(sp, geom, (NZC, NYC, NXC))
    w2d = relaxation_weight(NYC, NXC, width=4, tau=5.0)

    stepp = jax.jit(lambda s: rk3_step(s, cfgp, rho_ref, p_ref, zc))
    stepc = jax.jit(lambda s: rk3_step(s, cfgc, rho_ref, p_ref, zc))

    parent, ch = sp, child
    for _ in range(30):
        parent = stepp(parent)
        target = parent_to_child(parent, geom, (NZC, NYC, NXC))
        ch = stepc(ch)
        ch = apply_boundary_relaxation(ch, target, w2d, cfgc.dt)

    for f in ch:
        assert np.isfinite(np.asarray(f)).all()
    # child boundary zone matches the parent's interpolated state closely
    tgt = parent_to_child(parent, geom, (NZC, NYC, NXC))
    edge_err = float(jnp.abs(ch.rhot[:, 0, :] - tgt.rhot[:, 0, :]).max())
    rhot_scale = float(jnp.abs(tgt.rhot).max())
    assert edge_err / rhot_scale < 0.01
