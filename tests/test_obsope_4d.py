"""4-D obsope (time slots) and lateral-boundary relaxation tests."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import Config, ObsOpeConfig, EnsembleConfig
from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.obs.types import Observations, ID_T, QC_GOOD, QC_TIME
from scale_letkf_tpu.da.obsope import obsope_ensemble, assign_slots


def test_assign_slots():
    cfg = Config(obsope=ObsOpeConfig(slot_start=1, slot_end=3, slot_base=2,
                                     slot_tinterval=600.0))
    dif = np.asarray([-600.0, -300.0, 0.0, 299.0, 301.0, 600.0])
    slots = assign_slots(dif, cfg)
    # ceil(dif/T - 0.5) + base (obsope_tools.f90:256); exact half-interval
    # boundaries (dif = -300) fall to the earlier slot
    np.testing.assert_array_equal(slots, [1, 1, 2, 2, 3, 3])


def test_obsope_slot_selection():
    """Obs must be evaluated against the history state of their own slot."""
    nz, ny, nx, K, S = 4, 8, 8, 3, 3
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2e3, dy=2e3, dz=500.0)
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 obsope=ObsOpeConfig(slot_start=1, slot_end=3, slot_base=2,
                                     slot_tinterval=600.0))

    # fields with a slot axis: T differs by slot (sentinel values)
    shape = (K, S, nz, ny, nx)
    f = {}
    f["t"] = jnp.broadcast_to(
        (250.0 + 10.0 * jnp.arange(S))[None, :, None, None, None], shape)
    f["p"] = jnp.broadcast_to(
        (1e5 * np.exp(-np.arange(nz) / 7.0))[None, None, :, None, None],
        shape)
    for n in ("u", "v", "w", "q", "qc", "qr", "qi", "qs", "qg", "rh"):
        f[n] = jnp.zeros(shape)
    f["hgt"] = jnp.broadcast_to(
        ((np.arange(nz) + 0.5) * 500.0)[None, None, :, None, None], shape)
    f["topo"] = jnp.zeros((K, S, ny, nx))
    f["ps"] = f["p"][:, :, 0]
    f["t2m"] = f["t"][:, :, 0]
    f["q2m"] = jnp.zeros((K, S, ny, nx))
    f["u10m"] = jnp.zeros((K, S, ny, nx))
    f["v10m"] = jnp.zeros((K, S, ny, nx))

    lon2d, lat2d = grid.lonlat
    # 4 obs in slots 1, 2, 3 and one outside the window
    dif = np.asarray([-600.0, 0.0, 600.0, 4000.0])
    nobs = len(dif)
    obs = Observations(
        elem=np.full(nobs, ID_T, np.int32),
        lon=np.full(nobs, lon2d[4, 4]), lat=np.full(nobs, lat2d[4, 4]),
        lev=np.full(nobs, 800e2), dat=np.zeros(nobs),
        err=np.ones(nobs), typ=np.zeros(nobs, np.int32), dif=dif)
    slots = assign_slots(dif, cfg)
    z_full = grid.calc_z(jnp.zeros((ny, nx)))

    res = obsope_ensemble(f, obs, grid, cfg, z_full, slots=slots)
    # slot sentinel temperatures: slot 1 → 250, slot 2 → 260, slot 3 → 270
    np.testing.assert_allclose(res.ensval[0, 0], 250.0, atol=1e-4)
    np.testing.assert_allclose(res.ensval[0, 1], 260.0, atol=1e-4)
    np.testing.assert_allclose(res.ensval[0, 2], 270.0, atol=1e-4)
    assert res.qc[3] == QC_TIME        # outside the window
    assert (res.qc[:3] == QC_GOOD).all()


def test_boundary_relaxation():
    from scale_letkf_tpu.model.boundary import (
        relaxation_weight, apply_boundary_relaxation, BoundaryData,
        interp_boundary,
    )
    from scale_letkf_tpu.model.ideal import balanced_state
    nz, ny, nx, dz = 4, 16, 16, 500.0
    s, _, _ = balanced_state(nz, ny, nx, dz)
    target = s._replace(rhot=s.rhot + 5.0)
    w = relaxation_weight(ny, nx, width=4, tau=10.0)
    np.testing.assert_allclose(float(w[0, 0]), 0.1, rtol=1e-6)  # edge rate
    assert float(w[8, 8]) == 0.0       # zero in the interior

    out = s
    for _ in range(200):
        out = apply_boundary_relaxation(out, target, w, dt=1.0)
    d = np.asarray(out.rhot - s.rhot)
    # edge converged to the target, interior untouched
    np.testing.assert_allclose(d[:, 0, 0], 5.0, atol=1e-3)
    np.testing.assert_allclose(d[:, 8, 8], 0.0, atol=1e-12)
    # monotone transition (within f32 convergence noise at saturated cells)
    assert d[0, 0, 0] >= d[0, 2, 2] - 1e-3
    assert d[0, 2, 2] >= d[0, 4, 4] >= 0

    # time interpolation of boundary data
    bdy = BoundaryData(state0=s, state1=target, t0=0.0, t1=100.0)
    mid = interp_boundary(bdy, 50.0)
    np.testing.assert_allclose(np.asarray(mid.rhot),
                               np.asarray(s.rhot) + 2.5, atol=1e-4)
