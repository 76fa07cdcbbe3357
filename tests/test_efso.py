"""EFSO tests: sign convention, localization, energy norm."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.da.efso import (
    efso_impact, energy_weights, localized_sums,
)
from scale_letkf_tpu.state import NV3D, IA_T, IA_U


def test_energy_weights():
    w = energy_weights(NV3D)
    assert w[IA_U] == 0.5
    assert w[IA_T] > 0
    assert (w >= 0).all()


def test_localized_sums_gaussian():
    f = jnp.zeros((1, 1, 1, 21)).at[0, 0, 0, 10].set(1.0)
    out = np.asarray(localized_sums(f, sigma_x=2.0, sigma_y=0, sigma_z=0))
    assert out[0, 0, 0, 10] == out.max()
    np.testing.assert_allclose(out[0, 0, 0, 12] / out[0, 0, 0, 10],
                               np.exp(-0.5), rtol=1e-5)
    assert out[0, 0, 0, 0] == 0.0   # beyond cutoff


def test_efso_sign_convention():
    """A good observation (correct sign innovation, forecast perturbations
    correlated with obs-space perturbations, forecast error of the same
    structure) must get NEGATIVE impact (error reduction), and flipping the
    innovation sign must flip the impact."""
    rng = np.random.default_rng(0)
    K, nz, ny, nx = 16, 4, 12, 12
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2e3, dy=2e3, dz=500.0)

    # forecast T perturbations; the error field ē shares the sign of the
    # ensemble-mean forecast error the obs corrects
    pert = np.zeros((K, NV3D, nz, ny, nx), np.float32)
    base = rng.standard_normal((K, nz, ny, nx)).astype(np.float32)
    base -= base.mean(0, keepdims=True)
    pert[:, IA_T] = base
    err = np.zeros((NV3D, nz, ny, nx), np.float32)
    # forecast is too warm near the obs; ē > 0 there
    err[IA_T, :, 6, 6] = 1.0

    # obs at (6, 6) level 2: observed colder than the gues (dep < 0),
    # hdxa = analysis obs-space perturbations ≈ T perturbations there
    hdxa = base[:, 2, 6, 6][None, :]
    dep = jnp.asarray([-1.0])
    ri = jnp.asarray([6.0]); rj = jnp.asarray([6.0]); rk = jnp.asarray([2.0])
    dj = efso_impact(ri, rj, rk, dep, jnp.asarray([1.0]),
                     jnp.asarray(hdxa), jnp.asarray(pert), jnp.asarray(err),
                     grid, hori_scale=6e3, vert_scale_cells=2.0)
    # dep<0 (obs cools), Σ_k hdxa_k s_k > 0 (pert self-correlation times
    # positive error) → ΔJ < 0: the obs reduces forecast error
    assert float(dj[0]) < 0.0

    dj2 = efso_impact(ri, rj, rk, -dep, jnp.asarray([1.0]),
                      jnp.asarray(hdxa), jnp.asarray(pert), jnp.asarray(err),
                      grid, hori_scale=6e3, vert_scale_cells=2.0)
    np.testing.assert_allclose(float(dj2[0]), -float(dj[0]), rtol=1e-5)


def test_efso_localization_kills_remote_obs():
    rng = np.random.default_rng(1)
    K, nz, ny, nx = 8, 4, 16, 16
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2e3, dy=2e3, dz=500.0)
    pert = np.zeros((K, NV3D, nz, ny, nx), np.float32)
    pert[:, IA_T] = rng.standard_normal((K, nz, ny, nx))
    err = np.zeros((NV3D, nz, ny, nx), np.float32)
    err[IA_T, :, 2, 2] = 1.0          # error concentrated at (2, 2)
    hdxa = rng.standard_normal((1, K)).astype(np.float32)
    # obs far away at (13, 13): with a 2-cell localization scale the
    # Gaussian cutoff excludes the error region entirely
    dj = efso_impact(jnp.asarray([13.0]), jnp.asarray([13.0]),
                     jnp.asarray([2.0]), jnp.asarray([1.0]),
                     jnp.asarray([1.0]), jnp.asarray(hdxa),
                     jnp.asarray(pert), jnp.asarray(err), grid,
                     hori_scale=4e3)
    np.testing.assert_allclose(float(dj[0]), 0.0, atol=1e-10)


def test_advected_localization_shifts_sampling():
    """With advection, an obs samples the localized field downstream of
    itself (loc_advection, efso_tools.f90:158)."""
    import jax.numpy as jnp
    from scale_letkf_tpu.da.efso import advected_obs_coords
    nz, ny, nx = 4, 12, 12
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2e3, dy=2e3, dz=500.0)
    u = jnp.full((nz, ny, nx), 10.0)       # uniform 10 m/s westerly
    v = jnp.zeros((nz, ny, nx))
    ri = jnp.asarray([5.0])
    rj = jnp.asarray([6.0])
    rk = jnp.asarray([1.0])
    ri2, rj2 = advected_obs_coords(ri, rj, rk, u, v, grid,
                                   adv_time=600.0, locadv_rate=1.0)
    # 10 m/s × 600 s = 6 km = 3 cells downstream in x, none in y
    np.testing.assert_allclose(np.asarray(ri2), [8.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rj2), [6.0], atol=1e-6)


def test_efso_impact_with_advection_moves_sensitivity():
    """An error feature downstream of the obs is only attributed to the obs
    when advected localization carries the sampling there."""
    rng = np.random.default_rng(1)
    K, nz, ny, nx = 8, 2, 16, 16
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2e3, dy=2e3, dz=500.0)
    pert = np.zeros((K, NV3D, nz, ny, nx), np.float32)
    err = np.zeros((NV3D, nz, ny, nx), np.float32)
    # feature (perturbations + error) localized at x-index 13; obs at 3
    feat = np.exp(-0.5 * ((np.arange(nx) - 13.0) / 1.0) ** 2)
    sgn = rng.choice([-1.0, 1.0], K)
    pert[:, IA_T] = (sgn[:, None, None, None]
                     * feat[None, None, None, :])
    err[IA_T] = feat[None, None, :]
    hdxa = np.asarray(sgn)[None, :] * np.ones((1, K))
    obs_ri = jnp.asarray([3.0])
    obs_rj = jnp.asarray([8.0])
    obs_rk = jnp.asarray([0.5])
    dep = jnp.asarray([1.0])
    rdiag = jnp.asarray([1.0])
    kw = dict(hori_scale=3.0e3, vert_scale_cells=0.0)
    dj0 = efso_impact(obs_ri, obs_rj, obs_rk, dep, rdiag,
                      jnp.asarray(hdxa), jnp.asarray(pert),
                      jnp.asarray(err), grid, **kw)
    u = jnp.full((nz, ny, nx), (10.0 * 2e3) / 600.0)  # carries 3 → 13
    v = jnp.zeros((nz, ny, nx))
    dj1 = efso_impact(obs_ri, obs_rj, obs_rk, dep, rdiag,
                      jnp.asarray(hdxa), jnp.asarray(pert),
                      jnp.asarray(err), grid,
                      u_adv=u, v_adv=v, adv_time=600.0, **kw)
    # essentially no overlap without advection; the advected sampling
    # attributes the downstream feature to the obs
    assert abs(float(dj1[0])) > 50.0 * abs(float(dj0[0]))
    assert abs(float(dj1[0])) > 1e-3
