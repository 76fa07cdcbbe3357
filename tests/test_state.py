"""State transform tests: round-trip and thermodynamic consistency."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.state import (
    state_trans, state_trans_inv, state_to_history, relative_humidity,
    ensemble_mean, ensemble_spread, IA_T, IA_P, IR_RHO, IR_RHOT, NV3D,
)
from scale_letkf_tpu.constants import RD, PRE00, CVDRY
from scale_letkf_tpu.grid import Grid


def make_restart(rng, shape=(6, 8, 8)):
    nz, ny, nx = shape
    rho = 1.0 + 0.2 * rng.uniform(size=(nz, ny, nx))
    u = rng.standard_normal((nz, ny, nx)) * 10
    v = rng.standard_normal((nz, ny, nx)) * 10
    w = rng.standard_normal((nz, ny, nx))
    theta = 300.0 + rng.uniform(size=(nz, ny, nx)) * 20
    q = np.abs(rng.uniform(size=(6, nz, ny, nx))) * 1e-3
    vars_ = np.stack([rho, rho * u, rho * v, rho * w, rho * theta])
    return np.concatenate([vars_, q], axis=0)


def test_round_trip():
    rng = np.random.default_rng(0)
    restart = jnp.asarray(make_restart(rng))
    anal = state_trans(restart)
    back = state_trans_inv(anal)
    np.testing.assert_allclose(back, restart, rtol=1e-12)


def test_round_trip_batched():
    rng = np.random.default_rng(1)
    restart = jnp.stack([jnp.asarray(make_restart(rng)) for _ in range(4)])
    anal = state_trans(restart)
    assert anal.shape == restart.shape
    back = state_trans_inv(anal)
    np.testing.assert_allclose(back, restart, rtol=1e-12)


def test_dry_ideal_gas_consistency():
    """With q=0: p = ρ R T and p = PRE00 (ρθ Rd/PRE00)^(cp/cv)."""
    nz, ny, nx = 4, 4, 4
    rho = np.full((nz, ny, nx), 1.1)
    theta = np.full((nz, ny, nx), 300.0)
    restart = np.zeros((NV3D, nz, ny, nx))
    restart[IR_RHO] = rho
    restart[IR_RHOT] = rho * theta
    anal = np.asarray(state_trans(jnp.asarray(restart)))
    cp = CVDRY + RD
    p_expect = PRE00 * (rho * theta * RD / PRE00) ** (cp / CVDRY)
    np.testing.assert_allclose(anal[IA_P], p_expect, rtol=1e-12)
    np.testing.assert_allclose(anal[IA_P], rho * RD * anal[IA_T], rtol=1e-12)


def test_positive_definite_clipping():
    rng = np.random.default_rng(2)
    restart = make_restart(rng)
    anal = np.array(state_trans(jnp.asarray(restart)))
    anal[5] -= 2e-3  # make qv negative somewhere
    anal[6] -= 1e-3
    back = np.asarray(state_trans_inv(jnp.asarray(anal),
                                      positive_definite_q=True,
                                      positive_definite_qhyd=True))
    assert (back[5] >= 0).all() and (back[6] >= 0).all()


def test_state_to_history_fields():
    rng = np.random.default_rng(3)
    restart = jnp.asarray(make_restart(rng, (6, 8, 10)))
    anal = state_trans(restart)
    grid = Grid.uniform(nx=10, ny=8, nz=6, dx=1e3, dy=1e3, dz=500.0)
    topo = jnp.zeros((8, 10))
    z = grid.calc_z(topo)
    h = state_to_history(anal, z)
    assert h["u"].shape == (6, 8, 10)
    assert h["ps"].shape == (8, 10)
    # surface pressure: hydrostatic extrapolation below level 1 — larger
    # than the level-1 pressure by roughly the level-1 column weight
    assert (np.asarray(h["ps"]) > np.asarray(h["p"][0])).all()
    from scale_letkf_tpu.constants import GRAV, RD
    approx = np.asarray(h["p"][0]) * np.exp(
        GRAV * 250.0 / (RD * np.asarray(h["t"][0])))
    np.testing.assert_allclose(np.asarray(h["ps"]), approx, rtol=2e-3)
    # screen diagnostics: 10-m wind is a log-profile reduction of level 1;
    # 2-m temperature is warmer than level-1 T (dry-adiabatic descent)
    assert (np.abs(np.asarray(h["u10m"]))
            <= np.abs(np.asarray(h["u"][0])) + 1e-12).all()
    assert (np.asarray(h["t2m"]) >= np.asarray(h["t"][0]) - 1e-6).all()
    np.testing.assert_allclose(h["hgt"][:, 0, 0], grid.cz)
    assert (h["rh"] >= 0).all()


def test_rh_saturation():
    # at saturation qv == qs → RH = 100
    t = jnp.asarray([290.0])
    p = jnp.asarray([9.0e4])
    from scale_letkf_tpu.constants import PSAT0, TETENS_A_LIQ, TETENS_B_LIQ, T00
    es = PSAT0 * np.exp(TETENS_A_LIQ * (290.0 - T00) / (290.0 - TETENS_B_LIQ))
    qs = 0.622 * es / (9.0e4 - 0.378 * es)
    rh = relative_humidity(t, p, jnp.asarray([qs]))
    np.testing.assert_allclose(rh, 100.0, rtol=1e-10)


def test_terrain_following_z():
    grid = Grid.uniform(nx=4, ny=4, nz=10, dx=1e3, dy=1e3, dz=1000.0)
    topo = np.zeros((4, 4))
    topo[1, 1] = 500.0
    z = np.asarray(grid.calc_z(jnp.asarray(topo)))
    # flat column: z = cz
    np.testing.assert_allclose(z[:, 0, 0], grid.cz)
    # over terrain: surface-following at bottom, ztop preserved at top
    assert z[0, 1, 1] > z[0, 0, 0]
    zf = np.asarray(grid.calc_z_faces(jnp.asarray(topo)))
    np.testing.assert_allclose(zf[-1, 1, 1], grid.ztop)
    np.testing.assert_allclose(zf[0, 1, 1], 500.0)


def test_ens_mean_spread():
    rng = np.random.default_rng(4)
    ens = rng.standard_normal((16, 3, 4, 4))
    np.testing.assert_allclose(ensemble_mean(jnp.asarray(ens)), ens.mean(0),
                               rtol=1e-12)
    np.testing.assert_allclose(ensemble_spread(jnp.asarray(ens)),
                               ens.std(0, ddof=1), rtol=1e-10)
