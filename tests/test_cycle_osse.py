"""End-to-end OSSE twin experiment (SURVEY.md §4c, BASELINE config 2-style,
scaled down for CI).

Test design notes (statistically well-posed twin experiment):
- the truth is one more draw from the initial-perturbation distribution, so
  the ensemble spread is consistent with the actual mean error;
- perturbations are spatially correlated (incl. vertically) so localized
  covariances carry signal;
- obs errors are commensurate with the prior error;
- localization is tighter than the perturbation correlation footprint so
  K=16 sampling noise is suppressed.
Under these conditions the analysis must beat the forecast.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.config import (
    Config, LetkfConfig, EnsembleConfig, ObsErrorConfig,
)
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.model.dycore import DycoreConfig, to_collocated
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble,
)
from scale_letkf_tpu.da.obsmake import make_obs_network, obsmake
from scale_letkf_tpu.cycle import CycleDriver
from scale_letkf_tpu.state import state_trans, state_to_history, ensemble_mean

NZ, NY, NX = 16, 20, 20
DZ, DX, DY = 500.0, 2000.0, 2000.0
K = 16


def make_driver(**letkf_kw):
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz=DZ,
                        proj=Projection(kind="LC"))
    cfg = Config(
        ensemble=EnsembleConfig(member=K),
        letkf=LetkfConfig(infl_mul=1.1, **letkf_kw),
        obs_error=ObsErrorConfig(u=0.1, v=0.1, t=0.1, q=2e-4, ps=10.0),
    )
    cfg.letkf_obs.hori_local = tuple([4.0e3] + [-1.0] * 23)
    cfg.letkf_obs.vert_local = tuple([0.2] + [-1.0] * 20 + [1000.0, -1.0, -1.0])
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ,
                         sponge_height=6.5e3, sponge_tau=120.0)
    qv_prof = 0.008 * np.exp(-(np.arange(NZ) + 0.5) * DZ / 3000.0)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ, qv_prof=qv_prof)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref)
    return grid, cfg, driver, s0


def make_truth_and_ensemble(s0, seed=42):
    base = add_warm_bubble(s0, DZ, DX, DY, amplitude=3.0)
    allp = perturb_ensemble(jax.random.PRNGKey(seed), base, K + 1,
                            amplitude=0.6)
    truth = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    return truth, ens


@pytest.fixture(scope="module")
def setup():
    return make_driver()


@pytest.mark.slow
def test_single_analysis_reduces_error(setup):
    grid, cfg, driver, s0 = setup
    truth, ens = make_truth_and_ensemble(s0)
    truth = driver.forecast_one(truth, 60)
    ens = driver.forecast(ens, 60)

    rng = np.random.default_rng(0)
    obs_t = make_obs_network(grid, rng, n_profiles=40)
    truth_anal = state_trans(to_collocated(truth))
    nature = state_to_history(truth_anal, driver.z_full)
    obs = obsmake(nature, obs_t, grid, cfg, driver.z_full, rng)
    assert obs.nobs > 300

    ens_a, info = driver.analysis(ens, obs)
    sg, sa = info["stats_gues"], info["stats_anal"]
    for name in ("U", "V", "T", "Q"):
        assert sa.nobs[name] > 0
        assert sa.rmse[name] < sg.rmse[name], (
            f"{name}: O-A {sa.rmse[name]} !< O-B {sg.rmse[name]}")
    # domain-wide error vs truth must drop for every analysis variable
    gm = ensemble_mean(info["gues"])
    am = ensemble_mean(info["anal"])
    for i, n in enumerate(("u", "v", "w", "T", "p", "q")):
        rg = float(jnp.sqrt(jnp.mean((gm[i] - truth_anal[i]) ** 2)))
        ra = float(jnp.sqrt(jnp.mean((am[i] - truth_anal[i]) ** 2)))
        assert ra < rg, f"{n}: analysis {ra} !< forecast {rg}"


@pytest.mark.slow
def test_cycling_osse(setup):
    grid, cfg, driver, s0 = setup
    truth, ens = make_truth_and_ensemble(s0, seed=7)
    rng = np.random.default_rng(1)
    obs_t = make_obs_network(grid, rng, n_profiles=40)

    truth2, ens2, res = driver.run_osse(
        truth, ens, obs_t, n_cycles=4, steps_per_cycle=30, seed=3)

    # analysis beats forecast every cycle
    for c in range(4):
        assert res.rmse_anal[c] < res.rmse_gues[c], (
            f"cycle {c}: anal {res.rmse_anal[c]} !< gues {res.rmse_gues[c]}")
    # cycling keeps the system stable
    assert res.rmse_anal[-1] < 2.0 * res.rmse_anal[0] + 1e-6
    assert np.isfinite(res.spread).all()


@pytest.mark.slow
def test_adaptive_inflation_cycle():
    grid, cfg, driver, s0 = make_driver(infl_mul_adaptive=True)
    truth, ens = make_truth_and_ensemble(s0, seed=9)
    rng = np.random.default_rng(2)
    obs_t = make_obs_network(grid, rng, n_profiles=25)
    _, _, res = driver.run_osse(truth, ens, obs_t, n_cycles=2,
                                steps_per_cycle=20, seed=5)
    assert res.infl_field is not None
    assert res.infl_field.shape == (NZ, NY, NX)
    assert np.isfinite(res.infl_field).all()
    assert res.infl_field.min() > 0.5
    assert res.infl_field.max() < 3.0


@pytest.mark.slow
def test_rtpp_and_rtps_cycles():
    for kw in ({"relax_alpha": 0.5}, {"relax_alpha_spread": 0.7}):
        grid, cfg, driver, s0 = make_driver(**kw)
        truth, ens = make_truth_and_ensemble(s0, seed=11)
        rng = np.random.default_rng(4)
        obs_t = make_obs_network(grid, rng, n_profiles=25)
        _, _, res = driver.run_osse(truth, ens, obs_t, n_cycles=2,
                                    steps_per_cycle=20, seed=6)
        assert res.rmse_anal[-1] < res.rmse_gues[-1]
        # relaxation keeps more spread than no relaxation would
        assert res.spread[-1] > 0
