"""DET_RUN deterministic-member update test: the deterministic analysis
must move toward the obs via the transmd weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import to_collocated
from scale_letkf_tpu.model.ideal import add_warm_bubble
from scale_letkf_tpu.state import state_trans, state_to_history, ensemble_mean
from scale_letkf_tpu.da.obsmake import make_obs_network, obsmake
from test_cycle_osse import make_driver, make_truth_and_ensemble, DX, DY, DZ


@pytest.mark.slow
def test_det_member_updated():
    grid, cfg, driver, s0 = make_driver()
    cfg.ensemble.det_run = True
    truth, ens = make_truth_and_ensemble(s0, seed=21)
    det = add_warm_bubble(s0, DZ, DX, DY, amplitude=3.0)  # unperturbed member
    truth = driver.forecast_one(truth, 40)
    det = driver.forecast_one(det, 40)
    ens = driver.forecast(ens, 40)

    rng = np.random.default_rng(8)
    obs_t = make_obs_network(grid, rng, n_profiles=30)
    truth_anal = state_trans(to_collocated(truth))
    nature = state_to_history(truth_anal, driver.z_full)
    obs = obsmake(nature, obs_t, grid, cfg, driver.z_full, rng)

    ens_a, info = driver.analysis(ens, obs, det=det)
    assert info["det"] is not None
    det_anal = state_trans(to_collocated(info["det"]))
    det_gues = state_trans(to_collocated(det))
    # deterministic member changed
    d = float(jnp.abs(det_anal[3] - det_gues[3]).max())
    assert d > 0
    # deterministic analysis closer to truth than deterministic forecast
    rg = float(jnp.sqrt(jnp.mean((det_gues[:4] - truth_anal[:4]) ** 2)))
    ra = float(jnp.sqrt(jnp.mean((det_anal[:4] - truth_anal[:4]) ** 2)))
    assert ra < rg, f"det analysis {ra} !< det forecast {rg}"
    # all fields finite
    for a in info["det"]:
        assert np.isfinite(np.asarray(a)).all()


def test_det_cycled_through_checkpoints(tmp_path):
    """DET_RUN_CYCLED: a det member saved in a checkpoint survives
    fcst -> letkf through the checkpoint layer (mdet member files)."""
    from scale_letkf_tpu.io.checkpoint import (
        save_ensemble, load_ensemble, load_det, filename_replace_mem)
    grid, cfg, driver, s0 = make_driver()
    truth, ens = make_truth_and_ensemble(s0, seed=5)
    det = add_warm_bubble(s0, DZ, DX, DY, amplitude=3.0)

    save_ensemble(tmp_path / "init", ens, det=det)
    assert (tmp_path / "init" /
            (filename_replace_mem("anal.@@@@", "mdet") + ".npz")).exists()
    det_back = load_det(tmp_path / "init")
    assert det_back is not None
    np.testing.assert_allclose(det_back.rhot, np.asarray(det.rhot))
    # checkpoints without a det member return None
    save_ensemble(tmp_path / "nodet", ens)
    assert load_det(tmp_path / "nodet") is None
