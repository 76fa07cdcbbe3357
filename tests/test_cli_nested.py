"""CLI cycling with a [nest] section: the child domain must actually be
cycled (regression: the section used to be parsed then silently ignored).
Reference: NUM_DOMAIN online nesting, common_nml.f90:56-58."""

from pathlib import Path

import numpy as np
import pytest

import jax

from tests.test_cli import run_cli

CONFIG = """
[domain]
nx = 16
ny = 16
nz = 6
dx = 3000.0
dy = 3000.0
dz = 500.0
dt = 2.0

[nest]
i0 = 4.0
j0 = 4.0
ratio = 2
nx = 16
ny = 16
nz = 6
dz = 500.0
dt = 1.0
bdy_width = 4
bdy_tau = 60.0

[ensemble]
member = 4

[letkf]
infl_mul = 1.05

[letkf_obs]
hori_local = [9.0e3, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]

[obs_error]
t = 0.1
u = 0.1
v = 0.1
"""


def _write_inputs(tmp_path):
    from scale_letkf_tpu.cli.main import (
        load_config_and_grid, make_driver, make_nested)
    from scale_letkf_tpu.model.ideal import (
        balanced_state, add_warm_bubble, perturb_ensemble)
    from scale_letkf_tpu.model.nesting import parent_to_child
    from scale_letkf_tpu.io.checkpoint import save_ensemble
    from scale_letkf_tpu.da.obsmake import make_obs_network, obsmake
    from scale_letkf_tpu.state import state_trans, state_to_history
    from scale_letkf_tpu.model.dycore import to_collocated
    from scale_letkf_tpu.obs import io as obsio

    cfg_path = tmp_path / "exp.toml"
    cfg_path.write_text(CONFIG)
    cfg, grid, dycfg, dom = load_config_and_grid(str(cfg_path))
    parent = make_driver(cfg, grid, dycfg, dom)
    child, geom, _ = make_nested(cfg, grid, dycfg, dom)

    K = cfg.ensemble.member
    s0, _, _ = balanced_state(grid.nz, grid.ny, grid.nx, 500.0)
    s0 = add_warm_bubble(s0, 500.0, grid.dx, grid.dy, amplitude=2.0,
                         center=(grid.nx * grid.dx / 2,
                                 grid.ny * grid.dy / 2, 1.5e3),
                         radius=(9e3, 9e3, 1.2e3))
    allp = perturb_ensemble(jax.random.PRNGKey(0), s0, K + 1, amplitude=0.5)
    truth = jax.tree.map(lambda a: a[0], allp)
    p_ens = jax.tree.map(lambda a: a[1:], allp)
    cshape = (child.grid.nz, child.grid.ny, child.grid.nx)
    c_ens = jax.vmap(lambda s: parent_to_child(
        s, geom, cshape, np.asarray(grid.cz),
        np.asarray(child.grid.cz)))(p_ens)
    save_ensemble(tmp_path / "init", p_ens, basename="anal.@@@@")
    save_ensemble(tmp_path / "cinit", c_ens, basename="anal.@@@@")

    # per-cycle obs from the advanced nature run, both domains
    rng = np.random.default_rng(0)
    truth = parent.forecast_one(truth, 4)
    nf = state_to_history(state_trans(to_collocated(truth)),
                          parent.z_full, parent.topo)
    tmpl = make_obs_network(grid, rng, n_profiles=12,
                            levels_hpa=(950.0, 850.0))
    obsio.write_obs(str(tmp_path / "obs0.dat"),
                    obsmake(nf, tmpl, grid, cfg, parent.z_full, rng))
    ctruth = parent_to_child(truth, geom, cshape, np.asarray(grid.cz),
                             np.asarray(child.grid.cz))
    cnf = state_to_history(state_trans(to_collocated(ctruth)),
                           child.z_full, child.topo)
    ctmpl = make_obs_network(child.grid, rng, n_profiles=8,
                             levels_hpa=(950.0, 850.0))
    obsio.write_obs(str(tmp_path / "cobs0.dat"),
                    obsmake(cnf, ctmpl, child.grid, cfg, child.z_full, rng))
    return cfg_path


@pytest.mark.slow
def test_cli_nested_cycle(tmp_path):
    cfg_path = _write_inputs(tmp_path)
    out = run_cli(
        "cycle", "--config", str(cfg_path),
        "--init", str(tmp_path / "init"), "--cycles", "1",
        "--steps-per-cycle", "4",
        "--obs-pattern", str(tmp_path / "obs{cycle}.dat"),
        "--out", str(tmp_path / "anal"),
        "--nest-init", str(tmp_path / "cinit"),
        "--nest-obs-pattern", str(tmp_path / "cobs{cycle}.dat"))
    assert "nest O-B" in out and "nest O-A" in out
    assert (tmp_path / "anal" / "anal.0001.npz").exists()
    assert (tmp_path / "anal" / "nest" / "anal.0001.npz").exists()
    a = np.load(tmp_path / "anal" / "nest" / "anal.0001.npz")
    assert np.isfinite(a["rhot"]).all()


def test_cli_nest_requires_flags(tmp_path):
    cfg_path = tmp_path / "exp.toml"
    cfg_path.write_text(CONFIG)
    from scale_letkf_tpu.io.checkpoint import save_ensemble
    from scale_letkf_tpu.model.ideal import balanced_state, perturb_ensemble
    s0, _, _ = balanced_state(6, 16, 16, 500.0)
    ens = perturb_ensemble(jax.random.PRNGKey(0), s0, 4, amplitude=0.5)
    save_ensemble(tmp_path / "init", ens, basename="anal.@@@@")
    with pytest.raises(SystemExit, match="nest"):
        run_cli("cycle", "--config", str(cfg_path),
                "--init", str(tmp_path / "init"), "--cycles", "1",
                "--steps-per-cycle", "2",
                "--obs-pattern", str(tmp_path / "obs{cycle}.dat"),
                "--out", str(tmp_path / "anal"))
