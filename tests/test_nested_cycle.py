"""Config-driven one-way nested DA cycling (nested.py + [nest] TOML;
reference: NUM_DOMAIN online nesting, common_nml.f90:56-58)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.cli.main import (
    load_config_and_grid, make_driver, make_nested)
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble)
from scale_letkf_tpu.model.nesting import parent_to_child
from scale_letkf_tpu.da.obsmake import make_obs_network, obsmake
from scale_letkf_tpu.state import state_trans, state_to_history
from scale_letkf_tpu.model.dycore import to_collocated

CONFIG = """
[domain]
nx = 24
ny = 24
nz = 8
dx = 3000.0
dy = 3000.0
dz = 500.0
dt = 2.0

[nest]
i0 = 6.0
j0 = 6.0
ratio = 3
nx = 24
ny = 24
nz = 8
dz = 500.0
dt = 1.0
bdy_width = 4
bdy_tau = 60.0

[ensemble]
member = 4

[letkf]
infl_mul = 1.05
relax_alpha = 0.3

[letkf_obs]
hori_local = [9.0e3, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]

[obs_error]
t = 0.1
u = 0.1
v = 0.1
"""


@pytest.mark.slow
def test_nested_osse_cycle(tmp_path):
    cfg_path = tmp_path / "exp.toml"
    cfg_path.write_text(CONFIG)
    cfg, grid, dycfg, dom = load_config_and_grid(str(cfg_path))
    assert "nest" in dom
    parent = make_driver(cfg, grid, dycfg, dom)
    child, geom, NCD = make_nested(cfg, grid, dycfg, dom)
    nest = NCD(parent, child, geom)

    K = cfg.ensemble.member
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    qv = None
    s0, _, _ = balanced_state(nz, ny, nx, 500.0)
    s0 = add_warm_bubble(s0, 500.0, grid.dx, grid.dy, amplitude=2.0,
                         center=(nx * grid.dx / 2, ny * grid.dy / 2, 1.5e3),
                         radius=(9e3, 9e3, 1.2e3))
    allp = perturb_ensemble(jax.random.PRNGKey(0), s0, K + 1, amplitude=0.5)
    truth = jax.tree.map(lambda a: a[0], allp)
    p_ens = jax.tree.map(lambda a: a[1:], allp)

    # child ensemble: parent members downscaled (scale_init equivalent)
    cshape = (child.grid.nz, child.grid.ny, child.grid.nx)
    c_ens = jax.vmap(lambda s: parent_to_child(
        s, geom, cshape, np.asarray(grid.cz),
        np.asarray(child.grid.cz)))(p_ens)

    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=16,
                                levels_hpa=(950.0, 850.0, 750.0))

    from scale_letkf_tpu.obs.types import Observations
    c_noobs = Observations(
        elem=np.zeros(0, np.int32), lon=np.zeros(0), lat=np.zeros(0),
        lev=np.zeros(0), dat=np.zeros(0), err=np.zeros(0),
        typ=np.zeros(0, np.int32), dif=np.zeros(0))

    for c in range(2):
        truth = parent.forecast_one(truth, 4)
        nf = state_to_history(state_trans(to_collocated(truth)),
                              parent.z_full, parent.topo)
        p_obs = obsmake(nf, template, grid, cfg, parent.z_full, rng)
        p_ens, c_ens, info = nest.cycle(
            p_ens, c_ens, p_obs, c_noobs, steps_parent=4, steps_child=8)
        for a in c_ens:
            assert np.isfinite(np.asarray(a)).all()
        for a in p_ens:
            assert np.isfinite(np.asarray(a)).all()
        # parent obs-space improvement
        sg = info["parent"]["stats_gues"]
        sa = info["parent"]["stats_anal"]
        assert sa.rmse["T"] <= sg.rmse["T"] * 1.05

    # the child's boundary buffer tracks the parent target: compare the
    # child edge column against the parent downscaled end state
    target = nest._p2c(parent.forecast(p_ens, 0) if False else p_ens)
    c_rhot = np.asarray(jnp.mean(c_ens.rhot, axis=0))
    t_rhot = np.asarray(jnp.mean(target.rhot, axis=0))
    edge_rel = (np.abs(c_rhot[:, 0, :] - t_rhot[:, 0, :]).mean()
                / np.abs(t_rhot[:, 0, :]).mean())
    assert edge_rel < 0.05   # edge pinned to the parent within 5%
