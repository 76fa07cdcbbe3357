"""Composed real-case configuration: split-explicit HEVI core + stretched
vertical levels + terrain + Davies boundary forcing, cycling DA end-to-end
— a coarsened version of the reference's operational 18-km setup
(reference: config/2015summer_18km/config.nml.scale PARAM_TIME dt=30 s with
3 s acoustic substeps; common_scale.f90:1434 terrain; boundary forcing
config/example/config.main.hakushu:72-78), both in-process and through the
`cycle` CLI."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.config import Config, EnsembleConfig, LetkfConfig
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.cycle import CycleDriver
from scale_letkf_tpu.model.dycore import DycoreConfig
from scale_letkf_tpu.model.boundary import BoundaryData, save_boundary
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble,
)
from scale_letkf_tpu.da.obsmake import make_obs_network

NX = NY = 20
NZ = 12
DX = DY = 18000.0
DZ0, STRETCH = 400.0, 1.15        # ztop ≈ 11.6 km
DT, N_SMALL = 30.0, 10            # 3 s acoustic substep


def build_case(K=8, seed=0):
    grid = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=DZ0,
                          stretch=STRETCH,
                          proj=Projection(kind="LC", basepoint_lon=135.0,
                                          basepoint_lat=35.0))
    qv = 0.008 * np.exp(-grid.cz / 3000.0)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ0, qv_prof=qv,
                                        cz=grid.cz)
    base = add_warm_bubble(s0, DZ0, DX, DY, amplitude=3.0,
                           center=(NX * DX / 3, NY * DY / 3, 2.0e3),
                           radius=(60e3, 60e3, 2e3))

    # gentle coastal-mountain topography
    x = (np.arange(NX) + 0.5) * DX
    y = (np.arange(NY) + 0.5) * DY
    topo = 500.0 * np.exp(-(((x[None] - 0.6 * NX * DX) / 100e3) ** 2
                            + ((y[:, None] - 0.5 * NY * DY) / 100e3) ** 2))

    # boundary data: relax toward the balanced base state (constant target)
    bdy = BoundaryData(state0=s0, state1=s0, t0=0.0, t1=1.0e9)

    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.25, relax_alpha=0.8,
                                   boundary_buffer_width=2.0 * DX))
    cfg.letkf_obs.hori_local = tuple([400.0e3] + [-1.0] * 23)
    cfg.letkf_obs.vert_local = tuple([0.3] + [-1.0] * 23)
    # obs errors comparable to the (small) background error of this OSSE
    cfg.obs_error.u = cfg.obs_error.v = cfg.obs_error.t = 0.05
    cfg.obs_error.q = 1e-4
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ0, dt=DT, ztop=grid.ztop,
                         sponge_height=9.0e3, sponge_tau=300.0)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref,
                         topo=topo, core="si", n_small=N_SMALL,
                         bdy=bdy, bdy_width=3, bdy_tau=600.0)
    allp = perturb_ensemble(jax.random.PRNGKey(seed), base, K + 1,
                            amplitude=1.0)
    nature = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    return grid, cfg, driver, nature, ens, topo, bdy


def test_composed_realcase_osse_cycles():
    """SI + terrain + stretched + boundary, cycling: stays finite, analysis
    beats the first guess on average, spread stays alive."""
    grid, cfg, driver, nature, ens, topo, bdy = build_case()
    assert driver.core == "si"
    assert driver.vg is not None          # stretched levels active
    assert driver.metrics is not None     # terrain metrics active
    assert driver._bdy_w2d is not None    # boundary relaxation active

    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=25,
                                levels_hpa=(900.0, 700.0, 500.0))
    truth, ens_a, res = driver.run_osse(
        truth0=nature, ens0=ens, obs_template=template,
        n_cycles=3, steps_per_cycle=4, seed=0)

    for a in ens_a:
        assert np.isfinite(np.asarray(a)).all()
    # obs-space improvement every cycle: O−A RMSE ≤ O−B RMSE for U/V/T
    # (the reference's de-facto validation, monit_obs — SURVEY §4.3; the
    # 2-minute forecasts of this smoke test grow too little truth error
    # for state-space RMSE to discriminate, so obs space is the criterion)
    for sg, sa in zip(res.stats_gues, res.stats_anal):
        for v in ("U", "V", "T"):
            assert sa.rmse[v] <= sg.rmse[v] * 1.001, (v, sg.rmse, sa.rmse)
    # state-space error must not be degraded beyond noise level
    for g, a in zip(res.rmse_gues, res.rmse_anal):
        assert a < g * 1.05, (res.rmse_gues, res.rmse_anal)
    assert all(s > 0 for s in res.spread)


def test_composed_realcase_cycle_cli(tmp_path):
    """The 18-km-style configuration is runnable AS WIRED through the
    `cycle` CLI: TOML drives core='si', dz_stretch, topo_file, bdy_file."""
    from scale_letkf_tpu.io.checkpoint import save_ensemble, save_member
    from scale_letkf_tpu.obs import io as obsio
    from scale_letkf_tpu.da.obsmake import obsmake
    from scale_letkf_tpu.model.dycore import to_collocated
    from scale_letkf_tpu.state import state_trans, state_to_history
    from scale_letkf_tpu.cli.main import main as cli_main
    import io as _io
    import contextlib

    grid, cfg, driver, nature, ens, topo, bdy = build_case()
    np.savez(tmp_path / "topo.npz", topo=topo)
    save_boundary(str(tmp_path / "bdy.npz"), bdy)
    save_ensemble(tmp_path / "init", ens, basename="anal.@@@@")

    cfg_text = f"""
[domain]
nx = {NX}
ny = {NY}
nz = {NZ}
dx = {DX}
dy = {DY}
dz = {DZ0}
dz_stretch = {STRETCH}
core = "si"
n_small = {N_SMALL}
dt = {DT}
sponge_height = 9000.0
sponge_tau = 300.0
qv_surface = 0.008
topo_file = "{tmp_path / 'topo.npz'}"
bdy_file = "{tmp_path / 'bdy.npz'}"
bdy_width = 3
bdy_tau = 600.0

[domain.projection]
kind = "LC"
basepoint_lon = 135.0
basepoint_lat = 35.0

[ensemble]
member = 8

[letkf]
infl_mul = 1.25
relax_alpha = 0.8
boundary_buffer_width = {2.0 * DX}

[letkf_obs]
hori_local = [400.0e3{", -1.0" * 23}]
vert_local = [0.3{", -1.0" * 23}]
"""
    (tmp_path / "exp.toml").write_text(cfg_text)

    # per-cycle obs from the nature run (obsmake equivalent, in-process)
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=25,
                                levels_hpa=(900.0, 700.0, 500.0))
    (tmp_path / "obs").mkdir()
    truth = nature
    for c in range(2):
        truth = driver.forecast_one(truth, 4)
        fields = state_to_history(state_trans(to_collocated(truth)),
                                  driver.z_full)
        obs = obsmake(fields, template, grid, cfg, driver.z_full, rng)
        obsio.write_obs(str(tmp_path / "obs" / f"cycle{c}.dat"), obs)

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(["cycle", "--config", str(tmp_path / "exp.toml"),
                  "--init", str(tmp_path / "init"),
                  "--cycles", "2", "--steps-per-cycle", "4",
                  "--obs-pattern", str(tmp_path / "obs" / "cycle{cycle}.dat"),
                  "--out", str(tmp_path / "final")])
    out = buf.getvalue()
    assert "O-B" in out and "O-A" in out
    assert (tmp_path / "final" / "anal.0001.npz").exists()
    z = np.load(tmp_path / "final" / "anal.0001.npz")
    for k in z.files:
        assert np.isfinite(z[k]).all()
