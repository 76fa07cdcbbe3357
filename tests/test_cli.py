"""CLI end-to-end smoke test: fcst → obsmake → obsope → letkf via the
command-line programs (the reference's executable-level workflow)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CONFIG = """
[domain]
nx = 12
ny = 12
nz = 8
dx = 2000.0
dy = 2000.0
dz = 500.0
dt = 1.0
qv_surface = 0.008

[ensemble]
member = 4

[letkf]
infl_mul = 1.1

[letkf_obs]
hori_local = [6.0e3, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]

[obs_error]
t = 0.2
u = 0.2
v = 0.2
"""


def run_cli(*args, cwd=None):
    """Invoke the CLI in-process (subprocesses would each pay the full JAX
    import + compile cost; the argument-parsing and program paths are
    identical)."""
    import io
    import contextlib
    from scale_letkf_tpu.cli.main import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(list(args))
    return buf.getvalue()


@pytest.mark.slow
def test_cli_full_workflow(tmp_path):
    repo = Path(__file__).resolve().parents[1]
    cfg_path = tmp_path / "exp.toml"
    cfg_path.write_text(CONFIG)

    # build initial ensemble + nature run checkpoints in-process
    from scale_letkf_tpu.model.ideal import (
        balanced_state, add_warm_bubble, perturb_ensemble)
    from scale_letkf_tpu.io.checkpoint import save_ensemble, save_member
    from scale_letkf_tpu.da.obsmake import make_obs_network
    from scale_letkf_tpu.obs import io as obsio
    from scale_letkf_tpu.grid import Grid, Projection

    nz, ny, nx, dz = 8, 12, 12, 500.0
    qv = 0.008 * np.exp(-(np.arange(nz) + 0.5) * dz / 3000.0)
    s0, _, _ = balanced_state(nz, ny, nx, dz, qv_prof=qv)
    base = add_warm_bubble(s0, dz, 2000.0, 2000.0, amplitude=3.0,
                           center=(12e3, 12e3, 1.5e3))
    allp = perturb_ensemble(jax.random.PRNGKey(0), base, 5, amplitude=0.5)
    nature = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    save_ensemble(tmp_path / "init", ens, basename="anal.@@@@")
    save_member(tmp_path / "nature.npz", nature)

    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0, dz=dz,
                        proj=Projection())
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=15,
                                levels_hpa=(900.0, 800.0))
    obsio.write_obs(str(tmp_path / "template.dat"), template)

    env_cwd = str(repo)
    # 1. ensemble forecast
    run_cli("fcst", "--config", str(cfg_path), "--init",
            str(tmp_path / "init"), "--steps", "20", "--out",
            str(tmp_path / "gues"), cwd=env_cwd)
    assert (tmp_path / "gues" / "manifest.json").exists()

    # 2. synthetic obs from the nature run
    run_cli("obsmake", "--config", str(cfg_path),
            "--nature", str(tmp_path / "nature.npz"),
            "--obs-template", str(tmp_path / "template.dat"),
            "--out", str(tmp_path / "obs.dat"), cwd=env_cwd)
    obs = obsio.read_obs(str(tmp_path / "obs.dat"))
    assert obs.nobs > 50

    # 3. obsope: ensemble H(x) files
    run_cli("obsope", "--config", str(cfg_path),
            "--gues", str(tmp_path / "gues"),
            "--obs", str(tmp_path / "obs.dat"),
            "--out", str(tmp_path / "obsda.@@@@"), cwd=env_cwd)
    assert (tmp_path / "obsda.0001").exists()

    # 4. LETKF analysis
    out = run_cli("letkf", "--config", str(cfg_path),
                  "--gues", str(tmp_path / "gues"),
                  "--obs", str(tmp_path / "obs.dat"),
                  "--anal", str(tmp_path / "anal"), cwd=env_cwd)
    assert "O-B" in out and "O-A" in out
    assert (tmp_path / "anal" / "anal.0001.npz").exists()
    assert (tmp_path / "anal" / "obsdep.npz").exists()

    # 4b. LETKF with precomputed H(x) (OBSDA_IN path) must agree
    run_cli("letkf", "--config", str(cfg_path),
            "--gues", str(tmp_path / "gues"),
            "--obs", str(tmp_path / "obs.dat"),
            "--obsda", str(tmp_path / "obsda.@@@@"),
            "--anal", str(tmp_path / "anal2"), cwd=env_cwd)
    a1 = np.load(tmp_path / "anal" / "anal.0001.npz")
    a2 = np.load(tmp_path / "anal2" / "anal.0001.npz")
    np.testing.assert_allclose(a2["rhot"], a1["rhot"], rtol=1e-5, atol=1e-5)
    # mean/spread outputs present
    assert (tmp_path / "anal" / "anal_sprd.npz").exists()
    assert (tmp_path / "anal" / "gues_mean.npz").exists()

    # 5. obssim on the nature state
    run_cli("obssim", "--config", str(cfg_path),
            "--state", str(tmp_path / "nature.npz"),
            "--vars", "T,U", "--out", str(tmp_path / "sim.grd"), cwd=env_cwd)
    sim = np.fromfile(tmp_path / "sim.grd", np.float32)
    assert len(sim) == 2 * nz * ny * nx


@pytest.mark.slow
def test_cli_streamed_cycle(tmp_path):
    """`cycle --streamed` drives the beyond-HBM member-streamed executor
    (da/bigcycle.py) through the CLI."""
    from scale_letkf_tpu.model.ideal import (
        balanced_state, add_warm_bubble, perturb_ensemble)
    from scale_letkf_tpu.io.checkpoint import save_ensemble, save_member
    from scale_letkf_tpu.da.obsmake import make_obs_network
    from scale_letkf_tpu.obs import io as obsio
    from scale_letkf_tpu.grid import Grid, Projection

    cfg_path = tmp_path / "exp.toml"
    cfg_path.write_text(CONFIG)
    nz, ny, nx, dz = 8, 12, 12, 500.0
    qv = 0.008 * np.exp(-(np.arange(nz) + 0.5) * dz / 3000.0)
    s0, _, _ = balanced_state(nz, ny, nx, dz, qv_prof=qv)
    base = add_warm_bubble(s0, dz, 2000.0, 2000.0, amplitude=3.0,
                           center=(12e3, 12e3, 1.5e3))
    allp = perturb_ensemble(jax.random.PRNGKey(0), base, 5, amplitude=0.5)
    nature = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    save_ensemble(tmp_path / "init", ens, basename="anal.@@@@")
    save_member(tmp_path / "nature.npz", nature)
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2000.0, dy=2000.0, dz=dz,
                        proj=Projection())
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=15,
                                levels_hpa=(900.0, 800.0))
    obsio.write_obs(str(tmp_path / "template.dat"), template)
    run_cli("obsmake", "--config", str(cfg_path),
            "--nature", str(tmp_path / "nature.npz"),
            "--obs-template", str(tmp_path / "template.dat"),
            "--out", str(tmp_path / "obs0.dat"))
    out = run_cli("cycle", "--config", str(cfg_path),
                  "--init", str(tmp_path / "init"), "--cycles", "1",
                  "--steps-per-cycle", "5",
                  "--obs-pattern", str(tmp_path / "obs{cycle}.dat"),
                  "--out", str(tmp_path / "sanal"),
                  "--streamed", "--member-batch", "2", "--tile-rows", "4")
    assert "cycle phase timers" in out and "DAS_LETKF" in out
    assert (tmp_path / "sanal" / "anal.0001.npz").exists()
    a = np.load(tmp_path / "sanal" / "anal.0001.npz")
    assert np.isfinite(a["rhot"]).all()
