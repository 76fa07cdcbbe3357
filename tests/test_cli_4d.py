"""4-D obsope through the executable path: fcst writes per-slot history
snapshots, letkf/obsope match each obs to its time slot (reference:
obsope_tools.f90:431-508, read_history common_scale.f90:903)."""

import io
import contextlib
import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.cli.main import main as cli_main


CONFIG_4D = """
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

[obsope]
slot_start = 1
slot_end = 3
slot_base = 3
slot_tinterval = 10.0

[letkf_obs]
hori_local = [6.0e3{rest}]

[obs_error]
t = 0.2
u = 0.2
v = 0.2
"""


def run_cli(*args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_main(list(args))
    return buf.getvalue()


def setup_case(tmp_path):
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
    template = make_obs_network(grid, rng, n_profiles=12,
                                levels_hpa=(900.0, 800.0))
    # spread obs over the window: slots 1..3 at tinterval 10 s, base 3
    # (dif relative to the analysis time) → dif ∈ {-20, -10, 0}
    tmpl = template
    difs = np.asarray([-20.0, -10.0, 0.0])[
        np.arange(tmpl.nobs) % 3]
    tmpl.dif[:] = difs
    obsio.write_obs(str(tmp_path / "template.dat"), tmpl)

    cfg = CONFIG_4D.format(rest=", -1.0" * 23)
    (tmp_path / "exp.toml").write_text(cfg)
    return tmp_path


@pytest.mark.slow
def test_cli_4d_workflow(tmp_path):
    d = setup_case(tmp_path)

    # fcst writes gues + per-slot history snapshots
    out = run_cli("fcst", "--config", str(d / "exp.toml"),
                  "--init", str(d / "init"), "--steps", "20",
                  "--out", str(d / "gues"))
    assert "history slots" in out
    assert (d / "gues" / "hist.json").exists()
    meta = json.loads((d / "gues" / "hist.json").read_text())
    assert meta["slots"] == 3
    hist = np.load(d / "gues" / "hist.0001.npz")["hist"]
    assert hist.shape[0] == 3
    # slots differ (the model actually evolved between snapshots)
    assert np.abs(hist[0] - hist[2]).max() > 0

    # synthetic obs from the nature run (values at analysis time; the slot
    # matching shifts H(x), which is what the 4-D test below verifies)
    run_cli("obsmake", "--config", str(d / "exp.toml"),
            "--nature", str(d / "nature.npz"),
            "--obs-template", str(d / "template.dat"),
            "--out", str(d / "obs.dat"))

    # obsope with history: per-slot H(x)
    run_cli("obsope", "--config", str(d / "exp.toml"),
            "--gues", str(d / "gues"),
            "--obs", str(d / "obs.dat"),
            "--out", str(d / "obsda.@@@@"))
    from scale_letkf_tpu.obs import io as obsio
    obs = obsio.read_obs(str(d / "obs.dat"))
    rec = obsio.read_obs_da(str(d / "obsda.0001"), obs.nobs)
    assert np.isfinite(rec[2]).all()

    # letkf consumes the history automatically and improves O-A
    out = run_cli("letkf", "--config", str(d / "exp.toml"),
                  "--gues", str(d / "gues"),
                  "--obs", str(d / "obs.dat"),
                  "--anal", str(d / "anal"))
    assert "O-B" in out and "O-A" in out

    # 4-D H(x) must differ from 3-D H(x) for off-center slots: rerun
    # obsope with the history removed → all obs evaluated at window center
    (d / "gues" / "hist.json").unlink()
    run_cli("obsope", "--config", str(d / "exp.toml"),
            "--gues", str(d / "gues"),
            "--obs", str(d / "obs.dat"),
            "--out", str(d / "obsda3d.@@@@"))
    rec3d = obsio.read_obs_da(str(d / "obsda3d.0001"), obs.nobs)
    off_center = obs.dif < -5.0
    assert np.abs(rec[2][off_center] - rec3d[2][off_center]).max() > 1e-6
    # window-center obs agree between the 3-D and 4-D paths
    center = obs.dif == 0.0
    np.testing.assert_allclose(rec[2][center], rec3d[2][center],
                               rtol=1e-5, atol=1e-6)


def test_cli_4d_cycle(tmp_path):
    """The cycle CLI runs 4-D windows end-to-end (forecast_slots per cycle)."""
    d = setup_case(tmp_path)
    from scale_letkf_tpu.obs import io as obsio
    import shutil
    (d / "obs").mkdir()
    # same obs file per cycle (values regenerated would be better; this
    # exercises the plumbing)
    run_cli("obsmake", "--config", str(d / "exp.toml"),
            "--nature", str(d / "nature.npz"),
            "--obs-template", str(d / "template.dat"),
            "--out", str(d / "obs" / "cycle0.dat"))
    shutil.copy(d / "obs" / "cycle0.dat", d / "obs" / "cycle1.dat")
    out = run_cli("cycle", "--config", str(d / "exp.toml"),
                  "--init", str(d / "init"), "--cycles", "2",
                  "--steps-per-cycle", "20",
                  "--obs-pattern", str(d / "obs" / "cycle{cycle}.dat"),
                  "--out", str(d / "final"))
    assert "O-A" in out
    z = np.load(d / "final" / "anal.0001.npz")
    for k in z.files:
        assert np.isfinite(z[k]).all()
