"""The shipped experiment configs are runnable AS WIRED: they must parse,
compose the advertised model (SI core, stretched levels), and integrate
stably on a coarsened version of their domain."""

from pathlib import Path

import numpy as np
import jax
import pytest

from scale_letkf_tpu.cli.main import load_config_and_grid, make_driver
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble,
)

CONFIGS = Path(__file__).resolve().parents[1] / "configs"

# coarsened domain (full operational sizes are too big for unit tests);
# dt / dz / stretch / core / n_small stay exactly as shipped
SMALL = {"nx": 16, "ny": 16, "nz": 12}


@pytest.mark.parametrize("name,expect_si,expect_stretch", [
    ("18km_japan.toml", True, True),
    ("bda_1km_radar.toml", True, True),
])
def test_shipped_config_composes_and_integrates(name, expect_si,
                                                expect_stretch):
    cfg, grid, dycfg, dom = load_config_and_grid(
        str(CONFIGS / name), domain_overrides=SMALL)
    assert dom.get("core") == ("si" if expect_si else "explicit")
    driver = make_driver(cfg, grid, dycfg, dom)
    assert driver.core == "si"
    assert (driver.vg is not None) == expect_stretch

    # the shipped dt must be stable with the shipped core settings:
    # integrate a perturbed state for 10 steps on the coarsened domain
    qv = None
    if dom.get("qv_surface", 0.0) > 0:
        qv = dom["qv_surface"] * np.exp(
            -grid.cz / dom.get("qv_scale_height", 3000.0))
    s0, _, _ = balanced_state(grid.nz, grid.ny, grid.nx, dycfg.dz,
                              qv_prof=qv, cz=grid.cz)
    s0 = add_warm_bubble(s0, dycfg.dz, grid.dx, grid.dy, amplitude=2.0,
                         center=(grid.nx * grid.dx / 2,
                                 grid.ny * grid.dy / 2, 1.5e3),
                         radius=(4 * grid.dx, 4 * grid.dy, 1.5e3))
    ens = perturb_ensemble(jax.random.PRNGKey(0), s0, 2, amplitude=0.5)
    out = driver.forecast(ens, 10)
    for a in out:
        arr = np.asarray(a)
        assert np.isfinite(arr).all(), name
    # temperature field stayed physical
    from scale_letkf_tpu.model.dycore import to_collocated
    from scale_letkf_tpu.state import state_trans, IA_T
    anal = state_trans(jax.vmap(to_collocated)(out))
    t = np.asarray(anal[:, IA_T])
    assert (t > 150).all() and (t < 350).all(), (name, t.min(), t.max())


def test_shipped_config_full_sizes_parse():
    """Full-size (no override) configs parse and their grids match the
    documented reference geometry."""
    cfg, grid, dycfg, dom = load_config_and_grid(
        str(CONFIGS / "18km_japan.toml"))
    assert (grid.nx, grid.ny, grid.nz) == (480, 360, 36)
    assert dycfg.dt == 30.0
    assert dom["n_small"] == 10          # 3 s acoustic substeps
    assert cfg.letkf.infl_mul == 1.25
    assert cfg.letkf.relax_alpha == 0.8
    assert cfg.letkf_obs.hori_local_for(0) == 400.0e3
    # stretched levels reach a realistic model top
    assert 18e3 < grid.ztop < 30e3

    cfg, grid, dycfg, dom = load_config_and_grid(
        str(CONFIGS / "bda_1km_radar.toml"))
    assert (grid.nx, grid.ny) == (192, 192)
    assert dycfg.dt == 2.0
    assert cfg.letkf_obs.hori_local_for(21) == 1.0e3   # PHARAD
    assert cfg.letkf_obs.max_nobs_for(21) == 100
