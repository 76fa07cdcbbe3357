"""Member-streamed full-size cycle executor (da/bigcycle.py) equals the
in-core CycleDriver path — the capability executor for reference-size
domains (SURVEY §2.7 beyond-HBM; reference cycle.sh:141-345 runs the whole
forecast+obsope+LETKF cycle at 480x360x36, K=50)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.config import Config, EnsembleConfig, LetkfConfig
from scale_letkf_tpu.grid import Grid, Projection
from scale_letkf_tpu.cycle import CycleDriver
from scale_letkf_tpu.model.dycore import DycoreConfig, to_collocated
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble)
from scale_letkf_tpu.da.obsmake import make_obs_network, obsmake
from scale_letkf_tpu.da.bigcycle import StreamedCycle, phase_table
from scale_letkf_tpu.state import state_trans, state_to_history


def _setup(K=6, NZ=8, NY=16, NX=16, core="si"):
    DZ, DX, DY = 400.0, 2000.0, 2000.0
    grid = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=DZ,
                          stretch=1.05, proj=Projection(kind="LC"))
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.1, relax_alpha=0.5))
    cfg.letkf_obs.hori_local = tuple([8.0e3] + [-1.0] * 23)
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=2.0, ztop=grid.ztop,
                         sponge_height=0.8 * grid.ztop, sponge_tau=120.0)
    qv = 0.008 * np.exp(-np.asarray(grid.cz) / 3000.0)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ, qv_prof=qv,
                                        cz=grid.cz)
    base = add_warm_bubble(s0, DZ, DX, DY, amplitude=2.0)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref, core=core,
                         n_small=4)
    allp = perturb_ensemble(jax.random.PRNGKey(1), base, K + 1,
                            amplitude=0.5)
    truth = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=12,
                                levels_hpa=(900.0, 750.0))
    truth_f = driver.forecast_one(truth, 4)
    nf = state_to_history(state_trans(to_collocated(truth_f)),
                          driver.z_full, driver.topo)
    obs = obsmake(nf, template, grid, cfg, driver.z_full, rng)
    return grid, cfg, driver, ens, obs


def test_streamed_cycle_matches_incore():
    grid, cfg, driver, ens, obs = _setup()
    nsteps = 4

    # in-core reference path
    ens_f = driver.forecast(ens, nsteps)
    ens_a, info = driver.analysis(ens_f, obs)

    # streamed path (uneven request 4 -> divisor batch of K=6)
    ens_host = jax.tree.map(lambda a: np.asarray(a), ens)
    sc = StreamedCycle(driver, member_batch=4, tile_rows=4)
    out, infl, report = sc.cycle(ens_host, obs, nsteps)

    assert report["batches"] == 2           # K=6, request 4 -> divisor 3
    # gues equality is exact (same jitted forecast program); analysis
    # equality is within the bf16 perturbation-transport tolerance of the
    # tiled executor
    for name in out._fields:
        a_ref = np.asarray(getattr(ens_a, name))
        a_str = getattr(out, name)
        scale = max(np.abs(a_ref).max(), 1e-6)
        np.testing.assert_allclose(a_str, a_ref, atol=3e-2 * scale,
                                   rtol=3e-2,
                                   err_msg=f"field {name} diverged")

    # departure statistics present and sane; table formats
    sg, sa = report["stats_gues"], report["stats_anal"]
    assert sg.nobs["T"] > 0
    assert sa.rmse["T"] <= sg.rmse["T"] * 1.05
    tab = phase_table(report)
    assert "DAS_LETKF" in tab and "TOTAL" in tab


def test_streamed_forecast_matches_incore_exactly():
    """The streamed forecast itself (before any bf16 analysis transport)
    must match the in-core vmapped forecast to float32 roundoff."""
    grid, cfg, driver, ens, obs = _setup(K=4, core="explicit")
    ens_f = driver.forecast(ens, 3)
    from scale_letkf_tpu.state import state_trans as st
    gues_ref = np.asarray(st(jax.vmap(to_collocated)(ens_f)))

    ens_host = jax.tree.map(lambda a: np.asarray(a), ens)
    sc = StreamedCycle(driver, member_batch=2, tile_rows=4)
    gues_host, ensval, qc, t = sc.forecast_and_hx(ens_host, 3, obs)
    np.testing.assert_allclose(gues_host, gues_ref, rtol=2e-5, atol=2e-4)
    assert ensval.shape == (4, obs.nobs)
    assert t["batches"] == 2


def test_streamed_pipeline_matches_plain():
    """Double-buffered member/tile streaming gives the identical cycle."""
    grid, cfg, driver, ens, obs = _setup(K=4, core="explicit")
    ens_host = jax.tree.map(lambda a: np.asarray(a), ens)
    out0, _, _ = StreamedCycle(driver, member_batch=2, tile_rows=4).cycle(
        jax.tree.map(np.copy, ens_host), obs, 3)
    out1, _, rep = StreamedCycle(driver, member_batch=2, tile_rows=4,
                                 pipeline=True).cycle(
        jax.tree.map(np.copy, ens_host), obs, 3)
    assert rep.get("pipelined")
    for name in out0._fields:
        np.testing.assert_array_equal(getattr(out1, name),
                                      getattr(out0, name))


def _setup_production(K=4, NZ=8, NY=16, NX=16, slots=False,
                      member_bdy=False):
    """Driver with the PRODUCTION composition: SI core + stretched levels
    + terrain + physics suite + Davies boundary forcing (the reference's
    flagship configuration, common_mpi_scale.f90:833 +
    config/example/config.main.hakushu:72-78)."""
    from scale_letkf_tpu.model.physics_suite import PhysicsConfig
    from scale_letkf_tpu.model.boundary import BoundaryData

    DZ, DX, DY = 400.0, 2000.0, 2000.0
    grid = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=DZ,
                          stretch=1.05, proj=Projection(kind="LC"))
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.1, relax_alpha=0.5))
    cfg.letkf_obs.hori_local = tuple([8.0e3] + [-1.0] * 23)
    if slots:
        cfg.obsope.slot_start, cfg.obsope.slot_end = 1, 3
        cfg.obsope.slot_base = 2
        cfg.obsope.slot_tinterval = 4.0   # = 2 steps at dt=2
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=2.0, ztop=grid.ztop,
                         sponge_height=0.8 * grid.ztop, sponge_tau=120.0)
    qv = 0.008 * np.exp(-np.asarray(grid.cz) / 3000.0)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ, qv_prof=qv,
                                        cz=grid.cz)
    base = add_warm_bubble(s0, DZ, DX, DY, amplitude=2.0)
    xg, yg = np.meshgrid(np.arange(NX), np.arange(NY))
    topo = 150.0 * np.exp(-(((xg - NX / 2) / 4.0) ** 2
                            + ((yg - NY / 2) / 4.0) ** 2))
    allp = perturb_ensemble(jax.random.PRNGKey(1), base, K + 1,
                            amplitude=0.5)
    truth = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    bdy = BoundaryData(state0=base, state1=base, t0=0.0, t1=1.0e9)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref, core="si",
                         n_small=4, topo=topo,
                         phys_cfg=PhysicsConfig(mp_scheme="kessler",
                                                rad_interval=2,
                                                slab_capacity=2e5),
                         bdy=bdy, bdy_width=3, bdy_tau=120.0)
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=12,
                                levels_hpa=(900.0, 750.0))
    if slots:
        # spread obs over the window's time slots
        template.dif = rng.choice([-4.0, 0.0, 4.0], template.nobs)
    truth_f = driver.forecast_one(truth, 4)
    nf = state_to_history(state_trans(to_collocated(truth_f)),
                          driver.z_full, driver.topo)
    obs = obsmake(nf, template, grid, cfg, driver.z_full, rng)
    if slots:
        obs.dif = np.asarray(template.dif)
    if member_bdy:
        # per-member boundary ensemble (the reference's per-member bdy
        # files): targets = each member's own initial state. Attached
        # AFTER the truth forecast (the single-member truth run uses the
        # shared boundary, like the reference's deterministic member with
        # its own bdy file).
        driver.bdy = BoundaryData(
            state0=jax.tree.map(lambda a: np.asarray(a), ens),
            state1=jax.tree.map(lambda a: np.asarray(a), ens),
            t0=0.0, t1=1.0e9)
    return grid, cfg, driver, ens, obs


def test_streamed_production_composition_matches_incore():
    """The streamed executor runs the FULL production composition
    (si + stretch + terrain + physics suite + boundary forcing) and
    matches the in-core driver, threading the slab skin state through
    member batches across TWO cycles."""
    grid, cfg, driver, ens, obs = _setup_production(K=4)
    nsteps = 4

    # in-core: two cycles with persisted tsfc
    ens_f = driver.forecast(ens, nsteps)
    ens_a, info = driver.analysis(ens_f, obs)
    tsfc_c1 = np.asarray(driver.tsfc)
    ens_f2 = driver.forecast(ens_a, nsteps)

    # streamed: same two cycles (fresh driver state)
    driver.tsfc = None
    ens_host = jax.tree.map(lambda a: np.asarray(a), ens)
    sc = StreamedCycle(driver, member_batch=2, tile_rows=4)
    out, infl, report = sc.cycle(ens_host, obs, nsteps)
    np.testing.assert_allclose(sc.tsfc_host, tsfc_c1, rtol=1e-5,
                               atol=1e-4)
    for name in out._fields:
        a_ref = np.asarray(getattr(ens_a, name))
        a_str = getattr(out, name)
        scale = max(np.abs(a_ref).max(), 1e-6)
        np.testing.assert_allclose(a_str, a_ref, atol=3e-2 * scale,
                                   rtol=3e-2,
                                   err_msg=f"field {name} diverged")
    # second streamed cycle continues from the threaded tsfc (warm start)
    gues2, _, _, _ = sc.forecast_and_hx(out, nsteps, obs)
    assert np.isfinite(gues2).all()


def test_streamed_member_boundary_matches_incore():
    """Per-member boundary ensembles are batch-sliced in the stream."""
    grid, cfg, driver, ens, obs = _setup_production(K=4, member_bdy=True)
    gues_ref = np.asarray(state_trans(jax.vmap(to_collocated)(
        driver.forecast(ens, 3))))
    driver.tsfc = None
    ens_host = jax.tree.map(lambda a: np.asarray(a), ens)
    sc = StreamedCycle(driver, member_batch=2, tile_rows=4)
    gues_host, ensval, qc, t = sc.forecast_and_hx(ens_host, 3, obs)
    np.testing.assert_allclose(gues_host, gues_ref, rtol=2e-5, atol=2e-4)


def test_streamed_4d_slots_matches_incore():
    """Slot-matched H(x) inside the member stream: each obs is evaluated
    against its time slot's snapshot (obsope_tools.f90:431-508), and the
    result matches the in-core forecast_slots + 4-D obsope path."""
    from scale_letkf_tpu.cli.main import slot_steps_from_cfg
    from scale_letkf_tpu.da.obsope import assign_slots

    # SI core: the explicit core at this dt/dz is past the vertical
    # acoustic CFL, so the beyond-window slot steps amplify roundoff
    grid, cfg, driver, ens, obs = _setup(K=4, core="si")
    cfg.obsope.slot_start, cfg.obsope.slot_end = 1, 3
    cfg.obsope.slot_base = 2
    cfg.obsope.slot_tinterval = 4.0       # = 2 steps at dt=2
    rng = np.random.default_rng(1)
    obs.dif = rng.choice([-4.0, 0.0, 4.0], obs.nobs)
    nsteps = 4

    # in-core 4-D path
    slot_steps = slot_steps_from_cfg(cfg, nsteps, driver.dycfg.dt)
    ens_f, hist = driver.forecast_slots(ens, nsteps, slot_steps)
    from scale_letkf_tpu.da.obsope import obsope_ensemble
    from scale_letkf_tpu.state import state_to_history as s2h
    fields = jax.vmap(lambda g: s2h(g, driver.z_full, driver.topo))(
        jnp.asarray(hist))
    hx = obsope_ensemble(fields, obs, grid, cfg, driver.z_full,
                         slots=assign_slots(obs.dif, cfg))
    ensval_ref = np.asarray(hx.ensval)
    qc_ref = np.asarray(hx.qc)

    # streamed 4-D path
    ens_host = jax.tree.map(lambda a: np.asarray(a), ens)
    sc = StreamedCycle(driver, member_batch=2, tile_rows=4)
    gues_host, ensval, qc, t = sc.forecast_and_hx(ens_host, nsteps, obs)
    good = qc_ref == 0
    assert good.sum() > 10
    np.testing.assert_array_equal(qc, qc_ref)
    np.testing.assert_allclose(ensval[:, good], ensval_ref[:, good],
                               rtol=2e-5, atol=2e-4)
    # the analysis-time guess equals the plain forecast
    gues_n = np.asarray(state_trans(jax.vmap(to_collocated)(
        driver.forecast(ens, nsteps))))
    np.testing.assert_allclose(gues_host, gues_n, rtol=2e-5, atol=2e-4)
