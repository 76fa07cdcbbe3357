"""shard_map halo-exchange dycore: bitwise-level equivalence with the
global roll-based step."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import DycoreConfig, rk3_step
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
from scale_letkf_tpu.parallel.mesh import make_mesh
from scale_letkf_tpu.parallel.halo import rk3_step_halo, exchange_axis

NZ, NY, NX = 12, 16, 16
DZ, DX, DY = 500.0, 2000.0, 2000.0


def test_exchange_axis_periodic():
    mesh = make_mesh(1, 1, 4)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from functools import partial

    x = jnp.arange(16.0).reshape(1, 16)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "dx"),),
             out_specs=P(None, "dx"))
    def f(loc):
        ext = exchange_axis(loc, 1, "dx", 2)
        # return the interior (sanity: round trip)
        return ext[:, 2:-2]

    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "dx"),),
             out_specs=P(None, "dx"))
    def left_halo(loc):
        ext = exchange_axis(loc, 1, "dx", 2)
        return ext[:, :4]  # left halo + first 2 interior

    out = np.asarray(left_halo(x))
    # device 0's left halo comes from the global right edge (periodic)
    np.testing.assert_array_equal(out[0, :2], [14.0, 15.0])


def _case(lateral="periodic", stretched=False):
    import pytest
    cfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ,
                       sponge_height=4.5e3, sponge_tau=60.0,
                       lateral=lateral)
    vg = None
    if stretched:
        from scale_letkf_tpu.grid import Grid
        from scale_letkf_tpu.model.dycore import make_vgrid
        g = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=DZ,
                           stretch=1.06)
        vg = make_vgrid(g.cz, g.fz)
        zc = jnp.asarray(g.cz, jnp.float32)
        s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ, cz=g.cz)
    else:
        zc = jnp.asarray((np.arange(NZ) + 0.5) * DZ, jnp.float32)
        s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    s = add_warm_bubble(s, DZ, DX, DY, amplitude=2.0,
                        center=(NX * DX / 2, NY * DY / 2, 1.5e3),
                        radius=(4e3, 4e3, 1.5e3))
    return cfg, s, rho_ref, p_ref, zc, vg


def _compare(lateral="periodic", stretched=False, overlap=False,
             steps=5, mesh_shape=(1, 2, 2)):
    cfg, s, rho_ref, p_ref, zc, vg = _case(lateral, stretched)
    ref = s
    for _ in range(steps):
        ref = rk3_step(ref, cfg, rho_ref, p_ref, zc, vg)
    mesh = make_mesh(*mesh_shape)
    step = jax.jit(lambda st: rk3_step_halo(st, cfg, rho_ref, p_ref, zc,
                                            mesh, vg=vg, overlap=overlap))
    out = s
    for _ in range(steps):
        out = step(out)
    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-6, atol=1e-4,
                                   err_msg=f"field {name}")


def test_halo_step_matches_global():
    _compare()


def test_halo_step_open_bc_matches_global():
    """Open lateral boundaries: mesh-edge shards clamp their outer halo
    (the _shift_clamp ghost-cell convention) — must equal the global
    edge-clamped step."""
    _compare(lateral="open")


def test_halo_step_stretched_matches_global():
    """VGrid (stretched vertical levels) through the halo path."""
    _compare(stretched=True)


def test_halo_step_overlap_matches_global():
    """The interior/edge-band overlap decomposition is numerically
    identical to the plain extended-block evaluation."""
    _compare(overlap=True)
    _compare(lateral="open", overlap=True)


def test_driver_halo_backend_matches_gspmd():
    """DycoreConfig.halo='explicit' is selectable from CycleDriver and the
    ensemble forecast equals the GSPMD-roll path on the 8-device mesh;
    step wall-clock is reported for both (no-regression check is
    meaningful on real ICI, but catastrophic slowdowns would show even on
    virtual devices)."""
    import time
    from scale_letkf_tpu.config import Config, EnsembleConfig
    from scale_letkf_tpu.grid import Grid, Projection
    from scale_letkf_tpu.cycle import CycleDriver
    from scale_letkf_tpu.model.ideal import perturb_ensemble
    from scale_letkf_tpu.parallel.mesh import shard_ensemble

    K = 4
    mesh = make_mesh(2, 2, 2)
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz=DZ,
                        proj=Projection(kind="LC"))
    cfg = Config(ensemble=EnsembleConfig(member=K))
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    s = add_warm_bubble(s, DZ, DX, DY, amplitude=2.0)
    ens = perturb_ensemble(jax.random.PRNGKey(2), s, K, amplitude=0.5)

    times = {}
    outs = {}
    for halo in ("gspmd", "explicit", "explicit_overlap"):
        dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ,
                             sponge_height=4.5e3, sponge_tau=60.0,
                             halo=halo)
        d = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref, mesh=mesh)
        e = shard_ensemble(mesh, ens)
        out = d.forecast(e, 3)            # includes compile
        t0 = time.perf_counter()
        out = d.forecast(out, 3)
        times[halo] = time.perf_counter() - t0
        outs[halo] = jax.device_get(out)
    print(f"halo backend step times (8 virtual devices): {times}")
    for halo in ("explicit", "explicit_overlap"):
        for name, a, b in zip(outs["gspmd"]._fields, outs["gspmd"],
                              outs[halo]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=5e-4,
                                       err_msg=f"{halo}: field {name}")


def test_halo_step_ensemble_member_axis():
    """Ensemble halo step with the member axis sharded on the mesh equals
    per-member global steps."""
    from scale_letkf_tpu.parallel.halo import rk3_step_halo_ens
    from scale_letkf_tpu.parallel.mesh import shard_ensemble
    cfg, s, rho_ref, p_ref, zc, vg = _case()
    K = 4
    import jax.random as jr
    from scale_letkf_tpu.model.ideal import perturb_ensemble
    ens = perturb_ensemble(jr.PRNGKey(0), s, K, amplitude=0.5)
    ref = ens
    for _ in range(3):
        ref = jax.vmap(
            lambda m: rk3_step(m, cfg, rho_ref, p_ref, zc))(ref)
    mesh = make_mesh(2, 2, 2)
    ens_s = shard_ensemble(mesh, ens)
    step = jax.jit(lambda st: rk3_step_halo_ens(st, cfg, rho_ref, p_ref,
                                                zc, mesh))
    out = ens_s
    for _ in range(3):
        out = step(out)
    for name, a, b in zip(ref._fields, ref, out):
        # vmap-inside-shard_map reassociates float32 reductions slightly
        # differently from global vmap; a lone rhow cell hits 1.05e-4
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-6, atol=3e-4,
                                   err_msg=f"field {name}")


def test_si_halo_backend_matches_gspmd():
    """SI (HEVI) core + stretched vertical + TERRAIN under the explicit
    halo backend equals the GSPMD path on the 8-device mesh — the
    PRODUCTION core composition (SURVEY §2.8 item 4: COMM_vars8-style
    exchange; the acoustic substeps exchange halo-1 per small step like
    the reference's per-substep COMM)."""
    import time
    from scale_letkf_tpu.config import Config, EnsembleConfig
    from scale_letkf_tpu.grid import Grid, Projection
    from scale_letkf_tpu.cycle import CycleDriver
    from scale_letkf_tpu.model.ideal import perturb_ensemble
    from scale_letkf_tpu.parallel.mesh import shard_ensemble

    K = 4
    mesh = make_mesh(2, 2, 2)
    grid = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=DZ,
                          stretch=1.05, proj=Projection(kind="LC"))
    cfg = Config(ensemble=EnsembleConfig(member=K))
    qv = 0.006 * np.exp(-np.asarray(grid.cz) / 3000.0)
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ, qv_prof=qv,
                                       cz=grid.cz)
    s = add_warm_bubble(s, DZ, DX, DY, amplitude=2.0)
    ens = perturb_ensemble(jax.random.PRNGKey(3), s, K, amplitude=0.5)
    xg, yg = np.meshgrid(np.arange(NX), np.arange(NY))
    topo = 120.0 * np.exp(-(((xg - NX / 2) / 3.0) ** 2
                            + ((yg - NY / 2) / 3.0) ** 2))

    times = {}
    outs = {}
    for halo in ("gspmd", "explicit", "explicit_overlap"):
        dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=4.0, ztop=grid.ztop,
                             sponge_height=0.8 * grid.ztop,
                             sponge_tau=60.0, halo=halo)
        d = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref, mesh=mesh,
                        core="si", n_small=4, topo=topo)
        e = shard_ensemble(mesh, ens)
        out = d.forecast(e, 2)            # includes compile
        t0 = time.perf_counter()
        out = d.forecast(out, 2)
        times[halo] = time.perf_counter() - t0
        outs[halo] = jax.device_get(out)
    print(f"SI halo backend step times (8 virtual devices): {times}")
    for halo in ("explicit", "explicit_overlap"):
        for name, a, b in zip(outs["gspmd"]._fields, outs["gspmd"],
                              outs[halo]):
            # mismatches are scattered (not shard-boundary) f32
            # op-reordering roundoff accumulated over the acoustic
            # substeps; same tolerance class as the explicit-core test
            scale = max(np.abs(np.asarray(a)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=3e-5, atol=1e-4 * scale,
                                       err_msg=f"{halo}: field {name}")
