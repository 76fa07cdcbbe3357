"""Terrain-following dynamics tests: flat-topo equivalence, hill flow."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import (
    DycoreConfig, tendencies, rk3_step, to_collocated,
)
from scale_letkf_tpu.model.terrain import (
    make_metrics, tendencies_terrain, rk3_step_terrain, contravariant_w,
)
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.state import state_trans, IA_W

NZ, NY, NX = 16, 12, 24
DZ, DX, DY = 500.0, 2000.0, 2000.0


def setup(dt=1.0):
    cfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=dt, ztop=NZ * DZ,
                       sponge_height=6.0e3, sponge_tau=60.0)
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    zc = jnp.asarray((np.arange(NZ) + 0.5) * DZ, jnp.float32)
    grid = Grid.uniform(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz=DZ)
    return cfg, s, rho_ref, p_ref, zc, grid


def hill_topo(height=300.0, half_width=4.0e3):
    x = (np.arange(NX) + 0.5 - NX / 2) * DX
    # 2-D ridge (y-uniform witch of Agnesi)
    h = height / (1.0 + (x / half_width) ** 2)
    return jnp.asarray(np.tile(h[None, :], (NY, 1)), jnp.float32)


def test_flat_topo_reduces_to_flat_core():
    cfg, s, rho_ref, p_ref, zc, grid = setup()
    s = add_warm_bubble(s, DZ, DX, DY)
    m = make_metrics(jnp.zeros((NY, NX)), grid.cz, grid.fz, DX, DY)
    t_flat = tendencies(s, cfg, rho_ref, p_ref)
    t_terr = tendencies_terrain(s, cfg, rho_ref, p_ref, m)
    for a, b in zip(t_flat, t_terr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_contravariant_w_follows_terrain():
    """Pure horizontal flow over a slope must yield ρW ≈ 0 when
    ρw = Gx·ρu (flow parallel to coordinate surfaces)."""
    cfg, s, rho_ref, p_ref, zc, grid = setup()
    topo = hill_topo()
    m = make_metrics(topo, grid.cz, grid.fz, DX, DY)
    # uniform u = 10 m/s; set rhow so that w equals the terrain-following
    # vertical motion at faces
    rhou = 10.0 * s.rho
    rhou_c = rhou  # uniform, so face/center identical
    rhow = jnp.zeros_like(s.rhow)
    gx_c = 0.5 * (m.gx_zf[:, :, :] + m.gx_zf[:, :, :])  # same
    # w at interior z-face = Gx·u (centered average of face Gx·rho u)
    rhou_zf = 0.5 * (rhou[1:] + rhou[:-1])
    # Gx at z-faces is x-face-centered; average to centers for this estimate
    gx_center = 0.5 * (m.gx_zf + jnp.roll(m.gx_zf, 1, axis=-1))
    rhow = rhow.at[1:-1].set(gx_center[1:-1] * rhou_zf)
    s2 = s._replace(rhou=rhou, rhow=rhow)
    rw = contravariant_w(s2, m)
    # ρW much smaller than the raw ρw it was built from
    denom = float(jnp.abs(rhow).max())
    assert denom > 0
    assert float(jnp.abs(rw).max()) < 0.2 * denom


def test_hill_flow_stable_and_generates_waves():
    cfg, s, rho_ref, p_ref, zc, grid = setup()
    topo = hill_topo()
    m = make_metrics(topo, grid.cz, grid.fz, DX, DY)
    # impose uniform westerly flow
    s = s._replace(rhou=10.0 * s.rho)

    @jax.jit
    def step(st):
        return rk3_step_terrain(st, cfg, rho_ref, p_ref, zc, m)

    out = s
    for _ in range(120):
        out = step(out)
    for f in out:
        assert np.isfinite(np.asarray(f)).all()
    w = np.asarray(state_trans(to_collocated(out))[IA_W])
    # terrain forces vertical motion near the ridge
    assert np.abs(w[:, NY // 2, :]).max() > 0.05
    # but bounded (no instability)
    assert np.abs(w).max() < 10.0


def test_balanced_state_over_terrain_quasi_steady():
    """A resting base state over terrain should stay nearly at rest (the
    pressure-gradient metric terms must cancel to truncation error)."""
    cfg, s, rho_ref, p_ref, zc, grid = setup()
    topo = hill_topo(height=200.0)
    m = make_metrics(topo, grid.cz, grid.fz, DX, DY)

    @jax.jit
    def step(st):
        return rk3_step_terrain(st, cfg, rho_ref, p_ref, zc, m)

    out = s
    for _ in range(60):
        out = step(out)
    w = np.asarray(state_trans(to_collocated(out))[IA_W])
    # spurious terrain-induced circulation stays small (truncation-level)
    assert np.abs(w).max() < 0.5, f"spurious w over terrain: {np.abs(w).max()}"
