"""Fused whole-tendency Pallas kernel: interpret-mode equivalence with
dycore.tendencies (the XLA roll path) on random balanced-ish states."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import (
    DycoreConfig, DycoreState, tendencies, hydrostatic_reference,
)
from scale_letkf_tpu.ops.pallas_tendency import tendencies_fused
from scale_letkf_tpu.state import NQ


def _random_state(rng, nz, ny, nx):
    theta = 300.0 + 10.0 * np.linspace(0, 1, nz)
    rho1d, p1d = hydrostatic_reference(theta, 500.0)
    rho = rho1d[:, None, None] * (
        1.0 + 0.01 * rng.standard_normal((nz, ny, nx)))
    rhot = rho * theta[:, None, None] * (
        1.0 + 0.01 * rng.standard_normal((nz, ny, nx)))
    rhou = 5.0 * rng.standard_normal((nz, ny, nx)) * rho
    rhov = 5.0 * rng.standard_normal((nz, ny, nx)) * rho
    rhow = 0.5 * rng.standard_normal((nz + 1, ny, nx))
    rhow[0] = rhow[-1] = 0.0
    rhoq = np.abs(1e-3 * rng.standard_normal((NQ, nz, ny, nx))) * rho
    f32 = jnp.float32
    s = DycoreState(
        rho=jnp.asarray(rho, f32), rhou=jnp.asarray(rhou, f32),
        rhov=jnp.asarray(rhov, f32), rhow=jnp.asarray(rhow, f32),
        rhot=jnp.asarray(rhot, f32), rhoq=jnp.asarray(rhoq, f32))
    rho_ref = jnp.asarray(rho1d[:, None, None], f32)
    p_ref = jnp.asarray(p1d[:, None, None], f32)
    return s, rho_ref, p_ref


@pytest.mark.parametrize("divdmp", [0.0, 0.05])
def test_fused_matches_xla(divdmp):
    rng = np.random.default_rng(0)
    nz, ny, nx = 8, 16, 16
    cfg = DycoreConfig(dx=2000.0, dy=2000.0, dz=500.0, dt=4.0,
                       divdmp=divdmp, kdiff4=1e-3)
    s, rho_ref, p_ref = _random_state(rng, nz, ny, nx)

    ref = tendencies(s, cfg, rho_ref, p_ref)
    out = tendencies_fused(s, cfg, rho_ref, p_ref, block_y=8,
                           interpret=True)
    for name, a, b in zip(ref._fields, ref, out):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.maximum(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, rtol=2e-5,
                                   err_msg=name)


def test_fused_dispatch_via_config():
    """cfg.advection='pallas_fused' routes tendencies() through the
    fused kernel (interpret off-TPU) and matches the XLA default."""
    rng = np.random.default_rng(1)
    nz, ny, nx = 8, 16, 16
    s, rho_ref, p_ref = _random_state(rng, nz, ny, nx)
    cfg_x = DycoreConfig(dx=2000.0, dy=2000.0, dz=500.0, dt=4.0)
    cfg_p = DycoreConfig(dx=2000.0, dy=2000.0, dz=500.0, dt=4.0,
                         advection="pallas_fused")
    ref = tendencies(s, cfg_x, rho_ref, p_ref)
    out = tendencies(s, cfg_p, rho_ref, p_ref)
    for name, a, b in zip(ref._fields, ref, out):
        a = np.asarray(a)
        scale = np.maximum(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(b), a, atol=2e-5 * scale,
                                   rtol=2e-5, err_msg=name)


def test_fused_rejects_stretched_grid():
    from scale_letkf_tpu.model.dycore import make_vgrid
    rng = np.random.default_rng(2)
    nz, ny, nx = 8, 16, 16
    s, rho_ref, p_ref = _random_state(rng, nz, ny, nx)
    cfg = DycoreConfig(dx=2000.0, dy=2000.0, dz=500.0, dt=4.0,
                       advection="pallas_fused")
    fz = np.linspace(0, nz * 500.0, nz + 1) ** 1.1 / (nz * 500.0) ** 0.1
    cz = 0.5 * (fz[1:] + fz[:-1])
    vg = make_vgrid(cz, fz)
    with pytest.raises(ValueError):
        tendencies(s, cfg, rho_ref, p_ref, vg)
