"""Pallas UD3 advection kernel: interpret-mode equivalence with the
roll-based dycore implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import ud3_face_x, ud3_face_y, ud3_face_z
from scale_letkf_tpu.ops.pallas_stencil import adv_flux_divergence_pallas


def reference_div(phi, fx, fy, fw, dx, dy, dz):
    """The dycore's roll-based scalar advective divergence (scalar_tend
    minus hyperdiffusion), for a mixing-ratio field phi."""
    fl_x = fx * ud3_face_x(phi, fx)
    fl_y = fy * ud3_face_y(phi, fy)
    fw_int = fw[1:-1]
    fl_z_int = fw_int * ud3_face_z(phi, fw_int)
    zeros = jnp.zeros_like(fl_z_int[:1])
    fl_z = jnp.concatenate([zeros, fl_z_int, zeros], axis=0)
    ddx = (fl_x - jnp.roll(fl_x, 1, axis=-1)) / dx
    ddy = (fl_y - jnp.roll(fl_y, 1, axis=-2)) / dy
    ddz = (fl_z[1:] - fl_z[:-1]) / dz
    return -(ddx + ddy + ddz)


def test_pallas_matches_reference():
    rng = np.random.default_rng(0)
    nz, ny, nx = 8, 16, 32
    dx = dy = 2000.0
    dz = 500.0
    phi = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    fx = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    fy = jnp.asarray(rng.standard_normal((nz, ny, nx)), jnp.float32)
    fw = jnp.asarray(rng.standard_normal((nz + 1, ny, nx)), jnp.float32)
    fw = fw.at[0].set(0.0).at[-1].set(0.0)

    ref = reference_div(phi, fx, fy, fw, dx, dy, dz)
    for bx in (16, 8, 4):
        out = adv_flux_divergence_pallas(phi, fx, fy, fw, dx, dy, dz,
                                         block_y=bx, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"block_x={bx}")


def test_pallas_upwind_selection():
    """Pure positive/negative uniform flow: UD3 picks the correct stencil."""
    nz, ny, nx = 4, 8, 16
    k, j, i = np.mgrid[0:nz, 0:ny, 0:nx]
    phi = jnp.asarray(np.sin(2 * np.pi * i / nx), jnp.float32)
    for sign in (1.0, -1.0):
        fx = jnp.full((nz, ny, nx), sign, jnp.float32)
        fy = jnp.zeros((nz, ny, nx), jnp.float32)
        fw = jnp.zeros((nz + 1, ny, nx), jnp.float32)
        ref = reference_div(phi, fx, fy, fw, 1.0, 1.0, 1.0)
        out = adv_flux_divergence_pallas(phi, fx, fy, fw, 1.0, 1.0, 1.0,
                                         block_y=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_pallas_advection_wired_into_dycore():
    """DycoreConfig.advection='pallas' drives the production scalar
    advection through the fused kernel (interpret mode off-TPU) and
    matches the XLA roll path."""
    import numpy as np
    from scale_letkf_tpu.model.dycore import DycoreConfig, rk3_step
    from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
    import jax.numpy as jnp

    nz, ny, nx, dz = 8, 8, 16, 500.0
    s0, rho_ref, p_ref = balanced_state(nz, ny, nx, dz)
    s0 = add_warm_bubble(s0, dz, 1000.0, 1000.0, amplitude=2.0)
    zc = jnp.asarray((np.arange(nz) + 0.5) * dz, jnp.float32)
    kw = dict(dx=1000.0, dy=1000.0, dz=dz, dt=0.5, ztop=nz * dz)
    out_x = rk3_step(s0, DycoreConfig(**kw), rho_ref, p_ref, zc)
    out_p = rk3_step(s0, DycoreConfig(**kw, advection="pallas"),
                     rho_ref, p_ref, zc)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_advection_rejects_unsupported():
    import numpy as np
    import pytest
    from scale_letkf_tpu.model.dycore import (
        DycoreConfig, rk3_step, make_vgrid)
    from scale_letkf_tpu.model.ideal import balanced_state
    import jax.numpy as jnp

    nz, ny, nx, dz = 6, 8, 8, 400.0
    s0, rho_ref, p_ref = balanced_state(nz, ny, nx, dz)
    zc = jnp.asarray((np.arange(nz) + 0.5) * dz, jnp.float32)
    fz = np.cumsum([0] + [400.0 * 1.1 ** k for k in range(nz)])
    cz = 0.5 * (fz[1:] + fz[:-1])
    vg = make_vgrid(cz, fz)
    cfg = DycoreConfig(dx=1000.0, dy=1000.0, dz=dz, dt=0.5, ztop=nz * dz,
                       advection="pallas")
    with pytest.raises(ValueError, match="pallas"):
        rk3_step(s0, cfg, rho_ref, p_ref, zc, vg)
