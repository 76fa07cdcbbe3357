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
