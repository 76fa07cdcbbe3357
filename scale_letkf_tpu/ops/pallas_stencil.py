"""Pallas TPU kernel: fused UD3 advective flux divergence.

The hot inner operation of the dycore's scalar transport (dycore.py
scalar_tend: UD3 face reconstruction + flux divergence per tracer). The
XLA version materializes face-value intermediates between fusions; this
kernel keeps a whole (nz, ny)-column block of the scalar, the mass fluxes
and the output in VMEM and writes only the divergence back.

Blocking: the grid tiles x; halo columns come from the neighboring blocks,
expressed by passing the same array with shifted (periodic) block index
maps — Pallas's idiomatic pattern for overlapping stencil windows. y-halos
are pre-gathered by the caller (cheap concat); z is kept whole.

Validated in interpret mode on CPU (tests); the roll-based XLA path in
dycore.py remains the default until the kernel is benchmarked on hardware.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

HALO = 2


def _ud3_all_faces(phi):
    """UD3 candidate face values at faces i-1/2..n-1/2 along the last axis;
    phi carries HALO cells each side: output length n+1 per candidate."""
    n = phi.shape[-1] - 2 * HALO
    fm1 = phi[..., HALO - 2:HALO - 2 + n + 1]
    f0 = phi[..., HALO - 1:HALO - 1 + n + 1]
    fp1 = phi[..., HALO:HALO + n + 1]
    fp2 = phi[..., HALO + 1:HALO + 1 + n + 1]
    pos = (2.0 * fp1 + 5.0 * f0 - fm1) / 6.0
    neg = (2.0 * f0 + 5.0 * fp1 - fp2) / 6.0
    return pos, neg


def _adv_div_kernel(phi_l, phi_c, phi_r, fx_l, fx_c, fy_c, fw_c, out_ref,
                    *, dx, dy, dz):
    """One x-block of -div(flux·φ) with UD3 reconstruction.

    phi_* blocks: (nz, ny+2H, bx) — y pre-haloed; x halos from neighbors.
    fx_* blocks:  (nz, ny, bx) x-face fluxes at i+1/2 (left block provides
                  the i-1/2 face of the first cell).
    fy_c:         (nz, ny+1, bx) y-face fluxes at j-1/2..ny-1/2.
    fw_c:         (nz+1, ny, bx) z-face fluxes (0 at rigid boundaries).
    """
    phi = jnp.concatenate([phi_l[...][:, :, -HALO:], phi_c[...],
                           phi_r[...][:, :, :HALO]], axis=-1)
    fxp = jnp.concatenate([fx_l[...][:, :, -1:], fx_c[...]], axis=-1)
    fy = fy_c[...]
    fw = fw_c[...]

    # x faces
    phi_x = phi[:, HALO:-HALO, :]
    pos, neg = _ud3_all_faces(phi_x)
    fl_x = fxp * jnp.where(fxp >= 0, pos, neg)
    ddx = (fl_x[..., 1:] - fl_x[..., :-1]) / dx

    # y faces (transpose so the same reconstruction applies)
    phi_y = jnp.swapaxes(phi[:, :, HALO:-HALO], 1, 2)
    pos, neg = _ud3_all_faces(phi_y)
    fy_t = jnp.swapaxes(fy, 1, 2)
    fl_y = fy_t * jnp.where(fy_t >= 0, pos, neg)
    fl_y = jnp.swapaxes(fl_y, 1, 2)
    ddy = (fl_y[:, 1:, :] - fl_y[:, :-1, :]) / dy

    # z faces (UD3 interior, centered at boundary-adjacent faces; matches
    # dycore.ud3_face_z)
    phi_z = phi[:, HALO:-HALO, HALO:-HALO]
    nz = phi_z.shape[0]
    posz = (2.0 * phi_z[1:] + 5.0 * phi_z[:-1]
            - jnp.concatenate([phi_z[:1], phi_z[:-2]], axis=0)) / 6.0
    negz = (2.0 * phi_z[:-1] + 5.0 * phi_z[1:]
            - jnp.concatenate([phi_z[2:], phi_z[-1:]], axis=0)) / 6.0
    fw_int = fw[1:-1]
    face = jnp.where(fw_int >= 0, posz, negz)
    centered = 0.5 * (phi_z[1:] + phi_z[:-1])
    k = jax.lax.broadcasted_iota(jnp.int32, face.shape, 0)
    edge = (k == 0) | (k == nz - 2)
    fl_z_int = fw_int * jnp.where(edge, centered, face)
    zeros = jnp.zeros_like(fl_z_int[:1])
    fl_z = jnp.concatenate([zeros, fl_z_int, zeros], axis=0)
    ddz = (fl_z[1:] - fl_z[:-1]) / dz

    out_ref[...] = -(ddx + ddy + ddz)


def adv_flux_divergence_pallas(
    phi: jax.Array,      # (nz, ny, nx) scalar (mixing-ratio form)
    fx: jax.Array,       # (nz, ny, nx) x-face mass flux at i+1/2
    fy: jax.Array,       # (nz, ny, nx) y-face mass flux at j+1/2
    fw: jax.Array,       # (nz+1, ny, nx) z-face mass flux
    dx: float, dy: float, dz: float,
    *,
    block_x: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """-∇·(flux·φ) with UD3 reconstruction and periodic lateral boundaries.
    Matches dycore.scalar_tend's advective part (without hyperdiffusion)."""
    nz, ny, nx = phi.shape
    bx = min(block_x, nx)
    assert nx % bx == 0, "nx must be divisible by block_x"
    nblk = nx // bx

    # pre-halo y (periodic); pre-shift fy to j-1/2 faces
    phi_y = jnp.concatenate([phi[:, -HALO:, :], phi, phi[:, :HALO, :]],
                            axis=1)
    fyp = jnp.concatenate([fy[:, -1:, :], fy], axis=1)

    def left(i):
        return (0, 0, (i - 1) % nblk)

    def center(i):
        return (0, 0, i)

    def right(i):
        return (0, 0, (i + 1) % nblk)

    kernel = partial(_adv_div_kernel, dx=dx, dy=dy, dz=dz)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nz, ny + 2 * HALO, bx), left),
            pl.BlockSpec((nz, ny + 2 * HALO, bx), center),
            pl.BlockSpec((nz, ny + 2 * HALO, bx), right),
            pl.BlockSpec((nz, ny, bx), left),
            pl.BlockSpec((nz, ny, bx), center),
            pl.BlockSpec((nz, ny + 1, bx), center),
            pl.BlockSpec((nz + 1, ny, bx), center),
        ],
        out_specs=pl.BlockSpec((nz, ny, bx), center),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), phi.dtype),
        interpret=interpret,
    )(phi_y, phi_y, phi_y, fx, fx, fyp, fw)
