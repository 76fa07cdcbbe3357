"""One-way online domain nesting: parent → child boundary forcing.

The reference supports multi-domain online nesting (reference:
PARAM_PROCESS NUM_DOMAIN/PRC_DOMAINS, common_nml.f90:56-58; the
communicator split for nesting at common_mpi_scale.f90:696-706 feeding
SCALE's inter-domain coupling; BDA configs run d1..d4 telescoping nests).
Here the parent's state is interpolated to the child grid and drives the
child's lateral boundary relaxation (model/boundary.py) — one-way nesting.
Both domains live in the same JAX program (no intercommunicators needed);
two-way feedback is a planned extension.

Geometry: the child occupies a rectangle of the parent plane, specified by
the parent-grid fractional origin (i0, j0) of the child's first cell center
and the integer refinement ratio. Vertical levels may differ; linear
interpolation in height handles both.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from scale_letkf_tpu.model.dycore import DycoreState
from scale_letkf_tpu.grid import Grid


@dataclass(frozen=True)
class NestGeometry:
    i0: float           # parent fractional x-index of child cell (0,0)
    j0: float
    ratio: int          # refinement ratio (child dx = parent dx / ratio)

    def child_coords(self, child_ny: int, child_nx: int):
        """Parent fractional (j, i) coordinates of every child cell center."""
        ci = self.i0 + np.arange(child_nx) / self.ratio
        cj = self.j0 + np.arange(child_ny) / self.ratio
        return cj, ci


def interp_parent_field(field: jax.Array, cj: np.ndarray, ci: np.ndarray,
                        zp: np.ndarray | None = None,
                        zc: np.ndarray | None = None) -> jax.Array:
    """Interpolate a parent (nz, ny, nx) field to the child grid.

    Horizontal: bilinear at the child cell centers. Vertical: linear in the
    1-D level coordinates zp → zc (identity if omitted)."""
    nzp = field.shape[0]
    if zp is None or zc is None:
        kk = np.arange(nzp)
    else:
        kk = np.interp(np.asarray(zc), np.asarray(zp), np.arange(nzp))
    K = np.broadcast_to(np.asarray(kk)[:, None, None],
                        (len(kk), len(cj), len(ci)))
    J = np.broadcast_to(np.asarray(cj)[None, :, None], K.shape)
    I = np.broadcast_to(np.asarray(ci)[None, None, :], K.shape)
    coords = [jnp.asarray(K), jnp.asarray(J), jnp.asarray(I)]
    return map_coordinates(field, coords, order=1, mode="nearest")


def parent_to_child(parent: DycoreState, geom: NestGeometry,
                    child_shape: tuple[int, int, int],
                    zp: np.ndarray | None = None,
                    zc: np.ndarray | None = None) -> DycoreState:
    """Interpolate a full parent state to the child grid (the child-boundary
    target for boundary.apply_boundary_relaxation)."""
    nz, ny, nx = child_shape
    cj, ci = geom.child_coords(ny, nx)

    def itp(f):
        return interp_parent_field(f, cj, ci, zp, zc)

    def itp_w(f):   # (nzp+1) faces → (nz+1) child faces
        if zp is None or zc is None:
            return interp_parent_field(f, cj, ci)
        zpf = np.concatenate([[zp[0] - (zp[1] - zp[0]) / 2],
                              0.5 * (zp[1:] + zp[:-1]),
                              [zp[-1] + (zp[-1] - zp[-2]) / 2]])
        zcf = np.concatenate([[zc[0] - (zc[1] - zc[0]) / 2],
                              0.5 * (zc[1:] + zc[:-1]),
                              [zc[-1] + (zc[-1] - zc[-2]) / 2]])
        return interp_parent_field(f, cj, ci, zpf, zcf)

    return DycoreState(
        rho=itp(parent.rho),
        rhou=itp(parent.rhou),
        rhov=itp(parent.rhov),
        rhow=itp_w(parent.rhow),
        rhot=itp(parent.rhot),
        rhoq=jax.vmap(itp)(parent.rhoq))
