"""Observation simulator: model fields → simulated obs quantities on the
model grid.

Equivalent of `obssim_cal` (reference: scale/obs/obsope_tools.f90:1063+ and
driver scale/obs/obssim.f90): evaluates requested obs variables (e.g. radar
reflectivity / radial velocity) at every gridpoint of a model state, for
visualization and verification (GrADS output in the reference; plain arrays
here, with an optional flat-binary writer for GrADS compatibility).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import Config
from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.obs.types import (
    ID_U, ID_V, ID_T, ID_TV, ID_Q, ID_RH, ID_PS,
    ID_RADAR_REF, ID_RADAR_VR,
)
from scale_letkf_tpu.obs.operators import calc_ref_vr, radar_geometry
from scale_letkf_tpu.constants import FVIRT


def obssim(
    fields: dict[str, jax.Array],     # history view (state_to_history)
    elems: list[int],
    grid: Grid,
    cfg: Config,
    radar_lonlatz: tuple | None = None,
) -> dict[int, jax.Array]:
    """Simulated 3-D obs fields per requested variable id. 2-D ids (PS)
    return (ny, nx); 3-D ids return (nz, ny, nx)."""
    out = {}
    need_radar = any(e in (ID_RADAR_REF, ID_RADAR_VR) for e in elems)
    if need_radar:
        if radar_lonlatz is None:
            raise ValueError("radar position required for radar simulation")
        lon2d, lat2d = grid.lonlat
        lon3 = jnp.broadcast_to(jnp.asarray(lon2d), fields["t"].shape)
        lat3 = jnp.broadcast_to(jnp.asarray(lat2d), fields["t"].shape)
        az, elev, _ = radar_geometry(lon3, lat3, fields["hgt"],
                                     *radar_lonlatz)
        ref, vr = calc_ref_vr(
            fields["q"], fields["qc"], fields["qr"], fields["qi"],
            fields["qs"], fields["qg"], fields["u"], fields["v"],
            fields["w"], fields["t"], fields["p"], az, elev,
            method=cfg.radar.method_ref_calc,
            use_terminal_velocity=cfg.radar.use_terminal_velocity)
        dbz = 10.0 * jnp.log10(jnp.maximum(ref, cfg.radar.min_radar_ref))
    for e in elems:
        if e == ID_U:
            out[e] = fields["u"]
        elif e == ID_V:
            out[e] = fields["v"]
        elif e == ID_T:
            out[e] = fields["t"]
        elif e == ID_TV:
            out[e] = fields["t"] * (1.0 + FVIRT * fields["q"])
        elif e == ID_Q:
            out[e] = fields["q"]
        elif e == ID_RH:
            out[e] = fields["rh"]
        elif e == ID_PS:
            out[e] = fields["ps"]
        elif e == ID_RADAR_REF:
            out[e] = dbz
        elif e == ID_RADAR_VR:
            out[e] = vr
        else:
            raise ValueError(f"obssim: unsupported variable id {e}")
    return out


def write_grads(path: str, fields3d: list[np.ndarray],
                fields2d: list[np.ndarray] | None = None):
    """Flat-binary GrADS-style output: all 3-D variables (level-major),
    then 2-D variables (write_grd_mpi analogue, obsope_tools.f90:1156)."""
    with open(path, "wb") as f:
        for a in fields3d:
            np.asarray(a, np.float32).tofile(f)
        for a in (fields2d or []):
            np.asarray(a, np.float32).tofile(f)
