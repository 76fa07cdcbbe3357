"""Synthetic observation generation for OSSE twin experiments.

Equivalent of `obsmake_cal` (reference: scale/obs/obsope_tools.f90:767-1060):
apply H(x) to a nature run, add Gaussian noise scaled by the configured
obs errors (PARAM_OBS_ERROR), and return an obs set ready for assimilation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import Config
from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.obs.types import (
    Observations, ID_U, ID_V, ID_T, ID_Q, ID_PS, ID_RH,
    ID_RADAR_REF, ID_RADAR_VR, ID_H08IR, QC_GOOD,
)
from scale_letkf_tpu.da.obsope import compute_hx_single


def default_err(elem: np.ndarray, cfg: Config, lev=None) -> np.ndarray:
    e = cfg.obs_error
    table = {ID_U: e.u, ID_V: e.v, ID_T: e.t, ID_Q: e.q, ID_RH: e.rh,
             ID_PS: e.ps, ID_RADAR_REF: e.radar_ref, ID_RADAR_VR: e.radar_vr}
    out = np.ones(len(elem))
    for k, v in table.items():
        out[elem == k] = v
    m = elem == ID_H08IR
    if m.any() and lev is not None:
        # per-channel BT errors (OBSERR_H08; channel stored in obs lev)
        ch = np.clip(lev[m].astype(int) - 1, 0, len(e.h08) - 1)
        out[m] = np.asarray(e.h08)[ch]
    return out


def make_obs_network(
    grid: Grid,
    rng: np.random.Generator,
    n_profiles: int = 20,
    elems=(ID_U, ID_V, ID_T, ID_Q),
    levels_hpa=(850.0, 700.0, 500.0, 300.0),
    typ: int = 0,                  # ADPUPA
) -> Observations:
    """Random radiosonde-like network: n_profiles sites × levels × elems."""
    lon2d, lat2d = grid.lonlat
    ny, nx = lon2d.shape
    # keep sites away from the outermost cells so interpolation is interior
    si = rng.integers(2, nx - 2, n_profiles)
    sj = rng.integers(2, ny - 2, n_profiles)
    recs = []
    for p in range(n_profiles):
        for lev in levels_hpa:
            for e in elems:
                recs.append((e, lon2d[sj[p], si[p]], lat2d[sj[p], si[p]],
                             lev * 100.0))
    elem = np.asarray([r[0] for r in recs], np.int32)
    return Observations(
        elem=elem,
        lon=np.asarray([r[1] for r in recs]),
        lat=np.asarray([r[2] for r in recs]),
        lev=np.asarray([r[3] for r in recs]),
        dat=np.zeros(len(recs)),
        err=np.ones(len(recs)),
        typ=np.full(len(recs), typ, np.int32),
        dif=np.zeros(len(recs)))


def obsmake(
    nature_fields: dict[str, jax.Array],
    obs_template: Observations,
    grid: Grid,
    cfg: Config,
    z_full: jax.Array,
    rng: np.random.Generator,
    perfect: bool = False,
) -> Observations:
    """Nature-run H(x) + noise → synthetic obs (obsope_tools.f90:1000-1041).
    Obs with bad QC (outside domain/levels) are dropped."""
    y, qc = compute_hx_single(nature_fields, obs_template, grid, cfg, z_full)
    y = np.asarray(y).copy()
    qc = np.asarray(qc)
    # H08 all-sky BT carries a cloudy-sky sign flag; the obs value is |BT|
    m_h08 = obs_template.elem == ID_H08IR
    y[m_h08] = np.abs(y[m_h08])
    err = default_err(obs_template.elem, cfg, obs_template.lev)
    obs = obs_template.select(slice(None))
    obs.err = err
    obs.dat = y if perfect else y + rng.standard_normal(len(y)) * err
    # H08 profiles are written whole (nch channels per record): keep
    # channels regardless of the ch_use gate unless the profile itself is
    # out of the domain (QC_OUT_H applies to all its channels alike)
    from scale_letkf_tpu.obs.types import QC_OUT_H
    keep = (qc == QC_GOOD) | (m_h08 & (qc != QC_OUT_H))
    return obs.select(keep)
