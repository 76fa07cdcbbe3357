"""Radar super-observation (thinning/averaging) preprocessing.

Equivalent of the reference's offline superobbing tool (reference:
scale/obs/superob.f90:1-14 + superob_tools.f90 — general/vertical/grid
averaging of dense radar volumes; legacy GFS-era, not built in the
reference's SCALE binaries but part of its radar-DA toolchain). Dense
phased-array volumes are averaged into one observation per
(x, y, z) box per variable, reducing obs counts and representativeness
error before assimilation.

Vectorized NumPy (host-side preprocessing, like the bucket sort).
"""

from __future__ import annotations

import numpy as np

from scale_letkf_tpu.obs.types import Observations
from scale_letkf_tpu.grid import Grid

UNDEF = -9.99e33


def superob_radar(
    obs: Observations,
    grid: Grid,
    box_xy: float,            # horizontal box size [m]
    box_z: float,             # vertical box size [m]
    min_count: int = 1,
) -> Observations:
    """Average radar obs per (elem, x-box, y-box, z-box).

    The superob position is the data-weighted mean position; value and
    error follow the reference's averaging convention (mean value; error of
    the mean with a representativeness floor of the original error)."""
    x, y = grid.proj.lonlat_to_xy(obs.lon, obs.lat)
    x = np.asarray(x)
    y = np.asarray(y)
    z = obs.lev
    gi = np.floor(x / box_xy).astype(np.int64)
    gj = np.floor(y / box_xy).astype(np.int64)
    gk = np.floor(z / box_z).astype(np.int64)
    # group key: (elem, i, j, k)
    key = np.stack([obs.elem.astype(np.int64), gi, gj, gk], axis=1)
    uniq, inv, counts = np.unique(key, axis=0, return_inverse=True,
                                  return_counts=True)
    n = len(uniq)

    def group_mean(v):
        out = np.zeros(n)
        np.add.at(out, inv, v)
        return out / counts

    keep = counts >= min_count
    new = Observations(
        elem=uniq[:, 0][keep].astype(np.int32),
        lon=group_mean(obs.lon)[keep],
        lat=group_mean(obs.lat)[keep],
        lev=group_mean(obs.lev)[keep],
        dat=group_mean(obs.dat)[keep],
        # error of the mean, floored at a representativeness fraction
        err=np.maximum(group_mean(obs.err)[keep] / np.sqrt(counts[keep]),
                       0.5 * group_mean(obs.err)[keep]),
        typ=np.rint(group_mean(obs.typ)[keep]).astype(np.int32),
        dif=group_mean(obs.dif)[keep],
        meta=obs.meta.copy())
    return new
