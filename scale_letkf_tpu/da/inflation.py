"""Additive covariance inflation.

Equivalent of the additive-inflation stage of das_letkf (reference:
scale/letkf/letkf_tools.f90:804-929): a perturbation ensemble (read from
files in the reference, any (K, NV3D, nz, ny, nx) stack here) is
mean-removed, optionally member-shuffled (Knuth_Shuffle,
common/common_rand.f90:14), optionally weighted by proximity to radar
reflectivity obs and/or the moisture mean ratio, scaled by INFL_ADD, and
added to the analysis ensemble.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.state import IA_Q0
from scale_letkf_tpu.ops.localization import DIST_ZERO_FAC_SQ


def knuth_shuffle(rng: np.random.Generator, k: int) -> np.ndarray:
    """Fisher–Yates member permutation (Knuth_Shuffle analogue)."""
    idx = np.arange(k)
    for i in range(k - 1, 0, -1):
        j = int(rng.integers(0, i + 1))
        idx[i], idx[j] = idx[j], idx[i]
    return idx


def radar_proximity_weight(
    gp_x: np.ndarray, gp_y: np.ndarray,      # (B,) gridpoint coords
    ref_x: np.ndarray, ref_y: np.ndarray,    # radar-reflectivity obs coords
    hori_scale: float,
    buckets=None,                            # optional BucketGrid (GLOBAL ids)
    obs_x_all: np.ndarray | None = None,     # global obs coords when buckets
    obs_y_all: np.ndarray | None = None,     # carry global indices
) -> np.ndarray:
    """INFL_ADD_REF_ONLY weight: Gaussian of distance to the nearest radar
    reflectivity obs, zero beyond the localization cutoff
    (letkf_tools.f90:814-836).

    With `buckets` (the ctype's BucketGrid, spacing >= cutoff) the search is
    capacity-bounded via the 3×3 bucket neighborhood — exact, because any obs
    within the cutoff disc lies in those cells; without it the dense
    O(B·nobs) pairwise form is used (fine at small obs counts)."""
    if len(ref_x) == 0:
        return np.zeros(len(gp_x))
    if buckets is not None:
        from scale_letkf_tpu.ops.obs_select import gather_candidates
        import jax.numpy as jnp
        ox = np.asarray(obs_x_all if obs_x_all is not None else ref_x)
        oy = np.asarray(obs_y_all if obs_y_all is not None else ref_y)
        cand = gather_candidates(buckets, jnp.asarray(gp_x),
                                 jnp.asarray(gp_y))
        c = np.asarray(cand)
        valid = c >= 0
        safe = np.maximum(c, 0)
        d2 = ((gp_x[:, None] - ox[safe]) ** 2
              + (gp_y[:, None] - oy[safe]) ** 2)
        d2[~valid] = np.inf
        nd2 = d2.min(axis=1) / (hori_scale * hori_scale)
    else:
        d2 = ((gp_x[:, None] - ref_x[None, :]) ** 2
              + (gp_y[:, None] - ref_y[None, :]) ** 2).min(axis=1)
        nd2 = d2 / (hori_scale * hori_scale)
    w = np.exp(-0.5 * np.minimum(nd2, 700.0))
    w[nd2 > DIST_ZERO_FAC_SQ] = 0.0
    return w


def apply_additive_inflation(
    anal: jax.Array,          # (K, NV3D, nz, ny, nx) analysis variables
    add_ens: jax.Array,       # (K, NV3D, nz, ny, nx) perturbation source
    infl_add: float,
    *,
    shuffle: np.ndarray | None = None,       # member permutation
    weight: jax.Array | None = None,         # (ny, nx) spatial weight
    q_ratio: bool = False,
    gues_mean: jax.Array | None = None,      # (NV3D, nz, ny, nx), for q_ratio
) -> jax.Array:
    """anal_m += INFL_ADD · w(x) · [r_q] · (add_{shuf(m)} - mean(add))."""
    pert = add_ens - jnp.mean(add_ens, axis=0, keepdims=True)
    if shuffle is not None:
        pert = pert[jnp.asarray(shuffle)]
    scale = jnp.asarray(infl_add, anal.dtype)
    if weight is not None:
        scale = scale * weight[None, None, None]
    incr = pert * scale
    if q_ratio:
        if gues_mean is None:
            raise ValueError("q_ratio requires gues_mean")
        nv = anal.shape[1]
        is_q = (jnp.arange(nv) >= IA_Q0)[None, :, None, None, None]
        incr = jnp.where(is_q, incr * gues_mean[None], incr)
    return anal + incr
