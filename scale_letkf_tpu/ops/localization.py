"""R-localization weights (Gaussian taper with hard cutoff).

Reference semantics (scale/letkf/letkf_obs.f90:27-28 and
letkf_tools.f90:1850-1906 obs_local_cal): normalized distances are tapered
with exp(-0.5 d²) and cut off at d = dist_zero_fac = 2·sqrt(10/3), the
distance where a Gaspari–Cohn function with matched width reaches zero.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DIST_ZERO_FAC = 2.0 * np.sqrt(10.0 / 3.0)
DIST_ZERO_FAC_SQ = DIST_ZERO_FAC * DIST_ZERO_FAC


def gauss_taper(ndist2: jax.Array) -> jax.Array:
    """Localization weight from normalized squared 3-D distance, zero beyond
    the cutoff (obs_local_cal: nrloc = exp(-0.5 ndist), letkf_tools.f90:1899)."""
    w = jnp.exp(-0.5 * ndist2)
    return jnp.where(ndist2 > DIST_ZERO_FAC_SQ, 0.0, w)


def normalized_dist2(
    dx: jax.Array, dy: jax.Array, hori_scale: jax.Array,
    dvert: jax.Array, vert_scale: jax.Array,
) -> jax.Array:
    """(d_h/σ_h)² + (d_v/σ_v)², with σ_v == 0 meaning no vertical localization
    (obs_local_cal, letkf_tools.f90:1851-1897). Component-wise cutoff handled
    by gauss_taper on the sum; callers may pre-reject per-component."""
    nd_h2 = (dx * dx + dy * dy) / (hori_scale * hori_scale)
    safe_v = jnp.where(vert_scale > 0, vert_scale, 1.0)
    nd_v2 = jnp.where(vert_scale > 0, (dvert / safe_v) ** 2, 0.0)
    return nd_h2 + nd_v2


def gaspari_cohn(r: jax.Array) -> jax.Array:
    """Gaspari & Cohn (1999) 5th-order piecewise-rational compact taper,
    provided as an alternative localization function (r normalized so the
    function reaches zero at r = 2)."""
    r = jnp.abs(r)
    r2, r3 = r * r, r * r * r
    inner = (-0.25 * r3 * r2 + 0.5 * r2 * r2 + 0.625 * r3
             - (5.0 / 3.0) * r2 + 1.0)
    outer = ((1.0 / 12.0) * r3 * r2 - 0.5 * r2 * r2 + 0.625 * r3
             + (5.0 / 3.0) * r2 - 5.0 * r + 4.0
             - (2.0 / 3.0) / jnp.maximum(r, 1e-10))
    return jnp.where(r <= 1.0, inner, jnp.where(r <= 2.0, outer, 0.0))
