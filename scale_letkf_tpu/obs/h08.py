"""Himawari-8 infrared radiance interface (stub).

The reference's H08 path (reference: scale/common/scale_H08_fwd.F90, built
only with H08=T, and Trans_XtoY_H08 at common_obs_scale.f90:2777) wraps the
proprietary RTTOV v11 radiative-transfer model to produce all-sky/clear-sky
brightness temperatures and a transmittance-weighted sensitive height. RTTOV
is not redistributable, so — exactly like a reference build without H08=T —
this framework ships the interface without the radiative-transfer core:
obs ids, QC slots, channel config (config.py would gain PARAM_LETKF_H08 on
activation) are reserved, and `rttov_fwd` raises until an RT backend (e.g. a
JAX-native correlated-k model) is plugged in.
"""

from __future__ import annotations

import jax

NCHAN = 10  # Himawari-8 AHI bands B07..B16 (common_nml.f90 nch)


def rttov_fwd(profiles: dict[str, jax.Array], channels: list[int]):
    """All-sky brightness temperature forward model (SCALE_RTTOV_fwd
    analogue, scale_H08_fwd.F90:6-26). Not available without an RT backend."""
    raise NotImplementedError(
        "Himawari-8 radiance assimilation requires a radiative-transfer "
        "backend (the reference uses proprietary RTTOV v11; see obs/h08.py).")


def trans_xtoy_h08(*args, **kwargs):
    """Trans_XtoY_H08 analogue (common_obs_scale.f90:2777)."""
    raise NotImplementedError(
        "H08 operator requires rttov_fwd; see obs/h08.py.")
