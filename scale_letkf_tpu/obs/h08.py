"""Himawari-8 AHI infrared radiance forward operator.

The reference's H08 path (reference: scale/common/scale_H08_fwd.F90:6-26,
built only with H08=T, and Trans_XtoY_H08 at common_obs_scale.f90:2777-2970)
wraps the proprietary RTTOV v11 radiative-transfer model to produce
all-sky/clear-sky brightness temperatures for the 10 AHI IR bands
(B07..B16) plus a transmittance weighting function whose peak pressure
becomes the obs' vertical-localization level.

RTTOV is not redistributable, so this framework ships a **JAX-native
parameterized broadband band-emission model** with the same interface and
the same qualitative Jacobian structure:

  - per-band water-vapor mass absorption with pressure broadening (the
    6.2/6.9/7.3 um bands peak in the upper/mid troposphere, the window
    bands see the surface),
  - fixed-gas (CO2 at 13.3 um, O3 at 9.6 um) gray absorption,
  - gray liquid/ice hydrometeor absorption (all-sky vs clear-sky BT),
  - geostationary slant-path geometry from (lon, lat),
  - Planck emission integrated layer-by-layer from TOA to the surface.

It is *not* RTTOV: band coefficients are order-of-magnitude physical
estimates tuned for OSSE twin experiments (obsmake -> obsope -> letkf),
where the identical operator generates and assimilates the radiances. For
real-data assimilation the per-band coefficients (K_WV, K_FIX, WV_P_EXP)
are the calibration surface.

Outputs mirror SCALE_RTTOV_fwd: btall (all-sky BT), btclr (clear-sky BT),
and the weighting-function peak pressure (plev); Trans_XtoY_H08 semantics
(cloudy-sky sign flip, H08_CH_USE channel gating) are reproduced in
trans_xtoy_h08 below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import GRAV, D2R
from scale_letkf_tpu.obs.types import QC_GOOD, QC_OBS_BAD

NCHAN = 10  # AHI bands B07..B16 (common_nml.f90 nch)

# Band-center wavenumbers [cm^-1] for AHI B07..B16
# (central wavelengths 3.885, 6.243, 6.941, 7.347, 8.593, 9.637, 10.407,
#  11.240, 12.381, 13.281 um).
WAVENUM = jnp.array([2574.0, 1602.0, 1441.0, 1361.0, 1164.0,
                     1038.0, 961.0, 890.0, 808.0, 753.0])

# Water-vapor mass absorption coefficient per band [m^2/kg], at p0=1000 hPa.
# B08-B10 are the WV bands; window bands carry weak continuum absorption.
# Calibrated so a 25 kg/m^2 column gives od ~0.15 in the windows and a
# saturated od ~30 at 6.2 um (weighting functions peak at the right heights).
K_WV = jnp.array([0.008, 1.6, 0.55, 0.22, 0.012,
                  0.010, 0.006, 0.006, 0.012, 0.010])

# Fixed-gas gray absorption [m^2 per kg of air]: CO2 (B16, 13.3 um, total
# od ~3.5), O3 (B12, 9.6 um, od ~1.2), weak elsewhere (column air mass
# p0/g ~ 1e4 kg/m^2).
K_FIX = jnp.array([5e-6, 8e-6, 8e-6, 8e-6, 5e-6,
                   1.2e-4, 5e-6, 4e-6, 8e-6, 3.5e-4])

# Pressure-broadening exponent for the WV optical depth, k ~ (p/p0)^exp.
WV_P_EXP = 0.8
P0 = 1.0e5  # Pa

# Gray hydrometeor mass absorption [m^2/kg] (geometric-optics estimates for
# r_eff ~ 10 um liquid / 30 um ice).
K_LIQ = 140.0
K_ICE = 60.0

# Planck constants for wavenumber in cm^-1
C1 = 1.191042e-8   # W / (m^2 sr cm^-4)
C2 = 1.4387752     # K cm

# Himawari-8 sub-satellite longitude and geostationary altitude
SAT_LON = 140.7
SAT_ALT = 35786.0e3
R_EARTH = 6371.0e3


def load_calibration(path: str) -> None:
    """Install fitted band coefficients (obs/h08_calibrate.py output).

    Must be called BEFORE building/tracing any jitted operator that uses
    this module (the coefficients are closed over as trace-time
    constants); already-compiled functions keep the old values."""
    import json
    global K_WV, K_FIX, WV_P_EXP
    with open(path) as f:
        d = json.load(f)
    K_WV = jnp.asarray(d["k_wv"])
    K_FIX = jnp.asarray(d["k_fix"])
    WV_P_EXP = float(d["wv_p_exp"])


def planck_rad(t: jax.Array, wn: jax.Array) -> jax.Array:
    """Planck radiance at temperature t [K], wavenumber wn [cm^-1]."""
    return C1 * wn**3 / (jnp.exp(C2 * wn / t) - 1.0)


def planck_bt(rad: jax.Array, wn: jax.Array) -> jax.Array:
    """Inverse Planck: radiance -> brightness temperature."""
    return C2 * wn / jnp.log1p(C1 * wn**3 / jnp.maximum(rad, 1e-30))


def satellite_zenith(lon: jax.Array, lat: jax.Array) -> jax.Array:
    """Geostationary satellite zenith angle [rad] at (lon, lat) deg
    (the reference computes this inside SCALE_RTTOV_fwd from lon/lat,
    common_obs_scale.f90:2890)."""
    cos_psi = jnp.cos(lat * D2R) * jnp.cos((lon - SAT_LON) * D2R)
    r = R_EARTH + SAT_ALT
    # zenith = angle between local vertical and the slant path
    sin_zen = r * jnp.sqrt(jnp.maximum(1.0 - cos_psi**2, 0.0)) / jnp.sqrt(
        R_EARTH**2 + r**2 - 2.0 * R_EARTH * r * cos_psi)
    return jnp.arcsin(jnp.clip(sin_zen, 0.0, 1.0))


def h08_rt_fwd(
    p: jax.Array,       # (..., nz) pressure [Pa], ascending k (p decreasing)
    t: jax.Array,       # (..., nz) temperature [K]
    qv: jax.Array,      # (..., nz) specific humidity [kg/kg]
    qliq: jax.Array,    # (..., nz) liquid water (qc+qr) [kg/kg]
    qice: jax.Array,    # (..., nz) ice water (qi+qs+qg) [kg/kg]
    tsfc: jax.Array,    # (...,) surface temperature [K]
    psfc: jax.Array,    # (...,) surface pressure [Pa]
    zenith: jax.Array,  # (...,) satellite zenith angle [rad]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Broadband IR radiative transfer (SCALE_RTTOV_fwd analogue,
    scale_H08_fwd.F90:6-26).

    Returns (btall, btclr, plev): all-sky BT (..., nch), clear-sky BT
    (..., nch), and the all-sky weighting-function peak pressure [Pa]
    (..., nch) used as the obs vertical-localization level
    (common_obs_scale.f90:2910-2933).
    """
    # layer air mass [kg/m^2] centered on each level: dm_k = -dp_k / g
    p_lo = jnp.concatenate([psfc[..., None],
                            0.5 * (p[..., :-1] + p[..., 1:])], axis=-1)
    p_hi = jnp.concatenate([0.5 * (p[..., :-1] + p[..., 1:]),
                            0.5 * p[..., -1:]], axis=-1)  # TOA at p_top/2
    dm = jnp.maximum(p_lo - p_hi, 0.0) / GRAV             # (..., nz)

    pb = (jnp.maximum(p, 1.0) / P0) ** WV_P_EXP
    sec = 1.0 / jnp.maximum(jnp.cos(zenith), 0.2)[..., None, None]

    # per-band layer optical depths (..., nz, nch)
    od_gas = (K_WV * (qv * pb * dm)[..., None]
              + K_FIX * dm[..., None]) * sec
    od_cld = (K_LIQ * (qliq * dm)[..., None]
              + K_ICE * (qice * dm)[..., None]) * sec

    def integrate(od):
        # transmittance from TOA down to the *top* of each layer, k ascending
        # -> accumulate from the last index (model top) downward.
        # clamp: ensemble-perturbed inputs can carry tiny negative q
        od_rev = jnp.maximum(jnp.flip(od, axis=-2), 0.0)   # top-first
        tau_above = jnp.exp(-jnp.cumsum(od_rev, axis=-2)
                            + od_rev)                      # exclusive cumsum
        tau_below = tau_above * jnp.exp(-od_rev)
        b = planck_rad(jnp.flip(t, axis=-1)[..., None], WAVENUM)
        dtau = tau_above - tau_below                       # emission weight
        rad = jnp.sum(b * dtau, axis=-2)
        tau_sfc = tau_below[..., -1, :]                    # lowest layer
        rad = rad + planck_rad(tsfc[..., None], WAVENUM) * tau_sfc
        # weighting-function peak pressure: max dtau/dp over layers
        dp = jnp.maximum(jnp.flip(dm, axis=-1) * GRAV, 1.0)
        w = dtau / dp[..., None]
        kmax = jnp.argmax(w, axis=-2)                      # (..., nch)
        p_rev = jnp.flip(p, axis=-1)
        plev = jnp.take_along_axis(
            jnp.broadcast_to(p_rev[..., None], w.shape), kmax[..., None, :],
            axis=-2)[..., 0, :]
        return planck_bt(rad, WAVENUM), plev

    btclr, _ = integrate(od_gas)
    btall, plev = integrate(od_gas + od_cld)
    return btall, btclr, plev


def trans_xtoy_h08(
    ch: jax.Array,                 # (nobs,) AHI band number 7..16 (read_obs_H08 stores ch+6 in obs lev, common_obs_scale.f90:3057)
    ri: jax.Array, rj: jax.Array,  # (nobs,) fractional grid coords
    lon: jax.Array, lat: jax.Array,
    fields: dict[str, jax.Array],  # history view from state_to_history
    *,
    ch_use: tuple[int, ...] = (0, 0, 1, 0, 0, 0, 0, 0, 0, 0),
    cldsky_thrs: float = -5.0,
    reject_land: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Trans_XtoY_H08 analogue (common_obs_scale.f90:2777-2970).

    Returns (yobs, btclr, plev, qc). As in the reference, yobs is the
    all-sky BT *negated* when |BT_all - BT_clr| > H08_CLDSKY_THRS flags the
    column cloudy (:2957-2963) — set_letkf_obs counts negative members as
    cloudy (letkf_obs.f90:448-455); H08_CH_USE gates channels (:2944-2949).
    """
    from scale_letkf_tpu.obs.operators import itpl_2d, itpl_2d_column

    p = itpl_2d_column(fields["p"], ri, rj)
    t = itpl_2d_column(fields["t"], ri, rj)
    qv = itpl_2d_column(fields["q"], ri, rj)
    qliq = itpl_2d_column(fields["qc"] + fields["qr"], ri, rj)
    qice = itpl_2d_column(fields["qi"] + fields["qs"] + fields["qg"],
                          ri, rj)
    tsfc = itpl_2d(fields["t2m"], ri, rj)
    psfc = itpl_2d(fields["ps"], ri, rj)
    zen = satellite_zenith(lon, lat)

    btall, btclr, plev = h08_rt_fwd(p, t, qv, qliq, qice, tsfc, psfc, zen)

    chi = jnp.clip(ch.astype(jnp.int32) - 7, 0, NCHAN - 1)
    bt = jnp.take_along_axis(btall, chi[:, None], axis=1)[:, 0]
    bc = jnp.take_along_axis(btclr, chi[:, None], axis=1)[:, 0]
    pl = jnp.take_along_axis(plev, chi[:, None], axis=1)[:, 0]

    cloudy = jnp.abs(bt - bc) > cldsky_thrs
    yobs = jnp.where(cloudy, -bt, bt)

    use = jnp.asarray(ch_use, jnp.int32)[chi] == 1
    qc = jnp.where(use, QC_GOOD, QC_OBS_BAD).astype(jnp.int32)
    if reject_land:
        lsmask = fields.get("lsmask")
        if lsmask is not None:
            land = itpl_2d(lsmask, ri, rj) > 0.5
            qc = jnp.where(land, QC_OBS_BAD, qc)
    return yobs, bc, pl, qc


def rttov_fwd(profiles: dict[str, jax.Array], channels=None):
    """Back-compat alias for the band-model forward driver."""
    zen = satellite_zenith(profiles["lon"], profiles["lat"]) \
        if "lon" in profiles else jnp.zeros(profiles["tsfc"].shape)
    return h08_rt_fwd(profiles["p"], profiles["t"], profiles["qv"],
                      profiles["qliq"], profiles["qice"],
                      profiles["tsfc"], profiles["psfc"], zen)
