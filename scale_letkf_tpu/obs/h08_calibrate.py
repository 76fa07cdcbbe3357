"""Calibration hook for the Himawari-8 band-emission model (obs/h08.py).

The reference wraps the proprietary RTTOV v11
(scale_H08_fwd.F90:6-26); RTTOV coefficients are not redistributable and
this environment has no network access, so full radiance parity is
impossible. What CAN be done honestly is calibrate the band model's free
parameters (K_WV, K_FIX, WV_P_EXP) against a HIGHER-FIDELITY surrogate
that captures the physics the single-coefficient gray-band model cannot:
a correlated-k (k-distribution) clear-sky model whose per-band water-vapor
absorption spans several orders of magnitude of line strength (the
Goody/Malkmus statistical-band behavior), so band transmittance saturates
sub-exponentially — exactly the regime where a gray k is wrong.

    python -m scale_letkf_tpu.obs.h08_calibrate [out.json]

generates a diverse clear-sky profile set (tropical to polar, dry to
saturated), computes surrogate BTs, fits the band model by Adam on the
BT misfit, writes the fitted coefficients + residual statistics to JSON,
and prints a residual table. obs/h08.py can load the result with
`load_calibration(path)` (before any jit tracing).

The surrogate is NOT RTTOV and the calibration does not make the model
RTTOV-grade; it removes the "order-of-magnitude estimate" status of the
coefficients by anchoring them to a spectrally-nongray reference, with
residuals documented (PARITY.md keeps the honest 🟡).
"""

from __future__ import annotations

import json

import numpy as np


# k-distribution g-points: weights of a log-spaced absorption spectrum
# within each band. 4 points spanning 3 decades of line strength around
# the band-mean k reproduce Goody-model curve-of-growth behavior.
G_WEIGHTS = np.array([0.45, 0.3, 0.2, 0.05])
G_SCALES = np.array([0.12, 1.0, 6.0, 40.0])

# band-mean H2O absorption [m^2/kg] for AHI B07..B16 — physically ordered
# (strong 6.2-um rotation-vibration band, weak windows with continuum),
# independent of (deliberately different from) h08.py's K_WV so the fit
# target is not the model itself
KBAR_WV = np.array([0.010, 2.2, 0.75, 0.30, 0.017,
                    0.013, 0.008, 0.008, 0.018, 0.014])
KFIX_REF = np.array([6e-6, 9e-6, 9e-6, 9e-6, 6e-6,
                     1.5e-4, 6e-6, 5e-6, 9e-6, 4.2e-4])
P_EXP_REF = 0.75


def surrogate_bt(p, t, qv, tsfc, psfc, zenith):
    """Correlated-k clear-sky BT for all 10 bands. Same layer geometry as
    h08.h08_rt_fwd but per-band transmittance is a weighted sum over
    g-points instead of a single exponential."""
    from scale_letkf_tpu.constants import GRAV
    from scale_letkf_tpu.obs.h08 import planck_rad, planck_bt, WAVENUM, P0

    p = np.asarray(p)
    t = np.asarray(t)
    qv = np.asarray(qv)
    p_lo = np.concatenate([psfc[..., None],
                           0.5 * (p[..., :-1] + p[..., 1:])], axis=-1)
    p_hi = np.concatenate([0.5 * (p[..., :-1] + p[..., 1:]),
                           0.5 * p[..., -1:]], axis=-1)
    dm = np.maximum(p_lo - p_hi, 0.0) / GRAV
    pb = (np.maximum(p, 1.0) / P0) ** P_EXP_REF
    sec = 1.0 / np.maximum(np.cos(zenith), 0.2)[..., None]

    u = (qv * pb * dm) * sec                       # (..., nz) scaled path
    u_rev = np.flip(u, axis=-1)
    dm_rev = np.flip(dm, axis=-1)
    t_rev = np.flip(t, axis=-1)
    wn = np.asarray(WAVENUM)
    nb = len(wn)
    out = np.empty(p.shape[:-1] + (nb,))
    for b in range(nb):
        # per-g-point gas optical depth incl. gray fixed gases
        tau_above = np.ones(p.shape[:-1] + (len(G_WEIGHTS),))
        rad = np.zeros(p.shape[:-1])
        cum_fix = np.zeros(p.shape[:-1])
        for k in range(p.shape[-1]):
            od_g = KBAR_WV[b] * G_SCALES * u_rev[..., k, None]
            od_f = KFIX_REF[b] * dm_rev[..., k] * sec[..., 0]
            tau_below = tau_above * np.exp(-od_g)
            fix_above = np.exp(-cum_fix)
            cum_fix = cum_fix + od_f
            fix_below = np.exp(-cum_fix)
            # emission weight of this layer = d(band transmittance)
            tr_above = (tau_above * G_WEIGHTS).sum(-1) * fix_above
            tr_below = (tau_below * G_WEIGHTS).sum(-1) * fix_below
            rad = rad + planck_rad(t_rev[..., k], wn[b]) * (
                tr_above - tr_below)
            tau_above = tau_below
        tr_sfc = (tau_above * G_WEIGHTS).sum(-1) * np.exp(-cum_fix)
        rad = rad + planck_rad(tsfc, wn[b]) * tr_sfc
        out[..., b] = planck_bt(rad, wn[b])
    return out


def make_profile_set(n=64, nz=24, seed=0):
    """Diverse clear-sky profiles: surface temperature 245..305 K, scaled
    humidity 10%..95% of saturation, tropopause height varied."""
    from scale_letkf_tpu.constants import RD, GRAV
    rng = np.random.default_rng(seed)
    t0 = rng.uniform(245.0, 305.0, n)
    rh = rng.uniform(0.10, 0.95, n)
    gam = rng.uniform(5.5e-3, 7.5e-3, n)
    ztrop = rng.uniform(9e3, 17e3, n)
    z = np.linspace(200.0, 22e3, nz)
    t = np.maximum(t0[:, None] - gam[:, None] * z[None, :],
                   t0[:, None] - gam[:, None] * ztrop[:, None])
    h = RD * 260.0 / GRAV
    psfc = np.full(n, 1.0e5)
    p = psfc[:, None] * np.exp(-z[None, :] / h)
    # Tetens saturation on specific humidity
    es = 611.2 * np.exp(17.67 * (t - 273.15) / (t - 29.65))
    qs = 0.622 * es / np.maximum(p - 0.378 * es, 1.0)
    qv = np.minimum(rh[:, None] * qs, 0.03) * np.exp(-z[None, :] / 12e3)
    tsfc = t0 + rng.uniform(-2.0, 6.0, n)
    zen = rng.uniform(0.0, 1.05, n)     # 0..60 deg
    return dict(p=p, t=t, qv=qv, tsfc=tsfc, psfc=psfc, zenith=zen)


def _model_bt(params, prof):
    """Band-model clear-sky BT with free (log) coefficients."""
    import jax.numpy as jnp
    from scale_letkf_tpu import obs as _o  # noqa: F401
    from scale_letkf_tpu.obs import h08 as m

    k_wv = jnp.exp(params["log_kwv"])
    k_fix = jnp.exp(params["log_kfix"])
    p_exp = params["p_exp"]
    p = jnp.asarray(prof["p"])
    t = jnp.asarray(prof["t"])
    qv = jnp.asarray(prof["qv"])
    psfc = jnp.asarray(prof["psfc"])
    tsfc = jnp.asarray(prof["tsfc"])
    zen = jnp.asarray(prof["zenith"])

    from scale_letkf_tpu.constants import GRAV
    p_lo = jnp.concatenate([psfc[..., None],
                            0.5 * (p[..., :-1] + p[..., 1:])], axis=-1)
    p_hi = jnp.concatenate([0.5 * (p[..., :-1] + p[..., 1:]),
                            0.5 * p[..., -1:]], axis=-1)
    dm = jnp.maximum(p_lo - p_hi, 0.0) / GRAV
    pb = (jnp.maximum(p, 1.0) / m.P0) ** p_exp
    sec = 1.0 / jnp.maximum(jnp.cos(zen), 0.2)[..., None, None]
    od = (k_wv * (qv * pb * dm)[..., None] + k_fix * dm[..., None]) * sec
    od_rev = jnp.maximum(jnp.flip(od, axis=-2), 0.0)
    tau_above = jnp.exp(-jnp.cumsum(od_rev, axis=-2) + od_rev)
    tau_below = tau_above * jnp.exp(-od_rev)
    b = m.planck_rad(jnp.flip(t, axis=-1)[..., None], m.WAVENUM)
    rad = jnp.sum(b * (tau_above - tau_below), axis=-2)
    rad = rad + m.planck_rad(tsfc[..., None], m.WAVENUM) \
        * tau_below[..., -1, :]
    return m.planck_bt(rad, m.WAVENUM)


def fit(prof=None, bt_ref=None, steps=600, lr=0.05, seed=0):
    """Fit (K_WV, K_FIX, WV_P_EXP) to the surrogate BTs by Adam.
    Returns (fitted dict, stats dict with before/after residuals)."""
    import jax
    import jax.numpy as jnp
    import optax
    from scale_letkf_tpu.obs import h08 as m

    if prof is None:
        prof = make_profile_set(seed=seed)
    if bt_ref is None:
        bt_ref = surrogate_bt(prof["p"], prof["t"], prof["qv"],
                              prof["tsfc"], prof["psfc"], prof["zenith"])
    bt_ref = jnp.asarray(bt_ref)

    params = {"log_kwv": jnp.log(jnp.asarray(m.K_WV)),
              "log_kfix": jnp.log(jnp.asarray(m.K_FIX)),
              "p_exp": jnp.asarray(m.WV_P_EXP)}

    def loss(ps):
        return jnp.mean((_model_bt(ps, prof) - bt_ref) ** 2)

    opt = optax.adam(lr)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss))
    rmse0 = float(jnp.sqrt(loss(params)))
    per_band0 = np.sqrt(np.mean(
        np.asarray(_model_bt(params, prof) - bt_ref) ** 2, axis=0))
    for _ in range(steps):
        val, g = vg(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    rmse1 = float(jnp.sqrt(loss(params)))
    per_band1 = np.sqrt(np.mean(
        np.asarray(_model_bt(params, prof) - bt_ref) ** 2, axis=0))

    fitted = {"k_wv": np.exp(np.asarray(params["log_kwv"])).tolist(),
              "k_fix": np.exp(np.asarray(params["log_kfix"])).tolist(),
              "wv_p_exp": float(params["p_exp"])}
    stats = {"reference": "correlated-k 4-g-point surrogate (NOT RTTOV)",
             "n_profiles": int(np.asarray(prof["p"]).shape[0]),
             "bt_rmse_before_K": round(rmse0, 3),
             "bt_rmse_after_K": round(rmse1, 3),
             "per_band_rmse_before_K": [round(float(v), 3)
                                        for v in per_band0],
             "per_band_rmse_after_K": [round(float(v), 3)
                                       for v in per_band1]}
    return fitted, stats


def main(out_path="docs/h08_calibration.json"):
    fitted, stats = fit()
    with open(out_path, "w") as f:
        json.dump({**fitted, "stats": stats}, f, indent=1)
    bands = ["B07", "B08", "B09", "B10", "B11",
             "B12", "B13", "B14", "B15", "B16"]
    print(f"H08 band-model calibration vs {stats['reference']}")
    print(f"  overall BT RMSE: {stats['bt_rmse_before_K']} K -> "
          f"{stats['bt_rmse_after_K']} K")
    for b, r0, r1 in zip(bands, stats["per_band_rmse_before_K"],
                         stats["per_band_rmse_after_K"]):
        print(f"  {b}: {r0:7.3f} K -> {r1:7.3f} K")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:2])
