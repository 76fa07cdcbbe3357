"""Moist physics: saturation adjustment + Kessler-type warm rain.

Stands in for the reference system's Tomita08 bulk microphysics (the
reference hard-configures Tomita08 in the external SCALE library,
common_mpi_scale.f90:833; the scheme itself lives outside the reference
repo). The 6-category state contract (qv, qc, qr, qi, qs, qg) is preserved;
this warm-rain scheme updates qv/qc/qr and leaves ice categories advected
but unmodified. A full 6-category scheme is a planned extension behind the
same interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import (
    RD, RV, PRE00, CVDRY, PSAT0, TETENS_A_LIQ, TETENS_B_LIQ, T00, TRACER_CV,
)
from scale_letkf_tpu.model.dycore import DycoreState, moist_pressure

LHV = 2.501e6      # latent heat of vaporization [J/kg]
CPDRY = RD + CVDRY


def qsat_liq(temp, pres):
    es = PSAT0 * jnp.exp(TETENS_A_LIQ * (temp - T00) / (temp - TETENS_B_LIQ))
    return 0.622 * es / jnp.maximum(pres - 0.378 * es, 1.0)


def kessler_step(s: DycoreState, dt: float, dz: float) -> DycoreState:
    """One Kessler microphysics step on the dycore state.

    Processes: saturation adjustment (condensation/evaporation of qc),
    autoconversion qc→qr, accretion of qc by qr, rain evaporation, and
    rain sedimentation with Marshall–Palmer fall speed. Latent heating
    feeds back on ρθ.
    """
    rho = s.rho
    qv = s.rhoq[0] / rho
    qc = s.rhoq[1] / rho
    qr = s.rhoq[2] / rho

    # diagnose T, p from current state
    q_mr = s.rhoq / rho[None]
    p = moist_pressure(s.rhot, q_mr)
    tracer_cv = jnp.asarray(TRACER_CV, rho.dtype)
    qdry = 1.0 - jnp.sum(q_mr, axis=0)
    rtot = RD * qdry + RV * q_mr[0]
    temp = p / (rho * rtot)

    # --- saturation adjustment (single Newton step, standard approximation)
    qs = qsat_liq(temp, p)
    dqsdT = qs * (TETENS_A_LIQ * (T00 - TETENS_B_LIQ)
                  / (temp - TETENS_B_LIQ) ** 2)
    cond = (qv - qs) / (1.0 + (LHV / CPDRY) * dqsdT)
    cond = jnp.maximum(cond, -qc)          # cannot evaporate more cloud than exists
    qv = qv - cond
    qc = qc + cond
    dtheta_fac = LHV / CPDRY * (PRE00 / p) ** (RD / CPDRY)
    theta_heat = dtheta_fac * cond

    # --- warm-rain conversions (Kessler 1969 coefficients)
    auto = jnp.maximum(0.0, 1.0e-3 * (qc - 1.0e-3)) * dt         # autoconversion
    accr = 2.2 * qc * jnp.maximum(qr, 0.0) ** 0.875 * dt         # accretion
    dqc = jnp.minimum(auto + accr, qc)
    qc = qc - dqc
    qr = qr + dqc

    # --- rain evaporation in subsaturated air
    subsat = jnp.maximum(qs - qv, 0.0)
    evap = jnp.minimum(
        subsat,
        jnp.minimum(qr, 1.0e-3 * dt * subsat * (rho * jnp.maximum(qr, 0.0)) ** 0.65))
    qv = qv + evap
    qr = qr - evap
    theta_heat = theta_heat - dtheta_fac * evap

    # --- sedimentation (upwind flux with MP fall speed; CFL-capped)
    vt = 36.34 * (rho * jnp.maximum(qr, 0.0)) ** 0.1364 * jnp.sqrt(
        jnp.maximum(rho[-1:] / rho, 0.1))
    vt = jnp.minimum(vt, 0.9 * dz / dt)
    flux = rho * qr * vt                          # downward flux at centers
    # upwind: flux entering cell k from cell k+1 above, leaving through bottom
    inflow = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
    qr = qr + dt * (inflow - flux) / (rho * dz)
    qr = jnp.maximum(qr, 0.0)

    rhot = s.rhot + rho * theta_heat
    rhoq = s.rhoq.at[0].set(qv * rho).at[1].set(qc * rho).at[2].set(qr * rho)
    return s._replace(rhot=rhot, rhoq=rhoq)
