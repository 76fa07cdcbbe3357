"""Single-moment 6-category bulk microphysics (NSW6 / Tomita-2008 class).

The reference system hard-configures the Tomita08 scheme of the external
SCALE library (reference: common_mpi_scale.f90:833 'ATMOS_PHY_MP_TYPE must
be TOMITA08'; the scheme itself is outside the reference repo — its contract
here is the 6-tracer state set qv,qc,qr,qi,qs,qg of common_scale.f90:41-51).
This is an independent implementation of the same class of scheme
(Lin/Tomita single-moment, Marshall–Palmer size distributions) with the
standard process set:

  warm:  saturation adjustment (cond/evap of qc), autoconversion qc→qr,
         accretion qr∙qc, rain evaporation
  cold:  ice nucleation/deposition, autoconversion qi→qs, riming qs∙qc,
         graupel conversion & accretion qg∙(qc,qr,qs), melting qs,qg→qr,
         freezing qr→qg, sublimation
  sedimentation of qr, qs, qg with category fall speeds

Everything is elementwise over the grid → one fused XLA kernel; latent
heating feeds back on ρθ through the moist Exner relation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import (
    RD, RV, PRE00, CVDRY, PSAT0, TETENS_A_LIQ, TETENS_B_LIQ,
    TETENS_A_ICE, TETENS_B_ICE, T00, TRACER_CV,
)
from scale_letkf_tpu.model.dycore import DycoreState, moist_pressure

CPDRY = RD + CVDRY
LHV = 2.501e6    # vaporization [J/kg]
LHS = 2.834e6    # sublimation
LHF = LHS - LHV  # fusion

# fall-speed power laws V = a (ρ q)^b · (ρ0/ρ)^0.5  [m/s], Lin-type
FALL_A = {"qr": 36.34, "qs": 7.0, "qg": 22.0}
FALL_B = {"qr": 0.1364, "qs": 0.11, "qg": 0.125}

# process rate coefficients (Lin et al. 1983 / Tomita 2008 magnitudes)
AUTO_QC = 1.0e-3       # qc→qr autoconversion rate [1/s]
AUTO_QC_THRESH = 1.0e-3
AUTO_QI = 1.0e-3       # qi→qs
AUTO_QI_THRESH = 6.0e-4
ACC_RC = 2.2           # rain collecting cloud
ACC_SC = 1.0           # snow riming cloud
ACC_GC = 3.0           # graupel collecting cloud
ACC_GR = 2.0           # graupel collecting rain (T<T0)
MELT_RATE = 1.0e-2     # [1/s/K] melting of qs/qg above T0
FREEZE_RATE = 1.0e-2   # [1/s/K] rain freezing below T_frz
T_FRZ = 268.15
EVAP_R = 1.0e-3
SUBL = 1.0e-3


def qsat(temp, pres, ice: bool):
    if ice:
        es = PSAT0 * jnp.exp(TETENS_A_ICE * (temp - T00)
                             / (temp - TETENS_B_ICE))
    else:
        es = PSAT0 * jnp.exp(TETENS_A_LIQ * (temp - T00)
                             / (temp - TETENS_B_LIQ))
    return 0.622 * es / jnp.maximum(pres - 0.378 * es, 1.0)


def nsw6_step(s: DycoreState, dt: float, dz: float) -> DycoreState:
    """One microphysics step; returns the updated dycore state."""
    rho = s.rho
    q = s.rhoq / rho[None]
    qv, qc, qr, qi, qs_, qg = (q[i] for i in range(6))

    p = moist_pressure(s.rhot, q)
    tracer_cv = jnp.asarray(TRACER_CV, rho.dtype)
    qdry = 1.0 - jnp.sum(q, axis=0)
    rtot = RD * qdry + RV * q[0]
    temp = p / (rho * rtot)
    exner_fac = (PRE00 / p) ** (RD / CPDRY)
    warm = temp >= T00

    heat = jnp.zeros_like(temp)   # accumulated θ heating [K]

    def lim(rate, avail):
        """Limit a (positive) conversion to the available source amount."""
        return jnp.clip(rate, 0.0, jnp.maximum(avail, 0.0))

    # --- saturation adjustment: liquid where warm, ice where cold
    qs_liq = qsat(temp, p, ice=False)
    dqsdT = qs_liq * (TETENS_A_LIQ * (T00 - TETENS_B_LIQ)
                      / (temp - TETENS_B_LIQ) ** 2)
    cond = (qv - qs_liq) / (1.0 + (LHV / CPDRY) * dqsdT)
    cond = jnp.maximum(cond, -qc)
    cond = jnp.where(warm, cond, 0.0)
    qv = qv - cond
    qc = qc + cond
    heat = heat + (LHV / CPDRY) * exner_fac * cond

    qs_ice = qsat(temp, p, ice=True)
    dqsdT_i = qs_ice * (TETENS_A_ICE * (T00 - TETENS_B_ICE)
                        / (temp - TETENS_B_ICE) ** 2)
    dep = (qv - qs_ice) / (1.0 + (LHS / CPDRY) * dqsdT_i)
    dep = jnp.maximum(dep, -qi)
    dep = jnp.where(warm, 0.0, dep)
    qv = qv - dep
    qi = qi + dep
    heat = heat + (LHS / CPDRY) * exner_fac * dep

    # --- warm rain
    auto_r = lim(AUTO_QC * (qc - AUTO_QC_THRESH) * dt, qc)
    accr_rc = lim(ACC_RC * qc * jnp.maximum(qr, 0.0) ** 0.875 * dt, qc - auto_r)
    qc = qc - auto_r - accr_rc
    qr = qr + auto_r + accr_rc

    subsat = jnp.maximum(qs_liq - qv, 0.0)
    evap = lim(EVAP_R * subsat * (rho * jnp.maximum(qr, 0.0)) ** 0.65 * dt, qr)
    qv = qv + evap
    qr = qr - evap
    heat = heat - (LHV / CPDRY) * exner_fac * evap

    # --- ice-phase conversions (cold regions)
    cold = ~warm
    auto_s = jnp.where(cold, lim(AUTO_QI * (qi - AUTO_QI_THRESH) * dt, qi), 0.0)
    qi = qi - auto_s
    qs_ = qs_ + auto_s

    # riming: snow collects cloud water → snow (light) or graupel (heavy)
    rim = jnp.where(cold, lim(ACC_SC * qc * jnp.maximum(qs_, 0.0) ** 0.875 * dt,
                              qc), 0.0)
    to_g = jnp.where(qs_ > 1.0e-3, rim, 0.0)       # heavy riming → graupel
    qc = qc - rim
    qs_ = qs_ + (rim - to_g)
    qg = qg + to_g
    heat = heat + (LHF / CPDRY) * exner_fac * rim   # freezing of collected qc

    # graupel collecting cloud and rain (cold)
    acc_gc = jnp.where(cold, lim(ACC_GC * qc * jnp.maximum(qg, 0.0) ** 0.875
                                 * dt, qc), 0.0)
    acc_gr = jnp.where(cold, lim(ACC_GR * jnp.maximum(qr, 0.0)
                                 * jnp.maximum(qg, 0.0) ** 0.875 * dt, qr), 0.0)
    qc = qc - acc_gc
    qr = qr - acc_gr
    qg = qg + acc_gc + acc_gr
    heat = heat + (LHF / CPDRY) * exner_fac * (acc_gc + acc_gr)

    # rain freezing to graupel in strongly supercooled air
    frz = lim(FREEZE_RATE * jnp.maximum(T_FRZ - temp, 0.0) * qr * dt, qr)
    qr = qr - frz
    qg = qg + frz
    heat = heat + (LHF / CPDRY) * exner_fac * frz

    # melting of snow/graupel above freezing
    melt_s = lim(MELT_RATE * jnp.maximum(temp - T00, 0.0) * qs_ * dt, qs_)
    melt_g = lim(MELT_RATE * jnp.maximum(temp - T00, 0.0) * qg * dt, qg)
    qs_ = qs_ - melt_s
    qg = qg - melt_g
    qr = qr + melt_s + melt_g
    heat = heat - (LHF / CPDRY) * exner_fac * (melt_s + melt_g)

    # sublimation of snow/graupel in ice-subsaturated air
    subsat_i = jnp.maximum(qs_ice - qv, 0.0)
    subl_s = lim(SUBL * subsat_i * (rho * jnp.maximum(qs_, 0.0)) ** 0.65 * dt,
                 qs_)
    subl_g = lim(SUBL * subsat_i * (rho * jnp.maximum(qg, 0.0)) ** 0.65 * dt,
                 qg)
    qs_ = qs_ - subl_s
    qg = qg - subl_g
    qv = qv + subl_s + subl_g
    heat = heat - (LHS / CPDRY) * exner_fac * (subl_s + subl_g)

    # --- sedimentation (upwind, CFL-capped fall speeds)
    rho_sfc = rho[-1:]

    def sediment(qx, name):
        vt = FALL_A[name] * (rho * jnp.maximum(qx, 0.0)) ** FALL_B[name] \
            * jnp.sqrt(jnp.maximum(rho_sfc / rho, 0.1))
        vt = jnp.minimum(vt, 0.9 * dz / dt)
        flux = rho * qx * vt
        inflow = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
        return jnp.maximum(qx + dt * (inflow - flux) / (rho * dz), 0.0)

    qr = sediment(qr, "qr")
    qs_ = sediment(qs_, "qs")
    qg = sediment(qg, "qg")

    rhot = s.rhot + rho * heat
    q_new = jnp.stack([qv, jnp.maximum(qc, 0.0), qr, jnp.maximum(qi, 0.0),
                       qs_, qg], axis=0)
    return s._replace(rhot=rhot, rhoq=q_new * rho[None])
