"""Split-explicit (HEVI) time integration for the compressible core.

The reference model runs dt=30 s physics with 3 s dynamics substeps at
18 km (reference: scale/run/config/2015summer_18km/config.nml.scale
PARAM_TIME: TIME_DT=30 s, TIME_DT_ATMOS_DYN=3 s) — only possible because
acoustic modes are sub-stepped/implicit. This module implements the
standard Wicker–Skamarock (2002) split-explicit scheme around the explicit
core in dycore.py:

- RK3 outer stages compute SLOW tendencies (advection, buoyancy of the
  stage state, hyperdiffusion) with the full nonlinear operators of
  dycore.tendencies, minus the acoustic terms;
- each stage integrates ns small acoustic steps: horizontal momenta
  explicit, vertical (w, ρ, ρθ, p) implicit — a tridiagonal solve per
  column, vectorized over the whole horizontal plane with lax.scan over nz
  (the Thomas algorithm; nz ~ 30-60 sequential steps, each a full-plane
  vector op, which XLA handles well);
- the linearized pressure is p'' = c²·(ρθ)'' with c² = (cp/cv)·p*/(ρθ)*
  around the stage state.

The acoustic step dτ is limited only by the HORIZONTAL sound CFL
(dτ < dx/(cs·√2)), so coarse grids take dt limited by advection alone.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import RD, CVDRY, PRE00, GRAV
from scale_letkf_tpu.model.dycore import (
    DycoreConfig, DycoreState, VGrid, tendencies, rayleigh_sponge,
    moist_pressure, _roll_x, _roll_y,
)

CPDRY = RD + CVDRY
BETA_OFF = 0.55   # implicit off-centering (slightly > 0.5 damps acoustics)


@dataclass(frozen=True)
class SplitConfig:
    dtau: float       # acoustic small step [s]
    beta: float = BETA_OFF


# Wicker–Skamarock (2002) convention: the slow forcing is the FULL
# nonlinear tendency evaluated at the most recent RK stage state; acoustic
# deviation variables are defined relative to that same stage state and
# initialized with (step-start − stage) so the linearized acoustic terms
# plus the stage-state forcing reconstruct the true PG/buoyancy along the
# acoustic trajectory.


def _thomas_solve(a, b, c, d):
    """Tridiagonal solve along axis 0, vectorized over trailing axes.
    a: sub-diagonal (a[0] unused), b: diagonal, c: super-diagonal (c[-1]
    unused), d: RHS. Returns x with b x + a x_{k-1} + c x_{k+1} = d."""
    n = b.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        ak, bk, ck, dk = inp
        denom = bk - ak * cp_prev
        cp = ck / denom
        dp = (dk - ak * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros_like(b[0]), jnp.zeros_like(b[0]))
    _, (cps, dps) = jax.lax.scan(fwd, init, (a, b, c, d))

    def back(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(back, jnp.zeros_like(b[0]), (cps, dps),
                         reverse=True)
    return xs


def acoustic_substeps(
    s_start: DycoreState,       # step-start state (initial condition)
    s_stage: DycoreState,       # latest RK stage state (linearization point)
    slow: DycoreState,          # full tendencies at s_stage
    cfg: DycoreConfig,
    split: SplitConfig,
    n_steps: int,
    dt_stage: float,
    vg: VGrid | None = None,
):
    """Integrate the acoustic system for dt_stage = n_steps·dτ, linearized
    around s_stage, starting from s_start; returns the updated full state.

    vg: stretched vertical spacings (None ⇒ uniform cfg.dz); the implicit
    vertical operator uses dzc (cell thickness) for flux divergences at
    centers and dzf (center spacing) at interior faces."""
    dx, dy, dz = cfg.dx, cfg.dy, cfg.dz
    dzc = dz if vg is None else vg.dzc          # (nz,1,1) or scalar
    dzf = dz if vg is None else vg.dzf          # (nz-1,1,1) or scalar
    dtau = dt_stage / n_steps
    beta = split.beta

    rho0 = s_stage.rho
    rhot0 = s_stage.rhot
    q_mr = s_stage.rhoq / jnp.maximum(rho0, 1e-10)[None]
    p0 = moist_pressure(rhot0, q_mr)
    theta0 = rhot0 / rho0
    # c² = ∂p/∂(ρθ) = (cp/cv)·p/(ρθ) (dry γ on the moist p — adequate
    # linearization for the acoustic solver)
    c2 = (CPDRY / CVDRY) * p0 / rhot0
    theta_face = jnp.concatenate([
        theta0[:1], 0.5 * (theta0[1:] + theta0[:-1]), theta0[-1:]], axis=0)
    nz = rho0.shape[0]

    g_half = dtau * beta * GRAV * 0.5
    abf = dtau * beta / dzf                     # at interior faces
    abc = dtau * beta / dzc                     # at centers
    if vg is None:
        abc_up = abc_dn = abc
    else:
        abc_up = abc[1:]      # center k (above face k)
        abc_dn = abc[:-1]     # center k-1

    # tridiagonal coefficients for interior faces k = 1..nz-1 (static)
    c2_up = c2[1:]        # center k (above face k)
    c2_dn = c2[:-1]       # center k-1
    tf_mid = theta_face[1:-1]
    tf_up = theta_face[2:]
    tf_dn = theta_face[:-2]
    b_diag = (1.0 + abf * tf_mid * (c2_up * abc_up + c2_dn * abc_dn)
              + g_half * (abc_up - abc_dn))
    c_sup = -abf * c2_up * abc_up * tf_up - g_half * abc_up
    a_sub = -abf * c2_dn * abc_dn * tf_dn + g_half * abc_dn
    if vg is None:
        b_diag = b_diag * jnp.ones_like(tf_mid)
        c_sup = c_sup * jnp.ones_like(tf_mid)
        a_sub = a_sub * jnp.ones_like(tf_mid)

    def substep(carry, _):
        drho, drhou, drhov, drhow, drhot = carry

        # pressure perturbation at current acoustic time
        dp = c2 * drhot

        # explicit horizontal momenta
        gx = (_roll_x(dp, 1) - dp) / dx
        gy = (_roll_y(dp, 1) - dp) / dy
        drhou = drhou + dtau * (-gx + slow.rhou)
        drhov = drhov + dtau * (-gy + slow.rhov)

        # horizontal mass/theta flux divergence of the NEW momenta
        div_h = ((drhou - _roll_x(drhou, -1)) / dx
                 + (drhov - _roll_y(drhov, -1)) / dy)
        u_face_th = drhou * 0.5 * (theta0 + _roll_x(theta0, 1))
        v_face_th = drhov * 0.5 * (theta0 + _roll_y(theta0, 1))
        div_h_th = ((u_face_th - _roll_x(u_face_th, -1)) / dx
                    + (v_face_th - _roll_y(v_face_th, -1)) / dy)

        # explicit parts of ρ'' and ρθ'' (include (1-β) old vertical flux)
        w_old = drhow
        dflux_w = (w_old[1:] - w_old[:-1]) / dzc
        wth_old = w_old * theta_face
        dflux_wth = (wth_old[1:] - wth_old[:-1]) / dzc
        rho_exp = drho + dtau * (slow.rho - div_h) \
            - dtau * (1 - beta) * dflux_w
        rhot_exp = drhot + dtau * (slow.rhot - div_h_th) \
            - dtau * (1 - beta) * dflux_wth

        # RHS for interior faces
        dp_z = (dp[1:] - dp[:-1]) / dzf
        rho_face_old = 0.5 * (drho[1:] + drho[:-1])
        d_rhs = (w_old[1:-1]
                 + dtau * slow.rhow[1:-1]
                 - dtau * (1 - beta) * (dp_z + GRAV * rho_face_old)
                 - abf * (c2_up * rhot_exp[1:]
                          - c2_dn * rhot_exp[:-1])
                 - g_half * (rho_exp[1:] + rho_exp[:-1]))

        w_new_int = _thomas_solve(a_sub, b_diag, c_sup, d_rhs)
        zeros = jnp.zeros_like(drhow[:1])
        w_new = jnp.concatenate([zeros, w_new_int, zeros], axis=0)

        # implicit corrections to ρ'' and ρθ''
        drho = rho_exp - abc * (w_new[1:] - w_new[:-1])
        wth_new = w_new * theta_face
        drhot = rhot_exp - abc * (wth_new[1:] - wth_new[:-1])
        return (drho, drhou, drhov, w_new, drhot), None

    init = (s_start.rho - rho0, s_start.rhou - s_stage.rhou,
            s_start.rhov - s_stage.rhov, s_start.rhow - s_stage.rhow,
            s_start.rhot - rhot0)
    (drho, drhou, drhov, drhow, drhot), _ = jax.lax.scan(
        substep, init, None, length=n_steps)

    # tracers advance with the slow tendency only (advected by the RK
    # stage winds; acoustic modes do not transport tracers)
    rhoq = s_start.rhoq + dt_stage * slow.rhoq
    return DycoreState(rho=rho0 + drho, rhou=s_stage.rhou + drhou,
                       rhov=s_stage.rhov + drhov, rhow=s_stage.rhow + drhow,
                       rhot=rhot0 + drhot, rhoq=rhoq)


@partial(jax.jit, static_argnames=("cfg", "split", "n_small"))
def rk3_step_si(s: DycoreState, cfg: DycoreConfig, split: SplitConfig,
                rho_ref: jax.Array, p_ref: jax.Array, z_center: jax.Array,
                n_small: int, vg: VGrid | None = None,
                metrics=None) -> DycoreState:
    """One split-explicit RK3 step of length cfg.dt with n_small acoustic
    substeps in the final stage (earlier stages use proportionally fewer).

    metrics: optional TerrainMetrics — the SLOW tendencies then carry the
    full terrain-following metric terms (model/terrain.py) while the
    acoustic operator stays flat-metric (the standard approximation for
    gentle terrain: the acoustic deviations are linearized around the stage
    state without Gx/Gy corrections; J ≈ 1 − h/H enters only through the
    slow forcing)."""
    dt = cfg.dt

    def slow_tend(s_from):
        if metrics is not None:
            from scale_letkf_tpu.model.terrain import tendencies_terrain
            return tendencies_terrain(s_from, cfg, rho_ref, p_ref, metrics,
                                      vg=vg)
        return tendencies(s_from, cfg, rho_ref, p_ref, vg)

    def stage(s_from, dt_stage, ns):
        slow = slow_tend(s_from)
        return acoustic_substeps(s, s_from, slow, cfg, split, ns, dt_stage,
                                 vg=vg)

    ns1 = max(1, n_small // 3)
    ns2 = max(1, n_small // 2)
    from scale_letkf_tpu.model.dycore import lateral_bc
    with lateral_bc(cfg.lateral):
        s1 = stage(s, dt / 3.0, ns1)
        s2 = stage(s1, dt / 2.0, ns2)
        s3 = stage(s2, dt, n_small)
    return rayleigh_sponge(s3, s, cfg, z_center, dt)


def integrate_si(s, cfg, split, rho_ref, p_ref, z_center, nsteps, n_small,
                 vg: VGrid | None = None, metrics=None):
    def body(carry, _):
        return rk3_step_si(carry, cfg, split, rho_ref, p_ref, z_center,
                           n_small, vg, metrics), None
    out, _ = jax.lax.scan(body, s, None, length=nsteps)
    return out
