"""Terrain-following dynamics: metric terms for the BTF coordinate.

The reference requires a terrain-following height coordinate
(reference: common_scale.f90 scale_calc_z :1434 — z = (H−h)/H·ζ + h, the
basic terrain-following (Gal-Chen) transform; the metric handling itself
lives in the external SCALE dycore). This module adds the corresponding
metric terms around the flat core in dycore.py:

With z(ζ) = (1 − h/H)·ζ + h:
  J(x,y)        = ∂z/∂ζ = 1 − h/H                (column-constant Jacobian)
  Gx(k,x,y)     = ∂z/∂x|_ζ = s_k·∂h/∂x,  s_k = 1 − ζ_k/H
and the transformed flux-form equations prognose J-weighted densities
(ρ* = Jρ, …) with the contravariant vertical mass flux
  ρW = (ρw − Gx·ρu − Gy·ρv) / J
and the horizontal pressure gradient picking up −(Gx/J)·∂p/∂ζ.

Design: prognostic variables remain the physical (ρ, ρu, …) — the J-weight
is applied/removed inside the tendency (J is time-independent), which keeps
the DA state contract unchanged. Flat topography reduces exactly to
dycore.tendencies (verified by test)."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import GRAV
from scale_letkf_tpu.model.dycore import (
    DycoreConfig, DycoreState, VGrid, moist_pressure, ud3_face_x, ud3_face_y,
    ud3_face_z, hyperdiff4, _roll_x, _roll_y, rayleigh_sponge, _axpy,
)


class TerrainMetrics(NamedTuple):
    jac: jax.Array       # (ny, nx)       J = 1 − h/H
    gx: jax.Array        # (nz, ny, nx)   ∂z/∂x|_ζ at x-faces (i+1/2)
    gy: jax.Array        # (nz, ny, nx)   ∂z/∂y|_ζ at y-faces (j+1/2)
    gx_zf: jax.Array     # (nz+1, ny, nx) same at z-faces (for ρW)
    gy_zf: jax.Array


def make_metrics(topo: jax.Array, cz: np.ndarray, fz: np.ndarray,
                 dx: float, dy: float) -> TerrainMetrics:
    H = float(fz[-1])
    jac = 1.0 - topo / H
    dhdx = (_roll_x(topo, 1) - topo) / dx          # at x-faces i+1/2
    dhdy = (_roll_y(topo, 1) - topo) / dy
    s_c = jnp.asarray(1.0 - np.asarray(cz) / H, topo.dtype)[:, None, None]
    s_f = jnp.asarray(1.0 - np.asarray(fz) / H, topo.dtype)[:, None, None]
    return TerrainMetrics(
        jac=jac,
        gx=s_c * dhdx[None],
        gy=s_c * dhdy[None],
        gx_zf=s_f * dhdx[None],
        gy_zf=s_f * dhdy[None])


def contravariant_w(s: DycoreState, m: TerrainMetrics) -> jax.Array:
    """ρW at z-faces: (ρw − Gx·ρu − Gy·ρv)/J with momenta interpolated to
    z-faces and cell centers. Boundary faces keep ρW = 0 (free-slip over
    terrain: flow follows the surface)."""
    # center momenta
    rhou_c = 0.5 * (s.rhou + _roll_x(s.rhou, -1))
    rhov_c = 0.5 * (s.rhov + _roll_y(s.rhov, -1))
    # to z-faces (interior)
    rhou_zf = 0.5 * (rhou_c[1:] + rhou_c[:-1])
    rhov_zf = 0.5 * (rhov_c[1:] + rhov_c[:-1])
    # metric slopes are defined at x/y faces; average to cell centers to
    # match the centered momenta
    gx_c = 0.5 * (m.gx_zf + _roll_x(m.gx_zf, -1))
    gy_c = 0.5 * (m.gy_zf + _roll_y(m.gy_zf, -1))
    gw_int = (s.rhow[1:-1]
              - gx_c[1:-1] * rhou_zf
              - gy_c[1:-1] * rhov_zf) / m.jac[None]
    zeros = jnp.zeros_like(s.rhow[:1])
    return jnp.concatenate([zeros, gw_int, zeros], axis=0)


def tendencies_terrain(s: DycoreState, cfg: DycoreConfig,
                       rho_ref: jax.Array, p_ref: jax.Array,
                       m: TerrainMetrics,
                       vg: VGrid | None = None) -> DycoreState:
    """Flux-form tendencies with terrain metrics. Reduces to the flat core
    when topo ≡ 0 (J = 1, Gx = Gy = 0). vg: stretched vertical spacings."""
    dx, dy, dz = cfg.dx, cfg.dy, cfg.dz
    dzc = dz if vg is None else vg.dzc
    dzf = dz if vg is None else vg.dzf
    jac = m.jac[None]                      # broadcast over z

    q_mr = s.rhoq / jnp.maximum(s.rho, 1e-10)[None]
    p = moist_pressure(s.rhot, q_mr)
    p_pert = p - p_ref

    # fluxes: horizontal J-weighted at faces; vertical contravariant
    jac_xf = 0.5 * (m.jac + _roll_x(m.jac, 1))[None]
    jac_yf = 0.5 * (m.jac + _roll_y(m.jac, 1))[None]
    fx = jac_xf * s.rhou
    fy = jac_yf * s.rhov
    rgw = contravariant_w(s, m) * m.jac[None]  # J·ρW at z-faces
    rgw_int = rgw[1:-1]

    def div_center(fx_, fy_, fw_full):
        ddx = (fx_ - _roll_x(fx_, -1)) / dx
        ddy = (fy_ - _roll_y(fy_, -1)) / dy
        ddz = (fw_full[1:] - fw_full[:-1]) / dzc
        return (ddx + ddy + ddz) / jac

    drho = -div_center(fx, fy, rgw)

    def scalar_tend(fcen):
        phi = fcen / s.rho
        fl_x = fx * ud3_face_x(phi, fx)
        fl_y = fy * ud3_face_y(phi, fy)
        fl_z_int = rgw_int * ud3_face_z(phi, rgw_int)
        zeros = jnp.zeros_like(fl_z_int[:1])
        fl_z = jnp.concatenate([zeros, fl_z_int, zeros], axis=0)
        return -div_center(fl_x, fl_y, fl_z) + hyperdiff4(fcen, cfg.kdiff4)

    drhot = scalar_tend(s.rhot)
    drhoq = jax.vmap(scalar_tend)(s.rhoq)

    # --- momentum advection (2nd-order centered, metric-consistent mass
    # fluxes) + pressure gradient with metric correction
    u_face = s.rhou / (0.5 * (s.rho + _roll_x(s.rho, 1)))
    v_face = s.rhov / (0.5 * (s.rho + _roll_y(s.rho, 1)))

    fx_c = 0.5 * (fx + _roll_x(fx, -1))
    adv_u_x = fx_c * 0.5 * (u_face + _roll_x(u_face, -1))
    dadv_u = (_roll_x(adv_u_x, 1) - adv_u_x) / dx
    fy_corner = 0.5 * (fy + _roll_x(fy, 1))
    adv_u_y = fy_corner * 0.5 * (u_face + _roll_y(u_face, 1))
    dadv_u = dadv_u + (adv_u_y - _roll_y(adv_u_y, -1)) / dy
    rgw_xface = 0.5 * (rgw + _roll_x(rgw, 1))
    u_zface = jnp.concatenate([
        u_face[:1], 0.5 * (u_face[1:] + u_face[:-1]), u_face[-1:]], axis=0)
    adv_u_z = rgw_xface * u_zface
    adv_u_z = adv_u_z.at[0].set(0.0).at[-1].set(0.0)
    dadv_u = dadv_u + (adv_u_z[1:] - adv_u_z[:-1]) / dzc
    dadv_u = dadv_u / jac_xf

    # PG at x-faces: ∂p'/∂x|_ζ − (Gx/J)·∂p'/∂ζ
    dpx = (_roll_x(p_pert, 1) - p_pert) / dx
    if vg is None:
        dp_dz_c = jnp.concatenate([
            (p_pert[1:2] - p_pert[0:1]),
            0.5 * (p_pert[2:] - p_pert[:-2]),
            (p_pert[-1:] - p_pert[-2:-1])], axis=0) / dz
    else:
        dp_dz_c = jnp.concatenate([
            (p_pert[1:2] - p_pert[0:1]) / dzf[:1],
            (p_pert[2:] - p_pert[:-2]) / (dzf[1:] + dzf[:-1]),
            (p_pert[-1:] - p_pert[-2:-1]) / dzf[-1:]], axis=0)
    dp_dz_xf = 0.5 * (dp_dz_c + _roll_x(dp_dz_c, 1))
    dpx_full = dpx - m.gx / jac_xf * dp_dz_xf
    drhou = -dadv_u - dpx_full + hyperdiff4(s.rhou, cfg.kdiff4)

    fy_c = 0.5 * (fy + _roll_y(fy, -1))
    adv_v_y = fy_c * 0.5 * (v_face + _roll_y(v_face, -1))
    dadv_v = (_roll_y(adv_v_y, 1) - adv_v_y) / dy
    fx_corner = 0.5 * (fx + _roll_y(fx, 1))
    adv_v_x = fx_corner * 0.5 * (v_face + _roll_x(v_face, 1))
    dadv_v = dadv_v + (adv_v_x - _roll_x(adv_v_x, -1)) / dx
    rgw_yface = 0.5 * (rgw + _roll_y(rgw, 1))
    v_zface = jnp.concatenate([
        v_face[:1], 0.5 * (v_face[1:] + v_face[:-1]), v_face[-1:]], axis=0)
    adv_v_z = rgw_yface * v_zface
    adv_v_z = adv_v_z.at[0].set(0.0).at[-1].set(0.0)
    dadv_v = dadv_v + (adv_v_z[1:] - adv_v_z[:-1]) / dzc
    dadv_v = dadv_v / jac_yf

    dpy = (_roll_y(p_pert, 1) - p_pert) / dy
    dp_dz_yf = 0.5 * (dp_dz_c + _roll_y(dp_dz_c, 1))
    dpy_full = dpy - m.gy / jac_yf * dp_dz_yf
    drhov = -dadv_v - dpy_full + hyperdiff4(s.rhov, cfg.kdiff4)

    # --- w momentum at interior z-faces
    rho_face_full = jnp.concatenate([
        s.rho[:1], 0.5 * (s.rho[1:] + s.rho[:-1]), s.rho[-1:]], axis=0)
    w_full = s.rhow / rho_face_full
    w_face = w_full[1:-1]
    fw_c = 0.5 * (rgw[1:] + rgw[:-1])
    adv_w_z = fw_c * 0.5 * (w_full[1:] + w_full[:-1])
    dadv_w = (adv_w_z[1:] - adv_w_z[:-1]) / dzf
    fx_zface = 0.5 * (fx[1:] + fx[:-1])
    adv_w_x = fx_zface * 0.5 * (w_face + _roll_x(w_face, 1))
    dadv_w = dadv_w + (adv_w_x - _roll_x(adv_w_x, -1)) / dx
    fy_zface = 0.5 * (fy[1:] + fy[:-1])
    adv_w_y = fy_zface * 0.5 * (w_face + _roll_y(w_face, 1))
    dadv_w = dadv_w + (adv_w_y - _roll_y(adv_w_y, -1)) / dy
    dadv_w = dadv_w / jac[:1]

    # vertical PG: (1/J)·∂p'/∂ζ
    dpz = (p_pert[1:] - p_pert[:-1]) / dzf / m.jac[None]
    rho_pert_face = 0.5 * ((s.rho - rho_ref)[1:] + (s.rho - rho_ref)[:-1])
    buoy = -rho_pert_face * GRAV
    drhow_int = -dadv_w - dpz + buoy + hyperdiff4(s.rhow[1:-1], cfg.kdiff4)
    zeros_face = jnp.zeros_like(s.rhow[:1])
    drhow = jnp.concatenate([zeros_face, drhow_int, zeros_face], axis=0)

    if cfg.divdmp > 0:
        alpha = cfg.divdmp * dx * dx / cfg.dt
        div = div_center(fx, fy, rgw)
        drhou = drhou + alpha * (_roll_x(div, 1) - div) / dx
        drhov = drhov + alpha * (_roll_y(div, 1) - div) / dy
        alpha_z = cfg.divdmp * dzf * dzf / cfg.dt
        drhow = drhow.at[1:-1].add(alpha_z * (div[1:] - div[:-1]) / dzf)

    return DycoreState(rho=drho, rhou=drhou, rhov=drhov, rhow=drhow,
                       rhot=drhot, rhoq=drhoq)


def rk3_step_terrain(s: DycoreState, cfg: DycoreConfig, rho_ref, p_ref,
                     z_center, m: TerrainMetrics,
                     vg: VGrid | None = None) -> DycoreState:
    dt = cfg.dt
    from scale_letkf_tpu.model.dycore import lateral_bc
    with lateral_bc(cfg.lateral):
        f1 = tendencies_terrain(s, cfg, rho_ref, p_ref, m, vg=vg)
        s1 = _axpy(s, f1, 1.0 / 3.0, dt)
        f2 = tendencies_terrain(s1, cfg, rho_ref, p_ref, m, vg=vg)
        s2 = _axpy(s, f2, 0.5, dt)
        f3 = tendencies_terrain(s2, cfg, rho_ref, p_ref, m, vg=vg)
        s3 = _axpy(s, f3, 1.0, dt)
    return rayleigh_sponge(s3, s, cfg, z_center, dt)
