"""Full physics suite driver: microphysics + surface/PBL + radiation.

Composes the individual schemes the way SCALE-RM's time loop does
(reference 18-km config: TIME_DT=30 s with TIME_DT_ATMOS_PHY_MP=30 s,
radiation every 600 s — BASELINE.md PARAM_TIME; the schemes themselves
live in the external SCALE library, SURVEY §2.6): microphysics every
physics step, surface+PBL every physics step, radiation on its own longer
interval. Everything is jit-compatible; the radiation subcycle uses a
static step-count modulus resolved at trace time.

The surface skin temperature is prognostic (slab with heat capacity
C_SLAB; set slab_capacity=0 to hold it fixed, i.e. SST-like lower
boundary).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import DycoreState
from scale_letkf_tpu.model.physics import kessler_step
from scale_letkf_tpu.model.microphysics6 import nsw6_step
from scale_letkf_tpu.model.pbl import pbl_step
from scale_letkf_tpu.model.radiation import radiation_step, SIGMA_SB


@dataclass(frozen=True)
class PhysicsConfig:
    """Physics-suite configuration (the PARAM_TIME physics-interval block
    + scheme selectors of the reference config, config.nml.scale)."""
    mp_scheme: str = "kessler"     # "kessler" | "nsw6" | "none"
    use_pbl: bool = True
    use_radiation: bool = True
    rad_interval: int = 10         # physics steps between radiation calls
    mu0: float = 0.5               # cosine solar zenith angle (static sun)
    albedo: float = 0.2
    eps_sfc: float = 0.98
    z0: float = 1.0e-2             # roughness length (momentum) [m]
    z0h: float = 1.0e-3            # roughness length (heat) [m]
    beta: float = 1.0              # surface evaporation efficiency
    slab_capacity: float = 0.0     # surface heat capacity [J/m^2/K]; 0=fixed


class PhysicsState(NamedTuple):
    """Auxiliary prognostic physics state carried across steps."""
    tsfc: jax.Array                # surface skin temperature (ny, nx)
    drhot_rad: jax.Array           # cached radiation ρθ tendency
    rad_sfc: jax.Array             # cached (lw_down + sw_abs) at surface


def init_physics_state(s: DycoreState, dz: float,
                       pcfg: PhysicsConfig) -> PhysicsState:
    """Initial skin temperature = lowest-level air temperature; radiation
    cache primed with one call."""
    from scale_letkf_tpu.model.dycore import moist_pressure
    from scale_letkf_tpu.constants import RD, CVDRY, PRE00
    q = s.rhoq / s.rho[None]
    p = moist_pressure(s.rhot, q)
    temp = (s.rhot / s.rho) * (p / PRE00) ** (RD / (RD + CVDRY))
    tsfc = temp[0]
    if pcfg.use_radiation:
        rad = radiation_step(s, dz, pcfg.mu0, pcfg.albedo, pcfg.eps_sfc,
                             tsfc)
        sw_abs = rad.sw_down_sfc * (1.0 - pcfg.albedo)
        return PhysicsState(tsfc=tsfc, drhot_rad=rad.drhot,
                            rad_sfc=rad.lw_down_sfc + sw_abs)
    zero = jnp.zeros_like(s.rhot)
    return PhysicsState(tsfc=tsfc, drhot_rad=zero,
                        rad_sfc=jnp.zeros_like(tsfc))


def physics_step(s: DycoreState, phys: PhysicsState, step_index,
                 pcfg: PhysicsConfig, dt: float, dz: float,
                 zc: jax.Array) -> tuple[DycoreState, PhysicsState]:
    """One physics step of length `dt` (the physics interval, possibly
    several dynamics steps). `step_index` is a traced int32 counter used
    for the radiation interval."""
    # --- microphysics
    if pcfg.mp_scheme == "kessler":
        s = kessler_step(s, dt, dz)
    elif pcfg.mp_scheme == "nsw6":
        s = nsw6_step(s, dt, dz)

    # --- radiation (recompute every rad_interval steps, else reuse cache)
    drhot_rad = phys.drhot_rad
    rad_sfc = phys.rad_sfc
    if pcfg.use_radiation:
        def recompute(_):
            rad = radiation_step(s, dz, pcfg.mu0, pcfg.albedo,
                                 pcfg.eps_sfc, phys.tsfc)
            sw_abs = rad.sw_down_sfc * (1.0 - pcfg.albedo)
            return rad.drhot, rad.lw_down_sfc + sw_abs

        def reuse(_):
            return drhot_rad, rad_sfc

        drhot_rad, rad_sfc = jax.lax.cond(
            step_index % pcfg.rad_interval == 0, recompute, reuse, None)
        s = s._replace(rhot=s.rhot + dt * drhot_rad)

    # --- surface + boundary layer
    tsfc = phys.tsfc
    if pcfg.use_pbl:
        res = pbl_step(s, dt, dz, zc, tsfc, z0=pcfg.z0, z0h=pcfg.z0h,
                       beta=pcfg.beta)
        s = res.state
        if pcfg.slab_capacity > 0.0:
            net = (rad_sfc - pcfg.eps_sfc * SIGMA_SB * tsfc ** 4
                   - res.sfc.shf - res.sfc.lhf)
            tsfc = tsfc + dt * net / pcfg.slab_capacity

    return s, PhysicsState(tsfc=tsfc, drhot_rad=drhot_rad,
                           rad_sfc=rad_sfc)
