"""Idealized initial conditions (warm bubble, OSSE twin experiments).

Plays the role of the reference's scale-rm_init_ens preprocessing
(reference: scale/ensmodel/scale-rm_init_ens.f90 calling scalerm_prep) for
the idealized configurations, plus the initial ensemble perturbation
machinery (reference: scale/run/python/init_perturb.py:12-30 adds tapered
random RHOT perturbations).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import RD, CVDRY, PRE00, GRAV
from scale_letkf_tpu.model.dycore import (
    DycoreState, DycoreConfig, hydrostatic_reference,
)
from scale_letkf_tpu.state import NQ

CPDRY = RD + CVDRY


def standard_theta_profile(nz: int, dz: float, theta0: float = 300.0,
                           dthdz: float = 0.004,
                           cz: np.ndarray | None = None) -> np.ndarray:
    """Weakly stable boundary-layer θ profile at cell centers."""
    z = (np.arange(nz) + 0.5) * dz if cz is None else np.asarray(cz)
    return theta0 + dthdz * z


def balanced_state(nz: int, ny: int, nx: int, dz: float,
                   theta_prof: np.ndarray | None = None,
                   qv_prof: np.ndarray | None = None,
                   dtype=jnp.float32,
                   cz: np.ndarray | None = None):
    """Hydrostatically balanced horizontally uniform base state.

    Returns (DycoreState, rho_ref, p_ref) with reference columns shaped
    (nz, 1, 1). The reference pressure is defined through the same EOS the
    dycore uses, so the base state is exactly steady (see dycore.tendencies).
    cz: optional stretched cell-center heights (Grid.stretched).
    """
    if theta_prof is None:
        theta_prof = standard_theta_profile(nz, dz, cz=cz)
    rho1d, p1d = hydrostatic_reference(theta_prof, dz, cz=cz)
    rho = jnp.asarray(np.tile(rho1d[:, None, None], (1, ny, nx)), dtype)
    rhot = jnp.asarray(np.tile((rho1d * theta_prof)[:, None, None],
                               (1, ny, nx)), dtype)
    zero = jnp.zeros((nz, ny, nx), dtype)
    zero_w = jnp.zeros((nz + 1, ny, nx), dtype)
    rhoq = jnp.zeros((NQ, nz, ny, nx), dtype)
    if qv_prof is not None:
        qv = jnp.asarray(np.tile(qv_prof[:, None, None], (1, ny, nx)), dtype)
        rhoq = rhoq.at[0].set(qv * rho)
    s = DycoreState(rho=rho, rhou=zero, rhov=zero, rhow=zero_w,
                    rhot=rhot, rhoq=rhoq)
    rho_ref = jnp.asarray(rho1d[:, None, None], dtype)
    # reference pressure must equal EOS(rhot_ref) exactly: recompute via EOS
    kappa = RD / CPDRY
    p_ref_eos = PRE00 * (rho1d * theta_prof * RD / PRE00) ** (CPDRY / CVDRY)
    p_ref = jnp.asarray(p_ref_eos[:, None, None], dtype)
    return s, rho_ref, p_ref


def add_warm_bubble(s: DycoreState, dz: float, dx: float, dy: float,
                    amplitude: float = 2.0,
                    center: tuple | None = None,
                    radius: tuple = (4.0e3, 4.0e3, 2.0e3)) -> DycoreState:
    """Gaussian-cosine θ perturbation (classic warm-bubble test)."""
    nz, ny, nx = s.rho.shape
    if center is None:
        center = (nx * dx / 2, ny * dy / 2, 2.0e3)
    x = (jnp.arange(nx) + 0.5) * dx
    y = (jnp.arange(ny) + 0.5) * dy
    z = (jnp.arange(nz) + 0.5) * dz
    rx = (x - center[0]) / radius[0]
    ry = (y - center[1]) / radius[1]
    rz = (z - center[2]) / radius[2]
    r = jnp.sqrt(rx[None, None, :] ** 2 + ry[None, :, None] ** 2
                 + rz[:, None, None] ** 2)
    dtheta = amplitude * jnp.cos(0.5 * jnp.pi * jnp.minimum(r, 1.0)) ** 2
    # perturb θ at constant ρ: ρθ += ρ·Δθ
    return s._replace(rhot=s.rhot + s.rho * dtheta)


def perturb_ensemble(key: jax.Array, s: DycoreState, n_members: int,
                     amplitude: float = 0.5,
                     taper_top: float = 0.8) -> DycoreState:
    """Initial ensemble: smooth random ρθ perturbations per member
    (init_perturb.py analogue). Returns a DycoreState with a leading member
    axis on every field."""
    nz, ny, nx = s.rho.shape
    keys = jax.random.split(key, n_members)

    def one(k):
        noise = jax.random.normal(k, (nz, ny, nx), s.rhot.dtype)
        # smoothing (3 passes of 1-2-1) in all directions so the ensemble
        # carries spatially (incl. vertically) correlated perturbations —
        # required for localized covariances to carry signal, not noise
        for axis in (-1, -2):
            for _ in range(3):
                noise = 0.25 * (jnp.roll(noise, 1, axis) + jnp.roll(noise, -1, axis)) \
                    + 0.5 * noise
        for _ in range(3):
            up = jnp.concatenate([noise[:1], noise[:-1]], axis=0)
            dn = jnp.concatenate([noise[1:], noise[-1:]], axis=0)
            noise = 0.25 * (up + dn) + 0.5 * noise
        # vertical taper: no perturbation at model top
        z_frac = (jnp.arange(nz) + 0.5) / nz
        taper = jnp.where(z_frac > taper_top,
                          (1.0 - z_frac) / (1.0 - taper_top), 1.0)
        noise = noise * taper[:, None, None]
        return s._replace(rhot=s.rhot + amplitude * s.rho * noise)

    return jax.vmap(one)(keys)
