"""Lateral boundary forcing for limited-area (non-periodic) runs.

The reference obtains lateral boundary conditions from parent-model files
(workflow BDY_FORMAT options, reference:
scale/run/config/example/config.main.hakushu:72-78; the boundary relaxation
itself happens inside the external SCALE library). Here the standard Davies
(1976) relaxation is applied directly to the prognostic state: within a
buffer of `width` cells from the lateral edges, fields are nudged toward a
time-interpolated boundary target with a cosine-shaped weight.

The dycore's rolls remain periodic — with a relaxation buffer ≥ the stencil
width the wrap-around fluxes only see boundary-relaxed values, which is the
standard trick for running open domains on a periodic solver.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import DycoreState


class BoundaryData(NamedTuple):
    """Boundary targets at two bracketing times (time-interpolated)."""
    state0: DycoreState
    state1: DycoreState
    t0: float
    t1: float


def relaxation_weight(ny: int, nx: int, width: int, tau: float,
                      dtype=jnp.float32) -> jax.Array:
    """(ny, nx) Davies relaxation rate [1/s]: cosine ramp from 1/tau at the
    edge to 0 at `width` cells inside."""
    def ramp(n):
        d = np.minimum(np.arange(n), np.arange(n)[::-1]).astype(float)
        w = np.where(d < width, 0.5 * (1 + np.cos(np.pi * d / width)), 0.0)
        return w
    wx = ramp(nx)
    wy = ramp(ny)
    w2 = np.maximum(wx[None, :], wy[:, None]) / tau
    return jnp.asarray(w2, dtype)


def interp_boundary(bdy: BoundaryData, t: float) -> DycoreState:
    a = 0.0 if bdy.t1 == bdy.t0 else (t - bdy.t0) / (bdy.t1 - bdy.t0)
    a = min(max(a, 0.0), 1.0)
    return DycoreState(*((1.0 - a) * x0 + a * x1
                         for x0, x1 in zip(bdy.state0, bdy.state1)))


def apply_boundary_relaxation(s: DycoreState, target: DycoreState,
                              weight2d: jax.Array, dt: float) -> DycoreState:
    """Implicit nudging s ← (s + dt·w·target)/(1 + dt·w) in the buffer."""
    def nudge(x, xt):
        w = weight2d
        # broadcast (ny, nx) over any leading dims
        fac = dt * w
        return (x + fac * xt) / (1.0 + fac)
    return DycoreState(*(nudge(x, xt) for x, xt in zip(s, target)))


def save_boundary(path: str, bdy: BoundaryData) -> None:
    """Boundary file: two bracketing DycoreStates + their times (the role
    of the reference's scale_init boundary output, BDY_FORMAT options in
    config/example/config.main.hakushu:72-78)."""
    arrs = {}
    for tag, st in (("b0", bdy.state0), ("b1", bdy.state1)):
        for name, a in zip(DycoreState._fields, st):
            arrs[f"{tag}_{name}"] = np.asarray(a)
    np.savez_compressed(path, t0=bdy.t0, t1=bdy.t1, **arrs)


def load_boundary(path: str) -> BoundaryData:
    z = np.load(path)
    s0 = DycoreState(*(jnp.asarray(z[f"b0_{n}"])
                       for n in DycoreState._fields))
    s1 = DycoreState(*(jnp.asarray(z[f"b1_{n}"])
                       for n in DycoreState._fields))
    return BoundaryData(state0=s0, state1=s1,
                        t0=float(z["t0"]), t1=float(z["t1"]))
