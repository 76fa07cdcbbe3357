"""Explicit halo-exchange stencils under shard_map.

TPU-native equivalent of the reference's halo machinery (reference: SCALE
COMM_vars8/COMM_wait used at common_scale.f90:1385-1397; halo width 2 per
the IHALO/JHALO convention). Two multi-chip paths exist:

1. the default GSPMD path: the dycore's jnp.roll stencils compile to
   collective-permutes automatically when arrays are sharded (zero extra
   code; used by dryrun_multichip);
2. this module: shard_map with explicit ppermute ring exchanges building a
   halo-extended local block, running the *same* roll-based tendencies on
   the extended block, and cropping the interior. Identical numerics, but
   the communication is explicit and batched once per RK stage — the
   foundation for overlapping halo traffic with interior compute (Pallas
   async remote DMA is the planned next step on this path).

The periodic wrap of rolls inside the extended block only pollutes the halo
zone, which is cropped; HALO_W must be ≥ the total stencil radius (UD3 and
the 4th-order hyperdiffusion both have radius 2; momentum advection
composes to ≤ 3)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from scale_letkf_tpu.model.dycore import (
    DycoreConfig, DycoreState, tendencies, rayleigh_sponge, _axpy,
)
from scale_letkf_tpu.parallel.mesh import AXIS_DY, AXIS_DX

HALO_W = 4


def _ring_perm(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def exchange_axis(local: jax.Array, axis: int, axis_name: str,
                  h: int = HALO_W) -> jax.Array:
    """Extend `local` with h halo cells on both sides of `axis`, filled from
    ring neighbors along mesh axis `axis_name` (periodic global domain)."""
    n = jax.lax.axis_size(axis_name)
    lo = jax.lax.slice_in_dim(local, 0, h, axis=axis)
    hi = jax.lax.slice_in_dim(local, local.shape[axis] - h,
                              local.shape[axis], axis=axis)
    if n == 1:
        from_left, from_right = hi, lo
    else:
        fwd, bwd = _ring_perm(n)
        from_left = jax.lax.ppermute(hi, axis_name, fwd)   # left nbr's top
        from_right = jax.lax.ppermute(lo, axis_name, bwd)  # right nbr's bottom
    return jnp.concatenate([from_left, local, from_right], axis=axis)


def extend_state(s: DycoreState, h: int = HALO_W) -> DycoreState:
    """Halo-extend every field in y (axis -2) and x (axis -1)."""
    def ext(a):
        a = exchange_axis(a, a.ndim - 2, AXIS_DY, h)
        a = exchange_axis(a, a.ndim - 1, AXIS_DX, h)
        return a
    return DycoreState(*(ext(a) for a in s))


def crop_state(s: DycoreState, h: int = HALO_W) -> DycoreState:
    return DycoreState(*(a[..., h:-h, h:-h] for a in s))


def rk3_step_halo(s: DycoreState, cfg: DycoreConfig, rho_ref, p_ref,
                  z_center, mesh: Mesh) -> DycoreState:
    """One RK3 step with explicit halo exchange per stage under shard_map.

    s holds GLOBAL arrays; in/out specs shard (ny, nx) over (dy, dx)."""
    spec4 = P(None, AXIS_DY, AXIS_DX)
    spec5 = P(None, None, AXIS_DY, AXIS_DX)
    state_specs = DycoreState(rho=spec4, rhou=spec4, rhov=spec4,
                              rhow=spec4, rhot=spec4, rhoq=spec5)

    def local_tend(s_loc):
        ext = extend_state(s_loc)
        t = tendencies(ext, cfg, rho_ref, p_ref)
        return crop_state(t)

    @partial(shard_map, mesh=mesh, in_specs=(state_specs,),
             out_specs=state_specs)
    def step(s_loc):
        dt = cfg.dt
        f1 = local_tend(s_loc)
        s1 = _axpy(s_loc, f1, 1.0 / 3.0, dt)
        f2 = local_tend(s1)
        s2 = _axpy(s_loc, f2, 0.5, dt)
        f3 = local_tend(s2)
        s3 = _axpy(s_loc, f3, 1.0, dt)
        return rayleigh_sponge(s3, s_loc, cfg, z_center, dt)

    return step(s)
