"""Explicit halo-exchange stencils under shard_map.

TPU-native equivalent of the reference's halo machinery (reference: SCALE
COMM_vars8/COMM_wait used at common_scale.f90:1385-1397; halo width 2 per
the IHALO/JHALO convention). Two multi-chip paths exist:

1. the default GSPMD path: the dycore's jnp.roll stencils compile to
   collective-permutes automatically when arrays are sharded (zero extra
   code; used by dryrun_multichip);
2. this module: shard_map with explicit ppermute ring exchanges building a
   halo-extended local block, running the *same* roll-based tendencies on
   the extended block, and cropping the interior. Identical numerics, with
   the communication explicit and BATCHED: the whole state is packed into
   ONE buffer per direction, so each RK stage issues 4 ppermutes total
   (COMM_vars8 batches its variables the same way) instead of one pair per
   field per axis.

Supported here (selectable via DycoreConfig.halo = 'explicit' |
'explicit_overlap'): periodic AND open lateral boundaries (open = mesh-edge
shards fill their outer halo with edge-replicated values, reproducing the
_shift_clamp ghost-cell convention), stretched vertical grids (VGrid), and
an overlap variant that computes interior tendencies from the local block
concurrently with the halo exchange, then patches the edge bands from
small halo-extended strips — the first step of compute/communication
overlap (XLA's latency-hiding scheduler can run the ppermutes while the
interior tendencies execute, since they have no data dependence).

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
RADIUS = 3      # total stencil radius (UD3 + momentum composition ≤ 3)


def _ring_perm(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def _edge_fill(local, axis, h, side):
    """Open-BC halo: replicate the boundary slice h times (the
    _shift_clamp ghost-cell convention, model/dycore.py)."""
    size = local.shape[axis]
    if side == "lo":
        edge = jax.lax.slice_in_dim(local, 0, 1, axis=axis)
    else:
        edge = jax.lax.slice_in_dim(local, size - 1, size, axis=axis)
    reps = [1] * local.ndim
    reps[axis] = h
    return jnp.tile(edge, reps)


def exchange_axis(local: jax.Array, axis: int, axis_name: str,
                  h: int = HALO_W, periodic: bool = True) -> jax.Array:
    """Extend `local` with h halo cells on both sides of `axis`, filled
    from ring neighbors along mesh axis `axis_name`. With periodic=False
    (open lateral boundaries) the first/last shard clamps its outer halo
    to the domain-edge value instead of wrapping."""
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
    if not periodic:
        idx = jax.lax.axis_index(axis_name)
        from_left = jnp.where(idx == 0, _edge_fill(local, axis, h, "lo"),
                              from_left)
        from_right = jnp.where(idx == n - 1,
                               _edge_fill(local, axis, h, "hi"),
                               from_right)
    return jnp.concatenate([from_left, local, from_right], axis=axis)


def _pack(s: DycoreState) -> jax.Array:
    """Pack the whole state into one (..., nlev_total, ny, nx) buffer so
    each halo direction is ONE ppermute (COMM_vars8-style variable
    batching). Leading batch (member) axes pass through."""
    nq, nz = s.rhoq.shape[-4], s.rhoq.shape[-3]
    rhoq = s.rhoq.reshape(s.rhoq.shape[:-4] + (nq * nz,)
                          + s.rhoq.shape[-2:])
    return jnp.concatenate(
        [s.rho, s.rhou, s.rhov, s.rhot, s.rhow, rhoq], axis=-3)


def _unpack(buf: jax.Array, nz: int, nq: int) -> DycoreState:
    o = 0
    parts = []
    ax = buf.ndim - 3
    for span in (nz, nz, nz, nz, nz + 1, nq * nz):
        parts.append(jax.lax.slice_in_dim(buf, o, o + span, axis=ax))
        o += span
    rho, rhou, rhov, rhot, rhow, rhoq = parts
    rhoq = rhoq.reshape(rhoq.shape[:-3] + (nq, nz) + rhoq.shape[-2:])
    return DycoreState(rho=rho, rhou=rhou, rhov=rhov, rhow=rhow,
                       rhot=rhot, rhoq=rhoq)


def extend_state(s: DycoreState, h: int = HALO_W,
                 periodic: bool = True) -> DycoreState:
    """Halo-extend every field in y (axis -2) and x (axis -1) via ONE
    packed exchange per direction."""
    nz = s.rho.shape[-3]
    nq = s.rhoq.shape[-4]
    buf = _pack(s)
    buf = exchange_axis(buf, buf.ndim - 2, AXIS_DY, h, periodic)
    buf = exchange_axis(buf, buf.ndim - 1, AXIS_DX, h, periodic)
    return _unpack(buf, nz, nq)


def crop_state(s: DycoreState, h: int = HALO_W) -> DycoreState:
    return DycoreState(*(a[..., h:-h, h:-h] for a in s))


def _strip(s: DycoreState, axis_from_end: int, start: int,
           stop: int) -> DycoreState:
    """Slice every field along y (axis_from_end=2) or x (=1) — fields have
    different ranks, so the axis is counted from the end."""
    return DycoreState(*(jax.lax.slice_in_dim(
        a, start, stop, axis=a.ndim - axis_from_end) for a in s))


def _update(dst, src, axis_from_end, at):
    def upd(d, sl):
        idx = [0] * d.ndim
        idx[d.ndim - axis_from_end] = at
        return jax.lax.dynamic_update_slice(d, sl, tuple(idx))
    return DycoreState(*(upd(d, sl) for d, sl in zip(dst, src)))


def _build_local_tend(cfg, rho_ref, p_ref, vg, periodic, overlap,
                      batched):
    """Local (per-shard) tendency function shared by the single-state and
    ensemble halo steps. batched=True vmaps tendencies over a leading
    member axis (all halo/strip plumbing is end-axis based)."""
    h, r = HALO_W, RADIUS

    def tend_on(block):
        # periodic rolls inside the block: wrap only pollutes cells within
        # RADIUS of the block edge, which every caller crops/discards (the
        # open-BC clamp lives in the halo FILL, exchange_axis)
        from scale_letkf_tpu.model.dycore import lateral_bc
        with lateral_bc("periodic"):
            if batched:
                return jax.vmap(
                    lambda b: tendencies(b, cfg, rho_ref, p_ref, vg))(block)
            return tendencies(block, cfg, rho_ref, p_ref, vg)

    def local_tend(s_loc):
        ext = extend_state(s_loc, h, periodic)
        return crop_state(tend_on(ext), h)

    def local_tend_overlap(s_loc):
        ny, nx = s_loc.rho.shape[-2:]
        ext = extend_state(s_loc, h, periodic)
        # interior: computable from the local block alone (no halo/comm
        # dependence) — valid except within RADIUS of the local edge
        t = tend_on(s_loc)
        # y edge bands from strips of the extended block (height 3r: the
        # r valid target rows + r stencil margin each side); x strips span
        # the full extended y so corners are covered
        st = tend_on(_strip(ext, 2, h - r, h + 2 * r))
        band = DycoreState(*(a[..., r:2 * r, h:h + nx] for a in st))
        t = _update(t, band, 2, 0)
        nyext = ny + 2 * h
        st = tend_on(_strip(ext, 2, nyext - h - 2 * r, nyext - h + r))
        band = DycoreState(*(a[..., r:2 * r, h:h + nx] for a in st))
        t = _update(t, band, 2, ny - r)
        st = tend_on(_strip(ext, 1, h - r, h + 2 * r))
        band = DycoreState(*(a[..., h:h + ny, r:2 * r] for a in st))
        t = _update(t, band, 1, 0)
        nxext = nx + 2 * h
        st = tend_on(_strip(ext, 1, nxext - h - 2 * r, nxext - h + r))
        band = DycoreState(*(a[..., h:h + ny, r:2 * r] for a in st))
        t = _update(t, band, 1, nx - r)
        return t

    return local_tend_overlap if overlap else local_tend


def rk3_step_halo(s: DycoreState, cfg: DycoreConfig, rho_ref, p_ref,
                  z_center, mesh: Mesh, vg=None,
                  overlap: bool = False) -> DycoreState:
    """One RK3 step with explicit halo exchange per stage under shard_map.

    s holds GLOBAL arrays; in/out specs shard (ny, nx) over (dy, dx).
    Periodic and open lateral BCs and stretched grids (vg) are supported.
    overlap=True computes interior tendencies from the UN-extended local
    block (no communication dependence) and patches only the edge bands
    from halo-extended strips, so XLA may run the ppermutes concurrently
    with the interior compute."""
    periodic = cfg.lateral == "periodic"
    spec4 = P(None, AXIS_DY, AXIS_DX)
    spec5 = P(None, None, AXIS_DY, AXIS_DX)
    state_specs = DycoreState(rho=spec4, rhou=spec4, rhov=spec4,
                              rhow=spec4, rhot=spec4, rhoq=spec5)
    tend = _build_local_tend(cfg, rho_ref, p_ref, vg, periodic, overlap,
                             batched=False)

    @partial(shard_map, mesh=mesh, in_specs=(state_specs,),
             out_specs=state_specs)
    def step(s_loc):
        dt = cfg.dt
        f1 = tend(s_loc)
        s1 = _axpy(s_loc, f1, 1.0 / 3.0, dt)
        f2 = tend(s1)
        s2 = _axpy(s_loc, f2, 0.5, dt)
        f3 = tend(s2)
        s3 = _axpy(s_loc, f3, 1.0, dt)
        return rayleigh_sponge(s3, s_loc, cfg, z_center, dt)

    return step(s)


def rk3_step_halo_ens(ens: DycoreState, cfg: DycoreConfig, rho_ref, p_ref,
                      z_center, mesh: Mesh, vg=None,
                      overlap: bool = False) -> DycoreState:
    """Ensemble halo step: (K, ...) state with the member axis sharded over
    the mesh's member dimension and (ny, nx) over (dy, dx) — the
    production forecast layout (parallel/mesh.py shard_ensemble)."""
    from scale_letkf_tpu.parallel.mesh import AXIS_MEMBER
    periodic = cfg.lateral == "periodic"
    spec5 = P(AXIS_MEMBER, None, AXIS_DY, AXIS_DX)
    spec6 = P(AXIS_MEMBER, None, None, AXIS_DY, AXIS_DX)
    state_specs = DycoreState(rho=spec5, rhou=spec5, rhov=spec5,
                              rhow=spec5, rhot=spec5, rhoq=spec6)
    tend = _build_local_tend(cfg, rho_ref, p_ref, vg, periodic, overlap,
                             batched=True)

    @partial(shard_map, mesh=mesh, in_specs=(state_specs,),
             out_specs=state_specs)
    def step(s_loc):
        dt = cfg.dt
        f1 = tend(s_loc)
        s1 = _axpy(s_loc, f1, 1.0 / 3.0, dt)
        f2 = tend(s1)
        s2 = _axpy(s_loc, f2, 0.5, dt)
        f3 = tend(s2)
        s3 = _axpy(s_loc, f3, 1.0, dt)
        return rayleigh_sponge(s3, s_loc, cfg, z_center, dt)

    return step(ens)
