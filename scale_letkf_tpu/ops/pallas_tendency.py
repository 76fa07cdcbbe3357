"""Pallas TPU kernel: fused WHOLE-TENDENCY dynamics stencil.

VERDICT-r4 item 8: the r4 experiment (ops/pallas_stencil.py) fused one
tracer's UD3 flux divergence and lost to XLA because each Pallas call
replaced a single already-roofline XLA fusion while paying 3x overlapping
block reads. This kernel fuses the ENTIRE dynamics tendency of the
explicit core (dycore.tendencies, reference slow-tendency of the HEVI
step): continuity + UD3 rho-theta advection + 2nd-order momentum
advection + pressure gradient + buoyancy + 4th-order hyperdiffusion +
divergence damping — ONE HBM read per input field and one write per
output per call, where XLA splits the same graph into many fusions that
re-read their inputs.

Design (one grid step = one y-slab):
- inputs stay in HBM (`pl.ANY`); each grid step DMAs the slab plus an
  8-row y-halo into VMEM scratch (Mosaic requires sublane-tile-aligned
  HBM slices on lane-padded memrefs, so the minimal 2-row halo is
  rounded up to one full sublane tile: read amplification (by+16)/by —
  a 4-slot ring streaming slabs once each would cut this to ~1x and is
  the identified next step), with periodic wraparound handled by split
  copies at the first/last slab (statically-shaped cases under
  `pl.when`, dead cases omitted at trace time);
- x stays whole: periodic x shifts are lane rolls (`pltpu.roll`), so no
  x halo is materialized at all;
- within the slab, y shifts are SUBLANE rolls: the total stencil radius
  of every composed output is <= 2 (UD3: 2, hyperdiff4: 1+1, staggered
  momentum: <= 2), so slab-periodic rolls corrupt only the 2 halo rows
  and the kernel writes back rows [2, by+2) only;
- z is never tiled (leading dim): vertical stencils are plain
  slices/concats, boundaries handled exactly as dycore.ud3_face_z;
- p is NOT recomputed in-kernel: moist_pressure is one fused XLA pass
  (transcendental-heavy, no stencil), and passing p' keeps the kernel
  pure-stencil. Tracer advection stays on the XLA path (measured faster
  per-op on v5e in r4; tracers are separable).

Restrictions (as ops/pallas_stencil.py): periodic lateral boundaries,
uniform vertical spacing, no terrain metrics. The dispatcher in
dycore.tendencies enforces them.

Reference: the dynamics tendency is the reference's externalized hot
loop (SCALE-RM's ATMOS_DYN Tstep, driven per member from
scale/run/cycle.sh); this kernel is its TPU-native single-pass form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scale_letkf_tpu.constants import GRAV

H = 2   # max composed stencil radius (rows of the slab that may be
        # corrupted by slab-local periodic rolls)
HD = 8  # DMA halo rows: one full sublane tile, so every HBM slice is
        # tile-aligned (Mosaic requirement for lane-padded memrefs)


def _ud3_z(f, mflux_w):
    """Face value at interior z-faces; matches dycore.ud3_face_z."""
    nz = f.shape[0]
    pos = (2.0 * f[1:] + 5.0 * f[:-1]
           - jnp.concatenate([f[:1], f[:-2]], axis=0)) / 6.0
    neg = (2.0 * f[:-1] + 5.0 * f[1:]
           - jnp.concatenate([f[2:], f[-1:]], axis=0)) / 6.0
    hi = jnp.where(mflux_w >= 0, pos, neg)
    centered = 0.5 * (f[1:] + f[:-1])
    k = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 0)
    edge = (k == 0) | (k == nz - 2)
    return jnp.where(edge, centered, hi)


def _tendency_kernel(rho_h, rhou_h, rhov_h, rhow_h, rhot_h, pp_h, rref,
                     o_rho, o_rhou, o_rhov, o_rhow, o_rhot,
                     s_rho, s_rhou, s_rhov, s_rhow, s_rhot, s_pp, sem,
                     *, by, nblk, ny, hd, dx, dy, dz, kdiff4, alpha_h,
                     alpha_z, interpret):
    j = pl.program_id(0)
    r0 = j * by
    R = by + 2 * hd
    hbm = [rho_h, rhou_h, rhov_h, rhow_h, rhot_h, pp_h]
    scr = [s_rho, s_rhou, s_rhov, s_rhow, s_rhot, s_pp]

    # ---- slab DMA with periodic y wraparound: statically-shaped cases.
    # hd (the DMA halo) is a multiple of the 8-sublane tile so every HBM
    # slice offset/length is tile-aligned — Mosaic rejects unaligned
    # sublane slices of lane-padded HBM memrefs. Unreachable cases are
    # omitted at TRACE time (pl.when compiles both branches, and an
    # out-of-bounds pl.ds in a dead branch still fails to compile).
    def _start_wait(pairs, sems):
        cps = [pltpu.make_async_copy(src, dst, sm)
               for (src, dst), sm in zip(pairs, sems)]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    if nblk > 2:
        @pl.when(jnp.logical_and(j > 0, j < nblk - 1))
        def _():
            lo = pl.multiple_of(r0 - hd, 8)   # by, hd are 8-multiples
            _start_wait([(h.at[:, pl.ds(lo, R), :], s)
                         for h, s in zip(hbm, scr)],
                        [sem.at[i] for i in range(len(hbm))])

    @pl.when(j == 0)
    def _():
        pairs = []
        for h, s in zip(hbm, scr):
            pairs.append((h.at[:, pl.ds(ny - hd, hd), :], s.at[:, 0:hd, :]))
            pairs.append((h.at[:, pl.ds(0, by + hd), :], s.at[:, hd:R, :]))
        _start_wait(pairs, [sem.at[i // 2] for i in range(len(pairs))])

    if nblk > 1:
        @pl.when(j == nblk - 1)
        def _():
            lo = pl.multiple_of(r0 - hd, 8)
            pairs = []
            for h, s in zip(hbm, scr):
                pairs.append((h.at[:, pl.ds(lo, by + hd), :],
                              s.at[:, 0:by + hd, :]))
                pairs.append((h.at[:, pl.ds(0, hd), :],
                              s.at[:, by + hd:R, :]))
            _start_wait(pairs, [sem.at[i // 2] for i in range(len(pairs))])

    rho = s_rho[...]
    fx = s_rhou[...]
    fy = s_rhov[...]
    rhow = s_rhow[...]
    rhot = s_rhot[...]
    p_pert = s_pp[...]
    rho_ref = rref[...]

    if interpret:
        def roll(f, sh, ax):
            return jnp.roll(f, sh, axis=ax)
    else:
        def roll(f, sh, ax):
            ax = ax % f.ndim
            return pltpu.roll(f, sh % f.shape[ax], ax)  # needs shift >= 0

    def rx(f, n):   # value from i+n (periodic lanes)
        return roll(f, -n, -1)

    def ry(f, n):   # value from j+n (slab-periodic sublanes; halo-valid)
        return roll(f, -n, -2)

    def div_center(fx_, fy_, fw_full):
        return ((fx_ - rx(fx_, -1)) / dx + (fy_ - ry(fy_, -1)) / dy
                + (fw_full[1:] - fw_full[:-1]) / dz)

    def hyperdiff4(f):
        lap = rx(f, 1) + rx(f, -1) + ry(f, 1) + ry(f, -1) - 4.0 * f
        lap2 = (rx(lap, 1) + rx(lap, -1) + ry(lap, 1) + ry(lap, -1)
                - 4.0 * lap)
        return -kdiff4 * lap2

    # --- continuity
    div = div_center(fx, fy, rhow)
    drho = -div

    # --- rho-theta UD3 advection (dycore.scalar_tend on rhot)
    fw_int = rhow[1:-1]
    phi = rhot / rho
    fm1, f0, fp1, fp2 = rx(phi, -1), phi, rx(phi, 1), rx(phi, 2)
    pos = (2.0 * fp1 + 5.0 * f0 - fm1) / 6.0
    neg = (2.0 * f0 + 5.0 * fp1 - fp2) / 6.0
    fl_x = fx * jnp.where(fx >= 0, pos, neg)
    fm1, fp1, fp2 = ry(phi, -1), ry(phi, 1), ry(phi, 2)
    pos = (2.0 * fp1 + 5.0 * f0 - fm1) / 6.0
    neg = (2.0 * f0 + 5.0 * fp1 - fp2) / 6.0
    fl_y = fy * jnp.where(fy >= 0, pos, neg)
    fl_z_int = fw_int * _ud3_z(phi, fw_int)
    zeros_c = jnp.zeros_like(fl_z_int[:1])
    fl_z = jnp.concatenate([zeros_c, fl_z_int, zeros_c], axis=0)
    drhot = -div_center(fl_x, fl_y, fl_z) + hyperdiff4(rhot)

    # --- momentum advection (2nd-order centered) + PGF (dycore.py:303-364)
    u_face = fx / (0.5 * (rho + rx(rho, 1)))
    v_face = fy / (0.5 * (rho + ry(rho, 1)))

    fx_c = 0.5 * (fx + rx(fx, -1))
    adv_u_x = fx_c * 0.5 * (u_face + rx(u_face, -1))
    dadv_u = (rx(adv_u_x, 1) - adv_u_x) / dx
    fy_corner = 0.5 * (fy + rx(fy, 1))
    adv_u_y = fy_corner * 0.5 * (u_face + ry(u_face, 1))
    dadv_u = dadv_u + (adv_u_y - ry(adv_u_y, -1)) / dy
    fw_xface = 0.5 * (rhow + rx(rhow, 1))
    u_zface = jnp.concatenate(
        [u_face[:1], 0.5 * (u_face[1:] + u_face[:-1]), u_face[-1:]], axis=0)
    adv_u_z = fw_xface * u_zface
    # zero the rigid-boundary faces via concat (no .at in kernels)
    adv_u_z = jnp.concatenate(
        [jnp.zeros_like(adv_u_z[:1]), adv_u_z[1:-1],
         jnp.zeros_like(adv_u_z[:1])], axis=0)
    dadv_u = dadv_u + (adv_u_z[1:] - adv_u_z[:-1]) / dz
    dpx = (rx(p_pert, 1) - p_pert) / dx
    drhou = -dadv_u - dpx + hyperdiff4(fx)

    fy_c = 0.5 * (fy + ry(fy, -1))
    adv_v_y = fy_c * 0.5 * (v_face + ry(v_face, -1))
    dadv_v = (ry(adv_v_y, 1) - adv_v_y) / dy
    fx_corner = 0.5 * (fx + ry(fx, 1))
    adv_v_x = fx_corner * 0.5 * (v_face + rx(v_face, 1))
    dadv_v = dadv_v + (adv_v_x - rx(adv_v_x, -1)) / dx
    fw_yface = 0.5 * (rhow + ry(rhow, 1))
    v_zface = jnp.concatenate(
        [v_face[:1], 0.5 * (v_face[1:] + v_face[:-1]), v_face[-1:]], axis=0)
    adv_v_z = fw_yface * v_zface
    adv_v_z = jnp.concatenate(
        [jnp.zeros_like(adv_v_z[:1]), adv_v_z[1:-1],
         jnp.zeros_like(adv_v_z[:1])], axis=0)
    dadv_v = dadv_v + (adv_v_z[1:] - adv_v_z[:-1]) / dz
    dpy = (ry(p_pert, 1) - p_pert) / dy
    drhov = -dadv_v - dpy + hyperdiff4(fy)

    # --- w-momentum at interior z-faces
    rho_face_full = jnp.concatenate(
        [rho[:1], 0.5 * (rho[1:] + rho[:-1]), rho[-1:]], axis=0)
    w_full = rhow / rho_face_full
    w_face = w_full[1:-1]
    fw_c = 0.5 * (rhow[1:] + rhow[:-1])
    adv_w_z = fw_c * 0.5 * (w_full[1:] + w_full[:-1])
    dadv_w = (adv_w_z[1:] - adv_w_z[:-1]) / dz
    fx_zface = 0.5 * (fx[1:] + fx[:-1])
    adv_w_x = fx_zface * 0.5 * (w_face + rx(w_face, 1))
    dadv_w = dadv_w + (adv_w_x - rx(adv_w_x, -1)) / dx
    fy_zface = 0.5 * (fy[1:] + fy[:-1])
    adv_w_y = fy_zface * 0.5 * (w_face + ry(w_face, 1))
    dadv_w = dadv_w + (adv_w_y - ry(adv_w_y, -1)) / dy
    dpz = (p_pert[1:] - p_pert[:-1]) / dz
    rho_pert = rho - rho_ref
    buoy = -0.5 * (rho_pert[1:] + rho_pert[:-1]) * GRAV
    drhow_int = (-dadv_w - dpz + buoy + hyperdiff4(rhow[1:-1]))

    # --- divergence damping (dycore.py:366-373)
    if alpha_h != 0.0:
        drhou = drhou + alpha_h * (rx(div, 1) - div) / dx
        drhov = drhov + alpha_h * (ry(div, 1) - div) / dy
        drhow_int = drhow_int + alpha_z * (div[1:] - div[:-1]) / dz

    zeros_f = jnp.zeros_like(drhow_int[:1])
    drhow = jnp.concatenate([zeros_f, drhow_int, zeros_f], axis=0)

    # ---- write back the valid center rows
    o_rho[...] = drho[:, hd:hd + by, :]
    o_rhou[...] = drhou[:, hd:hd + by, :]
    o_rhov[...] = drhov[:, hd:hd + by, :]
    o_rhow[...] = drhow[:, hd:hd + by, :]
    o_rhot[...] = drhot[:, hd:hd + by, :]


def dyn_tendencies_pallas(rho, rhou, rhov, rhow, rhot, p_pert, rho_ref,
                          dx: float, dy: float, dz: float,
                          kdiff4: float, alpha_h: float, alpha_z: float,
                          *, block_y: int = 8, interpret: bool = False):
    """Fused dynamics tendencies (drho, drhou, drhov, drhow, drhot) of
    dycore.tendencies (periodic lateral, uniform dz, no terrain).
    alpha_h/alpha_z: divergence-damping coefficients (0 disables)."""
    nz, ny, nx = rho.shape
    by = min(block_y, ny)
    assert ny % by == 0, "ny must be divisible by block_y"
    if not interpret:
        assert by % 8 == 0, "block_y must be a sublane-tile multiple on TPU"
    nblk = ny // by
    R = by + 2 * HD
    f32 = rho.dtype

    kernel = partial(_tendency_kernel, by=by, nblk=nblk, ny=ny, hd=HD,
                     dx=dx, dy=dy, dz=dz, kdiff4=kdiff4,
                     alpha_h=alpha_h, alpha_z=alpha_z, interpret=interpret)
    grav_ref = jnp.broadcast_to(jnp.asarray(rho_ref, f32), (nz, 1, 1))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((nz, by, nx), lambda j: (0, j, 0))
    out_spec_w = pl.BlockSpec((nz + 1, by, nx), lambda j: (0, j, 0))
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[any_spec] * 6 + [
            pl.BlockSpec((nz, 1, 1), lambda j: (0, 0, 0))],
        out_specs=(out_spec, out_spec, out_spec, out_spec_w, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nz, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, ny, nx), f32),
            jax.ShapeDtypeStruct((nz + 1, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, ny, nx), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nz, R, nx), f32),
            pltpu.VMEM((nz, R, nx), f32),
            pltpu.VMEM((nz, R, nx), f32),
            pltpu.VMEM((nz + 1, R, nx), f32),
            pltpu.VMEM((nz, R, nx), f32),
            pltpu.VMEM((nz, R, nx), f32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # 6 haloed input slabs + 5 double-buffered output blocks +
            # live stencil temporaries exceed the default 16M scoped
            # window at by=8; v5e has headroom above it
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rho, rhou, rhov, rhow, rhot, p_pert, grav_ref)


BLOCK_Y = 8   # default y-slab rows for the fused kernel (module-level so
              # benchmarks can sweep it through the config dispatcher)


def tendencies_fused(s, cfg, rho_ref, p_ref, *, block_y: int | None = None,
                     interpret: bool | None = None):
    """Drop-in for dycore.tendencies (periodic, uniform dz, no terrain):
    dynamics fields through the fused Pallas whole-tendency kernel,
    tracer advection on the XLA path (separable; r4 measured XLA faster
    for per-tracer UD3)."""
    from scale_letkf_tpu.model import dycore as dc

    if block_y is None:
        block_y = BLOCK_Y
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    cfgd = cfg
    q_mr = s.rhoq / jnp.maximum(s.rho, 1e-10)[None]
    p_pert = dc.moist_pressure(s.rhot, q_mr) - p_ref

    alpha_h = cfgd.divdmp * cfgd.dx * cfgd.dx / cfgd.dt if cfgd.divdmp > 0 \
        else 0.0
    alpha_z = cfgd.divdmp * cfgd.dz * cfgd.dz / cfgd.dt if cfgd.divdmp > 0 \
        else 0.0
    drho, drhou, drhov, drhow, drhot = dyn_tendencies_pallas(
        s.rho, s.rhou, s.rhov, s.rhow, s.rhot, p_pert, rho_ref,
        cfgd.dx, cfgd.dy, cfgd.dz, cfgd.kdiff4, alpha_h, alpha_z,
        block_y=block_y, interpret=interpret)

    # tracers: XLA UD3 path, identical to dycore.scalar_tend
    fx, fy = s.rhou, s.rhov
    fw_int = s.rhow[1:-1]

    def scalar_tend(fcen):
        phi = fcen / s.rho
        fl_x = fx * dc.ud3_face_x(phi, fx)
        fl_y = fy * dc.ud3_face_y(phi, fy)
        fl_z_int = fw_int * dc.ud3_face_z(phi, fw_int)
        zeros = jnp.zeros_like(fl_z_int[:1])
        fl_z = jnp.concatenate([zeros, fl_z_int, zeros], axis=0)
        ddx = (fl_x - dc._roll_x(fl_x, -1)) / cfgd.dx
        ddy = (fl_y - dc._roll_y(fl_y, -1)) / cfgd.dy
        ddz = (fl_z[1:] - fl_z[:-1]) / cfgd.dz
        return -(ddx + ddy + ddz) + dc.hyperdiff4(fcen, cfgd.kdiff4)

    drhoq = jax.vmap(scalar_tend)(s.rhoq)
    return dc.DycoreState(rho=drho, rhou=drhou, rhov=drhov, rhow=drhow,
                          rhot=drhot, rhoq=drhoq)
