"""LETKF analysis driver: the batched das_letkf.

Equivalent of `das_letkf` (reference: scale/letkf/letkf_tools.f90:50-932) —
but where the reference loops (ilev, ij) gridpoints under OpenMP and calls
scalar letkf_core per point, this driver runs one jitted computation per
level over ALL horizontal points at once:

  per level: per-ctype candidate weights (vectorized obs_local_cal)
             → obs-number limit (top_k)
             → gather (dep, hdxb)
             → batched K×K letkf_core (eigh over the whole level)
             → RTPP/RTPS relaxation, boundary β damping, weight application
             → q-spread limiter, Q_UPDATE_TOP masking

The level loop is a Python loop over a jitted per-level function (weights
differ per level only through the vertical coordinate; candidate gathers are
reused across levels).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.config import Config
from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.da.letkf_obs import ObsContext
from scale_letkf_tpu.ops.letkf_core import (
    letkf_core, weight_rtpp, weight_rtps, total_weight, relax_beta,
)
from scale_letkf_tpu.ops.obs_select import (
    gather_candidates, local_weights, limit_obs_topk, gather_obs_data,
)
from scale_letkf_tpu.ops.localization import DIST_ZERO_FAC
from scale_letkf_tpu.state import IA_P, IA_Q0, NQ, NV3D


@dataclass
class AnalysisDiag:
    nobs_per_level: np.ndarray       # (nz,) mean local obs count
    infl_field: np.ndarray | None    # updated adaptive inflation (nz, ny, nx)
    rtps_field: np.ndarray | None
    nobs_field: np.ndarray | None = None  # (nz, ny, nx) local obs counts
                                          # (NOBS_OUT, letkf_tools.f90:763-798)


def _level_weights(ctx: ObsContext, cand_list, gp_x, gp_y, logp_lev, z_lev,
                   cfg: Config, dtype, vl_factors=None):
    """Per-ctype candidate weights at one level → concatenated
    (idx, rloc, rdiag) of fixed total width.

    vl_factors: optional per-ctype variable-localization factors (the
    var_local(nvar, obsgroup) multiplier of obs_local_cal,
    letkf_tools.f90:1837-1846); a factor of 0 rejects the ctype."""
    obs_x = jnp.asarray(ctx.x, dtype)
    obs_y = jnp.asarray(ctx.y, dtype)
    obs_vert = jnp.asarray(ctx.vert, dtype)
    obs_err = jnp.asarray(ctx.err, dtype)

    idx_all, rloc_all, rdiag_all = [], [], []
    for ic, (ct, cand) in enumerate(zip(ctx.ctypes, cand_list)):
        fac = 1.0 if vl_factors is None else float(vl_factors[ic])
        gp_vert = z_lev if ct.vert_kind == "z" else logp_lev
        nd2, rloc, rdiag = local_weights(
            cand, obs_x, obs_y, obs_vert, obs_err,
            gp_x, gp_y, gp_vert, ct.hori_scale, ct.vert_scale,
            var_local_factor=fac)
        if fac <= 0.0:
            rloc = jnp.zeros_like(rloc)
            rdiag = jnp.ones_like(rdiag)
        if ct.max_nobs > 0:
            idx_k, rloc_k, rdiag_k = limit_obs_topk(
                cand, nd2, rloc, rdiag, ct.max_nobs,
                cfg.letkf_obs.max_nobs_per_grid_criterion)
        else:
            idx_k = jnp.where(rloc > 0, cand, -1)
            rloc_k, rdiag_k = rloc, rdiag
        idx_all.append(idx_k)
        rloc_all.append(rloc_k)
        rdiag_all.append(rdiag_k)
    return (jnp.concatenate(idx_all, axis=-1),
            jnp.concatenate(rloc_all, axis=-1),
            jnp.concatenate(rdiag_all, axis=-1))


def analyze(
    gues: jax.Array,              # (K, NV3D, nz, ny, nx) analysis variables
    ctx: ObsContext,
    cfg: Config,
    grid: Grid,
    z_full: jax.Array,            # (nz, ny, nx) heights
    infl_field: jax.Array | None = None,   # (nz, ny, nx); None → INFL_MUL
    gues_det: jax.Array | None = None,     # (NV3D, nz, ny, nx) deterministic
) -> tuple[jax.Array, jax.Array | None, AnalysisDiag]:
    """Analysis update. Returns (anal, anal_det, diag)."""
    K, nv, nz, ny, nx = gues.shape
    dtype = gues.dtype
    B = ny * nx

    mean = jnp.mean(gues, axis=0)
    pert = gues - mean[None]

    if infl_field is None:
        infl0 = jnp.full((nz, ny, nx), cfg.letkf.infl_mul, dtype)
    else:
        infl0 = jnp.asarray(infl_field, dtype)

    # gridpoint coordinates in projection space
    xs, ys = grid.xy
    gp_x = jnp.asarray(np.broadcast_to(xs[None, :], (ny, nx)).reshape(-1), dtype)
    gp_y = jnp.asarray(np.broadcast_to(ys[:, None], (ny, nx)).reshape(-1), dtype)

    # per-ctype candidate gathers (level-independent)
    cand_list = [gather_candidates(ct.buckets, gp_x, gp_y)
                 for ct in ctx.ctypes]

    dep_g = jnp.asarray(ctx.dep, dtype)
    hdxb_g = jnp.asarray(ctx.hdxb, dtype)
    depd_g = jnp.asarray(ctx.depd, dtype) if ctx.depd is not None else None

    logp_mean = jnp.log(jnp.maximum(mean[IA_P], 1e-3))

    adaptive = cfg.letkf.infl_mul_adaptive or cfg.letkf.infl_mul <= 0

    # variable-localization groups: model variables sharing the same column
    # of the var_local table share one transform (the reference's
    # var_local_n2n dedup, letkf_tools.f90:129-163)
    vl_table = cfg.var_local.table(nv)            # (9, nv)
    cols = [tuple(vl_table[:, v]) for v in range(nv)]
    unique_cols = list(dict.fromkeys(cols))
    group_of_var = np.asarray([unique_cols.index(c) for c in cols])
    group_vars = [np.nonzero(group_of_var == g)[0]
                  for g in range(len(unique_cols))]
    group_factors = [
        [col[ct.varlocal_group] for ct in ctx.ctypes]
        for col in unique_cols]
    trivial = len(unique_cols) == 1 and all(
        f == 1.0 for f in group_factors[0])

    @jax.jit
    def level_update(pert_lev, mean_lev, infl_lev, logp_lev, z_lev,
                     pert_det_lev, mean_det_lev):
        """One level: pert_lev (K, nv, B), mean_lev (nv, B), infl (B)."""
        # boundary-buffer β (periodic domains: no boundary → β = 1)
        if cfg.letkf.boundary_buffer_width > 0:
            dist_x = jnp.minimum(gp_x - xs[0], xs[-1] - gp_x)
            dist_y = jnp.minimum(gp_y - ys[0], ys[-1] - gp_y)
            beta = relax_beta(jnp.minimum(dist_x, dist_y), z_lev,
                              buffer_width=cfg.letkf.boundary_buffer_width)
        else:
            beta = jnp.ones(B, dtype)

        pert_vbk = jnp.transpose(pert_lev, (1, 2, 0))  # (nv, B, K)
        mean_vb = mean_lev                             # (nv, B)
        parm = infl_lev if cfg.letkf.relax_to_inflated_prior \
            else jnp.ones_like(infl_lev)

        anal_parts = [None] * nv
        det_parts = [None] * nv if pert_det_lev is not None else None
        infl_out = None
        nobs_mean = None

        for g, vidx in enumerate(group_vars):
            idx, rloc, rdiag = _level_weights(
                ctx, cand_list, gp_x, gp_y, logp_lev, z_lev, cfg, dtype,
                vl_factors=None if trivial else group_factors[g])
            dep, hdxb = gather_obs_data(idx, dep_g, hdxb_g)
            if depd_g is not None:
                depd, _ = gather_obs_data(idx, depd_g, hdxb_g)
            else:
                depd = None
            res = letkf_core(hdxb, rdiag, rloc, dep, infl_lev,
                             rdiag_wloc=True,
                             infl_update=adaptive and g == 0,
                             depd=depd,
                             min_infl=max(cfg.letkf.infl_mul_min, 0.0))
            if g == 0:
                infl_out = res.infl
                nobs_point = jnp.sum(rloc > 0, axis=-1)
                nobs_mean = jnp.mean(nobs_point.astype(dtype))

            pert_g = pert_vbk[vidx]                 # (nvg, B, K)
            if cfg.letkf.relax_alpha != 0.0:
                trans_rlx = weight_rtpp(res.trans, parm,
                                        cfg.letkf.relax_alpha)
                w_tot = total_weight(trans_rlx, res.transm, beta)
                anal_g = mean_vb[vidx][..., None] + jnp.einsum(
                    "vbk,bkm->vbm", pert_g, w_tot,
                    preferred_element_type=dtype)
            elif cfg.letkf.relax_alpha_spread != 0.0:
                # RTPS is per-variable (xb = that variable's K perturbations)
                trans_all, _ = jax.vmap(
                    lambda xb: weight_rtps(res.trans, res.pao, xb, parm,
                                           cfg.letkf.relax_alpha_spread))(
                    pert_g)
                w_tots = jax.vmap(
                    lambda tv: total_weight(tv, res.transm, beta))(trans_all)
                anal_g = mean_vb[vidx][..., None] + jnp.einsum(
                    "vbk,vbkm->vbm", pert_g, w_tots,
                    preferred_element_type=dtype)
            else:
                w_tot = total_weight(res.trans, res.transm, beta)
                anal_g = mean_vb[vidx][..., None] + jnp.einsum(
                    "vbk,bkm->vbm", pert_g, w_tot,
                    preferred_element_type=dtype)

            for j, v in enumerate(vidx):
                anal_parts[int(v)] = anal_g[j]

            # deterministic member update (letkf_tools.f90:489-497)
            if pert_det_lev is not None:
                incr = jnp.einsum("vbk,bk->vb", pert_g, res.transmd,
                                  preferred_element_type=dtype)
                det_g = mean_det_lev[vidx] + incr * beta[None, :]
                for j, v in enumerate(vidx):
                    det_parts[int(v)] = det_g[j]

        anal_vbk = jnp.stack(anal_parts, axis=0)
        anal_det = (jnp.stack(det_parts, axis=0)
                    if pert_det_lev is not None else None)
        return anal_vbk, infl_out, anal_det, nobs_mean, nobs_point

    anal_levels = []
    anal_det_levels = [] if gues_det is not None else None
    infl_levels = []
    nobs_levels = []
    nobs_fields = [] if cfg.letkf.nobs_out else None
    z2 = jnp.asarray(z_full, dtype)
    for k in range(nz):
        pert_lev = pert[:, :, k].reshape(K, nv, B)
        mean_lev = mean[:, k].reshape(nv, B)
        infl_lev = infl0[k].reshape(B)
        logp_lev = logp_mean[k].reshape(B)
        z_lev = z2[k].reshape(B)
        if gues_det is not None:
            pert_det = (gues_det[:, k] - mean[:, k]).reshape(nv, B)
            mean_det = gues_det[:, k].reshape(nv, B)
        else:
            pert_det = None
            mean_det = None
        anal_vb, infl_new, anal_det_vb, nobs_mean, nobs_pt = level_update(
            pert_lev, mean_lev, infl_lev, logp_lev, z_lev, pert_det, mean_det)
        anal_levels.append(anal_vb.reshape(nv, ny, nx, K))
        infl_levels.append(infl_new.reshape(ny, nx))
        nobs_levels.append(float(nobs_mean))
        if nobs_fields is not None:
            nobs_fields.append(np.asarray(nobs_pt).reshape(ny, nx))
        if gues_det is not None:
            anal_det_levels.append(anal_det_vb.reshape(nv, ny, nx))

    anal = jnp.stack(anal_levels, axis=1)            # (nv, nz, ny, nx, K)
    anal = jnp.moveaxis(anal, -1, 0)                 # (K, nv, nz, ny, nx)
    infl_out = jnp.stack(infl_levels, axis=0)

    # Q_UPDATE_TOP: keep the first guess for moisture above the level where
    # mean p < Q_UPDATE_TOP (letkf_tools.f90:371)
    if cfg.letkf.q_update_top > 0:
        qmask = (mean[IA_P] < cfg.letkf.q_update_top)[None, None]
        var_is_q = jnp.arange(nv)[None, :, None, None, None] >= IA_Q0
        anal = jnp.where(qmask[None] & var_is_q, gues, anal)

    # q-spread limiter (letkf_tools.f90:500-513): spread/mean ≤ Q_SPRD_MAX
    if cfg.letkf.q_sprd_max > 0:
        q = anal[:, IA_Q0]
        q_mean = jnp.mean(q, axis=0)
        q_pert = q - q_mean[None]
        q_sprd = jnp.sqrt(jnp.sum(q_pert**2, axis=0) / (K - 1)) \
            / jnp.maximum(jnp.abs(q_mean), 1e-30)
        scale = jnp.where(q_sprd > cfg.letkf.q_sprd_max,
                          cfg.letkf.q_sprd_max / jnp.maximum(q_sprd, 1e-30),
                          1.0)
        anal = anal.at[:, IA_Q0].set(q_mean[None] + q_pert * scale[None])

    anal_det_out = (jnp.stack(anal_det_levels, axis=1)
                    if gues_det is not None else None)

    diag = AnalysisDiag(
        nobs_per_level=np.asarray(nobs_levels),
        infl_field=np.asarray(infl_out) if adaptive else None,
        rtps_field=None,
        nobs_field=(np.stack(nobs_fields, axis=0)
                    if nobs_fields is not None else None))
    return anal, anal_det_out, diag
