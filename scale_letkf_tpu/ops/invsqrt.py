"""Batched SPD inverse square root via coupled Newton–Schulz iteration.

TPU-native replacement for the eigendecomposition inside the LETKF
transform. The reference diagonalizes the K×K ensemble-space Gram matrix
per gridpoint (EISPACK `rs`, common/common_mtx.f90:41) and then forms
  Pa   = V Λ⁻¹ Vᵀ        = C⁻¹
  W    = V √((K-1)Λ⁻¹) Vᵀ = √(K-1) · C^{-1/2}
(common/common_letkf.f90:151-206) — i.e. the algorithm never needs the
eigenpairs themselves, only the inverse and the inverse square root of an
SPD matrix. On TPU a batched eigendecomposition is the worst-shaped op in
the whole analysis (sequential QR/Jacobi sweeps, tiny non-MXU kernels),
while the inverse square root has a classic matmul-only algorithm: the
coupled Newton–Schulz iteration (Higham, "Functions of Matrices", §6.3;
stable, unlike uncoupled Newton):

  A = C / c                      (c ≥ λ_max : Gershgorin row-sum bound)
  Y₀ = A, Z₀ = I
  T_k = (3I − Z_k Y_k)/2 ;  Y_{k+1} = Y_k T_k ;  Z_{k+1} = T_k Z_k
  Y_k → A^{1/2},  Z_k → A^{-1/2}

Every step is three batched K×K matmuls — pure MXU work. Convergence: with
eigenvalues of A in (0, 1], the scalar error map is p ← p(3−p)²/4 (p = z·y
eigenvalue product), which grows small p by ×2.25 per step and then
converges quadratically near 1, so the sweep count is
~log(cond)/log(2.25) + 5. The LETKF Gram matrix C = HδXᵀR⁻¹HδX + (K-1)/ρ·I
has cond ≈ 1 + ρ/(K-1)·λ_max(S) ~ Σ_l ρ_loc(spread/err)² — a few hundred
even for dense radar volumes — so the default 22 iterations reach float32
accuracy with large margin (validated against jnp.linalg.eigh in
tests/test_invsqrt.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iters",))
def invsqrt_newton_schulz(c_mat: jax.Array, iters: int = 22):
    """Batched inverse square root + inverse of an SPD matrix.

    Args:
      c_mat: (..., K, K) symmetric positive definite.
      iters: Newton–Schulz sweeps (static). 22 covers cond ≲ 1e5 at float32.

    Returns:
      (inv_sqrt, inv): (..., K, K) arrays with inv_sqrt ≈ C^{-1/2} and
      inv ≈ C^{-1} (both symmetric).
    """
    K = c_mat.shape[-1]
    dtype = c_mat.dtype
    # Gershgorin upper bound on λ_max; also bounds the spectrum into (0, 1]
    # after normalization. For SPD matrices max row-sum ≥ λ_max.
    c = jnp.max(jnp.sum(jnp.abs(c_mat), axis=-1), axis=-1)
    c = jnp.maximum(c, jnp.finfo(dtype).tiny)
    a = c_mat / c[..., None, None]

    eye = jnp.eye(K, dtype=dtype)
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=dtype)

    def body(i, carry):
        y, z = carry
        t = 1.5 * eye - 0.5 * mm(z, y)
        return mm(y, t), mm(t, z)

    y0 = a
    z0 = jnp.broadcast_to(eye, a.shape)
    _, z = jax.lax.fori_loop(0, iters, body, (y0, z0))

    # un-normalize: C^{-1/2} = A^{-1/2}/√c ; C^{-1} = A^{-1}/c
    rsqrt_c = jax.lax.rsqrt(c)[..., None, None]
    inv_sqrt = z * rsqrt_c
    inv_sqrt = 0.5 * (inv_sqrt + jnp.swapaxes(inv_sqrt, -1, -2))
    inv = mm(inv_sqrt, inv_sqrt)
    inv = 0.5 * (inv + jnp.swapaxes(inv, -1, -2))
    return inv_sqrt, inv


# ---------------------------------------------------------------------------
# Fused Pallas kernel: the whole NS iteration in VMEM
# ---------------------------------------------------------------------------
#
# The XLA path above round-trips Y/Z/T through HBM every iteration and is
# latency-bound on the tiny batched K×K matmuls (measured v5e, K=50,
# B=4096: 27.6 ms/solve-batch ≈ 190 GB/s effective, <1% MFU). The fused
# kernel keeps the iteration entirely in VMEM: HBM traffic drops to one
# read + two writes TOTAL, and the MXU runs back-to-back passes.
#
# Numerics (measured on v5e, rank-deficient LETKF-shaped Grams):
#   phase 1: bf16x3 split-operand products (3 MXU passes ≈ f32 to ~2e-5)
#            on a REGULARIZED matrix whose spectrum is floored at
#            EIG_FLOOR of λ_max — pure-bf16 phases NaN when normalized
#            eigenvalues reach the bf16x3 noise (~1.5e-5); the floor makes
#            the phase unconditionally convergent. The floor uses the
#            EXACT lower bound λ_min(C) ≥ (K-1)/ρ (the inflation shift:
#            C = HδXᵀR⁻¹HδX·rloc + (K-1)/ρ·I with the first term PSD), so
#            well-conditioned matrices (cond ≤ 1/EIG_FLOOR) are untouched.
#   phase 2: re-anchor the coupled invariant Y = A·Z (exact by
#            construction) on the TRUE matrix and polish with HIGHEST
#            (6-pass f32) iterations.
# Accuracy vs f64 eigh: ~2e-5 (cond 1e2) → ~1e-4 (1e3) → ~9e-4 (1e4);
# graceful, NaN-free beyond. Production LETKF Grams measure cond ≲ 1e3.
# Throughput at K=50, B=4096: ~290k solves/s vs 102k (XLA HIGHEST/22) —
# 2.8×; the pure-bf16 variant reaches 656k but floors at 1.3e-2 error
# (the coupled iteration has neutral error modes along its invariant
# manifold, so polish cannot remove phase-1 error below its floor).

EIG_FLOOR = 1e-4       # phase-1 spectrum floor (fraction of λ_max bound)


def _bdot(x, w, prec):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)


def _bdot3(x, w):
    """bf16x3 batched matmul: split-operand 3-pass ≈ lax.Precision.HIGH,
    which Mosaic does not expose in-kernel."""
    DEF = jax.lax.Precision.DEFAULT
    xh = x.astype(jnp.bfloat16).astype(jnp.float32)
    xl = (x - xh).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16).astype(jnp.float32)
    wl = (w - wh).astype(jnp.bfloat16)
    xhb = xh.astype(jnp.bfloat16)
    whb = wh.astype(jnp.bfloat16)
    return (_bdot(xhb, whb, DEF) + _bdot(xhb, wl, DEF)
            + _bdot(xl, whb, DEF))


def _ns_fused_kernel(it_lo, it_hi, a_ref, areg_ref, isq_ref, inv_ref):
    HI = jax.lax.Precision.HIGHEST
    a = a_ref[:]
    areg = areg_ref[:]
    kp = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(kp, dtype=a.dtype), a.shape)

    def body3(i, carry):
        y, z = carry
        t = 1.5 * eye - 0.5 * _bdot3(z, y)
        return _bdot3(y, t), _bdot3(t, z)

    _, z = jax.lax.fori_loop(0, it_lo, body3, (areg, eye))
    # re-anchor Y = A·Z on the true matrix, then quadratic polish
    y = _bdot(a, z, HI)

    def bodyh(i, carry):
        y, z = carry
        t = 1.5 * eye - 0.5 * _bdot(z, y, HI)
        return _bdot(y, t, HI), _bdot(t, z, HI)

    _, z = jax.lax.fori_loop(0, it_hi, bodyh, (y, z))
    z = 0.5 * (z + jnp.swapaxes(z, -1, -2))
    isq_ref[:] = z
    inv_ref[:] = _bdot(z, z, HI)


def _power_bound(c_mat, iters: int = 8):
    """Per-matrix λ_max estimate: power iteration (tight, unlike
    Gershgorin's up-to-K× overestimate) ×1.05, FLOORED at Gershgorin/2.9.

    The floor is what makes this safe: NS converges for normalized
    spectrum in (0, 3), and a power start vector near-orthogonal to the
    top eigenvector can underestimate λ_max badly (observed on real radar
    Grams — 16 NaN analysis points at 48x48x16 K=50). Since
    gersh ≥ λ_max always, c ≥ gersh/2.9 guarantees λ_max/c ≤ 2.9 < 3
    regardless of the power estimate."""
    HI = jax.lax.Precision.HIGHEST
    gersh = jnp.max(jnp.sum(jnp.abs(c_mat), axis=-1), axis=-1)
    v = jnp.ones(c_mat.shape[:-1], c_mat.dtype)[..., None]
    for _ in range(iters):
        v = jnp.matmul(c_mat, v, precision=HI)
        v = v / jnp.linalg.norm(v, axis=-2, keepdims=True)
    w = jnp.matmul(c_mat, v, precision=HI)
    power = jnp.linalg.norm(w, axis=(-2, -1))
    return jnp.maximum(1.05 * power, gersh / 2.9)


def invsqrt_ns_pallas(
    c_mat: jax.Array,         # (..., K, K) SPD (float32)
    smin: jax.Array,          # (...,) EXACT lower bound on λ_min (the
                              # LETKF inflation shift (K-1)/ρ; pass 0 for
                              # "unknown" — phase 1 then always floors)
    it_lo: int = 18,
    it_hi: int = 2,
    block: int = 32,
):
    """Fused-VMEM batched inverse square root + inverse (TPU Pallas).

    Returns (inv_sqrt, inv) like invsqrt_newton_schulz. K is padded to a
    multiple of 64 block-diagonally with identity (exact). Leading batch
    dims are flattened and padded to the block size."""
    from functools import partial as _partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *lead, K, _ = c_mat.shape
    dtype = c_mat.dtype
    B = int(np.prod(lead)) if lead else 1
    c_flat = c_mat.reshape(B, K, K)
    smin_flat = jnp.broadcast_to(jnp.asarray(smin, dtype), tuple(lead)
                                 ).reshape(B) if lead else \
        jnp.broadcast_to(jnp.asarray(smin, dtype), (1,))

    kp = -(-K // 64) * 64
    bb = min(block, 8 if kp > 64 else 32)
    Bp = -(-B // bb) * bb

    c = jnp.maximum(_power_bound(c_flat), jnp.finfo(dtype).tiny)
    a = c_flat / c[..., None, None]
    m = smin_flat / c
    bump = jnp.maximum(EIG_FLOOR - m, 0.0)
    areg = a + bump[..., None, None] * jnp.eye(K, dtype=dtype)[None]
    if kp > K:
        pad_eye = jnp.pad(jnp.eye(kp - K, dtype=dtype),
                          ((K, 0), (K, 0)))[None]
        a = jnp.pad(a, ((0, 0), (0, kp - K), (0, kp - K))) + pad_eye
        areg = jnp.pad(areg, ((0, 0), (0, kp - K), (0, kp - K))) + pad_eye
    if Bp > B:
        # batch padding: identity matrices (NS fixed point, harmless)
        pad_i = jnp.broadcast_to(jnp.eye(kp, dtype=dtype),
                                 (Bp - B, kp, kp))
        a = jnp.concatenate([a, pad_i], axis=0)
        areg = jnp.concatenate([areg, pad_i], axis=0)

    spec = pl.BlockSpec((bb, kp, kp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    isq, inv = pl.pallas_call(
        _partial(_ns_fused_kernel, it_lo, it_hi),
        grid=(Bp // bb,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((Bp, kp, kp), dtype),) * 2,
    )(a, areg)
    isq = isq[:B, :K, :K] * jax.lax.rsqrt(c)[..., None, None]
    inv = inv[:B, :K, :K] / c[..., None, None]
    out_shape = tuple(lead) + (K, K)
    return isq.reshape(out_shape), inv.reshape(out_shape)
