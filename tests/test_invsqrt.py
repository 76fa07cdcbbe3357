"""Newton–Schulz inverse-sqrt backend: accuracy vs eigh, and letkf_core
'ns' backend parity vs the 'lax' eigendecomposition path (SURVEY.md §4a)."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.ops.invsqrt import invsqrt_newton_schulz
from scale_letkf_tpu.ops.letkf_core import letkf_core


def _spd_batch(rng, B, K, scale):
    h = rng.standard_normal((B, 40, K))
    s = np.einsum("blk,blj->bkj", h, h) * (scale / 40)
    return s + (K - 1) * np.eye(K)


def test_invsqrt_matches_eigh():
    rng = np.random.default_rng(0)
    for K, scale in [(7, 5.0), (50, 200.0), (100, 1000.0)]:
        c = _spd_batch(rng, 8, K, scale)
        isq, inv = invsqrt_newton_schulz(jnp.asarray(c))
        w, v = np.linalg.eigh(c)
        isq_ref = np.einsum("bik,bk,bjk->bij", v, 1.0 / np.sqrt(w), v)
        inv_ref = np.einsum("bik,bk,bjk->bij", v, 1.0 / w, v)
        np.testing.assert_allclose(np.asarray(isq), isq_ref,
                                   atol=1e-8 * scale)
        np.testing.assert_allclose(np.asarray(inv), inv_ref,
                                   atol=1e-8)


def test_invsqrt_identity_exact():
    # zero-obs LETKF case: C = s·I must give exactly s^{-1/2}·I, s^{-1}·I
    K = 12
    s = 11.0 / 1.25
    c = jnp.broadcast_to(s * jnp.eye(K), (4, K, K))
    isq, inv = invsqrt_newton_schulz(c)
    np.testing.assert_allclose(np.asarray(isq),
                               np.broadcast_to(np.eye(K) / np.sqrt(s),
                                               (4, K, K)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(inv),
                               np.broadcast_to(np.eye(K) / s, (4, K, K)),
                               atol=1e-12)


def test_letkf_core_ns_pallas_matches_lax():
    """Fused-VMEM Pallas NS backend parity (runs on TPU only; the suite's
    CPU runs skip it — the kernel was hardware-validated to ~1e-5 vs f64
    eigh across cond 1e2-1e4 and NaN-free to 1e6, see ops/invsqrt.py)."""
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("ns_pallas requires a TPU backend")
    rng = np.random.default_rng(3)
    B, L, K = 64, 30, 50
    hdxb = rng.standard_normal((B, L, K)).astype(np.float32)
    rdiag = rng.uniform(0.5, 2.0, (B, L)).astype(np.float32)
    rloc = rng.uniform(0.0, 1.0, (B, L)).astype(np.float32)
    rloc[:4] = 0.0              # zero-obs rows
    dep = rng.standard_normal((B, L)).astype(np.float32)
    infl = np.full(B, 1.1, np.float32)
    args = (jnp.asarray(hdxb), jnp.asarray(rdiag), jnp.asarray(rloc),
            jnp.asarray(dep), jnp.asarray(infl))
    r_lax = letkf_core(*args, infl_update=True, eigh_impl="lax")
    r_pal = letkf_core(*args, infl_update=True, eigh_impl="ns_pallas")
    scale = float(np.abs(np.asarray(r_lax.trans)).max())
    np.testing.assert_allclose(np.asarray(r_pal.trans),
                               np.asarray(r_lax.trans),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(r_pal.transm),
                               np.asarray(r_lax.transm), atol=1e-3)


def test_letkf_core_ns_matches_lax():
    rng = np.random.default_rng(2)
    B, L, K = 16, 30, 20
    hdxb = rng.standard_normal((B, L, K))
    rdiag = rng.uniform(0.5, 2.0, (B, L))
    rloc = rng.uniform(0.0, 1.0, (B, L))
    rloc[:, 20:] = 0.0          # padded slots
    dep = rng.standard_normal((B, L))
    infl = np.full(B, 1.1)
    args = (jnp.asarray(hdxb), jnp.asarray(rdiag), jnp.asarray(rloc),
            jnp.asarray(dep), jnp.asarray(infl))
    r_lax = letkf_core(*args, infl_update=True, eigh_impl="lax")
    r_ns = letkf_core(*args, infl_update=True, eigh_impl="ns")
    np.testing.assert_allclose(np.asarray(r_ns.trans),
                               np.asarray(r_lax.trans), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_ns.transm),
                               np.asarray(r_lax.transm), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_ns.pao),
                               np.asarray(r_lax.pao), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_ns.infl),
                               np.asarray(r_lax.infl), atol=1e-9)
