"""Parallel-Jacobi eigensolver tests vs numpy/LAPACK."""

import numpy as np
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.ops.eigh_jacobi import eigh_jacobi, _round_robin_schedule


def test_schedule_covers_all_pairs():
    for K in (4, 8, 16):
        sched = _round_robin_schedule(K)
        assert sched.shape == (K - 1, K // 2, 2)
        seen = set()
        for rnd in sched:
            idx = set()
            for p, q in rnd:
                assert p < q
                idx.add(p)
                idx.add(q)
                seen.add((p, q))
            assert len(idx) == K          # disjoint within a round
        assert len(seen) == K * (K - 1) // 2  # every pair exactly once


@pytest.mark.parametrize("K", [4, 8, 20, 50])
def test_matches_lapack_spd(K):
    rng = np.random.default_rng(0)
    B = 8
    x = rng.standard_normal((B, 30, K))
    a = np.einsum("blk,blj->bkj", x, x) + (K - 1) * np.eye(K)  # LETKF-like SPD
    w, v = eigh_jacobi(jnp.asarray(a), sweeps=10)
    w_ref, _ = np.linalg.eigh(a)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-8)
    # reconstruction A = V diag(w) V^T
    rec = np.einsum("bik,bk,bjk->bij", np.asarray(v), np.asarray(w),
                    np.asarray(v))
    np.testing.assert_allclose(rec, a, rtol=1e-8, atol=1e-8)
    # orthogonality
    vtv = np.einsum("bki,bkj->bij", np.asarray(v), np.asarray(v))
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(K), vtv.shape),
                               atol=1e-9)


def test_float32_letkf_conditions():
    """f32 accuracy on the LETKF's actual matrix class at K=64."""
    rng = np.random.default_rng(1)
    K, B, L = 64, 4, 100
    x = rng.standard_normal((B, L, K)).astype(np.float32)
    a = np.einsum("blk,blj->bkj", x, x) + (K - 1) * np.eye(K, dtype=np.float32)
    a = 0.5 * (a + a.transpose(0, 2, 1))
    w, v = eigh_jacobi(jnp.asarray(a), sweeps=10)
    w_ref, _ = np.linalg.eigh(a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=2e-4)
    rec = np.einsum("bik,bk,bjk->bij", np.asarray(v, np.float64),
                    np.asarray(w, np.float64), np.asarray(v, np.float64))
    err = np.abs(rec - a).max() / np.abs(a).max()
    assert err < 5e-5, f"f32 reconstruction error {err}"


def test_letkf_core_with_jacobi_backend():
    """letkf_core invariants hold when the transform is built from the
    Jacobi eigendecomposition (swap-in check)."""
    from scale_letkf_tpu.ops.letkf_core import letkf_core
    rng = np.random.default_rng(2)
    B, L, K = 16, 30, 8
    hdxb = rng.standard_normal((B, L, K))
    rdiag = rng.uniform(0.5, 2.0, (B, L))
    rloc = rng.uniform(0.05, 1.0, (B, L))
    dep = rng.standard_normal((B, L))
    res = letkf_core(jnp.asarray(hdxb), jnp.asarray(rdiag),
                     jnp.asarray(rloc), jnp.asarray(dep), jnp.ones(B))
    # rebuild trans from the Jacobi eigh of the same Gram matrix
    a = hdxb * (rloc / rdiag)[..., None]
    c = np.einsum("blk,blj->bkj", a, hdxb) + (K - 1) * np.eye(K)
    w, v = eigh_jacobi(jnp.asarray(c), sweeps=10)
    trans = np.einsum("bik,bk,bjk->bij", np.asarray(v),
                      np.sqrt((K - 1) / np.asarray(w)), np.asarray(v))
    np.testing.assert_allclose(trans, np.asarray(res.trans), rtol=1e-6,
                               atol=1e-8)
