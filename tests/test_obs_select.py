"""Local obs selection tests: bucket coverage vs brute force, top-k limit."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.ops.localization import (
    DIST_ZERO_FAC, gauss_taper, gaspari_cohn,
)
from scale_letkf_tpu.ops.obs_select import (
    build_buckets, gather_candidates, local_weights, limit_obs_topk,
    gather_obs_data,
)


def brute_force_weights(gx, gy, gv, ox, oy, ov, oe, hs, vs):
    """Reference selection: all obs, exact cutoff tests (obs_local_cal)."""
    nd_h2 = ((gx[:, None] - ox) ** 2 + (gy[:, None] - oy) ** 2) / hs**2
    nd_v2 = (np.abs(gv[:, None] - ov) / vs) ** 2 if vs > 0 else 0 * nd_h2
    nd2 = nd_h2 + nd_v2
    cut = DIST_ZERO_FAC**2
    rloc = np.exp(-0.5 * nd2)
    rloc[(nd_h2 > cut) | (nd_v2 > cut) | (nd2 > cut)] = 0.0
    return nd2, rloc


def test_bucket_selection_matches_brute_force():
    rng = np.random.default_rng(0)
    nobs = 500
    L = 200.0e3   # domain size [m]
    hs = 20.0e3   # horizontal localization scale
    ox = rng.uniform(0, L, nobs)
    oy = rng.uniform(0, L, nobs)
    ov = rng.uniform(0, 10e3, nobs)
    oe = rng.uniform(0.5, 2.0, nobs)
    vs = 2000.0

    cutoff = hs * DIST_ZERO_FAC
    grid = build_buckets(ox, oy, 0.0, 0.0, L, L, cutoff)
    assert grid.n_dropped == 0

    B = 40
    gx = rng.uniform(0, L, B)
    gy = rng.uniform(0, L, B)
    gv = rng.uniform(0, 10e3, B)

    cand = gather_candidates(grid, jnp.asarray(gx), jnp.asarray(gy))
    nd2, rloc, rdiag = local_weights(
        cand, jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(ov),
        jnp.asarray(oe), jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gv),
        hs, vs)

    nd2_bf, rloc_bf = brute_force_weights(gx, gy, gv, ox, oy, ov, oe, hs, vs)
    cand_np = np.asarray(cand)
    rloc_np = np.asarray(rloc)
    for b in range(B):
        # every obs with nonzero weight must be among candidates with the
        # exact same weight
        sel = {}
        for c in range(cand_np.shape[1]):
            if cand_np[b, c] >= 0 and rloc_np[b, c] > 0:
                sel[int(cand_np[b, c])] = rloc_np[b, c]
        expected = {i: rloc_bf[b, i] for i in range(nobs) if rloc_bf[b, i] > 0}
        assert set(sel) == set(expected), f"gridpoint {b}"
        for i, w in expected.items():
            np.testing.assert_allclose(sel[i], w, rtol=1e-12)
        # rdiag = err²/rloc for selected
        for c in range(cand_np.shape[1]):
            i = cand_np[b, c]
            if i >= 0 and rloc_np[b, c] > 0:
                np.testing.assert_allclose(
                    rdiag[b, c], oe[i] ** 2 / rloc_np[b, c], rtol=1e-12)


def test_no_vertical_localization():
    ox = np.asarray([0.0]); oy = np.asarray([0.0])
    ov = np.asarray([1e9])  # absurd vertical distance must be ignored
    oe = np.asarray([1.0])
    grid = build_buckets(ox, oy, -1e3, -1e3, 1e3, 1e3, 1e4)
    cand = gather_candidates(grid, jnp.zeros(1), jnp.zeros(1))
    _, rloc, _ = local_weights(cand, jnp.asarray(ox), jnp.asarray(oy),
                               jnp.asarray(ov), jnp.asarray(oe),
                               jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                               1e3, 0.0)
    assert float(np.asarray(rloc).max()) == 1.0


def test_topk_limit_selects_nearest():
    rng = np.random.default_rng(1)
    nobs = 100
    ox = rng.uniform(-50e3, 50e3, nobs)
    oy = rng.uniform(-50e3, 50e3, nobs)
    ov = np.zeros(nobs)
    oe = np.ones(nobs)
    hs = 30e3
    grid = build_buckets(ox, oy, -50e3, -50e3, 50e3, 50e3, hs * DIST_ZERO_FAC)
    gx = jnp.zeros(1); gy = jnp.zeros(1); gv = jnp.zeros(1)
    cand = gather_candidates(grid, gx, gy)
    nd2, rloc, rdiag = local_weights(cand, jnp.asarray(ox), jnp.asarray(oy),
                                     jnp.asarray(ov), jnp.asarray(oe),
                                     gx, gy, gv, hs, 0.0)
    k = 10
    idx, rloc_k, rdiag_k = limit_obs_topk(cand, nd2, rloc, rdiag, k)
    # expected: k nearest obs by distance
    d = np.hypot(ox, oy)
    order = np.argsort(d)
    in_range = order[d[order] <= hs * DIST_ZERO_FAC][:k]
    got = set(int(i) for i in np.asarray(idx[0]) if i >= 0)
    assert got == set(int(i) for i in in_range)
    # weights are consistent
    for c, i in enumerate(np.asarray(idx[0])):
        if i >= 0:
            np.testing.assert_allclose(
                rloc_k[0, c], np.exp(-0.5 * (d[i] / hs) ** 2), rtol=1e-12)


def test_topk_pad_when_fewer_obs():
    ox = np.asarray([0.0, 1.0]); oy = np.asarray([0.0, 1.0])
    grid = build_buckets(ox, oy, -10, -10, 10, 10, 100.0)
    cand = gather_candidates(grid, jnp.zeros(1), jnp.zeros(1))
    nd2, rloc, rdiag = local_weights(
        cand, jnp.asarray(ox), jnp.asarray(oy), jnp.zeros(2), jnp.ones(2),
        jnp.zeros(1), jnp.zeros(1), jnp.zeros(1), 100.0, 0.0)
    idx, rloc_k, rdiag_k = limit_obs_topk(cand, nd2, rloc, rdiag, 50)
    assert idx.shape == (1, 50)
    assert (np.asarray(idx[0]) >= 0).sum() == 2
    assert np.asarray(rloc_k)[0, (np.asarray(idx[0]) < 0)].max() == 0.0


def test_gather_obs_data_padding():
    dep = jnp.asarray([1.0, 2.0, 3.0])
    ens = jnp.asarray([[1., 2.], [3., 4.], [5., 6.]])
    idx = jnp.asarray([[2, -1], [0, 1]])
    d, h = gather_obs_data(idx, dep, ens)
    np.testing.assert_allclose(d, [[3.0, 0.0], [1.0, 2.0]])
    np.testing.assert_allclose(h[0, 1], [0.0, 0.0])
    np.testing.assert_allclose(h[1, 1], [3.0, 4.0])


def test_gaspari_cohn_shape():
    r = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 2.5])
    w = np.asarray(gaspari_cohn(r))
    assert w[0] == 1.0
    assert np.all(np.diff(w) <= 1e-12)
    np.testing.assert_allclose(w[4], 0.0, atol=1e-12)
    assert w[5] == 0.0


def test_gauss_taper_cutoff():
    nd2 = jnp.asarray([0.0, 1.0, DIST_ZERO_FAC**2 * 1.01])
    w = np.asarray(gauss_taper(nd2))
    assert w[0] == 1.0 and w[2] == 0.0
    np.testing.assert_allclose(w[1], np.exp(-0.5))
