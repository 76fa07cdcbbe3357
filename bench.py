"""Benchmark: LETKF analysis throughput (gridpoints/s/chip) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches BASELINE.json configs[0] ("LETKF core unit: 8-member, 1e4
synthetic gridpoints, 30 local obs each") — the reference's per-gridpoint
letkf_core cost model is O(nobsl·K²) GEMM + O(K³) eigh
(common/common_letkf.f90:127-206). vs_baseline is measured against a NumPy
per-point implementation of the same algorithm on this machine's CPU (the
reference is Fortran+LAPACK on CPU; NumPy/LAPACK is the closest available
stand-in, measured fresh at run time).
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_tpu(B=10_000, L=30, K=8, iters=20):
    """Throughput of the full transform. Timing is to-value: the iteration
    chain ends in a device-side reduction and the wall clock includes
    fetching that scalar, so asynchronous dispatch cannot fake the number
    (and only 4 bytes cross the host link)."""
    import jax
    import jax.numpy as jnp
    from scale_letkf_tpu.ops.letkf_core import letkf_core, total_weight

    rng = np.random.default_rng(0)
    hdxb = jnp.asarray(rng.standard_normal((B, L, K)), jnp.float32)
    rdiag = jnp.asarray(rng.uniform(0.5, 2.0, (B, L)), jnp.float32)
    rloc = jnp.asarray(rng.uniform(0.05, 1.0, (B, L)), jnp.float32)
    dep = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    infl = jnp.ones(B, jnp.float32)

    @jax.jit
    def run(hdxb, rdiag, rloc, dep, infl, salt):
        res = letkf_core(hdxb, rdiag, rloc, dep + salt, infl,
                         infl_update=True)
        w = total_weight(res.trans, res.transm, jnp.ones_like(infl))
        return w.sum() + res.infl.sum()

    _ = float(run(hdxb, rdiag, rloc, dep, infl, 0.0))   # warm-up
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += float(run(hdxb, rdiag, rloc, dep, infl, 1e-7 * i))
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def bench_cpu_oracle(L=30, K=8, n_points=300):
    """Per-point NumPy implementation of the same transform (the reference's
    algorithm shape: per-gridpoint GEMM + symmetric eigendecomposition)."""
    rng = np.random.default_rng(0)
    hdxb = rng.standard_normal((n_points, L, K))
    rdiag = rng.uniform(0.5, 2.0, (n_points, L))
    rloc = rng.uniform(0.05, 1.0, (n_points, L))
    dep = rng.standard_normal((n_points, L))

    def one(b):
        a = hdxb[b] * (rloc[b] / rdiag[b])[:, None]
        c = a.T @ hdxb[b]
        c[np.diag_indices(K)] += (K - 1)
        lam, v = np.linalg.eigh(c)
        pao = (v / lam) @ v.T
        transm = pao @ (a.T @ dep[b])
        trans = (v * np.sqrt((K - 1) / lam)) @ v.T
        # inflation stats
        p1 = np.sum(dep[b] ** 2 / rdiag[b] * rloc[b])
        p2 = np.sum(a * hdxb[b]) / (K - 1)
        p3 = np.sum(rloc[b])
        w = (trans + transm[:, None])
        return w, p1 - p3 + p2

    one(0)  # warm
    t0 = time.perf_counter()
    for b in range(n_points):
        one(b)
    dt = time.perf_counter() - t0
    return n_points / dt


def main():
    tpu_gps = bench_tpu()
    cpu_gps = bench_cpu_oracle()
    print(json.dumps({
        "metric": "letkf_analysis_gridpoints_per_s_per_chip",
        "value": round(tpu_gps, 1),
        "unit": "gridpoints/s (K=8, nobsl=30, B=1e4)",
        "vs_baseline": round(tpu_gps / cpu_gps, 2),
    }))


if __name__ == "__main__":
    main()
