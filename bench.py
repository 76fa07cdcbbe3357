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
import signal
import time

import numpy as np


class _Timeout(Exception):
    pass


def _alarm(seconds: int):
    """Bound a phase with SIGALRM: a wedged accelerator tunnel hangs
    compiles indefinitely without raising."""
    def handler(signum, frame):
        raise _Timeout()
    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def bench_tpu(B=10_000, L=30, K=8, n_lo=8, n_hi=208, reps=4,
              eigh_impl="jacobi"):
    """Throughput of the full transform. Timing is to-value (a device
    reduction is fetched, so asynchronous dispatch cannot fake the number)
    and LATENCY-COMPENSATED: each call runs a dependent in-device chain of
    n iterations (every iteration sees different, iteration-salted inputs,
    so none can be elided), and the per-iteration time is the difference
    quotient between two chain lengths — host↔device round-trip latency
    (milliseconds over tunneled accelerators) cancels exactly."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from scale_letkf_tpu.ops.letkf_core import letkf_core, total_weight

    rng = np.random.default_rng(0)
    hdxb = jnp.asarray(rng.standard_normal((B, L, K)), jnp.float32)
    rdiag = jnp.asarray(rng.uniform(0.5, 2.0, (B, L)), jnp.float32)
    rloc = jnp.asarray(rng.uniform(0.05, 1.0, (B, L)), jnp.float32)
    dep = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    infl = jnp.ones(B, jnp.float32)

    @partial(jax.jit, static_argnums=6)
    def run(hdxb, rdiag, rloc, dep, infl, salt0, n):
        def body(carry, i):
            # salt EVERY input that feeds the transform — in particular hdxb,
            # so the Gram matrix + eigendecomposition (the dominant cost)
            # cannot be hoisted out of the scan as loop-invariant
            s = salt0 + 1e-6 * i.astype(jnp.float32)
            res = letkf_core(hdxb * (1.0 + s), rdiag, rloc,
                             dep + s,
                             infl, infl_update=True, eigh_impl=eigh_impl)
            w = total_weight(res.trans, res.transm, jnp.ones_like(infl))
            return carry + w.sum() * 1e-6 + res.infl.sum() * 1e-6, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return out

    def timed(n, salt0):
        t0 = time.perf_counter()
        v = float(run(hdxb, rdiag, rloc, dep, infl, salt0, n))
        return time.perf_counter() - t0, v

    timed(n_lo, 0.0)   # warm-up/compile both shapes
    timed(n_hi, 0.0)
    best = np.inf
    for r in range(reps):
        t_lo, _ = timed(n_lo, 1e-5 * r)
        t_hi, _ = timed(n_hi, 1e-5 * r + 1e-7)
        per_iter = (t_hi - t_lo) / (n_hi - n_lo)
        if per_iter > 0:
            best = min(best, per_iter)
    if not np.isfinite(best):
        raise RuntimeError("timing difference non-positive")
    return B / best


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
    import sys

    if "--cpu-raw" in sys.argv:
        # subprocess mode: measure the same batched pipeline on CPU
        import jax
        jax.config.update("jax_platforms", "cpu")
        # the CPU baseline keeps LAPACK eigh (lax) — the reference's own
        # algorithm choice and the fastest backend on CPU; the MXU-native
        # Jacobi backend is a TPU optimization
        print(bench_tpu(n_lo=2, n_hi=12, reps=2, eigh_impl="lax"))
        return

    tpu_gps = None
    for attempt in range(2):
        try:
            _alarm(240)
            tpu_gps = bench_tpu()
            signal.alarm(0)
            break
        except Exception:
            signal.alarm(0)
            time.sleep(30.0)

    # baseline: the SAME batched pipeline on this machine's CPU (a stronger
    # baseline than the reference's per-point Fortran/LAPACK loop — the
    # per-point NumPy transliteration measures ~100x slower than this)
    import subprocess
    cpu_gps = None
    try:
        r = subprocess.run([sys.executable, __file__, "--cpu-raw"],
                           capture_output=True, text=True, timeout=900)
        cpu_gps = float(r.stdout.strip().splitlines()[-1])
    except Exception:
        cpu_gps = bench_cpu_oracle()

    if tpu_gps is None:
        # accelerator unavailable (e.g. crashed tunnel): report the CPU
        # number, clearly labeled, rather than nothing
        print(json.dumps({
            "metric": "letkf_analysis_gridpoints_per_s_per_chip",
            "value": round(cpu_gps, 1),
            "unit": "gridpoints/s (K=8, nobsl=30, B=1e4, platform=cpu "
                    "FALLBACK - accelerator unavailable)",
            "vs_baseline": 1.0,
        }))
        return

    import jax
    platform = jax.devices()[0].platform
    unit = (f"gridpoints/s (K=8, nobsl=30, B=1e4, platform={platform}; "
            f"baseline=same batched pipeline on host CPU)")
    print(json.dumps({
        "metric": "letkf_analysis_gridpoints_per_s_per_chip",
        "value": round(tpu_gps, 1),
        "unit": unit,
        "vs_baseline": round(tpu_gps / cpu_gps, 2),
    }))


if __name__ == "__main__":
    main()
