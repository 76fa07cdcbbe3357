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


def bench_sweep(ks=(8, 50, 100, 1024), L=30):
    """letkf_core throughput sweep over reference ensemble sizes
    (MEMBER=50/100 operational configs, K=1024 big-ensemble north star —
    BASELINE.md), comparing the lax (LAPACK-style) and MXU-native Jacobi
    eigensolver backends. Returns {K: {backend: gridpoints/s}}."""
    # batch sizes keep the K×K work arrays within a few hundred MB
    bs = {8: 10_000, 50: 4096, 100: 2048, 1024: 32}
    chains = {8: (8, 208), 50: (4, 44), 100: (4, 24), 1024: (1, 3)}
    out = {}
    for K in ks:
        B = bs.get(K, 1024)
        n_lo, n_hi = chains.get(K, (2, 10))
        out[f"K{K}"] = {}
        for impl in ("lax", "jacobi"):
            if impl == "jacobi" and K % 2:
                continue
            try:
                _alarm(600)
                gps = bench_tpu(B=B, L=L, K=K, n_lo=n_lo, n_hi=n_hi,
                                reps=2, eigh_impl=impl)
                signal.alarm(0)
                out[f"K{K}"][impl] = round(gps, 1)
            except Exception:
                signal.alarm(0)
                out[f"K{K}"][impl] = None
    return out


def bench_cycle(steps=5, reps=2, platform_label=""):
    """ONE full DA cycle (ensemble forecast + obsope + set_letkf_obs +
    LETKF analysis) wall-clock on a small-but-real configuration: SI core
    (3-substep HEVI), stretched levels, conventional obs network — the
    full-cycle counterpart of BASELINE.md's north-star metric. Returns
    (seconds_per_cycle, meta dict)."""
    import jax
    import jax.numpy as jnp
    from scale_letkf_tpu.config import Config, EnsembleConfig, LetkfConfig
    from scale_letkf_tpu.grid import Grid, Projection
    from scale_letkf_tpu.cycle import CycleDriver
    from scale_letkf_tpu.model.dycore import DycoreConfig, to_collocated
    from scale_letkf_tpu.model.ideal import (
        balanced_state, add_warm_bubble, perturb_ensemble)
    from scale_letkf_tpu.da.obsmake import make_obs_network, obsmake
    from scale_letkf_tpu.state import state_trans, state_to_history

    NX = NY = 48
    NZ = 16
    DX = DY = 2000.0
    DZ0, STRETCH = 300.0, 1.08
    K = 8
    grid = Grid.stretched(nx=NX, ny=NY, nz=NZ, dx=DX, dy=DY, dz0=DZ0,
                          stretch=STRETCH, proj=Projection(kind="LC"))
    qv = 0.008 * np.exp(-grid.cz / 3000.0)
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ0, qv_prof=qv,
                                        cz=grid.cz)
    base = add_warm_bubble(s0, DZ0, DX, DY, amplitude=3.0)
    cfg = Config(ensemble=EnsembleConfig(member=K),
                 letkf=LetkfConfig(infl_mul=1.1, relax_alpha=0.5))
    cfg.letkf_obs.hori_local = tuple([40.0e3] + [-1.0] * 23)
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ0, dt=4.0, ztop=grid.ztop,
                         sponge_height=0.8 * grid.ztop, sponge_tau=120.0)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref,
                         core="si", n_small=4)
    driver.timer.sync = True

    import jax.random as jrandom
    allp = perturb_ensemble(jrandom.PRNGKey(0), base, K + 1, amplitude=0.5)
    nature = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=40,
                                levels_hpa=(900.0, 700.0, 500.0))
    fields = state_to_history(state_trans(to_collocated(nature)),
                              driver.z_full)
    obs = obsmake(fields, template, grid, cfg, driver.z_full, rng)

    # warm-up: compile forecast + analysis graphs
    ens_w = driver.forecast(ens, steps)
    driver.analysis(ens_w, obs)

    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        ens2 = driver.forecast(ens, steps)
        ens3, _ = driver.analysis(ens2, obs)
        jax.block_until_ready(ens3.rho)
        best = min(best, time.perf_counter() - t0)
    meta = {"grid": f"{NX}x{NY}x{NZ}", "members": K, "steps": steps,
            "nobs": int(obs.nobs), "core": "si",
            "platform": platform_label}
    return best, meta


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

    if "--cycle-cpu-raw" in sys.argv:
        # subprocess mode: the full DA cycle on host CPU (equal config)
        import jax
        jax.config.update("jax_platforms", "cpu")
        s, _ = bench_cycle(reps=1, platform_label="cpu")
        print(s)
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

    # ensemble-size sweep at reference scales (MEMBER=50/100, K=1024)
    sweep = None
    try:
        sweep = bench_sweep()
    except Exception:
        pass

    # full DA-cycle wall-clock (forecast + obsope + analysis), device vs
    # the same pipeline on host CPU — BASELINE.md's ≥10× cycle target
    cycle = None
    try:
        _alarm(900)
        tpu_cycle_s, meta = bench_cycle(platform_label="device")
        signal.alarm(0)
        cpu_cycle_s = None
        try:
            r = subprocess.run([sys.executable, __file__, "--cycle-cpu-raw"],
                               capture_output=True, text=True, timeout=1800)
            cpu_cycle_s = float(r.stdout.strip().splitlines()[-1])
        except Exception:
            pass
        cycle = {"device_s": round(tpu_cycle_s, 4),
                 "cpu_s": (round(cpu_cycle_s, 4)
                           if cpu_cycle_s is not None else None),
                 "speedup_vs_cpu": (round(cpu_cycle_s / tpu_cycle_s, 2)
                                    if cpu_cycle_s else None),
                 **meta}
    except Exception:
        signal.alarm(0)

    import jax
    platform = jax.devices()[0].platform
    unit = (f"gridpoints/s (K=8, nobsl=30, B=1e4, platform={platform}; "
            f"baseline=same batched pipeline on host CPU)")
    print(json.dumps({
        "metric": "letkf_analysis_gridpoints_per_s_per_chip",
        "value": round(tpu_gps, 1),
        "unit": unit,
        "vs_baseline": round(tpu_gps / cpu_gps, 2),
        "letkf_core_sweep_gridpoints_per_s": sweep,
        "da_cycle": cycle,
    }))


if __name__ == "__main__":
    main()
