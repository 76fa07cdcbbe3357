"""Benchmark: LETKF analysis + full DA-cycle performance on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

- headline: letkf transform throughput at the BASELINE.json config[0] unit
  (K=8, 30 local obs, 1e4 gridpoints), latency-compensated salted chains.
- letkf_core_sweep: reference ensemble sizes (MEMBER=50/100 operational,
  K=1024 big-ensemble north star) across eigensolver backends, with an MFU
  estimate from the algorithm's FLOP model.
- da_cycle: marginal per-cycle wall-clock of the FUSED cycle (forecast +
  H(x) + QC + LETKF as one device program, da/fastcycle.py) vs the SAME
  fused pipeline on host CPU — BASELINE.md's ≥10x cycle target.
- full_size: the flagship configs at REFERENCE size, no overrides
  (dense-radar in-core; 18-km via the host-streamed tiled executor).

Failures are REPORTED as strings in the JSON (never silently nulled).
"""

from __future__ import annotations

import json
import signal
import time

import numpy as np

V5E_BF16_PEAK = 197e12   # TPU v5e peak bf16 FLOP/s (MFU denominator)


class _Timeout(Exception):
    pass


def _alarm(seconds: int):
    """Bound a phase with SIGALRM: a wedged accelerator tunnel hangs
    compiles indefinitely without raising."""
    def handler(signum, frame):
        raise _Timeout(f"phase exceeded {seconds}s alarm")
    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def _err_str(e):
    return f"{type(e).__name__}: {str(e)[:300]}"


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
            # salt EVERY input that feeds the transform — in particular
            # hdxb, so the Gram matrix + inverse-sqrt (the dominant cost)
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
        float(run(hdxb, rdiag, rloc, dep, infl, salt0, n))
        return time.perf_counter() - t0

    timed(n_lo, 0.0)   # warm-up/compile both shapes
    timed(n_hi, 0.0)
    best = np.inf
    for r in range(reps):
        t_lo = timed(n_lo, 1e-5 * r)
        t_hi = timed(n_hi, 1e-5 * r + 1e-7)
        per_iter = (t_hi - t_lo) / (n_hi - n_lo)
        if per_iter > 0:
            best = min(best, per_iter)
    if not np.isfinite(best):
        raise RuntimeError("timing difference non-positive")
    return B / best


def _transform_flops(K, L, impl):
    """Per-gridpoint FLOP model of letkf_core: gram (2LK²) + solver +
    weight products (~4K² L-ish terms are minor; counted coarsely)."""
    gram = 2 * L * K * K
    apply_ = 4 * K * K + 2 * L * K
    if impl == "ns":
        solver = 22 * 3 * 2 * K ** 3 + 2 * 2 * K ** 3
    elif impl == "jacobi":
        solver = 8 * (K - 1) * 6 * K * K       # rowcol sweeps
    else:
        solver = 12 * K ** 3                   # eigh + reconstruction
    return gram + solver + apply_


def bench_sweep(ks=(8, 50, 100, 1024), L=30):
    """letkf_core throughput sweep over reference ensemble sizes
    (MEMBER=50/100 operational configs, K=1024 big-ensemble north star —
    BASELINE.md) across eigensolver backends ('ns' = the matmul-only
    Newton-Schulz inverse sqrt, the production default at K>16), with an
    MFU estimate vs v5e bf16 peak."""
    bs = {8: 10_000, 50: 4096, 100: 2048, 1024: 32}
    chains = {8: (8, 208), 50: (4, 44), 100: (4, 24), 1024: (1, 3)}
    out = {}
    for K in ks:
        B = bs.get(K, 1024)
        n_lo, n_hi = chains.get(K, (2, 10))
        impls = ("lax", "ns", "jacobi") if K == 8 else ("lax", "ns")
        out[f"K{K}"] = {}
        for impl in impls:
            try:
                _alarm(600)
                gps = bench_tpu(B=B, L=L, K=K, n_lo=n_lo, n_hi=n_hi,
                                reps=2, eigh_impl=impl)
                signal.alarm(0)
                out[f"K{K}"][impl] = round(gps, 1)
                out[f"K{K}"][f"{impl}_mfu_pct"] = round(
                    100.0 * gps * _transform_flops(K, L, impl)
                    / V5E_BF16_PEAK, 3)
            except Exception as e:
                signal.alarm(0)
                out[f"K{K}"][impl] = _err_str(e)
    return out


def bench_cycle(nsteps=5, platform_label=""):
    """Marginal per-cycle wall-clock of the FUSED DA cycle (ensemble
    forecast + H(x) + in-graph QC + LETKF analysis as ONE device program,
    da/fastcycle.py) on a small-but-real configuration: SI core (HEVI),
    stretched levels, conventional network with the reference BDA obs cap.
    Returns (seconds_per_cycle, meta)."""
    import jax
    from scale_letkf_tpu.config import Config, EnsembleConfig, LetkfConfig
    from scale_letkf_tpu.grid import Grid, Projection
    from scale_letkf_tpu.cycle import CycleDriver
    from scale_letkf_tpu.model.ideal import (
        balanced_state, add_warm_bubble, perturb_ensemble)
    from scale_letkf_tpu.da.obsmake import make_obs_network
    from scale_letkf_tpu.da.fastcycle import FusedCycle

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
    cfg.letkf_obs.max_nobs_per_grid = tuple([100] + [-1] * 23)
    from scale_letkf_tpu.model.dycore import DycoreConfig
    dycfg = DycoreConfig(dx=DX, dy=DY, dz=DZ0, dt=4.0, ztop=grid.ztop,
                         sponge_height=0.8 * grid.ztop, sponge_tau=120.0)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref,
                         core="si", n_small=4)

    import jax.random as jrandom
    allp = perturb_ensemble(jrandom.PRNGKey(0), base, K + 1, amplitude=0.5)
    truth0 = jax.tree.map(lambda a: a[0], allp)
    ens = jax.tree.map(lambda a: a[1:], allp)
    rng = np.random.default_rng(0)
    template = make_obs_network(grid, rng, n_profiles=40,
                                levels_hpa=(900.0, 700.0, 500.0))
    fc = FusedCycle(driver, template, nsteps=nsteps)

    n_lo, n_hi = 2, 6
    # warm-up compiles both scan lengths
    jax.block_until_ready(fc.run_osse(truth0, ens, n_lo, seed=0)[2][0])
    jax.block_until_ready(fc.run_osse(truth0, ens, n_hi, seed=0)[2][0])
    best = np.inf
    for r in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(fc.run_osse(truth0, ens, n_lo, seed=r)[2][0])
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fc.run_osse(truth0, ens, n_hi, seed=r)[2][0])
        t_hi = time.perf_counter() - t0
        per_cycle = (t_hi - t_lo) / (n_hi - n_lo)
        if per_cycle > 0:
            best = min(best, per_cycle)
    meta = {"grid": f"{NX}x{NY}x{NZ}", "members": K, "steps": nsteps,
            "nobs": int(template.nobs), "core": "si", "mode": "fused",
            "platform": platform_label}
    return best, meta


def main():
    import sys

    if "--cpu-raw" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        # the CPU baseline keeps LAPACK eigh (lax) — the reference's own
        # algorithm choice and the fastest backend on CPU; ns/jacobi are
        # TPU optimizations
        print(bench_tpu(n_lo=2, n_hi=12, reps=2, eigh_impl="lax"))
        return

    if "--cycle-cpu-raw" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        s, _ = bench_cycle(platform_label="cpu")
        print(s)
        return

    result = {}
    tpu_gps = None
    for attempt in range(2):
        try:
            _alarm(420)
            tpu_gps = bench_tpu()
            signal.alarm(0)
            result.pop("headline_error", None)   # a retry succeeded
            break
        except Exception as e:
            signal.alarm(0)
            result["headline_error"] = _err_str(e)
            time.sleep(30.0)

    # baseline: the SAME batched pipeline on this machine's CPU (a stronger
    # baseline than the reference's per-point Fortran/LAPACK loop — a
    # per-point NumPy transliteration measures ~100x slower than this)
    import subprocess
    cpu_gps = None
    try:
        r = subprocess.run([sys.executable, __file__, "--cpu-raw"],
                           capture_output=True, text=True, timeout=900)
        cpu_gps = float(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        result["cpu_baseline_error"] = _err_str(e)

    if tpu_gps is None:
        print(json.dumps({
            "metric": "letkf_analysis_gridpoints_per_s_per_chip",
            "value": round(cpu_gps, 1) if cpu_gps else None,
            "unit": "gridpoints/s (platform=cpu FALLBACK - accelerator "
                    "unavailable)",
            "vs_baseline": 1.0, **result}))
        return

    try:
        result["letkf_core_sweep_gridpoints_per_s"] = bench_sweep()
    except Exception as e:
        result["letkf_core_sweep_gridpoints_per_s"] = _err_str(e)

    # full DA-cycle wall-clock (fused forecast+obsope+analysis), device vs
    # the same fused pipeline on host CPU — BASELINE.md's ≥10x target
    try:
        _alarm(1500)
        tpu_cycle_s, meta = bench_cycle(platform_label="device")
        signal.alarm(0)
        cpu_cycle_s = None
        cycle = {"device_s": round(tpu_cycle_s, 4), **meta}
        try:
            r = subprocess.run([sys.executable, __file__,
                                "--cycle-cpu-raw"],
                               capture_output=True, text=True, timeout=1800)
            cpu_cycle_s = float(r.stdout.strip().splitlines()[-1])
            cycle["cpu_s"] = round(cpu_cycle_s, 4)
            cycle["speedup_vs_cpu"] = round(cpu_cycle_s / tpu_cycle_s, 2)
        except Exception as e:
            cycle["cpu_error"] = _err_str(e)
        result["da_cycle"] = cycle
    except Exception as e:
        signal.alarm(0)
        result["da_cycle"] = _err_str(e)

    # flagship configs at reference size (no domain_overrides)
    full = {}
    try:
        _alarm(2400)
        from scale_letkf_tpu.bench_fullsize import bench_radar_analysis
        full["radar_1km"] = bench_radar_analysis()
        signal.alarm(0)
    except Exception as e:
        signal.alarm(0)
        full["radar_1km"] = _err_str(e)
    try:
        _alarm(2400)
        from scale_letkf_tpu.bench_fullsize import bench_18km_analysis
        full["japan_18km"] = bench_18km_analysis()
        signal.alarm(0)
    except Exception as e:
        signal.alarm(0)
        full["japan_18km"] = _err_str(e)
    result["full_size"] = full

    import jax
    platform = jax.devices()[0].platform
    unit = (f"gridpoints/s (K=8, nobsl=30, B=1e4, platform={platform}; "
            f"baseline=same batched pipeline on host CPU)")
    print(json.dumps({
        "metric": "letkf_analysis_gridpoints_per_s_per_chip",
        "value": round(tpu_gps, 1),
        "unit": unit,
        "vs_baseline": (round(tpu_gps / cpu_gps, 2) if cpu_gps else None),
        **result,
    }))


if __name__ == "__main__":
    main()
