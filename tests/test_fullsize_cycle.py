"""The full-size cycle benchmarks (bench_fullsize.bench_{18km,radar}_cycle)
run end-to-end on coarsened versions of the shipped flagship configs —
proving the member-streamed complete-cycle path (forecast + obsope +
analysis) works AS WIRED for both configurations (reference:
cycle.sh:141-345 runs the whole cycle at 480x360x36, K=50)."""

import numpy as np
import pytest

from scale_letkf_tpu.bench_fullsize import bench_18km_cycle, \
    bench_radar_cycle

SMALL = {"nx": 16, "ny": 16, "nz": 12}


def test_18km_cycle_coarse():
    out = bench_18km_cycle(nsteps=4, overrides=SMALL, members=4,
                           member_batch=2, tile_rows=4,
                           n_sonde=10, n_ps=10)
    assert out["members"] == 4
    assert out["nobs_good"] > 0
    assert out["steps_run"] == 4 and out["window_steps"] == 720
    assert out["s_per_member_step"] > 0
    assert "das_letkf_s" in out
    # O-B/O-A recorded and the analysis fits the obs at least as well
    if "oma_rmse_T" in out:
        assert out["oma_rmse_T"] <= out["omb_rmse_T"] * 1.05


def test_radar_cycle_coarse():
    out = bench_radar_cycle(overrides=dict(SMALL, dx=3000.0, dy=3000.0),
                            members=4, member_batch=2, tile_rows=4,
                            n_obs_target=4000)
    assert out["members"] == 4
    assert out["steps_run"] == 15          # the FULL 30-s window at dt=2
    assert out["nobs"] > 100
    assert np.isfinite(out["total_s"])
