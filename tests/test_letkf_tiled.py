"""Host-streamed tiled analysis (da/letkf_tiled.py) equals the in-core
analyze() — the beyond-HBM executor for full-size domains (reference: the
48-rank domain decomposition of config/2015summer_18km)."""

import numpy as np

from scale_letkf_tpu.da.letkf import analyze
from scale_letkf_tpu.da.letkf_tiled import analyze_tiled
from tests.test_analysis_sharded import make_case


def test_tiled_matches_incore():
    grid, gues, ctx, cfg, z_full = make_case(K=8, NZ=3, NY=12, NX=8,
                                             nobs=30)
    anal_ref, _, diag = analyze(gues, ctx, cfg, grid, z_full)
    anal_ref = np.asarray(anal_ref)

    gues_np = np.asarray(gues, np.float32)
    anal_t, infl_t, stats = analyze_tiled(
        gues_np, ctx, cfg, grid, np.asarray(z_full), tile_rows=4)
    assert stats["tiles"] == 3
    # bfloat16 perturbation transport: increments accurate to ~3 decimal
    # digits of the perturbation scale
    scale = np.abs(gues_np - gues_np.mean(0)).max()
    np.testing.assert_allclose(anal_t, anal_ref, atol=2e-2 * scale,
                               rtol=2e-2)


def test_tiled_pipeline_matches_plain():
    """Double-buffered (pipeline=True) streaming returns the identical
    analysis; stats report the non-separable stream wall instead."""
    grid, gues, ctx, cfg, z_full = make_case(K=8, NZ=3, NY=12, NX=8,
                                             nobs=30)
    gues_np = np.asarray(gues, np.float32)
    a_plain, _, st0 = analyze_tiled(gues_np, ctx, cfg, grid,
                                    np.asarray(z_full), tile_rows=4)
    a_pipe, _, st1 = analyze_tiled(gues_np, ctx, cfg, grid,
                                   np.asarray(z_full), tile_rows=4,
                                   pipeline=True)
    np.testing.assert_array_equal(a_pipe, a_plain)
    assert st1.get("pipelined") and "stream_s" in st1


def test_tiled_deflation_matches_incore():
    """Configured deflation (0 < infl_mul < 1) must reach the tiled kernel
    as-is (regression: it used to be clamped to 1.0, silently diverging
    from analyze())."""
    grid, gues, ctx, cfg, z_full = make_case(
        K=8, NZ=3, NY=12, NX=8, nobs=30, letkf_kw={"infl_mul": 0.9})
    anal_ref = np.asarray(analyze(gues, ctx, cfg, grid, z_full)[0])
    gues_np = np.asarray(gues, np.float32)
    anal_t, _, _ = analyze_tiled(gues_np, ctx, cfg, grid,
                                 np.asarray(z_full), tile_rows=4)
    scale = np.abs(gues_np - gues_np.mean(0)).max()
    np.testing.assert_allclose(anal_t, anal_ref, atol=2e-2 * scale,
                               rtol=2e-2)


def test_tiled_raises_on_unsupported_features():
    """Feature combinations the tile loop does not thread must raise, not
    silently strip (det member, additive inflation, RTPS output)."""
    import pytest
    gues_np = None
    for kw, field in (({"infl_add": 0.5}, "letkf"),
                      ({"relax_spread_out": True,
                        "relax_alpha_spread": 0.9}, "letkf"),
                      ({"det_run": True}, "ensemble")):
        grid, gues, ctx, cfg, z_full = make_case(
            K=8, NZ=3, NY=12, NX=8, nobs=30,
            letkf_kw=kw if field == "letkf" else None)
        if field == "ensemble":
            cfg.ensemble.det_run = True
        if gues_np is None:
            gues_np = np.asarray(gues, np.float32)
        with pytest.raises(NotImplementedError):
            analyze_tiled(gues_np, ctx, cfg, grid, np.asarray(z_full),
                          tile_rows=4)


def test_tiled_adaptive_inflation_field():
    grid, gues, ctx, cfg, z_full = make_case(
        K=8, NZ=3, NY=12, NX=8, nobs=30,
        letkf_kw={"infl_mul": 1.0, "infl_mul_adaptive": True})
    _, _, diag = analyze(gues, ctx, cfg, grid, z_full)
    gues_np = np.asarray(gues, np.float32)
    anal_t, infl_t, stats = analyze_tiled(
        gues_np, ctx, cfg, grid, np.asarray(z_full), tile_rows=6)
    assert infl_t is not None
    np.testing.assert_allclose(infl_t, diag.infl_field, atol=1e-2)
