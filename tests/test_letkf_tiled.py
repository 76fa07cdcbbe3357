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
