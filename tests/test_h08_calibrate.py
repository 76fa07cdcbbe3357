"""H08 band-model calibration hook (obs/h08_calibrate.py): fitting the
band coefficients against the correlated-k surrogate must reduce the BT
misfit substantially, and load_calibration must install the result
(reference: the RTTOV coefficient role, scale_H08_fwd.F90:6-26)."""

import json

import numpy as np

from scale_letkf_tpu.obs.h08_calibrate import (
    make_profile_set, surrogate_bt, fit)


def test_fit_reduces_residual(tmp_path):
    prof = make_profile_set(n=24, nz=16, seed=1)
    bt = surrogate_bt(prof["p"], prof["t"], prof["qv"], prof["tsfc"],
                      prof["psfc"], prof["zenith"])
    assert np.isfinite(bt).all()
    assert (bt > 150).all() and (bt < 330).all()
    fitted, stats = fit(prof, bt, steps=150)
    assert stats["bt_rmse_after_K"] < 0.6 * stats["bt_rmse_before_K"]
    assert len(fitted["k_wv"]) == 10 and len(fitted["k_fix"]) == 10
    assert all(v > 0 for v in fitted["k_wv"])

    # the loader installs the fitted coefficients
    p = tmp_path / "cal.json"
    p.write_text(json.dumps(fitted))
    from scale_letkf_tpu.obs import h08
    orig = (h08.K_WV, h08.K_FIX, h08.WV_P_EXP)
    try:
        h08.load_calibration(str(p))
        np.testing.assert_allclose(np.asarray(h08.K_WV), fitted["k_wv"])
        assert h08.WV_P_EXP == fitted["wv_p_exp"]
    finally:
        h08.K_WV, h08.K_FIX, h08.WV_P_EXP = orig


def test_shipped_calibration_artifact():
    """The committed calibration artifact is well-formed and documents its
    residuals (keeps the PARITY claim honest)."""
    with open("docs/h08_calibration.json") as f:
        d = json.load(f)
    assert len(d["k_wv"]) == 10
    st = d["stats"]
    assert "NOT RTTOV" in st["reference"]
    assert st["bt_rmse_after_K"] < st["bt_rmse_before_K"]
