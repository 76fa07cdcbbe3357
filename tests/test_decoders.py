"""Offline obs decoders: GSI diag_conv, obs2 round-trip, gridded precip.

Oracle: the record layouts and QC logic of the reference converters
(scale/obs/readdiag_conv.f90, scale/obs/dec_prcp.f90)."""

import numpy as np
import pytest

from scale_letkf_tpu.obs.decoders import (
    read_gsi_diag_conv, write_obs2, read_obs2, decode_prcp_grid,
    write_fortran_record,
)
from scale_letkf_tpu.obs.types import ID_U, ID_V, ID_T, ID_PS, ID_RAIN


def _write_diag_conv(path, blocks, idate=2015080100):
    with open(path, "wb") as f:
        write_fortran_record(f, np.asarray([idate], np.int32).tobytes())
        for dtype, rdiag in blocks:
            nreal, ii = rdiag.shape
            head = (dtype.encode("ascii")
                    + np.asarray([8, nreal, ii, 0], np.int32).tobytes())
            write_fortran_record(f, head)
            cdiag = b"".join(b"STN%05d" % i for i in range(ii))
            body = cdiag + np.asarray(rdiag.T, np.float32).tobytes()
            write_fortran_record(f, body)


def _rdiag(n, *, btype, lat, lon, elev, pres, qm=1, inv_err=2.0,
           val=10.0, ges=9.0, vval=3.0, vges=2.5, thours=-1.0):
    r = np.zeros((21, n), np.float32)
    r[0] = btype
    r[2] = lat
    r[3] = lon
    r[4] = elev
    r[5] = pres
    r[7] = thours
    r[8] = qm
    r[15] = inv_err
    r[16] = val
    r[17] = ges
    r[19] = vval
    r[20] = vges
    return r


def test_gsi_diag_conv_t_and_uv(tmp_path):
    path = str(tmp_path / "diag")
    blocks = [
        ("  t", _rdiag(3, btype=120, lat=35.0, lon=140.0, elev=10.0,
                       pres=850.0)),
        (" uv", _rdiag(2, btype=220, lat=40.0, lon=135.0, elev=5.0,
                       pres=500.0)),
    ]
    _write_diag_conv(path, blocks)
    obs, omb, qc, idate = read_gsi_diag_conv(path)
    assert idate == 2015080100
    # 3 T obs + 2 U + 2 V
    assert obs.nobs == 7
    assert (obs.elem[:3] == ID_T).all()
    assert (obs.elem[3:5] == ID_U).all()
    assert (obs.elem[5:] == ID_V).all()
    assert np.allclose(obs.lev[:3], 850.0)       # hPa kept as in reference
    assert np.allclose(obs.err, 0.5)             # 1 / inv_err
    assert np.allclose(omb[:5], 1.0)             # val - ges
    assert np.allclose(omb[5:], 0.5)             # vval - vges
    assert (qc == 1).all()
    assert (obs.typ == 0).all()                  # ADPUPA (0-based)
    assert np.allclose(obs.dif, -3600.0)         # hours → seconds


def test_gsi_diag_conv_qc_rules(tmp_path):
    path = str(tmp_path / "diag")
    r = _rdiag(4, btype=120, lat=35.0, lon=140.0, elev=0.0, pres=700.0)
    r[0, 1] = 122        # excluded ADPUPA platform
    r[15, 2] = 1e-9      # inverse error too small
    r[8, 3] = 9          # bad quality mark
    _write_diag_conv(path, [("  t", r)])
    obs, omb, qc, _ = read_gsi_diag_conv(path)
    assert qc.tolist() == [1.0, 0.0, 0.0, 0.0]
    assert obs.err[2] == pytest.approx(1.0e10)


def test_gsi_diag_conv_ps_units(tmp_path):
    path = str(tmp_path / "diag")
    r = _rdiag(1, btype=181, lat=35.0, lon=140.0, elev=25.0, pres=1000.0,
               val=1013.0, ges=1012.0)
    _write_diag_conv(path, [(" ps", r)])
    obs, omb, qc, _ = read_gsi_diag_conv(path)
    assert obs.elem[0] == ID_PS
    assert obs.lev[0] == pytest.approx(25.0)     # station elevation, not pres
    assert omb[0] == pytest.approx(100.0)        # hPa→Pa on the departure
    assert obs.typ[0] == 7                       # ADPSFC 0-based


def test_obs2_roundtrip(tmp_path):
    path = str(tmp_path / "obs2.dat")
    rng = np.random.default_rng(0)
    n = 17
    from scale_letkf_tpu.obs.types import Observations
    obs = Observations(
        elem=np.full(n, ID_T, np.int32),
        lon=rng.uniform(120, 150, n), lat=rng.uniform(20, 50, n),
        lev=rng.uniform(100, 1000, n), dat=rng.standard_normal(n),
        err=rng.uniform(0.5, 2, n), typ=np.zeros(n, np.int32),
        dif=rng.uniform(-3, 3, n))
    omb = rng.standard_normal(n)
    qc = (rng.uniform(size=n) > 0.3).astype(np.float64)
    write_obs2(path, obs, omb, qc)
    obs2, omb2, qc2 = read_obs2(path)
    assert np.allclose(obs2.lon, obs.lon, atol=1e-5)
    assert np.allclose(omb2, omb, atol=1e-6)
    assert (qc2 == qc).all()
    assert (obs2.typ == obs.typ).all()


def test_decode_prcp_grid():
    pr = np.array([[1.0, -1.0], [0.0, 4.0]])
    lons = np.array([100.0, 101.0])
    lats = np.array([30.0, 31.0])
    obs = decode_prcp_grid(pr, lons, lats)
    assert obs.nobs == 3                          # negative excluded
    assert (obs.elem == ID_RAIN).all()
    assert obs.err[0] == pytest.approx(0.5)       # rel error
    assert obs.err[1] == pytest.approx(0.05)      # min error floor
    assert obs.err[2] == pytest.approx(2.0)
    assert obs.typ[0] == 20
