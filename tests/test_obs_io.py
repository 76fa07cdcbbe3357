"""Obs file I/O tests: Fortran-sequential framing, unit conversions,
native codec vs NumPy fallback parity."""

import numpy as np
import pytest

from scale_letkf_tpu.obs.types import (
    Observations, ID_U, ID_T, ID_PS, ID_RH, ID_RADAR_REF, ID_RADAR_VR,
    TYP_PHARAD,
)
from scale_letkf_tpu.obs import io as obsio
from scale_letkf_tpu.utils import native


def make_obs(n=50, seed=0):
    rng = np.random.default_rng(seed)
    elem = rng.choice([ID_U, ID_T, ID_PS, ID_RH], n).astype(np.int32)
    lev = np.where(elem == ID_PS, rng.uniform(0, 500, n),
                   rng.uniform(300e2, 1000e2, n))
    dat = np.where(elem == ID_PS, rng.uniform(9e4, 1.02e5, n),
                   rng.standard_normal(n) * 10)
    dat = np.where(elem == ID_RH, rng.uniform(0.1, 1.0, n), dat)
    return Observations(
        elem=elem,
        lon=rng.uniform(130, 140, n), lat=rng.uniform(30, 40, n),
        lev=lev, dat=dat,
        err=rng.uniform(0.5, 2.0, n),
        typ=rng.integers(0, 5, n).astype(np.int32),
        dif=rng.uniform(-1800, 1800, n))


def test_fortran_record_framing(tmp_path):
    p = str(tmp_path / "rec.dat")
    data = np.arange(24, dtype=np.float32).reshape(3, 8)
    obsio.write_records(p, data)
    # verify framing bytes directly
    raw = np.fromfile(p, np.uint8)
    assert int(raw[:4].view(np.int32)[0]) == 32
    back = obsio.read_records(p, 0, 8)
    np.testing.assert_array_equal(back, data)


def test_obs_round_trip(tmp_path):
    p = str(tmp_path / "obs.dat")
    obs = make_obs()
    obsio.write_obs(p, obs)
    back = obsio.read_obs(p)
    np.testing.assert_array_equal(back.elem, obs.elem)
    np.testing.assert_array_equal(back.typ, obs.typ)
    np.testing.assert_allclose(back.lon, obs.lon, rtol=1e-6)
    np.testing.assert_allclose(back.lev, obs.lev, rtol=1e-5)
    np.testing.assert_allclose(back.dat, obs.dat, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(back.err, obs.err, rtol=1e-5)


def test_radar_round_trip(tmp_path):
    p = str(tmp_path / "radar.dat")
    rng = np.random.default_rng(1)
    n = 100
    obs = Observations(
        elem=rng.choice([ID_RADAR_REF, ID_RADAR_VR], n).astype(np.int32),
        lon=rng.uniform(130, 140, n), lat=rng.uniform(30, 40, n),
        lev=rng.uniform(0, 15e3, n), dat=rng.uniform(0, 50, n),
        err=np.full(n, 5.0), typ=np.full(n, TYP_PHARAD, np.int32),
        dif=np.zeros(n), meta=np.asarray([135.5, 35.5, 80.0]))
    obsio.write_obs_radar(p, obs)
    back = obsio.read_obs_radar(p)
    np.testing.assert_allclose(back.meta, obs.meta, rtol=1e-6)
    np.testing.assert_array_equal(back.elem, obs.elem)
    assert (back.typ == TYP_PHARAD).all()
    np.testing.assert_allclose(back.dat, obs.dat, rtol=1e-6)


def test_radar_4d_round_trip(tmp_path):
    p = str(tmp_path / "radar4d.dat")
    n = 10
    rng = np.random.default_rng(2)
    obs = Observations(
        elem=np.full(n, ID_RADAR_REF, np.int32),
        lon=rng.uniform(130, 140, n), lat=rng.uniform(30, 40, n),
        lev=rng.uniform(0, 15e3, n), dat=rng.uniform(0, 50, n),
        err=np.full(n, 5.0), typ=np.full(n, TYP_PHARAD, np.int32),
        dif=rng.uniform(-15, 15, n), meta=np.asarray([135.0, 35.0, 0.0]))
    obsio.write_obs_radar(p, obs, radar_obs_4d=True)
    back = obsio.read_obs_radar(p, radar_obs_4d=True)
    np.testing.assert_allclose(back.dif, obs.dif, rtol=1e-5)


def test_native_matches_numpy(tmp_path):
    lib = native.load()
    if lib is None:
        pytest.skip("native codec not built")
    p = str(tmp_path / "obs.dat")
    obs = make_obs(500, seed=3)
    obsio.write_obs(p, obs)
    via_native = obsio.read_records(p, 0, 8)
    via_np = obsio._np_read_records(p, 0, 8)
    np.testing.assert_array_equal(via_native, via_np)


def test_native_bucket_sort_matches_python():
    lib = native.load()
    if lib is None:
        pytest.skip("native codec not built")
    import ctypes
    rng = np.random.default_rng(4)
    n = 1000
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    ncx, ncy, cap = 10, 10, 32
    table = np.empty(ncx * ncy * cap, np.int32)
    dropped = lib.bucket_sort(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, 0.0, 0.0, 10.0, 10.0, ncx, ncy, cap,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert dropped == 0
    table = table.reshape(ncy, ncx, cap)
    from scale_letkf_tpu.ops.obs_select import build_buckets
    ref = build_buckets(x, y, 0.0, 0.0, 100.0, 100.0, 10.0)
    for j in range(ncy):
        for i in range(ncx):
            a = set(t for t in table[j, i] if t >= 0)
            b = set(t for t in ref.table[j, i] if t >= 0)
            assert a == b


def test_obsda_round_trip(tmp_path):
    p = str(tmp_path / "obsda.dat")
    n = 64
    rng = np.random.default_rng(5)
    set_ = np.zeros(n, np.int32)
    idx = np.arange(n, dtype=np.int32)
    val = rng.standard_normal(n).astype(np.float32)
    qc = rng.integers(0, 3, n).astype(np.int32)
    obsio.write_obs_da(p, set_, idx, val, qc)
    s2, i2, v2, q2 = obsio.read_obs_da(p, n)
    np.testing.assert_array_equal(i2, idx)
    np.testing.assert_array_equal(v2, val)
    np.testing.assert_array_equal(q2, qc)


def test_obs_dep_roundtrip():
    """Binary obsdep format (write_obs_dep, common_obs_scale.f90:2354):
    11-column f32 records with Pa→hPa / RH-percent output conversions."""
    import numpy as np
    from scale_letkf_tpu.obs import io as obsio
    from scale_letkf_tpu.obs.types import ID_T, ID_PS, ID_RH
    import tempfile, os
    elem = np.asarray([ID_T, ID_PS, ID_RH], np.int32)
    lon = np.asarray([135.0, 136.0, 137.0])
    lat = np.asarray([35.0, 34.0, 33.0])
    lev = np.asarray([850e2, 10.0, 700e2])
    dat = np.asarray([280.0, 1000e2, 0.55])
    err = np.asarray([1.0, 100.0, 0.1])
    typ = np.asarray([0, 0, 0], np.int32)
    dif = np.asarray([0.0, -300.0, 600.0])
    qc = np.asarray([0, 0, 5], np.int32)
    omb = np.asarray([0.5, -20.0, 0.01])
    oma = np.asarray([0.1, -5.0, 0.005])
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "obsdep.dat")
        obsio.write_obs_dep(p, elem, lon, lat, lev, dat, err, typ, dif,
                            qc, omb, oma)
        (e2, lo2, la2, lv2, da2, er2, ty2, di2, qc2, ob2, oa2) = \
            obsio.read_obs_dep(p)
        np.testing.assert_array_equal(e2, elem)
        np.testing.assert_allclose(lv2, lev, rtol=1e-6)
        np.testing.assert_allclose(da2, dat, rtol=1e-6)
        np.testing.assert_allclose(er2, err, rtol=1e-6)
        np.testing.assert_allclose(di2, dif, rtol=1e-6)
        np.testing.assert_array_equal(qc2, qc)
        np.testing.assert_allclose(ob2, omb, rtol=1e-6)
        np.testing.assert_allclose(oa2, oma, rtol=1e-6)
        # on-disk values carry the reference output units: hPa lev for T,
        # hPa PS value, percent RH
        raw = obsio.read_records(p, 0, 11)
        assert abs(raw[0, 3] - 850.0) < 1e-3
        assert abs(raw[1, 4] - 1000.0) < 1e-3
        assert abs(raw[2, 4] - 55.0) < 1e-3
