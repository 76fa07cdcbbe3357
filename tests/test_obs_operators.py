"""Observation operator tests: interpolation exactness, coordinate
conversion, conventional/radar H(x) physics."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.obs.operators import (
    itpl_2d, itpl_3d, itpl_2d_column, phys2ijk, phys2ijkz, prsadj,
    trans_xtoy_conv, trans_xtoy_radar, calc_ref_vr, radar_geometry,
)
from scale_letkf_tpu.obs.types import (
    ID_U, ID_V, ID_T, ID_TV, ID_Q, ID_PS, ID_RADAR_REF, ID_RADAR_VR,
    QC_GOOD, QC_OUT_VHI, QC_OUT_VLO, QC_PS_TER, QC_REF_LOW,
)
from scale_letkf_tpu.constants import RD, GRAV


def ident_rot(lon, lat):
    return jnp.ones_like(lon), jnp.zeros_like(lon)


def test_itpl_exact_on_linear_fields():
    ny, nx, nz = 6, 7, 5
    y, x = np.mgrid[0:ny, 0:nx]
    f2 = 2.0 * x + 3.0 * y + 1.0
    ri = jnp.asarray([1.25, 4.75, 0.0])
    rj = jnp.asarray([2.5, 0.25, 5.0])
    out = itpl_2d(jnp.asarray(f2), ri, rj)
    np.testing.assert_allclose(out, 2 * np.asarray(ri) + 3 * np.asarray(rj) + 1,
                               rtol=1e-12)

    k, y3, x3 = np.mgrid[0:nz, 0:ny, 0:nx]
    f3 = x3 - 2.0 * y3 + 0.5 * k
    rk = jnp.asarray([0.5, 3.9, 2.0])
    out3 = itpl_3d(jnp.asarray(f3), rk, ri, rj)
    np.testing.assert_allclose(
        out3, np.asarray(ri) - 2 * np.asarray(rj) + 0.5 * np.asarray(rk),
        rtol=1e-12)

    col = itpl_2d_column(jnp.asarray(f3), ri, rj)
    assert col.shape == (3, nz)
    np.testing.assert_allclose(
        col[:, 2], np.asarray(ri) - 2 * np.asarray(rj) + 1.0, rtol=1e-12)


def test_phys2ijk_logp():
    nz, ny, nx = 10, 4, 4
    # exponential pressure profile: p = 1000 hPa * exp(-k/7)
    p1d = 1e5 * np.exp(-np.arange(nz) / 7.0)
    p_full = jnp.asarray(np.tile(p1d[:, None, None], (1, ny, nx)))
    elem = jnp.asarray([ID_T, ID_T, ID_T, ID_PS], dtype=jnp.int32)
    ri = jnp.asarray([1.5, 1.5, 1.5, 2.0])
    rj = jnp.asarray([1.5, 1.5, 1.5, 2.0])
    # exact level-3 pressure, too-high, too-low, surface
    rlev = jnp.asarray([p1d[3], p1d[-1] * 0.5, 1.2e5, 123.0])
    rk, qc = phys2ijk(p_full, elem, ri, rj, rlev)
    np.testing.assert_allclose(rk[0], 3.0, atol=1e-10)
    assert qc[0] == QC_GOOD
    assert qc[1] == QC_OUT_VHI
    assert qc[2] == QC_OUT_VLO
    assert qc[3] == QC_GOOD and float(rk[3]) == 123.0
    # log-p interpolation: halfway in log p between levels 4 and 5
    lnp_half = 0.5 * (np.log(p1d[4]) + np.log(p1d[5]))
    rk2, _ = phys2ijk(p_full, jnp.asarray([ID_T]), jnp.asarray([1.0]),
                      jnp.asarray([1.0]), jnp.asarray([np.exp(lnp_half)]))
    np.testing.assert_allclose(rk2[0], 4.5, atol=1e-10)


def test_phys2ijkz():
    nz, ny, nx = 8, 4, 4
    z1d = np.arange(nz) * 500.0 + 250.0
    z_full = jnp.asarray(np.tile(z1d[:, None, None], (1, ny, nx)))
    ri = jnp.full(3, 1.5)
    rlev = jnp.asarray([750.0, 10.0, 1e5])
    rk, qc = phys2ijkz(z_full, ri, ri, rlev)
    np.testing.assert_allclose(rk[0], 1.0, atol=1e-12)
    assert qc[1] == QC_OUT_VLO
    assert qc[2] == QC_OUT_VHI


def test_prsadj_hydrostatic():
    # pressure decreases with height; ~12 hPa per 100 m near the surface
    p = prsadj(jnp.asarray([1e5]), jnp.asarray([100.0]),
               jnp.asarray([288.0]), jnp.asarray([0.0]))
    assert 98500.0 < float(p[0]) < 99000.0
    # no change at dz=0
    p0 = prsadj(jnp.asarray([1e5]), jnp.asarray([0.0]),
                jnp.asarray([288.0]), jnp.asarray([0.0]))
    assert float(p0[0]) == 1e5


def make_fields(nz=6, ny=8, nx=8):
    f = {}
    shape = (nz, ny, nx)
    f["u"] = jnp.full(shape, 5.0)
    f["v"] = jnp.full(shape, -3.0)
    f["w"] = jnp.full(shape, 0.5)
    f["t"] = jnp.full(shape, 280.0)
    f["p"] = jnp.asarray(np.tile((1e5 * np.exp(-np.arange(nz) / 7.0))[:, None, None],
                                 (1, ny, nx)))
    f["q"] = jnp.full(shape, 0.005)
    for n in ("qc", "qr", "qi", "qs", "qg"):
        f[n] = jnp.zeros(shape)
    f["rh"] = jnp.full(shape, 60.0)
    f["hgt"] = jnp.asarray(np.tile((np.arange(nz) * 500.0 + 250.0)[:, None, None],
                                   (1, ny, nx)))
    f["topo"] = jnp.zeros((ny, nx))
    f["ps"] = f["p"][0]
    f["t2m"] = f["t"][0]
    f["q2m"] = f["q"][0]
    f["u10m"] = f["u"][0]
    f["v10m"] = f["v"][0]
    return f


def test_trans_xtoy_conv():
    f = make_fields()
    elem = jnp.asarray([ID_U, ID_V, ID_T, ID_TV, ID_Q, ID_PS, ID_PS],
                       dtype=jnp.int32)
    n = len(elem)
    ri = jnp.full(n, 3.0)
    rj = jnp.full(n, 3.0)
    rk = jnp.asarray([2.0, 2.0, 2.0, 2.0, 2.0, 0.0, 500.0])
    lon = jnp.full(n, 135.0)
    lat = jnp.full(n, 35.0)
    y, qc = trans_xtoy_conv(elem, ri, rj, rk, lon, lat, f, ident_rot)
    np.testing.assert_allclose(y[0], 5.0)
    np.testing.assert_allclose(y[1], -3.0)
    np.testing.assert_allclose(y[2], 280.0)
    np.testing.assert_allclose(y[3], 280.0 * (1 + 0.608 * 0.005))
    np.testing.assert_allclose(y[4], 0.005)
    np.testing.assert_allclose(y[5], 1e5)   # station at sea level, no adjustment
    assert int(qc[5]) == QC_GOOD
    # station 500 m above flat topo → adjusted downward & flagged
    assert float(y[6]) < 1e5
    assert int(qc[6]) == QC_PS_TER


def test_wind_rotation():
    f = make_fields()
    def rot45(lon, lat):
        c = jnp.full_like(lon, np.cos(np.pi / 4))
        s = jnp.full_like(lon, np.sin(np.pi / 4))
        return c, s
    elem = jnp.asarray([ID_U, ID_V], dtype=jnp.int32)
    two = jnp.full(2, 3.0)
    y, _ = trans_xtoy_conv(elem, two, two, jnp.full(2, 2.0), two, two, f, rot45)
    c = np.cos(np.pi / 4)
    np.testing.assert_allclose(y[0], 5.0 * c - (-3.0) * c, rtol=1e-12)
    np.testing.assert_allclose(y[1], 5.0 * c + (-3.0) * c, rtol=1e-12)


def test_radar_geometry():
    az, elev, at_site = radar_geometry(
        jnp.asarray([135.0, 135.5, 135.0]), jnp.asarray([35.5, 35.0, 35.0]),
        jnp.asarray([5000.0, 100.0, 100.0]),
        135.0, 35.0, 100.0)
    np.testing.assert_allclose(az[0], 0.0, atol=1e-10)      # due north
    np.testing.assert_allclose(az[1], 90.0, atol=0.5)       # due east
    assert float(elev[0]) > 0
    assert bool(at_site[2])


def test_calc_ref_vr_no_hydrometeors():
    z = jnp.zeros(3)
    ref, vr = calc_ref_vr(jnp.full(3, 0.005), z, z, z, z, z,
                          jnp.full(3, 10.0), z, z,
                          jnp.full(3, 280.0), jnp.full(3, 9e4),
                          jnp.asarray([90.0, 0.0, 90.0]),
                          jnp.asarray([0.0, 0.0, 90.0]), method=3)
    np.testing.assert_allclose(ref, 0.0)
    # pure eastward wind: vr = u at az=90/elev=0, 0 at az=0, 0 at elev=90
    np.testing.assert_allclose(vr[0], 10.0, atol=1e-10)
    np.testing.assert_allclose(vr[1], 0.0, atol=1e-10)
    np.testing.assert_allclose(vr[2], 0.0, atol=1e-6)


def test_calc_ref_vr_monotone_in_qr():
    """More rain → more reflectivity, for every method."""
    z = jnp.zeros(3)
    qr = jnp.asarray([1e-4, 1e-3, 5e-3])
    for method in (1, 2, 3):
        ref, _ = calc_ref_vr(jnp.full(3, 0.005), z, qr, z, z, z,
                             z, z, z, jnp.full(3, 280.0), jnp.full(3, 9e4),
                             z, z, method=method)
        r = np.asarray(ref)
        assert r[0] < r[1] < r[2]
        assert (r > 0).all()


def test_trans_xtoy_radar():
    f = make_fields()
    f = dict(f)
    qr = np.zeros((6, 8, 8))
    qr[2, :, :] = 2e-3
    f["qr"] = jnp.asarray(qr)
    elem = jnp.asarray([ID_RADAR_REF, ID_RADAR_VR, ID_RADAR_REF],
                       dtype=jnp.int32)
    ri = jnp.asarray([4.0, 4.0, 4.0])
    rj = jnp.asarray([4.0, 4.0, 4.0])
    rk = jnp.asarray([2.0, 2.0, 4.0])  # third: dry level → low ref
    lon = jnp.asarray([135.3, 135.3, 135.3])
    lat = jnp.asarray([35.0, 35.0, 35.0])
    lev = jnp.asarray([1250.0, 1250.0, 2250.0])
    y, qc = trans_xtoy_radar(elem, ri, rj, rk, lon, lat, lev,
                             (135.0, 35.0, 100.0), f, ident_rot)
    assert float(y[0]) > 10.0            # rainy level: strong echo in dBZ
    assert int(qc[0]) == QC_GOOD
    assert np.isfinite(float(y[1]))      # radial velocity defined
    assert int(qc[2]) == QC_REF_LOW      # dry level: below MIN_RADAR_REF
    assert float(y[2]) == 0.0            # floored at MIN_RADAR_REF_DBZ
