"""Himawari-8 IR radiance operator tests: band-model physics sanity,
Trans_XtoY_H08 semantics (cloudy sign flip, channel gating, sensitive
pressure), file I/O roundtrip, and pipeline integration."""

import numpy as np
import jax.numpy as jnp

from scale_letkf_tpu.obs.h08 import (
    NCHAN, h08_rt_fwd, trans_xtoy_h08, planck_rad, planck_bt, WAVENUM,
    satellite_zenith,
)
from scale_letkf_tpu.obs.types import (
    Observations, ID_H08IR, ID_T, QC_GOOD, QC_OBS_BAD,
)
from scale_letkf_tpu.config import Config


def make_profile(nz=24, qv0=0.010, cloud=0.0, cloud_k=None):
    """Single column: 1000->100 hPa, standard-ish lapse, moist low levels."""
    p = np.geomspace(9.8e4, 1.0e4, nz)
    t = 288.0 - 60.0 * (1.0 - p / p[0])          # 288 K -> 228 K
    qv = qv0 * (p / p[0]) ** 3
    qliq = np.zeros(nz)
    qice = np.zeros(nz)
    if cloud > 0:
        k = cloud_k if cloud_k is not None else nz // 2
        qliq[k] = cloud
    return (jnp.asarray(p)[None], jnp.asarray(t)[None],
            jnp.asarray(qv)[None], jnp.asarray(qliq)[None],
            jnp.asarray(qice)[None])


def test_planck_roundtrip():
    t = jnp.asarray([200.0, 250.0, 300.0])[:, None]
    rad = planck_rad(t, WAVENUM)
    bt = planck_bt(rad, WAVENUM)
    np.testing.assert_allclose(bt, jnp.broadcast_to(t, bt.shape), rtol=1e-6)


def test_clear_sky_band_structure():
    p, t, qv, ql, qi = make_profile()
    tsfc = jnp.asarray([290.0])
    psfc = jnp.asarray([1.0e5])
    zen = jnp.asarray([0.3])
    btall, btclr, plev = h08_rt_fwd(p, t, qv, ql, qi, tsfc, psfc, zen)
    btall, btclr, plev = map(np.asarray, (btall, btclr, plev))
    np.testing.assert_allclose(btall, btclr, rtol=1e-6)  # no cloud
    # window band B13 (idx 6) sees near the surface; BT within a few K of Tsfc
    assert 270.0 < btclr[0, 6] <= 290.5
    # WV band B08 (idx 1) is much colder (upper-troposphere emission)
    assert btclr[0, 1] < btclr[0, 6] - 20.0
    # weighting-function peak: WV band peaks higher (lower p) than window
    assert plev[0, 1] < plev[0, 6]
    # all BTs physical
    assert (btclr > 150.0).all() and (btclr < 330.0).all()


def test_cloud_cools_bt_and_lifts_plev():
    tsfc = jnp.asarray([290.0])
    psfc = jnp.asarray([1.0e5])
    zen = jnp.asarray([0.3])
    p, t, qv, ql, qi = make_profile()
    bt0, bc0, pl0 = h08_rt_fwd(p, t, qv, ql, qi, tsfc, psfc, zen)
    p, t, qv, ql, qi = make_profile(cloud=2e-3, cloud_k=18)  # high cloud
    bt1, bc1, pl1 = h08_rt_fwd(p, t, qv, ql, qi, tsfc, psfc, zen)
    # clear-sky unchanged, all-sky colder in the window band
    np.testing.assert_allclose(bc1, bc0, rtol=1e-6)
    assert float(bt1[0, 6]) < float(bt0[0, 6]) - 5.0
    # all-sky weighting function peak moves up (to lower pressure)
    assert float(pl1[0, 6]) < float(pl0[0, 6])


def test_zenith_increases_path():
    p, t, qv, ql, qi = make_profile()
    tsfc = jnp.asarray([290.0])
    psfc = jnp.asarray([1.0e5])
    bt_n, _, _ = h08_rt_fwd(p, t, qv, ql, qi, tsfc, psfc, jnp.asarray([0.0]))
    bt_s, _, _ = h08_rt_fwd(p, t, qv, ql, qi, tsfc, psfc, jnp.asarray([1.2]))
    # slant path -> more absorption -> colder window BT
    assert float(bt_s[0, 6]) < float(bt_n[0, 6])
    # sub-satellite point has zenith ~0; 60 deg away it is large
    z0 = float(satellite_zenith(jnp.asarray(140.7), jnp.asarray(0.0)))
    z1 = float(satellite_zenith(jnp.asarray(140.7), jnp.asarray(60.0)))
    assert z0 < 0.02 and z1 > 1.0


def _fields_3d(ny=6, nx=6, nz=24, cloud=0.0):
    p1, t1, qv1, ql1, qi1 = make_profile(nz=nz, cloud=cloud)
    tile = lambda a: jnp.tile(np.asarray(a)[0][:, None, None], (1, ny, nx))
    zero = jnp.zeros((nz, ny, nx))
    f = {"p": tile(p1), "t": tile(t1), "q": tile(qv1),
         "qc": tile(ql1), "qr": zero, "qi": tile(qi1), "qs": zero,
         "qg": zero, "u": zero, "v": zero, "w": zero,
         "rh": jnp.full((nz, ny, nx), 0.5)}
    f["ps"] = jnp.full((ny, nx), 1.0e5)
    f["t2m"] = jnp.full((ny, nx), 290.0)
    f["q2m"] = jnp.full((ny, nx), 0.008)
    f["topo"] = jnp.zeros((ny, nx))
    f["u10m"] = jnp.zeros((ny, nx))
    f["v10m"] = jnp.zeros((ny, nx))
    return f


def test_trans_xtoy_h08_semantics():
    f = _fields_3d(cloud=2e-3)
    n = 4
    ch = jnp.asarray([9.0, 9.0, 13.0, 16.0])   # band numbers B09, B13, B16
    ri = jnp.full(n, 2.5)
    rj = jnp.full(n, 2.5)
    lon = jnp.full(n, 140.0)
    lat = jnp.full(n, 35.0)
    # enable B09 and B13 (ch_use indices 2 and 6), thrs>0 so cloud detection works
    ch_use = (0, 0, 1, 0, 0, 0, 1, 0, 0, 0)
    y, bclr, plev, qc = trans_xtoy_h08(ch, ri, rj, lon, lat, f,
                                       ch_use=ch_use, cldsky_thrs=2.0)
    y, bclr, plev, qc = map(np.asarray, (y, bclr, plev, qc))
    assert qc[0] == QC_GOOD and qc[2] == QC_GOOD
    assert qc[3] == QC_OBS_BAD            # B16 not in ch_use
    # window band with a thick cloud: cloudy -> negated BT
    assert y[2] < 0 and abs(y[2]) > 150.0
    assert (plev > 1e3).all() and (plev < 1e5).all()
    # default thrs<0 diagnoses everything cloudy (reference semantics)
    y2, _, _, _ = trans_xtoy_h08(ch, ri, rj, lon, lat, _fields_3d(),
                                 ch_use=ch_use, cldsky_thrs=-5.0)
    assert (np.asarray(y2) < 0).all()


def test_h08_obs_io_roundtrip(tmp_path):
    from scale_letkf_tpu.obs.io import read_obs_h08, write_obs_h08
    nprof = 3
    rng = np.random.default_rng(0)
    bt = rng.uniform(220, 290, (nprof, NCHAN))
    obs = Observations(
        elem=np.full(nprof * NCHAN, ID_H08IR, np.int32),
        lon=np.repeat([130.0, 135.0, 140.0], NCHAN),
        lat=np.repeat([30.0, 32.0, 34.0], NCHAN),
        lev=np.tile(np.arange(7, 17, dtype=float), nprof),
        dat=bt.reshape(-1),
        err=np.full(nprof * NCHAN, 5.0),
        typ=np.full(nprof * NCHAN, 22, np.int32),   # H08IRB
        dif=np.zeros(nprof * NCHAN))
    path = str(tmp_path / "h08.dat")
    write_obs_h08(path, obs)
    back = read_obs_h08(path, Config())
    np.testing.assert_allclose(back.dat, obs.dat, rtol=1e-6)
    np.testing.assert_allclose(back.lev, obs.lev)
    np.testing.assert_allclose(back.lon, obs.lon, rtol=1e-6)
    assert (back.elem == ID_H08IR).all()
    assert (back.typ == 22).all()


def test_h08_pipeline_obsope_and_context():
    """obsope -> set_letkf_obs equivalents on a mixed conventional+H08 set."""
    from scale_letkf_tpu.grid import Grid
    from scale_letkf_tpu.da.obsope import obsope_ensemble
    from scale_letkf_tpu.da.letkf_obs import build_obs_context

    cfg = Config()
    cfg.h08.h08_ch_use = (0, 0, 1, 0, 0, 0, 1, 0, 0, 0)
    cfg.h08.h08_cldsky_thrs = 2.0
    grid = Grid.uniform(nx=6, ny=6, nz=24, dx=10e3, dy=10e3, dz=500.0)

    K = 4
    rng = np.random.default_rng(1)
    base = _fields_3d(cloud=0.0)
    fields = {k: jnp.stack([v] * K) for k, v in base.items()}
    # perturb temperature per member so hdxb is nonzero
    fields["t"] = fields["t"] + jnp.asarray(
        rng.standard_normal((K, 1, 1, 1)) * 0.5)

    lon2d, lat2d = grid.lonlat
    n = 3
    obs = Observations(
        elem=np.asarray([ID_H08IR, ID_H08IR, ID_T], np.int32),
        lon=np.asarray([lon2d[3, 3], lon2d[2, 2], lon2d[3, 3]]),
        lat=np.asarray([lat2d[3, 3], lat2d[2, 2], lat2d[3, 3]]),
        lev=np.asarray([9.0, 13.0, 7.0e4]),   # bands B09/B13; T at 700 hPa
        dat=np.asarray([240.0, 285.0, 280.0]),
        err=np.asarray([5.0, 5.0, 1.0]),
        typ=np.asarray([22, 22, 0], np.int32),
        dif=np.zeros(n))

    z_full = grid.calc_z(jnp.zeros((6, 6)))
    hx = obsope_ensemble(fields, obs, grid, cfg, z_full)
    assert hx.ensval.shape == (K, n)
    assert (hx.qc[:2] == QC_GOOD).all()
    assert hx.lev is not None and hx.lev[0] > 1e3   # sensitive pressure set
    assert hx.val2[0] > 150.0                       # clear-sky BT
    # H(x) magnitudes are BTs
    assert (np.abs(hx.ensval[:, :2]) > 150.0).all()

    ctx = build_obs_context(obs, hx.ensval, hx.qc, cfg, grid, hx_lev=hx.lev)
    # vertical coordinate for H08 = ln(sensitive pressure)
    i_h08 = np.nonzero(ctx.elem == ID_H08IR)[0]
    assert np.allclose(ctx.vert[i_h08[0]], np.log(hx.lev[i_h08[0]]))
    # hdxb is sign-corrected (all-positive BTs about the mean)
    assert np.isfinite(ctx.hdxb).all()
    # H08 ctype present
    assert any(c.elem == ID_H08IR for c in ctx.ctypes)
