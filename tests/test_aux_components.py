"""Tests for checkpoint I/O, additive inflation, precip transforms, obssim,
timers, and filename templating."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.io.checkpoint import (
    filename_replace_mem, save_ensemble, load_ensemble, save_member,
    load_member,
)
from scale_letkf_tpu.model.dycore import DycoreState
from scale_letkf_tpu.da.inflation import (
    knuth_shuffle, apply_additive_inflation, radar_proximity_weight,
)
from scale_letkf_tpu.obs.precip import (
    empirical_cdf, pptrans_normal, pptrans_log, pptrans_normal_mdzero,
    PPZERO_THRES,
)
from scale_letkf_tpu.da.obssim import obssim, write_grads
from scale_letkf_tpu.utils.timing import Timer


def test_filename_replace_mem():
    assert filename_replace_mem("anal.@@@@", 0) == "anal.0001"
    assert filename_replace_mem("anal.@@@@", 99) == "anal.0100"
    assert filename_replace_mem("gues.<member>.nc", "mean") == "gues.mean.nc"
    assert filename_replace_mem("x.@@@@", "mdet") == "x.mdet"


def make_state(K=3, nz=4, ny=5, nx=6, seed=0):
    rng = np.random.default_rng(seed)
    return DycoreState(
        rho=rng.standard_normal((K, nz, ny, nx)).astype(np.float32),
        rhou=rng.standard_normal((K, nz, ny, nx)).astype(np.float32),
        rhov=rng.standard_normal((K, nz, ny, nx)).astype(np.float32),
        rhow=rng.standard_normal((K, nz + 1, ny, nx)).astype(np.float32),
        rhot=rng.standard_normal((K, nz, ny, nx)).astype(np.float32),
        rhoq=rng.standard_normal((K, 6, nz, ny, nx)).astype(np.float32))


def test_checkpoint_round_trip(tmp_path):
    ens = make_state()
    infl = np.random.default_rng(1).uniform(1, 1.5, (4, 5, 6))
    save_ensemble(tmp_path / "ckpt", ens, aux={"infl": infl},
                  meta={"cycle": 3})
    back, aux, meta = load_ensemble(tmp_path / "ckpt")
    for a, b in zip(ens, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(aux["infl"], infl)
    assert meta["cycle"] == 3


def test_member_round_trip(tmp_path):
    s = jax.tree.map(lambda a: a[0], make_state())
    save_member(tmp_path / "m.npz", s)
    back = load_member(tmp_path / "m.npz")
    np.testing.assert_array_equal(np.asarray(s.rhot), back.rhot)


def test_knuth_shuffle_permutation():
    rng = np.random.default_rng(0)
    p = knuth_shuffle(rng, 50)
    assert sorted(p) == list(range(50))
    assert not (p == np.arange(50)).all()


def test_additive_inflation():
    rng = np.random.default_rng(2)
    K, nv, nz, ny, nx = 4, 11, 3, 4, 4
    anal = jnp.asarray(rng.standard_normal((K, nv, nz, ny, nx)))
    add = jnp.asarray(rng.standard_normal((K, nv, nz, ny, nx)))
    out = apply_additive_inflation(anal, add, 0.5)
    pert = np.asarray(add) - np.asarray(add).mean(0, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(anal) + 0.5 * pert,
                               rtol=1e-6)
    # mean preserved
    np.testing.assert_allclose(np.asarray(out).mean(0),
                               np.asarray(anal).mean(0), atol=1e-12)
    # with shuffle: still a valid perturbation set
    out2 = apply_additive_inflation(anal, add, 0.5,
                                    shuffle=knuth_shuffle(rng, K))
    np.testing.assert_allclose(np.asarray(out2).mean(0),
                               np.asarray(anal).mean(0), atol=1e-6)


def test_radar_proximity_weight():
    gp_x = np.asarray([0.0, 10e3, 100e3])
    gp_y = np.zeros(3)
    w = radar_proximity_weight(gp_x, gp_y, np.asarray([0.0]),
                               np.asarray([0.0]), 10e3)
    assert w[0] == 1.0
    assert 0 < w[1] < 1
    assert w[2] == 0.0
    assert (radar_proximity_weight(gp_x, gp_y, np.zeros(0), np.zeros(0),
                                   1e4) == 0).all()


def test_precip_transforms():
    rng = np.random.default_rng(3)
    climo = np.concatenate([np.zeros(500),
                            rng.gamma(0.5, 5.0, 500)])
    cdf, ppzero = empirical_cdf(climo)
    assert 0.4 < ppzero < 0.7
    # monotone on rainy values
    rain = np.asarray([0.1, 1.0, 5.0, 20.0])
    y = pptrans_normal(rain, cdf, ppzero)
    assert (np.diff(y) > 0).all()
    # zero rain maps below all rainy values
    y0 = pptrans_normal(np.asarray([0.0]), cdf, ppzero)
    assert y0[0] < y[0]
    # log transform
    yl = pptrans_log(np.asarray([0.0, 1.0]))
    np.testing.assert_allclose(yl[0], np.log(0.6))
    np.testing.assert_allclose(yl[1], np.log(1.6))
    # median-zero ensemble transform preserves rainy ordering and finiteness
    ens = np.asarray([0.0, 0.0, 0.01, 0.5, 2.0, 8.0])
    t, nzero, ym, sigma = pptrans_normal_mdzero(ens, cdf, ppzero)
    assert nzero == 3
    assert np.isfinite(t).all()
    assert t[3] < t[4] < t[5]


def test_obssim_radar():
    from scale_letkf_tpu.config import Config
    from scale_letkf_tpu.grid import Grid
    from scale_letkf_tpu.obs.types import ID_RADAR_REF, ID_RADAR_VR, ID_T
    nz, ny, nx = 4, 6, 6
    grid = Grid.uniform(nx=nx, ny=ny, nz=nz, dx=2e3, dy=2e3, dz=500.0)
    f = {}
    shape = (nz, ny, nx)
    for n, v in (("u", 5.0), ("v", 0.0), ("w", 0.0), ("t", 280.0),
                 ("p", 9e4), ("q", 0.005), ("qc", 0.0), ("qi", 0.0),
                 ("qs", 0.0), ("qg", 0.0)):
        f[n] = jnp.full(shape, v)
    qr = np.zeros(shape)
    qr[1] = 2e-3
    f["qr"] = jnp.asarray(qr)
    f["rh"] = jnp.full(shape, 50.0)
    f["hgt"] = grid.calc_z(jnp.zeros((ny, nx)))
    f["ps"] = f["p"][0]
    cfg = Config()
    out = obssim(f, [ID_T, ID_RADAR_REF, ID_RADAR_VR], grid, cfg,
                 radar_lonlatz=(float(grid.lonlat[0].mean()),
                                float(grid.lonlat[1].mean()), 0.0))
    assert out[ID_T].shape == shape
    dbz = np.asarray(out[ID_RADAR_REF])
    assert dbz[1].max() > 10.0      # rainy level shows echo
    assert np.isfinite(np.asarray(out[ID_RADAR_VR])).all()


def test_grads_writer(tmp_path):
    p = str(tmp_path / "sim.grd")
    a = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    write_grads(p, [a], [a[0]])
    raw = np.fromfile(p, np.float32)
    assert len(raw) == 24 + 12
    np.testing.assert_allclose(raw[:24], a.ravel())


def test_timer():
    t = Timer()
    with t.section("a"):
        with t.section("b"):
            pass
    assert "a" in t.records and "a/b" in t.records
    assert "a" in t.report()
