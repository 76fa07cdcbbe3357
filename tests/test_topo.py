"""Topography preprocessing tests (scale-rm_pp_ens equivalent):
DEM remap accuracy, slope-limited smoothing, halo flattening, CLI."""

import numpy as np

from scale_letkf_tpu.grid import Grid
from scale_letkf_tpu.model.topo import (
    read_dem, remap_dem_to_grid, smooth_topo, flatten_halo, prepare_topo,
)


def _dem_gaussian_hill(nlon=241, nlat=241, h0=2000.0):
    """DEM covering the model domain: Gaussian hill at the basepoint."""
    lon = 135.0 + np.linspace(-3.0, 3.0, nlon)
    lat = 35.0 + np.linspace(-3.0, 3.0, nlat)
    LO, LA = np.meshgrid(lon, lat)
    elev = h0 * np.exp(-(((LO - 135.0) / 0.8) ** 2
                         + ((LA - 35.0) / 0.8) ** 2))
    return elev, lon, lat


def test_remap_hits_hill_peak():
    grid = Grid.uniform(nx=32, ny=32, nz=10, dx=5e3, dy=5e3, dz=500.0)
    elev, lon, lat = _dem_gaussian_hill()
    topo = remap_dem_to_grid(elev, lon, lat, grid)
    assert topo.shape == (32, 32)
    # peak near the domain center, close to the DEM maximum
    jc, ic = np.unravel_index(np.argmax(topo), topo.shape)
    assert abs(jc - 16) <= 2 and abs(ic - 16) <= 2
    assert 0.9 * elev.max() < topo.max() <= elev.max()
    assert topo.min() >= 0.0


def test_smooth_topo_enforces_slope_limit():
    rng = np.random.default_rng(0)
    rough = np.abs(rng.standard_normal((40, 40))) * 800.0
    dx = 2000.0
    out = np.asarray(smooth_topo(rough, dx, dx, max_slope_ratio=0.1))
    gx = np.abs(np.diff(out, axis=1)) / dx
    gy = np.abs(np.diff(out, axis=0)) / dx
    assert max(gx.max(), gy.max()) <= 0.1 + 1e-6
    # smoothing roughly preserves the mean elevation
    assert abs(out.mean() - rough.mean()) < 0.05 * rough.mean()


def test_flatten_halo():
    rng = np.random.default_rng(1)
    topo = rng.uniform(0, 1000, (20, 20))
    out = np.asarray(flatten_halo(topo, width=2))
    # edge ring is constant (the edge mean), interior untouched
    edges = np.concatenate([out[0], out[-1], out[:, 0], out[:, -1]])
    assert np.allclose(edges, edges[0])
    assert np.allclose(out[4:-4, 4:-4], topo[4:-4, 4:-4])


def test_read_dem_formats(tmp_path):
    elev, lon, lat = _dem_gaussian_hill(nlon=50, nlat=40)
    npz = tmp_path / "dem.npz"
    np.savez(npz, elev=elev, lon=lon, lat=lat)
    e2, lo2, la2 = read_dem(str(npz))
    np.testing.assert_allclose(e2, elev)

    raw = tmp_path / "dem.bin"
    elev.astype(np.float32).tofile(raw)
    e3, lo3, la3 = read_dem(str(raw), nlon=50, nlat=40,
                            lon0=lon[0], dlon=lon[1] - lon[0],
                            lat0=lat[0], dlat=lat[1] - lat[0])
    np.testing.assert_allclose(e3, elev, rtol=1e-6)
    np.testing.assert_allclose(lo3, lon, rtol=1e-12)


def test_pp_cli_and_driver_wiring(tmp_path):
    from scale_letkf_tpu.cli.main import main
    elev, lon, lat = _dem_gaussian_hill()
    dem = tmp_path / "dem.npz"
    np.savez(dem, elev=elev, lon=lon, lat=lat)
    conf = tmp_path / "c.toml"
    conf.write_text(
        "[domain]\nnx = 16\nny = 16\nnz = 8\ndx = 10e3\ndy = 10e3\n"
        "dz = 1000.0\n")
    out = tmp_path / "topo.npz"
    main(["pp", "--config", str(conf), "--dem", str(dem),
          "--out", str(out)])
    topo = np.load(out)["topo"]
    assert topo.shape == (16, 16)
    assert topo.max() > 100.0

    # driver consumes it through [domain] topo_file: z_full reflects terrain
    from scale_letkf_tpu.cli.main import load_config_and_grid, make_driver
    conf2 = tmp_path / "c2.toml"
    conf2.write_text(
        "[domain]\nnx = 16\nny = 16\nnz = 8\ndx = 10e3\ndy = 10e3\n"
        f"dz = 1000.0\ntopo_file = '{out}'\n")
    cfg, grid, dycfg, dom = load_config_and_grid(str(conf2))
    driver = make_driver(cfg, grid, dycfg, dom)
    z0 = np.asarray(driver.z_full[0])
    assert z0.max() > z0.min() + 100.0   # first level follows the hill
