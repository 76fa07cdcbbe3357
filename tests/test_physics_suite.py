"""Physics suite: surface layer, PBL diffusion, radiation, composed step.

The reference runs these schemes inside the external SCALE library
(SURVEY §2.6); tests here check the physical invariants each scheme must
satisfy (neutral-limit drag law, conservation under diffusion, radiative
energy budget closure, stability at long implicit steps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scale_letkf_tpu.constants import GRAV, RD, CVDRY, PRE00
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
from scale_letkf_tpu.model.surface import surface_fluxes, KARMAN
from scale_letkf_tpu.model.pbl import (
    tridiag_solve, diffuse_column, eddy_diffusivity, pbl_step,
)
from scale_letkf_tpu.model.radiation import radiation_step, SIGMA_SB
from scale_letkf_tpu.model.physics_suite import (
    PhysicsConfig, init_physics_state, physics_step,
)

CPDRY = RD + CVDRY


def _slab(val, shape=(4, 4)):
    return jnp.full(shape, val, jnp.float32)


class TestSurface:
    def test_neutral_drag_law(self):
        # θv(sfc) == θv(z1) → Rib=0 → CD = (k/ln(z1/z0))^2 exactly
        z1, z0 = 25.0, 0.01
        p1 = 1.0e5 - 1.2 * GRAV * z1
        t1 = 300.0 * (p1 / PRE00) ** (RD / CPDRY)
        sfc = surface_fluxes(_slab(5.0), _slab(0.0), _slab(t1),
                             _slab(0.0), _slab(p1), _slab(1.2),
                             _slab(z1), _slab(300.0 * 1.0), _slab(1.0e5),
                             z0=z0, z0h=z0, beta=0.0)
        # tsfc such that θs = 300 too: tsfc = 300*(psfc/p00)^κ = 300
        cd = float(sfc.cd_mod[0, 0]) / (1.2 * 5.0)
        cd_neutral = (KARMAN / np.log(z1 / z0)) ** 2
        assert cd == pytest.approx(cd_neutral, rel=1e-3)

    def test_flux_signs(self):
        # warm surface under cold air → upward (positive) heat flux;
        # drag opposes the wind
        z1 = 25.0
        sfc_warm = surface_fluxes(_slab(5.0), _slab(-3.0), _slab(285.0),
                                  _slab(0.005), _slab(1.0e5), _slab(1.2),
                                  _slab(z1), _slab(295.0), _slab(1.0e5))
        assert float(sfc_warm.shf[0, 0]) > 0
        assert float(sfc_warm.lhf[0, 0]) > 0
        assert float(sfc_warm.taux[0, 0]) > 0   # τ = ρCD|U|u, removes +u
        assert float(sfc_warm.tauy[0, 0]) < 0

    def test_stable_suppresses_exchange(self):
        z1 = 25.0
        args = dict(p1=_slab(1.0e5), rho1=_slab(1.2), z1=_slab(z1),
                    psfc=_slab(1.0e5))
        warm_sfc = surface_fluxes(_slab(5.0), _slab(0.0), _slab(285.0),
                                  _slab(0.0), args["p1"], args["rho1"],
                                  args["z1"], _slab(295.0), args["psfc"])
        cold_sfc = surface_fluxes(_slab(5.0), _slab(0.0), _slab(295.0),
                                  _slab(0.0), args["p1"], args["rho1"],
                                  args["z1"], _slab(285.0), args["psfc"])
        assert (float(warm_sfc.ch_mod[0, 0])
                > float(cold_sfc.ch_mod[0, 0]) * 2)

    def test_screen_diags_between_sfc_and_level1(self):
        sfc = surface_fluxes(_slab(8.0), _slab(0.0), _slab(285.0),
                             _slab(0.004), _slab(1.0e5), _slab(1.2),
                             _slab(25.0), _slab(295.0), _slab(1.0e5))
        u10 = float(sfc.u10[0, 0])
        t2 = float(sfc.t2[0, 0])
        assert 0.0 < u10 <= 8.0
        assert 285.0 - 1.0 <= t2 <= 295.0 + 1.0


class TestTridiag:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(0)
        nz = 12
        lo = rng.uniform(-1, 0, nz)
        up = rng.uniform(-1, 0, nz)
        di = 2.0 + rng.uniform(0, 1, nz)   # diagonally dominant
        lo[0] = up[-1] = 0.0
        rhs = rng.standard_normal(nz)
        T = np.diag(di) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
        expect = np.linalg.solve(T, rhs)
        got = tridiag_solve(jnp.asarray(lo)[:, None, None],
                            jnp.asarray(di)[:, None, None],
                            jnp.asarray(up)[:, None, None],
                            jnp.asarray(rhs)[:, None, None])
        np.testing.assert_allclose(np.asarray(got)[:, 0, 0], expect,
                                   rtol=1e-5)

    def test_diffusion_conserves_and_smooths(self):
        nz, dz, dt = 16, 100.0, 300.0
        rho = jnp.ones((nz, 1, 1))
        phi = jnp.zeros((nz, 1, 1)).at[8].set(10.0)
        rhok = jnp.full((nz - 1, 1, 1), 5.0)
        out = diffuse_column(phi, rhok, rho, dt, dz,
                             jnp.zeros((1, 1)), jnp.zeros((1, 1)))
        # no surface flux → column integral conserved
        assert float(jnp.sum(out)) == pytest.approx(10.0, rel=1e-5)
        # spike smoothed monotonically, no over/undershoot
        assert float(out[8, 0, 0]) < 10.0
        assert float(jnp.min(out)) >= -1e-6

    def test_implicit_stable_at_huge_diffusion_number(self):
        nz, dz, dt = 8, 50.0, 1800.0    # dt K / dz^2 ≈ 72 — explicit blows up
        rho = jnp.ones((nz, 1, 1))
        phi = jnp.asarray(np.linspace(300, 310, nz))[:, None, None]
        rhok = jnp.full((nz - 1, 1, 1), 100.0)
        out = diffuse_column(phi, rhok, rho, dt, dz,
                             jnp.zeros((1, 1)), jnp.zeros((1, 1)))
        assert np.isfinite(np.asarray(out)).all()
        assert float(out.min()) >= 299.0 and float(out.max()) <= 311.0


class TestEddyDiffusivity:
    def test_stable_less_than_unstable(self):
        nz = 10
        zc = jnp.asarray((np.arange(nz) + 0.5) * 100.0)
        u = jnp.tile(jnp.asarray(np.linspace(0, 10, nz))[:, None, None],
                     (1, 2, 2))
        v = jnp.zeros_like(u)
        thv_unstable = jnp.tile(
            jnp.asarray(np.linspace(305, 300, nz))[:, None, None], (1, 2, 2))
        thv_stable = jnp.tile(
            jnp.asarray(np.linspace(300, 315, nz))[:, None, None], (1, 2, 2))
        km_u, _ = eddy_diffusivity(u, v, thv_unstable, zc, 100.0)
        km_s, _ = eddy_diffusivity(u, v, thv_stable, zc, 100.0)
        assert float(km_u.mean()) > float(km_s.mean())


class TestRadiation:
    def _state(self, nz=12, ny=6, nx=6, dz=500.0):
        qv = 0.01 * np.exp(-(np.arange(nz) + 0.5) * dz / 2500.0)
        s, _, _ = balanced_state(nz, ny, nx, dz, qv_prof=qv)
        return s, dz

    def test_energy_budget_closes(self):
        s, dz = self._state()
        rad = radiation_step(s, dz, mu0=0.6, tsfc=None)
        # column-integrated ρ cp heating·dz must equal net absorbed flux:
        # (in at TOA+sfc) − (out at TOA+sfc) for combined SW+LW
        col = float(jnp.sum(rad.heating * s.rho * CPDRY * dz, axis=0)[0, 0])
        from scale_letkf_tpu.model.dycore import moist_pressure
        q = s.rhoq / s.rho[None]
        p = moist_pressure(s.rhot, q)
        temp = (s.rhot / s.rho) * (p / PRE00) ** (RD / CPDRY)
        tsfc = temp[0]
        up_sfc = 0.98 * SIGMA_SB * float(tsfc[0, 0]) ** 4
        sw_toa = 1361.0 * 0.6
        # net into the column (positive down at TOA, net up at sfc)
        lw_dn_sfc = float(rad.lw_down_sfc[0, 0])
        sw_dn_sfc = float(rad.sw_down_sfc[0, 0])
        sw_up_sfc = 0.2 * sw_dn_sfc
        olr = float(rad.olr[0, 0])
        # flux bookkeeping: column absorption = (TOA net down) - (sfc net down)
        sw_up_toa = float(sw_up_sfc * np.exp(
            -np.sum(np.asarray((2.0e-3 * q[0] + 1.0e-5)
                               * s.rho * dz), axis=0)[0, 0] / 0.6))
        toa_net_down = sw_toa - sw_up_toa - olr
        sfc_net_down = sw_dn_sfc - sw_up_sfc + lw_dn_sfc - up_sfc
        assert col == pytest.approx(toa_net_down - sfc_net_down,
                                    abs=2.0)

    def test_night_no_shortwave(self):
        s, dz = self._state()
        rad = radiation_step(s, dz, mu0=0.0)
        assert float(rad.sw_down_sfc.max()) == 0.0
        # pure LW: an emitting atmosphere cools on average
        assert float(rad.heating.mean()) < 0.0

    def test_clouds_increase_lw_down(self):
        s, dz = self._state()
        rhoq = s.rhoq.at[1, 3:5].set(0.5e-3 * s.rho[3:5])  # cloud layer
        s_cld = s._replace(rhoq=rhoq)
        clear = radiation_step(s, dz, mu0=0.0)
        cloudy = radiation_step(s_cld, dz, mu0=0.0)
        assert (float(cloudy.lw_down_sfc.mean())
                > float(clear.lw_down_sfc.mean()) + 1.0)


class TestPblStep:
    def test_warm_surface_grows_mixed_layer(self):
        nz, ny, nx, dz = 16, 6, 6, 200.0
        s, _, _ = balanced_state(nz, ny, nx, dz,
                                 qv_prof=0.006 * np.ones(nz))
        zc = jnp.asarray((np.arange(nz) + 0.5) * dz, jnp.float32)
        # surface 5 K warmer than the air → upward heat flux heats level 0
        from scale_letkf_tpu.model.dycore import moist_pressure
        q = s.rhoq / s.rho[None]
        p = moist_pressure(s.rhot, q)
        temp = (s.rhot / s.rho) * (p / PRE00) ** (RD / CPDRY)
        tsfc = temp[0] + 5.0
        th0 = s.rhot / s.rho
        res = jax.jit(lambda st: pbl_step(st, 60.0, dz, zc, tsfc))(s)
        th1 = res.state.rhot / res.state.rho
        assert float(res.sfc.shf.mean()) > 0
        assert float((th1[0] - th0[0]).mean()) > 0     # heated from below
        assert np.isfinite(np.asarray(res.state.rhot)).all()
        # mass untouched
        np.testing.assert_array_equal(np.asarray(res.state.rho),
                                      np.asarray(s.rho))


class TestSuite:
    def test_composed_step_runs_and_stays_finite(self):
        nz, ny, nx, dz = 12, 8, 8, 400.0
        qv = 0.008 * np.exp(-(np.arange(nz) + 0.5) * dz / 3000.0)
        s, _, _ = balanced_state(nz, ny, nx, dz, qv_prof=qv)
        s = add_warm_bubble(s, dz, 2000.0, 2000.0, amplitude=2.0)
        zc = jnp.asarray((np.arange(nz) + 0.5) * dz, jnp.float32)
        pcfg = PhysicsConfig(mp_scheme="kessler", rad_interval=3,
                             slab_capacity=2.0e5)
        phys = init_physics_state(s, dz, pcfg)

        @jax.jit
        def run(s, phys):
            def body(carry, i):
                s, phys = carry
                s, phys = physics_step(s, phys, i, pcfg, 30.0, dz, zc)
                return (s, phys), None
            (s, phys), _ = jax.lax.scan(body, (s, phys),
                                        jnp.arange(6))
            return s, phys

        s2, phys2 = run(s, phys)
        for f in s2:
            assert np.isfinite(np.asarray(f)).all()
        assert np.isfinite(np.asarray(phys2.tsfc)).all()
        # slab temperature moved (radiative + turbulent forcing nonzero)
        assert float(jnp.abs(phys2.tsfc - phys.tsfc).max()) > 1e-4

    def test_cycle_driver_with_suite(self, tmp_path):
        """Forecast through CycleDriver with the full suite enabled via
        the [physics] TOML section (the CLI wiring path)."""
        import tomllib  # noqa: F401  (py311+ guaranteed in-image)
        from scale_letkf_tpu.cli.main import (
            load_config_and_grid, make_driver)
        cfg_path = tmp_path / "exp.toml"
        cfg_path.write_text("""
[domain]
nx = 8
ny = 8
nz = 8
dx = 2000.0
dy = 2000.0
dz = 500.0
dt = 1.0
qv_surface = 0.006

[physics]
mp_scheme = "kessler"
use_pbl = true
use_radiation = true
rad_interval = 2
slab_capacity = 1.0e5

[ensemble]
member = 2
""")
        cfg, grid, dycfg, dom = load_config_and_grid(str(cfg_path))
        driver = make_driver(cfg, grid, dycfg, dom)
        from scale_letkf_tpu.model.ideal import (
            balanced_state, perturb_ensemble)
        qv = 0.006 * np.exp(-np.asarray(grid.cz) / 3000.0)
        s0, _, _ = balanced_state(8, 8, 8, 500.0, qv_prof=qv)
        ens = perturb_ensemble(jax.random.PRNGKey(0), s0, 2,
                               amplitude=0.3)
        out = driver.forecast(ens, 10)
        for f in out:
            assert np.isfinite(np.asarray(f)).all()

        # --- persisted slab skin state (the reference's land/ocean restart
        # carrying skin temperature between forecasts, common_scale.f90:60)
        assert driver.tsfc is not None
        tsfc_1 = np.asarray(driver.tsfc)
        assert tsfc_1.shape == (2, 8, 8)
        out2 = driver.forecast(out, 10)
        tsfc_2 = np.asarray(driver.tsfc)
        # the second forecast CONTINUED the slab state, not a cold restart:
        # its skin state differs from what a cold start from `out` gives
        driver2_tsfc = np.asarray(jax.vmap(
            lambda s: init_physics_state(
                s, driver.dz_phys, driver._phys_cfg).tsfc)(out))
        assert not np.allclose(tsfc_1, tsfc_2)
        assert np.abs(tsfc_2 - tsfc_1).max() < np.abs(
            driver2_tsfc - tsfc_1).max() + 5.0  # evolved, not re-diagnosed

        # --- physics-derived screen diagnostics reach H(x): the PS obs
        # operator consumes t2m/q2m (prsadj, common_obs_scale.f90:600); the
        # stability-corrected t2m from the skin state must differ from the
        # neutral diagnosis and so must the surface-obs O-B
        from scale_letkf_tpu.state import state_trans, state_to_history
        from scale_letkf_tpu.model.dycore import to_collocated
        g0 = state_trans(to_collocated(jax.tree.map(lambda a: a[0], out2)))
        f_neutral = state_to_history(g0, driver.z_full, driver.topo)
        f_phys = state_to_history(g0, driver.z_full, driver.topo,
                                  tsfc=driver.tsfc[0])
        assert not np.allclose(np.asarray(f_phys["t2m"]),
                               np.asarray(f_neutral["t2m"]))
        assert np.isfinite(np.asarray(f_phys["t2m"])).all()
        assert np.abs(np.asarray(f_phys["t2m"])
                      - np.asarray(f_neutral["t2m"])).max() < 15.0

    def test_unknown_physics_key_rejected(self, tmp_path):
        from scale_letkf_tpu.cli.main import (
            load_config_and_grid, make_driver)
        cfg_path = tmp_path / "exp.toml"
        cfg_path.write_text("""
[domain]
nx = 8
ny = 8
nz = 8

[physics]
bogus_knob = 1
""")
        cfg, grid, dycfg, dom = load_config_and_grid(str(cfg_path))
        with pytest.raises(ValueError, match="bogus_knob"):
            make_driver(cfg, grid, dycfg, dom)
