"""Split-explicit (HEVI) integrator tests: equivalence with the explicit
core at small dt, stability and speed at large dt."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import DycoreConfig, integrate, to_collocated
from scale_letkf_tpu.model.dycore_si import (
    SplitConfig, rk3_step_si, integrate_si, _thomas_solve,
)
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
from scale_letkf_tpu.state import state_trans, IA_W

NZ, NY, NX = 20, 16, 16
DZ, DX, DY = 500.0, 2000.0, 2000.0


def setup(dt):
    cfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=dt, ztop=NZ * DZ,
                       sponge_height=8.0e3, sponge_tau=120.0)
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    s = add_warm_bubble(s, DZ, DX, DY, amplitude=2.0)
    zc = jnp.asarray((np.arange(NZ) + 0.5) * DZ, jnp.float32)
    return cfg, s, rho_ref, p_ref, zc


def test_thomas_solver():
    rng = np.random.default_rng(0)
    n, m = 12, 5
    a = rng.uniform(-0.3, -0.1, (n, m))
    b = rng.uniform(2.0, 3.0, (n, m))
    c = rng.uniform(-0.3, -0.1, (n, m))
    x_true = rng.standard_normal((n, m))
    # build d = A x
    d = b * x_true
    d[1:] += a[1:] * x_true[:-1]
    d[:-1] += c[:-1] * x_true[1:]
    a[0] = 0.0
    c[-1] = 0.0
    x = _thomas_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                      jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-5)


def test_si_balanced_state_steady():
    cfg, _, rho_ref, p_ref, zc = setup(2.0)
    s, _, _ = balanced_state(NZ, NY, NX, DZ)
    split = SplitConfig(dtau=1.0)
    cfg2 = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=2.0, ztop=NZ * DZ)
    out = integrate_si(s, cfg2, split, rho_ref, p_ref, zc, 25, n_small=4)
    assert float(jnp.abs(out.rhow).max()) < 1e-2
    assert float(jnp.abs(out.rho - s.rho).max()) < 1e-5


@pytest.mark.slow
def test_si_matches_explicit_at_small_dt():
    cfg, s, rho_ref, p_ref, zc = setup(1.0)
    ref = integrate(s, cfg, rho_ref, p_ref, zc, 120)
    split = SplitConfig(dtau=0.5)
    out = integrate_si(s, cfg, split, rho_ref, p_ref, zc, 120, n_small=3)
    w_ref = np.asarray(state_trans(to_collocated(ref))[IA_W])
    w_si = np.asarray(state_trans(to_collocated(out))[IA_W])
    # same updraft structure: high correlation and similar magnitude
    corr = np.corrcoef(w_ref.ravel(), w_si.ravel())[0, 1]
    assert corr > 0.98, f"SI/explicit w correlation {corr}"
    assert abs(w_si.max() - w_ref.max()) < 0.2 * max(w_ref.max(), 0.1)


def test_si_stable_at_large_dt():
    """dt = 6 s on a 2-km grid: far beyond the vertical acoustic limit of
    the explicit core (dz=500 m → ~0.8 s); HEVI must stay stable."""
    cfg, s, rho_ref, p_ref, zc = setup(6.0)
    split = SplitConfig(dtau=0.75)
    out = integrate_si(s, cfg, split, rho_ref, p_ref, zc, 50, n_small=8)
    for f in out:
        assert np.isfinite(np.asarray(f)).all()
    w = np.asarray(state_trans(to_collocated(out))[IA_W])
    assert w.max() > 0.3            # bubble still rises
    assert np.abs(w).max() < 30.0   # no blowup
