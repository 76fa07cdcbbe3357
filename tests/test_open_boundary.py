"""Open lateral boundaries (DycoreConfig.lateral='open'): a localized
feature advected out of the domain must EXIT instead of wrapping around
(the reference's limited-area BDY forcing vs doubly-periodic ideal runs,
config/example/config.main.hakushu:72-78)."""

import numpy as np
import jax
import jax.numpy as jnp

import jax.lax

from scale_letkf_tpu.model.dycore import (
    DycoreConfig, DycoreState, rk3_step, lateral_bc, _roll_x,
)
from scale_letkf_tpu.model.boundary import (
    relaxation_weight, apply_boundary_relaxation)
from scale_letkf_tpu.model.ideal import balanced_state


def _blob_case(lateral, nsteps=500):
    NZ, NY, NX = 8, 8, 32
    DZ, DX, DY = 500.0, 1000.0, 1000.0
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    U0 = 15.0
    # uniform eastward wind + tracer blob near the right (+x) boundary
    s0 = s0._replace(rhou=s0.rho * U0)
    xs = (np.arange(NX) + 0.5) * DX
    blob = np.exp(-((xs - 26_000.0) / 2_000.0) ** 2)
    q = np.zeros_like(np.asarray(s0.rhoq))
    q[0] = np.asarray(s0.rho)[None] * blob[None, None, None, :]
    s0 = s0._replace(rhoq=jnp.asarray(q[:, 0]) if q.ndim == 5 else
                     jnp.asarray(q))
    cfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ,
                       lateral=lateral)
    zc = jnp.asarray((np.arange(NZ) + 0.5) * DZ, jnp.float32)
    # Davies relaxation toward the known far field (initial state without
    # the blob), as in real limited-area usage: a raw zero-gradient inflow
    # is ill-posed, the reference always pairs open boundaries with BDY
    # forcing over a buffer
    target = s0._replace(rhoq=jnp.zeros_like(s0.rhoq))
    w2d = relaxation_weight(NY, NX, width=4, tau=20.0)

    @jax.jit
    def run(state):
        def body(c, _):
            c = rk3_step(c, cfg, rho_ref, p_ref, zc)
            if lateral == "open":
                c = apply_boundary_relaxation(c, target, w2d, cfg.dt)
            return c, None
        out, _ = jax.lax.scan(body, state, None, length=nsteps)
        return out

    return s0, run(s0)


def test_blob_exits_open_domain():
    # 500 s at 15 m/s advects the blob 7.5 km — well past the +x boundary
    s0, out_open = _blob_case("open")
    s0p, out_per = _blob_case("periodic")
    q0 = np.asarray(s0.rhoq)[0]
    q_open = np.asarray(out_open.rhoq)[0]
    q_per = np.asarray(out_per.rhoq)[0]

    mass0 = q0.sum()
    # open: most of the blob has left (mass not conserved, by design)
    assert q_open.sum() < 0.5 * mass0
    # open: nothing re-enters at the left third of the domain
    assert np.abs(q_open[..., :10]).max() < 0.05 * q0.max()
    # periodic: mass conserved, blob wrapped into the left part
    np.testing.assert_allclose(q_per.sum(), mass0, rtol=1e-4)
    assert q_per[..., :10].max() > 0.1 * q0.max()
    # open run stays finite/stable at the outflow edge
    for f in out_open:
        assert np.isfinite(np.asarray(f)).all()


def test_shift_clamp_matches_roll_in_interior():
    f = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6, 10)))
    with lateral_bc("open"):
        shifted = _roll_x(f, 1)
    rolled = jnp.roll(f, -1, axis=-1)
    np.testing.assert_allclose(np.asarray(shifted[..., :-1]),
                               np.asarray(rolled[..., :-1]))
    # edge uses clamp, not wraparound
    np.testing.assert_allclose(np.asarray(shifted[..., -1]),
                               np.asarray(f[..., -1]))
