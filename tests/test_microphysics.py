"""Microphysics tests: conservation, phase changes, sedimentation."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.ideal import balanced_state
from scale_letkf_tpu.model.physics import kessler_step
from scale_letkf_tpu.model.microphysics6 import nsw6_step, qsat
from scale_letkf_tpu.constants import T00

NZ, NY, NX, DZ = 12, 6, 6, 500.0


def saturated_state(qv_factor=1.3):
    """Base state with qv = qv_factor × saturation mixing ratio."""
    from scale_letkf_tpu.model.dycore import hydrostatic_reference
    from scale_letkf_tpu.model.ideal import standard_theta_profile
    from scale_letkf_tpu.constants import RD
    theta = standard_theta_profile(NZ, DZ)
    rho1d, p1d = hydrostatic_reference(theta, DZ)
    t1d = p1d / (rho1d * RD)
    qs1d = np.asarray(qsat(jnp.asarray(t1d), jnp.asarray(p1d), ice=False))
    s, rr, pr = balanced_state(NZ, NY, NX, DZ, qv_prof=qs1d * qv_factor)
    return s


def total_water(s):
    return np.asarray(jnp.sum(s.rhoq), np.float64)


def test_kessler_water_conservation_no_sedimentation():
    s = saturated_state()
    s2 = kessler_step(s, 1.0, DZ)
    # supersaturated air condenses
    assert float(s2.rhoq[1].max()) > 0
    # total water conserved up to sedimentation out the bottom (qr tiny at t=0)
    w0 = np.asarray(s.rhoq, np.float64).sum()
    w2 = np.asarray(s2.rhoq, np.float64).sum()
    assert abs(w2 - w0) / w0 < 1e-3
    # latent heating warms where condensing
    assert float((s2.rhot - s.rhot).max()) > 0


def test_nsw6_cold_processes():
    s = saturated_state(qv_factor=1.5)
    # make the upper half very cold: scale rhot down there
    rhot = np.asarray(s.rhot)
    rho = np.asarray(s.rho)
    theta = rhot / rho
    theta[NZ // 2:] *= 0.75          # strongly subfreezing aloft
    s = s._replace(rhot=jnp.asarray(theta * rho))
    s2 = nsw6_step(s, 1.0, DZ)
    q = np.asarray(s2.rhoq / s2.rho[None])
    # ice forms aloft, liquid cloud forms below
    assert q[3, NZ // 2:].max() > 0, "no cloud ice formed in cold air"
    assert q[1, :NZ // 2].max() > 0, "no cloud water formed in warm air"
    assert np.isfinite(np.asarray(s2.rhot)).all()
    # nothing negative
    assert (q >= -1e-12).all()


def test_nsw6_melting_produces_rain():
    s = saturated_state(qv_factor=1.0)
    # place snow in warm air near the surface
    rhoq = np.array(s.rhoq)
    rhoq[4, :3] = 1.0e-3 * np.asarray(s.rho)[:3]
    s = s._replace(rhoq=jnp.asarray(rhoq))
    s2 = nsw6_step(s, 10.0, DZ)
    q2 = np.asarray(s2.rhoq / s2.rho[None])
    assert q2[2, :3].max() > 0, "melting snow did not produce rain"
    # melting cools
    assert float((s2.rhot - s.rhot)[:3].min()) < 0


def test_nsw6_sedimentation_moves_down():
    s = saturated_state(qv_factor=0.2)   # dry: no phase changes
    rhoq = np.array(s.rhoq)
    rhoq[2, 8] = 2.0e-3 * np.asarray(s.rho)[8]   # rain blob aloft
    s = s._replace(rhoq=jnp.asarray(rhoq))
    s2 = s
    for _ in range(20):
        s2 = nsw6_step(s2, 5.0, DZ)
    q2 = np.asarray(s2.rhoq / s2.rho[None])
    q0 = rhoq[2] / np.asarray(s.rho)
    com0 = (np.arange(NZ) * q0.mean(axis=(1, 2))).sum() / q0.mean(axis=(1, 2)).sum()
    w2 = q2[2].mean(axis=(1, 2))
    if w2.sum() > 1e-10:
        com2 = (np.arange(NZ) * w2).sum() / w2.sum()
        assert com2 < com0
    # some rain fell out the bottom over 100 s
    assert np.asarray(s2.rhoq[2], np.float64).sum() < \
        np.asarray(s.rhoq[2], np.float64).sum()


def test_qsat_monotone():
    t = jnp.asarray([260.0, 270.0, 280.0, 290.0, 300.0])
    p = jnp.full(5, 9e4)
    qs_l = np.asarray(qsat(t, p, ice=False))
    qs_i = np.asarray(qsat(t, p, ice=True))
    assert (np.diff(qs_l) > 0).all()
    # ice saturation below liquid saturation in subfreezing air
    assert (qs_i[:2] < qs_l[:2]).all()
