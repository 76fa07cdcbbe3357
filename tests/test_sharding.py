"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_letkf_tpu.parallel.mesh import (
    make_mesh, shard_ensemble, constrain_ensemble, gridpoint_sharding,
    stacked_state_sharding,
)
from scale_letkf_tpu.model.dycore import DycoreConfig, rk3_step, integrate
from scale_letkf_tpu.model.ideal import (
    balanced_state, add_warm_bubble, perturb_ensemble,
)

NZ, NY, NX, K = 10, 16, 16, 4
DZ, DX, DY = 500.0, 2000.0, 2000.0


def setup_ens():
    s0, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    s0 = add_warm_bubble(s0, DZ, DX, DY)
    ens = perturb_ensemble(jax.random.PRNGKey(0), s0, K, amplitude=0.5)
    cfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ)
    zc = jnp.asarray((np.arange(NZ) + 0.5) * DZ, jnp.float32)
    return ens, cfg, rho_ref, p_ref, zc


def test_mesh_shapes():
    mesh = make_mesh(2, 2, 2)
    assert mesh.shape == {"member": 2, "dy": 2, "dx": 2}


def test_sharded_forecast_matches_single_device():
    ens, cfg, rho_ref, p_ref, zc = setup_ens()
    step = jax.jit(jax.vmap(lambda s: rk3_step(s, cfg, rho_ref, p_ref, zc)))
    ref = step(ens)

    mesh = make_mesh(2, 2, 2)
    ens_sh = shard_ensemble(mesh, ens)
    out = step(ens_sh)
    np.testing.assert_allclose(np.asarray(out.rhot), np.asarray(ref.rhot),
                               rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rhow), np.asarray(ref.rhow),
                               rtol=2e-6, atol=1e-5)


@pytest.mark.slow
def test_sharded_multistep_with_constraint():
    ens, cfg, rho_ref, p_ref, zc = setup_ens()
    mesh = make_mesh(2, 2, 2)

    @jax.jit
    def run(e):
        e = constrain_ensemble(mesh, e)
        return jax.vmap(lambda s: integrate(s, cfg, rho_ref, p_ref, zc, 5))(e)

    ens_sh = shard_ensemble(mesh, ens)
    out = run(ens_sh)
    ref = jax.vmap(lambda s: integrate(s, cfg, rho_ref, p_ref, zc, 5))(ens)
    np.testing.assert_allclose(np.asarray(out.rhot), np.asarray(ref.rhot),
                               rtol=2e-5, atol=2e-4)


def test_member_axis_reductions():
    """Ensemble mean over a member-sharded stack == local mean (psum path)."""
    mesh = make_mesh(8, 1, 1)
    x = jnp.arange(8 * 6 * 4 * 4, dtype=jnp.float32).reshape(8, 6, 4, 4)
    sh = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("member"))
    x_sh = jax.device_put(x, sh)
    mean = jax.jit(lambda a: a.mean(axis=0))(x_sh)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x.mean(axis=0)),
                               rtol=1e-6)


def test_gridpoint_sharding_letkf():
    """Batched letkf_core over gridpoints sharded across all 8 devices."""
    from scale_letkf_tpu.ops.letkf_core import letkf_core
    mesh = make_mesh(2, 2, 2)
    B, L, Km = 64, 10, 8
    rng = np.random.default_rng(0)
    hdxb = jnp.asarray(rng.standard_normal((B, L, Km)), jnp.float32)
    rdiag = jnp.ones((B, L), jnp.float32)
    rloc = jnp.asarray(rng.uniform(0.1, 1, (B, L)), jnp.float32)
    dep = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    infl = jnp.ones(B, jnp.float32)
    ref = letkf_core(hdxb, rdiag, rloc, dep, infl)

    gp = gridpoint_sharding(mesh)
    f = jax.jit(lambda *a: letkf_core(*a, infl_update=True),
                in_shardings=(gp, gp, gp, gp, gp))
    out = f(jax.device_put(hdxb, gp), jax.device_put(rdiag, gp),
            jax.device_put(rloc, gp), jax.device_put(dep, gp),
            jax.device_put(infl, gp))
    np.testing.assert_allclose(np.asarray(out.trans), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
