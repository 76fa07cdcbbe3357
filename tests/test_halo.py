"""shard_map halo-exchange dycore: bitwise-level equivalence with the
global roll-based step."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_letkf_tpu.model.dycore import DycoreConfig, rk3_step
from scale_letkf_tpu.model.ideal import balanced_state, add_warm_bubble
from scale_letkf_tpu.parallel.mesh import make_mesh
from scale_letkf_tpu.parallel.halo import rk3_step_halo, exchange_axis

NZ, NY, NX = 12, 16, 16
DZ, DX, DY = 500.0, 2000.0, 2000.0


def test_exchange_axis_periodic():
    mesh = make_mesh(1, 1, 4)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from functools import partial

    x = jnp.arange(16.0).reshape(1, 16)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "dx"),),
             out_specs=P(None, "dx"))
    def f(loc):
        ext = exchange_axis(loc, 1, "dx", 2)
        # return the interior (sanity: round trip)
        return ext[:, 2:-2]

    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "dx"),),
             out_specs=P(None, "dx"))
    def left_halo(loc):
        ext = exchange_axis(loc, 1, "dx", 2)
        return ext[:, :4]  # left halo + first 2 interior

    out = np.asarray(left_halo(x))
    # device 0's left halo comes from the global right edge (periodic)
    np.testing.assert_array_equal(out[0, :2], [14.0, 15.0])


def test_halo_step_matches_global():
    cfg = DycoreConfig(dx=DX, dy=DY, dz=DZ, dt=1.0, ztop=NZ * DZ,
                       sponge_height=4.5e3, sponge_tau=60.0)
    s, rho_ref, p_ref = balanced_state(NZ, NY, NX, DZ)
    s = add_warm_bubble(s, DZ, DX, DY, amplitude=2.0,
                        center=(NX * DX / 2, NY * DY / 2, 1.5e3),
                        radius=(4e3, 4e3, 1.5e3))
    zc = jnp.asarray((np.arange(NZ) + 0.5) * DZ, jnp.float32)

    ref = s
    for _ in range(5):
        ref = rk3_step(ref, cfg, rho_ref, p_ref, zc)

    mesh = make_mesh(1, 2, 2)
    out = s
    step = jax.jit(lambda st: rk3_step_halo(st, cfg, rho_ref, p_ref, zc,
                                            mesh))
    for _ in range(5):
        out = step(out)

    for name, a, b in zip(ref._fields, ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-6, atol=1e-4,
                                   err_msg=f"field {name}")
