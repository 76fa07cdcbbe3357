"""Worker process for the multi-host (2-process) sharded-analysis test.

Launched by tests/test_multihost.py as:
    python tests/mh_worker.py <process_id> <num_processes> <port>

Each worker brings up jax.distributed over CPU (4 virtual devices per
process → 8 global), computes the single-device reference analysis
locally, then runs the SAME analysis mesh-sharded over the global
(member, dy, dx) mesh with the ensemble assembled from process-local
member slabs, and checks its addressable output shards against the
reference (reference analogue: das_letkf under MPI must equal the serial
answer; common_mpi_scale.f90:367-512)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from scale_letkf_tpu.parallel.distributed import (
        init_distributed, global_device_mesh, ensemble_from_process_local)
    init_distributed(f"127.0.0.1:{port}", nproc, pid, local_device_count=4)
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from tests.test_analysis_sharded import make_case
    from scale_letkf_tpu.da.letkf import analyze

    grid, gues, ctx, cfg, z_full = make_case()
    # local single-device reference (identical on every process)
    anal_ref, _, _ = analyze(gues, ctx, cfg, grid, z_full)
    anal_ref = np.asarray(anal_ref)

    mesh = global_device_mesh(2, 2, 2)
    K = gues.shape[0]
    per = K // nproc
    local_members = np.asarray(gues)[pid * per:(pid + 1) * per]
    gues_g = ensemble_from_process_local(mesh, local_members)

    anal_sh, _, diag = analyze(gues_g, ctx, cfg, grid, z_full, mesh=mesh)
    n_checked = 0
    for shard in anal_sh.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), anal_ref[shard.index],
            rtol=1e-5, atol=1e-6)
        n_checked += 1
    assert n_checked > 0
    print(f"[p{pid}] OK checked {n_checked} shards", flush=True)


if __name__ == "__main__":
    main()
