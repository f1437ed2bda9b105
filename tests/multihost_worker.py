"""Worker process for the multi-host distributed-BA test.

Launched N times by tests/test_multihost.py with distinct process ids; each
process owns 2 virtual CPU devices (XLA_FLAGS set by the launcher), joins
the jax.distributed coordination service, solves the shared BA problem with
its observation-row shard, and process 0 dumps the result for the parent to
compare against the single-process solve.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npz>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from multicol_slam_tpu.parallel.distributed import (
        global_mesh,
        init_distributed,
        make_large_ba_problem,
        multihost_bundle_adjust,
        shard_rows_for_process,
    )
    from multicol_slam_tpu.optim.lm import LMConfig
    from multicol_slam_tpu.parallel.ba import pad_observations

    init_distributed(coordinator, num_procs, proc_id)
    mesh = global_mesh()
    n_dev = mesh.devices.size
    # identical seeds on every process -> identical global problem
    noisy, gt, obs, free = make_large_ba_problem(
        n_kfs=8, n_points=400, n_obs=4000, noise_px=0.2, seed=3
    )
    obs = pad_observations(obs, n_dev)
    n_rows = obs.kf.shape[0]
    lo, hi = shard_rows_for_process(n_rows, mesh)
    obs_local = jax.tree.map(lambda x: np.asarray(x)[lo:hi], obs)
    cfg = LMConfig(max_iters=10, cg_iters=20, solve_mc=False, solve_intr=False)
    out, cost = multihost_bundle_adjust(noisy, obs_local, free, mesh, cfg)
    poses = np.asarray(jax.device_get(out.poses))
    points = np.asarray(jax.device_get(out.points))
    if proc_id == 0:
        np.savez(out_path, poses=poses, points=points, cost=float(cost))
    # all processes must exit cleanly for the test to pass
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
