#!/usr/bin/env python
"""Benchmark: distributed bundle-adjustment throughput (BASELINE.md config 5).

Solves the large-map synthetic problem (64 keyframes / 50k points / 500k
observations, parallel/distributed.make_large_ba_problem) with the
matrix-free LM/PCG engine and reports **LM iterations per second** — each LM
iteration = cg_iters Hessian-vector products over the full observation table
plus the robust re-weighting pass — at 1 device and at all visible devices
(observation-sharded mesh, psum-reduced PCG), with scaling efficiency.

On the single-chip bench host this runs 1-device only; run under
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
for the virtual 8-device scaling measurement (the standard way to validate
the sharded path without a pod; tests/test_multihost.py additionally runs it
across 2 separate processes via jax.distributed).

Prints ONE JSON line:
  {"metric": "ba_lm_iterations_per_s", "value": N, "unit": ..., ...}

The reference's BA is g2o LM on one CPU thread with early stop at 15
iterations (cOptimizer.cpp:92-96); it publishes no iterations/s number, so
vs_baseline is normalized against a 5 Hz local-BA cadence x 15 iterations =
75 LM iterations/s equivalent laptop-CPU load (the real-time budget its
mapping thread must meet).
"""
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu8" in argv:
        # virtual 8-device CPU mesh (the env-var route is too late here: the
        # platform plugin registers in sitecustomize, so force it in-process
        # before any backend initializes)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    from multicol_slam_tpu.optim.lm import LMConfig, lm_solve
    from multicol_slam_tpu.parallel.ba import distributed_bundle_adjust, make_mesh
    from multicol_slam_tpu.parallel.distributed import make_large_ba_problem

    import jax.numpy as jnp

    noisy, gt, obs, free = make_large_ba_problem(
        n_kfs=64, n_points=50_000, n_obs=500_000
    )
    # sort the observation table by point id (scatter locality; contiguous
    # shards of a sorted table stay sorted for the distributed path)
    order = np.argsort(np.asarray(obs.pt), kind="stable")
    obs = type(obs)(*(jnp.asarray(np.asarray(c)[order]) for c in obs))
    n_lm = 10
    # gain_eps=0: run ALL n_lm iterations (stable timing, no early-out)
    cfg = LMConfig(max_iters=n_lm, cg_iters=20, gain_eps=0.0,
                   solve_mc=False, solve_intr=False)

    import functools

    single = jax.jit(functools.partial(lm_solve, config=cfg))

    def run_single():
        out, cost = single(noisy, obs, free)
        jax.block_until_ready(out)
        return out, cost

    out, cost = run_single()          # compile
    t0 = time.perf_counter()
    out, cost = run_single()
    dt1 = time.perf_counter() - t0
    iters1 = n_lm / dt1

    n_dev = len(jax.devices())
    result = {
        "metric": "ba_lm_iterations_per_s",
        "value": round(iters1, 2),
        "unit": "LM iters/s (64 KFs, 50k pts, 500k obs, 20 CG/iter, 1 device)",
        "vs_baseline": round(iters1 / 75.0, 3),
        "final_cost": round(float(cost), 1),
        "n_devices_visible": n_dev,
    }
    if n_dev > 1:
        mesh = make_mesh()
        out_d, cost_d = distributed_bundle_adjust(noisy, obs, free, mesh, cfg)  # compile
        jax.block_until_ready(out_d)
        t0 = time.perf_counter()
        out_d, cost_d = distributed_bundle_adjust(noisy, obs, free, mesh, cfg)
        jax.block_until_ready(out_d)
        dtn = time.perf_counter() - t0
        itersn = n_lm / dtn
        result.update({
            "value_n_devices": round(itersn, 2),
            "scaling_efficiency": round(itersn / (iters1 * n_dev), 3),
            "final_cost_n_devices": round(float(cost_d), 1),
        })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
