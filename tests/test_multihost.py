"""Multi-process distributed BA: jax.distributed over 2 local CPU processes.

The BASELINE.md config-5 requirement is BA sharded across N>=2 HOSTS; the
standard pod-free validation is N separate processes on one machine, each
with its own virtual CPU devices, joined through the jax.distributed
coordination service (DCN-path code, not just a single-process mesh).
"""
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    out_path = str(tmp_path / "mh.npz")
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i), out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"
    data = np.load(out_path)
    assert np.isfinite(data["cost"])

    # reference: the same problem solved single-process
    from multicol_slam_tpu.optim.lm import LMConfig, lm_solve
    from multicol_slam_tpu.parallel.distributed import make_large_ba_problem

    noisy, gt, obs, free = make_large_ba_problem(
        n_kfs=8, n_points=400, n_obs=4000, noise_px=0.2, seed=3
    )
    out_s, cost_s = jax.jit(
        lambda p, o, f: lm_solve(p, o, f, LMConfig(max_iters=10, cg_iters=20, solve_mc=False, solve_intr=False))
    )(noisy, obs, free)
    np.testing.assert_allclose(data["poses"], np.asarray(out_s.poses), atol=5e-3)
    # and both must be near the ground truth
    err = float(np.max(np.abs(data["poses"] - np.asarray(gt.poses))))
    assert err < 2e-2, f"multihost BA pose error {err}"
