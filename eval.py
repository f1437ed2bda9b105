#!/usr/bin/env python
"""End-to-end accuracy evaluation (BASELINE.md north star 1).

Scripts the full verify recipe: render a Lafida-layout synthetic dataset
(full pixel pipeline — fisheye images, FAST/ORB extraction, the real CLI),
run the CLI exactly as on Lafida (4 positional args, MKFTrajectoryLAFIDA.txt
output), and score ATE RMSE against the known ground-truth trajectory with
the in-repo evaluator (io/trajectory.ate_rmse, Sim3-aligned — the standard
Lafida/TUM protocol the reference evaluates with externally, README.md:
180-199).

Prints ONE JSON line, e.g.
  {"metric": "synthetic_lafida_ate_rmse", "value": 0.0093, "unit": "m", ...}
and is regression-gated by tests/test_eval_accuracy.py. Record results in
EVAL.md.

Usage: python eval.py [--frames N] [--out DIR] [--tpu] [--loops]
"""
import json
import os
import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    n_frames = 35
    out_dir = "/tmp/mcslam_eval"
    use_tpu = False
    drift = 0.0
    it = iter(argv)
    for a in it:
        if a == "--frames":
            n_frames = int(next(it))
        elif a == "--out":
            out_dir = next(it)
        elif a == "--tpu":
            use_tpu = True
        else:
            raise SystemExit(f"unknown arg {a}")

    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    # deterministic artifact: run the sequential pipeline (async mapping
    # interleaves BA with tracking and makes the number run-to-run noisy)
    extra_cli = ["--sync-mapping"]
    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from multicol_slam_tpu.io.render import write_dataset
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.io.trajectory import ate_rmse, load_tum_trajectory

    world = make_world(n_points=600, n_frames=n_frames, n_cams=3, n_feats=200,
                       noise_px=0.0, trajectory="line", seed=7)
    seq_dir = write_dataset(world, out_dir)

    from multicol_slam_tpu.cli import main as cli_main

    traj_path = os.path.join(out_dir, "MKFTrajectoryLAFIDA.txt")
    cwd = os.getcwd()
    os.chdir(out_dir)  # the CLI writes MKFTrajectoryLAFIDA.txt in cwd
    t0 = time.perf_counter()
    try:
        cli_main(["no_voc.yml",
                  os.path.join(seq_dir, "Slam_Settings_synthetic.yaml"),
                  seq_dir, seq_dir] + extra_cli)
    finally:
        os.chdir(cwd)
    wall = time.perf_counter() - t0

    est_t, est_xyz = load_tum_trajectory(traj_path)
    gt_t = world.timestamps
    ate = ate_rmse(est_t, est_xyz, gt_t, world.poses[:, 3:6])
    result = {
        "metric": "synthetic_lafida_ate_rmse",
        "value": round(float(ate), 5),
        "unit": f"m (Sim3-aligned, {len(est_t)}/{n_frames} frames tracked, full pixel pipeline)",
        "frames_tracked": int(len(est_t)),
        "n_frames": n_frames,
        "wall_s": round(wall, 1),
        "platform": "tpu" if use_tpu else "cpu",
    }
    print(json.dumps(result))
    return 0 if np.isfinite(ate) else 1


if __name__ == "__main__":
    raise SystemExit(main())
