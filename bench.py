#!/usr/bin/env python
"""Benchmark: per-chip tracking throughput of the TPU-native MultiCol-SLAM.

Measures the per-frame hot path on Lafida-shaped load (3 fisheye cameras,
754x480, 400 features x 8 pyramid levels — Slam_Settings_indoor1.yaml) plus
BA iteration throughput, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference system is real-time gated at 25 fps on a laptop CPU
(BASELINE.md: Camera.fps 25, frame budget 40 ms, i7-3630QM). vs_baseline is
our frames/s over 25.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.slam.features import extract_features_jit
    from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, track_stage
    from multicol_slam_tpu.utils.config import ExtractorSettings

    rng = np.random.default_rng(0)
    C, H, W = 3, 480, 754
    settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
    world = make_world(n_points=4096, n_frames=4, n_cams=C, n_feats=400, noise_px=0.3,
                       trajectory="line", seed=3)
    rig = world.rig
    # widen the synthetic cameras to the Lafida sensor size
    from multicol_slam_tpu.models.camera import OmniCamera
    from multicol_slam_tpu.models.rig import MultiCamRig

    cams = OmniCamera.from_params(
        [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
        [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
        [[1.0, 0.0, 0.0]] * C,
        [[W / 2.0, H / 2.0]] * C,
        [[W, H]] * C,
    )
    rig = MultiCamRig.from_cayley(cams, np.asarray(rig.Mc_cayley))

    images = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))
    mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
    intr = jnp.asarray(rig.cams.to_vector())
    L = 4096
    pts = LocalPoints(
        X=jnp.asarray(rng.normal(size=(L, 3)).astype(np.float32) * 3 + np.array([0, 0, 6], np.float32)),
        desc=jnp.asarray(rng.integers(0, 256, (L, 32), dtype=np.uint8)),
        min_dist=jnp.full((L,), 0.5),
        max_dist=jnp.full((L,), 25.0),
        valid=jnp.ones((L,), bool),
    )
    pose0 = jnp.zeros(6, jnp.float32)

    def frame(images):
        feats = extract_features_jit(images, rig.cams, settings)
        out1 = track_stage(mc6, intr, rig.cams, feats, pose0, pts,
                           radius=15.0, th_desc=96.0)
        out2 = track_stage(mc6, intr, rig.cams, feats, out1.pose, pts,
                           radius=4.0, th_desc=96.0)
        return out2.pose, out2.n_inliers

    # warmup/compile
    p, n = frame(images)
    p.block_until_ready()
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p, n = frame(images)
    p.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iters / dt
    print(
        json.dumps(
            {
                "metric": "tracking_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (3x754x480 fisheye rig, 400 feats x 8 levels + 2 pose stages)",
                "vs_baseline": round(fps / 25.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
