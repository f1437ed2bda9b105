#!/usr/bin/env python
"""Benchmark: per-chip tracking throughput of the TPU-native MultiCol-SLAM.

Measures the per-frame hot path on Lafida-shaped load (3 fisheye cameras,
754x480, 400 features x 8 pyramid levels — Slam_Settings_indoor1.yaml):
feature extraction + two projection-guided matching / robust pose-
optimization stages (motion-model stage + local-map stage), pipelined over
30 frames. The local map is built from REAL extracted features unprojected
to 3-D (so matching finds realistic inlier counts and the pose optimizer
does real Gauss-Newton work from a perturbed starting pose — not a
degenerate no-match frame). Prints ONE JSON line:
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

    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    from multicol_slam_tpu.models.camera import OmniCamera, cam_img_to_world
    from multicol_slam_tpu.models.rig import MultiCamRig
    from multicol_slam_tpu.slam.features import extract_features_jit
    from multicol_slam_tpu.slam.map_store import cayley_to_hom_np, hom_to_cayley_np
    from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, track_stage
    from multicol_slam_tpu.utils.config import ExtractorSettings

    rng = np.random.default_rng(0)
    C, H, W = 3, 480, 754
    settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
    cams = OmniCamera.from_params(
        [[-209.2, 0.0, 0.0021, -4.2e-06, 1.77e-08]] * C,
        [[293.7, 150.0, -10.4, 28.2, 7.1, 0.06, 10.4, 0.17, -5.9, 1.18, 3.1, 0.81]] * C,
        [[1.0, 0.0, 0.0]] * C,
        [[W / 2.0, H / 2.0]] * C,
        [[W, H]] * C,
    )
    Mc = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    Mc[1, 0, 3] = 0.2
    Mc[2, 1, 3] = 0.2
    rig = MultiCamRig.from_cayley(cams, hom_to_cayley_np(Mc).astype(np.float32))

    # textured scene image: white noise has dense FAST corners at every level
    images = jnp.asarray(rng.uniform(0, 255, (C, H, W)).astype(np.float32))
    mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
    intr = jnp.asarray(rig.cams.to_vector())

    # ---- build a realistic local map from the frame's own features --------
    # unproject each valid keypoint's ray to a 3-D point at a plausible depth;
    # keep its real descriptor. Matching then recovers these points near
    # their detections, and pose optimization pulls a perturbed start pose
    # back — the same work profile as steady-state tracking (WORKING state).
    feats0 = extract_features_jit(images, rig.cams, settings)
    uv = np.asarray(feats0.uv)
    desc = np.asarray(feats0.desc)
    valid = np.asarray(feats0.valid)
    rays = np.asarray(feats0.rays)
    L = 4096
    Xs, Ds = [], []
    for c in range(C):
        v = valid[c]
        depth = rng.uniform(3.0, 12.0, v.sum()).astype(np.float32)
        Xc = rays[c][v] * depth[:, None]
        Xw = (Mc[c, :3, :3] @ Xc.T).T + Mc[c, :3, 3]
        Xs.append(Xw)
        Ds.append(desc[c][v])
    X = np.concatenate(Xs)[:L]
    D = np.concatenate(Ds)[:L]
    n = len(X)
    pad = L - n
    pts = LocalPoints(
        X=jnp.asarray(np.pad(X, ((0, pad), (0, 0)))),
        desc=jnp.asarray(np.pad(D, ((0, pad), (0, 0)))),
        min_dist=jnp.full((L,), 0.5),
        max_dist=jnp.full((L,), 40.0),
        valid=jnp.asarray(np.arange(L) < n),
    )
    # perturbed start pose: ~0.5 deg rotation + 3 cm translation, the typical
    # motion-model prediction error the pose stages must absorb
    pose0 = jnp.asarray(np.array([0.002, -0.003, 0.002, 0.02, -0.015, 0.01], np.float32))

    def frame(images):
        feats = extract_features_jit(images, rig.cams, settings)
        out1 = track_stage(mc6, intr, rig.cams, feats, pose0, pts,
                           radius=15.0, th_desc=96.0)
        out2 = track_stage(mc6, intr, rig.cams, feats, out1.pose, pts,
                           radius=4.0, th_desc=96.0)
        return out2.pose, out2.n_inliers

    # warmup/compile
    p, n_inl = frame(images)
    p.block_until_ready()
    n_inliers = int(n_inl)
    assert n_inliers >= 100, f"bench sanity: expected a well-matched frame, got {n_inliers} inliers"
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p, n_inl = frame(images)
    p.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iters / dt
    print(
        json.dumps(
            {
                "metric": "tracking_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": f"frames/s (3x754x480 fisheye rig, 400 feats x 8 levels, 2 pose stages, {n_inliers} inliers)",
                "vs_baseline": round(fps / 25.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
