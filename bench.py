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

    # ---- phase 2: whole-pipeline latency WITH keyframe insertions ---------
    # The steady-state fps above measures non-keyframe frames only; the
    # reference's 25 fps gate covers the pipelined whole (mapping + loop
    # closing on worker threads, cSystem.cpp:98,102) with the driver pacing
    # frames to the camera period (mult_col_slam_lafida.cpp:134-143). Run the
    # full system in async-mapping mode on a synthetic sequence with regular
    # keyframe insertions, paced at the reference's 40 ms frame period, and
    # report p50 / p95 / worst per-frame track latency (features
    # precomputed: this phase isolates pipeline stalls, extraction
    # throughput is already in the fps metric). Mapping fills the idle gap
    # of each frame period (cooperative device scheduling); an unpaced
    # back-to-back replay would deny it any gap — a load no real-time
    # camera produces.
    lat = _pipeline_latency()
    out = {
        "metric": "tracking_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": f"frames/s (3x754x480 fisheye rig, 400 feats x 8 levels, 2 pose stages, {n_inliers} inliers)",
        "vs_baseline": round(fps / 25.0, 3),
    }
    out.update(lat)
    print(json.dumps(out))


def _pipeline_latency(n_frames: int = 80):
    import jax.numpy as jnp

    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.slam.map_store import MapConfig
    from multicol_slam_tpu.slam.system import MultiColSLAM
    from multicol_slam_tpu.utils.config import ExtractorSettings, SlamSettings

    world = make_world(n_points=800, n_frames=n_frames, n_cams=3, n_feats=250,
                       noise_px=0.2, trajectory="circle_noyaw", radius=3.0,
                       seed=12, period=int(0.8 * n_frames))
    feats = [world.frame_features(t) for t in range(n_frames)]
    settings = SlamSettings(
        fps=7.5,  # min/max_frames 2/5: force frequent keyframe insertions
        extractor=ExtractorSettings(n_features=world.n_feats, n_levels=1),
    )
    cfg = MapConfig(max_keyframes=64, max_points=8000, n_cams=3,
                    feats_per_cam=world.n_feats, n_levels=1)
    # warmup pass: trigger every jit compile (tracking stages, triangulation,
    # BA buckets) so the measured run reflects pipeline behavior, not XLA
    warm = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=True,
                        async_mapping=True)
    for t in range(min(40, n_frames)):
        warm.track(feats=feats[t], timestamp=world.timestamps[t])
    warm.wait_mapping_idle()
    warm.shutdown()

    slam = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=True,
                        async_mapping=True)
    times = []
    kf_frames = 0
    period = 1.0 / 25.0  # the reference's Camera.fps real-time pacing
    next_t = time.perf_counter()
    for t in range(n_frames):
        now = time.perf_counter()
        if now < next_t:
            time.sleep(next_t - now)
        next_t = max(next_t + period, time.perf_counter())
        t0 = time.perf_counter()
        m = slam.track(feats=feats[t], timestamp=world.timestamps[t])
        times.append((time.perf_counter() - t0) * 1e3)
        kf_frames += int(m.is_keyframe)
    slam.wait_mapping_idle()
    slam.shutdown()
    # drop the first 10 frames: compile warmup, not pipeline behavior
    arr = np.asarray(times[10:])
    return {
        "pipeline_p50_ms": round(float(np.percentile(arr, 50)), 2),
        "pipeline_p95_ms": round(float(np.percentile(arr, 95)), 2),
        "pipeline_worst_ms": round(float(arr.max()), 2),
        "pipeline_kf_frames": kf_frames,
    }


if __name__ == "__main__":
    main()
