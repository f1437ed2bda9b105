#!/usr/bin/env python
"""Benchmark: per-chip tracking throughput + whole-pipeline latency of the
TPU-native MultiCol-SLAM.

Phase 1 — steady-state tracking throughput at Lafida load (3 fisheye
cameras, 754x480, 400 features x 8 pyramid levels —
Slam_Settings_indoor1.yaml): feature extraction + the ONE fused tracking
program per frame (motion-model stage + local-map stage + robust pose
optimization, slam/tracking_kernels.track_frame_fused), pipelined over 30
frames. The local map is built from REAL extracted features unprojected to
3-D so matching finds realistic inlier counts and the pose optimizer does
real Gauss-Newton work from a perturbed starting pose. Also reports the
synchronous per-frame latency (dispatch + the production packed readback) —
on a tunneled device the readback RPC dominates that number.

Phase 2 — whole-pipeline per-frame latency at the SAME full Lafida shape:
a synthetic indoor world rendered through the REAL Lafida calibration
(/root/reference/Examples/Lafida YAMLs when present, else an equivalent
754x480 fisheye rig), 400 feats x 8 levels, extraction INCLUDED, keyframes
inserted by the reference's NeedNewKeyFrame rules, async mapping + loop
closing active (the CLI default pipeline). Reported twice: paced at the
reference's 40 ms camera period (mult_col_slam_lafida.cpp:134-143 sleeps to
inter-frame time; mapping fills each frame's idle gap, which is the load a
real-time camera produces) and unpaced back-to-back (the stress profile).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference is real-time gated at 25 fps on a laptop CPU
(BASELINE.md). vs_baseline = our steady-state frames/s over 25.
"""
import json
import os
import sys
import time

import numpy as np

LAFIDA_CALIB = "/root/reference/Examples/Lafida"


def _lafida_rig(n_cams=3):
    """The REAL Lafida helmet rig when its calibration files are available,
    else an equivalent-shape 754x480 fisheye rig (same polynomial family)."""
    from multicol_slam_tpu.models.camera import OmniCamera
    from multicol_slam_tpu.models.rig import MultiCamRig
    from multicol_slam_tpu.slam.map_store import hom_to_cayley_np

    if os.path.isdir(LAFIDA_CALIB):
        from multicol_slam_tpu.utils.config import load_rig

        return load_rig(LAFIDA_CALIB), True
    C, H, W = n_cams, 480, 754
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
    return MultiCamRig.from_cayley(cams, hom_to_cayley_np(Mc).astype(np.float32)), False


def main():
    import jax
    import jax.numpy as jnp

    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    from multicol_slam_tpu.slam.features import extract_features_jit
    from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, track_frame_fused
    from multicol_slam_tpu.utils.config import ExtractorSettings

    rng = np.random.default_rng(0)
    settings = ExtractorSettings(n_features=400, n_levels=8, scale_factor=1.2, fast_th=20)
    rig, _ = _lafida_rig()
    C = rig.n_cams
    W, H = (int(x) for x in np.asarray(rig.cams.wh[0]))
    Mc = np.asarray(rig.Mc)

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

    def make_pts(cap, Xa, Da, na):
        return LocalPoints(
            X=jnp.asarray(np.pad(Xa, ((0, cap - len(Xa)), (0, 0)))),
            desc=jnp.asarray(np.pad(Da, ((0, cap - len(Da)), (0, 0)))),
            min_dist=jnp.full((cap,), 0.5),
            max_dist=jnp.full((cap,), 40.0),
            valid=jnp.asarray(np.arange(cap) < na),
        )

    pts2 = make_pts(L, X, D, n)   # the ONE local-map block both stages share
    # perturbed start pose: ~0.5 deg rotation + 3 cm translation, the typical
    # motion-model prediction error the pose stages must absorb
    pose0 = jnp.asarray(np.array([0.002, -0.003, 0.002, 0.02, -0.015, 0.01], np.float32))

    def frame(images):
        feats = extract_features_jit(images, rig.cams, settings)
        return track_frame_fused(mc6, intr, rig.cams, feats, pose0, pts2, pts2,
                                 radius1=15.0, radius2=4.0, th_desc=96.0)

    # warmup/compile
    p = frame(images)
    p.block_until_ready()
    pr = np.asarray(p)
    n_inliers = int(pr[14])  # [pose1(6), n1] + [pose2(6), n_match2, n_inl, ...]
    assert n_inliers >= 100, f"bench sanity: expected a well-matched frame, got {n_inliers} inliers"
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        p = frame(images)
    p.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iters / dt
    # synchronous per-frame latency: the production pattern (one fused
    # program + one packed readback, copy enqueued right after dispatch)
    sync_times = []
    for _ in range(10):
        t0 = time.perf_counter()
        p = frame(images)
        p.copy_to_host_async()
        np.asarray(p)
        sync_times.append((time.perf_counter() - t0) * 1e3)
    sync_ms = float(np.median(sync_times))

    # ---- phase 2: whole-pipeline latency at full Lafida shape -------------
    lat = _pipeline_latency(rig, settings)
    # ---- phase 3: loop closure under real-time pacing ---------------------
    lat.update(_loop_closure_latency())
    out = {
        "metric": "tracking_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": f"frames/s ({C}x{W}x{H} fisheye rig, 400 feats x 8 levels, fused 2-stage tracking, {n_inliers} inliers)",
        "vs_baseline": round(fps / 25.0, 3),
        "sync_frame_ms": round(sync_ms, 2),
    }
    out.update(lat)
    print(json.dumps(out))


def _pipeline_latency(rig, ex_settings, n_frames: int = 140):
    """Full-system per-frame latency at Lafida shape: rendered 754x480 images
    through the (real when available) Lafida calibration, extraction
    included, async mapping + loop closing, keyframes per NeedNewKeyFrame.
    Walking-speed circle through a textured room with per-frame sensor
    noise — sustained KF insertion + mapping load under pacing. (Loop
    closure is measured separately by _loop_closure_latency: this phase's
    motion covers ~half a lap.)"""
    from multicol_slam_tpu.io.render import render_frame
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.slam.map_store import MapConfig
    from multicol_slam_tpu.slam.system import MultiColSLAM
    from multicol_slam_tpu.utils.config import SlamSettings

    import jax
    import jax.numpy as jnp

    real = os.path.isdir(LAFIDA_CALIB)
    # Measure the device->host round trip and size the software pipeline to
    # cover it: the tunneled link's RPC latency varies 28 -> 350+ ms between
    # sessions, and a fixed depth-2 pipeline (80 ms of slack) collapses the
    # paced loop when the link is slow — results arrive many periods late,
    # the motion model lags, and tracking dies for reasons that are the
    # LINK's, not the engine's. Depth = ceil(rtt / period) + 1, floor 2.
    _x = jnp.zeros(16)
    _f = jax.jit(lambda a: a + 1)
    np.asarray(_f(_x))
    _rtts = []
    for _ in range(5):
        _t0 = time.perf_counter()
        np.asarray(_f(_x))
        _rtts.append((time.perf_counter() - _t0) * 1e3)
    rtt_ms = float(np.median(_rtts))
    depth = int(max(2, min(10, np.ceil(rtt_ms / 40.0) + 1)))
    # period 400 -> 0.047 m/frame at radius 3: walking speed at the 25 fps
    # camera rate, the motion profile the reference's keyframe-cadence
    # constants (minFrames=8, baseline>0.2) are tuned for
    world = make_world(n_points=3000, n_frames=n_frames, n_cams=rig.n_cams,
                       n_feats=ex_settings.n_features, noise_px=0.0,
                       trajectory="circle_noyaw", radius=3.0, seed=12,
                       period=400, landmarks="room",
                       max_vis_dist=12.0, rig=rig)
    images = [render_frame(world, t) for t in range(n_frames)]  # uint8 on the wire
    settings = SlamSettings(fps=25.0, extractor=ex_settings)
    cfg = MapConfig(max_keyframes=64, max_points=20000, n_cams=rig.n_cams,
                    feats_per_cam=ex_settings.n_features,
                    n_levels=ex_settings.n_levels,
                    scale_factor=ex_settings.scale_factor)

    # pretrained vocabulary (the reference LOADS small_orb_omni_voc_9_6.yml,
    # cSystem.cpp:60-66 — in-run self-training is a fallback, and its k-means
    # on the mapping worker would show up as a fake multi-hundred-ms frame)
    from multicol_slam_tpu.models.vocab import KeyFrameDatabase, build_vocabulary

    voc = build_vocabulary(world.descs, k=9, depth=3)

    def run(paced: bool):
        slam = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=True,
                            async_mapping=True)
        slam.loop_closer.voc = voc
        slam.loop_closer.db = KeyFrameDatabase(voc)
        times = []
        kf_frames = 0
        period = 1.0 / 25.0
        next_t = time.perf_counter()
        # real-time software pipeline, depth 2: frame t's begin dispatches
        # its fused program and frame t-2's result is consumed in the same
        # iteration — two camera periods (80 ms) of slack cover the device
        # round trip with margin even right after a mapping burst, where a
        # depth-1 pipeline (one 40 ms period vs a ~32 ms round trip) sits at
        # the stability boundary and never re-accumulates slack. Pose
        # prediction spans 2 frames of motion; the stage-1 window absorbs it.
        from collections import deque

        pending = slam.prepare(images[0])
        inflight = deque()
        for t in range(n_frames):
            slept = 0.0
            if paced:
                now = time.perf_counter()
                if now < next_t:
                    slept = next_t - now
                    time.sleep(slept)
                next_t = max(next_t + period, time.perf_counter())
            t0 = time.perf_counter()
            inflight.append(slam.track_begin(feats=pending, timestamp=world.timestamps[t]))
            if t + 1 < n_frames:
                pending = slam.prepare(images[t + 1])
            if len(inflight) >= depth:
                m = slam.track_finish(inflight.popleft())
                kf_frames += int(m.is_keyframe)
            times.append((time.perf_counter() - t0) * 1e3)
        while inflight:
            m = slam.track_finish(inflight.popleft())
            kf_frames += int(m.is_keyframe)
        n_tracked = sum(1 for m in slam.trajectory if m.state == 3)
        slam.wait_mapping_idle()
        n_loops = slam.loop_closer.n_loops_closed
        locked = list(slam.loop_closer.locked_phase_ms)
        slam.shutdown()
        # steady-state window: the first ~30 frames cover initialization and
        # the deliberately-synchronous bootstrap keyframes (~1 s inline
        # mapping each, slam/system._create_keyframe) — a startup transient,
        # not sustained real-time behavior
        return np.asarray(times[30:]), kf_frames, n_tracked, n_loops, locked

    # warmup pass: PACED (same code path as the measured run) so every jit
    # compile — extraction, tracking, the mapping worker's bucketed shapes,
    # the loop-closing programs — happens before measurement
    run(paced=True)
    _prewarm_rare_paths(world.rig, settings, cfg)
    arr_p, kf_p, trk_p, loops_p, locked_p = run(paced=True)
    arr_u, kf_u, _, _, _ = run(paced=False)
    out = {
        "pipeline_p50_ms": round(float(np.percentile(arr_p, 50)), 2),
        "pipeline_p95_ms": round(float(np.percentile(arr_p, 95)), 2),
        "pipeline_worst_ms": round(float(arr_p.max()), 2),
        "pipeline_kf_frames": kf_p,
        "pipeline_tracked_frames": trk_p,
        "pipeline_loops_closed": loops_p,
        # longest CorrectLoop lock-HELD phase: the only window a tracked
        # frame can stall on the loop closer (every device solve of
        # CorrectLoop runs lock-free — slam/loop_closing._correct)
        "loop_locked_max_ms": round(max(locked_p, default=0.0), 2),
        "pipeline_paced_25fps": True,
        "tunnel_rtt_ms": round(rtt_ms, 1),
        "pipeline_depth": depth,
        "pipeline_mode": f"software-pipelined depth {depth} (sized to the measured link RTT): frame t dispatched, frame t-{depth}'s result consumed per iteration; times are per-frame blocking work excl. pacing sleep; steady-state window past the bootstrap transient",
        "pipeline_unpaced_p50_ms": round(float(np.percentile(arr_u, 50)), 2),
        "pipeline_unpaced_p95_ms": round(float(np.percentile(arr_u, 95)), 2),
        "pipeline_shape": f"{rig.n_cams}x754x480 {'real-calib' if real else 'synth-calib'}, "
                          f"{ex_settings.n_features} feats x {ex_settings.n_levels} levels, extraction included",
    }
    # tail regression gate (VERDICT r4 task 2): the paced tail must stay
    # bounded — mapping-burst frames used to blow the budget 10-25x. Reported
    # as an explicit gate field rather than a hard crash: the tunnel's RPC
    # round trip degrades 10x+ at times (measured 28 -> 347 ms within one
    # day) and a latency artifact poisoned by a sick link should record the
    # failure, not erase every other number.
    out["gate_pipeline_p95_le_160ms"] = ("PASS" if out["pipeline_p95_ms"] <= 160.0
                                         else f"FAIL ({out['pipeline_p95_ms']} ms)")
    return out


def _loop_closure_latency(n_frames: int = 135):
    """Phase 3 — a loop closure fires DURING paced real-time tracking and
    the tracker's per-frame latency stays bounded through it (VERDICT r4
    tasks 1+3: the committed evidence that CorrectLoop — snapshot->
    solve->commit, device work lock-free — is real-time-compatible on the
    chip). World: the proven accumulated-drift lap+revisit of
    tests/test_loop_reloc._drift_world (oracle features — this phase
    measures the loop-closing subsystem, phase 2 covers extraction), paced
    at the world's native 7.5 fps camera rate, async mapping (the CLI
    default pipeline)."""
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.models.vocab import KeyFrameDatabase, build_vocabulary
    from multicol_slam_tpu.slam.map_store import MapConfig
    from multicol_slam_tpu.slam.system import MultiColSLAM
    from multicol_slam_tpu.utils.config import ExtractorSettings, SlamSettings

    world = make_world(n_points=1500, n_frames=n_frames, n_cams=3, n_feats=150,
                       noise_px=0.5, trajectory="circle_noyaw", radius=3.0,
                       seed=7, period=85, max_vis_dist=3.0, landmarks="path")
    settings = SlamSettings(fps=7.5, extractor=ExtractorSettings(
        n_features=150, n_levels=1))
    cfg = MapConfig(max_keyframes=64, max_points=8000, n_cams=3,
                    feats_per_cam=150, n_levels=1)
    feats = [world.frame_features(t) for t in range(n_frames)]
    voc = build_vocabulary(world.descs, k=9, depth=3)
    period = 1.0 / 7.5

    def run():
        slam = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=True,
                            async_mapping=True)
        slam.loop_closer.voc = voc
        slam.loop_closer.db = KeyFrameDatabase(voc)
        times, stamps = [], []
        next_t = time.perf_counter()
        for t in range(n_frames):
            now = time.perf_counter()
            if now < next_t:
                time.sleep(next_t - now)
            next_t = max(next_t + period, time.perf_counter())
            t0 = time.perf_counter()
            slam.track(feats=feats[t], timestamp=world.timestamps[t])
            t1 = time.perf_counter()
            times.append((t1 - t0) * 1e3)
            stamps.append((t0, t1))
        slam.wait_mapping_idle()
        loops = slam.loop_closer.n_loops_closed
        spans = list(slam.loop_closer.correct_spans)
        locked = list(slam.loop_closer.locked_phase_ms)
        n_tracked = sum(1 for m in slam.trajectory if m.state == 3)
        slam.shutdown()
        return np.asarray(times[8:]), stamps[8:], loops, spans, locked, n_tracked

    run()  # warmup: compile every program incl. the loop-closing ones
    times, stamps, loops, spans, locked, n_tracked = run()
    during = [ms for ms, (a, b) in zip(times, stamps)
              if any(a <= s1 and b >= s0 for (s0, s1) in spans)]
    out = {
        "loop_loops_closed": loops,
        "loop_tracked_frames": n_tracked,
        "loop_frame_p95_ms": round(float(np.percentile(times, 95)), 2),
        "loop_frame_worst_ms": round(float(times.max()), 2),
        # tracked-frame latency while a CorrectLoop was in progress — the
        # number that used to be unmeasured (the solve ran under the map lock)
        "loop_frame_during_correction_max_ms": round(max(during), 2) if during else None,
        "loop_locked_max_ms": round(max(locked, default=0.0), 2),
        "loop_paced_fps": 7.5,
    }
    # regression gates (VERDICT r4 tasks 1+3), reported as explicit fields
    # (see the phase-2 gate note on tunnel-degradation robustness)
    out["gate_loop_closed_in_window"] = "PASS" if loops >= 1 else "FAIL (0 loops)"
    bound = 2e3 * period
    if during and max(during) > bound:
        out["gate_latency_through_correction"] = f"FAIL ({max(during):.0f} ms > {bound:.0f})"
    else:
        out["gate_latency_through_correction"] = "PASS"
    return out


def _prewarm_rare_paths(rig, settings, cfg):
    """Compile the rare-path program configs (TrackPreviousFrame coarse->fine
    fallback, relocalization confirmation) ahead of the measured runs: a
    first-hit XLA compile mid-run would otherwise show up as a multi-second
    worst-case frame that is compile cost, not pipeline behavior."""
    import jax
    import jax.numpy as jnp

    from multicol_slam_tpu.slam.features import FrameFeatures
    from multicol_slam_tpu.slam.tracking_kernels import (
        LocalPoints, track_frame_fused, track_stage,
    )

    C, K, B = cfg.n_cams, cfg.feats_per_cam, cfg.desc_bytes
    ex = settings.extractor
    feats = FrameFeatures(
        uv=jnp.zeros((C, K, 2)), response=jnp.zeros((C, K)),
        octave=jnp.zeros((C, K), jnp.int32), angle=jnp.zeros((C, K)),
        rays=jnp.zeros((C, K, 3)), desc=jnp.zeros((C, K, B), jnp.uint8),
        dmask=jnp.full((C, K, B), 255, jnp.uint8), valid=jnp.zeros((C, K), bool),
    )

    def lp(cap):
        return LocalPoints(
            X=jnp.zeros((cap, 3)), desc=jnp.zeros((cap, B), jnp.uint8),
            min_dist=jnp.zeros(cap), max_dist=jnp.ones(cap),
            valid=jnp.zeros(cap, bool), normal=jnp.zeros((cap, 3)),
        )

    mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
    intr = jnp.asarray(rig.cams.to_vector())
    pose = jnp.zeros(6)
    lp2 = lp(4096)
    th = 3.0 * B
    common = dict(scale_factor=ex.scale_factor, n_levels=ex.n_levels, th_desc=th)
    outs = [
        track_frame_fused(mc6, intr, rig.cams, feats, pose, lp2, lp2,
                          radius1=60.0, radius2=40.0, **common),
        track_stage(mc6, intr, rig.cams, feats, pose, lp2, radius=8.0, **common),
    ]
    jax.block_until_ready(outs)


if __name__ == "__main__":
    main()
