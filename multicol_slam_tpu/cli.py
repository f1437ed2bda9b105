"""Lafida runner CLI — argument-compatible with the reference binary.

Usage (mult_col_slam_lafida.cpp:63-164):
    python -m multicol_slam_tpu.cli <path_to_vocabulary> <path_to_settings>
                                    <path_to_calibrations> <path_to_sequence>

Reads `<sequence>/images_and_timestamps.txt` (one line per frame:
`timestamp img0 img1 img2`, :167-198), tracks every frame in
[traj.StartFrame, traj.EndFrame), prints per-frame timing stats at exit
(:150-158 median/mean), and writes `MKFTrajectoryLAFIDA.txt` in the Lafida
TUM format (cSystem.cpp:260-290).

Image loading uses imageio when available, else PPM/PGM via numpy; grayscale
conversion follows Camera.RGB.
"""
from __future__ import annotations

import os
import sys
import time
from typing import List, Tuple

import numpy as np


def load_image_list(path2imgs: str, start: int, end: int) -> Tuple[List[float], List[List[str]]]:
    fn = os.path.join(path2imgs, "images_and_timestamps.txt")
    stamps: List[float] = []
    files: List[List[str]] = []
    with open(fn) as f:
        for cnt, line in enumerate(f, start=1):
            if cnt < start or (end > 0 and cnt >= end):
                continue
            parts = line.split()
            if len(parts) < 4:
                break
            stamps.append(float(parts[0]))
            files.append([os.path.join(path2imgs, p) for p in parts[1:4]])
    return stamps, files


def load_gray(path: str) -> np.ndarray:
    try:
        import imageio.v3 as iio

        img = iio.imread(path)
    except ImportError:
        from PIL import Image  # pillow fallback

        img = np.asarray(Image.open(path))
    if img.ndim == 3:
        img = (img @ np.asarray([0.299, 0.587, 0.114])).astype(np.uint8)
    return img  # native 1-byte depth: the device casts (features.py)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    # optional extras beyond the reference's 4 positional args:
    #   --viz DIR [--viz-every N]   artifact-based viewer (io/viz.py)
    #   --save-map PATH             map checkpoint at exit (io/checkpoint.py)
    #   --metrics PATH              per-frame metrics JSONL
    viz_dir = None
    viz_every = 25
    save_map_path = None
    load_map_path = None
    metrics_path = None
    profile_dir = None
    localization_only = False
    async_mapping = True  # mapping/loop closing on a worker thread (the
    #                       reference's thread layout); --sync-mapping for
    #                       the deterministic sequential pipeline
    pos = []
    it = iter(argv)
    for a in it:
        if a == "--viz":
            viz_dir = next(it)
        elif a == "--viz-every":
            viz_every = int(next(it))
        elif a == "--save-map":
            save_map_path = next(it)
        elif a == "--load-map":
            load_map_path = next(it)
        elif a == "--metrics":
            metrics_path = next(it)
        elif a == "--profile":
            profile_dir = next(it)
        elif a == "--localization":
            localization_only = True
        elif a == "--sync-mapping":
            async_mapping = False
        elif a == "--async-mapping":
            async_mapping = True
        else:
            pos.append(a)
    if len(pos) != 4:
        print(__doc__)
        return 1
    voc_path, settings_path, calib_dir, seq_dir = pos

    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()

    from multicol_slam_tpu.slam.system import MultiColSLAM, WORKING
    from multicol_slam_tpu.utils.config import load_rig, load_slam_settings

    settings = load_slam_settings(settings_path)
    rig = load_rig(calib_dir)
    voc = None
    if os.path.isfile(voc_path):
        try:
            from multicol_slam_tpu.models.vocab import load_dbow2_yaml

            voc = load_dbow2_yaml(voc_path)
            print(f"loaded vocabulary: {voc.n_words} words (k={voc.k}, L={voc.depth})")
        except Exception as e:  # self-trained fallback inside LoopCloser
            print(f"vocabulary load failed ({e}); loop closer will self-train")
    slam = MultiColSLAM(rig, settings, async_mapping=async_mapping)
    if load_map_path is not None:
        # checkpoint/resume (SURVEY.md §5): restart from a saved map and
        # relocalize into it — with --localization this is tracking-only
        # against a frozen prior map
        from multicol_slam_tpu.io.checkpoint import load_map
        from multicol_slam_tpu.slam.local_mapping import LocalMapper
        from multicol_slam_tpu.slam.system import LOST

        slam.store = load_map(load_map_path)
        slam.mapper = LocalMapper(slam.store, rig, use_masks=slam.use_masks,
                                  lock=slam.map_lock)
        if slam.loop_closer is not None:
            from multicol_slam_tpu.slam.loop_closing import LoopCloser

            slam.loop_closer = LoopCloser(slam.store, rig, use_masks=slam.use_masks,
                                          lock=slam.map_lock)
        if async_mapping:
            # re-wire the tracker-priority gates the constructor set on the
            # replaced mapper/loop-closer (same discipline as reset())
            slam.mapper.yield_gate = slam._yield_to_tracker
            if slam.loop_closer is not None:
                slam.loop_closer.yield_gate = slam._yield_to_tracker
        slam.state = LOST
        # a resumed map must survive failed first-frame relocalizations: the
        # LOST auto-reset (<=3 KFs) would silently wipe a small loaded map
        slam.map_resumed = True
        print(f"resumed map: {int(slam.store.kf_valid.sum())} keyframes, "
              f"{int(slam.store.pt_valid.sum())} points")
    if localization_only:
        slam.activate_localization_mode()
    if voc is not None and slam.loop_closer is not None:
        from multicol_slam_tpu.models.vocab import KeyFrameDatabase

        slam.loop_closer.voc = voc
        slam.loop_closer.db = KeyFrameDatabase(voc)

    viz = None
    if viz_dir is not None:
        from multicol_slam_tpu.io.viz import Visualizer

        viz = Visualizer(viz_dir, every=viz_every)

    stamps, files = load_image_list(seq_dir, settings.traj_start_frame, settings.traj_end_frame)
    print(f"tracking {len(stamps)} frames ...")
    if profile_dir is not None:
        # structured device tracing (SURVEY.md §5 tracing: replaces the
        # reference's std::chrono prints with a real profiler timeline)
        import jax

        jax.profiler.start_trace(profile_dir)
    times = []
    # one-frame prefetch: the NEXT frame's image upload + extraction are
    # dispatched right after the current frame's track, so they overlap its
    # readback / the real-time pacing gap (slam.prepare)
    images = np.stack([load_gray(p) for p in files[0]]) if files else None
    pending = slam.prepare(images) if files else None
    for i, (t, imgs) in enumerate(zip(stamps, files)):
        feats_cur, images_cur = pending, images
        t0 = time.perf_counter()
        # dispatch early, consume late: the next frame's disk load + upload +
        # extraction all overlap this frame's device round trip
        h = slam.track_begin(feats=feats_cur, timestamp=t)
        if i + 1 < len(files):
            images = np.stack([load_gray(p) for p in files[i + 1]])
            pending = slam.prepare(images)
        m = slam.track_finish(h)
        times.append(time.perf_counter() - t0)
        if viz is not None:
            viz.update(slam, images_cur, m)
        if i % 50 == 0:
            print(f"frame {i}: state={m.state} inliers={m.n_inliers} {times[-1]*1e3:.1f} ms")
    if profile_dir is not None:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}")
    slam.wait_mapping_idle()
    slam.shutdown()
    times_arr = np.asarray(times) * 1e3
    print(f"p95 tracking time:    {np.percentile(times_arr, 95):.2f} ms | "
          f"worst: {times_arr.max():.2f} ms")
    out = "MKFTrajectoryLAFIDA.txt"
    slam.save_trajectory(out)
    if metrics_path is not None:
        slam.save_metrics(metrics_path)
    if save_map_path is not None:
        slam.save_checkpoint(save_map_path)
    times = np.asarray(times)
    print(f"median tracking time: {np.median(times)*1e3:.2f} ms")
    print(f"mean tracking time:   {np.mean(times)*1e3:.2f} ms")
    print(f"trajectory written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
