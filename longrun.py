#!/usr/bin/env python
"""Long-run host-scaling artifact (VERDICT r4 task 6).

An out-and-back corridor tracked with oracle features for ~1.6k frames at an
aggressive keyframe cadence: the map grows past the store's initial
256-keyframe capacity (doubling growth), the per-frame host bookkeeping
(local-map vote, point-stats scans — now one-pass C scans in
native/mapops.cpp) is timed against map size, and on the return leg loop
closures fire over a >300-keyframe graph, driving the essential graph's
matrix-free PCG path in vivo (optim/ba.optimize_essential_graph
dense_limit). The reference's posture is the same unbounded map with culling
as the only control (cLocalMapping.cpp:520-597).

Writes LONGRUN.jsonl (one record per 25 frames + a summary line) and prints
the summary. CPU-friendly (oracle features, no pixel pipeline):
    python longrun.py [--frames N] [--out PATH]
"""
import json
import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    n_frames = 1600
    out_path = "LONGRUN.jsonl"
    it = iter(argv)
    for a in it:
        if a == "--frames":
            n_frames = int(next(it))
        elif a == "--out":
            out_path = next(it)
        else:
            raise SystemExit(f"unknown arg {a}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    from multicol_slam_tpu.utils.jaxcache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.models.vocab import KeyFrameDatabase, build_vocabulary
    from multicol_slam_tpu.slam.map_store import MapConfig
    from multicol_slam_tpu.slam.system import WORKING, MultiColSLAM
    from multicol_slam_tpu.utils.config import ExtractorSettings, SlamSettings

    world = make_world(n_points=6000, n_frames=n_frames, n_cams=3, n_feats=150,
                       noise_px=0.4, trajectory="outback", landmarks="corridor",
                       max_vis_dist=5.0, seed=5)
    settings = SlamSettings(fps=7.5, extractor=ExtractorSettings(
        n_features=150, n_levels=1))
    cfg = MapConfig(max_keyframes=256, max_points=20000, n_cams=3,
                    feats_per_cam=150, n_levels=1)
    slam = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=True)
    slam.loop_closer.voc = build_vocabulary(world.descs, k=9, depth=3)
    slam.loop_closer.db = KeyFrameDatabase(slam.loop_closer.voc)

    # instrument the per-frame host bookkeeping (the tracker's local-map
    # vote) and the per-keyframe stats scan
    vote_ms: list = []
    stats_ms: list = []
    orig_vote = slam._local_map_points_locked
    orig_stats = slam.store.update_point_stats_many

    def timed_vote(seed_pts):
        t0 = time.perf_counter()
        out = orig_vote(seed_pts)
        vote_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    def timed_stats(ps):
        t0 = time.perf_counter()
        out = orig_stats(ps)
        stats_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    slam._local_map_points_locked = timed_vote
    slam.store.update_point_stats_many = timed_stats

    records = []
    t_start = time.time()
    max_kf = 0
    for t in range(n_frames):
        f0 = time.perf_counter()
        m = slam.track(feats=world.frame_features(t),
                       timestamp=world.timestamps[t])
        frame_ms = (time.perf_counter() - f0) * 1e3
        max_kf = max(max_kf, int(slam.store.kf_valid.sum()))
        if t % 25 == 24:
            rec = dict(
                frame=t,
                state=m.state,
                n_kf=int(slam.store.kf_valid.sum()),
                n_pt=int(slam.store.pt_valid.sum()),
                kf_capacity=int(slam.store.cfg.max_keyframes),
                pt_capacity=int(slam.store.cfg.max_points),
                vote_ms_mean=round(float(np.mean(vote_ms)), 3) if vote_ms else 0.0,
                vote_ms_max=round(float(np.max(vote_ms)), 3) if vote_ms else 0.0,
                stats_ms_mean=round(float(np.mean(stats_ms)), 3) if stats_ms else 0.0,
                frame_ms=round(frame_ms, 1),
                loops=slam.loop_closer.n_loops_closed,
            )
            records.append(rec)
            vote_ms.clear()
            stats_ms.clear()
            print(json.dumps(rec), flush=True)

    tracked = sum(1 for m in slam.trajectory if m.state == WORKING)
    # scaling verdict: host vote cost on the biggest map vs the earliest map
    early = [r for r in records if r["n_kf"] <= 64]
    late = [r for r in records if r["n_kf"] >= max(records, key=lambda r: r["n_kf"])["n_kf"] * 0.8]
    summary = dict(
        summary=True,
        n_frames=n_frames,
        tracked=tracked,
        max_keyframes_live=max_kf,
        final_kf=records[-1]["n_kf"],
        final_pt=records[-1]["n_pt"],
        kf_capacity=records[-1]["kf_capacity"],
        loops_closed=slam.loop_closer.n_loops_closed,
        loop_locked_max_ms=round(max(slam.loop_closer.locked_phase_ms, default=0.0), 2),
        vote_ms_early=round(float(np.mean([r["vote_ms_mean"] for r in early])), 3) if early else None,
        vote_ms_late=round(float(np.mean([r["vote_ms_mean"] for r in late])), 3) if late else None,
        wall_s=round(time.time() - t_start, 1),
    )
    with open(out_path, "w") as f:
        for r in records + [summary]:
            f.write(json.dumps(r) + "\n")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
