"""Viewer/publisher artifact rendering (io/viz.py, SURVEY.md §2 rows 20-22)."""
import numpy as np

from multicol_slam_tpu.io.synthetic import make_world
from multicol_slam_tpu.io.viz import Visualizer, render_frame, render_map
from multicol_slam_tpu.slam.map_store import MapConfig, MapStore


def _small_store(world, n_kf=3, n_pts=50):
    cfg = MapConfig(
        max_keyframes=8, max_points=256, n_cams=world.rig.n_cams,
        feats_per_cam=world.n_feats, n_levels=4,
    )
    s = MapStore(cfg)
    for t in range(n_kf):
        k = s.add_keyframe(world.poses[t], world.frame_features(t), float(t), t)
    for i in range(n_pts):
        p = s.add_point(
            world.points[i], world.descs[i], np.full(32, 255, np.uint8),
            first_kf=0, normal=np.zeros(3, np.float32), min_dist=0.1, max_dist=25.0,
        )
        s.add_observation(0, i, p)
        s.add_observation(1, i, p)
    return s


def test_render_map_and_frame(tmp_path):
    world = make_world(n_points=120, n_frames=4, n_cams=2, n_feats=48, seed=1)
    s = _small_store(world)
    out = tmp_path / "map.png"
    ok = render_map(s, world.rig, str(out), current_pose6=world.poses[2])
    assert (out.exists() and out.stat().st_size > 0) or not ok

    C, K = world.rig.n_cams, world.n_feats
    images = np.random.default_rng(0).uniform(0, 255, (C, 96, 128))
    feats = world.frame_features(0)
    tracked = np.zeros((C, K), bool)
    tracked[:, :10] = True
    fout = tmp_path / "frame.png"
    ok = render_frame(
        images, np.asarray(feats.uv), np.asarray(feats.valid), tracked, 3,
        str(fout), n_inliers=10,
    )
    assert (fout.exists() and fout.stat().st_size > 0) or not ok


def test_visualizer_update(tmp_path):
    """Visualizer consumes a live MultiColSLAM snapshot without error."""
    from multicol_slam_tpu.slam.system import MultiColSLAM
    from multicol_slam_tpu.utils.config import ExtractorSettings, SlamSettings

    world = make_world(n_points=200, n_frames=3, n_cams=2, n_feats=48, seed=2)
    settings = SlamSettings(
        extractor=ExtractorSettings(n_features=48, n_levels=2, desc_size=32)
    )
    from multicol_slam_tpu.slam.map_store import MapConfig

    slam = MultiColSLAM(
        world.rig, settings,
        map_cfg=MapConfig(max_keyframes=16, max_points=2048, n_cams=2,
                          feats_per_cam=48, n_levels=2),
        use_loop_closing=False,
    )
    viz = Visualizer(str(tmp_path), every=1)
    C = world.rig.n_cams
    images = np.zeros((C, 96, 128), np.float32)
    for t in range(2):
        m = slam.track(feats=world.frame_features(t), timestamp=float(t))
        viz.update(slam, images, m)
    assert any(p.name.startswith("frame_") for p in tmp_path.iterdir())
