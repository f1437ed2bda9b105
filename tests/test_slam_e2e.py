"""End-to-end SLAM integration on the synthetic rig world (SURVEY.md §4e):
known trajectory -> track -> ATE should be small."""
import numpy as np
import pytest

import jax.numpy as jnp

from multicol_slam_tpu.io.synthetic import make_world
from multicol_slam_tpu.io.trajectory import ate_rmse, umeyama_align
from multicol_slam_tpu.slam.map_store import MapConfig
from multicol_slam_tpu.slam.system import WORKING, MultiColSLAM
from multicol_slam_tpu.utils.config import ExtractorSettings, SlamSettings
from multicol_slam_tpu.utils.geometry import cayley_to_hom


def run_slam(world, n_frames=None, use_loops=False):
    settings = SlamSettings(
        fps=25.0,
        extractor=ExtractorSettings(n_features=world.n_feats, n_levels=1, scale_factor=1.2),
    )
    cfg = MapConfig(
        max_keyframes=64,
        max_points=4000,
        n_cams=world.rig.n_cams,
        feats_per_cam=world.n_feats,
        n_levels=1,
        scale_factor=1.2,
    )
    slam = MultiColSLAM(world.rig, settings, cfg, use_loop_closing=use_loops)
    T = n_frames or len(world.poses)
    for t in range(T):
        slam.track(feats=world.frame_features(t), timestamp=world.timestamps[t])
    return slam


def gt_positions(world, metrics):
    ids = [m.frame_id for m in metrics]
    Ms = np.asarray(cayley_to_hom(jnp.asarray(world.poses[ids])))
    return Ms[:, :3, 3]


def est_positions(metrics):
    Ms = np.asarray(cayley_to_hom(jnp.asarray(np.stack([m.pose for m in metrics]))))
    return Ms[:, :3, 3]


@pytest.fixture(scope="module")
def line_world():
    return make_world(n_points=500, n_frames=30, n_cams=2, n_feats=250,
                      noise_px=0.2, trajectory="line", seed=1)


def test_initializes_and_tracks(line_world):
    slam = run_slam(line_world)
    states = [m.state for m in slam.trajectory]
    assert WORKING in states, f"never reached WORKING: states={set(states)}"
    working = [m for m in slam.trajectory if m.state == WORKING]
    assert len(working) >= 15, f"only {len(working)} tracked frames"


def test_trajectory_accuracy(line_world):
    slam = run_slam(line_world)
    working = [m for m in slam.trajectory if m.state == WORKING]
    est = est_positions(working)
    gt = gt_positions(line_world, working)
    # monocular gauge: align with similarity (scale free)
    aligned = umeyama_align(est, gt, with_scale=True)
    rmse = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, -1))))
    # ground truth spans ~1.3 m at 0.2px/60f noise (~1px at Lafida focal):
    # demand <=6% trajectory-scale ATE
    assert rmse < 0.08, f"ATE RMSE {rmse:.4f} m"


def test_keyframes_and_map_grow(line_world):
    slam = run_slam(line_world)
    assert slam.store.kf_valid.sum() >= 2
    assert slam.store.pt_valid.sum() >= 50


def test_ate_helper():
    t = np.arange(10.0)
    p = np.stack([t, np.zeros(10), np.zeros(10)], -1)
    # shifted + scaled copy should align to ~0
    q = 2.0 * p + np.array([5.0, 1.0, 0.0])
    assert ate_rmse(t, q, t, p, align=True, with_scale=True) < 1e-6
    assert ate_rmse(t, p + np.array([0.5, 0, 0]), t, p, align=False) == pytest.approx(0.5)
