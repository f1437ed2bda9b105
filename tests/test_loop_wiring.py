"""Essential-graph PRODUCTION WIRING test (not just the kernel).

Round-2 review found the production `_essential_graph` was a provable no-op
(measurements built from already-corrected poses -> zero residuals). This
test drives LoopCloser._essential_graph exactly as CorrectLoop does —
snapshot of drifted poses, corrected group, loop edge — and asserts the
correction actually distributes over the chain
(cOptimizerLoopStuff.cpp:273-520 semantics)."""
import types

import numpy as np
import pytest

from multicol_slam_tpu.io.synthetic import make_synthetic_rig
from multicol_slam_tpu.slam.loop_closing import LoopCloser
from multicol_slam_tpu.slam.map_store import (
    MapConfig,
    MapStore,
    cayley_to_hom_np,
    hom_inverse_np,
    hom_to_cayley_np,
)

N = 26
RADIUS = 3.0


def _mt_true(i):
    th = 2 * np.pi * i / (N - 1)
    M = np.eye(4)
    M[0, 3] = RADIUS * np.cos(th) - RADIUS
    M[1, 3] = RADIUS * np.sin(th)
    return M


def _drift(i):
    yaw = 0.006 * i
    c, s = np.cos(yaw), np.sin(yaw)
    D = np.eye(4)
    D[:2, :2] = [[c, -s], [s, c]]
    D[0, 3] = 0.01 * i
    return D


def _empty_feats():
    return types.SimpleNamespace(
        uv=np.zeros((3, 4, 2)), rays=np.zeros((3, 4, 3)),
        octave=np.zeros((3, 4), np.int32), angle=np.zeros((3, 4)),
        desc=np.zeros((3, 4, 32), np.uint8),
        dmask=np.full((3, 4, 32), 255, np.uint8),
        valid=np.zeros((3, 4), bool),
    )


def test_essential_graph_distributes_loop_correction():
    rig = make_synthetic_rig(3)
    cfg = MapConfig(max_keyframes=64, max_points=100, n_cams=3,
                    feats_per_cam=4, n_levels=1)
    s = MapStore(cfg)
    for i in range(N):
        s.add_keyframe(hom_to_cayley_np(_drift(i) @ _mt_true(i)),
                       _empty_feats(), float(i), i)
    lc = LoopCloser(s, rig)
    snapshot = {int(j): hom_inverse_np(cayley_to_hom_np(s.kf_pose[j]))
                for j in s.active_kfs()}
    k, cand = N - 1, 0
    # CorrectLoop's propagation already wrote the corrected pose for k
    Tbw_true = hom_inverse_np(_mt_true(k))
    corrected = {k: (Tbw_true[:3, :3], Tbw_true[:3, 3], 1.0)}
    s.kf_pose[k] = hom_to_cayley_np(_mt_true(k))

    def rms():
        e = [np.linalg.norm(cayley_to_hom_np(s.kf_pose[i])[:3, 3] - _mt_true(i)[:3, 3])
             for i in range(N)]
        return float(np.sqrt(np.mean(np.square(e)))), float(np.max(e))

    pre_rms, pre_max = rms()
    assert pre_rms > 0.3  # the drift is substantial before correction
    lc._essential_graph(k, cand, corrected, snapshot)
    post_rms, post_max = rms()
    # linear drift + uniform chain edges -> the graph optimum cancels the
    # drift almost exactly; require an order of magnitude
    assert post_rms < pre_rms / 10.0, (pre_rms, post_rms)
    assert post_max < 0.1, post_max
