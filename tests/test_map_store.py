"""MapStore capacity policy: a long run grows the store instead of crashing
(the reference's map is unbounded and relies on culling for self-repair,
cLocalMapping.cpp:520-597; VERDICT r3 'missing #6')."""
import numpy as np
import jax.numpy as jnp

from multicol_slam_tpu.slam.features import FrameFeatures
from multicol_slam_tpu.slam.map_store import BAD_ID, MapConfig, MapStore


def _feats(cfg: MapConfig, seed: int) -> FrameFeatures:
    rng = np.random.default_rng(seed)
    C, K, B = cfg.n_cams, cfg.feats_per_cam, cfg.desc_bytes
    return FrameFeatures(
        uv=jnp.asarray(rng.uniform(0, 100, (C, K, 2)).astype(np.float32)),
        response=jnp.ones((C, K), jnp.float32),
        octave=jnp.zeros((C, K), jnp.int32),
        angle=jnp.zeros((C, K), jnp.float32),
        rays=jnp.asarray(rng.normal(size=(C, K, 3)).astype(np.float32)),
        desc=jnp.asarray(rng.integers(0, 256, (C, K, B), dtype=np.uint8)),
        dmask=jnp.full((C, K, B), 255, jnp.uint8),
        valid=jnp.ones((C, K), bool),
    )


def test_store_grows_past_capacity():
    cfg = MapConfig(max_keyframes=8, max_points=64, n_cams=2, feats_per_cam=8,
                    n_levels=1)
    s = MapStore(cfg)
    rng = np.random.default_rng(0)
    pts = []
    # 300 keyframe insertions with points: far beyond the initial 8/64 slots
    for t in range(300):
        f = _feats(cfg, t)
        k = s.add_keyframe(np.zeros(6, np.float32), f, float(t), t)
        p = s.add_point(
            rng.normal(size=3).astype(np.float32),
            np.asarray(f.desc)[0, 0], np.asarray(f.dmask)[0, 0],
            first_kf=k, normal=np.zeros(3, np.float32),
            min_dist=0.1, max_dist=10.0,
        )
        s.add_observation(k, 0, p)
        pts.append((k, p))
    assert s.cfg.max_keyframes >= 300
    assert s.cfg.max_points >= 300
    assert int(s.kf_valid.sum()) == 300
    assert int(s.pt_valid.sum()) == 300
    # observation table stayed consistent across every growth step
    for k, p in pts[::37]:
        assert s.kf_point[k, 0] == p
        assert s.point_n_obs(p) == 1
    # erase still works on grown arrays (free-list reuse across the boundary)
    k0, p0 = pts[5]
    s.erase_keyframe(k0)
    assert not s.kf_valid[k0]
    assert not s.pt_valid[p0]  # single-obs point culled with its KF
    k_new = s.add_keyframe(np.zeros(6, np.float32), _feats(cfg, 999), 999.0, 999)
    assert k_new == k0  # recycled slot


def test_spanning_tree_chain_survives_culling():
    """Covisibility spanning tree (cMultiKeyFrame.h:52-72): parents are
    max-covisibility earlier keyframes, and after heavy culling every
    remaining parent edge still links keyframes that CO-OBSERVE points —
    the property the essential graph's chain edges rely on (a plain
    time-order chain links never-co-observed KFs once the in-between
    keyframes are culled, which the reference never would)."""
    cfg = MapConfig(max_keyframes=64, max_points=512, n_cams=1, feats_per_cam=16,
                    n_levels=1)
    s = MapStore(cfg)
    rng = np.random.default_rng(3)
    # 20 keyframes along a corridor; each observes a sliding window of points
    # so only NEARBY keyframes co-observe
    n_kf, pts_per = 20, 8
    points = []
    for i in range(n_kf * 4):
        points.append(s.add_point(rng.normal(size=3).astype(np.float32),
                                  np.zeros(32, np.uint8), np.full(32, 255, np.uint8),
                                  first_kf=0, normal=np.zeros(3, np.float32),
                                  min_dist=0.1, max_dist=10.0))
    for i in range(n_kf):
        k = s.add_keyframe(np.zeros(6, np.float32), _feats(cfg, i), float(i), i)
        for f in range(pts_per):
            s.add_observation(k, f, points[i * 3 + f])  # stride-3 window overlap
        s.assign_parent(k)
    # parents exist and predate their children
    for k in s.active_kfs()[1:]:
        p = int(s.kf_parent[k])
        assert p != BAD_ID
        assert s.kf_frame_id[p] < s.kf_frame_id[k]
    # cull every second keyframe (heavy): reparenting must re-home children
    for k in range(1, n_kf, 2):
        s.erase_keyframe(k)
    for k in s.active_kfs():
        p = int(s.kf_parent[k])
        if p == BAD_ID:
            continue
        assert s.kf_valid[p], f"kf {k} parented to culled kf {p}"
        shared = s.covisibility(int(k)).get(p, 0)
        assert shared > 0, f"chain edge {k}->{p} links never-co-observed KFs"
