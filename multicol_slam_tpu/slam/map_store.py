"""Host-side map store: keyframes, map points, observations, covisibility.

Replaces the reference's pointer-graph map (cMap, cMapPoint, cMultiKeyFrame,
SURVEY.md §2 rows 9-11) with fixed-capacity numpy arrays + index tables:

- the observation multimap `map<cMultiKeyFrame*, vector<size_t>>`
  (cMapPoint.h:78) becomes the dense assignment table
  `kf_point[kf, flat_feature] -> point_id` (-1 when none) — one point may be
  attached to several features of the SAME keyframe (multi-camera
  observations), exactly the multi-fisheye specialty;
- covisibility weights / spanning tree / reference-point bookkeeping are
  recomputed from that table with vectorized numpy (no per-entity mutexes:
  the store is single-writer by design, SURVEY.md §5 race-detection note);
- BA problems are *views*: `ba_problem()` gathers flat Observations arrays
  ready for the jitted solver.

Capacities are configurable; overflow policies mirror the reference (oldest
culled keyframes free their slots).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from multicol_slam_tpu.utils.geometry import cayley_to_hom, hom_inverse

BAD_ID = -1


@dataclasses.dataclass
class MapConfig:
    max_keyframes: int = 256
    max_points: int = 20000
    n_cams: int = 3
    feats_per_cam: int = 400
    n_levels: int = 8
    scale_factor: float = 1.2
    desc_bytes: int = 32

    @property
    def feats_per_kf(self) -> int:
        return self.n_cams * self.feats_per_cam


class MapStore:
    """Single-writer SLAM map. All arrays preallocated."""

    def __init__(self, cfg: MapConfig):
        self.cfg = cfg
        K, P, F = cfg.max_keyframes, cfg.max_points, cfg.feats_per_kf
        B = cfg.desc_bytes
        # --- keyframes -----------------------------------------------------
        self.kf_valid = np.zeros(K, bool)
        self.kf_pose = np.zeros((K, 6), np.float32)          # M_t cayley
        self.kf_timestamp = np.zeros(K, np.float64)
        self.kf_frame_id = np.full(K, -1, np.int64)
        # frozen frame features (flattened over cameras: f = cam*feats + i)
        self.kf_uv = np.zeros((K, F, 2), np.float32)
        self.kf_rays = np.zeros((K, F, 3), np.float32)
        self.kf_octave = np.zeros((K, F), np.int32)
        self.kf_angle = np.zeros((K, F), np.float32)
        self.kf_desc = np.zeros((K, F, B), np.uint8)
        self.kf_dmask = np.full((K, F, B), 255, np.uint8)
        self.kf_feat_valid = np.zeros((K, F), bool)
        # feature -> map point assignment (mvpMapPoints)
        self.kf_point = np.full((K, F), BAD_ID, np.int32)
        # --- points --------------------------------------------------------
        self.pt_valid = np.zeros(P, bool)
        self.pt_X = np.zeros((P, 3), np.float32)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros(P, np.float32)
        self.pt_max_dist = np.zeros(P, np.float32)
        self.pt_desc = np.zeros((P, B), np.uint8)
        self.pt_dmask = np.full((P, B), 255, np.uint8)
        self.pt_first_kf = np.full(P, BAD_ID, np.int32)
        self.pt_visible = np.zeros(P, np.int32)   # mnVisible
        self.pt_found = np.zeros(P, np.int32)     # mnFound
        self.pt_created_kfid = np.zeros(P, np.int32)
        self.n_kf = 0
        self.n_pt_alloc = 0
        self._free_pt: List[int] = []
        self._free_kf: List[int] = []
        # loop edges: pairs of KF ids (cMultiKeyFrame loop edges)
        self.loop_edges: List[Tuple[int, int]] = []
        self.scale_factors = cfg.scale_factor ** np.arange(cfg.n_levels)

    # ------------------------------------------------------------------ kfs
    def add_keyframe(self, pose6, feats, timestamp: float, frame_id: int) -> int:
        """feats: FrameFeatures pytree (host arrays ok). Returns kf id."""
        if self._free_kf:
            k = self._free_kf.pop()
        else:
            k = self.n_kf
            if k >= self.cfg.max_keyframes:
                raise RuntimeError("keyframe capacity exceeded")
            self.n_kf += 1
        C, Kf = np.asarray(feats.uv).shape[:2]
        F = self.cfg.feats_per_kf
        self.kf_valid[k] = True
        self.kf_pose[k] = np.asarray(pose6)
        self.kf_timestamp[k] = timestamp
        self.kf_frame_id[k] = frame_id
        self.kf_uv[k] = np.asarray(feats.uv).reshape(F, 2)
        self.kf_rays[k] = np.asarray(feats.rays).reshape(F, 3)
        self.kf_octave[k] = np.asarray(feats.octave).reshape(F)
        self.kf_angle[k] = np.asarray(feats.angle).reshape(F)
        self.kf_desc[k] = np.asarray(feats.desc).reshape(F, -1)
        self.kf_dmask[k] = np.asarray(feats.dmask).reshape(F, -1)
        self.kf_feat_valid[k] = np.asarray(feats.valid).reshape(F)
        self.kf_point[k] = BAD_ID
        return k

    def erase_keyframe(self, k: int):
        """SetBadFlag equivalent: detach all observations, free the slot
        (cMultiKeyFrame.cpp:583-660; spanning-tree reparenting is implicit —
        covisibility is recomputed from the table)."""
        pts = np.unique(self.kf_point[k][self.kf_point[k] >= 0])
        self.kf_valid[k] = False
        self.kf_point[k] = BAD_ID
        self.kf_feat_valid[k] = False
        self._free_kf.append(k)
        for p in pts:
            if self.pt_valid[p] and self.point_n_obs(p) < 2:
                self.erase_point(p)

    def feat_cam(self, f):
        """flat feature index -> camera index (keypoint_to_cam equivalent)."""
        return f // self.cfg.feats_per_cam

    # --------------------------------------------------------------- points
    def add_point(self, X, desc, dmask, first_kf: int, normal, min_dist, max_dist) -> int:
        if self._free_pt:
            p = self._free_pt.pop()
        else:
            p = self.n_pt_alloc
            if p >= self.cfg.max_points:
                raise RuntimeError("point capacity exceeded")
            self.n_pt_alloc += 1
        self.pt_valid[p] = True
        self.pt_X[p] = X
        self.pt_desc[p] = desc
        self.pt_dmask[p] = dmask
        self.pt_first_kf[p] = first_kf
        self.pt_normal[p] = normal
        self.pt_min_dist[p] = min_dist
        self.pt_max_dist[p] = max_dist
        self.pt_visible[p] = 1
        self.pt_found[p] = 1
        self.pt_created_kfid[p] = first_kf
        return p

    def erase_point(self, p: int):
        self.pt_valid[p] = False
        mask = self.kf_point == p
        self.kf_point[mask] = BAD_ID
        self._free_pt.append(p)

    def replace_point(self, old: int, new: int):
        """cMapPoint::Replace — redirect all observations of `old` to `new`
        unless the keyframe already observes `new` in the same slot context."""
        ks, fs = np.nonzero(self.kf_point == old)
        for k, f in zip(ks, fs):
            if not (self.kf_point[k] == new).any():
                self.kf_point[k, f] = new
            else:
                self.kf_point[k, f] = BAD_ID
        self.pt_found[new] += self.pt_found[old]
        self.pt_visible[new] += self.pt_visible[old]
        self.pt_valid[old] = False
        self._free_pt.append(old)

    def add_observation(self, k: int, f: int, p: int):
        self.kf_point[k, f] = p

    def erase_observation(self, k: int, f: int):
        self.kf_point[k, f] = BAD_ID

    def point_n_obs(self, p: int) -> int:
        return int((self.kf_point == p).sum())

    def point_observers(self, p: int):
        ks, fs = np.nonzero(self.kf_point == p)
        return ks, fs

    # ---------------------------------------------------- derived structures
    def active_kfs(self) -> np.ndarray:
        return np.nonzero(self.kf_valid)[0]

    def active_points(self) -> np.ndarray:
        return np.nonzero(self.pt_valid)[0]

    def covisibility(self, k: int, min_weight: int = 1) -> Dict[int, int]:
        """KFs sharing map points with k and their shared-point counts
        (UpdateConnections, cMultiKeyFrame.cpp:412-500, threshold applied by
        callers at >=30 / >=100). Scans run in the native mapops library
        when available (multicol_slam_tpu/native.py)."""
        from multicol_slam_tpu import native

        counts = native.covisibility_counts(self.kf_point, self.kf_valid, k)
        return {int(j): int(c) for j, c in enumerate(counts) if c >= min_weight}

    def best_covisible(self, k: int, n: int) -> List[int]:
        cov = self.covisibility(k)
        return [j for j, _ in sorted(cov.items(), key=lambda kv: -kv[1])[:n]]

    def update_point_stats(self, p: int):
        """Recompute distinctive descriptor (median-Hamming medoid,
        cMapPoint.cpp:297-391), mean viewing normal, and scale-invariance
        distance range (:453-497)."""
        ks, fs = self.point_observers(p)
        if len(ks) == 0:
            return
        descs = self.kf_desc[ks, fs]  # [M, B]
        if len(ks) > 1:
            x = np.unpackbits(descs[:, None, :] ^ descs[None, :, :], axis=-1).sum(-1)
            med = np.median(x, axis=1)
            best = int(np.argmin(med))
        else:
            best = 0
        self.pt_desc[p] = descs[best]
        self.pt_dmask[p] = self.kf_dmask[ks[best], fs[best]]
        # normal: mean of (X - camera center) directions; distances from the
        # observing camera centers set the scale-invariance band
        X = self.pt_X[p]
        poses = cayley_to_hom_np(self.kf_pose[ks])
        centers = poses[:, :3, 3]  # body centers (camera offsets are small)
        vecs = X[None] - centers
        dists = np.linalg.norm(vecs, axis=-1) + 1e-12
        self.pt_normal[p] = (vecs / dists[:, None]).mean(0)
        n = np.linalg.norm(self.pt_normal[p])
        if n > 0:
            self.pt_normal[p] /= n
        ref = 0  # reference observation = first
        level = int(self.kf_octave[ks[ref], fs[ref]])
        sf = self.cfg.scale_factor
        dist_ref = dists[ref]
        self.pt_max_dist[p] = dist_ref * (sf ** level)
        self.pt_min_dist[p] = self.pt_max_dist[p] / (sf ** (self.cfg.n_levels - 1))

    # ------------------------------------------------------------ BA export
    def ba_problem(self, kf_ids: np.ndarray, fixed_kf_ids: np.ndarray = None):
        """Flatten (kf, feature)->point into BA arrays for the jitted solver.

        Returns dict with poses/points index maps and Observations columns
        (local indices). Local BA semantics (cOptimizer.cpp:489-909): free
        kfs = kf_ids, fixed kfs = fixed_kf_ids (anchors), points = all points
        seen by kf_ids.
        """
        fixed_kf_ids = np.asarray(fixed_kf_ids if fixed_kf_ids is not None else [], np.int64)
        all_kf = np.concatenate([np.asarray(kf_ids, np.int64), fixed_kf_ids])
        kf_local = {int(k): i for i, k in enumerate(all_kf)}
        # points observed by the free kfs
        pts = self.kf_point[np.asarray(kf_ids, np.int64)]
        pts = np.unique(pts[pts >= 0])
        pt_local = {int(p): i for i, p in enumerate(pts)}
        rows = []
        for k in all_kf:
            fp = self.kf_point[k]
            sel = np.nonzero((fp >= 0) & np.isin(fp, pts))[0]
            for f in sel:
                rows.append((kf_local[int(k)], pt_local[int(fp[f])], int(self.feat_cam(f)), f, int(k)))
        if not rows:
            return None
        rows = np.asarray(rows, np.int64)
        inv_sigma2 = (1.0 / self.scale_factors**2)[
            self.kf_octave[rows[:, 4], rows[:, 3]]
        ].astype(np.float32)
        return dict(
            kf_ids=all_kf,
            pt_ids=pts,
            n_free_kf=len(kf_ids),
            obs_kf=rows[:, 0].astype(np.int32),
            obs_pt=rows[:, 1].astype(np.int32),
            obs_cam=rows[:, 2].astype(np.int32),
            obs_feat=rows[:, 3].astype(np.int32),
            obs_kf_global=rows[:, 4].astype(np.int32),
            obs_uv=self.kf_uv[rows[:, 4], rows[:, 3]],
            obs_inv_sigma2=inv_sigma2,
            poses=self.kf_pose[all_kf].copy(),
            points=self.pt_X[pts].copy(),
        )

    def write_back(self, prob, poses=None, points=None):
        if poses is not None:
            self.kf_pose[prob["kf_ids"][: prob["n_free_kf"]]] = np.asarray(
                poses[: prob["n_free_kf"]]
            )
        if points is not None:
            self.pt_X[prob["pt_ids"]] = np.asarray(points)


def cayley_to_hom_np(c6: np.ndarray) -> np.ndarray:
    """Host-side cayley->hom (avoids device round trip for bookkeeping)."""
    import jax.numpy as jnp

    return np.asarray(cayley_to_hom(jnp.asarray(c6)))
