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

BAD_ID = -1


def cayley_to_rot_np(c: np.ndarray) -> np.ndarray:
    """Pure-numpy Cayley->SO(3) for host bookkeeping (misc.h:135-162
    semantics; same formula as utils.geometry.cayley_to_rot, but without a
    JAX dispatch — the map store touches thousands of tiny poses per frame)."""
    c = np.asarray(c, np.float64)
    c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2]
    c1s, c2s, c3s = c1 * c1, c2 * c2, c3 * c3
    scale = 1.0 + c1s + c2s + c3s
    R = np.empty(c.shape[:-1] + (3, 3), np.float64)
    R[..., 0, 0] = 1.0 + c1s - c2s - c3s
    R[..., 0, 1] = 2.0 * (c1 * c2 - c3)
    R[..., 0, 2] = 2.0 * (c1 * c3 + c2)
    R[..., 1, 0] = 2.0 * (c1 * c2 + c3)
    R[..., 1, 1] = 1.0 - c1s + c2s - c3s
    R[..., 1, 2] = 2.0 * (c2 * c3 - c1)
    R[..., 2, 0] = 2.0 * (c1 * c3 - c2)
    R[..., 2, 1] = 2.0 * (c2 * c3 + c1)
    R[..., 2, 2] = 1.0 - c1s - c2s + c3s
    return R / scale[..., None, None]


def cayley_to_hom_np(c6: np.ndarray) -> np.ndarray:
    """Pure-numpy [cayley(3), t(3)] -> 4x4 (misc.h:195-226 semantics)."""
    c6 = np.asarray(c6, np.float64)
    M = np.zeros(c6.shape[:-1] + (4, 4), np.float64)
    M[..., :3, :3] = cayley_to_rot_np(c6[..., :3])
    M[..., :3, 3] = c6[..., 3:6]
    M[..., 3, 3] = 1.0
    return M


def rot_to_cayley_np(R: np.ndarray) -> np.ndarray:
    """Pure-numpy SO(3)->Cayley: C = (R-I)(R+I)^-1, c = (-C12, C02, -C01)."""
    R = np.asarray(R, np.float64)
    eye = np.eye(3)
    C = np.swapaxes(np.linalg.solve(np.swapaxes(R + eye, -1, -2), np.swapaxes(R - eye, -1, -2)), -1, -2)
    return np.stack([-C[..., 1, 2], C[..., 0, 2], -C[..., 0, 1]], axis=-1)


def hom_to_cayley_np(M: np.ndarray) -> np.ndarray:
    """Pure-numpy 4x4 -> [cayley(3), t(3)]."""
    M = np.asarray(M, np.float64)
    return np.concatenate([rot_to_cayley_np(M[..., :3, :3]), M[..., :3, 3]], axis=-1).astype(np.float32)


def hom_inverse_np(M: np.ndarray) -> np.ndarray:
    """Pure-numpy fast SE(3) inverse (cConverter::invMat semantics)."""
    M = np.asarray(M, np.float64)
    out = np.zeros_like(M)
    Rt = np.swapaxes(M[..., :3, :3], -1, -2)
    out[..., :3, :3] = Rt
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", Rt, M[..., :3, 3])
    out[..., 3, 3] = 1.0
    return out


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
        # covisibility spanning tree (cMultiKeyFrame.h:52-72): parent = the
        # max-covisibility keyframe among earlier-established ones, assigned
        # at the KF's first connection update; the essential graph chains
        # along these edges (cOptimizerLoopStuff.cpp:380-420)
        self.kf_parent = np.full(K, BAD_ID, np.int32)
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
        # incremental observation counts: pt_nobs[p] == (kf_point == p).sum()
        # at all times (every kf_point mutation goes through the methods
        # below) — point_n_obs becomes O(1) instead of a K x F table scan per
        # call, the host bookkeeping scaling fix for large maps
        self.pt_nobs = np.zeros(P, np.int32)
        self.n_kf = 0
        self.n_pt_alloc = 0
        self._free_pt: List[int] = []
        self._free_kf: List[int] = []
        # loop edges: pairs of KF ids (cMultiKeyFrame loop edges)
        self.loop_edges: List[Tuple[int, int]] = []
        self.scale_factors = cfg.scale_factor ** np.arange(cfg.n_levels)
        # observers notified when a keyframe is culled (e.g. the loop
        # closer's BoW inverted file — mpKeyFrameDB->erase in the reference)
        self.on_kf_erased: List = []
        # covisibility cache, invalidated on keyframe insert/erase: the
        # reference MAINTAINS each KF's connection list (UpdateConnections
        # recomputes it only when the KF changes; neighbors read stale
        # weights until their own update) — recomputing the O(K*F) scan on
        # every query made the tracker's per-frame local-map assembly grow
        # linearly with map size (measured 3.5 -> 10+ ms by 140 KFs).
        # Observation-level mutations leave entries stale for at most one
        # keyframe interval, the reference's own staleness window.
        self._covis_cache: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------ capacity
    def _grow_axis0(self, names, old_n: int, new_n: int, fills):
        for name, fill in zip(names, fills):
            a = getattr(self, name)
            grown = np.full((new_n,) + a.shape[1:], fill, a.dtype)
            grown[:old_n] = a
            setattr(self, name, grown)

    def _grow_keyframes(self):
        old, new = self.cfg.max_keyframes, 2 * self.cfg.max_keyframes
        self._grow_axis0(
            ["kf_valid", "kf_pose", "kf_timestamp", "kf_frame_id", "kf_uv",
             "kf_rays", "kf_octave", "kf_angle", "kf_desc", "kf_dmask",
             "kf_feat_valid", "kf_point", "kf_parent"],
            old, new,
            [False, 0, 0, -1, 0, 0, 0, 0, 0, 255, False, BAD_ID, BAD_ID],
        )
        self.cfg.max_keyframes = new
        print(f"[multicol-slam] map grew: keyframe capacity {old} -> {new}")

    def _grow_points(self):
        old, new = self.cfg.max_points, 2 * self.cfg.max_points
        self._grow_axis0(
            ["pt_valid", "pt_X", "pt_normal", "pt_min_dist", "pt_max_dist",
             "pt_desc", "pt_dmask", "pt_first_kf", "pt_visible", "pt_found",
             "pt_created_kfid", "pt_nobs"],
            old, new,
            [False, 0, 0, 0, 0, 0, 255, BAD_ID, 0, 0, 0, 0],
        )
        self.cfg.max_points = new
        print(f"[multicol-slam] map grew: point capacity {old} -> {new}")

    # ------------------------------------------------------------------ kfs
    def add_keyframe(self, pose6, feats, timestamp: float, frame_id: int) -> int:
        """feats: FrameFeatures pytree (host arrays ok). Returns kf id."""
        if self._free_kf:
            k = self._free_kf.pop()
        else:
            k = self.n_kf
            if k >= self.cfg.max_keyframes:
                # overflow policy: grow with doubling (the reference's map is
                # unbounded and relies on culling, cLocalMapping.cpp:520-597;
                # a long run must degrade gracefully, never crash). Downstream
                # jit programs bucket their shapes dynamically, so growth only
                # costs a rebucket compile on first use of the larger size.
                self._grow_keyframes()
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
        self.kf_parent[k] = BAD_ID
        self._covis_cache.clear()
        return k

    def assign_parent(self, k: int):
        """First-connection parent assignment (cMultiKeyFrame's
        UpdateConnections sets mpParent to the max-weight covisible KF the
        first time connections are built): parent = the max-covisibility
        keyframe among EARLIER-established ones (frame-id ordering keeps the
        tree acyclic). No-op once parented."""
        if not self.kf_valid[k] or self.kf_parent[k] != BAD_ID:
            return
        best, bw = BAD_ID, 0
        my_fid = self.kf_frame_id[k]
        for j, w in self.covisibility(int(k)).items():
            if j != k and self.kf_valid[j] and self.kf_frame_id[j] < my_fid and w > bw:
                best, bw = int(j), int(w)
        self.kf_parent[k] = best

    def erase_keyframe(self, k: int):
        """SetBadFlag equivalent: detach all observations, free the slot
        (cMultiKeyFrame.cpp:583-660), and re-home spanning-tree children with
        the reference's candidate loop: candidates start as the erased KF's
        parent; each child attaches to its max-covisibility candidate and
        then becomes a candidate itself."""
        self._covis_cache.clear()
        children = [int(c) for c in np.nonzero((self.kf_parent == k) & self.kf_valid)[0]]
        parent_of_k = int(self.kf_parent[k])
        if children:
            candidates = [parent_of_k] if parent_of_k != BAD_ID else []
            while children and candidates:
                best = None  # (weight, child, new_parent)
                for c in children:
                    cov = self.covisibility(c)
                    for p in candidates:
                        w = cov.get(p, 0)
                        if w > 0 and (best is None or w > best[0]):
                            best = (w, c, p)
                if best is None:
                    break
                _, c, p = best
                self.kf_parent[c] = p
                candidates.append(c)
                children.remove(c)
            for c in children:  # no covisibility with any candidate
                self.kf_parent[c] = parent_of_k
        self.kf_parent[k] = BAD_ID
        row = self.kf_point[k]
        obs = row[row >= 0]
        pts = np.unique(obs)
        np.subtract.at(self.pt_nobs, obs, 1)
        self.kf_valid[k] = False
        self.kf_point[k] = BAD_ID
        self.kf_feat_valid[k] = False
        self._free_kf.append(k)
        for cb in self.on_kf_erased:
            cb(int(k))
        for p in pts:
            if self.pt_valid[p] and self.point_n_obs(p) < 2:
                self.erase_point(p)
        # re-home orphaned reference keyframes: pt_first_kf anchors the
        # loop-closing point remap, and this slot id will be RECYCLED by the
        # free list — a stale reference would remap points via an unrelated
        # future keyframe
        live = pts[self.pt_valid[pts]]
        orphans = live[self.pt_first_kf[live] == k]
        if len(orphans):
            from multicol_slam_tpu import native

            ks2, _, vals = native.find_slots(
                self.kf_point, self.kf_valid, orphans, self.cfg.max_points,
                expected_hits=int(self.pt_nobs[orphans].sum()))
            for p in orphans:
                owners = ks2[vals == p]
                self.pt_first_kf[p] = int(owners[0]) if len(owners) else BAD_ID

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
                self._grow_points()  # see _grow_keyframes
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
        self.pt_nobs[p] = 0
        return p

    def erase_point(self, p: int):
        self.pt_valid[p] = False
        if self.pt_nobs[p] > 0:  # unobserved points need no table scan
            mask = self.kf_point == p
            self.kf_point[mask] = BAD_ID
        self.pt_nobs[p] = 0
        self._free_pt.append(p)

    def replace_point(self, old: int, new: int):
        """cMapPoint::Replace — redirect all observations of `old` to `new`
        unless the keyframe already observes `new` in the same slot context."""
        ks, fs = np.nonzero(self.kf_point == old)
        for k, f in zip(ks, fs):
            if not (self.kf_point[k] == new).any():
                self.kf_point[k, f] = new
                self.pt_nobs[new] += 1
            else:
                self.kf_point[k, f] = BAD_ID
        self.pt_nobs[old] = 0
        self.pt_found[new] += self.pt_found[old]
        self.pt_visible[new] += self.pt_visible[old]
        self.pt_valid[old] = False
        self._free_pt.append(old)

    def add_observation(self, k: int, f: int, p: int):
        old = self.kf_point[k, f]
        if old >= 0:
            self.pt_nobs[old] -= 1
        self.kf_point[k, f] = p
        self.pt_nobs[p] += 1

    def erase_observation(self, k: int, f: int):
        old = self.kf_point[k, f]
        if old >= 0:
            self.pt_nobs[old] -= 1
        self.kf_point[k, f] = BAD_ID

    def point_n_obs(self, p: int) -> int:
        """O(1): maintained incrementally (was a full K x F scan)."""
        return int(self.pt_nobs[p])

    def point_n_obs_many(self, ps: np.ndarray) -> np.ndarray:
        return self.pt_nobs[np.asarray(ps, np.int64)]

    def recount_obs(self):
        """Rebuild pt_nobs from the table (checkpoint load / debugging)."""
        flat = self.kf_point[self.kf_point >= 0]
        self.pt_nobs[:] = 0
        if len(flat):
            np.add.at(self.pt_nobs, flat, 1)

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
        when available (multicol_slam_tpu/native.py); results are cached
        until the keyframe set changes (see _covis_cache)."""
        from multicol_slam_tpu import native

        counts = self._covis_cache.get(int(k))
        if counts is None:
            counts = native.covisibility_counts(self.kf_point, self.kf_valid, k,
                                                n_points=self.cfg.max_points)
            self._covis_cache[int(k)] = counts
        return {int(j): int(c) for j, c in enumerate(counts) if c >= min_weight}

    def best_covisible(self, k: int, n: int) -> List[int]:
        cov = self.covisibility(k)
        return [j for j, _ in sorted(cov.items(), key=lambda kv: -kv[1])[:n]]

    def update_point_stats(self, p: int):
        self.update_point_stats_many(np.asarray([p]))

    def update_point_stats_many(self, ps: np.ndarray):
        """Recompute distinctive descriptor (median-Hamming medoid,
        cMapPoint.cpp:297-391), mean viewing normal, and scale-invariance
        distance range (:453-497) for a batch of points with ONE table scan
        (the per-point variant scanned kf_point once per point — this is the
        host bookkeeping hot loop after every keyframe insertion)."""
        ps = np.unique(np.asarray(ps, np.int64))
        ps = ps[(ps >= 0) & self.pt_valid[ps]]
        if len(ps) == 0:
            return
        # one scan over the observation table for all requested points (C
        # pass in native/mapops.cpp; buffer sized from the incremental
        # pt_nobs counts)
        from multicol_slam_tpu import native

        ks_all, fs_all, pid = native.find_slots(
            self.kf_point, self.kf_valid, ps, self.cfg.max_points,
            expected_hits=int(self.pt_nobs[ps].sum()))
        if len(ks_all) == 0:
            return
        order = np.argsort(pid, kind="stable")
        ks_all, fs_all, pid = ks_all[order], fs_all[order], pid[order]
        starts = np.searchsorted(pid, ps, side="left")
        ends = np.searchsorted(pid, ps, side="right")
        # camera centers of all observing keyframes in one shot (body centers;
        # camera offsets are small vs scene depth)
        centers_all = self.kf_pose[ks_all][:, 3:6].astype(np.float64)
        sf = self.cfg.scale_factor
        inv_band = 1.0 / (sf ** (self.cfg.n_levels - 1))
        for p, s0, s1 in zip(ps, starts, ends):
            if s1 <= s0:
                continue
            ks = ks_all[s0:s1]
            fs = fs_all[s0:s1]
            descs = self.kf_desc[ks, fs]  # [M, B]
            if len(ks) > 1:
                # masked median-Hamming medoid (cMapPoint.cpp:297-391 incl.
                # the masked variant): d = (popcnt(xor&mask_i) +
                # popcnt(xor&mask_j)) / 2. Default all-255 masks make this
                # exactly the plain Hamming medoid.
                masks = self.kf_dmask[ks, fs]
                x = descs[:, None, :] ^ descs[None, :, :]
                xa = np.unpackbits(x & masks[:, None, :], axis=-1).sum(-1)
                xb = np.unpackbits(x & masks[None, :, :], axis=-1).sum(-1)
                best = int(np.argmin(np.median(0.5 * (xa + xb), axis=1)))
            else:
                best = 0
            self.pt_desc[p] = descs[best]
            self.pt_dmask[p] = self.kf_dmask[ks[best], fs[best]]
            vecs = self.pt_X[p][None] - centers_all[s0:s1]
            dists = np.linalg.norm(vecs, axis=-1) + 1e-12
            nrm = (vecs / dists[:, None]).mean(0)
            n = np.linalg.norm(nrm)
            self.pt_normal[p] = nrm / n if n > 0 else nrm
            level = int(self.kf_octave[ks[0], fs[0]])
            self.pt_max_dist[p] = dists[0] * (sf ** level)
            self.pt_min_dist[p] = self.pt_max_dist[p] * inv_band

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
        # sort by LOCAL POINT id for scatter locality only: the LM engine's
        # segment reduction (optim/lm._segsum) is an order-independent
        # scatter-add, but point-contiguous runs keep its updates
        # cache/tile-friendly. No consumer REQUIRES sorted order.
        rows = rows[np.argsort(rows[:, 1], kind="stable")]
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
