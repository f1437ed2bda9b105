"""Loop closing: detection, Sim3 estimation, correction, pose-graph opt.

Capability map of the cLoopClosing thread (SURVEY.md §3.5,
cLoopClosing.cpp:63-668), run after keyframe insertion:

  DetectLoop   : BoW query (models/vocab.py) excluding covisible KFs, skip
                 <10 KFs since last loop (monotonic processed-KF counter —
                 slot ids recycle), min-score from covisibility,
                 consistency-group chaining with threshold 3 (:115-259)
  ComputeSim3  : descriptor matching between map-pointed features (>=15) ->
                 Horn Sim3 RANSAC in body frames with per-observation
                 reprojection scoring (ops/ransac.horn_sim3 + _sim3_reproj_\
                 inliers, = cSim3Solver incl. :374-416) -> optimize_sim3
                 (>=20 inliers) -> Sim3-guided reprojection of the loop
                 neighborhood's map points into the current KF
                 (SearchByProjection(Scw), cORBmatcher.cpp:2270-2440)
                 requiring >=20 total matches (:444)
  CorrectLoop  : snapshot all poses; propagate the corrected Sim3 through
                 the current covisible group, re-map their points (once
                 each), replace current-KF duplicates with their loop
                 points, SearchAndFuse over the corrected group
                 (cLoopClosing.cpp:670-745), run the essential-graph
                 optimization with snapshot-measured chain/covisibility
                 edges + corrected-measured loop edges, record the loop
                 edge; NO global BA afterwards (deliberate, matching the
                 reference's removal of ORB-SLAM2's post-loop GBA)

Convention note (the 'inverse pose' gotcha, SURVEY.md §3.5): our stored pose
M_t maps body->world; Sim3 vertices here are S_bw (world->body), so
M_t = inv(SE3(S_bw)) with translation divided by scale (cLoopClosing.cpp:
558-567 semantics).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.rig import MultiCamRig
from multicol_slam_tpu.models.vocab import (
    KeyFrameDatabase,
    Vocabulary,
    bow_score,
    bow_vector,
    build_vocabulary,
    transform_words,
)
from multicol_slam_tpu.optim.ba import Sim3Edges, Sim3Obs, optimize_essential_graph, optimize_sim3
from multicol_slam_tpu.ops.matching import hamming_matrix
from multicol_slam_tpu.ops.ransac import ransac_sim3
from multicol_slam_tpu.slam.map_store import (
    BAD_ID,
    MapStore,
    cayley_to_hom_np,
    hom_inverse_np,
    hom_to_cayley_np,
)
from multicol_slam_tpu.utils.geometry import (
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)

MIN_KFS_BETWEEN_LOOPS = 10     # cLoopClosing.cpp:129
CONSISTENCY_TH = 3             # :48
MIN_BOW_MATCHES = 15           # :299
MIN_SIM3_INLIERS = 20          # :378
MIN_TOTAL_MATCHES = 20         # :444
COVIS_EDGE_MIN = 100           # essential-graph covisibility weight (:309)
SIM3_REPROJ_CHI2 = 9.210       # cSim3Solver per-observation gate (:374-416)


def _np_sim3_apply(R: np.ndarray, t: np.ndarray, s: float, X: np.ndarray) -> np.ndarray:
    return (s * (X @ R.T) + t).astype(np.float32)


def _np_sim3_inverse(R: np.ndarray, t: np.ndarray, s: float):
    Ri = R.T
    si = 1.0 / s
    ti = -si * (Ri @ t)
    return Ri, ti, si


def _np_sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) o (Rb,tb,sb): apply b first, then a."""
    return Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb


class LoopCloser:
    def __init__(self, store: MapStore, rig: MultiCamRig, voc: Optional[Vocabulary] = None,
                 use_masks: bool = False, lock=None):
        from multicol_slam_tpu.slam.local_mapping import _NullLock

        self.store = store
        self.rig = rig
        self.voc = voc
        self.use_masks = use_masks
        # held ONLY around CorrectLoop (store mutation); detection and Sim3
        # estimation read benignly-stale state lock-free, like the reference's
        # deliberately-commented-out map-update mutex (cMap.h:39)
        self.lock = lock if lock is not None else _NullLock()
        # tracker-priority gate before device dispatches (see LocalMapper)
        self.yield_gate = None
        self.db: Optional[KeyFrameDatabase] = KeyFrameDatabase(voc) if voc else None
        self.consistency_groups: List[Tuple[Set[int], int]] = []
        self.mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
        self.intr = jnp.asarray(rig.cams.to_vector())
        self.n_loops_closed = 0
        # True while CorrectLoop is in progress: the tracker's NeedNewKeyFrame
        # gate refuses insertions meanwhile (the reference blocks insertion
        # while the mapper is stopped for a loop correction,
        # cTracking.cpp:899-901) so the correction's snapshot set stays the
        # keyframe set being committed.
        self.loop_correcting = False
        # observability for the real-time contract: wall-time of every
        # lock-HELD phase of CorrectLoop (the only windows a tracked frame
        # can stall on this subsystem). The device solve and SearchAndFuse
        # dispatches run lock-free, so these should all be small host-numpy
        # commits; bench/tests gate on the max.
        self.locked_phase_ms: List[float] = []
        # wall-clock [start, end] of each CorrectLoop (perf_counter): lets a
        # paced benchmark attribute tracked-frame latency to the correction
        # window specifically
        self.correct_spans: List[Tuple[float, float]] = []
        self._bootstrap_descs: List[np.ndarray] = []
        # monotonic processed-keyframe counter for the <10-KFs-since-last-loop
        # gate: KF slot ids are recycled by the free list so they are NOT
        # monotonic on long runs — count processed keyframes instead.
        self._n_processed = 0
        self._last_loop_at = -MIN_KFS_BETWEEN_LOOPS
        store.on_kf_erased.append(self.on_keyframe_erased)

    # ------------------------------------------------------------------
    def _ensure_vocab(self, k: int):
        """Self-bootstrapped vocabulary: if none was provided, train one from
        the first keyframes' descriptors (the reference *requires* a
        pre-trained file; self-training is our standalone-capable default)."""
        if self.voc is not None:
            return True
        s = self.store
        descs = s.kf_desc[k][s.kf_feat_valid[k]]
        if len(descs):
            self._bootstrap_descs.append(descs)
        total = sum(len(d) for d in self._bootstrap_descs)
        if total < 3000:
            return False
        self.voc = build_vocabulary(np.concatenate(self._bootstrap_descs), k=9, depth=3)
        self.db = KeyFrameDatabase(self.voc)
        self._bootstrap_descs = []
        # backfill all existing keyframes
        for j in np.nonzero(s.kf_valid)[0]:
            if int(j) != k:
                self.db.add(int(j), self._kf_bow(int(j)))
        return True

    def _kf_bow(self, k: int) -> Dict[int, float]:
        s = self.store
        descs = s.kf_desc[k][s.kf_feat_valid[k]]
        return bow_vector(self.voc, transform_words(self.voc, descs))

    def on_keyframe_erased(self, k: int):
        """Keep the inverted file consistent with keyframe culling (the
        reference calls mpKeyFrameDB->erase on SetBadFlag)."""
        if self.db is not None:
            self.db.erase(int(k))

    # ------------------------------------------------------------------
    def process(self, k: int) -> bool:
        """Full loop pipeline for new keyframe k. Returns True if a loop was
        closed (poses/points corrected in the MapStore)."""
        self._n_processed += 1
        if not self._ensure_vocab(k):
            return False
        bow_k = self._kf_bow(k)
        candidates = self._detect(k, bow_k)
        self.db.add(k, bow_k)
        if not candidates:
            return False
        for cand in candidates:
            ok = self._try_close(k, cand)
            if ok:
                self.n_loops_closed += 1
                self._last_loop_at = self._n_processed
                self.consistency_groups = []
                return True
        return False

    # ------------------------------------------------------------------
    def _detect(self, k: int, bow_k) -> List[int]:
        """DetectLoop (cLoopClosing.cpp:115-259)."""
        s = self.store
        if (
            self._n_processed - self._last_loop_at < MIN_KFS_BETWEEN_LOOPS
            or s.kf_valid.sum() < MIN_KFS_BETWEEN_LOOPS
        ):
            return []
        # exclusion + minScore use CONNECTED keyframes (covisibility weight
        # >= 15, the UpdateConnections edge threshold) — not every KF sharing
        # a single point, which on high-overlap scenes is the whole map
        cov = s.covisibility(k, min_weight=15)
        exclude = set(cov) | {k}
        # minScore: lowest BoW similarity to a covisible KF (:141-160)
        min_score = 1.0
        for j in cov:
            sc = bow_score(bow_k, self.db.kf_bow.get(j, {}))
            min_score = min(min_score, sc)
        min_score = max(min_score, 0.01)
        cands = self.db.query(bow_k, exclude, min_score)
        if not cands:
            self.consistency_groups = []
            return []
        # covisibility-group score accumulation (cMultiKeyFrameDatabase.cpp:
        # 162-211): candidates vote as covisible groups, keep the best KF of
        # each group clearing 0.75x the best group's accumulated score
        score = dict(cands)
        cands = [(kf, score[kf]) for kf in self._group_accumulate(cands)]
        # consistency-group chaining (:190-250)
        new_groups: List[Tuple[Set[int], int]] = []
        consistent: List[int] = []
        for kf, score in cands:
            group = set(s.covisibility(kf)) | {kf}
            matched = False
            for prev_group, count in self.consistency_groups:
                if group & prev_group:
                    new_groups.append((group, count + 1))
                    if count + 1 >= CONSISTENCY_TH:
                        consistent.append(kf)
                    matched = True
                    break
            if not matched:
                new_groups.append((group, 1))
        self.consistency_groups = new_groups
        return consistent

    # ------------------------------------------------------------------
    def _group_accumulate(self, cands: List[Tuple[int, float]]) -> List[int]:
        """Covisibility-group score accumulation shared by loop detection and
        relocalization retrieval (cMultiKeyFrameDatabase.cpp:162-211 /
        :284-330): each candidate's top-10 covisible group pools the scores
        of its members that are themselves candidates; the group's best
        member represents it; groups under 0.75x the best accumulated score
        are dropped. Returns representative KF ids, best group first."""
        s = self.store
        score = dict(cands)
        out: Dict[int, float] = {}
        best_acc = 0.0
        for kf, sc in cands:
            acc = sc
            best_kf, best_sc = kf, sc
            for j in s.best_covisible(kf, 10):
                sj = score.get(j)
                if sj is not None:
                    acc += sj
                    if sj > best_sc:
                        best_kf, best_sc = j, sj
            out[best_kf] = max(out.get(best_kf, 0.0), acc)
            best_acc = max(best_acc, acc)
        th = 0.75 * best_acc
        keep = sorted(((a, kf) for kf, a in out.items() if a >= th), reverse=True)
        return [kf for _, kf in keep]

    # ------------------------------------------------------------------
    def _loop_neighborhood_points(self, cand: int) -> np.ndarray:
        """Map points of the loop KF and its covisible group (the reference's
        mvpLoopMapPoints, cLoopClosing.cpp:~430)."""
        s = self.store
        group = list(s.covisibility(cand, min_weight=15)) + [cand]
        pts = s.kf_point[np.asarray(group, np.int64)]
        pts = np.unique(pts[pts >= 0])
        return pts[s.pt_valid[pts]] if len(pts) else pts

    def _project_loop_points(self, k: int, pose6_corr: np.ndarray, pts: np.ndarray,
                             radius: float = 10.0, th_desc: float = 64.0):
        """SearchByProjection(Scw) capability (cORBmatcher.cpp:2270-2440):
        project loop-neighborhood map points into KF k's features from the
        Sim3-corrected pose. Returns assign [F] -> index into pts (or -1)."""
        from multicol_slam_tpu.slam.features import FrameFeatures
        from multicol_slam_tpu.slam.local_mapping import _bucket
        from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, project_and_match

        s = self.store
        C, K = s.cfg.n_cams, s.cfg.feats_per_cam
        L = _bucket(len(pts), 256)
        pad = L - len(pts)
        lp = LocalPoints(
            X=jnp.asarray(np.pad(s.pt_X[pts], ((0, pad), (0, 0)))),
            desc=jnp.asarray(np.pad(s.pt_desc[pts], ((0, pad), (0, 0)))),
            min_dist=jnp.asarray(np.pad(s.pt_min_dist[pts], (0, pad))),
            max_dist=jnp.asarray(np.pad(s.pt_max_dist[pts], (0, pad), constant_values=1.0)),
            valid=jnp.asarray(np.pad(np.ones(len(pts), bool), (0, pad))),
        )
        fk = FrameFeatures(
            uv=jnp.asarray(s.kf_uv[k].reshape(C, K, 2)),
            response=jnp.zeros((C, K)),
            octave=jnp.asarray(s.kf_octave[k].reshape(C, K)),
            angle=jnp.asarray(s.kf_angle[k].reshape(C, K)),
            rays=jnp.asarray(s.kf_rays[k].reshape(C, K, 3)),
            desc=jnp.asarray(s.kf_desc[k].reshape(C, K, -1)),
            dmask=jnp.asarray(s.kf_dmask[k].reshape(C, K, -1)),
            valid=jnp.asarray(s.kf_feat_valid[k].reshape(C, K)),
        )
        from multicol_slam_tpu.slam.local_mapping import fuse_match

        # callers dispatch this WITHOUT the map lock held (snapshot->device->
        # commit discipline); the fuse loop in _correct yield-gates per KF
        _, _, _, packed = fuse_match(
            self.mc6, self.intr, self.rig.cams, fk,
            jnp.asarray(pose6_corr, jnp.float32), lp, radius,
        )
        packed.copy_to_host_async()
        packed = np.asarray(packed)                 # ONE readback: [3, C*K]
        assign = packed[0].astype(np.int64)
        keep = (packed[2] > 0.5) & (packed[1] <= th_desc)
        out = np.full(s.cfg.feats_per_kf, -1, np.int64)
        out[keep] = assign[keep]
        out[out >= len(pts)] = -1  # padded slots
        return out

    # ------------------------------------------------------------------
    def _try_close(self, k: int, cand: int) -> bool:
        """ComputeSim3 (cLoopClosing.cpp:261-461) + CorrectLoop for one
        candidate."""
        s = self.store
        if self.yield_gate is not None:
            self.yield_gate()
        # --- match map-pointed features between the two KFs (SearchByBoW
        # capability via dense Hamming — 1.2k x 1.2k is one MXU tile) -------
        fk = np.nonzero(s.kf_point[k] >= 0)[0]
        fc = np.nonzero(s.kf_point[cand] >= 0)[0]
        if len(fk) < MIN_BOW_MATCHES or len(fc) < MIN_BOW_MATCHES:
            return False
        if self.use_masks:
            from multicol_slam_tpu.ops.matching import hamming_matrix_masked

            d = np.asarray(hamming_matrix_masked(
                jnp.asarray(s.kf_desc[k][fk]), jnp.asarray(s.kf_dmask[k][fk]),
                jnp.asarray(s.kf_desc[cand][fc]), jnp.asarray(s.kf_dmask[cand][fc]),
            ))
            th = 1.0 * s.cfg.desc_bytes
        else:
            d = np.asarray(hamming_matrix(jnp.asarray(s.kf_desc[k][fk]), jnp.asarray(s.kf_desc[cand][fc])))
            th = 2.0 * s.cfg.desc_bytes
        best = d.argmin(1)
        bestd = d.min(1)
        # mutual + threshold
        back = d.argmin(0)
        mutual = back[best] == np.arange(len(fk))
        okm = mutual & (bestd <= th)
        if okm.sum() < MIN_BOW_MATCHES:
            return False
        pk = s.kf_point[k][fk[okm]]
        pc = s.kf_point[cand][fc[best[okm]]]
        # positions in each body frame (cSim3Solver operates in body frames)
        Tk = cayley_to_hom_np(s.kf_pose[k])      # body->world
        Tc = cayley_to_hom_np(s.kf_pose[cand])
        Xw_k = s.pt_X[pk]
        Xw_c = s.pt_X[pc]
        Xb_k = ((Xw_k - Tk[:3, 3]) @ Tk[:3, :3]).astype(np.float32)
        Xb_c = ((Xw_c - Tc[:3, 3]) @ Tc[:3, :3]).astype(np.float32)
        # --- Horn Sim3 RANSAC: S_kc maps cand-body -> current-body ---------
        # Inlier test = symmetric reprojection through each correspondence's
        # observing camera (cSim3Solver::CheckInliers, cSim3Solver.cpp:
        # 374-416), NOT a 3-D distance: a bad hypothesis can fit 3-D point
        # clouds loosely yet never reproject both ways within chi2.
        P = jnp.asarray(Xb_c, jnp.float32)
        Q = jnp.asarray(Xb_k, jnp.float32)
        cam_k = (fk[okm] // s.cfg.feats_per_cam).astype(np.int32)
        cam_c = (fc[best[okm]] // s.cfg.feats_per_cam).astype(np.int32)
        uv_k = jnp.asarray(s.kf_uv[k][fk[okm]])
        uv_c = jnp.asarray(s.kf_uv[cand][fc[best[okm]]])
        cam_kj = jnp.asarray(cam_k)
        cam_cj = jnp.asarray(cam_c)

        def err_fn(R, t, sc):
            from multicol_slam_tpu.optim.ba import _project_body

            def one(Rh, th, sh):
                X2in1 = sh * jnp.einsum("ij,nj->ni", Rh, P) + th
                Ri, ti, si = sim3_inverse(Rh, th, sh)
                X1in2 = si * jnp.einsum("ij,nj->ni", Ri, Q) + ti
                uv1p, z1 = _project_body(self.mc6, self.intr, cam_kj, X2in1)
                uv2p, z2 = _project_body(self.mc6, self.intr, cam_cj, X1in2)
                e1 = jnp.sum((uv1p - uv_k) ** 2, -1)
                e2 = jnp.sum((uv2p - uv_c) ** 2, -1)
                return (z1 > 0) & (z2 > 0) & (e1 < SIM3_REPROJ_CHI2) & (e2 < SIM3_REPROJ_CHI2)

            return jax.vmap(one)(R, t, sc)

        # with_scale=False / fix_scale=True: the multi-camera rig is METRIC
        # (known extrinsics baseline; initializer.calibrate_metric_scale pins
        # the map gauge), so the loop transform is rigid — estimating a free
        # 7th dof only injects scale noise that the essential graph then
        # smears over every pose. The reference keeps the mono-inherited
        # 7-dof solver (cSim3Solver); the 7-dof path remains available via
        # these flags and is exercised by tests/test_optimizer.py.
        res = ransac_sim3(
            jax.random.PRNGKey(int(s.kf_frame_id[k])), P, Q, jnp.ones(len(P), bool),
            err_fn, n_hyp=300, with_scale=False,
        )
        if int(res.n_inliers) < MIN_SIM3_INLIERS // 2:
            return False
        # --- refine with reprojection GN (optimize_sim3) -------------------
        sobs = Sim3Obs(
            X1=Q, X2=P,
            uv1=uv_k, uv2=uv_c,
            cam1=cam_kj, cam2=cam_cj,
            inv_sigma2_1=jnp.ones(len(P)),
            inv_sigma2_2=jnp.ones(len(P)),
            valid=res.inliers,
        )
        v0 = sim3_log(res.R, res.t, res.s)
        v7, inl, n_inl = optimize_sim3(v0, sobs, self.mc6, self.intr, n_iters=12,
                                       fix_scale=True)
        if int(n_inl) < MIN_SIM3_INLIERS:
            return False
        v7 = np.asarray(v7)
        # --- Sim3-guided match expansion (SearchBySim3 + SearchByProjection
        # (Scw) capability): project the loop neighborhood's points into the
        # current KF from the corrected pose; require >=20 total matches ----
        R, t, sc = (np.asarray(a) for a in sim3_exp(jnp.asarray(v7, jnp.float32)))
        Tc_bw = hom_inverse_np(cayley_to_hom_np(s.kf_pose[cand]))
        Rkw, tkw, skw = _np_sim3_compose(R, t, float(sc), Tc_bw[:3, :3], Tc_bw[:3, 3], 1.0)
        Tbw_corr = np.eye(4)
        Tbw_corr[:3, :3] = Rkw
        Tbw_corr[:3, 3] = tkw / skw
        pose_corr = hom_to_cayley_np(hom_inverse_np(Tbw_corr))
        loop_pts = self._loop_neighborhood_points(cand)
        if len(loop_pts) == 0:
            return False
        assign = self._project_loop_points(k, pose_corr, loop_pts)
        # total matches = features of k matched to a loop point, via either
        # the Sim3 inlier set or the guided projection (reference counts
        # mvpCurrentMatchedPoints entries, cLoopClosing.cpp:431-448)
        matched_feats = set(np.nonzero(assign >= 0)[0].tolist())
        inl_np = np.asarray(inl)
        matched_feats.update(int(f) for f in fk[okm][inl_np])
        if len(matched_feats) < MIN_TOTAL_MATCHES:
            return False
        # feature -> loop point map for duplicate replacement in _correct
        loop_match: Dict[int, int] = {
            int(f): int(loop_pts[assign[f]]) for f in np.nonzero(assign >= 0)[0]
        }
        # the BoW-matched pairs map k's feature to cand's point directly
        for f, p2, good in zip(fk[okm], pc, inl_np):
            if good:
                loop_match[int(f)] = int(p2)
        self._correct(k, cand, v7, loop_match, loop_pts)
        return True

    # ------------------------------------------------------------------
    def _correct(self, k: int, cand: int, v7_kc: np.ndarray,
                 loop_match: Dict[int, int], loop_pts: np.ndarray):
        """CorrectLoop (cLoopClosing.cpp:464-668): S_kc maps cand-body points
        into current-body. Corrected world->body of current:
        S_bw(k)_corr = S_kc o T_bw(cand).

        Lock discipline (snapshot->device->commit, same shape as
        local_mapping.create_new_points): the pose/point propagation and
        duplicate replacement are pure-numpy phases under the map lock; the
        SearchAndFuse projection programs AND the essential-graph solve +
        point remap dispatch with the lock RELEASED (the reference only
        stops the *mapper* during CorrectLoop — tracking keeps running,
        cLoopClosing.cpp:464-490); results commit under the lock with
        validity re-checks. Concurrent tracker writes during the lock-free
        phases are pose/stats only — points and keyframes are created/erased
        exclusively by this worker thread, and new keyframe insertion is
        refused by the tracker's gate while `loop_correcting` is set."""
        import time as _time
        from contextlib import contextmanager

        @contextmanager
        def timed_lock():
            t0 = _time.perf_counter()
            with self.lock:
                t1 = _time.perf_counter()
                yield
                self.locked_phase_ms.append((_time.perf_counter() - t1) * 1e3)
            del t0

        s = self.store
        self.loop_correcting = True
        _t_start = _time.perf_counter()
        try:
            with timed_lock():
                corrected, snapshot, remapped, remap_ref = self._propagate_correction(
                    k, cand, v7_kc, loop_match)
            # --- SearchAndFuse device phase, lock-free (cLoopClosing.cpp:
            # 670-745): project the loop points into every corrected-group KF
            # from its already-corrected pose; descriptor tables are
            # append-only so the benignly-stale read discipline of detection
            # applies here too
            loop_pts_v = loop_pts[s.pt_valid[loop_pts]]
            fuse_assign: Dict[int, np.ndarray] = {}
            for j in corrected:
                if not s.kf_valid[j] or len(loop_pts_v) == 0:
                    continue
                if self.yield_gate is not None:
                    self.yield_gate()
                fuse_assign[j] = self._project_loop_points(
                    j, s.kf_pose[j], loop_pts_v, radius=6.0)
            with timed_lock():
                self._commit_fuse(fuse_assign, loop_pts_v)
                s.update_point_stats_many(np.asarray(sorted(remapped), np.int64))
                # --- essential-graph problem gather (pure numpy, lock) -----
                prob = self._eg_build(k, cand, corrected, snapshot, remap_ref)
            if prob is not None:
                # --- the expensive phase, lock-free: device GN over all
                # keyframes + the all-points remap on the snapshot ----------
                if self.yield_gate is not None:
                    self.yield_gate()
                sol = self._eg_solve(prob)
                with timed_lock():
                    self._eg_commit(prob, sol)
            with timed_lock():
                s.loop_edges.append((k, cand))
        finally:
            self.loop_correcting = False
            self.correct_spans.append((_t_start, _time.perf_counter()))

    def _propagate_correction(self, k: int, cand: int, v7_kc: np.ndarray,
                              loop_match: Dict[int, int]):
        """Lock-held numpy phase of CorrectLoop: snapshot poses, propagate the
        corrected Sim3 through the covisible group, re-map their points, and
        replace current-KF duplicates with their loop points."""
        s = self.store
        # ---- snapshot ALL poses BEFORE any mutation: the essential graph's
        # chain/covisibility measurements must come from the pre-correction
        # state (NonCorrectedSim3, cLoopClosing.cpp:497-520) ----------------
        snapshot: Dict[int, np.ndarray] = {
            int(j): hom_inverse_np(cayley_to_hom_np(s.kf_pose[j]))  # T_bw
            for j in s.active_kfs()
        }
        R, t, sc = (np.asarray(a, np.float64) for a in sim3_exp(jnp.asarray(v7_kc, jnp.float32)))
        sc = float(sc)
        Tc_bw = snapshot[cand]
        # S_kw_corr = S_kc o T_cand_bw  (world -> current body, with scale)
        Rkw, tkw, skw = _np_sim3_compose(R, t, sc, Tc_bw[:3, :3], Tc_bw[:3, 3], 1.0)
        Tk_bw_old = snapshot[k]
        # --- propagate through the covisible group (:497-560) --------------
        group = list(s.covisibility(k, min_weight=15)) + [k]
        group = [j for j in group if j != cand]
        corrected: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        remapped: Set[int] = set()
        # which group KF remapped each point (mnCorrectedByKF/-Reference,
        # cLoopClosing.cpp:520-545): the essential-graph point remap must
        # anchor these points to their CORRECTOR's vertex (whose init pose is
        # the corrected one the point is now consistent with), not to a
        # pt_first_kf outside the group
        remap_ref: Dict[int, int] = {}
        for j in group:
            Tj_bw_old = snapshot[int(j)]
            # T_jk = T_j_bw_old o inv(T_k_bw_old): current-body -> j-body
            Tjk = Tj_bw_old @ np.linalg.inv(Tk_bw_old)
            Rj, tj, sj = _np_sim3_compose(Tjk[:3, :3], Tjk[:3, 3], 1.0, Rkw, tkw, skw)
            corrected[int(j)] = (Rj, tj, sj)
            # write back SE3 pose: M_t = inv([R, t/s])
            Tbw = np.eye(4)
            Tbw[:3, :3] = Rj
            Tbw[:3, 3] = tj / sj
            s.kf_pose[j] = hom_to_cayley_np(np.linalg.inv(Tbw))
            # re-map this KF's points ONCE: X_new = S_jw_corr^-1 (T_jw_old X)
            pts = s.kf_point[j]
            pts = np.unique(pts[pts >= 0])
            pts = np.asarray([p for p in pts if p not in remapped], np.int64)
            if len(pts) == 0:
                continue
            remapped.update(int(p) for p in pts)
            for p in pts:
                remap_ref[int(p)] = int(j)
            Xb_old = s.pt_X[pts] @ Tj_bw_old[:3, :3].T + Tj_bw_old[:3, 3]
            Ri_, ti_, si_ = _np_sim3_inverse(Rj, tj, sj)
            s.pt_X[pts] = _np_sim3_apply(Ri_, ti_, si_, Xb_old)
        # --- replace current-KF duplicates with their loop points (:636-660):
        # where a loop point matched a feature that already has a (new,
        # drift-built) point, the loop point wins ---------------------------
        for f, p_loop in loop_match.items():
            if not s.pt_valid[p_loop]:
                continue
            existing = int(s.kf_point[k, f])
            if existing == p_loop:
                continue
            if existing >= 0 and s.pt_valid[existing]:
                s.replace_point(existing, p_loop)
            else:
                s.add_observation(k, int(f), p_loop)
        return corrected, snapshot, remapped, remap_ref

    # ------------------------------------------------------------------
    def _commit_fuse(self, fuse_assign: Dict[int, np.ndarray], loop_pts: np.ndarray):
        """Lock-held commit of the SearchAndFuse matches: existing conflicting
        points are REPLACED by the loop point (the reference's SearchAndFuse
        uses Fuse with replace-toward-loop semantics, cLoopClosing.cpp:
        670-745)."""
        s = self.store
        touched: List[int] = []
        for j, assign in fuse_assign.items():
            if not s.kf_valid[j]:
                continue
            for f in np.nonzero(assign >= 0)[0]:
                p_loop = int(loop_pts[assign[f]])
                if not s.pt_valid[p_loop]:
                    continue
                existing = int(s.kf_point[j, f])
                if existing == p_loop:
                    continue
                if existing >= 0 and s.pt_valid[existing]:
                    s.replace_point(existing, p_loop)
                else:
                    s.add_observation(j, int(f), p_loop)
                touched.append(p_loop)
        if touched:
            s.update_point_stats_many(np.asarray(touched))

    # ------------------------------------------------------------------
    def _essential_graph(self, k: int, cand: int, corrected: Dict[int, Tuple],
                         snapshot: Dict[int, np.ndarray],
                         remap_ref: Optional[Dict[int, int]] = None):
        """Build+solve+commit in one call (the sequential/test path; _correct
        interleaves the same three phases with the map lock)."""
        prob = self._eg_build(k, cand, corrected, snapshot, remap_ref)
        if prob is not None:
            self._eg_commit(prob, self._eg_solve(prob))

    def _eg_build(self, k: int, cand: int, corrected: Dict[int, Tuple],
                  snapshot: Dict[int, np.ndarray],
                  remap_ref: Optional[Dict[int, int]] = None):
        """Lock-held gather phase of OptimizeEssentialGraph
        (cOptimizerLoopStuff.cpp:273-520): vertices initialized from the
        corrected Sim3s (group) / snapshot (others); chain + covisibility
        edges measured from the PRE-correction snapshot, loop edges measured
        from the corrected estimates — so the residual at the group boundary
        is exactly the loop correction, and GN distributes it over the whole
        graph. Pure numpy (no device dispatch under the map lock); returns a
        self-contained problem dict incl. the point snapshot for the remap."""
        s = self.store
        kfs = [int(j) for j in s.active_kfs()]
        idx = {j: i for i, j in enumerate(kfs)}
        K = len(kfs)
        if K < 3:
            return None
        # vertex init from corrected (group) / snapshot (others). A keyframe
        # inserted between the snapshot and this gather (possible only in the
        # narrow window before the tracker observes loop_correcting) falls
        # back to its CURRENT pose — it was tracked against the already-
        # corrected map, so its pose is consistent with the corrected frame.
        def _fallback_bw(j):
            return hom_inverse_np(cayley_to_hom_np(s.kf_pose[j]))

        vR = np.zeros((K, 3, 3), np.float32)
        vt = np.zeros((K, 3), np.float32)
        vs = np.ones(K, np.float32)
        for j in kfs:
            i = idx[j]
            if j in corrected:
                vR[i], vt[i], vs[i] = corrected[j]
            else:
                Tbw = snapshot.get(j)
                if Tbw is None:
                    Tbw = _fallback_bw(j)
                vR[i], vt[i], vs[i] = Tbw[:3, :3], Tbw[:3, 3], 1.0
        ei, ej, wts = [], [], []
        mR, mt, ms = [], [], []

        def _snap_sim3(j):
            Tbw = snapshot.get(j)
            if Tbw is None:
                Tbw = _fallback_bw(j)
            return Tbw[:3, :3], Tbw[:3, 3], 1.0

        def _curr_sim3(j):
            if j in corrected:
                return corrected[j]
            return _snap_sim3(j)

        def add_edge(a: int, b: int, from_snapshot: bool, weight: float = 1.0):
            get = _snap_sim3 if from_snapshot else _curr_sim3
            Ra, ta, sa = get(a)
            Rb, tb, sb = get(b)
            # measurement S_ba = S_b o S_a^-1
            Rm, tm, sm = _np_sim3_compose(Rb, tb, sb, *_np_sim3_inverse(Ra, ta, sa))
            ei.append(idx[a])
            ej.append(idx[b])
            mR.append(Rm)
            mt.append(tm)
            ms.append(sm)
            wts.append(weight)

        # spanning-tree chain (cOptimizerLoopStuff.cpp:380-420; the tree is
        # cMultiKeyFrame.h:52-72): each KF constrains its max-covisibility
        # parent — after culling, time-adjacent KFs may share zero
        # observations, so a time-order chain would add constraints the
        # reference never would. KFs without a live parent (the root; rare
        # orphans) fall back to their time predecessor to keep the graph
        # connected. Uniform edge weights, like the reference: a 1/time-gap
        # information model was tried and measurably WORSENED raw trajectory
        # error — the estimated trajectory's error profile is shaped by local
        # BA, not by per-frame odometry variance.
        ordered = sorted(kfs, key=lambda j: int(s.kf_frame_id[j]))
        pos = {j: i for i, j in enumerate(ordered)}
        for b in ordered[1:]:
            a = int(s.kf_parent[b])
            if a not in idx or a == b:
                a = ordered[pos[b] - 1]
            add_edge(a, b, from_snapshot=True)
        cov_done = set()
        for a in ordered:
            for b, w in s.covisibility(a).items():
                if w >= COVIS_EDGE_MIN and (b, a) not in cov_done and b in idx:
                    add_edge(a, b, from_snapshot=True)
                    cov_done.add((a, b))
        for (a, b) in s.loop_edges + [(k, cand)]:
            if a in idx and b in idx:
                add_edge(a, b, from_snapshot=False, weight=5.0)
        fixed = np.zeros(K, bool)
        fixed[idx[cand]] = True
        # point snapshot for the lock-free remap: positions + reference KF
        # (each point remaps via its first/corrector KF's old->new transform,
        # reference keeps vScw before optimization, :480-520)
        pts = s.active_points()
        refs = s.pt_first_kf[pts].copy()
        if remap_ref and len(pts):
            rr = np.asarray(list(remap_ref.items()), np.int64)   # [M, 2]
            ppos = np.searchsorted(pts, rr[:, 0])
            ppos = np.clip(ppos, 0, len(pts) - 1)
            ok = pts[ppos] == rr[:, 0]
            refs[ppos[ok]] = rr[ok, 1]
        return dict(
            kfs=kfs, idx=idx,
            vR=vR, vt=vt, vs=vs,
            ei=np.asarray(ei, np.int32), ej=np.asarray(ej, np.int32),
            wts=np.asarray(wts, np.float32),
            mR=np.stack(mR).astype(np.float32), mt=np.stack(mt).astype(np.float32),
            ms=np.asarray(ms, np.float32),
            fixed=fixed,
            pts=pts, refs=refs, ptX=s.pt_X[pts].copy(),
        )

    def _eg_solve(self, prob):
        """Lock-free solve phase: the batched sim3 log/exp launches, the
        essential-graph GN (the dominant cost — a 15-iteration device program
        over all keyframes), and the full point remap computed on the
        problem's snapshot arrays. No store access.

        Vertex/edge counts are PADDED to coarse buckets: every loop closure
        changes (K, E), and an exact-shape jit would compile a fresh
        multi-MB XLA program per closure — a long multi-loop run was
        measured to exhaust the process's memory mappings this way. Padding
        vertices are fixed identities; padding edges are valid=False."""
        from multicol_slam_tpu.slam.local_mapping import _bucket

        kfs = prob["kfs"]
        K = len(kfs)
        E = len(prob["ei"])
        pK = _bucket(K, 16)
        pE = _bucket(E, 64)
        eyeR = np.broadcast_to(np.eye(3, dtype=np.float32), (pK - K, 3, 3))
        v = np.asarray(jax.vmap(sim3_log)(
            jnp.asarray(np.concatenate([prob["vR"], eyeR])),
            jnp.asarray(np.pad(prob["vt"], ((0, pK - K), (0, 0)))),
            jnp.asarray(np.pad(prob["vs"], (0, pK - K), constant_values=1.0))))
        eyeRm = np.broadcast_to(np.eye(3, dtype=np.float32), (pE - E, 3, 3))
        meas = np.asarray(jax.vmap(sim3_log)(
            jnp.asarray(np.concatenate([prob["mR"], eyeRm])),
            jnp.asarray(np.pad(prob["mt"], ((0, pE - E), (0, 0)))),
            jnp.asarray(np.pad(prob["ms"], (0, pE - E), constant_values=1.0))))
        edges = Sim3Edges(
            jnp.asarray(np.pad(prob["ei"], (0, pE - E))),
            jnp.asarray(np.pad(prob["ej"], (0, pE - E))),
            jnp.asarray(meas, jnp.float32),
            jnp.asarray(np.pad(prob["wts"], (0, pE - E))),
            jnp.asarray(np.arange(pE) < E),
        )
        fixed = np.pad(prob["fixed"], (0, pK - K), constant_values=True)
        v_out = np.asarray(
            optimize_essential_graph(jnp.asarray(v), edges,
                                     jnp.asarray(fixed), n_iters=15)
        )
        # recover SE3 poses (two batched sim3_exp launches on the PADDED
        # arrays — same bucket, no per-K recompiles); v is the "old" pose
        # set for the point remap
        Ro_all, to_all, so_all = (np.asarray(a, np.float64)[:K] for a in
                                  jax.vmap(sim3_exp)(jnp.asarray(v)))
        Rn_all, tn_all, sn_all = (np.asarray(a, np.float64)[:K] for a in
                                  jax.vmap(sim3_exp)(jnp.asarray(v_out)))
        new_pose6 = np.zeros((K, 6), np.float32)
        old_bw: Dict[int, np.ndarray] = {}
        new_sim3: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        for i, j in enumerate(kfs):
            Told = np.eye(4)
            Told[:3, :3] = Ro_all[i]
            Told[:3, 3] = to_all[i] / so_all[i]
            old_bw[j] = Told
            new_sim3[j] = (Rn_all[i], tn_all[i], float(sn_all[i]))
            Tbw = np.eye(4)
            Tbw[:3, :3] = Rn_all[i]
            Tbw[:3, 3] = tn_all[i] / sn_all[i]
            new_pose6[i] = hom_to_cayley_np(np.linalg.inv(Tbw))
        # batch the point remap by reference keyframe on the SNAPSHOT
        # positions (one numpy pass per KF)
        pts, refs, ptX = prob["pts"], prob["refs"], prob["ptX"].copy()
        for j in np.unique(refs):
            j = int(j)
            if j not in new_sim3:
                continue
            sel = refs == j
            Told = old_bw[j]
            Rn, tn, sn = new_sim3[j]
            Xb = ptX[sel] @ Told[:3, :3].T + Told[:3, 3]
            Ri_, ti_, si_ = _np_sim3_inverse(Rn, tn, sn)
            ptX[sel] = _np_sim3_apply(Ri_, ti_, si_, Xb)
        return dict(new_pose6=new_pose6, newX=ptX)

    def _eg_commit(self, prob, sol):
        """Lock-held commit: write optimized poses for keyframes still valid
        and remapped positions for points still valid. Point positions cannot
        have changed since the snapshot (only this worker thread triangulates
        or BA-moves points), so no freshness merge is needed — only validity
        re-checks against culling."""
        s = self.store
        for i, j in enumerate(prob["kfs"]):
            if s.kf_valid[j]:
                s.kf_pose[j] = sol["new_pose6"][i]
        pts = prob["pts"]
        if len(pts):
            alive = s.pt_valid[pts]
            s.pt_X[pts[alive]] = sol["newX"][alive]
