"""Loop closing: detection, Sim3 estimation, correction, pose-graph opt.

Capability map of the cLoopClosing thread (SURVEY.md §3.5,
cLoopClosing.cpp:63-668), run synchronously after keyframe insertion:

  DetectLoop   : BoW query (models/vocab.py) excluding covisible KFs, skip
                 <10 KFs since last loop, min-score from covisibility,
                 consistency-group chaining with threshold 3 (:115-259)
  ComputeSim3  : descriptor matching between map-pointed features (>=15) ->
                 Horn Sim3 RANSAC in body frames (ops/ransac.horn_sim3,
                 = cSim3Solver) -> optimize_sim3 (>=20 inliers) ->
                 guided reprojection against the loop neighborhood (>=20
                 total) (:261-461)
  CorrectLoop  : propagate the corrected Sim3 through the current covisible
                 group, re-map their points, fuse duplicates, run the
                 essential-graph optimization, record the loop edge; NO
                 global BA afterwards (deliberate, matching the reference's
                 removal of ORB-SLAM2's post-loop GBA) (:464-668)

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
from multicol_slam_tpu.optim.ba import Sim3Edges, optimize_essential_graph, optimize_sim3
from multicol_slam_tpu.ops.matching import hamming_matrix, masked_best_match, mutual_filter
from multicol_slam_tpu.ops.ransac import horn_sim3, ransac_sim3
from multicol_slam_tpu.slam.map_store import BAD_ID, MapStore
from multicol_slam_tpu.utils.geometry import (
    cayley_to_hom,
    hom_inverse,
    hom_to_cayley,
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


class LoopCloser:
    def __init__(self, store: MapStore, rig: MultiCamRig, voc: Optional[Vocabulary] = None):
        self.store = store
        self.rig = rig
        self.voc = voc
        self.db: Optional[KeyFrameDatabase] = KeyFrameDatabase(voc) if voc else None
        self.last_loop_kf = -MIN_KFS_BETWEEN_LOOPS
        self.consistency_groups: List[Tuple[Set[int], int]] = []
        self.mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
        self.intr = jnp.asarray(rig.cams.to_vector())
        self.n_loops_closed = 0
        self._bootstrap_descs: List[np.ndarray] = []

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

    # ------------------------------------------------------------------
    def process(self, k: int) -> bool:
        """Full loop pipeline for new keyframe k. Returns True if a loop was
        closed (poses/points corrected in the MapStore)."""
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
                self.last_loop_kf = k
                self.consistency_groups = []
                return True
        return False

    # ------------------------------------------------------------------
    def _detect(self, k: int, bow_k) -> List[int]:
        """DetectLoop (cLoopClosing.cpp:115-259)."""
        s = self.store
        if k - self.last_loop_kf < MIN_KFS_BETWEEN_LOOPS or s.kf_valid.sum() < MIN_KFS_BETWEEN_LOOPS:
            return []
        cov = s.covisibility(k)
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
    def _try_close(self, k: int, cand: int) -> bool:
        """ComputeSim3 + CorrectLoop for one candidate."""
        s = self.store
        # --- match map-pointed features between the two KFs (SearchByBoW
        # capability via dense Hamming — 1.2k x 1.2k is one MXU tile) -------
        fk = np.nonzero(s.kf_point[k] >= 0)[0]
        fc = np.nonzero(s.kf_point[cand] >= 0)[0]
        if len(fk) < MIN_BOW_MATCHES or len(fc) < MIN_BOW_MATCHES:
            return False
        d = np.asarray(hamming_matrix(jnp.asarray(s.kf_desc[k][fk]), jnp.asarray(s.kf_desc[cand][fc])))
        best = d.argmin(1)
        bestd = d.min(1)
        # mutual + threshold
        back = d.argmin(0)
        mutual = back[best] == np.arange(len(fk))
        okm = mutual & (bestd <= 64)
        if okm.sum() < MIN_BOW_MATCHES:
            return False
        pk = s.kf_point[k][fk[okm]]
        pc = s.kf_point[cand][fc[best[okm]]]
        # positions in each body frame (cSim3Solver operates in body frames)
        Tk = np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[k])))      # body->world
        Tc = np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[cand])))
        Xw_k = s.pt_X[pk]
        Xw_c = s.pt_X[pc]
        Xb_k = (Xw_k - Tk[:3, 3]) @ Tk[:3, :3]
        Xb_c = (Xw_c - Tc[:3, 3]) @ Tc[:3, :3]
        # --- Horn Sim3 RANSAC: S_kc maps cand-body -> current-body ---------
        P = jnp.asarray(Xb_c, jnp.float32)
        Q = jnp.asarray(Xb_k, jnp.float32)

        def err_fn(R, t, sc):
            pred = sc[:, None, None] * jnp.einsum("sij,nj->sni", R, P) + t[:, None, :]
            return jnp.linalg.norm(pred - Q[None], axis=-1) < 0.1 * jnp.median(
                jnp.linalg.norm(Q, axis=-1)
            )

        res = ransac_sim3(
            jax.random.PRNGKey(k), P, Q, jnp.ones(len(P), bool), err_fn, n_hyp=300
        )
        if int(res.n_inliers) < MIN_SIM3_INLIERS:
            return False
        # --- refine with reprojection GN (optimize_sim3) -------------------
        from multicol_slam_tpu.optim.ba import Sim3Obs

        cam_k = (fk[okm] // s.cfg.feats_per_cam).astype(np.int32)
        cam_c = (fc[best[okm]] // s.cfg.feats_per_cam).astype(np.int32)
        sobs = Sim3Obs(
            X1=Q, X2=P,
            uv1=jnp.asarray(s.kf_uv[k][fk[okm]]),
            uv2=jnp.asarray(s.kf_uv[cand][fc[best[okm]]]),
            cam1=jnp.asarray(cam_k),
            cam2=jnp.asarray(cam_c),
            inv_sigma2_1=jnp.ones(len(P)),
            inv_sigma2_2=jnp.ones(len(P)),
            valid=res.inliers,
        )
        v0 = sim3_log(res.R, res.t, res.s)
        v7, inl, n_inl = optimize_sim3(v0, sobs, self.mc6, self.intr, n_iters=12)
        if int(n_inl) < MIN_SIM3_INLIERS:
            return False
        self._correct(k, cand, np.asarray(v7))
        s.loop_edges.append((k, cand))
        return True

    # ------------------------------------------------------------------
    def _correct(self, k: int, cand: int, v7_kc: np.ndarray):
        """CorrectLoop (cLoopClosing.cpp:464-668): S_kc maps cand-body points
        into current-body. Corrected world->body of current:
        S_bw(k)_corr = S_kc o T_bw(cand)."""
        s = self.store
        R, t, sc = sim3_exp(jnp.asarray(v7_kc, jnp.float32))
        Tc_wb = np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[cand])))  # body->world
        Tc_bw = np.linalg.inv(Tc_wb)
        # S_kw_corr = S_kc o T_cand_bw  (world -> current body, with scale)
        Rc = jnp.asarray(Tc_bw[:3, :3], jnp.float32)
        tc = jnp.asarray(Tc_bw[:3, 3], jnp.float32)
        s1 = jnp.asarray(1.0)
        Rkw, tkw, skw = sim3_compose(R, t, sc, Rc, tc, s1)
        # old world->body of current
        Tk_wb_old = np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[k])))
        Tk_bw_old = np.linalg.inv(Tk_wb_old)
        # --- propagate through the covisible group (:497-560) --------------
        group = list(s.covisibility(k, min_weight=15)) + [k]
        corrected: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        for j in group:
            Tj_bw_old = np.linalg.inv(np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[j]))))
            # T_jk = T_j_bw_old o inv(T_k_bw_old): current-body -> j-body
            Tjk = Tj_bw_old @ np.linalg.inv(Tk_bw_old)
            Rj, tj, sj = sim3_compose(
                jnp.asarray(Tjk[:3, :3], jnp.float32), jnp.asarray(Tjk[:3, 3], jnp.float32),
                jnp.asarray(1.0), Rkw, tkw, skw,
            )
            corrected[j] = (np.asarray(Rj), np.asarray(tj), float(sj))
            # write back SE3 pose: M_t = inv([R, t/s])
            Tbw = np.eye(4)
            Tbw[:3, :3] = np.asarray(Rj)
            Tbw[:3, 3] = np.asarray(tj) / float(sj)
            s.kf_pose[j] = np.asarray(hom_to_cayley(jnp.asarray(np.linalg.inv(Tbw), jnp.float32)))
            # re-map this KF's points: X_new = S_jw_corr^-1 ( S_jw_old X_old )
            pts = s.kf_point[j]
            pts = np.unique(pts[pts >= 0])
            if len(pts) == 0:
                continue
            Xb_old = s.pt_X[pts] @ Tj_bw_old[:3, :3].T + Tj_bw_old[:3, 3]
            Ri_, ti_, si_ = sim3_inverse(
                jnp.asarray(corrected[j][0]), jnp.asarray(corrected[j][1]), jnp.asarray(corrected[j][2])
            )
            X_new = np.asarray(sim3_apply(Ri_, ti_, si_, jnp.asarray(Xb_old, jnp.float32)))
            s.pt_X[pts] = X_new
            s.update_point_stats_many(pts)
        # --- essential-graph optimization over all keyframes ---------------
        self._essential_graph(k, cand, corrected)

    def _essential_graph(self, k: int, cand: int, corrected):
        s = self.store
        kfs = s.active_kfs()
        idx = {int(j): i for i, j in enumerate(kfs)}
        K = len(kfs)
        v = np.zeros((K, 7), np.float32)
        for j in kfs:
            i = idx[int(j)]
            if int(j) in corrected:
                Rj, tj, sj = corrected[int(j)]
                v[i] = np.asarray(
                    sim3_log(jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(sj, jnp.float32))
                )
            else:
                Tbw = np.linalg.inv(np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[j]))))
                v[i] = np.asarray(
                    sim3_log(
                        jnp.asarray(Tbw[:3, :3], jnp.float32),
                        jnp.asarray(Tbw[:3, 3], jnp.float32),
                        jnp.asarray(1.0, jnp.float32),
                    )
                )
        # edges: sequential chain (spanning-tree stand-in) + strong
        # covisibility (>=100 shared) + recorded loop edges; measurements
        # from PRE-correction relative poses except the loop edge itself.
        pre = {}
        for j in kfs:
            Tbw = np.linalg.inv(np.asarray(cayley_to_hom(jnp.asarray(s.kf_pose[j]))))
            if int(j) in corrected:
                # pre-correction pose is gone; recompute below from stored old?
                pass
            pre[int(j)] = Tbw
        ei, ej, meas = [], [], []

        def add_edge(a, b, Sa=None, Sb=None):
            # measurement S_ba = S_b o S_a^-1 from (possibly corrected) states
            va = jnp.asarray(v[idx[a]]) if Sa is None else Sa
            vb = jnp.asarray(v[idx[b]]) if Sb is None else Sb
            Ra, ta, sa = sim3_exp(va)
            Rb, tb, sb = sim3_exp(vb)
            Rm, tm, sm = sim3_compose(Rb, tb, sb, *sim3_inverse(Ra, ta, sa))
            ei.append(idx[a])
            ej.append(idx[b])
            meas.append(np.asarray(sim3_log(Rm, tm, sm)))

        ordered = sorted(int(j) for j in kfs)
        for a, b in zip(ordered[:-1], ordered[1:]):
            add_edge(a, b)
        cov_done = set()
        for a in ordered:
            for b, w in s.covisibility(a).items():
                if w >= COVIS_EDGE_MIN and (b, a) not in cov_done and b in idx:
                    add_edge(a, b)
                    cov_done.add((a, b))
        for (a, b) in s.loop_edges + [(k, cand)]:
            if a in idx and b in idx:
                add_edge(a, b)
        edges = Sim3Edges(
            jnp.asarray(ei, jnp.int32),
            jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(meas), jnp.float32),
            jnp.ones(len(ei), jnp.float32),
            jnp.ones(len(ei), bool),
        )
        fixed = np.zeros(K, bool)
        fixed[idx[cand]] = True
        v_out = np.asarray(
            optimize_essential_graph(jnp.asarray(v), edges, jnp.asarray(fixed), n_iters=15)
        )
        # recover SE3 poses + remap points via each point's first KF (:480-520)
        old_bw = {int(j): pre[int(j)] for j in kfs}
        new_bw = {}
        for j in kfs:
            i = idx[int(j)]
            Rj, tj, sj = sim3_exp(jnp.asarray(v_out[i]))
            Tbw = np.eye(4)
            Tbw[:3, :3] = np.asarray(Rj)
            Tbw[:3, 3] = np.asarray(tj) / float(sj)
            new_bw[int(j)] = (np.asarray(Rj), np.asarray(tj), float(sj), Tbw)
            s.kf_pose[j] = np.asarray(hom_to_cayley(jnp.asarray(np.linalg.inv(Tbw), jnp.float32)))
        for p in s.active_points():
            ref = int(s.pt_first_kf[p])
            if ref not in new_bw:
                continue
            Told = old_bw.get(ref)
            Rn, tn, sn, _ = new_bw[ref]
            Xb = s.pt_X[p] @ Told[:3, :3].T + Told[:3, 3]
            Ri_, ti_, si_ = sim3_inverse(
                jnp.asarray(Rn, jnp.float32), jnp.asarray(tn, jnp.float32), jnp.asarray(sn, jnp.float32)
            )
            s.pt_X[p] = np.asarray(sim3_apply(Ri_, ti_, si_, jnp.asarray(Xb, jnp.float32)))
