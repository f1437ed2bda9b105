"""Local mapping: new-point triangulation, culling, fusion, local BA.

Capability map of the cLocalMapping thread loop (SURVEY.md §3.4,
cLocalMapping.cpp:69-597): the same pipeline runs as a host-orchestrated
sequence of jitted kernels after each keyframe insertion.

  ProcessNewMultiKeyFrame -> MapStore bookkeeping (map_store.py)
  MapPointCulling         -> cull_map_points (host, vectorized numpy)
  CreateNewMapPoints      -> triangulate_pair kernel (device) per neighbor KF
  SearchInNeighbors/Fuse  -> fuse_points (device match + host merge)
  LocalBundleAdjustment   -> optim/ba.bundle_adjust on the padded local graph
  KeyFrameCulling         -> cull_keyframes (host)

Gate constants follow cLocalMapping.cpp:39-43, 224-387 (see docstrings).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.rig import MultiCamRig
from multicol_slam_tpu.optim.ba import bundle_adjust_jit, prune_observations
from multicol_slam_tpu.optim.problem import BAParams, FreeMask, Observations
from multicol_slam_tpu.ops.matching import unpack_pm1
from multicol_slam_tpu.slam.map_store import BAD_ID, MapStore
from multicol_slam_tpu.utils.geometry import (
    cayley_to_hom,
    essential_from_relative,
    hom_inverse,
    ray_epipolar_distance,
    triangulate_midpoint,
)

# Gates (cLocalMapping.cpp:39-43, 255, 305, 332, 363; SURVEY appendix)
MIN_BASELINE_DEPTH_RATIO = 0.01
MAX_PARALLAX_COS = 0.9998        # require a bit over 1 degree of parallax
REPROJ_TH = 4.0
MAX_DIST = 25.0
FOUND_RATIO_MIN = 0.25
KF_REDUNDANT_FRAC = 0.9
KF_REDUNDANT_OBS = 5


def _bucket(n: int, minimum: int, step: Optional[int] = None) -> int:
    """Smallest padded capacity >= n: multiples of `step` if given, else the
    next power of two, floored at `minimum` (recompile-avoidance buckets)."""
    n = max(n, minimum)
    if step is not None:
        return ((n + step - 1) // step) * step
    return 1 << (n - 1).bit_length()


def _bucket4(n: int, minimum: int) -> int:
    """Power-of-FOUR bucket (minimum, 4*minimum, 16*minimum, ...): used for
    the BA problem paddings, where every distinct (pK, pP, pO) shape combo is
    a multi-second XLA compile of the LM solver. x4 growth caps the ladder at
    ~4 sizes per axis over any realistic map size — padding FLOPs are cheap
    on the MXU, recompiles on the tracking critical path are not."""
    n = max(n, minimum)
    b = minimum
    while b < n:
        b *= 4
    return b


class TriangulationOut(NamedTuple):
    X: jnp.ndarray        # [C*K, 3] new world points
    feat1: jnp.ndarray    # [C*K] flat feature idx in KF1 (query) == arange(C*K)
    feat2: jnp.ndarray    # [C*K] flat feature idx in KF2
    ok: jnp.ndarray       # [C*K] bool
    packed: jnp.ndarray = None  # [C*K, 5] f32: X(3), feat2, ok — ONE
    #                             device->host readback per keyframe (each
    #                             distinct-array fetch is a ~25 ms tunnel RPC;
    #                             feat1 is deterministic, host reconstructs)


@functools.partial(jax.jit, static_argnames=("epi_th", "th_desc", "ratio", "check_rotation", "use_masks"))
def triangulate_pair(
    mc6: jnp.ndarray,
    pose1: jnp.ndarray,
    pose2: jnp.ndarray,
    uv1, rays1, desc1, free1,      # KF1 features [C,K,...]; free = no map point yet
    uv2, rays2, desc2, free2,
    intr: jnp.ndarray,
    epi_th: float = 1e-2,
    th_desc: float = 64.0,
    ratio: float = 0.8,
    ang1=None, ang2=None,          # [C,K] keypoint angles (rotation histogram)
    dmask1=None, dmask2=None,      # [C,K,B] mdBRIEF stability masks
    check_rotation: bool = False,
    use_masks: bool = False,
) -> TriangulationOut:
    """Match unassigned same-camera features between two keyframes under the
    epipolar constraint and triangulate (SearchForTriangulationRaw,
    cORBmatcher.cpp:988-1090 + CreateNewMapPoints gates,
    cLocalMapping.cpp:224-387). All cameras in one fused program.
    check_rotation applies the reference's rotHist filter (:1070-1090);
    use_masks switches to the mdBRIEF masked Hamming (pass x0.5 th_desc)."""
    C, K, B = desc1.shape
    Mt1 = cayley_to_hom(pose1)
    Mt2 = cayley_to_hom(pose2)
    MtMc1 = jnp.einsum("ij,cjk->cik", Mt1, cayley_to_hom(mc6))   # [C,4,4]
    MtMc2 = jnp.einsum("ij,cjk->cik", Mt2, cayley_to_hom(mc6))
    # essential per camera: cam1@t1 <- cam1@t2 relative transform
    rel = jnp.einsum("cij,cjk->cik", hom_inverse(MtMc1), MtMc2)  # maps cam2-frame -> cam1-frame
    E = essential_from_relative(hom_inverse(rel))                # r1^T? convention check in test
    # hamming [C, K1, K2]
    if use_masks and dmask1 is not None:
        from multicol_slam_tpu.ops.matching import hamming_matrix_masked

        ham = jax.vmap(hamming_matrix_masked)(desc1, dmask1, desc2, dmask2)
    else:
        a = unpack_pm1(desc1.reshape(C * K, B)).reshape(C, K, 8 * B)
        b = unpack_pm1(desc2.reshape(C * K, B)).reshape(C, K, 8 * B)
        ham = 0.5 * (8 * B - jnp.einsum("cqj,ckj->cqk", a, b, preferred_element_type=jnp.float32))
    # epipolar distance between rays through E (misc.cpp:54-70 ray-space test)
    epi = ray_epipolar_distance(
        rays1[:, :, None, :], E[:, None, None, :, :], rays2[:, None, :, :]
    )
    mask = (epi < epi_th) & free1[:, :, None] & free2[:, None, :]
    BIGD = jnp.float32(1e9)
    d = jnp.where(mask, ham, BIGD)
    idx2 = jnp.argmin(d, axis=2)                                  # [C, K]
    best = jnp.min(d, axis=2)
    d_no = jnp.where(jax.nn.one_hot(idx2, K, dtype=bool), BIGD, d)
    second = jnp.min(d_no, axis=2)
    ok = (best <= th_desc) & (best < ratio * second)
    # mutual
    idx1 = jnp.argmin(d, axis=1)
    mutual = jnp.take_along_axis(idx1, idx2, axis=1) == jnp.arange(K)[None, :]
    ok = ok & mutual
    if check_rotation and ang1 is not None:
        from multicol_slam_tpu.ops.matching import rotation_consistency

        ang2_sel = jnp.take_along_axis(ang2, idx2, axis=1)
        dangle = (ang1 - ang2_sel).reshape(C * K)
        ok = rotation_consistency(dangle, ok.reshape(C * K)).reshape(C, K)
    # triangulate in world frame
    o1 = MtMc1[:, :3, 3][:, None, :]                              # [C,1,3]
    o2 = MtMc2[:, :3, 3][:, None, :]
    d1w = jnp.einsum("cij,ckj->cki", MtMc1[:, :3, :3], rays1)     # [C,K,3]
    r2_sel = jnp.take_along_axis(rays2, idx2[..., None], axis=1)
    d2w = jnp.einsum("cij,ckj->cki", MtMc2[:, :3, :3], r2_sel)
    X, lam1, lam2 = triangulate_midpoint(o1, d1w, o2, d2w)
    ok = ok & (lam1 > 0) & (lam2 > 0)
    # parallax gate
    cosp = jnp.sum(d1w * d2w, axis=-1)
    ok = ok & (cosp < MAX_PARALLAX_COS)
    # reprojection gates in both KFs through the observing cameras
    from multicol_slam_tpu.optim.problem import intr_project
    from multicol_slam_tpu.utils.geometry import transform_points

    Xc1 = transform_points(hom_inverse(MtMc1)[:, None], X)
    Xc2 = transform_points(hom_inverse(MtMc2)[:, None], X)
    uv1p = intr_project(intr[:, None, :], Xc1)
    uv2p = intr_project(intr[:, None, :], Xc2)
    uv2_sel = jnp.take_along_axis(uv2, idx2[..., None], axis=1)
    ok = ok & (jnp.linalg.norm(uv1p - uv1, axis=-1) < REPROJ_TH)
    ok = ok & (jnp.linalg.norm(uv2p - uv2_sel, axis=-1) < REPROJ_TH)
    ok = ok & (Xc1[..., 2] > 0) & (Xc2[..., 2] > 0)
    # distance gate
    dist1 = jnp.linalg.norm(X - o1, axis=-1)
    dist2 = jnp.linalg.norm(X - o2, axis=-1)
    ok = ok & (dist1 > 0) & (dist1 < MAX_DIST) & (dist2 > 0) & (dist2 < MAX_DIST)
    fpc = K
    feat1 = (jnp.arange(C)[:, None] * fpc + jnp.arange(K)[None, :]).reshape(-1)
    feat2 = (jnp.arange(C)[:, None] * fpc + idx2).reshape(-1)
    Xf = X.reshape(-1, 3)
    okf = ok.reshape(-1)
    packed = jnp.concatenate(
        [Xf, feat2[:, None].astype(jnp.float32), okf[:, None].astype(jnp.float32)],
        axis=-1,
    )
    return TriangulationOut(Xf, feat1, feat2, okf, packed)


@functools.partial(jax.jit, static_argnames=("epi_th", "th_desc", "ratio", "check_rotation", "use_masks"))
def triangulate_pairs(
    mc6, pose1, poses2, uv1, rays1, desc1, free1,
    uv2s, rays2s, desc2s, free2s, intr,
    epi_th: float = 1e-2, th_desc: float = 64.0, ratio: float = 0.8,
    ang1=None, ang2s=None, dmask1=None, dmask2s=None,
    check_rotation: bool = False, use_masks: bool = False,
) -> TriangulationOut:
    """Every neighbor pair of CreateNewMapPoints in ONE device program (vmap
    over the neighbor axis). One launch per keyframe instead of one per
    neighbor: with mapping on a background worker sharing the single device
    with tracking, per-call dispatch + head-of-line blocking dominated the
    stage cost. Disabled/padding pairs pass all-False free2s."""

    def one(pose2, uv2, rays2, desc2, free2, ang2, dmask2):
        return triangulate_pair(
            mc6, pose1, pose2, uv1, rays1, desc1, free1,
            uv2, rays2, desc2, free2, intr, epi_th, th_desc, ratio,
            ang1, ang2, dmask1, dmask2, check_rotation, use_masks,
        )

    if use_masks and dmask2s is not None:
        return jax.vmap(one)(poses2, uv2s, rays2s, desc2s, free2s, ang2s, dmask2s)
    return jax.vmap(lambda p, u, r, d, f, a: one(p, u, r, d, f, a, None))(
        poses2, uv2s, rays2s, desc2s, free2s, ang2s
    )


class _NullLock:
    """No-op context manager: the sequential pipeline needs no locking."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class LocalMapper:
    """Host orchestration of the local-mapping pipeline over a MapStore.

    `lock` (optional): when the mapper runs in a background thread
    (MultiColSLAM async_mapping — the reference's thread 2,
    cSystem.cpp:98), every store-mutating stage holds this lock while the
    expensive device computations (local BA solve) run OUTSIDE it, so the
    tracker's store reads interleave between stages instead of stalling for
    the whole pipeline (the InterruptBA capability, cLocalMapping.cpp:515).
    """

    def __init__(self, store: MapStore, rig: MultiCamRig, use_masks: bool = False,
                 lock=None):
        self.store = store
        self.rig = rig
        self.mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
        self.intr = jnp.asarray(rig.cams.to_vector())
        self.recent_points: List[Tuple[int, int]] = []  # (pt_id, created_kf)
        # mdBRIEF stability-mask matching (thresholds x0.5, cORBmatcher.cpp:46-65)
        self.use_masks = use_masks
        self.lock = lock if lock is not None else _NullLock()
        # optional tracker-priority gate: called before every device dispatch
        # when mapping runs on a worker sharing the chip with tracking
        # (MultiColSLAM._yield_to_tracker); None in the sequential pipeline
        self.yield_gate = None
        # consecutive keyframes whose BA was deferred by interrupt pressure
        self._ba_deferred = 0

    # BA starvation bound: force a (non-interruptible) local BA at least
    # every N keyframes under sustained queue pressure (see run())
    MAX_BA_DEFERRALS = 3

    def _yield(self):
        if self.yield_gate is not None:
            self.yield_gate()

    # ------------------------------------------------------------------
    def process_new_keyframe(self, k: int):
        """ProcessNewMultiKeyFrame (cLocalMapping.cpp:145-186): refresh point
        stats for points observed by the new KF and attach it to the
        covisibility spanning tree (the reference's first UpdateConnections
        sets mpParent, cMultiKeyFrame.h:52-72)."""
        pts = self.store.kf_point[k]
        self.store.update_point_stats_many(pts[pts >= 0])
        self.store.assign_parent(k)

    # ------------------------------------------------------------------
    def cull_map_points(self, current_kf: int):
        """MapPointCulling (cLocalMapping.cpp:187-222)."""
        s = self.store
        keep = []
        for p, created in self.recent_points:
            if not s.pt_valid[p]:
                continue
            found_ratio = s.pt_found[p] / max(s.pt_visible[p], 1)
            age = current_kf - created
            nobs = s.point_n_obs(p)
            if found_ratio < FOUND_RATIO_MIN:
                s.erase_point(p)
            elif age >= 2 and nobs <= 2:
                s.erase_point(p)
            elif age >= 3:
                pass  # graduated: no longer monitored
            else:
                keep.append((p, created))
        self.recent_points = keep

    # ------------------------------------------------------------------
    def create_new_points(self, k: int, n_neighbors: int = 5):
        """CreateNewMapPoints (cLocalMapping.cpp:224-387).

        Three-phase: snapshot the needed store blocks under the lock, run the
        device triangulation for every neighbor pair WITHOUT the lock (the
        expensive part — an async tracker must not stall behind it), then
        commit new points under the lock with a freshness re-check (a feature
        claimed meanwhile stays claimed; same benign-race discipline as the
        reference's commented-out map mutex, cMap.h:39)."""
        s = self.store
        C = s.cfg.n_cams
        K = s.cfg.feats_per_cam
        th = 0.5 * 2.0 * s.cfg.desc_bytes if self.use_masks else 2.0 * s.cfg.desc_bytes
        # ---- phase 1: snapshot (lock) -------------------------------------
        with self.lock:
            if not s.kf_valid[k]:
                return 0
            neighbors = s.best_covisible(k, n_neighbors)
            pose1_np = s.kf_pose[k].copy()
            pairs = []
            for j in neighbors:
                # baseline / median-depth gate (:255)
                b = np.linalg.norm(pose1_np[3:] - s.kf_pose[j][3:])
                med_depth = self._median_depth(j)
                if med_depth <= 0 or b / med_depth < MIN_BASELINE_DEPTH_RATIO:
                    continue
                pairs.append((
                    int(j),
                    s.kf_pose[j].copy(),
                    s.kf_uv[j].reshape(C, K, 2).copy(),
                    s.kf_rays[j].reshape(C, K, 3).copy(),
                    s.kf_desc[j].reshape(C, K, -1).copy(),
                    ((s.kf_point[j] == BAD_ID) & s.kf_feat_valid[j]).reshape(C, K).copy(),
                    s.kf_angle[j].reshape(C, K).copy(),
                    s.kf_dmask[j].reshape(C, K, -1).copy() if self.use_masks else None,
                ))
            if not pairs:
                return 0
            free1_np = ((s.kf_point[k] == BAD_ID) & s.kf_feat_valid[k]).reshape(C, K).copy()
            uv1_np = s.kf_uv[k].reshape(C, K, 2).copy()
            rays1_np = s.kf_rays[k].reshape(C, K, 3).copy()
            desc1_np = s.kf_desc[k].reshape(C, K, -1).copy()
            ang1_np = s.kf_angle[k].reshape(C, K).copy()
            dmask1_np = s.kf_dmask[k].reshape(C, K, -1).copy() if self.use_masks else None
        # ---- phase 2: triangulate all pairs (no lock) ---------------------
        # Program-size discipline: in the async pipeline the tracker's fused
        # program queues BEHIND whatever mapping program is running — the
        # depth-2 pipeline absorbs ~2 camera periods (80 ms) of queueing, so
        # every worker program must stay well under that. One launch per 2
        # neighbors (one compiled shape) instead of the 5-neighbor
        # mega-launch; dispatches first, readbacks after, so the device
        # pipeline stays full while the tracker can slot in between programs.
        # Sequential mode keeps the single launch (fewer round trips wins
        # when nothing shares the chip).
        B = s.cfg.desc_bytes
        chunk = 2 if self.yield_gate is not None else n_neighbors

        def launch(sub):
            Jp = chunk if self.yield_gate is not None else n_neighbors
            poses2 = np.zeros((Jp, 6), np.float32)
            uv2s = np.zeros((Jp, C, K, 2), np.float32)
            rays2s = np.zeros((Jp, C, K, 3), np.float32)
            desc2s = np.zeros((Jp, C, K, B), np.uint8)
            free2s = np.zeros((Jp, C, K), bool)
            ang2s = np.zeros((Jp, C, K), np.float32)
            dmask2s = np.full((Jp, C, K, B), 255, np.uint8) if self.use_masks else None
            for i, (j, pose2, uv2, rays2, desc2, free2, ang2, dmask2) in enumerate(sub):
                poses2[i] = pose2
                uv2s[i] = uv2
                rays2s[i] = rays2
                desc2s[i] = desc2
                free2s[i] = free2
                ang2s[i] = ang2
                if self.use_masks:
                    dmask2s[i] = dmask2
            self._yield()
            out = triangulate_pairs(
                self.mc6, jnp.asarray(pose1_np), jnp.asarray(poses2),
                jnp.asarray(uv1_np), jnp.asarray(rays1_np), jnp.asarray(desc1_np),
                jnp.asarray(free1_np),
                jnp.asarray(uv2s), jnp.asarray(rays2s), jnp.asarray(desc2s),
                jnp.asarray(free2s), self.intr,
                th_desc=th,
                ang1=jnp.asarray(ang1_np), ang2s=jnp.asarray(ang2s),
                dmask1=jnp.asarray(dmask1_np) if self.use_masks else None,
                dmask2s=jnp.asarray(dmask2s) if self.use_masks else None,
                check_rotation=True,
                use_masks=self.use_masks,
            )
            out.packed.copy_to_host_async()  # ride the compute stream
            return out.packed

        handles = [(pairs[i0:i0 + chunk], launch(pairs[i0:i0 + chunk]))
                   for i0 in range(0, len(pairs), chunk)]
        f1_const = np.arange(C * K)
        results = []
        for sub, h in handles:
            packed = np.asarray(h)                 # [Jp, CK, 5]
            for i in range(len(sub)):
                results.append((sub[i][0], packed[i, :, 4] > 0.5,
                                packed[i, :, :3],
                                f1_const, packed[i, :, 3].astype(np.int64)))
        # ---- phase 3: commit (lock) ---------------------------------------
        created = 0
        new_ids: List[int] = []
        with self.lock:
            if not s.kf_valid[k]:
                return 0
            for j, ok, X, f1, f2 in results:
                if not s.kf_valid[j]:
                    continue
                for i in np.nonzero(ok)[0]:
                    if s.kf_point[k, f1[i]] != BAD_ID or s.kf_point[j, f2[i]] != BAD_ID:
                        continue  # got claimed by an earlier pair / the tracker
                    p = s.add_point(
                        X[i],
                        s.kf_desc[k, f1[i]],
                        s.kf_dmask[k, f1[i]],
                        first_kf=k,
                        normal=np.zeros(3, np.float32),
                        min_dist=0.1,
                        max_dist=MAX_DIST,
                    )
                    s.add_observation(k, int(f1[i]), p)
                    s.add_observation(j, int(f2[i]), p)
                    new_ids.append(p)
                    self.recent_points.append((p, k))
                    created += 1
            if new_ids:
                s.update_point_stats_many(np.asarray(new_ids))
        return created

    def _median_depth(self, k: int) -> float:
        """ComputeSceneMedianDepth (cMultiKeyFrame.cpp:756): median depth of
        the KF's points in its body frame."""
        s = self.store
        pts = s.kf_point[k]
        pts = np.unique(pts[pts >= 0])
        if len(pts) == 0:
            return -1.0
        from multicol_slam_tpu.slam.map_store import cayley_to_hom_np

        Mt = cayley_to_hom_np(s.kf_pose[k])
        Xb = (s.pt_X[pts] - Mt[:3, 3]) @ Mt[:3, :3]  # world->body rotation^T
        return float(np.median(np.linalg.norm(Xb, axis=-1)))

    # ------------------------------------------------------------------
    def fuse_neighbors(self, k: int, radius: float = 3.0):
        """SearchInNeighbors (cLocalMapping.cpp:388-458): project this KF's
        points into 1st/2nd-ring neighbors and fuse duplicate observations.

        Same three-phase structure as create_new_points: snapshot under the
        lock, device matching for all targets without it, commit merges under
        it with validity re-checks."""
        from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, project_and_match
        from multicol_slam_tpu.slam.features import FrameFeatures

        s = self.store
        C, K = s.cfg.n_cams, s.cfg.feats_per_cam
        # ---- phase 1: snapshot (lock) -------------------------------------
        with self.lock:
            if not s.kf_valid[k]:
                return 0
            ring1 = s.best_covisible(k, 10)
            targets = set(ring1)
            for j in ring1:
                targets.update(s.best_covisible(j, 5))
            targets.discard(k)
            pts = s.kf_point[k]
            pts = np.unique(pts[pts >= 0])
            if len(pts) == 0 or not targets:
                return 0
            L = int(2 ** int(np.ceil(np.log2(max(len(pts), 64)))))
            pad = L - len(pts)
            lp = LocalPoints(
                X=jnp.asarray(np.pad(s.pt_X[pts], ((0, pad), (0, 0)))),
                desc=jnp.asarray(np.pad(s.pt_desc[pts], ((0, pad), (0, 0)))),
                min_dist=jnp.asarray(np.pad(s.pt_min_dist[pts], (0, pad))),
                max_dist=jnp.asarray(np.pad(s.pt_max_dist[pts], (0, pad), constant_values=1.0)),
                valid=jnp.asarray(np.pad(np.ones(len(pts), bool), (0, pad))),
                normal=jnp.asarray(np.pad(s.pt_normal[pts], ((0, pad), (0, 0)))),
                dmask=jnp.asarray(np.pad(s.pt_dmask[pts], ((0, pad), (0, 0)))) if self.use_masks else None,
            )
            tsnap = []
            for j in sorted(targets):
                if not s.kf_valid[j]:
                    continue
                tsnap.append((
                    int(j),
                    s.kf_pose[j].copy(),
                    s.kf_uv[j].reshape(C, K, 2).copy(),
                    s.kf_octave[j].reshape(C, K).copy(),
                    s.kf_angle[j].reshape(C, K).copy(),
                    s.kf_rays[j].reshape(C, K, 3).copy(),
                    s.kf_desc[j].reshape(C, K, -1).copy(),
                    s.kf_dmask[j].reshape(C, K, -1).copy(),
                    s.kf_feat_valid[j].reshape(C, K).copy(),
                ))
        # ---- phase 2: match targets in bounded launches (no lock) ---------
        # Each target keyframe's body pose folds into effective per-camera
        # extrinsics Mc' = Mt_j . Mc_c with an identity body pose, so target
        # keyframes x C cameras become one fused multi-camera rig per launch.
        # Async program-size discipline (see create_new_points): 4 targets
        # per launch — a single (16+ KF x C)-camera program ran long enough
        # to stall the tracker's queued frame past the pipeline slack.
        # Dispatch every group first, read back after.
        J = len(tsnap)
        group = 6 if self.yield_gate is not None else _bucket(J, 4)
        B = s.cfg.desc_bytes
        Mc_np = np.asarray(self.rig.Mc, np.float64)                   # [C,4,4]
        from multicol_slam_tpu.slam.map_store import cayley_to_hom_np, hom_to_cayley_np

        def launch(sub):
            Jp = group
            mc_eff = np.zeros((Jp * C, 6), np.float32)
            uv_a = np.zeros((Jp * C, K, 2), np.float32)
            oct_a = np.zeros((Jp * C, K), np.int32)
            ang_a = np.zeros((Jp * C, K), np.float32)
            rays_a = np.zeros((Jp * C, K, 3), np.float32)
            desc_a = np.zeros((Jp * C, K, B), np.uint8)
            dmask_a = np.full((Jp * C, K, B), 255, np.uint8)
            valid_a = np.zeros((Jp * C, K), bool)
            for i, (j, pose, uv, octv, ang, rays, desc, dmask, fvalid) in enumerate(sub):
                Mt = cayley_to_hom_np(pose)
                mc_eff[i * C:(i + 1) * C] = hom_to_cayley_np(Mt[None] @ Mc_np)
                uv_a[i * C:(i + 1) * C] = uv
                oct_a[i * C:(i + 1) * C] = octv
                ang_a[i * C:(i + 1) * C] = ang
                rays_a[i * C:(i + 1) * C] = rays
                desc_a[i * C:(i + 1) * C] = desc
                dmask_a[i * C:(i + 1) * C] = dmask
                valid_a[i * C:(i + 1) * C] = fvalid
            cams_t = jax.tree_util.tree_map(
                lambda a: jnp.tile(a, (Jp,) + (1,) * (a.ndim - 1)), self.rig.cams
            )
            feats_all = FrameFeatures(
                uv=jnp.asarray(uv_a),
                response=jnp.zeros((Jp * C, K)),
                octave=jnp.asarray(oct_a),
                angle=jnp.asarray(ang_a),
                rays=jnp.asarray(rays_a),
                desc=jnp.asarray(desc_a),
                dmask=jnp.asarray(dmask_a),
                valid=jnp.asarray(valid_a),
            )
            self._yield()
            _, _, _, packed = fuse_match(
                jnp.asarray(mc_eff), jnp.tile(self.intr, (Jp, 1)), cams_t,
                feats_all, jnp.zeros(6, jnp.float32), lp, radius,
                use_masks=self.use_masks,
            )
            packed.copy_to_host_async()
            return packed

        handles = [(tsnap[g0:g0 + group], launch(tsnap[g0:g0 + group]))
                   for g0 in range(0, J, group)]
        matches = []
        for sub, h in handles:
            packed = np.asarray(h)                 # [3, Jp*C*K]
            assign_all = packed[0].astype(np.int64).reshape(group * C, K)
            keep_all = (packed[2] > 0.5).reshape(group * C, K)
            for i in range(len(sub)):
                matches.append((sub[i][0],
                                assign_all[i * C:(i + 1) * C].reshape(-1),
                                keep_all[i * C:(i + 1) * C].reshape(-1)))
        # ---- phase 3: commit (lock) ---------------------------------------
        fused = 0
        touched: List[int] = []
        with self.lock:
            for j, assign, keep in matches:
                if not s.kf_valid[j]:
                    continue
                for f in np.nonzero(keep)[0]:
                    p = int(pts[assign[f]])
                    if not s.pt_valid[p]:
                        continue
                    existing = s.kf_point[j, f]
                    if existing == BAD_ID:
                        s.add_observation(j, int(f), p)
                        touched.append(p)
                        fused += 1
                    elif existing != p and s.pt_valid[existing]:
                        # keep the point with more observations (Fuse semantics)
                        if s.point_n_obs(existing) >= s.point_n_obs(p):
                            s.replace_point(p, int(existing))
                        else:
                            s.replace_point(int(existing), p)
                        fused += 1
            if touched:
                s.update_point_stats_many(np.asarray(touched))
        return fused

    # ------------------------------------------------------------------
    def local_ba(self, k: int, max_iters: int = 10, interrupt=None):
        """LocalBundleAdjustment (cOptimizer.cpp:489-909): free = covisible
        neighborhood of k, anchors = other KFs observing the local points.
        The problem gather and write-back hold the map lock; the LM solve —
        the dominant cost — runs outside it so async tracking proceeds, one
        LM iteration per device program so it can be preempted by a newer
        keyframe mid-solve and never head-of-line-blocks tracking kernels
        (the reference runs 5 abortable iterations, cLocalMapping.cpp:~500;
        our 10 with gain early-stop brackets that)."""
        with self.lock:
            prob = self._gather_local_ba(k)
        if prob is None:
            return
        out, obs, nK, nP, nO = self._solve_ba(prob, max_iters, interrupt)
        with self.lock:
            self._writeback_ba(prob, out, obs, nK, nP, nO)

    def _gather_local_ba(self, k: int):
        s = self.store
        local = [k] + s.best_covisible(k, 20)
        local_set = set(local)
        # anchors: observers of local points outside the local set
        pts = s.kf_point[np.asarray(local)]
        pts = np.unique(pts[pts >= 0])
        obs_mask = np.isin(s.kf_point, pts) & (s.kf_point >= 0)
        observers = np.nonzero(obs_mask.any(axis=1) & s.kf_valid)[0]
        anchors = [int(j) for j in observers if int(j) not in local_set]
        # always anchor kf 0 (gauge)
        if 0 in local_set and len(local) > 1:
            local.remove(0)
            anchors.append(0)
        # monocular scale gauge: ONE fixed pose leaves the 7th (scale) gauge
        # free and local BA can slide the whole map's scale — anchor at least
        # TWO keyframes (the oldest local ones, never the new KF k)
        while len(anchors) < 2 and len(local) > 1:
            oldest = min(j for j in local if j != k)
            local.remove(oldest)
            anchors.append(oldest)
        return s.ba_problem(np.asarray(local), np.asarray(anchors, np.int64))

    def _solve_ba(self, prob, max_iters: int, interrupt=None):
        nK = len(prob["kf_ids"])
        nP = len(prob["pt_ids"])
        nO = len(prob["obs_kf"])
        # Bucketed padding: local-BA problem sizes vary every keyframe, and
        # unpadded shapes would force an XLA recompile per call. Pad to the
        # next bucket so the jitted solver compiles a handful of times total.
        pK = _bucket4(nK, 8)
        pP = _bucket4(nP, 256)
        pO = _bucket4(nO, 1024)
        params = BAParams(
            jnp.asarray(np.pad(prob["poses"], ((0, pK - nK), (0, 0)))),
            jnp.asarray(np.pad(prob["points"], ((0, pP - nP), (0, 0)))),
            self.mc6,
            self.intr,
        )
        obs = Observations(
            jnp.asarray(np.pad(prob["obs_kf"], (0, pO - nO))),
            # padding rows carry the LAST (padding) point slot purely for
            # scatter locality — optim/lm._segsum is an order-independent
            # scatter-add, so any masked-out slot would be correct
            jnp.asarray(np.pad(prob["obs_pt"], (0, pO - nO), constant_values=pP - 1)),
            jnp.asarray(np.pad(prob["obs_cam"], (0, pO - nO))),
            jnp.asarray(np.pad(prob["obs_uv"], ((0, pO - nO), (0, 0)))),
            jnp.asarray(np.pad(prob["obs_inv_sigma2"], (0, pO - nO))),
            jnp.asarray(np.arange(pO) < nO),
        )
        free = FreeMask(
            poses=jnp.asarray(np.arange(pK) < prob["n_free_kf"]),
            points=jnp.asarray(np.arange(pP) < nP),
        )
        from multicol_slam_tpu.optim.ba import bundle_adjust_interruptible

        # Chunk sizing by pipeline mode: SEQUENTIAL favors few round trips
        # (5 LM iterations per device program — each inter-chunk control
        # readback is a full RPC on a tunneled device); ASYNC favors short
        # programs (1 iteration, ~60 ms at the largest local bucket) because
        # the tracker's fused program queues behind whatever chunk is running
        # and the depth-2 pipeline only absorbs ~80 ms of queueing — a
        # 5-iteration chunk was measured to stall tracked frames 400-800 ms.
        chunk = 1 if self.yield_gate is not None else 5
        cg = 16 if self.yield_gate is not None else 24
        out, _ = bundle_adjust_interruptible(params, obs, free, max_iters=max_iters,
                                             cg_iters=cg, interrupt=interrupt,
                                             pre_step=self._yield, chunk_iters=chunk)
        return out, obs, nK, nP, nO

    def _writeback_ba(self, prob, out, obs, nK, nP, nO):
        s = self.store
        # prune outlier observations from the map (chi2 pass, :798-860);
        # observations erased while the solve ran are BAD_ID now — erasing
        # again is a harmless no-op (the same benign write-back race the
        # reference tolerates, cMap.h:39)
        valid = np.asarray(prune_observations(out, obs))[:nO]
        bad = np.nonzero(~valid)[0]
        for i in bad:
            kf_g = int(prob["obs_kf_global"][i])
            if s.kf_point[kf_g, int(prob["obs_feat"][i])] >= 0:
                s.erase_observation(kf_g, int(prob["obs_feat"][i]))
        s.write_back(prob, poses=np.asarray(out.poses)[:nK], points=np.asarray(out.points)[:nP])

    # ------------------------------------------------------------------
    def cull_keyframes(self, k: int):
        """KeyFrameCulling (cLocalMapping.cpp:520-597): a local KF is culled
        when >=90% of its points are seen >=KF_REDUNDANT_OBS times elsewhere
        at the same or finer scale."""
        from multicol_slam_tpu import native

        s = self.store
        for j in s.best_covisible(k, 10):
            if j == 0 or not s.kf_valid[j]:
                continue  # never cull the origin anchor
            feats = np.nonzero(s.kf_point[j] >= 0)[0]
            if len(feats) < 20:
                continue
            # one native/vectorized pass over the table per candidate KF
            # (was a per-feature Python loop with a full scan per point)
            n_better = native.redundancy_counts(s.kf_point, s.kf_octave, s.kf_valid, int(j))
            ok = s.pt_valid[s.kf_point[j, feats]]
            redundant = int(((n_better[feats] >= KF_REDUNDANT_OBS) & ok).sum())
            if redundant > KF_REDUNDANT_FRAC * len(feats):
                s.erase_keyframe(j)

    # ------------------------------------------------------------------
    def run(self, k: int, do_ba: bool = True, interrupt=None):
        """One pass of the mapping pipeline for new keyframe k. The lock is
        held only for host bookkeeping and commit phases — every device
        computation (triangulation, fuse matching, the BA solve) runs outside
        it, so an async tracker never waits for the whole pipeline.

        `interrupt` (optional callable -> bool): checked before the BA solve;
        when true (a newer keyframe is already queued) the BA is deferred to
        that keyframe's pass — the reference's InterruptBA capability
        (cLocalMapping.cpp:515, mbAbortBA set by InsertMultiKeyFrame)."""
        with self.lock:
            if not self.store.kf_valid[k]:
                return 0  # culled while queued
            self.process_new_keyframe(k)
            self.cull_map_points(k)
        n_new = self.create_new_points(k)
        # Backlog prioritization, exactly the reference's loop shape
        # (cLocalMapping.cpp:69-129): triangulation runs for EVERY queued
        # keyframe, but SearchInNeighbors and local BA only when no newer
        # keyframe is waiting — under pressure, map EXTENSION (the points
        # the starving tracker needs) outranks map refinement.
        if not (interrupt is not None and interrupt()):
            self.fuse_neighbors(k)
        # Starvation bound on refinement: force a BA pass at least every
        # MAX_BA_DEFERRALS keyframes; the forced solve still yields to the
        # queue between chunks (>= one 5-iteration chunk always runs).
        force_ba = self._ba_deferred >= self.MAX_BA_DEFERRALS
        skip_ba = interrupt is not None and interrupt() and not force_ba
        if do_ba and self.store.kf_valid.sum() >= 3 and not skip_ba:
            self._ba_deferred = 0
            self.local_ba(k, interrupt=interrupt)
            # KeyFrameCulling follows BA, like the reference (:100-104)
            with self.lock:
                self.cull_keyframes(k)
        elif do_ba:
            self._ba_deferred += 1
        return n_new


@functools.partial(jax.jit, static_argnames=("radius", "use_masks"))
def fuse_match(mc6, intr, cams, feats, pose, pts, radius: float = 3.0, use_masks: bool = False):
    """Returns (assign, dist, keep, packed) — packed = [3, C*K] f32 stacking
    the three so callers pay ONE device->host readback (~25 ms tunnel RPC
    each) instead of three."""
    from multicol_slam_tpu.slam.tracking_kernels import project_and_match

    # TH_LOW = 2*descBytes, x0.5 when masks are active (cORBmatcher.cpp:46-65)
    th = (1.0 if use_masks else 2.0) * pts.desc.shape[-1]
    assign, dist, keep = project_and_match(
        mc6, intr, cams, feats, pose, pts, radius=radius, th_desc=th, use_masks=use_masks
    )
    packed = jnp.stack([assign.astype(jnp.float32), dist, keep.astype(jnp.float32)])
    return assign, dist, keep, packed
