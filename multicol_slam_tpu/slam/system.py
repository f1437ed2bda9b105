"""System facade: the tracking state machine + pipeline orchestration.

Re-expresses cSystem + cTracking (SURVEY.md §2 rows 2-3, §3.2): per frame
  extract -> (init | motion-model stage -> local-map stage) -> KF decision
with the map maintained by slam/local_mapping.py after each keyframe and
loops closed by slam/loop_closing.py. The reference's 4 threads + mutexes
become a host-orchestrated sequence of jitted device programs (deliberate:
the map is single-writer, tracking latency comes from device-level fusion,
and stages can later be dispatched on separate device streams).

States: NO_IMAGES_YET -> NOT_INITIALIZED -> INITIALIZING -> WORKING <-> LOST
(cTracking.h:79-87).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.rig import MultiCamRig
from multicol_slam_tpu.optim.ba import bundle_adjust_jit
from multicol_slam_tpu.optim.problem import BAParams, FreeMask, Observations
from multicol_slam_tpu.slam.features import FrameFeatures, extract_features_jit
from multicol_slam_tpu.slam.initializer import bootstrap, points_to_world
from multicol_slam_tpu.slam.local_mapping import LocalMapper
from multicol_slam_tpu.slam.map_store import (
    BAD_ID,
    MapConfig,
    MapStore,
    cayley_to_hom_np,
    hom_to_cayley_np,
)
from multicol_slam_tpu.slam.tracking_kernels import (
    LocalPoints,
    track_frame_fused,
    track_stage,
    unpack_fused,
)
from multicol_slam_tpu.utils.config import SlamSettings
from multicol_slam_tpu.utils.geometry import cayley_to_hom, hom_inverse, hom_to_cayley

# tracking states (cTracking.h:79-87)
NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
INITIALIZING = 2
WORKING = 3
LOST = 4

MIN_INIT_KPS = 100        # cTracking.cpp:383
MIN_TRACK_INLIERS = 15    # cTracking.cpp:881-886
MIN_POSE_INLIERS = 6      # after pose-only stages (:794)
KF_MIN_INLIERS = 25       # c2 gate (:914-928)
KF_REF_RATIO = 0.9


@dataclasses.dataclass
class _FrameHandle:
    """In-flight frame between track_begin and track_finish: the dispatched
    fused program's packed result (an async device array) plus the host
    state its consumption needs."""

    feats: object
    timestamp: float
    m: "FrameMetrics"
    t0: float
    done: bool = False            # rare sync paths completed inside begin
    no_candidates: bool = False   # local map too small — LOST path in finish
    packed: object = None
    lp2: object = None
    pt_ids2: object = None
    begin_ms: float = 0.0
    epoch: int = 0                # store generation; stale handles are dropped


@dataclasses.dataclass
class FrameMetrics:
    frame_id: int
    timestamp: float
    state: int
    pose: np.ndarray
    n_matches: int = 0
    n_inliers: int = 0
    track_ms: float = 0.0
    is_keyframe: bool = False
    # trajectory anchoring (the reference's SaveMKFTrajectoryLAFIDA writes
    # keyframe poses at SHUTDOWN, after all BA/loop refinement,
    # cSystem.cpp:260-290): each frame records its pose RELATIVE to its
    # reference keyframe at track time; save_trajectory composes it with the
    # keyframe's FINAL pose, so mapping-worker refinements that land after
    # the frame was tracked still reach the saved trajectory.
    ref_kf: int = -1
    ref_kf_frame: int = -1     # identity check: KF slot ids are recycled
    rel_pose: Optional[np.ndarray] = None  # cayley6 of M_ref^-1 . M_frame


class MultiColSLAM:
    """The cSystem equivalent: construct once, call `track` per frame."""

    def __init__(
        self,
        rig: MultiCamRig,
        settings: SlamSettings,
        map_cfg: Optional[MapConfig] = None,
        use_loop_closing: bool = True,
        seed: int = 0,
        async_mapping: bool = False,
    ):
        self.rig = rig
        self.settings = settings
        n_cams = rig.n_cams
        self.map_cfg = map_cfg or MapConfig(
            n_cams=n_cams,
            feats_per_cam=settings.extractor.n_features,
            n_levels=settings.extractor.n_levels,
            scale_factor=settings.extractor.scale_factor,
            desc_bytes=settings.extractor.desc_size,
        )
        # mdBRIEF stability-mask matching: active when the extractor learns
        # masks; every live matcher then uses the masked Hamming distance
        # with x0.5 thresholds (cORBmatcher.cpp:46-65, 2457-2480)
        self.use_masks = bool(settings.extractor.use_mdbrief and settings.extractor.learn_masks)
        th_scale = 0.5 if self.use_masks else 1.0
        self.th_track = 3.0 * self.map_cfg.desc_bytes * th_scale   # TH_HIGH
        self.th_low = 2.0 * self.map_cfg.desc_bytes * th_scale     # TH_LOW
        # Async mapping (the reference's thread 2+3, cSystem.cpp:98,102):
        # keyframes are queued to a background worker running local mapping +
        # loop closing; the tracker holds `map_lock` only for its short store
        # reads/writes, so keyframe frames no longer pay the full
        # local-BA + loop-detection latency inline.
        self.async_mapping = async_mapping
        if async_mapping:
            import threading

            self.map_lock = threading.Lock()
        else:
            from multicol_slam_tpu.slam.local_mapping import _NullLock

            self.map_lock = _NullLock()
        self.store = MapStore(self.map_cfg)
        self.mapper = LocalMapper(self.store, rig, use_masks=self.use_masks, lock=self.map_lock)
        self.loop_closer = None
        if use_loop_closing:
            from multicol_slam_tpu.slam.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(self.store, rig, use_masks=self.use_masks,
                                          lock=self.map_lock)
        self.mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
        self.intr = jnp.asarray(rig.cams.to_vector())
        self.key = jax.random.PRNGKey(seed)
        self.state = NO_IMAGES_YET
        self.frame_id = -1
        self.last_pose = np.zeros(6, np.float32)
        self.velocity = np.eye(4, dtype=np.float32)
        self.ref_feats = None
        self.last_feats = None
        self.last_assign_global: Optional[np.ndarray] = None  # feat -> global pt id
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.ref_kf_tracked = 0
        self.ref_kf_id = -1          # mpReferenceKF (max-vote local KF)
        self._last_reloc_frame = -(10 ** 9)  # mnLastRelocFrameId
        self._interrupt_ba = False   # InterruptBA request (cLocalMapping.cpp:515)
        self._truncated_local_pts = 0  # observability: stage-2 cap drops
        # keyframe-decision observability: how often an insertion that passed
        # the reference gates was deferred because the mapper was busy
        self._kf_deferred_busy = 0
        self.trajectory: List[FrameMetrics] = []
        # fixed candidate capacity of the fused tracking program (static jit shape)
        self._stage2_cap = 4096
        self.localization_only = False
        self._force_reloc = False
        self._kf_queue = None
        self._worker = None
        self._frame_idle = None
        self._tracker_tid = None
        self._n_inflight = 0
        self._epoch = 0
        if async_mapping:
            import queue
            import threading

            self._kf_queue = queue.Queue()
            # cooperative device scheduling: the worker defers its next device
            # dispatch while a tracked frame is in flight (tracking owns the
            # chip during a frame; mapping fills the idle gaps of the real-
            # time frame period — the single-accelerator analogue of the
            # reference's OS-preemptible threads). Bounded wait: a saturated
            # tracker can never starve mapping.
            self._frame_idle = threading.Event()
            self._frame_idle.set()
            # dispatch-budget gate: the worker earns ONE dispatch credit per
            # tracked frame (capped burst of 4). Without any gate the worker
            # back-to-back-fills the device with ~60 ms mapping programs and
            # EVERY tracked frame queues behind one (paced p50 measured
            # 15 -> 55 ms); a strict one-per-frame edge was measured to
            # throttle mapping below the map's survival rate under backlog.
            # Credits cap the tracker's worst queueing at a small burst while
            # letting mapping spend accumulated idle frames. Bounded waits
            # (0.2 s) keep mapping draining when tracking goes idle.
            self._budget = 0
            self._budget_cv = threading.Condition()
            self.mapper.yield_gate = self._yield_to_tracker
            if self.loop_closer is not None:
                self.loop_closer.yield_gate = self._yield_to_tracker
            self._worker = threading.Thread(target=self._mapping_worker, daemon=True)
            self._worker.start()
        # set by checkpoint resume (--load-map): disables the small-map
        # auto-reset so a failed relocalization never wipes the loaded map
        self.map_resumed = False

    # ------------------------------------------------------------------
    def prepare(self, images) -> FrameFeatures:
        """Dispatch upload + feature extraction for a frame WITHOUT blocking.
        Call one frame ahead and pass the result to track(feats=...): the
        image transfer and extraction compute then overlap the previous
        frame's readback / real-time pacing gap instead of sitting on the
        critical path (the reference overlaps extraction with OpenMP worker
        threads, cMultiFrame.cpp:128; on an accelerator the same overlap
        falls out of async dispatch)."""
        return self._extract(images)

    def _extract(self, images) -> FrameFeatures:
        """Extraction with the state-dependent bank: while the map is
        bootstrapping, the init-mode extractor runs with 2x features at FAST
        threshold 5 (the reference constructs a second mdBRIEFextractor for
        initialization, cTracking.cpp:152-158) so the 8-point RANSAC and the
        first triangulation see a dense correspondence field; once WORKING,
        the runtime bank. track_begin downselects a stale init-bank frame
        (prefetch raced a state change) back to runtime capacity."""
        ex = self.settings.extractor
        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED, INITIALIZING):
            return extract_features_jit(
                jnp.asarray(images), self.rig.cams, ex,
                n_features=2 * ex.n_features, fast_th=5.0,
            )
        return extract_features_jit(jnp.asarray(images), self.rig.cams, ex)

    def _level_quotas(self):
        """Per-level slot budgets of the RUNTIME extractor bank (preserved by
        the init-bank downselect so coarse levels are never starved)."""
        from multicol_slam_tpu.ops.fast import level_quota

        ex = self.settings.extractor
        return level_quota(ex.n_features, ex.n_levels, ex.scale_factor)

    def track(self, images=None, feats: Optional[FrameFeatures] = None, timestamp: float = 0.0) -> FrameMetrics:
        """TrackMultiColSLAM (cSystem.cpp:182) + cTracking::Track (:237).
        Accepts raw images [C, H, W] or precomputed FrameFeatures (the test
        oracle path)."""
        return self.track_finish(self.track_begin(images=images, feats=feats, timestamp=timestamp))

    def track_begin(self, images=None, feats: Optional[FrameFeatures] = None,
                    timestamp: float = 0.0) -> "_FrameHandle":
        """First half of a tracked frame: host candidate prep + the fused
        tracking program's dispatch + an async result copy — returns WITHOUT
        blocking on the device. A real-time caller dispatches here, sleeps
        out the camera period (during which the result's RPC completes), and
        calls track_finish to consume it: the device round-trip latency then
        costs zero blocking time at the camera rate. track() = begin+finish
        back-to-back (identical semantics, the round trip on the critical
        path)."""
        # multiple frames may be in flight (pipeline depth > 1: begin(t) uses
        # the state last updated by the newest consumed frame); results MUST
        # be consumed via track_finish in dispatch order
        self._n_inflight += 1
        t0 = time.perf_counter()
        if self._frame_idle is not None:
            import threading

            self._tracker_tid = threading.get_ident()
            self._frame_idle.clear()
        try:
            self.frame_id += 1
            if feats is None:
                # upload in the native dtype (uint8 camera frames stay 1 B/px
                # on the wire); extract_features casts on device
                feats = self._extract(images)
            if (self.state in (WORKING, LOST)
                    and feats.k != self.map_cfg.feats_per_cam):
                # prefetched with the init bank but the state advanced while
                # it was in flight: reduce to runtime capacity
                from multicol_slam_tpu.slam.features import downselect_features

                feats, _ = downselect_features(feats, self.map_cfg.feats_per_cam,
                                               quotas=self._level_quotas())
            m = FrameMetrics(self.frame_id, timestamp, self.state, self.last_pose.copy())
            h = _FrameHandle(feats=feats, timestamp=timestamp, m=m, t0=t0,
                             epoch=self._epoch)
            if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
                if int(np.asarray(feats.valid).sum()) > MIN_INIT_KPS:
                    self.ref_feats = feats
                    self.state = INITIALIZING
                else:
                    self.state = NOT_INITIALIZED
                h.done = True
            elif self.state == INITIALIZING:
                self._try_initialize(feats, timestamp)
                h.done = True
            elif self.state in (WORKING, LOST):
                self._track_frame_begin(h)
            h.begin_ms = (time.perf_counter() - t0) * 1e3
            return h
        finally:
            if self._frame_idle is not None:
                self._frame_idle.set()

    def track_finish(self, h: "_FrameHandle") -> FrameMetrics:
        """Second half: consume the dispatched frame's packed result (the
        readback), run the rare fallback paths, bookkeeping, and the
        keyframe decision."""
        t0 = time.perf_counter()
        self._n_inflight -= 1
        m = h.m
        if h.epoch != self._epoch:
            h.done = True  # the map was reset while this frame was in flight
        # hold the tracker-priority gate through the readback consumption:
        # the mapping worker must not race its dispatch RPCs against this
        # frame's result fetch on the tunnel (the gate is edge-style — set
        # again in the finally — so it bounds, not starves, the worker)
        if self._frame_idle is not None:
            self._frame_idle.clear()
        try:
            if not h.done:
                self._track_frame_finish(h)
        finally:
            if self._frame_idle is not None:
                self._frame_idle.set()
                with self._budget_cv:
                    # 2 credits per frame, small cap: mapping may spend ~2
                    # bounded programs per camera period (its wall time per
                    # keyframe then fits the keyframe interval, so the
                    # NeedNewKeyFrame mapper-idle gate never starves the map)
                    # while a tracked frame queues behind at most ~2 programs
                    self._budget = min(self._budget + 2, 6)
                    self._budget_cv.notify()
        self.last_feats = h.feats
        m.state = self.state
        m.pose = self.last_pose.copy()
        if self.state == WORKING:
            self._record_anchor(m)
        m.track_ms = h.begin_ms + (time.perf_counter() - t0) * 1e3
        self.trajectory.append(m)
        return m

    def _record_anchor(self, m: FrameMetrics):
        """Anchor this frame's pose to its reference keyframe so
        save_trajectory can compose with the keyframe's FINAL (post-BA,
        post-loop) pose — the reference's trajectory is written at shutdown
        from keyframe poses (cSystem.cpp:260-290), so its output always
        reflects all refinement; recording only the track-time pose would
        deny the async pipeline's trajectory every refinement that lands
        after the frame."""
        s = self.store
        rk = self.ref_kf_id
        if rk < 0:
            return
        with self.map_lock:
            if not s.kf_valid[rk]:
                return
            ref_pose = s.kf_pose[rk].copy()
            m.ref_kf_frame = int(s.kf_frame_id[rk])
        m.ref_kf = int(rk)
        m.rel_pose = hom_to_cayley_np(
            np.linalg.inv(cayley_to_hom_np(ref_pose)) @ cayley_to_hom_np(m.pose))

    def _yield_to_tracker(self):
        """Called by the mapping worker before each device dispatch: wait
        for the next tracked-frame edge (one dispatch per frame period) and
        for any in-flight begin/finish to clear, so tracking kernels never
        queue behind more than one mapping program on the shared chip.
        No-op when called from the tracking thread itself (the synchronous
        mapper calls in _try_initialize would otherwise dead-wait on events
        the caller only sets after returning)."""
        if self._frame_idle is not None:
            import threading

            if threading.get_ident() == self._tracker_tid:
                return
            with self._budget_cv:
                if self._budget <= 0:
                    self._budget_cv.wait(timeout=0.2)
                self._budget = max(self._budget - 1, 0)
            self._frame_idle.wait(timeout=0.05)

    # ------------------------------------------------------------------
    def _try_initialize(self, feats, timestamp):
        self.key, sub = jax.random.split(self.key)
        res, n_matches = bootstrap(self.rig, self.ref_feats, feats, key=sub, use_masks=self.use_masks)
        if res is None:
            # geometry not ready (baseline too small): KEEP the reference so
            # parallax accumulates; only re-snapshot when overlap collapses
            if n_matches < 100 and int(np.asarray(feats.valid).sum()) > MIN_INIT_KPS:
                self.ref_feats = feats
            return
        # recover METRIC scale from the rig baseline before committing the
        # map (dense cross-camera scale consensus — see calibrate_metric_scale;
        # the reference's equivalent is cross-cam re-observation + GBA,
        # cTracking.cpp:520-701). Without this the arbitrary essential-matrix
        # scale collides with metric cross-cam observations in later BA.
        from multicol_slam_tpu.slam.initializer import calibrate_metric_scale

        scale, n_cross = calibrate_metric_scale(self.rig, self.ref_feats, feats, res)
        if scale != 1.0:
            from multicol_slam_tpu.slam.initializer import _mt2_of_scale

            Mc = np.asarray(self.rig.Mc[res.leading_cam], np.float64)
            T21 = np.linalg.inv(np.linalg.inv(Mc) @ np.asarray(res.Mt2) @ Mc)
            res = res._replace(
                points_cam=res.points_cam * scale,
                Mt2=_mt2_of_scale(self.rig, res.leading_cam, T21[:3, :3], T21[:3, 3], scale),
            )
        # init-bank downselect: the bootstrap frames carry 2x features at
        # FAST th 5 (cTracking.cpp:152-158) — the dense field served the
        # 8-point RANSAC and scale consensus above; the map store and
        # tracking programs are shaped for the runtime capacity, so reduce
        # both frames to K slots. Slot priority: triangulated features whose
        # detector response ALSO clears the runtime FAST threshold (weaker
        # corners would seed map points the runtime extractor never
        # re-detects — measured to rot the map with unobservable seeds),
        # then by response.
        feat1 = np.asarray(res.feat1, np.int64)
        feat2 = np.asarray(res.feat2, np.int64)
        Xw = points_to_world(self.rig, res.leading_cam, res.points_cam)
        Kc = self.map_cfg.feats_per_cam
        if self.ref_feats.k != Kc or feats.k != Kc:
            from multicol_slam_tpu.slam.features import downselect_features

            th_run = float(self.settings.extractor.fast_th)
            r1 = np.asarray(self.ref_feats.response).reshape(-1)
            r2 = np.asarray(feats.response).reshape(-1)
            strong = (r1[feat1] >= th_run) & (r2[feat2] >= th_run)
            quotas = self._level_quotas()
            self.ref_feats, remap1 = downselect_features(self.ref_feats, Kc,
                                                         keep=feat1[strong],
                                                         quotas=quotas)
            feats, remap2 = downselect_features(feats, Kc, keep=feat2[strong],
                                                quotas=quotas)
            feat1 = remap1[feat1]
            feat2 = remap2[feat2]
            sel = (feat1 >= 0) & (feat2 >= 0) & strong
            feat1, feat2, Xw = feat1[sel], feat2[sel], Xw[sel]
        s = self.store
        k1 = s.add_keyframe(np.zeros(6, np.float32), self.ref_feats, timestamp, self.frame_id - 1)
        pose2 = np.asarray(hom_to_cayley(jnp.asarray(res.Mt2, jnp.float32)))
        k2 = s.add_keyframe(pose2, feats, timestamp, self.frame_id)
        new_ids = []
        for i in range(len(Xw)):
            f1, f2 = int(feat1[i]), int(feat2[i])
            p = s.add_point(
                Xw[i].astype(np.float32),
                s.kf_desc[k1, f1],
                s.kf_dmask[k1, f1],
                first_kf=k1,
                normal=np.zeros(3, np.float32),
                min_dist=0.1,
                max_dist=25.0,
            )
            s.add_observation(k1, f1, p)
            s.add_observation(k2, f2, p)
            new_ids.append(p)
        s.update_point_stats_many(np.asarray(new_ids))
        # initial refinement, reference order (cTracking.cpp:513-701):
        # cross-camera re-observation FIRST (metric-scale-pinning
        # observations), then GBA with only the first pose anchored so the
        # whole map can settle onto the rig-metric gauge.
        self.mapper.fuse_neighbors(k2)
        self._global_ba(anchor_first=True, max_iters=10)
        self.mapper.run(k2, do_ba=False)
        self.last_pose = np.asarray(s.kf_pose[k2])
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_kf_id = k2
        self.frames_since_kf = 0
        self.last_assign_global = self._kf_assign(k2)
        self.ref_kf_tracked = int((s.kf_point[k2] >= 0).sum())
        self.ref_kf_id = k2
        self.state = WORKING

    def _kf_assign(self, k):
        return self.store.kf_point[k].copy()

    # ------------------------------------------------------------------
    def _gather_points(self, pt_ids: np.ndarray, cap: int) -> LocalPoints:
        with self.map_lock:
            return self._gather_points_locked(pt_ids, cap)

    def _gather_points_locked(self, pt_ids: np.ndarray, cap: int) -> LocalPoints:
        s = self.store
        n = min(len(pt_ids), cap)
        if n < len(pt_ids):
            # no silent caps: count + log the first few truncations so an
            # oversized local map is visible in the metrics
            self._truncated_local_pts += len(pt_ids) - n
            if self._truncated_local_pts <= 3 * (len(pt_ids) - n):
                print(f"[multicol-slam] local-map gather truncated "
                      f"{len(pt_ids) - n} of {len(pt_ids)} points (cap {cap})")
        pt_ids = pt_ids[:n]
        pad = cap - n
        return LocalPoints(
            X=jnp.asarray(np.pad(s.pt_X[pt_ids], ((0, pad), (0, 0)))),
            desc=jnp.asarray(np.pad(s.pt_desc[pt_ids], ((0, pad), (0, 0)))),
            min_dist=jnp.asarray(np.pad(s.pt_min_dist[pt_ids], (0, pad))),
            max_dist=jnp.asarray(np.pad(s.pt_max_dist[pt_ids], (0, pad), constant_values=1.0)),
            valid=jnp.asarray(np.pad(np.ones(n, bool), (0, pad))),
            normal=jnp.asarray(np.pad(s.pt_normal[pt_ids], ((0, pad), (0, 0)))),
            dmask=jnp.asarray(np.pad(s.pt_dmask[pt_ids], ((0, pad), (0, 0))))
            if self.use_masks else None,
        ), pt_ids

    def _track_frame_begin(self, h: "_FrameHandle"):
        """Host prep + dispatch of the fused two-stage tracking program.
        Rare synchronous paths (forced relocalization, no candidates) finish
        inline and mark the handle done."""
        s = self.store
        feats, m = h.feats, h.m
        sf = self.settings.extractor.scale_factor
        nl = self.settings.extractor.n_levels
        # ForceRelocalisation (cTracking.cpp:1340-1351): requested after a
        # loop correction; re-acquire the pose from scratch before tracking
        if self._force_reloc:
            self._force_reloc = False
            if self._relocalize(feats, m, forced=True):
                self.state = WORKING
            else:
                self.state = LOST
                h.done = True
                return
        # ---- both tracking stages as ONE fused device program -------------
        # (motion-model stage + local-map stage, SURVEY.md §7 "one fused
        # tracking program per frame": one dispatch + one packed readback;
        # on a tunneled chip each extra readback is a full RPC round trip)
        pose_pred = self.last_pose
        if self.settings.use_motion_model:
            Mt = cayley_to_hom_np(self.last_pose)
            pose_pred = hom_to_cayley_np(Mt @ self.velocity)
        prev_pts = self.last_assign_global
        pt_ids = np.unique(prev_pts[prev_pts >= 0]) if prev_pts is not None else np.empty(0, np.int64)
        pt_ids = pt_ids[s.pt_valid[pt_ids]] if len(pt_ids) else pt_ids
        local_pts = self._local_map_points(pt_ids)
        if len(local_pts) < 10:
            h.no_candidates = True
            return
        # ONE gathered local-map block serves both stages (the reference's
        # TrackLocalMap also projects against the full local map,
        # cTracking.cpp:961-1020; the motion-model stage is the same
        # search at a wider radius from the predicted pose) — halves the
        # per-frame host gather + upload work
        lp2, pt_ids2 = self._gather_points(local_pts, self._stage2_cap)
        packed = track_frame_fused(
            self.mc6, self.intr, self.rig.cams, feats,
            jnp.asarray(pose_pred, jnp.float32), lp2, lp2,
            scale_factor=sf, n_levels=nl, radius1=15.0, radius2=4.0,
            th_desc=self.th_track, min_pose_inliers=MIN_POSE_INLIERS,
            use_masks=self.use_masks,
        )
        # enqueue the device->host copy NOW: on a remote/tunneled device the
        # transfer request then rides the same stream as the compute instead
        # of paying a second full RPC round trip after compute finishes
        packed.copy_to_host_async()
        h.packed = packed
        h.lp2 = lp2
        h.pt_ids2 = pt_ids2

    def _track_frame_finish(self, h: "_FrameHandle"):
        s = self.store
        feats, m, timestamp = h.feats, h.m, h.timestamp
        sf = self.settings.extractor.scale_factor
        nl = self.settings.extractor.n_levels
        n_inl = 0
        ok = False
        assign_global = np.full(s.cfg.feats_per_kf, BAD_ID, np.int32)
        if h.packed is not None:
            pt_ids2 = h.pt_ids2
            _, n1, pose_f2, n_match2, n_inl, assign, inl = unpack_fused(np.asarray(h.packed))
            if n_inl < MIN_TRACK_INLIERS and n1 < MIN_POSE_INLIERS:
                # rare host path — TrackPreviousFrame coarse->fine protocol
                # (cTracking.cpp:731-795): wide window search + pose opt from
                # the UNADVANCED last pose, then a narrower re-search + second
                # pose opt; fused into one two-stage program as well
                packed = track_frame_fused(
                    self.mc6, self.intr, self.rig.cams, feats,
                    jnp.asarray(self.last_pose, jnp.float32), h.lp2, h.lp2,
                    scale_factor=sf, n_levels=nl, radius1=60.0, radius2=40.0,
                    th_desc=self.th_track, min_pose_inliers=MIN_POSE_INLIERS,
                    use_masks=self.use_masks,
                )
                _, _, pose_f2, n_match2, n_inl, assign, inl = unpack_fused(np.asarray(packed))
            ok = n_inl >= MIN_TRACK_INLIERS
        if ok:
            self._finish_frame(pose_f2)
            matched = (assign >= 0) & inl
            assign_global[matched] = pt_ids2[assign[matched]]
            # visibility bookkeeping (mnVisible/mnFound)
            with self.map_lock:
                s.pt_visible[pt_ids2] += 1
                s.pt_found[np.unique(assign_global[assign_global >= 0])] += 1
            m.n_matches = n_match2
            m.n_inliers = n_inl
            self.state = WORKING
        else:
            self.state = LOST
        self.last_assign_global = assign_global
        # ---- lost handling (auto-reset early, cTracking.cpp:322-329);
        # resumed/frozen maps are never auto-wiped — keep retrying reloc ----
        if self.state == LOST:
            if s.kf_valid.sum() <= 3 and not (self.map_resumed or self.localization_only):
                self.reset()
            elif self._relocalize(feats, m):
                self.state = WORKING
            return
        # ---- keyframe decision (NeedNewKeyFrame, cTracking.cpp:897-946) ---
        self.frames_since_kf += 1
        if self.localization_only:
            return  # ActivateLocalizationMode: track against the frozen map
        # post-relocalization holdoff (cTracking.cpp:904-905): no insertions
        # within maxFrames of a reloc once the map is established
        if (self.frame_id < self._last_reloc_frame + self.settings.max_frames
                and int(s.kf_valid.sum()) > self.settings.max_frames):
            return
        # mapper idle = AcceptMultiKeyFrames. The reference's flag is true
        # whenever its mapper is between queue items — even with a backlog —
        # so a strict queue-empty test is STRICTER than the reference and
        # starves keyframes whenever the tracker outruns the mapper (e.g. a
        # faster-than-real-time feed): allow a small backlog instead, with
        # InterruptBA applying pressure beyond it (cLocalMapping.cpp:69-129)
        mapper_idle = self._kf_queue is None or self._kf_queue.qsize() <= 1
        # no insertions while a loop correction is committing (the reference
        # blocks insertion while the mapper is stopped for CorrectLoop,
        # cTracking.cpp:899-901): a KF inserted mid-correction would miss the
        # correction's snapshot and land half-corrected
        if self.loop_closer is not None and self.loop_closer.loop_correcting:
            return
        c1a = self.frames_since_kf >= self.settings.max_frames
        c1b = self.frames_since_kf >= self.settings.min_frames and mapper_idle
        c2 = (n_inl < KF_REF_RATIO * max(self.ref_kf_tracked, 1)) and n_inl > KF_MIN_INLIERS
        # curBaseline2MKF (cTracking.cpp:876-877,:928): distance to the
        # reference keyframe must exceed 0.2 — a stationary rig never inserts
        baseline = 0.0
        if self.ref_kf_id >= 0:
            with self.map_lock:
                ref_pose = s.kf_pose[self.ref_kf_id].copy()
            baseline = float(np.linalg.norm(
                cayley_to_hom_np(self.last_pose)[:3, 3]
                - cayley_to_hom_np(ref_pose)[:3, 3]))
        if ((c1a or c1b) and c2) and baseline > 0.2:
            if mapper_idle:
                self._create_keyframe(feats, timestamp, assign_global, m.frame_id)
                m.is_keyframe = True
            else:
                # InterruptBA, but do not insert yet (cTracking.cpp:933-940)
                self._interrupt_ba = True
                self._kf_deferred_busy += 1

    def _finish_frame(self, new_pose: np.ndarray):
        Mt_last = cayley_to_hom_np(self.last_pose)
        Mt_new = cayley_to_hom_np(new_pose)
        self.velocity = (np.linalg.inv(Mt_last) @ Mt_new).astype(np.float32)
        self.last_pose = np.asarray(new_pose, np.float32)

    def _local_map_points(self, seed_pts: np.ndarray) -> np.ndarray:
        """UpdateReferenceKeyFrames + local points (cTracking.cpp:961-1130):
        KFs observing the currently tracked points (vote), plus their best
        covisible neighbors; local map = all their points."""
        with self.map_lock:
            return self._local_map_points_locked(seed_pts)

    def _local_map_points_locked(self, seed_pts: np.ndarray) -> np.ndarray:
        s = self.store
        if len(seed_pts) == 0:
            ks = s.active_kfs()[-5:]
        else:
            # native one-pass vote (the per-frame np.isin scan re-hashed the
            # seed set every frame and scaled with map size on the host)
            from multicol_slam_tpu import native

            votes = native.vote_counts(s.kf_point, s.kf_valid, seed_pts,
                                       s.cfg.max_points)
            ks = np.nonzero(votes > 4)[0]
            if len(ks) == 0:
                ks = np.argsort(-votes)[:3]
            ref = int(ks[np.argmax(votes[ks])])
            self.ref_kf_id = ref
            self.ref_kf_tracked = int((s.kf_point[ref] >= 0).sum())
            neighbors = set()
            for k in ks[:10]:
                neighbors.update(s.best_covisible(int(k), 5))
            ks = np.unique(np.concatenate([ks, np.asarray(sorted(neighbors), np.int64)])) if neighbors else ks
        pts = s.kf_point[ks[s.kf_valid[ks]]] if len(ks) else np.empty((0,), np.int64)
        pts = np.unique(pts[pts >= 0]) if len(pts) else np.empty(0, np.int64)
        return pts[s.pt_valid[pts]] if len(pts) else pts

    def _create_keyframe(self, feats, timestamp, assign_global, frame_id=None):
        s = self.store
        with self.map_lock:
            k = s.add_keyframe(self.last_pose, feats, timestamp,
                               self.frame_id if frame_id is None else frame_id)
            for f in np.nonzero(assign_global >= 0)[0]:
                s.add_observation(k, int(f), int(assign_global[f]))
            self.last_assign_global = s.kf_point[k].copy()
            self.last_kf_id = k
            self.frames_since_kf = 0
            self.ref_kf_id = k
            self.ref_kf_tracked = int((s.kf_point[k] >= 0).sum())
        if self.async_mapping:
            # Bootstrap keyframes are mapped SYNCHRONOUSLY: a young map (few
            # KFs, few points) must extend within a frame or two or tracking
            # dies and auto-resets — the worker's latency is only affordable
            # once the local map is established. The reference has the same
            # property implicitly: its mapper keeps up while the map is tiny.
            # (Bootstrap KF frames block ~1 s inline — a startup transient;
            # real-time benchmarks report steady-state percentiles past it.)
            if int(s.kf_valid.sum()) > 5:
                # hand off to the mapping worker (InsertMultiKeyFrame,
                # cLocalMapping.cpp:131-137); refined poses/points flow back
                # to tracking through the shared store on later frames
                self._kf_queue.put(k)
                return
            self.mapper.run(k)
            self.last_pose = s.kf_pose[k].copy()
            self.last_assign_global = s.kf_point[k].copy()
            return
        self.mapper.run(k)
        # pose may have been adjusted by local BA
        self.last_pose = s.kf_pose[k].copy()
        self.last_assign_global = s.kf_point[k].copy()
        if self.loop_closer is not None:
            closed = self.loop_closer.process(k)
            if closed:
                self.last_pose = s.kf_pose[k].copy()

    def _mapping_worker(self):
        """Background mapping + loop-closing thread (threads 2+3 of the
        reference, cSystem.cpp:98,102, collapsed into one worker — the loop
        closer runs after each mapped keyframe, like cLocalMapping feeding
        cLoopClosing). Store mutations synchronize via map_lock, held only
        for bookkeeping/commit phases; loop detection + Sim3 estimation run
        lock-free on benignly-stale reads and only CorrectLoop holds the lock
        (the reference stops the mapper there, cLoopClosing.cpp:464-490)."""
        import traceback

        while True:
            k = self._kf_queue.get()
            if k is None:
                self._kf_queue.task_done()
                return
            try:
                # defer BA when a newer keyframe is already waiting, or the
                # tracker requested an insertion while we were busy (the
                # reference's InterruptBA, cLocalMapping.cpp:515, raised from
                # NeedNewKeyFrame cTracking.cpp:933-940)
                self._interrupt_ba = False
                self.mapper.run(
                    k,
                    interrupt=lambda: self._interrupt_ba or not self._kf_queue.empty(),
                )
                if self.loop_closer is not None:
                    closed = self.loop_closer.process(k)
                    if closed:
                        # ForceRelocalisation after a loop correction
                        # (cLoopClosing.cpp:643): the tracker's cached pose
                        # predates the correction
                        self._force_reloc = True
            except Exception:
                traceback.print_exc()
            finally:
                self._kf_queue.task_done()

    # ------------------------------------------------------------------
    def _relocalize(self, feats, m: FrameMetrics, forced: bool = False) -> bool:
        """Relocalisation (cTracking.cpp:1138-1338): BoW candidate retrieval
        (DetectRelocalisationCandidates) -> descriptor matches to each
        candidate's map points (>=15) -> non-central absolute-pose RANSAC
        (our DLT+Procrustes replacing OpenGV GP3P, thr/iters per :1274-1275)
        -> gpnp-style refinement + local-map pose optimization; accept >=10.

        Latency bound: <=5 candidates x 3 device round trips each (Hamming
        block, batched 160-hypothesis RANSAC, confirmation track_stage), with
        early exit on the first accepted candidate — the common case is one
        candidate. The reference bounds the same path at <=150 sequential
        RANSAC iterations per candidate (cTracking.cpp:1274); ours runs all
        hypotheses as one batched program."""
        from multicol_slam_tpu.ops.matching import hamming_matrix
        from multicol_slam_tpu.ops.ransac import (
            ransac_noncentral_pose,
            refine_noncentral_pose,
        )
        from multicol_slam_tpu.utils.geometry import cayley_to_rot

        s = self.store
        # candidate keyframes: after a loop correction (forced=True) the
        # reference force-feeds the last KF's 5 best covisible keyframes as
        # the candidate set (cTracking.cpp:1152-1160) — post-correction these
        # are exactly the freshly corrected poses; the same set is also the
        # best no-vocabulary fallback. Otherwise: BoW retrieval.
        cands = []
        lc = self.loop_closer
        no_voc = lc is None or lc.voc is None or lc.db is None
        if forced or no_voc:
            lk = self.last_kf_id
            with self.map_lock:
                if lk >= 0 and s.kf_valid[lk]:
                    cands = [int(lk)] + [int(j) for j in s.best_covisible(int(lk), 5)]
        if not forced and lc is not None and lc.voc is not None and lc.db is not None:
            descs = np.asarray(feats.desc).reshape(-1, feats.desc.shape[-1])
            valid = np.asarray(feats.valid).reshape(-1)
            from multicol_slam_tpu.models.vocab import bow_vector, transform_words

            bow = bow_vector(lc.voc, transform_words(lc.voc, descs[valid]))
            # full DetectRelocalisationCandidates protocol: shared-word cut
            # (db.query) + covisibility-group score accumulation with the
            # 0.75x gate (cMultiKeyFrameDatabase.cpp:223-339)
            cands = lc._group_accumulate(lc.db.query(bow, set(), 0.0))[:5]
        if not cands:
            cands = [int(k) for k in s.active_kfs()[-5:]][::-1]
        C, K, B = feats.desc.shape
        cur_desc = np.asarray(feats.desc).reshape(C * K, B)
        cur_rays = np.asarray(feats.rays).reshape(C * K, 3)
        cur_valid = np.asarray(feats.valid).reshape(C * K)
        Rc_all = np.asarray(self.rig.Mc)[:, :3, :3]
        tc_all = np.asarray(self.rig.Mc)[:, :3, 3]
        from multicol_slam_tpu.slam.local_mapping import _bucket

        for cand in cands:
            with self.map_lock:
                fk = np.nonzero((s.kf_point[cand] >= 0))[0]
                if len(fk) < 15:
                    continue
                # pad candidate descriptors to a bucket so the Hamming kernel
                # and the RANSAC program compile once per bucket
                nF = len(fk)
                pF = _bucket(nF, 256)
                cdesc = np.zeros((pF, B), np.uint8)
                cdesc[:nF] = s.kf_desc[cand][fk]
                cand_pts_row = s.kf_point[cand].copy()
            if self.use_masks:
                from multicol_slam_tpu.ops.matching import hamming_matrix_masked

                cmask = np.full((pF, B), 255, np.uint8)
                with self.map_lock:
                    cmask[:nF] = s.kf_dmask[cand][fk]
                cur_mask = np.asarray(feats.dmask).reshape(C * K, B)
                d = np.array(hamming_matrix_masked(
                    jnp.asarray(cur_desc), jnp.asarray(cur_mask),
                    jnp.asarray(cdesc), jnp.asarray(cmask),
                ))
            else:
                d = np.array(hamming_matrix(jnp.asarray(cur_desc), jnp.asarray(cdesc)))
            d[:, nF:] = 1e9
            d[~cur_valid] = 1e9
            best = d.argmin(1)
            bestd = d.min(1)
            ok = bestd <= self.th_low
            if ok.sum() < 15:
                continue
            sel = np.nonzero(ok)[0]
            pts = cand_pts_row[fk[best[sel]]]
            nS = len(sel)
            pS = _bucket(nS, 64)
            Xw = np.zeros((pS, 3), np.float32)
            with self.map_lock:
                Xw[:nS] = s.pt_X[pts]
            rays_p = np.zeros((pS, 3), np.float32)
            rays_p[:nS] = cur_rays[sel]
            rays_p[nS:, 2] = 1.0
            cam_idx = np.zeros(pS, np.int64)
            cam_idx[:nS] = sel // K
            res = ransac_noncentral_pose(
                jax.random.fold_in(self.key, self.frame_id),
                jnp.asarray(Xw),
                jnp.asarray(rays_p),
                jnp.asarray(Rc_all[cam_idx], jnp.float32),
                jnp.asarray(tc_all[cam_idx], jnp.float32),
                jnp.asarray(np.arange(pS) < nS),
                n_hyp=160,
            )
            if int(res.n_inliers) < 10:
                continue
            # gpnp-style refinement on the RANSAC inlier set before the
            # local-map confirmation (cTracking.cpp:1292 refines with OpenGV
            # gpnp after the GP3P RANSAC)
            Mt_ref = refine_noncentral_pose(
                jnp.asarray(Xw), jnp.asarray(rays_p),
                jnp.asarray(Rc_all[cam_idx], jnp.float32),
                jnp.asarray(tc_all[cam_idx], jnp.float32),
                res.inliers.astype(jnp.float32),
            )
            pose = np.asarray(hom_to_cayley(jnp.asarray(Mt_ref, jnp.float32)))
            # confirm by tracking the local map from the recovered pose
            local_pts = self._local_map_points(np.unique(pts))
            if len(local_pts) < 10:
                continue
            lp2, pt_ids2 = self._gather_points(local_pts, self._stage2_cap)
            from multicol_slam_tpu.slam.tracking_kernels import track_stage

            out = track_stage(
                self.mc6, self.intr, self.rig.cams, feats,
                jnp.asarray(pose, jnp.float32), lp2,
                scale_factor=self.settings.extractor.scale_factor,
                n_levels=self.settings.extractor.n_levels,
                radius=8.0, th_desc=self.th_track, use_masks=self.use_masks,
            )
            pose_f, _, n_ok, assign, inl = out.fetch()
            if n_ok >= 10:
                self._last_reloc_frame = self.frame_id  # mnLastRelocFrameId
                self.last_pose = pose_f
                self.velocity = np.eye(4, dtype=np.float32)
                ag = np.full(s.cfg.feats_per_kf, BAD_ID, np.int32)
                matched = (assign >= 0) & inl
                ag[matched] = pt_ids2[assign[matched]]
                self.last_assign_global = ag
                m.n_inliers = n_ok
                return True
        return False

    # ------------------------------------------------------------------
    def _global_ba(self, anchor_first: bool = True, max_iters: int = 15):
        s = self.store
        kfs = s.active_kfs()
        if len(kfs) < 2:
            return
        free_kfs = kfs[1:] if anchor_first else kfs
        anchors = kfs[:1] if anchor_first else np.empty(0, np.int64)
        prob = s.ba_problem(free_kfs, anchors)
        if prob is None:
            return
        from multicol_slam_tpu.slam.local_mapping import _bucket4

        nK, nP, nO = len(prob["kf_ids"]), len(prob["pt_ids"]), len(prob["obs_kf"])
        pK, pP, pO = _bucket4(nK, 8), _bucket4(nP, 256), _bucket4(nO, 1024)
        params = BAParams(
            jnp.asarray(np.pad(prob["poses"], ((0, pK - nK), (0, 0)))),
            jnp.asarray(np.pad(prob["points"], ((0, pP - nP), (0, 0)))),
            self.mc6,
            self.intr,
        )
        obs = Observations(
            jnp.asarray(np.pad(prob["obs_kf"], (0, pO - nO))),
            # padding rows carry the LAST (padding) point slot purely for
            # scatter locality (optim/lm._segsum is order-independent)
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
        out, _ = bundle_adjust_jit(params, obs, free, max_iters=max_iters,
                                   cg_iters=20)
        s.write_back(prob, poses=np.asarray(out.poses)[:nK], points=np.asarray(out.points)[:nP])

    # ------------------------------------------------------------------
    def wait_mapping_idle(self):
        """Block until the async mapping worker has drained its queue (used
        by benchmarks/tests that inspect the final map; the reference's
        equivalent is waiting on the mapper's idle flag)."""
        if self._kf_queue is not None:
            self._kf_queue.join()

    def reset(self):
        """cTracking::Reset (cTracking.cpp:1353-1401)."""
        self.wait_mapping_idle()
        self.store = MapStore(self.map_cfg)
        self.mapper = LocalMapper(self.store, self.rig, use_masks=self.use_masks, lock=self.map_lock)
        if self.loop_closer is not None:
            from multicol_slam_tpu.slam.loop_closing import LoopCloser

            # keep the vocabulary (training data stays representative across
            # resets; the reference reloads the same file) but rebuild the
            # inverted file against the fresh, empty map. Lock + yield-gate
            # wiring must match __init__: after an async-mode auto-reset the
            # CorrectLoop snapshot/commit phases still need mutual exclusion
            # against the tracker.
            voc = self.loop_closer.voc
            self.loop_closer = LoopCloser(self.store, self.rig, voc=voc,
                                          use_masks=self.use_masks,
                                          lock=self.map_lock)
        if self.async_mapping:
            self.mapper.yield_gate = self._yield_to_tracker
            if self.loop_closer is not None:
                self.loop_closer.yield_gate = self._yield_to_tracker
        self.state = NOT_INITIALIZED
        self.ref_feats = None
        self.last_assign_global = None
        self.velocity = np.eye(4, dtype=np.float32)
        self._epoch += 1
        self.ref_kf_id = -1
        self._last_reloc_frame = -(10 ** 9)
        self.frames_since_kf = 0

    def shutdown(self):
        """Join the mapping worker (cSystem::Shutdown thread joins); no-op in
        the sequential configuration."""
        if self._worker is not None:
            self._kf_queue.put(None)
            self._worker.join(timeout=300)
            self._worker = None

    def activate_localization_mode(self):
        """cSystem::ActivateLocalizationMode: freeze the map (no new
        keyframes / mapping / loop closing), keep tracking against it. The
        reference declares this API but ships it commented out
        (cSystem.cpp:187-209); here it is functional."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def force_relocalisation(self):
        """cTracking::ForceRelocalisation (cTracking.cpp:1340-1351): the next
        frame re-acquires its pose via relocalization before tracking."""
        self._force_reloc = True

    # ------------------------------------------------------------------
    def save_trajectory(self, path: str):
        from multicol_slam_tpu.io.trajectory import save_lafida_trajectory

        with self.map_lock:
            save_lafida_trajectory(path, self.trajectory, store=self.store)

    def save_metrics(self, path: str):
        """Structured per-frame metrics JSONL (SURVEY.md §5 observability:
        replaces the reference's cout prose + eval vectors cTracking.h:114-121
        with machine-readable records)."""
        import json

        with open(path, "w") as f:
            for m in self.trajectory:
                f.write(
                    json.dumps(
                        dict(
                            frame=m.frame_id,
                            t=m.timestamp,
                            state=m.state,
                            pose=[float(x) for x in m.pose],
                            n_matches=m.n_matches,
                            n_inliers=m.n_inliers,
                            track_ms=round(m.track_ms, 3),
                            keyframe=m.is_keyframe,
                        )
                    )
                    + "\n"
                )
            # run-level counters ('no silent caps': the local-map gather
            # truncation total is part of the observable record)
            f.write(json.dumps(dict(
                summary=True,
                truncated_local_points=int(self._truncated_local_pts),
                kf_deferred_mapper_busy=int(self._kf_deferred_busy),
                n_keyframes=int(self.store.kf_valid.sum()),
                n_points=int(self.store.pt_valid.sum()),
                n_loops_closed=(self.loop_closer.n_loops_closed
                                if self.loop_closer else 0),
                # real-time contract: the longest CorrectLoop lock-held phase
                # (every device solve runs lock-free; only numpy commits hold it)
                loop_locked_max_ms=round(max(
                    self.loop_closer.locked_phase_ms, default=0.0), 3)
                if self.loop_closer else 0.0,
            )) + "\n")

    def save_checkpoint(self, path: str):
        from multicol_slam_tpu.io.checkpoint import save_map

        save_map(path, self.store)
