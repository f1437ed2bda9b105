"""Fused tracking device kernels: project -> match -> pose-optimize.

The reference's per-frame hot path (SURVEY.md §3.2) walks points and grid
cells in nested loops (cORBmatcher::SearchByProjection + PoseOptimization).
Here each tracking stage is ONE jitted program over fixed shapes:

  dist[C, L, K] = MXU Hamming(point descriptors, frame descriptors)
  mask[C, L, K] = frustum(z>0, mirror, scale band) & window & level band
  assignment    = per-feature argmin + threshold (+ one-to-one resolution)
  pose          = 2-round robust pose-only GN on the matched observations

L = candidate-point capacity (padded), K = features/cam, C = cameras. The
whole frame needs 2 device calls (motion-model stage, local-map stage) and
returns only scalars + the assignment vector to the host — the
"one fused tracking program per frame" target of SURVEY.md §7.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import in_mirror_mask
from multicol_slam_tpu.optim.ba import pose_optimization
from multicol_slam_tpu.optim.problem import BAParams, Observations
from multicol_slam_tpu.ops.matching import unpack_pm1
from multicol_slam_tpu.utils.geometry import cayley_to_hom, hom_inverse, transform_points


class LocalPoints(NamedTuple):
    """Padded candidate map-point block for one tracking stage."""

    X: jnp.ndarray         # [L, 3]
    desc: jnp.ndarray      # [L, B] uint8
    min_dist: jnp.ndarray  # [L]
    max_dist: jnp.ndarray  # [L]
    valid: jnp.ndarray     # [L] bool
    normal: jnp.ndarray = None  # [L, 3] mean viewing direction (pt_normal);
    #                             None or all-zero rows disable the gate
    dmask: jnp.ndarray = None   # [L, B] mdBRIEF stability masks


class TrackStageOut(NamedTuple):
    pose: jnp.ndarray          # [6] optimized body pose
    assign: jnp.ndarray        # [C*K] local point index or -1
    inlier: jnp.ndarray        # [C*K] bool (survived pose-opt chi2)
    n_matches: jnp.ndarray     # scalar
    n_inliers: jnp.ndarray     # scalar
    packed: jnp.ndarray = None # [8 + 2*C*K] f32: pose(6), n_matches,
    #                            n_inliers, assign, inlier — ONE array so the
    #                            host fetches a stage's whole result in ONE
    #                            device->host transfer (each distinct-array
    #                            readback costs a full ~25 ms RPC round trip
    #                            on a tunneled device; per-frame latency is
    #                            readback-count-bound, not compute-bound)

    def fetch(self):
        """One-readback host view: (pose f32[6], n_matches, n_inliers,
        assign i32[C*K], inlier bool[C*K])."""
        p = np.asarray(self.packed)
        ck = (len(p) - 8) // 2
        return (
            p[:6],
            int(p[6]),
            int(p[7]),
            p[8:8 + ck].astype(np.int32),
            p[8 + ck:8 + 2 * ck] > 0.5,
        )


def project_rig(mc6, intr, pose6, X):
    """Project world points into every camera. X [L,3] -> uv [C,L,2], z [C,L]."""
    from multicol_slam_tpu.optim.problem import intr_project

    Mt = cayley_to_hom(pose6)
    MtMc_inv = hom_inverse(jnp.einsum("ij,cjk->cik", Mt, cayley_to_hom(mc6)))
    Xc = transform_points(MtMc_inv[:, None], X[None, :, :])
    uv = intr_project(intr[:, None, :], Xc)
    return uv, Xc[..., 2]


def _resolve_claims(best_pt, best_d, ok, L):
    """One-to-one duplicate-claim resolution with the reference's
    SearchByProjection semantics: a feature keeps its claim on point p iff no
    OTHER feature of the same camera also CLAIMS p (as its own best match,
    passing the threshold) at a smaller distance. A point may still match one
    feature in EACH camera — the multi-fisheye specialty — so resolution is
    per (cam, point), not global.

    Computed as a vectorized masked min-reduce over the claim matrix (a
    [C, K, L] broadcast — one extra elementwise pass over the distance-matrix
    footprint; the serialized scatter-min alternative costs ~1.2 ms/stage on
    TPU). best_pt/best_d/ok [C, K]. Returns keep [C, K]."""
    C, K = best_pt.shape
    BIGD = jnp.float32(1e9)
    claims = (best_pt[..., None] == jnp.arange(L)[None, None, :]) & ok[..., None]
    claimed_min = jnp.min(jnp.where(claims, best_d[..., None], BIGD), axis=1)  # [C, L]
    return ok & (best_d <= jnp.take_along_axis(claimed_min, best_pt, axis=1))


def project_and_match(
    mc6: jnp.ndarray,
    intr: jnp.ndarray,
    cams,
    feats,
    pose0: jnp.ndarray,
    pts: LocalPoints,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    radius: float = 15.0,
    th_desc: float = 96.0,
    level_tol: int = 1,
    use_masks: bool = False,
):
    """Projection-guided matching of candidate points against frame features
    (the SearchByProjection family, cORBmatcher.cpp:67-166). Returns
    (assign [C*K] local point idx or -1, dist [C*K], keep [C*K] bool).

    use_masks=True switches to the mdBRIEF masked Hamming distance
    (cORBmatcher.cpp:2457-2480) using pts.dmask / feats.dmask — callers must
    pass a x0.5-scaled th_desc (matching.th_high/th_low masked variants).
    """
    C, K, B = feats.desc.shape
    L = pts.X.shape[0]
    uv_p, z = project_rig(mc6, intr, pose0, pts.X)                 # [C, L, 2], [C, L]
    cam_ids = jnp.arange(C)[:, None]
    in_img = in_mirror_mask(cams, cam_ids, uv_p)                # [C, L]
    # scale-invariance distance band + predicted pyramid level
    Mt = cayley_to_hom(pose0)
    centers = jnp.einsum("ij,cjk->cik", Mt, cayley_to_hom(mc6))[:, :3, 3]  # [C,3]
    view = pts.X[None] - centers[:, None]                                  # [C,L,3]
    dist = jnp.linalg.norm(view, axis=-1)                                  # [C,L]
    band = (dist >= pts.min_dist[None] * 0.8) & (dist <= pts.max_dist[None] * 1.2)
    ratio = jnp.maximum(dist / jnp.maximum(pts.min_dist[None], 1e-6), 1.0)
    pred_level = jnp.clip(
        jnp.round(jnp.log(ratio) / np.log(scale_factor)).astype(jnp.int32), 0, n_levels - 1
    )                                                               # [C,L]
    cand = pts.valid[None] & (z > 0) & in_img & band                # [C, L]
    if pts.normal is not None:
        # viewing-angle gate (isInFrustum, cMultiFrame.cpp:218-270): reject
        # when cos(angle between mean viewing normal and current view) < 0.5;
        # points with no accumulated normal (zero rows) pass
        ncos = jnp.sum(view * pts.normal[None], axis=-1) / jnp.maximum(dist, 1e-9)
        have_n = jnp.linalg.norm(pts.normal, axis=-1) > 1e-6
        cand = cand & (~have_n[None] | (ncos > 0.5))
    # per-octave search window (cORBmatcher.cpp:326-392 WindowSearch scales
    # its window by the keypoint's octave): the base radius grows with the
    # level the point is PREDICTED to be observed at, so the wide
    # TrackPreviousFrame fallback (radius 60/40, slam/system.py) inherits the
    # same octave scaling as the narrow motion-model pass
    rad = radius * scale_factor ** pred_level.astype(jnp.float32)   # [C, L]
    BIGD = jnp.float32(1e9)
    masked = use_masks and pts.dmask is not None
    from multicol_slam_tpu.ops.pallas_match import masked_best_match_pallas_cams, use_pallas

    if use_pallas():
        # fused kernel, ONE launch for all cameras (grid = cameras x tiles):
        # rows = features, cols = points; per-point radius/candidacy folds
        # into rad_t (<0 disables)
        rad_t = jnp.where(cand, rad, -1.0)                          # [C, L]
        rad_q = jnp.where(feats.valid, BIGD, -1.0)                  # [C, K]
        best_d, _, idx, _ = masked_best_match_pallas_cams(
            feats.desc, feats.uv, feats.octave,
            pts.desc, uv_p, rad_t, pred_level.astype(jnp.float32),
            rad_q=rad_q,
            mask_q=feats.dmask if masked else None,
            mask_t=pts.dmask if masked else None,
            level_tol=float(level_tol),
        )
        best_pt = jnp.maximum(idx, 0)                               # [C, K]
        ok = (idx >= 0) & (best_d <= th_desc)
    else:
        # dense Hamming: [C, L, K] via MXU matmuls per camera
        from multicol_slam_tpu.ops.matching import hamming_matrix, hamming_matrix_masked

        if masked:
            ham = hamming_matrix_masked(
                pts.desc, pts.dmask,
                feats.desc.reshape(C * K, B), feats.dmask.reshape(C * K, B),
            ).reshape(L, C, K).transpose(1, 0, 2)                   # [C, L, K]
        else:
            a = unpack_pm1(pts.desc)                                # [L, 8B]
            b = unpack_pm1(feats.desc.reshape(C * K, B)).reshape(C, K, 8 * B)
            dots = jnp.einsum("lj,ckj->clk", a, b, preferred_element_type=jnp.float32)
            ham = 0.5 * (8 * B - dots)                              # [C, L, K]
        # window + level-band mask
        du = jnp.abs(uv_p[:, :, None, 0] - feats.uv[:, None, :, 0])
        dv = jnp.abs(uv_p[:, :, None, 1] - feats.uv[:, None, :, 1])
        window = (du <= rad[..., None]) & (dv <= rad[..., None])
        lvl_ok = jnp.abs(feats.octave[:, None, :] - pred_level[:, :, None]) <= level_tol
        mask = window & lvl_ok & cand[:, :, None] & feats.valid[:, None, :]
        d = jnp.where(mask, ham, BIGD)
        best_pt = jnp.argmin(d, axis=1)                             # [C, K]
        best_d = jnp.min(d, axis=1)                                 # [C, K]
        ok = best_d <= th_desc
    # identical one-to-one resolution on BOTH paths (claim-restricted min)
    keep2 = _resolve_claims(best_pt, best_d, ok, L)
    flat_pt = best_pt.reshape(C * K)
    flat_d = best_d.reshape(C * K)
    keep = keep2.reshape(C * K)
    assign = jnp.where(keep, flat_pt, -1)
    return assign, flat_d, keep


@functools.partial(jax.jit, static_argnames=("radius", "th_desc", "level_tol", "scale_factor", "n_levels", "use_masks"))
def track_stage(
    mc6: jnp.ndarray,
    intr: jnp.ndarray,
    cams,                      # OmniCamera pytree (for mirror mask)
    feats,                     # FrameFeatures
    pose0: jnp.ndarray,        # [6] initial pose
    pts: LocalPoints,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    radius: float = 15.0,
    th_desc: float = 96.0,
    level_tol: int = 1,
    use_masks: bool = False,
) -> TrackStageOut:
    """One matching + pose-optimization stage.

    Capability map: SearchByProjection (cORBmatcher.cpp:67-166 local-map
    variant / :1991 prev-frame variant — selected by which `pts` block the
    host passes) + PoseOptimization (cOptimizer.cpp:264-487).
    """
    C, K, B = feats.desc.shape
    assign, flat_d, keep = project_and_match(
        mc6, intr, cams, feats, pose0, pts, scale_factor, n_levels, radius, th_desc,
        level_tol, use_masks,
    )
    n_matches = jnp.sum(keep)
    # ---- pose optimization on the matched observations -------------------
    obs = Observations(
        kf=jnp.zeros(C * K, jnp.int32),
        pt=jnp.maximum(assign, 0),
        cam=jnp.repeat(jnp.arange(C, dtype=jnp.int32), K),
        uv=feats.uv.reshape(C * K, 2),
        inv_sigma2=(1.0 / scale_factor ** (2.0 * feats.octave.astype(jnp.float32))).reshape(C * K),
        valid=keep,
    )
    params = BAParams(pose0[None], pts.X, mc6, intr)
    poses_out, inl, n_inl = pose_optimization(params, obs)
    packed = jnp.concatenate([
        poses_out[0],
        jnp.stack([n_matches, n_inl]).astype(jnp.float32),
        assign.astype(jnp.float32),
        inl.astype(jnp.float32),
    ])
    return TrackStageOut(poses_out[0], assign, inl, n_matches, n_inl, packed)


@functools.partial(jax.jit, static_argnames=(
    "radius1", "radius2", "th_desc", "level_tol", "scale_factor", "n_levels",
    "min_pose_inliers", "use_masks"))
def track_frame_fused(
    mc6: jnp.ndarray,
    intr: jnp.ndarray,
    cams,
    feats,
    pose_pred: jnp.ndarray,
    pts1: LocalPoints,         # motion-model stage candidates (last frame's points)
    pts2: LocalPoints,         # local-map stage candidates
    scale_factor: float = 1.2,
    n_levels: int = 8,
    radius1: float = 15.0,
    radius2: float = 4.0,
    th_desc: float = 96.0,
    level_tol: int = 1,
    min_pose_inliers: int = 6,
    use_masks: bool = False,
) -> jnp.ndarray:
    """BOTH tracking stages in ONE device program: motion-model stage, then
    the local-map stage starting from stage 1's pose when it found enough
    inliers (else from the prediction). On a tunneled accelerator every
    program dispatch + every readback is a ~25 ms RPC round trip, so the
    per-frame hot path is round-trip-bound: one fused program + one packed
    fetch ~halves frame latency vs two chained stages. This IS the
    'one fused tracking program per frame' target of SURVEY.md §7.

    Returns packed f32 [7 + (8 + 2*C*K)]: stage-1 pose(6) + n_inliers(1),
    then stage 2's TrackStageOut.packed. The wide-window fallback
    (TrackPreviousFrame) stays a host-driven rare path."""
    o1 = track_stage(mc6, intr, cams, feats, pose_pred, pts1,
                     scale_factor, n_levels, radius1, th_desc, level_tol, use_masks)
    ok1 = o1.n_inliers >= min_pose_inliers
    pose1 = jnp.where(ok1, o1.pose, pose_pred)
    o2 = track_stage(mc6, intr, cams, feats, pose1, pts2,
                     scale_factor, n_levels, radius2, th_desc, level_tol, use_masks)
    return jnp.concatenate([
        o1.pose, o1.n_inliers[None].astype(jnp.float32), o2.packed,
    ])


def unpack_fused(packed_np: np.ndarray):
    """Host side of track_frame_fused: (pose1, n1, pose2, n_match2, n_inl2,
    assign2, inlier2)."""
    pose1 = packed_np[:6]
    n1 = int(packed_np[6])
    p = packed_np[7:]
    ck = (len(p) - 8) // 2
    return (
        pose1, n1, p[:6], int(p[6]), int(p[7]),
        p[8:8 + ck].astype(np.int32), p[8 + ck:8 + 2 * ck] > 0.5,
    )


@functools.partial(jax.jit, static_argnames=("radius", "th_desc", "ratio", "check_rotation", "use_masks"))
def match_window_frames(
    feats_q,
    feats_t,
    radius: float = 100.0,
    th_desc: float = 64.0,
    ratio: float = 0.9,
    check_rotation: bool = False,
    use_masks: bool = False,
):
    """Same-camera window matching between two frames (WindowSearch /
    SearchForInitialization, cORBmatcher.cpp:326/:579): dense per-camera
    Hamming + spatial window + Lowe ratio + mutual consistency; optional
    rotation-histogram filtering (the reference's rotHist, :640-680) and
    mdBRIEF masked distance (use_masks; pass x0.5-scaled th_desc).

    Returns (match_idx [C, K] target index or -1, dist [C, K]).
    """
    C, K, B = feats_q.desc.shape
    BIGD = jnp.float32(1e9)
    from multicol_slam_tpu.ops.pallas_match import masked_best_match_pallas_cams, use_pallas

    if use_pallas():
        zeros = jnp.zeros((C, K), jnp.float32)
        rad_t = jnp.where(feats_t.valid, float(radius), -1.0)
        rad_q = jnp.where(feats_q.valid, BIGD, -1.0)
        best, second, idx, _ = masked_best_match_pallas_cams(
            feats_q.desc, feats_q.uv, zeros,
            feats_t.desc, feats_t.uv, rad_t, zeros,
            rad_q=rad_q,
            mask_q=feats_q.dmask if use_masks else None,
            mask_t=feats_t.dmask if use_masks else None,
            level_tol=1e9,
        )
        # mutual check via the swapped call (targets as queries)
        _, _, i_tq, _ = masked_best_match_pallas_cams(
            feats_t.desc, feats_t.uv, zeros,
            feats_q.desc, feats_q.uv, rad_q, zeros,
            rad_q=rad_t,
            mask_q=feats_t.dmask if use_masks else None,
            mask_t=feats_q.dmask if use_masks else None,
            level_tol=1e9,
        )
        ok = (idx >= 0) & (best <= th_desc) & (best < ratio * second)
        mutual = jnp.take_along_axis(i_tq, jnp.maximum(idx, 0), axis=1) == jnp.arange(K)[None, :]
        ok = ok & mutual
    else:
        if use_masks:
            from multicol_slam_tpu.ops.matching import hamming_matrix_masked

            ham = jax.vmap(hamming_matrix_masked)(
                feats_q.desc, feats_q.dmask, feats_t.desc, feats_t.dmask
            )                                                        # [C, Kq, Kt]
        else:
            a = unpack_pm1(feats_q.desc.reshape(C * K, B)).reshape(C, K, 8 * B)
            b = unpack_pm1(feats_t.desc.reshape(C * K, B)).reshape(C, K, 8 * B)
            dots = jnp.einsum("cqj,ckj->cqk", a, b, preferred_element_type=jnp.float32)
            ham = 0.5 * (8 * B - dots)                               # [C, Kq, Kt]
        du = jnp.abs(feats_q.uv[:, :, None, 0] - feats_t.uv[:, None, :, 0])
        dv = jnp.abs(feats_q.uv[:, :, None, 1] - feats_t.uv[:, None, :, 1])
        mask = (du <= radius) & (dv <= radius)
        mask = mask & feats_q.valid[:, :, None] & feats_t.valid[:, None, :]
        d = jnp.where(mask, ham, BIGD)
        idx = jnp.argmin(d, axis=2)
        best = jnp.min(d, axis=2)
        d2 = jnp.where(
            jax.nn.one_hot(idx, K, dtype=bool), BIGD, d
        )
        second = jnp.min(d2, axis=2)
        ok = (best <= th_desc) & (best < ratio * second)
        # mutual check
        idx_tq = jnp.argmin(d, axis=1)                               # [C, Kt]
        qids = jnp.arange(K)[None, :]
        mutual = jnp.take_along_axis(idx_tq, idx, axis=1) == qids
        ok = ok & mutual
    if check_rotation:
        from multicol_slam_tpu.ops.matching import rotation_consistency

        ang_t = jnp.take_along_axis(feats_t.angle, jnp.maximum(idx, 0), axis=1)
        dangle = (feats_q.angle - ang_t).reshape(C * K)
        ok = rotation_consistency(dangle, ok.reshape(C * K)).reshape(C, K)
    return jnp.where(ok, idx, -1), best
