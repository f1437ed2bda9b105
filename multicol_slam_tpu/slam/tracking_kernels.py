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


class TrackStageOut(NamedTuple):
    pose: jnp.ndarray          # [6] optimized body pose
    assign: jnp.ndarray        # [C*K] local point index or -1
    inlier: jnp.ndarray        # [C*K] bool (survived pose-opt chi2)
    n_matches: jnp.ndarray     # scalar
    n_inliers: jnp.ndarray     # scalar


def project_rig(mc6, intr, pose6, X):
    """Project world points into every camera. X [L,3] -> uv [C,L,2], z [C,L]."""
    from multicol_slam_tpu.optim.problem import intr_project

    Mt = cayley_to_hom(pose6)
    MtMc_inv = hom_inverse(jnp.einsum("ij,cjk->cik", Mt, cayley_to_hom(mc6)))
    Xc = transform_points(MtMc_inv[:, None], X[None, :, :])
    uv = intr_project(intr[:, None, :], Xc)
    return uv, Xc[..., 2]


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
):
    """Projection-guided matching of candidate points against frame features
    (the SearchByProjection family, cORBmatcher.cpp:67-166). Returns
    (assign [C*K] local point idx or -1, dist [C*K], keep [C*K] bool)."""
    C, K, B = feats.desc.shape
    L = pts.X.shape[0]
    uv_p, z = project_rig(mc6, intr, pose0, pts.X)                 # [C, L, 2], [C, L]
    cam_ids = jnp.arange(C)[:, None]
    in_img = in_mirror_mask(cams, cam_ids, uv_p)                # [C, L]
    # scale-invariance distance band + predicted pyramid level
    Mt = cayley_to_hom(pose0)
    centers = jnp.einsum("ij,cjk->cik", Mt, cayley_to_hom(mc6))[:, :3, 3]  # [C,3]
    dist = jnp.linalg.norm(pts.X[None] - centers[:, None], axis=-1)        # [C,L]
    band = (dist >= pts.min_dist[None] * 0.8) & (dist <= pts.max_dist[None] * 1.2)
    ratio = jnp.maximum(dist / jnp.maximum(pts.min_dist[None], 1e-6), 1.0)
    pred_level = jnp.clip(
        jnp.round(jnp.log(ratio) / np.log(scale_factor)).astype(jnp.int32), 0, n_levels - 1
    )                                                               # [C,L]
    cand = pts.valid[None] & (z > 0) & in_img & band                # [C, L]
    rad = radius * scale_factor ** pred_level.astype(jnp.float32)   # [C, L]
    BIGD = jnp.float32(1e9)
    from multicol_slam_tpu.ops.pallas_match import masked_best_match_pallas_cams, use_pallas

    if use_pallas():
        # fused kernel, ONE launch for all cameras (grid = cameras x tiles):
        # rows = features, cols = points; per-point radius/candidacy folds
        # into rad_t (<0 disables). col_best = per-(cam, point) best distance
        # over all features — the duplicate-claim resolution, free inside the
        # kernel (a scatter-min here costs ~1.2 ms/stage on TPU).
        rad_t = jnp.where(cand, rad, -1.0)                          # [C, L]
        rad_q = jnp.where(feats.valid, BIGD, -1.0)                  # [C, K]
        best_d, _, idx, col_best = masked_best_match_pallas_cams(
            feats.desc, feats.uv, feats.octave,
            pts.desc, uv_p, rad_t, pred_level.astype(jnp.float32),
            rad_q=rad_q, level_tol=float(level_tol),
        )
        best_pt = jnp.maximum(idx, 0)                               # [C, K]
        ok = (idx >= 0) & (best_d <= th_desc)
        flat_pt = best_pt.reshape(C * K)
        flat_d = best_d.reshape(C * K)
        flat_ok = ok.reshape(C * K)
        cam_of = jnp.repeat(jnp.arange(C), K)
        keep = flat_ok & (flat_d <= col_best[cam_of, flat_pt])
        assign = jnp.where(keep, flat_pt, -1)
        return assign, flat_d, keep
    else:
        # dense Hamming: [C, L, K] via one MXU matmul per camera
        a = unpack_pm1(pts.desc)                                    # [L, 8B]
        b = unpack_pm1(feats.desc.reshape(C * K, B)).reshape(C, K, 8 * B)
        dots = jnp.einsum("lj,ckj->clk", a, b, preferred_element_type=jnp.float32)
        ham = 0.5 * (8 * B - dots)                                  # [C, L, K]
        # window + level-band mask
        du = jnp.abs(uv_p[:, :, None, 0] - feats.uv[:, None, :, 0])
        dv = jnp.abs(uv_p[:, :, None, 1] - feats.uv[:, None, :, 1])
        window = (du <= rad[..., None]) & (dv <= rad[..., None])
        lvl_ok = jnp.abs(feats.octave[:, None, :] - pred_level[:, :, None]) <= level_tol
        mask = window & lvl_ok & cand[:, :, None] & feats.valid[:, None, :]
        d = jnp.where(mask, ham, BIGD)
        # per-feature best point; then one-to-one by keeping per-point best feature
        best_pt = jnp.argmin(d, axis=1)                             # [C, K]
        best_d = jnp.min(d, axis=1)                                 # [C, K]
        ok = best_d <= th_desc
    flat_pt = best_pt.reshape(C * K)
    flat_d = best_d.reshape(C * K)
    flat_ok = ok.reshape(C * K)
    # resolve duplicate claims on the same point: keep min-distance feature
    # NOTE: a point may legitimately match one feature in EACH camera (the
    # multi-camera specialty) — resolve per (cam, point), not globally.
    per_cam_min = jnp.full((C, L), BIGD).at[
        jnp.repeat(jnp.arange(C), K), best_pt.reshape(-1)
    ].min(jnp.where(flat_ok, flat_d, BIGD))
    keep = flat_ok & (flat_d <= per_cam_min[jnp.repeat(jnp.arange(C), K), flat_pt])
    assign = jnp.where(keep, flat_pt, -1)
    return assign, flat_d, keep


@functools.partial(jax.jit, static_argnames=("radius", "th_desc", "level_tol", "scale_factor", "n_levels"))
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
) -> TrackStageOut:
    """One matching + pose-optimization stage.

    Capability map: SearchByProjection (cORBmatcher.cpp:67-166 local-map
    variant / :1991 prev-frame variant — selected by which `pts` block the
    host passes) + PoseOptimization (cOptimizer.cpp:264-487).
    """
    C, K, B = feats.desc.shape
    assign, flat_d, keep = project_and_match(
        mc6, intr, cams, feats, pose0, pts, scale_factor, n_levels, radius, th_desc, level_tol
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
    return TrackStageOut(poses_out[0], assign, inl, n_matches, n_inl)


@functools.partial(jax.jit, static_argnames=("radius", "th_desc", "ratio"))
def match_window_frames(
    feats_q,
    feats_t,
    radius: float = 100.0,
    th_desc: float = 64.0,
    ratio: float = 0.9,
):
    """Same-camera window matching between two frames (WindowSearch /
    SearchForInitialization, cORBmatcher.cpp:326/:579): dense per-camera
    Hamming + spatial window + Lowe ratio + mutual consistency.

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
            rad_q=rad_q, level_tol=1e9,
        )
        # mutual check via the swapped call (targets as queries)
        _, _, i_tq, _ = masked_best_match_pallas_cams(
            feats_t.desc, feats_t.uv, zeros,
            feats_q.desc, feats_q.uv, rad_q, zeros,
            rad_q=rad_t, level_tol=1e9,
        )
        ok = (idx >= 0) & (best <= th_desc) & (best < ratio * second)
        mutual = jnp.take_along_axis(i_tq, jnp.maximum(idx, 0), axis=1) == jnp.arange(K)[None, :]
        ok = ok & mutual
        return jnp.where(ok, idx, -1), best

    a = unpack_pm1(feats_q.desc.reshape(C * K, B)).reshape(C, K, 8 * B)
    b = unpack_pm1(feats_t.desc.reshape(C * K, B)).reshape(C, K, 8 * B)
    dots = jnp.einsum("cqj,ckj->cqk", a, b, preferred_element_type=jnp.float32)
    ham = 0.5 * (8 * B - dots)                                      # [C, Kq, Kt]
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
    idx_tq = jnp.argmin(d, axis=1)                                   # [C, Kt]
    qids = jnp.arange(K)[None, :]
    mutual = jnp.take_along_axis(idx_tq, idx, axis=1) == qids
    ok = ok & mutual
    return jnp.where(ok, idx, -1), best
