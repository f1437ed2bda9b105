"""Two-view map bootstrap (cMultiInitializer + CreateInitialMap).

Capability map (SURVEY.md §3.3, cMultiInitializer.cpp:52-307,
cTracking.cpp:380-726):
  1. per-camera window matching between the reference and current frame
     (SearchForInitialization, window 100, ratio 0.9, >=100 matches)
  2. per-camera batched essential RANSAC on the matched rays (our 8-pt
     replaces OpenGV Stewenius 5-pt — ops/ransac.py)
  3. pick the 'leading' camera by inlier count (skip near-degenerate
     baselines, the reference's norm > 0.06 gate)
  4. triangulate inliers (midpoint) + cheirality + reprojection gates
     (CheckRT, 4px)
  5. body poses from the leading camera's relative pose:
     Mt1 = I, Mt2 = M_c[l] * inv([R|t]) * M_c[l]^-1
  6. scale normalization to median depth 1 (monocular gauge freedom)

Deviation from the reference, documented: the reference runs 3 rounds of
global BA + cross-camera re-observation inside CreateInitialMap
(cTracking.cpp:513-701); here the same steps run as system-level calls after
`bootstrap` returns (slam/system.py) so the kernels stay reusable.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import in_mirror_mask
from multicol_slam_tpu.models.rig import MultiCamRig
from multicol_slam_tpu.ops.ransac import ransac_essential
from multicol_slam_tpu.slam.tracking_kernels import match_window_frames
from multicol_slam_tpu.utils.geometry import (
    cayley_to_hom,
    hom_inverse,
    hom_to_cayley,
    transform_points,
    triangulate_midpoint,
)

MIN_MATCHES = 100            # cTracking.cpp:417
MIN_BASELINE_NORM = 0.06     # cMultiInitializer.cpp:183 translation gate
REPROJ_TH = 4.0              # CheckRT reprojection gate (:200-307)
MIN_MEDIAN_DISPARITY = 0.015
DEBUG_INIT = False  # gate-rejection tracing (set True to see why init waits)  # rad; rotation-compensated parallax floor


class InitResult(NamedTuple):
    ok: bool
    leading_cam: int
    Mt2: np.ndarray             # [4,4] second body pose (first is identity)
    points_cam: np.ndarray      # [M, 3] triangulated points in leading cam1 frame
    feat1: np.ndarray           # [M] flat feature index in frame 1
    feat2: np.ndarray           # [M] flat feature index in frame 2
    n_matches: int


def bootstrap(
    rig: MultiCamRig,
    feats1,
    feats2,
    key=None,
    window: float = 100.0,
    n_hyp: int = 256,
    err_th: float = 1e-4,
    use_masks: bool = False,
):
    """Attempt two-view initialization between frames 1 (reference) and 2.

    Returns (InitResult | None, n_matches). The caller keeps the SAME
    reference frame while n_matches stays high (baseline accumulates across
    frames — replacing the reference on every failed *geometry* attempt
    would keep the baseline at one frame step forever); the reference is
    only re-snapshotted when the match count collapses (cTracking.cpp:398).
    """
    def _why(reason):
        if DEBUG_INIT:
            print(f"[bootstrap] reject: {reason}")
    key = key if key is not None else jax.random.PRNGKey(0)
    C, K = np.asarray(feats1.valid).shape
    # rotation-histogram filter on (SearchForInitialization checkOrientation,
    # cORBmatcher.cpp:579-680); masked TH_LOW when mdBRIEF masks are active
    th = (1.0 if use_masks else 2.0) * np.asarray(feats1.desc).shape[-1]
    match_idx, _ = match_window_frames(
        feats1, feats2, radius=window, th_desc=float(th), ratio=0.9,
        check_rotation=True, use_masks=use_masks,
    )
    match_idx = np.asarray(match_idx)      # [C, K] index into frame2 (same cam)
    n_total = int((match_idx >= 0).sum())
    if n_total < MIN_MATCHES:
        _why(f"matches {n_total} < {MIN_MATCHES}")
        return None, n_total
    best = None
    for c in range(C):
        sel = np.nonzero(match_idx[c] >= 0)[0]
        if len(sel) < 30:
            continue
        r1 = jnp.asarray(np.asarray(feats1.rays)[c][sel])
        r2 = jnp.asarray(np.asarray(feats2.rays)[c][match_idx[c][sel]])
        res = ransac_essential(
            jax.random.fold_in(key, c), r1, r2, jnp.ones(len(sel), bool), n_hyp=n_hyp, err_th=err_th
        )
        n_inl = int(res.n_inliers)
        if best is None or n_inl > best[1]:
            best = (c, n_inl, res, sel)
    if best is None:
        _why("no camera with >=30 matches")
        return None, n_total
    c, n_inl, res, sel = best
    if n_inl < 0.5 * len(sel) or n_inl < 30:
        _why(f"essential inliers {n_inl}/{len(sel)}")
        return None, n_total
    R = np.asarray(res.R, np.float64)
    t = np.asarray(res.t, np.float64)
    inl = np.asarray(res.inliers)
    # degeneracy test: fit the best PURE ROTATION (Kabsch) to the matched
    # rays; if it explains them to within the parallax floor, the pair has
    # no usable baseline and any essential decomposition is noise (the
    # analog of ORB-SLAM's H-vs-F model selection; triangulated-depth gates
    # alone are fooled — pixel noise biases degenerate depths low).
    r1_all = np.asarray(feats1.rays)[c][sel]
    r2_all = np.asarray(feats2.rays)[c][match_idx[c][sel]]
    M = r1_all.T @ r2_all
    U, _, Vt = np.linalg.svd(M)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R0 = U @ S @ Vt                      # best r1 ~ R0 r2
    cosd = np.clip(np.sum(r1_all * (r2_all @ R0.T), axis=-1), -1.0, 1.0)
    # top-QUARTILE residual, not the median: parallax scales with 1/depth,
    # so in a deep scene (walls at 10+ m) the median is dominated by far
    # points and the gate stalls initialization for many frames after the
    # NEAR field already carries solid baseline. Under true pure rotation
    # every residual is matching noise, so the 75th percentile stays below
    # the floor just as safely.
    med_rot_resid = float(np.percentile(np.arccos(cosd), 75))
    if med_rot_resid < MIN_MEDIAN_DISPARITY:
        _why(f"p75 disparity {med_rot_resid:.4f} < {MIN_MEDIAN_DISPARITY}")
        return None, n_total
    # triangulate inliers in cam1 frame (o1=0; cam2 center = -R^T t)
    r1 = np.asarray(feats1.rays)[c][sel]
    r2 = np.asarray(feats2.rays)[c][match_idx[c][sel]]
    o2 = -(R.T @ t)
    d2 = r2 @ R  # R^T r2 per row
    X, lam1, lam2 = triangulate_midpoint(
        jnp.zeros_like(jnp.asarray(r1)), jnp.asarray(r1, jnp.float32),
        jnp.asarray(np.broadcast_to(o2, r1.shape), jnp.float32), jnp.asarray(d2, jnp.float32),
    )
    X = np.asarray(X, np.float64)
    lam1, lam2 = np.asarray(lam1), np.asarray(lam2)
    good = inl & (lam1 > 0) & (lam2 > 0)
    # parallax gate: reject near-degenerate baselines where triangulation is
    # unstable (the reference's norm > 0.06 translation gate)
    med_depth = np.median(np.linalg.norm(X[good], axis=-1)) if good.any() else 0.0
    if med_depth <= 0 or np.linalg.norm(t) / med_depth < 0.02:
        _why(f"baseline/depth {np.linalg.norm(t)/max(med_depth,1e-9):.4f} < 0.02")
        return None, n_total
    # reprojection gate in both views (angular proxy: ray alignment in px at
    # the omni focal ~ |a0|; CheckRT uses pixel reprojection <= 4px)
    from multicol_slam_tpu.models.camera import cam_world_to_img

    uv1p = np.asarray(cam_world_to_img(rig.cams, c, jnp.asarray(X, jnp.float32)))
    X2 = X @ R.T + t
    uv2p = np.asarray(cam_world_to_img(rig.cams, c, jnp.asarray(X2, jnp.float32)))
    uv1 = np.asarray(feats1.uv)[c][sel]
    uv2 = np.asarray(feats2.uv)[c][match_idx[c][sel]]
    good &= np.linalg.norm(uv1p - uv1, axis=-1) < REPROJ_TH
    good &= np.linalg.norm(uv2p - uv2, axis=-1) < REPROJ_TH
    if good.sum() < 30:
        _why(f"CheckRT survivors {int(good.sum())} < 30")
        return None, n_total
    # monocular gauge: median depth -> 1
    depths = np.linalg.norm(X[good], axis=-1)
    med = np.median(depths)
    if med <= 0:
        return None, n_total
    scale = 1.0 / med
    Xs = X[good] * scale
    t_s = t * scale
    # body pose of frame 2: Mt2 = Mc[l] @ inv([R|t_s]) @ Mc[l]^-1
    Mc = np.asarray(rig.Mc[c], np.float64)
    T21 = np.eye(4)
    T21[:3, :3] = R
    T21[:3, 3] = t_s
    Mt2 = Mc @ np.linalg.inv(T21) @ np.linalg.inv(Mc)
    fpc = np.asarray(feats1.uv).shape[1]
    feat1_flat = c * fpc + sel[good]
    feat2_flat = c * fpc + match_idx[c][sel][good]
    return InitResult(
        ok=True,
        leading_cam=c,
        Mt2=Mt2,
        points_cam=Xs,
        feat1=feat1_flat,
        feat2=feat2_flat,
        n_matches=int(good.sum()),
    ), n_total


def points_to_world(rig: MultiCamRig, leading_cam: int, points_cam: np.ndarray) -> np.ndarray:
    """Leading-cam1 frame -> world (body1 = identity): X_w = Mc[l] X_c."""
    Mc = np.asarray(rig.Mc[leading_cam], np.float64)
    return points_cam @ Mc[:3, :3].T + Mc[:3, 3]


def _mt2_of_scale(rig: MultiCamRig, leading_cam: int, R: np.ndarray, t: np.ndarray, s: float):
    """Body pose 2 for leading-cam relative pose (R, s*t):
    Mt2 = Mc[l] @ inv([R | s t]) @ Mc[l]^-1."""
    Mc = np.asarray(rig.Mc[leading_cam], np.float64)
    T21 = np.eye(4)
    T21[:3, :3] = R
    T21[:3, 3] = s * t
    return Mc @ np.linalg.inv(T21) @ np.linalg.inv(Mc)


@functools.partial(jax.jit, static_argnames=("radius", "th_desc"))
def _scale_scores(
    scales,            # [S]
    Xc,                # [M, 3] points in leading-cam1 frame (unit init scale)
    pdesc_pm1,         # [M, 8B] +-1-unpacked point descriptors
    Tcw_R,             # [F, C, 3, 3] world->cam rotations (scale-invariant)
    tcw_metric,        # [F, C, 3]   metric part of the world->cam translation
    tcw_scaled,        # [F, C, 3]   part proportional to s
    Mc_l_R, Mc_l_t,    # leading-cam extrinsics (cam->world at s-scaled origin)
    intr,              # [C, I]
    cams,              # OmniCamera pytree
    feat_uv,           # [F, C, K, 2]
    feat_pm1,          # [F, C, K, 8B]
    feat_valid,        # [F, C, K]
    skip_cam: jnp.ndarray,   # [] leading cam index (excluded: scale-invariant)
    radius: float = 5.0,
    th_desc: float = 64.0,
):
    """Inlier count per scale hypothesis. The descriptor-distance matrix is
    scale-invariant, so it is computed once; per scale only the projections
    sweep. One dense [S, F, C, M, K] window test — MXU/VPU shaped."""
    from multicol_slam_tpu.optim.problem import intr_project

    B8 = pdesc_pm1.shape[-1]
    # desc gate once: [F, C, M, K]
    dots = jnp.einsum("mj,fckj->fcmk", pdesc_pm1, feat_pm1, preferred_element_type=jnp.float32)
    ham_ok = 0.5 * (B8 - dots) <= th_desc
    ham_ok = ham_ok & feat_valid[:, :, None, :]

    def score_one(s):
        # world point at scale s: X_w = Mc_l (s Xc)
        Xw = (s * Xc) @ Mc_l_R.T + Mc_l_t                    # [M, 3]
        # cam-frame: R (X_w) + t_metric + s * t_scaled
        Xcam = (
            jnp.einsum("fcij,mj->fcmi", Tcw_R, Xw)
            + tcw_metric[:, :, None, :]
            + s * tcw_scaled[:, :, None, :]
        )                                                     # [F, C, M, 3]
        uv_p = intr_project(intr[None, :, None, :], Xcam)     # [F, C, M, 2]
        vis = Xcam[..., 2] > 0
        vis = vis & in_mirror_mask(cams, jnp.arange(intr.shape[0])[None, :, None], uv_p)
        du = jnp.abs(uv_p[..., None, 0] - feat_uv[:, :, None, :, 0])
        dv = jnp.abs(uv_p[..., None, 1] - feat_uv[:, :, None, :, 1])
        hit = (du <= radius) & (dv <= radius) & ham_ok & vis[..., None]
        hit_any = jnp.any(hit, axis=-1)                       # [F, C, M]
        not_leading = (jnp.arange(intr.shape[0]) != skip_cam)[None, :, None]
        return jnp.sum(hit_any & not_leading)

    return jax.vmap(score_one)(scales)


def calibrate_metric_scale(
    rig: MultiCamRig,
    feats1,
    feats2,
    res: InitResult,
    R: Optional[np.ndarray] = None,
    t: Optional[np.ndarray] = None,
    radius: float = 5.0,
    th_desc: float = 64.0,
    min_inliers: int = 12,
) -> Tuple[float, int]:
    """Recover the METRIC scale of the two-view bootstrap from the rig
    baseline (the multi-camera speciality). The essential-matrix init fixes
    scale arbitrarily; same-camera observations are scale-invariant, but the
    fixed metric extrinsics M_c make cross-camera re-observations sweep with
    scale. The reference recovers metric scale implicitly by projecting init
    points into the *other* cameras and re-running GBA
    (cTracking.cpp:520-699 + :607,:701); on TPU we instead score ALL scale
    hypotheses densely (two-stage coarse->fine scan, each one batched
    program) and return the consensus-maximizing scale — robust even when
    the initial scale is off by >10x, where BA alone stalls in the Huber
    zone.

    Returns (scale, inliers_at_best). scale multiplies res.points_cam and
    the leading-cam translation; 1.0 when cross-camera support is too weak.
    """
    l = res.leading_cam
    C = rig.n_cams
    if C < 2 or len(res.points_cam) < 8:
        return 1.0, 0
    if R is None or t is None:
        # recover (R, t) of the leading-cam relative pose from Mt2
        Mc = np.asarray(rig.Mc[l], np.float64)
        T21 = np.linalg.inv(np.linalg.inv(Mc) @ np.asarray(res.Mt2) @ Mc)
        R, t = T21[:3, :3], T21[:3, 3]
    from multicol_slam_tpu.ops.matching import unpack_pm1

    fpc = np.asarray(feats1.uv).shape[1]
    pdesc = np.asarray(feats1.desc).reshape(-1, np.asarray(feats1.desc).shape[-1])[res.feat1]
    pdesc_pm1 = unpack_pm1(jnp.asarray(pdesc))
    Mc_all = np.asarray(rig.Mc, np.float64)                  # [C, 4, 4]
    Mc_l = Mc_all[l]
    # world->cam for frame 1 (body = I): inv(Mc_c) — fully metric.
    # For frame 2: inv(Mt2(s) @ Mc_c) where Mt2(s) = Mc_l [R|s t]^-1 Mc_l^-1.
    #   inv(Mt2(s) Mc_c) = inv(Mc_c) Mc_l [R | s t] inv(Mc_l)
    # whose translation is affine in s — split into metric + s-scaled parts.
    Tcw_R = np.zeros((2, C, 3, 3))
    tcw_m = np.zeros((2, C, 3))
    tcw_s = np.zeros((2, C, 3))
    for c in range(C):
        T1 = np.linalg.inv(Mc_all[c])
        Tcw_R[0, c] = T1[:3, :3]
        tcw_m[0, c] = T1[:3, 3]
        # frame 2: A = inv(Mc_c) @ Mc_l; full = A @ [R | s t] @ inv(Mc_l)
        A = np.linalg.inv(Mc_all[c]) @ Mc_l
        Ainv_l = np.linalg.inv(Mc_l)
        AR = A[:3, :3] @ R
        Tcw_R[1, c] = AR @ Ainv_l[:3, :3]
        tcw_m[1, c] = AR @ Ainv_l[:3, 3] + A[:3, 3]
        tcw_s[1, c] = A[:3, :3] @ t
    feat_uv = np.stack([np.asarray(feats1.uv), np.asarray(feats2.uv)])
    B = np.asarray(feats1.desc).shape[-1]
    f_pm1 = np.stack(
        [
            np.asarray(unpack_pm1(jnp.asarray(np.asarray(f.desc).reshape(-1, B)))).reshape(
                C, fpc, 8 * B
            )
            for f in (feats1, feats2)
        ]
    )
    feat_valid = np.stack([np.asarray(feats1.valid), np.asarray(feats2.valid)])
    intr = jnp.asarray(rig.cams.to_vector())
    args = dict(
        Xc=jnp.asarray(res.points_cam, jnp.float32),
        pdesc_pm1=pdesc_pm1,
        Tcw_R=jnp.asarray(Tcw_R, jnp.float32),
        tcw_metric=jnp.asarray(tcw_m, jnp.float32),
        tcw_scaled=jnp.asarray(tcw_s, jnp.float32),
        Mc_l_R=jnp.asarray(Mc_l[:3, :3], jnp.float32),
        Mc_l_t=jnp.asarray(Mc_l[:3, 3], jnp.float32),
        intr=intr,
        cams=rig.cams,
        feat_uv=jnp.asarray(feat_uv, jnp.float32),
        feat_pm1=jnp.asarray(f_pm1),
        feat_valid=jnp.asarray(feat_valid),
        skip_cam=jnp.asarray(l),
        radius=radius,
        th_desc=th_desc,
    )
    coarse = jnp.asarray(np.geomspace(0.05, 20.0, 96).astype(np.float32))
    sc = np.asarray(_scale_scores(coarse, **args))
    i0 = int(np.argmax(sc))
    s0 = float(coarse[i0])
    step = float(coarse[1] / coarse[0])
    fine = jnp.asarray(np.geomspace(s0 / step, s0 * step, 64).astype(np.float32))
    sf = np.asarray(_scale_scores(fine, **args))
    i1 = int(np.argmax(sf))
    best_n = int(sf[i1])
    if best_n < min_inliers:
        return 1.0, best_n
    return float(fine[i1]), best_n
