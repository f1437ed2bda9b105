"""Vectorized RANSAC minimal solvers (TPU-native replacement for OpenGV).

The reference uses OpenGV for exactly three things (SURVEY.md §2.2):
  1. Stewenius 5-pt central relative pose RANSAC at init
     (cMultiInitializer.cpp:131-146)
  2. GP3P non-central absolute pose RANSAC for relocalization
     (cTracking.cpp:1257-1292)
  3. gpnp non-central PnP refinement on the RANSAC inliers (:1292)

TPU-first reformulation: instead of sequential hypothesise-and-verify with
adaptive termination, we draw a fixed batch of S hypotheses, solve every
minimal problem as *batched linear algebra* (one [S, ...] SVD/solve), and
score all S models against all N correspondences in one dense pass. Solver
substitutions (deliberate, same capability, better TPU shape):
  - 8-pt essential (batched SVD + manifold projection) replaces Stewenius
    5-pt polynomial solving,
  - non-central DLT on rays (linear in [R|t], 6+ pts, Procrustes projection
    to SO(3)) replaces GP3P/gpnp,
  - Horn 1987 closed-form Sim3 (quaternion from 4x4 eigh) matches
    cSim3Solver.cpp:286-371.
All randomness is jax.random (explicit keys): runs are reproducible.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.utils.geometry import (
    essential_from_relative,
    ray_epipolar_distance,
    skew,
    triangulate_midpoint,
)


def sample_indices(key, n_hyp: int, sample_size: int, n_data: int, weights=None):
    """[S, m] random correspondence indices (with replacement across rows;
    duplicates within a row are statistically rare for n_data >> m and only
    waste that hypothesis — fixed-shape > rejection sampling)."""
    if weights is None:
        return jax.random.randint(key, (n_hyp, sample_size), 0, jnp.maximum(n_data, 1))
    keys = jax.random.split(key, n_hyp)
    return jax.vmap(
        lambda k: jax.random.choice(k, n_data, (sample_size,), replace=False, p=weights)
    )(keys)


# ---------------------------------------------------------------------------
# Essential matrix (central relative pose) — init bootstrap
# ---------------------------------------------------------------------------

def _eight_point(r1: jnp.ndarray, r2: jnp.ndarray, w=None) -> jnp.ndarray:
    """Batched 8-pt algorithm on unit rays. r1, r2 [S, m>=8, 3] -> E [S, 3, 3]
    with r2^T E r1 = 0, projected to the essential manifold. Optional row
    weights w [S, m] (inlier refit)."""
    # each correspondence: kron(r1, r2) . vec(E) = 0 (row-major E)
    A = jnp.einsum("smi,smj->smij", r1, r2).reshape(r1.shape[0], r1.shape[1], 9)
    if w is not None:
        A = A * w[..., None]
    # E = right-singular vector of A with smallest singular value
    _, _, Vh = jnp.linalg.svd(A, full_matrices=True)
    E = Vh[:, -1, :].reshape(-1, 3, 3).transpose(0, 2, 1)  # vec was (i=r1, j=r2): E[j,i]
    # project to essential manifold: singular values (1, 1, 0)
    U, s, Vt = jnp.linalg.svd(E)
    # keep proper rotations in the factors
    D = jnp.stack([jnp.ones_like(s[:, 0]), jnp.ones_like(s[:, 0]), jnp.zeros_like(s[:, 0])], -1)
    return jnp.einsum("sij,sj,sjk->sik", U, D, Vt)


def decompose_essential(E: jnp.ndarray):
    """E [S,3,3] -> 4 candidate (R, t): (R1,t), (R1,-t), (R2,t), (R2,-t),
    with X2 = R X1 + t convention. Returns R [S,4,3,3], t [S,4,3]."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce det(U), det(V) = +1
    detU = jnp.linalg.det(U)[:, None, None]
    detV = jnp.linalg.det(Vt)[:, None, None]
    U = U * jnp.concatenate([jnp.ones_like(detU), jnp.ones_like(detU), detU], axis=-1)
    Vt = Vt * jnp.concatenate([jnp.ones_like(detV), jnp.ones_like(detV), detV], axis=-2)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = jnp.einsum("sij,jk,skl->sil", U, W, Vt)
    Rb = jnp.einsum("sij,kj,skl->sil", U, W, Vt)  # W^T
    t = U[:, :, 2]
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=1)
    t4 = jnp.stack([t, -t, t, -t], axis=1)
    return R4, t4


class RelPoseResult(NamedTuple):
    R: jnp.ndarray        # [3, 3]  X2 = R X1 + t
    t: jnp.ndarray        # [3]     unit norm
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray
    score: jnp.ndarray


def _triangulation_error(R, t, rays1, rays2):
    """OpenGV-style model scoring: triangulate each correspondence under
    (R, t) [X2 = R X1 + t, unit t], reproject, and return the angular errors
    err = (1-cos) to both observed rays plus the ray depths. Batched over
    model stacks: R [..., 3, 3], t [..., 3]; rays [N, 3].
    Returns (err [..., N], lam1, lam2)."""
    batch = R.shape[:-2]
    o1 = jnp.zeros(batch + (1, 3))
    d1 = jnp.broadcast_to(rays1, batch + rays1.shape)
    o2 = jnp.broadcast_to(
        (-jnp.einsum("...ji,...j->...i", R, t))[..., None, :], batch + (1, 3)
    )
    d2 = jnp.einsum("...ji,nj->...ni", R, rays2)  # rays2 rotated into frame1
    X, lam1, lam2 = triangulate_midpoint(o1, d1, o2, d2)
    # reprojection: direction from each camera center to X vs observed ray
    p1 = X
    p1n = p1 / (jnp.linalg.norm(p1, axis=-1, keepdims=True) + 1e-18)
    p2 = X - o2
    p2n = p2 / (jnp.linalg.norm(p2, axis=-1, keepdims=True) + 1e-18)
    e1 = 1.0 - jnp.sum(p1n * d1, axis=-1)
    e2 = 1.0 - jnp.sum(p2n * d2, axis=-1)
    return e1 + e2, lam1, lam2


def ransac_essential(
    key,
    rays1: jnp.ndarray,
    rays2: jnp.ndarray,
    valid: jnp.ndarray,
    n_hyp: int = 256,
    err_th: float = 1e-4,
) -> RelPoseResult:
    """Two-view relative pose from ray correspondences (the init bootstrap,
    replacing OpenGV CentralRelativePoseSacProblem/STEWENIUS; our 8-pt solves
    feed the SAME scoring as OpenGV: triangulate + angular reprojection
    error (1-cos), threshold 1e-4 (cMultiInitializer.cpp:143) — far more
    discriminative than the algebraic epipolar residual at small baselines.
    rays* [N, 3] unit; valid [N] bool.

    All S hypotheses are solved as one batched SVD; all 4 (R, t) chirality
    candidates of all hypotheses are scored densely against all N rows.
    """
    N = rays1.shape[0]
    idx = sample_indices(key, n_hyp, 8, N)
    E = _eight_point(rays1[idx], rays2[idx])              # [S, 3, 3]
    R4, t4 = decompose_essential(E)                        # [S,4,3,3], [S,4,3]
    Rf = R4.reshape(-1, 3, 3)
    tf = t4.reshape(-1, 3)
    err, lam1, lam2 = _triangulation_error(Rf, tf, rays1, rays2)  # [4S, N]
    inl = (err < err_th) & (lam1 > 0) & (lam2 > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    # refit on ALL inliers of the winner (minimal 8-pt fits are noisy at
    # small baseline; the consensus-set least squares is far tighter), then
    # rescore the refit model's 4 chirality candidates.
    w = inl[best].astype(rays1.dtype)
    E_ref = _eight_point(rays1[None], rays2[None], w[None])
    R4r, t4r = decompose_essential(E_ref)
    Rr = R4r[0]
    tr = t4r[0]
    err_r, lam1_r, lam2_r = _triangulation_error(Rr, tr, rays1, rays2)  # [4, N]
    inl_r = (err_r < err_th) & (lam1_r > 0) & (lam2_r > 0) & valid[None, :]
    counts_r = jnp.sum(inl_r, axis=1)
    kbest = jnp.argmax(counts_r)
    use_refit = counts_r[kbest] >= counts[best]
    R_out = jnp.where(use_refit, Rr[kbest], Rf[best])
    t_out = jnp.where(use_refit, tr[kbest], tf[best])
    inl_out = jnp.where(use_refit, inl_r[kbest], inl[best])
    n_out = jnp.where(use_refit, counts_r[kbest], counts[best])
    return RelPoseResult(R_out, t_out, inl_out, n_out, n_out.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Non-central absolute pose (relocalization) — DLT on rays + Procrustes
# ---------------------------------------------------------------------------

def _noncentral_dlt(X: jnp.ndarray, rays: jnp.ndarray, Rc: jnp.ndarray, tc: jnp.ndarray,
                    w: Optional[jnp.ndarray] = None):
    """Linear non-central absolute pose from m >= 6 point<->ray matches.

    Solves for body pose inverse [R|t] (world -> body) from constraints
    cross(r_cm, Rc^T (R X + t - tc)) = 0, linear in (R, t). Shapes:
    X [S, m, 3] world points; rays [S, m, 3] unit rays in their camera frame;
    Rc [S, m, 3, 3], tc [S, m, 3] per-match camera-to-body extrinsics.
    Returns R [S, 3, 3], t [S, 3] (world -> body).
    """
    S, m, _ = X.shape
    # rotate rays into the body frame; constraint becomes
    # cross(r_b, (R X + t - tc)) = 0  with r_b = Rc r_cam
    rb = jnp.einsum("smij,smj->smi", Rc, rays)
    C = skew(rb)                                            # [S, m, 3, 3]
    # unknown z = [vec_rows(R); t] in R^12:  C @ (R X + t) = C @ tc
    # row block for match k: [C * kron(X^T)] for R part, C for t part
    A_R = jnp.einsum("smab,smc->smabc", C, X).reshape(S, m, 3, 9)
    A = jnp.concatenate([A_R, C], axis=-1).reshape(S, 3 * m, 12)
    b = jnp.einsum("smab,smb->sma", C, tc).reshape(S, 3 * m)
    if w is not None:
        ww = jnp.repeat(jnp.sqrt(jnp.maximum(w, 0.0)), 3, axis=-1)  # [S, 3m]
        A = A * ww[..., None]
        b = b * ww
    # least squares via normal equations (12x12 — tiny, batched)
    AtA = jnp.einsum("ska,skb->sab", A, A) + 1e-9 * jnp.eye(12)
    Atb = jnp.einsum("ska,sk->sa", A, b)
    z = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    R_raw = z[:, :9].reshape(S, 3, 3)
    t_raw = z[:, 9:]
    # project to SO(3) (Procrustes); rescale t by the removed scale
    U, s, Vt = jnp.linalg.svd(R_raw)
    detUV = jnp.linalg.det(jnp.einsum("sij,sjk->sik", U, Vt))
    D = jnp.stack([jnp.ones_like(detUV), jnp.ones_like(detUV), detUV], -1)
    R = jnp.einsum("sij,sj,sjk->sik", U, D, Vt)
    scale = jnp.sum(s * D, axis=-1) / 3.0
    t = t_raw / jnp.maximum(scale, 1e-9)[:, None]
    return R, t


class AbsPoseResult(NamedTuple):
    Mt: jnp.ndarray       # [4, 4] body -> world
    inliers: jnp.ndarray  # [N]
    n_inliers: jnp.ndarray


def ransac_noncentral_pose(
    key,
    X: jnp.ndarray,
    rays: jnp.ndarray,
    Rc: jnp.ndarray,
    tc: jnp.ndarray,
    valid: jnp.ndarray,
    n_hyp: int = 160,
    sample_size: int = 6,
    ray_th: float = 1e-2,
) -> AbsPoseResult:
    """Relocalization pose RANSAC (replaces OpenGV GP3P+gpnp; ~150 iters,
    threshold cTracking.cpp:1274-1275 — their 1-cos threshold 1e-4 on ray
    agreement ~ angular error 1.4e-2 rad; we use the sine-distance below).

    X [N,3] world points; rays [N,3] unit rays in their observing camera's
    frame; Rc/tc [N,3,3]/[N,3] that camera's extrinsics; valid [N].
    """
    N = X.shape[0]
    # sample only valid rows (padded problems feed valid=False tails)
    w = valid.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1.0)
    idx = sample_indices(key, n_hyp, sample_size, N, weights=w)
    R, t = _noncentral_dlt(X[idx], rays[idx], Rc[idx], tc[idx])   # world->body
    # residual: angular distance between predicted body-frame direction and
    # observed ray for EVERY correspondence under every hypothesis
    rb = jnp.einsum("nij,nj->ni", Rc, rays)                        # [N, 3] body-frame rays
    Xb = jnp.einsum("sij,nj->sni", R, X) + t[:, None, :]           # [S, N, 3]
    pred = Xb - tc[None, :, :]                                     # from cam center (body frame)
    pred = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-12)
    sine = jnp.linalg.norm(jnp.cross(pred, rb[None]), axis=-1)
    dotp = jnp.sum(pred * rb[None], axis=-1)
    inl = (sine < ray_th) & (dotp > 0) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    # Mt = inv([R|t]): body->world
    Rb_best, tb_best = R[best], t[best]
    Rw = Rb_best.T
    tw = -Rw @ tb_best
    Mt = jnp.eye(4).at[:3, :3].set(Rw).at[:3, 3].set(tw)
    return AbsPoseResult(Mt, inl[best], counts[best])


def refine_noncentral_pose(
    X: jnp.ndarray, rays: jnp.ndarray, Rc: jnp.ndarray, tc: jnp.ndarray, w: jnp.ndarray
):
    """gpnp-style refinement: weighted non-central DLT over all inliers
    (weights w [N] in [0,1]). Returns Mt [4,4] body->world."""
    R, t = _noncentral_dlt(X[None], rays[None], Rc[None], tc[None], w[None])
    Rw = R[0].T
    tw = -Rw @ t[0]
    return jnp.eye(4).at[:3, :3].set(Rw).at[:3, 3].set(tw)


# ---------------------------------------------------------------------------
# Horn 1987 closed-form Sim3 (loop closing)
# ---------------------------------------------------------------------------

def horn_sim3(P: jnp.ndarray, Q: jnp.ndarray, with_scale: bool = True):
    """Closed-form similarity Q ~ s R P + t (Horn quaternion method), batched
    over leading dims: P, Q [..., m, 3]. The reference's cSim3Solver
    computeT (cSim3Solver.cpp:286-371). Returns (R [...,3,3], t [...,3], s [...]).
    """
    cP = jnp.mean(P, axis=-2, keepdims=True)
    cQ = jnp.mean(Q, axis=-2, keepdims=True)
    Pc = P - cP
    Qc = Q - cQ
    M = jnp.einsum("...mi,...mj->...ij", Pc, Qc)  # S_ab = sum_m P_a Q_b (Horn's order)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    # Horn's symmetric 4x4 N matrix; max-eigenvector = optimal quaternion
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]  # [w, x, y, z] of Q->P... (rotation bringing P onto Q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    from multicol_slam_tpu.utils.geometry import quat_to_rot

    R = quat_to_rot(jnp.stack([x, y, z, w], -1))
    if with_scale:
        # symmetric scale (Horn §2E): s = sqrt(sum|Qc|^2 / sum|Pc|^2)
        s = jnp.sqrt(
            jnp.sum(Qc * Qc, axis=(-2, -1)) / (jnp.sum(Pc * Pc, axis=(-2, -1)) + 1e-12)
        )
    else:
        s = jnp.ones(P.shape[:-2], P.dtype)
    t = cQ[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, cP[..., 0, :])
    return R, t, s


class Sim3Result(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def ransac_sim3(
    key,
    P: jnp.ndarray,
    Q: jnp.ndarray,
    valid: jnp.ndarray,
    err_fn,
    n_hyp: int = 300,
    with_scale: bool = True,
) -> Sim3Result:
    """Sim3 RANSAC on 3-point sets (cSim3Solver: p=0.98, <=300 iters,
    3-pt minimal). err_fn(R, t, s) -> inlier bool mask [S?, N] given batched
    models — injected so the caller can reproject through each observation's
    camera like cSim3Solver.cpp:374-416 does."""
    N = P.shape[0]
    idx = sample_indices(key, n_hyp, 3, N)
    R, t, s = horn_sim3(P[idx], Q[idx], with_scale)
    inl = err_fn(R, t, s) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    return Sim3Result(R[best], t[best], s[best], inl[best], counts[best])
