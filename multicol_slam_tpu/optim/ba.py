"""BA entry points mirroring cOptimizer's modes (SURVEY.md §2 row 17).

Every mode is the same (params, observations, free-mask) structure solved by
optim/lm.py; the mode only chooses masks and robust-kernel constants:

  pose_optimization        ~ cOptimizer::PoseOptimization (:264-487)
  local/global_bundle      ~ LocalBundleAdjustment / GlobalBundleAdjustment
  self-calibrating BA      ~ the unfixed-Mc/intrinsics capability of the g2o
                             vertices (cOptimizer.cpp:141-158 keeps them
                             fixed; BASELINE.json config 4 frees them)
  optimize_sim3            ~ cOptimizerLoopStuff::OptimizeSim3 (:63-271)
  optimize_essential_graph ~ OptimizeEssentialGraph (:273-520)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.optim.lm import LMConfig, lm_solve, pose_only_solve
from multicol_slam_tpu.optim.problem import (
    BAParams,
    FreeMask,
    Observations,
    residuals_only,
)
from multicol_slam_tpu.utils.geometry import (
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)

# chi2 gates (reference constants, SURVEY.md appendix)
CHI2_BA = 5.991                      # Huber sqrt(5.991) in BA
POSE_HUBER = 1.345 * 2.0             # cOptimizer.cpp:344 (huberMultiplier=2)
CHI2_POSE = POSE_HUBER * POSE_HUBER  # outlier demotion threshold (:436-445)
SIM3_HUBER = 1.345 * 4.0


@jax.jit
def pose_optimization(params: BAParams, obs: Observations):
    """Two-round pose-only optimization with chi2 outlier demotion between
    rounds (optimize(10) -> demote chi2 > th -> optimize(10), cOptimizer.cpp
    :436-474). Returns (poses [K,6], inlier_mask [O], n_inliers)."""
    p1, chi2 = pose_only_solve(params, obs, n_iters=10, huber_delta=POSE_HUBER)
    inl = obs.valid & (chi2 < CHI2_POSE)
    obs2 = obs._replace(valid=inl)
    p2, chi2b = pose_only_solve(p1, obs2, n_iters=10, huber_delta=POSE_HUBER)
    inl2 = obs.valid & (chi2b < CHI2_POSE)
    return p2.poses, inl2, jnp.sum(inl2)


def _carries_mask(m) -> bool:
    """True when a FreeMask calibration entry actually frees something a
    solve flag must back: a per-camera array, or a concrete truthy scalar.
    Traced scalars (the pytree-default False after jit tracing) are
    unverifiable and treated as off."""
    if m is False or m is None:
        return False
    if isinstance(m, jax.core.Tracer):
        return getattr(m, "ndim", 0) >= 1
    if getattr(m, "ndim", None) == 0 or isinstance(m, (bool, np.bool_)):
        return bool(m)
    return True


def bundle_adjust(
    params: BAParams,
    obs: Observations,
    free: FreeMask,
    max_iters: int = 15,
    cg_iters: int = 20,
    solve_mc: bool = False,
    solve_intr: bool = False,
) -> Tuple[BAParams, jnp.ndarray]:
    """Generic BA: global (all poses free but the first), local (anchors
    fixed), structure-only (poses fixed), or self-calibrating (mc/intr free)
    — entirely encoded by `free`. Huber sqrt(5.991).

    solve_mc/solve_intr must be True when free.mc/free.intr free those
    groups (self-calibrating modes): they statically gate the rig-calibration
    Jacobian blocks, the widest per-row data in the solver — the standard
    fixed-rig modes skip them entirely. A caller who frees mc/intr in the
    mask without the matching solve flag would silently get a no-op on that
    group (Jacobian block never computed -> zero gradient), so the mismatch
    fails loudly here instead: a per-camera mask in free.mc/free.intr
    requires its solve flag. (A traced scalar bool — the pytree default
    `False` after jit tracing — is unverifiable and assumed off.)"""
    if not solve_mc and _carries_mask(free.mc):
        raise ValueError(
            "free.mc carries a mask but solve_mc=False: the mc Jacobian "
            "block would never be computed and the extrinsics would silently "
            "stay fixed — pass solve_mc=True (or free.mc=False)")
    if not solve_intr and _carries_mask(free.intr):
        raise ValueError(
            "free.intr carries a mask but solve_intr=False: pass "
            "solve_intr=True (or free.intr=False)")
    cfg = LMConfig(max_iters=max_iters, cg_iters=cg_iters,
                   huber_delta=float(np.sqrt(CHI2_BA)),
                   solve_mc=solve_mc, solve_intr=solve_intr)
    return lm_solve(params, obs, free, cfg)


bundle_adjust_jit = jax.jit(
    bundle_adjust,
    static_argnames=("max_iters", "cg_iters", "solve_mc", "solve_intr"))


def bundle_adjust_interruptible(
    params: BAParams,
    obs: Observations,
    free: FreeMask,
    max_iters: int = 15,
    cg_iters: int = 20,
    interrupt=None,
    pre_step=None,
    chunk_iters: int = 1,
) -> Tuple[BAParams, jnp.ndarray]:
    """Local-BA variant driven `chunk_iters` LM iterations per device
    program: abortable between chunks (InterruptBA, cLocalMapping.cpp:515)
    and friendly to a tracker sharing the device (see
    lm.lm_solve_interruptible for the chunk-size tradeoff). Rig calibration
    stays fixed in local BA (solve_mc/solve_intr off)."""
    if _carries_mask(free.mc) or _carries_mask(free.intr):
        raise ValueError("interruptible local BA keeps the rig fixed; "
                         "free.mc/free.intr must be False")
    from multicol_slam_tpu.optim.lm import lm_solve_interruptible

    cfg = LMConfig(max_iters=max_iters, cg_iters=cg_iters,
                   huber_delta=float(np.sqrt(CHI2_BA)),
                   solve_mc=False, solve_intr=False)
    return lm_solve_interruptible(params, obs, free, cfg, interrupt, pre_step,
                                  chunk_iters=chunk_iters)


def prune_observations(params: BAParams, obs: Observations, chi2_th: float = CHI2_BA):
    """Post-BA outlier pruning (LocalBundleAdjustment's chi2 erase pass,
    cOptimizer.cpp:798-860). Returns updated valid mask."""
    r, z = residuals_only(params, obs)
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    return obs.valid & (chi2 <= chi2_th) & (z > 0)


# ---------------------------------------------------------------------------
# Sim3 pair optimization (loop closing geometric check)
# ---------------------------------------------------------------------------

class Sim3Obs(NamedTuple):
    """Matched map points between two MultiKeyFrames, each with the camera
    observing it (cOptimizerLoopStuff.cpp:63-271: forward edge projects the
    KF2 point through S12 into KF1's observing camera, inverse edge projects
    the KF1 point through S12^-1 into KF2's camera)."""

    X1: jnp.ndarray         # [N, 3] points in KF1 body frame
    X2: jnp.ndarray         # [N, 3] points in KF2 body frame
    uv1: jnp.ndarray        # [N, 2] measured pixels in KF1 (cam1)
    uv2: jnp.ndarray        # [N, 2] measured pixels in KF2 (cam2)
    cam1: jnp.ndarray       # [N] i32
    cam2: jnp.ndarray       # [N] i32
    inv_sigma2_1: jnp.ndarray
    inv_sigma2_2: jnp.ndarray
    valid: jnp.ndarray      # [N] bool


def _project_body(rig_mc, rig_intr, cam_idx, Xb):
    """Project body-frame points through camera cam_idx of the rig."""
    from multicol_slam_tpu.optim.problem import intr_project
    from multicol_slam_tpu.utils.geometry import cayley_to_hom, hom_inverse, transform_points

    Mc = cayley_to_hom(rig_mc[cam_idx])
    Xc = transform_points(hom_inverse(Mc), Xb)
    return intr_project(rig_intr[cam_idx], Xc), Xc[..., 2]


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_sim3(
    v7_init: jnp.ndarray,
    sobs: Sim3Obs,
    rig_mc: jnp.ndarray,
    rig_intr: jnp.ndarray,
    n_iters: int = 12,
    fix_scale: bool = False,
):
    """GN on the 7-dof Sim3 S12 (KF2 body -> KF1 body) minimizing symmetric
    reprojection error through each observation's camera. Returns
    (v7, inlier_mask, n_inliers). chi2 gate 9.210 like the reference's
    th2 (cOptimizerLoopStuff.cpp ~:200)."""

    def residuals(v7):
        R12, t12, s12 = sim3_exp(v7)
        R21, t21, s21 = sim3_inverse(R12, t12, s12)
        X2in1 = sim3_apply(R12, t12, s12, sobs.X2)
        X1in2 = sim3_apply(R21, t21, s21, sobs.X1)
        uv1p, z1 = _project_body(rig_mc, rig_intr, sobs.cam1, X2in1)
        uv2p, z2 = _project_body(rig_mc, rig_intr, sobs.cam2, X1in2)
        r1 = (sobs.uv1 - uv1p) * jnp.sqrt(sobs.inv_sigma2_1)[:, None]
        r2 = (sobs.uv2 - uv2p) * jnp.sqrt(sobs.inv_sigma2_2)[:, None]
        ok = sobs.valid & (z1 > 0) & (z2 > 0)
        return jnp.concatenate([r1, r2], axis=-1), ok  # [N, 4]

    def gn_step(i, v7):
        J = jax.jacfwd(lambda v: residuals(v)[0])(v7)  # [N, 4, 7]
        r, ok = residuals(v7)
        e = jnp.sqrt(jnp.sum(r * r, -1) + 1e-18)
        w = jnp.where(ok, jnp.minimum(1.0, SIM3_HUBER / e), 0.0)
        if fix_scale:
            J = J.at[..., 6].set(0.0)
        H = jnp.einsum("nij,n,nik->jk", J, w, J) + 1e-6 * jnp.eye(7)
        g = -jnp.einsum("nij,n,ni->j", J, w, r)
        return v7 + jnp.linalg.solve(H, g[:, None])[:, 0]

    v7 = jax.lax.fori_loop(0, n_iters, gn_step, v7_init)
    r, ok = residuals(v7)
    chi2 = jnp.sum(r[:, :2] ** 2, -1)
    chi2b = jnp.sum(r[:, 2:] ** 2, -1)
    inl = ok & (chi2 < 9.210) & (chi2b < 9.210)
    return v7, inl, jnp.sum(inl)


# ---------------------------------------------------------------------------
# Essential graph (Sim3 pose graph) optimization
# ---------------------------------------------------------------------------

class Sim3Edges(NamedTuple):
    i: jnp.ndarray       # [E] vertex index i
    j: jnp.ndarray       # [E] vertex index j
    meas: jnp.ndarray    # [E, 7] measured S_ji (v7) such that S_j ~= S_ji o S_i
    weight: jnp.ndarray  # [E] edge weight (1.0; loop edges can upweight)
    valid: jnp.ndarray   # [E] bool


@functools.partial(jax.jit, static_argnames=("n_iters", "dense_limit"))
def optimize_essential_graph(
    v7: jnp.ndarray,
    edges: Sim3Edges,
    fixed: jnp.ndarray,
    n_iters: int = 20,
    dense_limit: int = 300,
):
    """Sim3 pose-graph GN (OptimizeEssentialGraph, cOptimizerLoopStuff.cpp
    :273-520): vertices are S_iw (world -> KF body, 7-dof), edges constrain
    relative Sim3s; residual = log(S_ji_meas o S_i o S_j^-1).

    Two solver paths by graph size (K is a static shape, so the choice is a
    trace-time branch): K <= dense_limit assembles the full damped-GN system
    and dense-solves it (7K x 7K Cholesky is microseconds on the MXU at
    K ~ 1e2); larger graphs — the map now grows unboundedly — switch to a
    matrix-free block-Jacobi PCG over the edge table, the same
    never-materialize-H discipline as the BA engine (the reference's sparse
    pose graph has no size ceiling either, cOptimizerLoopStuff.cpp:273-520).

    v7 [K, 7] initial vertex estimates (sim3_log of S_iw);
    fixed [K] bool (the loop-closure KF is fixed, :339).
    Returns optimized v7 [K, 7].
    """
    K = v7.shape[0]

    def edge_residual(vi, vj, meas):
        Ri, ti, si = sim3_exp(vi)
        Rj, tj, sj = sim3_exp(vj)
        Rm, tm, sm = sim3_exp(meas)
        # S_err = S_ji_meas o S_i o S_j^-1
        Rji, tji, sji = sim3_compose(Rm, tm, sm, Ri, ti, si)
        Rjinv, tjinv, sjinv = sim3_inverse(Rj, tj, sj)
        Re, te, se = sim3_compose(Rji, tji, sji, Rjinv, tjinv, sjinv)
        return sim3_log(Re, te, se)

    def residual_all(v):
        return jax.vmap(lambda i, j, m: edge_residual(v[i], v[j], m))(
            edges.i, edges.j, edges.meas
        )  # [E, 7]

    def gn_step(it, v):
        r = residual_all(v)
        # Jacobians wrt the two endpoint vertices of each edge
        Ji = jax.vmap(
            lambda i, j, m: jax.jacfwd(lambda vi: edge_residual(vi, v[j], m))(v[i])
        )(edges.i, edges.j, edges.meas)  # [E, 7, 7]
        Jj = jax.vmap(
            lambda i, j, m: jax.jacfwd(lambda vj: edge_residual(v[i], vj, m))(v[j])
        )(edges.i, edges.j, edges.meas)
        w = jnp.where(edges.valid, edges.weight, 0.0)
        # assemble dense H [K*7, K*7], g [K*7]
        H = jnp.zeros((K, 7, K, 7))
        g = jnp.zeros((K, 7))
        H = H.at[edges.i, :, edges.i, :].add(jnp.einsum("eab,e,eac->ebc", Ji, w, Ji))
        H = H.at[edges.j, :, edges.j, :].add(jnp.einsum("eab,e,eac->ebc", Jj, w, Jj))
        H = H.at[edges.i, :, edges.j, :].add(jnp.einsum("eab,e,eac->ebc", Ji, w, Jj))
        H = H.at[edges.j, :, edges.i, :].add(jnp.einsum("eab,e,eac->ebc", Jj, w, Ji))
        g = g.at[edges.i].add(-jnp.einsum("eab,e,ea->eb", Ji, w, r))
        g = g.at[edges.j].add(-jnp.einsum("eab,e,ea->eb", Jj, w, r))
        free = (~fixed).astype(v.dtype)
        Hm = H.reshape(K * 7, K * 7)
        Hm = Hm + 1e-5 * jnp.eye(K * 7)
        # zero out fixed vertices' rows/cols, put identity on their diagonal
        fm = jnp.repeat(free, 7)
        Hm = Hm * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        gm = g.reshape(K * 7) * fm
        delta = jnp.linalg.solve(Hm, gm[:, None])[:, 0]
        return v + delta.reshape(K, 7)

    def gn_step_cg(it, v):
        """Matrix-free variant: H v products stream over the edge table."""
        r = residual_all(v)
        Ji = jax.vmap(
            lambda i, j, m: jax.jacfwd(lambda vi: edge_residual(vi, v[j], m))(v[i])
        )(edges.i, edges.j, edges.meas)
        Jj = jax.vmap(
            lambda i, j, m: jax.jacfwd(lambda vj: edge_residual(v[i], vj, m))(v[j])
        )(edges.i, edges.j, edges.meas)
        w = jnp.where(edges.valid, edges.weight, 0.0)
        free = (~fixed).astype(v.dtype)[:, None]
        g = jnp.zeros((K, 7))
        g = g.at[edges.i].add(-jnp.einsum("eab,e,ea->eb", Ji, w, r))
        g = g.at[edges.j].add(-jnp.einsum("eab,e,ea->eb", Jj, w, r))
        g = g * free
        # block-Jacobi preconditioner from the per-vertex diagonal blocks
        Hd = jnp.zeros((K, 7, 7))
        Hd = Hd.at[edges.i].add(jnp.einsum("eab,e,eac->ebc", Ji, w, Ji))
        Hd = Hd.at[edges.j].add(jnp.einsum("eab,e,eac->ebc", Jj, w, Jj))
        Minv = jnp.linalg.inv(Hd + 1e-5 * jnp.eye(7))

        def Hv(x):
            x = x * free
            s = (jnp.einsum("eab,eb->ea", Ji, x[edges.i])
                 + jnp.einsum("eab,eb->ea", Jj, x[edges.j]))  # J x per edge
            sw = w[:, None] * s
            y = jnp.zeros((K, 7))
            y = y.at[edges.i].add(jnp.einsum("eab,ea->eb", Ji, sw))
            y = y.at[edges.j].add(jnp.einsum("eab,ea->eb", Jj, sw))
            return (y + 1e-5 * x) * free

        def precond(x):
            return jnp.einsum("kab,kb->ka", Minv, x) * free

        x0 = jnp.zeros_like(g)
        r0 = g
        z0 = precond(r0)

        def cg_body(i, st):
            x, rr, z, p, rz = st
            Hp = Hv(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = precond(rr)
            rz_new = jnp.vdot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return x, rr, z, z + beta * p, rz_new

        x, *_ = jax.lax.fori_loop(
            0, 60, cg_body, (x0, r0, z0, z0, jnp.vdot(r0, z0)))
        return v + x

    step = gn_step if K <= dense_limit else gn_step_cg
    return jax.lax.fori_loop(0, n_iters, step, v7)
