"""Damped Gauss-Newton / Levenberg-Marquardt engine for MultiCol BA.

Replaces g2o (SparseOptimizer + BlockSolver + LinearSolverEigen + LM +
RobustKernelHuber + SparseOptimizerTerminateAction, SURVEY.md §2.2) with a
TPU-shaped solver:

- residuals/Jacobians: autodiff per observation row (optim/problem.py)
- robust kernel: Huber via IRLS reweighting
- normal equations: NEVER materialized. The Hessian-vector product
  H v = J^T W J v is two passes over the observation table — a gather of the
  4 parameter blocks per row, a [2x6]/[2x3]/[2x22] matvec, and segment-sum
  scatters back. Solved with preconditioned CG (block-Jacobi preconditioner
  = the U_k / V_p Schur blocks). This is the 'bundle adjustment in the
  large' CG formulation, which is also exactly the form that shards across
  a device mesh (segment-sums become psum over sharded observations —
  parallel/ba.py).
- damping: Levenberg lambda on the block diagonal; gain-ratio based update
  with early stop at gain < 1e-6 / max 15 iterations (the reference's
  SparseOptimizerTerminateAction semantics, cOptimizer.cpp:92-96).
- pose-only mode short-circuits CG: with points fixed the system is
  block-diagonal per pose -> one batched 6x6 solve per iteration
  (PoseOptimization, cOptimizer.cpp:264-487).

Everything is jit-compatible: fixed iteration caps with masked early-out.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.optim.problem import (
    BAParams,
    FreeMask,
    Observations,
    huber_weights,
    pose_residuals_and_jac,
    residuals_and_jacobians,
    residuals_only,
    robust_cost,
)


class LMConfig(NamedTuple):
    max_iters: int = 15
    cg_iters: int = 20
    huber_delta: float = 2.4477  # sqrt(5.991), BA chi2 gate (cOptimizer.cpp:161)
    init_lambda: float = 1e-4
    gain_eps: float = 1e-6       # terminate-action gain threshold
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    # compute Jacobian blocks for the rig calibration groups. The standard
    # BA modes keep mc/intr FIXED — skipping their (widest) per-row Jacobian
    # blocks removes most of the solver's bandwidth. Self-calibrating BA
    # sets them True.
    solve_mc: bool = True
    solve_intr: bool = True
    # Distributed layout (only meaningful under shard_map with axis_name):
    # False = observation rows shard, everything else replicates — every
    # segment reduction all-reduces (psum). True = points AND their
    # observation rows co-shard (each device owns a contiguous point block
    # and exactly the rows that reference it, with obs.pt in LOCAL indices):
    # point-block reductions stay device-local (zero collective traffic for
    # the dominant V/g_pt/h_pt terms — the >10M-point scaling axis,
    # parallel/distributed.py cost model), only the small pose/rig blocks
    # and scalars all-reduce.
    points_sharded: bool = False


def _mask_params(d: BAParams, free: FreeMask) -> BAParams:
    """Zero the update on fixed variable groups. free.mc / free.intr may be a
    scalar bool (all cameras) or a per-camera [C] mask — a per-camera mask
    pins the gauge in self-calibrating BA (fix one camera's extrinsic, free
    the rest; the reference's g2o vertices support the same per-vertex
    setFixed, cOptimizer.cpp:141-158)."""
    mc_m = jnp.asarray(free.mc, jnp.float32)
    intr_m = jnp.asarray(free.intr, jnp.float32)
    mc_m = mc_m[:, None] if mc_m.ndim == 1 else jnp.broadcast_to(mc_m, ())
    intr_m = intr_m[:, None] if intr_m.ndim == 1 else jnp.broadcast_to(intr_m, ())
    return BAParams(
        d.poses * free.poses[:, None].astype(d.poses.dtype),
        d.points * free.points[:, None].astype(d.points.dtype),
        d.mc * mc_m.astype(d.mc.dtype),
        d.intr * intr_m.astype(d.intr.dtype),
    )


def _dot(a: BAParams, b: BAParams, axis_name=None,
         points_sharded: bool = False) -> jnp.ndarray:
    """Inner product over the parameter tree. With points sharded, the point
    component is a partial sum (psum'd); the replicated components are
    identical on every device and must NOT be multiplied by the device
    count."""
    pt = jnp.vdot(a.points, b.points)
    if points_sharded and axis_name is not None:
        pt = jax.lax.psum(pt, axis_name)
    return (
        jnp.vdot(a.poses, b.poses)
        + pt
        + jnp.vdot(a.mc, b.mc)
        + jnp.vdot(a.intr, b.intr)
    )


def _axpy(alpha, x: BAParams, y: BAParams) -> BAParams:
    return jax.tree.map(lambda a, b: alpha * a + b, x, y)


def _psum_tree(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), tree)


# ---------------------------------------------------------------------------
# TPU-shaped segment reduction over the observation axis.
#
# Everything per-observation lives in OBSERVATION-MINOR layout [.., O]
# (residuals_and_jacobians): the huge O axis sits on the 128-lane minor
# dimension, so every elementwise pass and every reduction streams at full
# HBM tile density. The [O, 2, d] layout this replaced padded its d<=22-wide
# minor dim to 128 lanes — the profiled Hessian-vector product was ~20x
# bandwidth-inflated (45 ms for ~50 MFLOP of work). Segment reductions are
# scatter-adds along the minor axis into [D, n_seg] accumulators.
# ---------------------------------------------------------------------------

def _segsum(rows, ids, n_seg):
    """sum_o rows[:, o] -> out[ids[o]]: [D, O] -> [n_seg, D]."""
    return jnp.zeros((rows.shape[0], n_seg), rows.dtype).at[:, ids].add(rows).T


def _build_grad_and_blocks(params, obs, Jp, Jx, Jm, Ji, w, r, axis_name=None,
                           points_sharded: bool = False):
    """RHS g = -J^T W r (the Gauss-Newton descent direction for residual
    r = measured - predicted) and block-diagonal (preconditioner) terms.
    Jacobian blocks arrive in [2, d, O] layout. With `axis_name` set,
    observation rows are sharded across a mesh axis and every segment
    reduction is psum-reduced — THE distributed-BA hook (SURVEY.md §2.3:
    sharded Schur-block reduction over ICI)."""
    K = params.poses.shape[0]
    P = params.points.shape[0]
    C = params.mc.shape[0]
    Di = params.intr.shape[1]
    wr = -(w[None, :] * r.T)  # [2, O]
    g_pose = _segsum(jnp.einsum("ijo,io->jo", Jp, wr), obs.kf, K)
    g_pt = _segsum(jnp.einsum("ijo,io->jo", Jx, wr), obs.pt, P)
    # block diagonals: U_k = sum J^T w J per pose, V_p per point
    U = _segsum(jnp.einsum("iao,o,ibo->abo", Jp, w, Jp).reshape(36, -1),
                obs.kf, K).reshape(K, 6, 6)
    V = _segsum(jnp.einsum("iao,o,ibo->abo", Jx, w, Jx).reshape(9, -1),
                obs.pt, P).reshape(P, 3, 3)
    if Jm is not None:
        g_mc = _segsum(jnp.einsum("ijo,io->jo", Jm, wr), obs.cam, C)
        Um = _segsum(jnp.einsum("iao,o,ibo->abo", Jm, w, Jm).reshape(36, -1),
                     obs.cam, C).reshape(C, 6, 6)
    else:
        g_mc = jnp.zeros((C, 6))
        Um = jnp.zeros((C, 6, 6))
    if Ji is not None:
        g_intr = _segsum(jnp.einsum("ijo,io->jo", Ji, wr), obs.cam, C)
        Ui = _segsum(jnp.einsum("iao,o,ibo->abo", Ji, w, Ji).reshape(Di * Di, -1),
                     obs.cam, C).reshape(C, Di, Di)
    else:
        g_intr = jnp.zeros((C, Di))
        Ui = jnp.zeros((C, Di, Di))
    grad = BAParams(g_pose, g_pt, g_mc, g_intr)
    if points_sharded and axis_name is not None:
        # point blocks/gradients are complete locally (rows co-shard with
        # their points); only the replicated pose/rig groups all-reduce
        grad = BAParams(jax.lax.psum(g_pose, axis_name), g_pt,
                        jax.lax.psum(g_mc, axis_name),
                        jax.lax.psum(g_intr, axis_name))
        blocks = (jax.lax.psum(U, axis_name), V,
                  jax.lax.psum(Um, axis_name), jax.lax.psum(Ui, axis_name))
    else:
        grad = _psum_tree(grad, axis_name)
        blocks = _psum_tree((U, V, Um, Ui), axis_name)
    return grad, blocks


def _hvp(obs, Jp, Jx, Jm, Ji, w, lam, blocks, free: FreeMask, v: BAParams,
         axis_name=None, points_sharded: bool = False) -> BAParams:
    """(J^T W J + lam * blockdiag) v via minor-axis gathers -> [2,O]/[d,O]
    lane-aligned contractions -> minor-axis scatter reductions.
    Sharded-observation partial sums are psum'd when axis_name is set; the
    damping term uses already-reduced blocks so it is added post-psum."""
    v = _mask_params(v, free)
    jv = (
        jnp.einsum("ijo,jo->io", Jp, v.poses.T[:, obs.kf])
        + jnp.einsum("ijo,jo->io", Jx, v.points.T[:, obs.pt])
    )
    if Jm is not None:
        jv = jv + jnp.einsum("ijo,jo->io", Jm, v.mc.T[:, obs.cam])
    if Ji is not None:
        jv = jv + jnp.einsum("ijo,jo->io", Ji, v.intr.T[:, obs.cam])
    wjv = w[None, :] * jv  # [2, O]
    K, P = v.poses.shape[0], v.points.shape[0]
    C = v.mc.shape[0]
    h_pose = _segsum(jnp.einsum("ijo,io->jo", Jp, wjv), obs.kf, K)
    h_pt = _segsum(jnp.einsum("ijo,io->jo", Jx, wjv), obs.pt, P)
    h_mc = (_segsum(jnp.einsum("ijo,io->jo", Jm, wjv), obs.cam, C)
            if Jm is not None else jnp.zeros((C, 6)))
    h_intr = (_segsum(jnp.einsum("ijo,io->jo", Ji, wjv), obs.cam, C)
              if Ji is not None else jnp.zeros_like(v.intr))
    if points_sharded and axis_name is not None:
        h_pose = jax.lax.psum(h_pose, axis_name)
        h_mc = jax.lax.psum(h_mc, axis_name)
        h_intr = jax.lax.psum(h_intr, axis_name)
    else:
        h_pose, h_pt, h_mc, h_intr = _psum_tree((h_pose, h_pt, h_mc, h_intr), axis_name)
    U, V, Um, Ui = blocks
    # Levenberg damping on the block diagonal (adds lam * diag(U) * v)
    h_pose = h_pose + lam * jnp.einsum("kab,kb->ka", _diag_only(U), v.poses)
    h_pt = h_pt + lam * jnp.einsum("kab,kb->ka", _diag_only(V), v.points)
    h_mc = h_mc + lam * jnp.einsum("kab,kb->ka", _diag_only(Um), v.mc)
    h_intr = h_intr + lam * jnp.einsum("kab,kb->ka", _diag_only(Ui), v.intr)
    return _mask_params(BAParams(h_pose, h_pt, h_mc, h_intr), free)


def _diag_only(B):
    """Keep only the diagonal of each small block (Marquardt scaling)."""
    d = jnp.diagonal(B, axis1=-2, axis2=-1)
    d = jnp.maximum(d, 1e-8)
    return jax.vmap(jnp.diag)(d) if B.ndim == 3 else jnp.diag(d)


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate/determinant): the general
    jnp.linalg.inv LU path costs ~50 ms for the 50k point blocks per LM
    iteration; the adjugate is a handful of fused elementwise ops."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    rows = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return rows * inv_det[..., None, None]


def _block_inv(B, lam):
    """Damped block inverses for the preconditioner. B [N, d, d]."""
    d = B.shape[-1]
    eye = jnp.eye(d)
    Bd = B + (lam * jnp.maximum(jnp.diagonal(B, axis1=-2, axis2=-1), 1e-8))[..., None] * eye + 1e-6 * eye
    return _inv3x3(Bd) if d == 3 else jnp.linalg.inv(Bd)


def _precond_apply(Minv, free: FreeMask, g: BAParams) -> BAParams:
    Up, Vp, Ump, Uip = Minv
    out = BAParams(
        jnp.einsum("kab,kb->ka", Up, g.poses),
        jnp.einsum("kab,kb->ka", Vp, g.points),
        jnp.einsum("kab,kb->ka", Ump, g.mc),
        jnp.einsum("kab,kb->ka", Uip, g.intr),
    )
    return _mask_params(out, free)


def _pcg(obs, Jp, Jx, Jm, Ji, w, lam, blocks, Minv, free, g: BAParams, n_iters: int,
         axis_name=None, points_sharded: bool = False) -> BAParams:
    """Preconditioned CG for (H + lam D) delta = g. Fixed iteration count.
    Under shard_map, g/blocks/Minv are replicated (or point-sharded), the
    Hvp shards rows."""
    x0 = jax.tree.map(jnp.zeros_like, g)
    r0 = g  # since x0 = 0
    z0 = _precond_apply(Minv, free, r0)
    p0 = z0

    def dot(a, b):
        return _dot(a, b, axis_name, points_sharded)

    def body(i, state):
        x, r, z, p, rz = state
        Hp = _hvp(obs, Jp, Jx, Jm, Ji, w, lam, blocks, free, p, axis_name,
                  points_sharded)
        pHp = dot(p, Hp)
        alpha = rz / jnp.maximum(pHp, 1e-20)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Hp, r)
        z = _precond_apply(Minv, free, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = _axpy(beta, p, z)
        return x, r, z, p, rz_new

    x, *_ = jax.lax.fori_loop(0, n_iters, body, (x0, r0, z0, p0, dot(r0, z0)))
    return x


class LMState(NamedTuple):
    params: BAParams
    lam: jnp.ndarray
    cost: jnp.ndarray
    done: jnp.ndarray
    n_iters: jnp.ndarray


def _lm_cost(params: BAParams, obs: Observations, config: LMConfig, axis_name=None):
    r, z = residuals_only(params, obs)
    c = robust_cost(r, z, obs, config.huber_delta)
    return jax.lax.psum(c, axis_name) if axis_name is not None else c


def _lm_step_body(state: LMState, obs: Observations, free: FreeMask,
                  config: LMConfig, axis_name=None) -> LMState:
    """One full LM iteration: Jacobians -> PCG solve -> gain-ratio accept."""
    p = state.params
    r, z, Jp, Jx, Jm, Ji = residuals_and_jacobians(
        p, obs, with_mc=config.solve_mc, with_intr=config.solve_intr)
    w, _ = huber_weights(r, z, obs, config.huber_delta)
    grad, blocks = _build_grad_and_blocks(p, obs, Jp, Jx, Jm, Ji, w, r, axis_name,
                                          config.points_sharded)
    grad = _mask_params(grad, free)
    Minv = tuple(_block_inv(B, state.lam) for B in blocks)
    delta = _pcg(obs, Jp, Jx, Jm, Ji, w, state.lam, blocks, Minv, free, grad,
                 config.cg_iters, axis_name, config.points_sharded)
    delta = jax.tree.map(lambda x: jnp.where(jnp.isfinite(x), x, 0.0), delta)
    new_params = jax.tree.map(lambda a, b: a + b, p, _mask_params(delta, free))
    new_cost = _lm_cost(new_params, obs, config, axis_name)
    actual = state.cost - new_cost
    accept = (new_cost < state.cost)
    gain = actual / jnp.maximum(jnp.abs(state.cost), 1e-12)
    params_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_params, p)
    cost_next = jnp.where(accept, new_cost, state.cost)
    lam_next = jnp.where(accept, state.lam * config.lambda_down, state.lam * config.lambda_up)
    lam_next = jnp.clip(lam_next, 1e-9, 1e6)
    done = accept & (gain < config.gain_eps)
    return LMState(params_next, lam_next, cost_next, done, state.n_iters + 1)


def lm_solve(
    params: BAParams,
    obs: Observations,
    free: FreeMask,
    config: LMConfig = LMConfig(),
    axis_name=None,
) -> Tuple[BAParams, jnp.ndarray]:
    """Full LM loop (jit-compatible). Returns (params, final robust cost).
    Pass axis_name inside shard_map for multi-device BA (parallel/ba.py)."""
    init = LMState(
        params,
        jnp.asarray(config.init_lambda),
        _lm_cost(params, obs, config, axis_name),
        jnp.asarray(False),
        jnp.asarray(0),
    )

    def cond(s: LMState):
        return (~s.done) & (s.n_iters < config.max_iters)

    out = jax.lax.while_loop(
        cond, lambda s: _lm_step_body(s, obs, free, config, axis_name), init)
    return out.params, out.cost


@functools.partial(jax.jit, static_argnames=("config",))
def _lm_init_jit(params, obs, config: LMConfig):
    return LMState(
        params,
        jnp.asarray(config.init_lambda),
        _lm_cost(params, obs, config),
        jnp.asarray(False),
        jnp.asarray(0),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _lm_step_jit(state: LMState, obs, free, config: LMConfig) -> LMState:
    return _lm_step_body(state, obs, free, config)


@functools.partial(jax.jit, static_argnames=("config", "chunk"))
def _lm_chunk_jit(state: LMState, obs, free, config: LMConfig, chunk: int) -> LMState:
    """Up to `chunk` more LM iterations in ONE device program (stops early on
    the gain criterion)."""
    limit = jnp.minimum(state.n_iters + chunk, config.max_iters)

    def cond(s: LMState):
        return (~s.done) & (s.n_iters < limit)

    out = jax.lax.while_loop(
        cond, lambda s: _lm_step_body(s, obs, free, config, None), state)
    # packed control scalars: the host reads ONE array per chunk (each
    # distinct-array readback is a full RPC round trip on a tunneled device)
    flags = jnp.stack([out.done.astype(jnp.float32), out.n_iters.astype(jnp.float32)])
    return out, flags


def lm_solve_interruptible(
    params: BAParams,
    obs: Observations,
    free: FreeMask,
    config: LMConfig = LMConfig(),
    interrupt=None,
    pre_step=None,
    chunk_iters: int = 1,
) -> Tuple[BAParams, jnp.ndarray]:
    """Host-driven LM: the solve is split into device programs of
    `chunk_iters` LM iterations each (the whole solve when chunk_iters >=
    max_iters), with `interrupt()` checked between programs.

    Why host-driven instead of lm_solve's single while_loop program: (a) it
    is the reference's InterruptBA (cLocalMapping.cpp:515) — the best-so-far
    result is returned when a newer keyframe preempts the solve; (b) with
    mapping on a worker sharing ONE device with tracking, the chunk size
    bounds how long a mapping program can head-of-line-block a tracking
    kernel. Pick chunk_iters by device locality: on a remote/tunneled device
    every `done` readback costs a full RPC round trip, so larger chunks win
    (the per-chunk compute is ms-scale); on a locally-attached chip
    chunk_iters=1 gives the finest preemption. `pre_step()` runs before each
    dispatch (the tracker-priority yield gate)."""
    state = _lm_init_jit(params, obs, config)
    it = 0
    while it < config.max_iters:
        if pre_step is not None:
            pre_step()
        state, flags = _lm_chunk_jit(state, obs, free, config, max(chunk_iters, 1))
        flags.copy_to_host_async()
        done, it = np.asarray(flags)
        if done > 0.5:
            break
        if interrupt is not None and interrupt():
            break
    return state.params, state.cost


# ---------------------------------------------------------------------------
# Pose-only fast path (PoseOptimization): block-diagonal direct solve.
# ---------------------------------------------------------------------------

def pose_only_solve(
    params: BAParams,
    obs: Observations,
    n_iters: int = 10,
    huber_delta: float = 2.69,  # 1.345 * 2 (cOptimizer.cpp:344)
    lam: float = 1e-3,
) -> Tuple[BAParams, jnp.ndarray]:
    """Optimize ONLY body poses with everything else fixed. The system is
    block-diagonal: each pose's 6x6 normal equations solve independently
    (batched). Matches PoseOptimization's role in tracking; chi2/outlier
    handling is done by the caller between rounds (cOptimizer.cpp:264-487).

    Returns (params with updated poses, chi2 [O] of final residuals).
    """
    K = params.poses.shape[0]

    def cost_of(p):
        r, z = residuals_only(p, obs)
        return robust_cost(r, z, obs, huber_delta)

    def gn_iter(carry):
        p, lam_i, cost, it, _ = carry
        r, z, Jp = pose_residuals_and_jac(p, obs)
        w, _ = huber_weights(r, z, obs, huber_delta)
        if K == 1:
            # tracking case: every row hits pose 0 — a plain MXU reduction.
            # (.at[kf].add with all-duplicate indices is a serialized scatter
            # on TPU: measured ~0.4 ms/GN-iteration against ~0.04 for the sum)
            g = jnp.einsum("oij,oi->j", Jp, -(w[:, None] * r))[None]
            H = jnp.einsum("oia,o,oib->ab", Jp, w, Jp)[None]
        else:
            g = jnp.zeros((K, 6)).at[obs.kf].add(jnp.einsum("oij,oi->oj", Jp, -(w[:, None] * r)))
            H = jnp.zeros((K, 6, 6)).at[obs.kf].add(jnp.einsum("oia,o,oib->oab", Jp, w, Jp))
        Hd = H + (lam_i * jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-8))[..., None] * jnp.eye(6) + 1e-8 * jnp.eye(6)
        delta = jnp.linalg.solve(Hd, g[..., None])[..., 0]
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        cand = BAParams(p.poses + delta, p.points, p.mc, p.intr)
        new_cost = cost_of(cand)
        # damped-GN step acceptance: reject uphill/non-finite steps and raise
        # damping (keeps the loop from diverging on ill-conditioned frames —
        # the failure mode plain GN has here)
        accept = jnp.isfinite(new_cost) & (new_cost <= cost)
        p_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, p)
        lam_next = jnp.clip(jnp.where(accept, lam_i * 0.5, lam_i * 10.0), 1e-6, 1e4)
        # converged: an accepted step that barely moved the pose (early exit —
        # the reference's g2o terminate action plays the same role)
        done = accept & (jnp.max(jnp.abs(delta)) < 1e-6)
        return p_next, lam_next, jnp.where(accept, new_cost, cost), it + 1, done

    def gn_cond(carry):
        _, _, _, it, done = carry
        return (it < n_iters) & (~done)

    p_out, _, _, _, _ = jax.lax.while_loop(
        gn_cond, gn_iter,
        (params, jnp.asarray(lam), cost_of(params), jnp.asarray(0), jnp.asarray(False)),
    )
    r, z = residuals_only(p_out, obs)
    chi2 = jnp.where(obs.valid & (z > 0), jnp.sum(r * r, -1) * obs.inv_sigma2, jnp.inf)
    return p_out, chi2
