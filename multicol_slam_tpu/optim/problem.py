"""Bundle-adjustment problem representation: flat observation tables.

The reference builds g2o hyper-graphs edge-by-edge (cOptimizer.cpp). Here a
BA problem is a fixed-shape pytree of arrays — the TPU-native equivalent of
the hyper-graph (SURVEY.md §7 "observation table" design):

  parameters  : poses [K,6] (M_t cayley, body->world), mc [C,6] (M_c cayley),
                intr [C,D] (omni params, OmniCamera.to_vector layout),
                points [P,3]
  observations: one row per (keyframe, point, camera) measurement —
                the reference's map<MKF*, vector<idx>> multimap flattened
                into index columns (cMapPoint.h:78 semantics).

Free/fixed variable groups (g2o's setFixed) are boolean masks; every BA mode
of cOptimizer is this same structure with different masks.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import MAX_INVPOL, MAX_POL, world_to_img
from multicol_slam_tpu.utils.geometry import cayley_to_hom, hom_inverse, transform_points

# intr vector layout (OmniCamera.to_vector): [c,d,e,u0,v0, pol(5), invpol(12)]
INTR_DIM = 22
_N_POL = 5
_N_INVPOL = 12


class Observations(NamedTuple):
    kf: jnp.ndarray          # [O] i32 keyframe index
    pt: jnp.ndarray          # [O] i32 point index
    cam: jnp.ndarray         # [O] i32 camera index
    uv: jnp.ndarray          # [O, 2] f32 measured pixel
    inv_sigma2: jnp.ndarray  # [O] f32 information (1/sigma^2 per octave)
    valid: jnp.ndarray       # [O] bool


class BAParams(NamedTuple):
    poses: jnp.ndarray   # [K, 6]
    points: jnp.ndarray  # [P, 3]
    mc: jnp.ndarray      # [C, 6]
    intr: jnp.ndarray    # [C, INTR_DIM]


class FreeMask(NamedTuple):
    poses: jnp.ndarray   # [K] bool
    points: jnp.ndarray  # [P] bool
    mc: bool | jnp.ndarray = False
    intr: bool | jnp.ndarray = False


def intr_project(intr_vec: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points with the packed intrinsics vector
    (differentiable in intr_vec — the self-calibration path)."""
    cde = intr_vec[..., 0:3]
    pp = intr_vec[..., 3:5]
    invpol = jnp.zeros(intr_vec.shape[:-1] + (MAX_INVPOL,), intr_vec.dtype)
    invpol = invpol.at[..., :_N_INVPOL].set(intr_vec[..., 5 + _N_POL :])
    return world_to_img(invpol, cde, pp, Xc)


def project_obs(pose6, mc6, intr_vec, X):
    """The MultiCol observation model for ONE observation (all args free):
    uv = pi_intr( (cayley2hom(pose) @ cayley2hom(mc))^-1 X ).

    This 6-liner + jax.jacfwd REPLACES the reference's machine-generated
    1,000-line analytic Jacobian `mcsJacs1`
    (g2o_MultiCol_vertices_edges.cpp:67-1146). Returns (uv [2], z_cam).
    """
    Mt = cayley_to_hom(pose6)
    Mc = cayley_to_hom(mc6)
    Xc = transform_points(hom_inverse(Mt @ Mc), X)
    return intr_project(intr_vec, Xc), Xc[2]


def residual_one(pose6, mc6, intr_vec, X, uv_meas):
    """r = measured - predicted (EdgeProjectXYZ2MCS::computeError semantics,
    g2o_MultiCol_vertices_edges.cpp:32-64). Returns (r [2], z_cam)."""
    uv, z = project_obs(pose6, mc6, intr_vec, X)
    return uv_meas - uv, z


# vmapped residual + all Jacobian blocks for a whole observation table
def residuals_and_jacobians(params: BAParams, obs: Observations,
                            with_mc: bool = True, with_intr: bool = True):
    """Returns r [O,2], z [O], and Jacobian blocks in OBSERVATION-MINOR
    layout: Jpose [2,6,O], Jpt [2,3,O], Jmc [2,6,O], Jintr [2,INTR_DIM,O].
    Jmc/Jintr are None when with_mc/with_intr is False (the standard BA
    modes keep the rig calibration fixed — their Jacobian blocks are the
    WIDEST per-row data, so skipping them cuts most of the bandwidth).

    One differentiation pass through the full chain — XLA fuses the
    per-observation closed form; no sparse matrix is ever materialized. The
    [.., O] layout matters enormously on TPU: an [O, 2, d] array puts a
    d<=22-wide dim on the 128-lane minor axis, padding every vector register
    and HBM tile ~6-60x — the profiled Hessian-vector product was
    bandwidth-inflated ~20x by it.
    """
    argnums = (0, 3) if not (with_mc or with_intr) else (
        (0, 1, 3) if not with_intr else ((0, 2, 3) if not with_mc else (0, 1, 2, 3)))

    def with_jac(kf, pt, cam, uv):
        p6 = params.poses[kf]
        m6 = params.mc[cam]
        iv = params.intr[cam]
        X = params.points[pt]
        r, z = residual_one(p6, m6, iv, X, uv)
        # jacrev, not jacfwd: the residual is 2-dim but the parameter stack
        # is up to 6+6+22+3 = 37-dim — reverse mode runs 2 cotangent passes
        # where forward mode would push 37 tangents through the chain
        jac = jax.jacrev(lambda a, b, c, d: residual_one(a, b, c, d, uv)[0],
                         argnums=argnums)(p6, m6, iv, X)
        return r, z, jac

    r, z, jacs = jax.vmap(with_jac, out_axes=(0, 0, -1))(
        obs.kf, obs.pt, obs.cam, obs.uv)
    jac_by_argnum = dict(zip(argnums, jacs))
    return (r, z, jac_by_argnum[0], jac_by_argnum[3],
            jac_by_argnum.get(1), jac_by_argnum.get(2))


def pose_residuals_and_jac(params: BAParams, obs: Observations):
    """Pose-only fast path: r [O,2], z [O], Jpose [O,2,6] and nothing else.
    The full-table variant pushes 37 jacfwd tangents (6+3+6+22) through the
    chain; PoseOptimization only ever uses the 6 pose columns, so this is
    ~6x less Jacobian compute per GN iteration."""

    def with_jac(kf, pt, cam, uv):
        p6 = params.poses[kf]
        m6 = params.mc[cam]
        iv = params.intr[cam]
        X = params.points[pt]
        # has_aux threads (r, z) out of the same forward pass as the Jacobian

        def f(a):
            r, z = residual_one(a, m6, iv, X, uv)
            return r, (r, z)

        # jacrev: 2 cotangent passes vs 6 forward tangents (r is 2-dim)
        Jp, (r, z) = jax.jacrev(f, has_aux=True)(p6)
        return r, z, Jp

    return jax.vmap(with_jac)(obs.kf, obs.pt, obs.cam, obs.uv)


def residuals_only(params: BAParams, obs: Observations):
    def one(kf, pt, cam, uv):
        return residual_one(params.poses[kf], params.mc[cam], params.intr[cam], params.points[pt], uv)

    return jax.vmap(one)(obs.kf, obs.pt, obs.cam, obs.uv)


def huber_weights(r: jnp.ndarray, z: jnp.ndarray, obs: Observations, delta: float):
    """IRLS weights: w = inv_sigma2 * min(1, delta/e) with e = sigma-normalized
    residual norm; zeroed for invalid rows and points behind the camera
    (cheirality z <= 0). Returns (w [O], chi2 [O])."""
    e2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    e = jnp.sqrt(e2 + 1e-18)
    w_huber = jnp.minimum(1.0, delta / e)
    ok = obs.valid & (z > 0)
    return jnp.where(ok, obs.inv_sigma2 * w_huber, 0.0), jnp.where(ok, e2, 0.0)


def robust_cost(r, z, obs, delta):
    """Total Huber cost (for LM gain-ratio bookkeeping)."""
    e2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    e = jnp.sqrt(e2 + 1e-18)
    rho = jnp.where(e <= delta, e2, 2.0 * delta * e - delta * delta)
    ok = obs.valid & (z > 0)
    return jnp.sum(jnp.where(ok, rho, 0.0))
