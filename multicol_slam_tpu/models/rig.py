"""Multi-Camera System (MCS) rig: body pose + fixed camera extrinsics.

TPU-native re-expression of `cMultiCamSys_` (/root/reference/src/
cam_system_omni.cpp, include/cam_system_omni.h). Conventions (SURVEY.md §3.5
"pose gotcha", verified against cam_system_omni.cpp:92-112):

- ``M_t``  : body -> world (4x4). NOTE: inverted vs ORB-SLAM2's Tcw.
- ``M_c[c]``: camera c -> body (4x4), fixed per rig (calibration).
- projection of world point X into camera c:  x_cam = (M_t @ M_c[c])^-1 X,
  then the omni model maps x_cam to pixels; sign(z_cam) gives cheirality.
  WorldToCamHom_fast returns (z <= 0) and callers `continue` on true
  (cLocalMapping.cpp:326-341), i.e. **in front means z_cam > 0** — consistent
  with unprojected rays having z = -a0 > 0 at the image center (a0 < 0).

The reference caches MtMc / MtMc_inv on every pose set
(cam_system_omni.cpp:170-198); here poses are plain arrays and the products
are fused into the jitted consumer, so "caching" is XLA CSE.

Unlike the reference (one rig object mutated in place), the rig is an
immutable pytree; per-timestep body poses live in the map/trajectory arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import OmniCamera, world_to_img, cam_world_to_img
from multicol_slam_tpu.utils.geometry import (
    cayley_to_hom,
    hom_inverse,
    hom_to_cayley,
    transform_points,
)


@jax.tree_util.register_pytree_node_class
class MultiCamRig:
    """Rig = N omni cameras + their body-frame extrinsics.

    Fields:
      cams      OmniCamera (batched [C])
      Mc        [C, 4, 4]  camera->body extrinsics
      Mc_cayley [C, 6]     minimal parametrization of the same
    """

    def __init__(self, cams: OmniCamera, Mc: jnp.ndarray, Mc_cayley: jnp.ndarray):
        self.cams = cams
        self.Mc = Mc
        self.Mc_cayley = Mc_cayley

    def tree_flatten(self):
        return (self.cams, self.Mc, self.Mc_cayley), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_cams(self) -> int:
        return self.Mc.shape[0]

    @classmethod
    def from_cayley(cls, cams: OmniCamera, mc_cayley: jnp.ndarray):
        mc_cayley = jnp.asarray(mc_cayley)
        return cls(cams, cayley_to_hom(mc_cayley), mc_cayley)

    def with_extrinsics(self, mc_cayley: jnp.ndarray) -> "MultiCamRig":
        """Functional update (used by self-calibrating BA)."""
        return MultiCamRig.from_cayley(self.cams, mc_cayley)


# ---------------------------------------------------------------------------
# Projection through the full chain (the MultiCol observation model).
# These are THE residual building blocks for BA — autodiff through them
# replaces the reference's 1000-line hand-written mcsJacs1
# (g2o_MultiCol_vertices_edges.cpp:67-1146).
# ---------------------------------------------------------------------------

def world_to_cam_frame(Mt: jnp.ndarray, Mc: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """(Mt @ Mc)^-1 X for broadcastable stacks. Mt [...,4,4], Mc [...,4,4],
    X [...,3] -> camera-frame points [...,3]."""
    MtMc_inv = hom_inverse(Mt @ Mc) if Mt.ndim == 2 and Mc.ndim == 2 else hom_inverse(
        jnp.einsum("...ij,...jk->...ik", Mt, Mc)
    )
    return transform_points(MtMc_inv, X)


def project_mcs(rig: MultiCamRig, Mt_cayley: jnp.ndarray, cam_idx, X: jnp.ndarray):
    """Full MultiCol projection for a flat observation table.

    Args: Mt_cayley [..., 6] body pose(s); cam_idx [...] int; X [..., 3] world
    points. Returns (uv [..., 2], z_cam [...]) where z_cam > 0 means the point
    is in front of the omni camera (cam_system_omni.cpp:92-112 returns
    z<=0 and callers reject on true, cLocalMapping.cpp:326-341).
    """
    Mt = cayley_to_hom(Mt_cayley)
    Mc = rig.Mc[cam_idx]
    Xc = transform_points(hom_inverse(jnp.einsum("...ij,...jk->...ik", Mt, Mc)), X)
    uv = cam_world_to_img(rig.cams, cam_idx, Xc)
    return uv, Xc[..., 2]


def project_mcs_params(
    invpol, cde, pp, Mt_cayley: jnp.ndarray, Mc_cayley: jnp.ndarray, X: jnp.ndarray
):
    """Projection with *all* parameters free (pose, extrinsics, intrinsics) —
    the residual core for self-calibrating MultiCol BA (the capability of
    g2o's EdgeProjectXYZ2MCS with VertexMc_cayley/VertexOmniCameraParameters
    unfixed, cOptimizer.cpp:141-158). Fully differentiable in every argument.
    """
    Mt = cayley_to_hom(Mt_cayley)
    Mc = cayley_to_hom(Mc_cayley)
    Xc = transform_points(hom_inverse(jnp.einsum("...ij,...jk->...ik", Mt, Mc)), X)
    uv = world_to_img(invpol, cde, pp, Xc)
    return uv, Xc[..., 2]


def camera_centers(rig: MultiCamRig, Mt: jnp.ndarray) -> jnp.ndarray:
    """World-space optical centers of every camera: (Mt @ Mc)[:3, 3].
    Mt [..., 4, 4] -> [..., C, 3]."""
    MtMc = jnp.einsum("...ij,cjk->...cik", Mt, rig.Mc)
    return MtMc[..., :3, 3]


def body_center(Mt: jnp.ndarray) -> jnp.ndarray:
    """World position of the body frame (Mt is body->world)."""
    return Mt[..., :3, 3]
