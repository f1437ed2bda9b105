"""Batched Scaramuzza omnidirectional camera model (TPU-native).

Re-expresses the reference's `cCamModelGeneral_` (/root/reference/src/
cam_model_omni.cpp:29-222, include/cam_model_omni.h) as a pytree of arrays so
a whole rig's cameras project in one fused, vmappable op:

- forward polynomial ``p`` (degree nrpol, default 5)   : z(rho)
- inverse polynomial ``invP`` (degree nrinvpol, 12)    : rho(theta)
- affine sensor alignment (c, d, e) + principal point (u0, v0)

Projection (world_to_img, cam_model_omni.cpp:128-163):
    norm  = sqrt(x^2+y^2);  theta = atan(-z/norm);  rho = horner(invP, theta)
    uu,vv = (x,y)/norm * rho;  u = c*uu + d*vv + u0;  v = e*uu + vv + v0
Unprojection (img_to_world, :29-67):
    (x,y) = inv([[c,d],[e,1]]) (u-u0, v-v0);  z = -horner(p, |xy|); normalize.

All params are stored padded to fixed degrees so an N-camera rig stacks into
[N, ...] arrays (a single jit specialization regardless of rig size).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.utils.geometry import horner

# Fixed polynomial capacities (Lafida uses 5 / 12; padding with zeros is exact).
MAX_POL = 8
MAX_INVPOL = 16

# Mirror-mask radial offsets per pyramid level (cam_model_omni.cpp:195); the
# reference indexes past the 4-entry array for levels >=4 (UB) — we clamp.
MIRROR_OFFSETS = (22.0, 10.0, 5.0, 1.0)


@jax.tree_util.register_pytree_node_class
class OmniCamera:
    """Pytree of Scaramuzza model parameters, batched over cameras.

    Fields all have a leading camera axis [C]:
      pol     [C, MAX_POL]     forward polynomial (z(rho)), zero-padded
      invpol  [C, MAX_INVPOL]  inverse polynomial (rho(theta)), zero-padded
      cde     [C, 3]           affine params (c, d, e)
      pp      [C, 2]           principal point (u0, v0)
      wh      [C, 2]           image (width, height) in pixels (static-ish)
    """

    def __init__(self, pol, invpol, cde, pp, wh):
        self.pol = pol
        self.invpol = invpol
        self.cde = cde
        self.pp = pp
        self.wh = wh

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.pol, self.invpol, self.cde, self.pp, self.wh), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_cams(self) -> int:
        return self.pol.shape[0]

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_params(cls, pol_list, invpol_list, cde_list, pp_list, wh_list, dtype=jnp.float32):
        """Build from per-camera python lists of coefficients."""
        C = len(pol_list)
        pol = np.zeros((C, MAX_POL), np.float64)
        invpol = np.zeros((C, MAX_INVPOL), np.float64)
        for i in range(C):
            pol[i, : len(pol_list[i])] = pol_list[i]
            invpol[i, : len(invpol_list[i])] = invpol_list[i]
        return cls(
            jnp.asarray(pol, dtype),
            jnp.asarray(invpol, dtype),
            jnp.asarray(np.asarray(cde_list, np.float64), dtype),
            jnp.asarray(np.asarray(pp_list, np.float64), dtype),
            jnp.asarray(np.asarray(wh_list, np.float64), dtype),
        )

    # -- 17-param packing (the reference's g2o intrinsics vertex,
    #    cam_model_omni.h:191-223: [c,d,e,u0,v0, p(5), invP(12)] — we keep the
    #    same ordering over the *active* degrees for self-calibrating BA) ----
    def to_vector(self, n_pol: int = 5, n_invpol: int = 12) -> jnp.ndarray:
        return jnp.concatenate(
            [self.cde, self.pp, self.pol[:, :n_pol], self.invpol[:, :n_invpol]], axis=-1
        )

    @classmethod
    def from_vector(cls, vec: jnp.ndarray, wh: jnp.ndarray, n_pol: int = 5, n_invpol: int = 12):
        cde = vec[..., 0:3]
        pp = vec[..., 3:5]
        pol = jnp.zeros(vec.shape[:-1] + (MAX_POL,), vec.dtype)
        pol = pol.at[..., :n_pol].set(vec[..., 5 : 5 + n_pol])
        invpol = jnp.zeros(vec.shape[:-1] + (MAX_INVPOL,), vec.dtype)
        invpol = invpol.at[..., :n_invpol].set(vec[..., 5 + n_pol : 5 + n_pol + n_invpol])
        return cls(pol, invpol, cde, pp, wh)


# ---------------------------------------------------------------------------
# Functional projection ops (camera params indexed/broadcast explicitly so the
# same code path serves [C,K] rig batches and flat observation tables).
# ---------------------------------------------------------------------------

def world_to_img(invpol, cde, pp, X: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame 3-D points to pixels. Shapes broadcast: X [..., 3],
    invpol [..., MAX_INVPOL], cde [..., 3], pp [..., 2] -> uv [..., 2]."""
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    norm = jnp.sqrt(x * x + y * y)
    norm = jnp.maximum(norm, 1e-14)
    theta = jnp.arctan2(-z, norm)  # atan(-z/norm); arctan2 is the stable form
    rho = horner(invpol, theta)
    uu = x / norm * rho
    vv = y / norm * rho
    c, d, e = cde[..., 0], cde[..., 1], cde[..., 2]
    u = uu * c + vv * d + pp[..., 0]
    v = uu * e + vv + pp[..., 1]
    return jnp.stack([u, v], axis=-1)


def img_to_world(pol, cde, pp, uv: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixels to unit rays in the camera frame. uv [..., 2] -> [..., 3]."""
    c, d, e = cde[..., 0], cde[..., 1], cde[..., 2]
    inv_affine = c - d * e
    u_t = uv[..., 0] - pp[..., 0]
    v_t = uv[..., 1] - pp[..., 1]
    x = (u_t - d * v_t) / inv_affine
    y = (-e * u_t + c * v_t) / inv_affine
    rho = jnp.sqrt(x * x + y * y)
    z = -horner(pol, rho)
    n = jnp.sqrt(x * x + y * y + z * z)
    return jnp.stack([x / n, y / n, z / n], axis=-1)


def cam_world_to_img(cam: OmniCamera, cam_idx, X: jnp.ndarray) -> jnp.ndarray:
    """Project with per-point camera index (flat observation tables).
    cam_idx [...] int, X [..., 3] -> uv [..., 2]."""
    return world_to_img(cam.invpol[cam_idx], cam.cde[cam_idx], cam.pp[cam_idx], X)


def cam_img_to_world(cam: OmniCamera, cam_idx, uv: jnp.ndarray) -> jnp.ndarray:
    return img_to_world(cam.pol[cam_idx], cam.cde[cam_idx], cam.pp[cam_idx], uv)


def rig_world_to_img(cam: OmniCamera, X: jnp.ndarray) -> jnp.ndarray:
    """Project per-camera batches: X [C, ..., 3] -> uv [C, ..., 2]."""
    C = cam.n_cams
    extra = X.ndim - 2
    shape = (C,) + (1,) * extra
    return world_to_img(
        cam.invpol.reshape(shape + (MAX_INVPOL,)),
        cam.cde.reshape(shape + (3,)),
        cam.pp.reshape(shape + (2,)),
        X,
    )


def rig_img_to_world(cam: OmniCamera, uv: jnp.ndarray) -> jnp.ndarray:
    """Unproject per-camera batches: uv [C, ..., 2] -> rays [C, ..., 3]."""
    C = cam.n_cams
    extra = uv.ndim - 2
    shape = (C,) + (1,) * extra
    return img_to_world(
        cam.pol.reshape(shape + (MAX_POL,)),
        cam.cde.reshape(shape + (3,)),
        cam.pp.reshape(shape + (2,)),
        uv,
    )


# ---------------------------------------------------------------------------
# Mirror mask
# ---------------------------------------------------------------------------

def in_mirror_mask(cam: OmniCamera, cam_idx, uv: jnp.ndarray, scale=1.0) -> jnp.ndarray:
    """Analytic mirror-mask test, replacing the raster masks.

    Reference semantics: the level-0 mask is the circle of radius
    (v0 + offset[0]=22) around the principal point (CreateMirrorMask,
    cam_model_omni.cpp:183-222); every projection-time query uses pyr=0
    (isPointInMirrorMask call sites all pass 0). The *extractor* resizes the
    level-0 mask through the 1.2-scale pyramid with INTER_NEAREST
    (mdBRIEFextractorOct.cpp:1182), so at pyramid level l the circle simply
    scales by s = 1/scaleFactor^l. `scale` is that pyramid scale
    (1.0 for level-0 / projection queries); uv is in level coordinates.
    NB: CreateMirrorMask's halved-per-level masks (offsets {22,10,5,1}) are
    never queried above pyr 0 in the reference — dead configuration.
    """
    scale = jnp.asarray(scale, uv.dtype)
    pp = cam.pp[cam_idx]
    wh = cam.wh[cam_idx]
    u0_l = pp[..., 0] * scale
    v0_l = pp[..., 1] * scale
    w_l = jnp.round(wh[..., 0] * scale)
    h_l = jnp.round(wh[..., 1] * scale)
    u, v = uv[..., 0], uv[..., 1]
    inside = (u > 0) & (u < w_l - 1) & (v > 0) & (v < h_l - 1)
    r2 = (u - u0_l) ** 2 + (v - v0_l) ** 2
    rad = (pp[..., 1] + MIRROR_OFFSETS[0]) * scale
    return inside & (r2 < rad * rad)


def mirror_mask_grid(cam: OmniCamera, h: int, w: int, scale=1.0) -> jnp.ndarray:
    """Dense mirror-mask raster for ALL cameras at one pyramid level, without
    materializing a [C, h, w, 2] coordinate tensor: broadcast row/col iotas
    against per-camera circle parameters. Returns [C, h, w] bool. Same
    semantics as `in_mirror_mask` on a full pixel grid."""
    scale = jnp.asarray(scale, jnp.float32)
    u0 = cam.pp[:, 0, None, None] * scale
    v0 = cam.pp[:, 1, None, None] * scale
    w_l = jnp.round(cam.wh[:, 0, None, None] * scale)
    h_l = jnp.round(cam.wh[:, 1, None, None] * scale)
    xx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    yy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    inside = (xx > 0) & (xx < w_l - 1) & (yy > 0) & (yy < h_l - 1)
    r2 = (xx - u0) ** 2 + (yy - v0) ** 2
    rad = (cam.pp[:, 1, None, None] + MIRROR_OFFSETS[0]) * scale
    return inside & (r2 < rad * rad)


def mirror_mask_raster(cam: OmniCamera, cam_idx: int, n_levels: int):
    """Materialize boolean mirror masks per pyramid level for one camera
    (host-side helper; used by the feature extractor to mask detections)."""
    w0, h0 = (int(x) for x in np.asarray(cam.wh[cam_idx]))
    u0, v0 = (float(x) for x in np.asarray(cam.pp[cam_idx]))
    masks = []
    w, h = w0, h0
    for lvl in range(n_levels):
        if lvl > 0:
            w, h = (w + 1) // 2, (h + 1) // 2
            u0, v0 = np.ceil(u0 / 2.0), np.ceil(v0 / 2.0)
        off = MIRROR_OFFSETS[min(lvl, 3)]
        jj, ii = np.meshgrid(np.arange(w), np.arange(h))
        mask = np.sqrt((ii - v0) ** 2 + (jj - u0) ** 2) < (v0 + off)
        masks.append(mask)
    return masks


def fit_inverse_poly(pol, rho_max: float, deg: int = 12) -> np.ndarray:
    """Fit the inverse polynomial rho(theta) from a forward polynomial z(rho)
    so the pair is self-consistent (WorldToImg o ImgToWorld = id).

    The Scaramuzza calibration toolbox ships both polynomials fitted from
    data; synthetic rigs must derive invpol from pol or the round trip has
    systematic error. theta = atan2(-z, rho) with z = -horner(pol, rho).
    Returns MAX_INVPOL-padded coefficients (lowest order first).
    """
    pol = np.asarray(pol, np.float64)
    rho = np.linspace(1e-6, rho_max, 512)
    z = -np.polyval(pol[::-1], rho)
    theta = np.arctan2(-z, rho)
    order = np.argsort(theta)
    coeffs = np.polyfit(theta[order], rho[order], deg)[::-1]
    out = np.zeros(MAX_INVPOL, np.float64)
    out[: deg + 1] = coeffs
    return out
