"""Binary descriptors: steered BRIEF (ORB-style), dBRIEF, mdBRIEF — batched.

Capability match for `/root/reference/src/mdBRIEFextractorOct.cpp`:
  - compute_ORB    (:303-353): pattern rotated by keypoint angle, bit = t0<t1
  - compute_dBRIEF (:356-407): pattern rotated in the *undistorted image plane*
    around the keypoint, pushed through the omni model (distortPointsOcam =
    WorldToImg(x, y, -a0)), mean-centered, then sampled at the keypoint
  - compute_mdBRIEF(:410-554): dBRIEF + stability mask from patterns perturbed
    by +-20 deg; a bit is 'stable' iff both perturbed comparisons agree
  - IC_Angle       (:221-247): intensity-centroid orientation over a circular
    radius-15 patch

Design notes (TPU-first): all keypoints of a pyramid level are processed in
one shot — pattern rotation is a [K, 512, 2] einsum, sampling is a vectorized
gather, bit packing is a [K, 256] -> [K, 32] uint8 dot with power-of-two
weights. The descriptor *pattern itself is our own*: 256 point pairs sampled
i.i.d. from N(0, (PATCH/5)^2) clipped to the patch (the classic BRIEF-II
construction) with a fixed seed — NOT the OpenCV table — so descriptors are
self-consistent across extractor/matcher/vocabulary within this framework.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import world_to_img
from multicol_slam_tpu.ops.image import gather_patches

HALF_PATCH = 15          # IC-angle patch radius (HALF_PATCH_SIZE in reference)
PATCH_SIZE = 31
PATTERN_SEED = 20160823  # fixed; descriptors must be reproducible across runs


@functools.lru_cache(maxsize=None)
def brief_pattern(n_bits: int = 512) -> np.ndarray:
    """[n_bits, 2] int32 test locations in [-13, 13] (Gaussian, sigma=patch/5).

    n_bits = 2 * 8 * desc_bytes test *points* (pairs are consecutive entries,
    matching the reference's pattern layout where GET_VALUE(2i)/(2i+1) form
    bit i)."""
    rng = np.random.default_rng(PATTERN_SEED)
    sigma = PATCH_SIZE / 5.0
    pts = np.clip(np.round(rng.normal(0.0, sigma, size=(n_bits, 2))), -(HALF_PATCH - 2), HALF_PATCH - 2)
    return pts.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _ic_angle_weights() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Circular-patch weight maps for the intensity centroid: (wx, wy, mask)
    over a 31x31 window, radius 15 circle (u_max semantics of IC_Angle)."""
    d = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    xx, yy = np.meshgrid(d, d)  # xx: cols (u), yy: rows (v)
    mask = (xx ** 2 + yy ** 2) <= HALF_PATCH ** 2
    return (xx * mask).astype(np.float32), (yy * mask).astype(np.float32), mask


def ic_angles(img: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation for K keypoints on one image.

    img [H, W] f32, centers [K, 2] int32 -> angle [K] radians in [-pi, pi].
    m10 = sum(x * I), m01 = sum(y * I) over the circular patch; angle =
    atan2(m01, m10) (IC_Angle, mdBRIEFextractorOct.cpp:221-247).
    """
    wx, wy, _ = _ic_angle_weights()
    patches = gather_patches(img, centers, HALF_PATCH)  # [K, 31, 31]
    m10 = jnp.einsum("kij,ij->k", patches, jnp.asarray(wx))
    m01 = jnp.einsum("kij,ij->k", patches, jnp.asarray(wy))
    return jnp.arctan2(m01, m10)


def ic_angles_dense(imgs: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """IC orientation via dense moment maps — the TPU-shaped formulation.

    Instead of gathering a 31x31 patch per keypoint (hundreds of scalar
    loads each — gathers are the slow path on TPU), compute the centroid
    moment maps m10/m01 for EVERY pixel as one 2-output-channel convolution
    (MXU-friendly), then gather just 2 values per keypoint.

    imgs [C, H, W] f32; centers [C, K, 2] int32 -> angles [C, K] f32.
    Identical math to `ic_angles` (exact same weights; borders differ only
    for keypoints closer than 15 px to the edge, which the detection border
    of 19 px already excludes).
    """
    wx, wy, _ = _ic_angle_weights()
    kern = np.stack([wx, wy])[:, None]  # [2, 1, 31, 31] OIHW
    pad = HALF_PATCH
    m = jax.lax.conv_general_dilated(
        imgs[:, None],
        jnp.asarray(kern, imgs.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )  # [C, 2, H, W]
    H, W = imgs.shape[1:]
    rows = jnp.clip(centers[..., 1], 0, H - 1)
    cols = jnp.clip(centers[..., 0], 0, W - 1)
    m10 = jnp.take_along_axis(
        m[:, 0].reshape(imgs.shape[0], -1), rows * W + cols, axis=1
    )
    m01 = jnp.take_along_axis(
        m[:, 1].reshape(imgs.shape[0], -1), rows * W + cols, axis=1
    )
    return jnp.arctan2(m01, m10)


# Patch radius for descriptor sampling: the BRIEF pattern lives in
# [-13, 13]; a rotation stretches it to <= 13*sqrt(2) ~ 18.4 and the dBRIEF
# camera distortion a little further. 23 covers every offset the pattern
# generators produce (larger offsets clamp, matching edge-clamp semantics).
SAMPLE_RADIUS = 23


def gather_sample_patches(img: jnp.ndarray, centers: jnp.ndarray):
    """One [K, P, P] patch per keypoint (P = 2*SAMPLE_RADIUS+1) plus the
    patch origins (r0, c0). Gathered ONCE per keypoint and shared by the
    IC-angle moments and every descriptor variant — patch gathers are the
    expensive primitive on TPU, the arithmetic after them is nearly free."""
    from multicol_slam_tpu.ops.image import gather_patches

    H, W = img.shape
    R = SAMPLE_RADIUS
    P = 2 * R + 1
    patches = gather_patches(img, centers, R)
    r0 = jnp.clip(centers[:, 1] - R, 0, max(H - P, 0))
    c0 = jnp.clip(centers[:, 0] - R, 0, max(W - P, 0))
    return patches, r0, c0


def ic_angles_from_patches(patches: jnp.ndarray, centers: jnp.ndarray, r0, c0) -> jnp.ndarray:
    """IC orientation from pre-gathered sample patches: slice the 31x31
    moment window around each keypoint (dynamic per keypoint — the patch
    window clamps at image borders) and contract with the centroid weights."""
    wx, wy, _ = _ic_angle_weights()
    P = patches.shape[-1]
    Q = 2 * HALF_PATCH + 1
    oy = jnp.clip(centers[:, 1] - r0 - HALF_PATCH, 0, P - Q)
    ox = jnp.clip(centers[:, 0] - c0 - HALF_PATCH, 0, P - Q)
    win = jax.vmap(lambda p, y, x: jax.lax.dynamic_slice(p, (y, x), (Q, Q)))(patches, oy, ox)
    m10 = jnp.einsum("kij,ij->k", win, jnp.asarray(wx))
    m01 = jnp.einsum("kij,ij->k", win, jnp.asarray(wy))
    return jnp.arctan2(m01, m10)


def _sample_patches(patches: jnp.ndarray, centers: jnp.ndarray, offsets: jnp.ndarray, r0, c0) -> jnp.ndarray:
    """Resolve scattered per-keypoint sample offsets inside pre-gathered
    patches as a one-hot double contraction on the MXU (see _sample_at)."""
    P = patches.shape[-1]
    rows = jnp.clip(centers[:, None, 1] + offsets[..., 1] - r0[:, None], 0, P - 1)
    cols = jnp.clip(centers[:, None, 0] + offsets[..., 0] - c0[:, None], 0, P - 1)
    iota = jnp.arange(P, dtype=rows.dtype)
    row_oh = (rows[..., None] == iota).astype(patches.dtype)   # [K, S, P]
    col_oh = (cols[..., None] == iota).astype(patches.dtype)   # [K, S, P]
    tmp = jnp.einsum("ksi,kij->ksj", row_oh, patches, preferred_element_type=jnp.float32)
    return jnp.einsum("ksj,ksj->ks", tmp, col_oh, preferred_element_type=jnp.float32)


def _sample_at(img: jnp.ndarray, centers: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Sample img at centers[k] + offsets[k, p]. img [H, W]; centers [K, 2]
    int32 (u, v); offsets [K, P, 2] int32 -> [K, P] values (edge clamped).

    TPU-shaped two-step: gather one contiguous [47, 47] block per keypoint
    (block gather — fast), then resolve the scattered pattern offsets as a
    one-hot DOUBLE CONTRACTION on the MXU:
        vals[k,s] = sum_ij rowOH[k,s,i] * patch[k,i,j] * colOH[k,s,j]
    A per-row take_along_axis here was measured ~8 ms/frame on v5e (TPU
    gathers serialize); the two batched matmuls are ~2.7 GFLOP/frame and run
    in tens of microseconds.
    """
    patches, r0, c0 = gather_sample_patches(img, centers)
    return _sample_patches(patches, centers, offsets, r0, c0)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[K, 8*B] bool -> [K, B] uint8, LSB-first per byte (reference packing)."""
    K, nb = bits.shape
    B = nb // 8
    w = jnp.asarray((1 << np.arange(8)).astype(np.uint8))
    return jnp.einsum("kbi,i->kb", bits.reshape(K, B, 8).astype(jnp.uint8), w).astype(jnp.uint8)


def _rotated_offsets(pattern: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate integer pattern [P, 2] by per-keypoint angles [K] -> [K, P, 2]
    int32 (rounded), the rotatePattern semantics (x*ca - y*sa, x*sa + y*ca)."""
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    x, y = pattern[:, 0].astype(jnp.float32), pattern[:, 1].astype(jnp.float32)
    xr = x[None, :] * ca[:, None] - y[None, :] * sa[:, None]
    yr = x[None, :] * sa[:, None] + y[None, :] * ca[:, None]
    return jnp.stack([jnp.round(xr), jnp.round(yr)], axis=-1).astype(jnp.int32)


def compute_orb(img: jnp.ndarray, centers: jnp.ndarray, angles: jnp.ndarray, desc_bytes: int = 32) -> jnp.ndarray:
    """Steered-BRIEF/ORB descriptors for one (blurred) level image.

    img [H, W] f32; centers [K, 2] int32; angles [K] rad -> [K, desc_bytes] u8.
    """
    patches, r0, c0 = gather_sample_patches(img, centers)
    return compute_orb_from_patches(patches, centers, r0, c0, angles, desc_bytes)


def compute_orb_from_patches(patches, centers, r0, c0, angles, desc_bytes: int = 32) -> jnp.ndarray:
    pat = jnp.asarray(brief_pattern(2 * 8 * desc_bytes))
    offs = _rotated_offsets(pat, angles)                    # [K, P, 2]
    vals = _sample_patches(patches, centers, offs, r0, c0)  # [K, P]
    bits = vals[:, 0::2] < vals[:, 1::2]                    # bit i: t0 < t1
    return _pack_bits(bits)


def _distorted_offsets(
    pattern: jnp.ndarray,
    undist_kp: jnp.ndarray,
    angles: jnp.ndarray,
    invpol: jnp.ndarray,
    cde: jnp.ndarray,
    pp: jnp.ndarray,
    a0: jnp.ndarray,
) -> jnp.ndarray:
    """dBRIEF pattern: rotate in the undistorted plane around the undistorted
    keypoint, project through the omni model at plane z=-a0, subtract the
    mean, round (rotateAndDistortPattern, mdBRIEFextractorOct.cpp:250-283).

    pattern [P, 2]; undist_kp [K, 2]; angles [K] -> [K, P, 2] int32.
    """
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    x, y = pattern[:, 0].astype(jnp.float32), pattern[:, 1].astype(jnp.float32)
    xr = x[None, :] * ca[:, None] - y[None, :] * sa[:, None] + undist_kp[:, 0:1]
    yr = x[None, :] * sa[:, None] + y[None, :] * ca[:, None] + undist_kp[:, 1:2]
    plane_pts = jnp.stack([xr, yr, jnp.broadcast_to(-a0, xr.shape)], axis=-1)
    uv = world_to_img(invpol, cde, pp, plane_pts)  # [K, P, 2]
    uv = uv - jnp.mean(uv, axis=1, keepdims=True)
    return jnp.round(uv).astype(jnp.int32)


def compute_dbrief(
    img: jnp.ndarray,
    centers: jnp.ndarray,
    undist_kp: jnp.ndarray,
    angles: jnp.ndarray,
    invpol: jnp.ndarray,
    cde: jnp.ndarray,
    pp: jnp.ndarray,
    a0: jnp.ndarray,
    desc_bytes: int = 32,
    learn_masks: bool = False,
):
    """dBRIEF / mdBRIEF descriptors (+ stability masks when learn_masks).

    Returns (desc [K, B] u8, mask [K, B] u8). Without masks the mask is all
    0xFF (every bit 'stable'), letting the masked Hamming kernel be uniform.
    """
    patches, r0, c0 = gather_sample_patches(img, centers)
    return compute_dbrief_from_patches(
        patches, centers, r0, c0, undist_kp, angles, invpol, cde, pp, a0,
        desc_bytes, learn_masks,
    )


def compute_dbrief_from_patches(
    patches, centers, r0, c0, undist_kp, angles, invpol, cde, pp, a0,
    desc_bytes: int = 32, learn_masks: bool = False,
):
    pat = jnp.asarray(brief_pattern(2 * 8 * desc_bytes))
    offs = _distorted_offsets(pat, undist_kp, angles, invpol, cde, pp, a0)
    vals = _sample_patches(patches, centers, offs, r0, c0)
    bits = vals[:, 0::2] < vals[:, 1::2]
    desc = _pack_bits(bits)
    if not learn_masks:
        return desc, jnp.full(desc.shape, 255, jnp.uint8)
    rot = jnp.deg2rad(20.0)
    stable = jnp.ones_like(bits)
    for delta in (rot, -rot):
        offs_p = _distorted_offsets(pat, undist_kp, angles + delta, invpol, cde, pp, a0)
        vals_p = _sample_patches(patches, centers, offs_p, r0, c0)
        bits_p = vals_p[:, 0::2] < vals_p[:, 1::2]
        stable = stable & (bits_p == bits)
    return desc, _pack_bits(stable)


def undistort_keypoints(pol, cde, pp, a0, uv_level0: jnp.ndarray) -> jnp.ndarray:
    """undistortPointsOcam with scale factor a0 (cam_model_omni.h:129-140 with
    scaleF = p[0], mdBRIEFextractorOct.cpp:1288): unproject to a ray (x,y,z),
    return (-x/z, -y/z) * a0. uv [K, 2] -> [K, 2]."""
    from multicol_slam_tpu.models.camera import img_to_world

    ray = img_to_world(pol, cde, pp, uv_level0)
    return jnp.stack(
        [-ray[..., 0] / ray[..., 2] * a0, -ray[..., 1] / ray[..., 2] * a0], axis=-1
    )
