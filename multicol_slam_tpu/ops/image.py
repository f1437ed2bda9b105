"""Image ops for the feature pipeline: pyramid, box filter, Harris response.

TPU-native equivalents of the OpenCV calls in the reference extractor
(`/root/reference/src/mdBRIEFextractorOct.cpp`): `ComputePyramid` (:1158),
`boxFilter 5x5` (:1301), Harris scoring (score_type 0). All ops batch over a
leading camera axis [C, H, W] and are shaped for XLA convolution fusion
(channels map to conv feature dims; cameras map to the batch dim).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    """Static per-level (h, w): level l is scaled by 1/scale_factor^l
    (mdBRIEFextractorOct.cpp:1158-1200 resize semantics, round)."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale_factor ** lvl)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


def scale_factors(n_levels: int, scale_factor: float) -> np.ndarray:
    """mvScaleFactor: [1, s, s^2, ...] (mdBRIEFextractorOct.cpp:156)."""
    return scale_factor ** np.arange(n_levels)


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> List[jnp.ndarray]:
    """[C, H, W] float32 -> list of [C, h_l, w_l] per level (bilinear resize).

    Returns a python list (one static shape per level) — the whole list is
    produced inside a single jit so XLA schedules all resizes together.
    """
    C, H, W = img.shape
    shapes = pyramid_shapes(H, W, n_levels, scale_factor)
    out = [img]
    for (h, w) in shapes[1:]:
        # resize from the previous level (cascade, like cv::resize chain)
        out.append(jax.image.resize(out[-1], (C, h, w), method="linear"))
    return out


def _conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise-style 2-D convolution with reflect padding ~ BORDER_REFLECT_101.
    img [C, H, W], kernel [kh, kw] -> [C, H, W]."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    imgp = jnp.pad(img, ((0, 0), (ph, ph), (pw, pw)), mode="reflect")
    return jax.lax.conv_general_dilated(
        imgp[:, None, :, :],
        kernel[None, None, :, :].astype(img.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]


def box_filter(img: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """Normalized box blur (cv::boxFilter(..., Size(5,5), normalize=true)),
    separable: two 1-D convs instead of one k*k conv (bandwidth-bound op)."""
    k = jnp.ones((size,), img.dtype) / size
    out = _conv2d_same(img, k[None, :])
    return _conv2d_same(out, k[:, None])


# NOTE: a dense Harris response map used to live here; deleted as dead code.
# The reference's HarrisResponses is only reachable from the disabled
# ComputeKeyPointsOld path (mdBRIEFextractorOct.cpp:1262-1263) — our live
# scoring is the FAST corner score, like the reference's active path.


def max_pool_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 max filter for non-maximum suppression. [C, H, W] -> [C, H, W]."""
    return jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def gather_patches(img: jnp.ndarray, centers: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather square patches around integer centers with edge clamp.

    img [H, W]; centers [K, 2] int32 (u=x col, v=y row) -> [K, P, P] where
    P = 2*radius+1.

    TPU note: expressed as a vmapped dynamic_slice, which lowers to ONE
    gather of [P, P] *blocks* (contiguous lanes along the image row) instead
    of K*P*P independent scalar gathers — order-of-magnitude faster on TPU,
    where scattered scalar gathers serialize. Edge behavior: the whole
    window clamps to stay inside the image (identical to per-pixel clamp for
    keypoints >= radius from the border, which detection borders guarantee).
    """
    H, W = img.shape
    P = 2 * radius + 1
    r0 = jnp.clip(centers[:, 1] - radius, 0, max(H - P, 0))
    c0 = jnp.clip(centers[:, 0] - radius, 0, max(W - P, 0))
    return jax.vmap(lambda r, c: jax.lax.dynamic_slice(img, (r, c), (P, P)))(r0, c0)
