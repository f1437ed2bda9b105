"""Descriptor matching kernels: Hamming distance tiles + masked best-match.

TPU-native re-expression of `cORBmatcher` (/root/reference/src/
cORBmatcher.cpp). The reference walks grids and BoW buckets per keypoint with
popcount64 Hamming (:2443-2480); here ALL SearchBy* variants are one shape:

    dist = hamming_matrix(descQ, descT)        # dense [Q, T] tile
    mask = <variant-specific predicate>        # window / epipolar / BoW / cam
    idx, d, ok = masked_best_match(dist, mask, th, ratio)

The Hamming matrix itself is computed on the MXU: descriptors are unpacked to
+-1 vectors and ham = (nbits - a.b)/2 — a [Q,256]x[256,T] matmul — far better
TPU utilization than byte-wise popcount on the VPU. The masked-distance
variant (mdBRIEF, :2457-2480: ((xor&mA)+(xor&mB))/2) is two such matmuls.

Thresholds follow :46-65: TH_HIGH = 3*descBytes, TH_LOW = 2*descBytes (bits),
scaled x0.5 when stability masks are active.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def th_high(desc_bytes: int, masked: bool = False) -> float:
    return 1.5 * desc_bytes if masked else 3.0 * desc_bytes


def th_low(desc_bytes: int, masked: bool = False) -> float:
    return 1.0 * desc_bytes if masked else 2.0 * desc_bytes


def unpack_pm1(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, B] uint8 -> [N, 8*B] +-1 (bit set -> +1). LSB-first to match the
    descriptor packing."""
    w = jnp.asarray((1 << np.arange(8)).astype(np.uint8))
    bits = (desc[..., :, None] & w[None, :]) > 0  # [N, B, 8]
    return (bits.reshape(desc.shape[0], -1).astype(dtype) * 2 - 1)


def hamming_matrix(desc_q: jnp.ndarray, desc_t: jnp.ndarray) -> jnp.ndarray:
    """Dense Hamming distances [Q, T] via the MXU: ham = (nbits - a.b)/2.

    Exact: +-1 dot products are integers in [-nbits, nbits]; accumulation in
    f32 (preferred_element_type) is lossless for nbits <= 512.
    """
    a = unpack_pm1(desc_q)
    b = unpack_pm1(desc_t)
    nbits = a.shape[-1]
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return 0.5 * (nbits - dot)


def hamming_matrix_masked(
    desc_q: jnp.ndarray, mask_q: jnp.ndarray, desc_t: jnp.ndarray, mask_t: jnp.ndarray
) -> jnp.ndarray:
    """mdBRIEF masked Hamming (cORBmatcher.cpp:2457-2480):
    d = (popcount(xor & mQ) + popcount(xor & mT)) / 2.

    With a,b in {-1,+1} and m in {0,1}: popcount(xor&m) = (sum(m) - (a*m).b)/2,
    so this is two MXU matmuls plus a row/col sum.
    """
    a = unpack_pm1(desc_q)
    b = unpack_pm1(desc_t)
    w = jnp.asarray((1 << np.arange(8)).astype(np.uint8))
    mq = ((mask_q[..., :, None] & w) > 0).reshape(mask_q.shape[0], -1).astype(a.dtype)
    mt = ((mask_t[..., :, None] & w) > 0).reshape(mask_t.shape[0], -1).astype(a.dtype)
    # popcount(xor & mQ)[q,t] = (sum_j mq[q,j] - sum_j mq[q,j]*a[q,j]*b[t,j]) / 2
    dot_q = jnp.dot(a * mq, b.T, preferred_element_type=jnp.float32)
    dot_t = jnp.dot(a, (b * mt).T, preferred_element_type=jnp.float32)
    sum_q = jnp.sum(mq, axis=-1, dtype=jnp.float32)[:, None]
    sum_t = jnp.sum(mt, axis=-1, dtype=jnp.float32)[None, :]
    return 0.25 * ((sum_q - dot_q) + (sum_t - dot_t))


BIG = jnp.float32(1e9)


def masked_best_match(
    dist: jnp.ndarray,
    mask: jnp.ndarray,
    max_dist: float,
    ratio: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-wise best match under a candidate mask with optional Lowe ratio.

    dist [Q, T]; mask [Q, T] bool. Returns (idx [Q] i32, d [Q] f32, ok [Q]).
    ratio: best < ratio * second-best (the 0.9/0.8 tests, cTracking.cpp:410,
    733; cLocalMapping.cpp:161). Fixed-shape: invalid rows get ok=False.
    """
    d = jnp.where(mask, dist, BIG)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    ok = best <= max_dist
    if ratio is not None:
        d2 = d.at[jnp.arange(d.shape[0]), idx].set(BIG)
        second = jnp.min(d2, axis=1)
        ok = ok & (best < ratio * second)
    return idx, best, ok


def mutual_filter(idx_qt: jnp.ndarray, ok_q: jnp.ndarray, idx_tq: jnp.ndarray) -> jnp.ndarray:
    """Keep q only if t = idx_qt[q] maps back: idx_tq[t] == q (cross-check)."""
    q_ids = jnp.arange(idx_qt.shape[0], dtype=idx_qt.dtype)
    return ok_q & (idx_tq[idx_qt] == q_ids)


def resolve_duplicate_targets(idx: jnp.ndarray, dist: jnp.ndarray, ok: jnp.ndarray, n_targets: int) -> jnp.ndarray:
    """Enforce one-to-one assignment: when several queries claim the same
    target, keep only the lowest-distance one (the reference's bestDist
    bookkeeping when filling mvpMapPoints). Returns updated ok [Q]."""
    d = jnp.where(ok, dist, BIG)
    # min distance per target
    tmin = jnp.full((n_targets,), BIG).at[idx].min(d)
    return ok & (d <= tmin[idx])


def rotation_consistency(
    dangle: jnp.ndarray, ok: jnp.ndarray, n_bins: int = 30, keep_bins: int = 3
) -> jnp.ndarray:
    """ORB rotation-histogram check (cORBmatcher's rotHist, e.g. :640-680,
    2080-2110): histogram match angle deltas into 30 bins, keep only matches
    in the `keep_bins` most popular bins. dangle [Q] radians; ok [Q] bool."""
    two_pi = 2.0 * np.pi
    frac = (dangle % two_pi) / two_pi
    bins = jnp.clip((frac * n_bins).astype(jnp.int32), 0, n_bins - 1)
    counts = jnp.zeros((n_bins,), jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top = jax.lax.top_k(counts, keep_bins)[0]
    # a kept bin must be in the top-`keep_bins` AND hold >=10% of the
    # dominant bin's votes (ComputeThreeMaxima's 0.1*max1 cut — without it,
    # lone-outlier bins survive whenever fewer than 3 bins are populated)
    thresh = jnp.maximum(top[-1], (0.1 * top[0]).astype(counts.dtype))
    keep = counts[bins] >= jnp.maximum(thresh, 1)
    return ok & keep


def window_mask(
    uv_q: jnp.ndarray,
    uv_t: jnp.ndarray,
    radius,
    octave_q: Optional[jnp.ndarray] = None,
    octave_t: Optional[jnp.ndarray] = None,
    level_tol: Optional[int] = None,
) -> jnp.ndarray:
    """Spatial window predicate [Q, T]: |uv_q - uv_t| <= radius (per-query
    radius broadcast), optional pyramid-level agreement — the dense equivalent
    of GetFeaturesInArea grid lookups (cMultiFrame.cpp:272-340)."""
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    du = jnp.abs(uv_q[:, None, 0] - uv_t[None, :, 0])
    dv = jnp.abs(uv_q[:, None, 1] - uv_t[None, :, 1])
    m = (du <= r) & (dv <= r)
    if octave_q is not None and level_tol is not None:
        m = m & (jnp.abs(octave_q[:, None] - octave_t[None, :]) <= level_tol)
    return m
