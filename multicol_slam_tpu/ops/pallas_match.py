"""Pallas TPU kernel: fused masked-Hamming best-match.

The matching hot path (SearchByProjection / WindowSearch families,
/root/reference/src/cORBmatcher.cpp:67-166, :326, :579, :1991) is, in dense
TPU form, a [Q, T] Hamming tile + predicate mask + row-wise (best, second,
argmin). The jnp path (ops/matching.py) materializes the [Q, T] distance
matrix in HBM (e.g. 3x4096x400 f32 ~ 20 MB per tensor, several tensors per
stage). This kernel streams T in VMEM-resident tiles and keeps ONLY the
[Q]-sized running (best, second, argmin) state, so HBM traffic drops to the
descriptor/coordinate inputs + [Q] outputs:

  for each T-tile:                                (grid, sequential on TPU)
      dot   = a_pm1 @ b_tile^T                    (MXU, bf16 -> f32)
      ham   = (nbits - dot) / 2
      mask  = |uv_q - uv_t| <= rad_t  &  |oct_q - lvl_t| <= tol  (VPU)
      merge row-min/second/argmin into running state (VMEM scratch)

Mask semantics cover all callers:
  - per-target radius rad_t (<0 disables the target entirely -> the
    candidate/validity masks are folded into rad_t by the wrapper),
  - optional pyramid-level band between per-query octave oct_q and
    per-target predicted level lvl_t (tol >= n_levels disables it).

Wrappers fall back to the jnp path off-TPU (tests exercise the kernel via
interpret mode; CPU/GPU production path stays jnp).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.ops.matching import unpack_pm1

BIG = 1e9  # plain float: jnp scalars would be captured as consts inside the kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _match_kernel(
    a_ref,        # [Q, D]  bf16 (+-1 unpacked query descriptors)
    uvq_ref,      # [Q, 2]  f32
    octq_ref,     # [Q, 1]  f32
    radq_ref,     # [Q, 1]  f32  (<0 -> query disabled)
    b_ref,        # [TT, D] bf16 (one target tile)
    uvt_ref,      # [TT, 2] f32
    radt_ref,     # [TT, 1] f32  (<0 -> target disabled)
    lvlt_ref,     # [TT, 1] f32
    tol_ref,      # [1, 1]  f32  (SMEM) level tolerance
    best_ref,     # [Q, 1] out
    second_ref,   # [Q, 1] out
    idx_ref,      # [Q, 1] out  (i32)
):
    t = pl.program_id(0)
    TT = b_ref.shape[0]
    nbits = jnp.float32(a_ref.shape[1])

    @pl.when(t == 0)
    def _():
        best_ref[:] = jnp.full(best_ref.shape, BIG, jnp.float32)
        second_ref[:] = jnp.full(second_ref.shape, BIG, jnp.float32)
        idx_ref[:] = jnp.full(idx_ref.shape, -1, jnp.int32)

    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # [Q, TT]
    ham = 0.5 * (nbits - dot)
    du = jnp.abs(uvq_ref[:, 0:1] - uvt_ref[:, 0][None, :])
    dv = jnp.abs(uvq_ref[:, 1:2] - uvt_ref[:, 1][None, :])
    # effective radius = min(per-query, per-target); either <0 disables
    rad = jnp.minimum(radq_ref[:, 0:1], radt_ref[:, 0][None, :])
    dl = jnp.abs(octq_ref[:, 0:1] - lvlt_ref[:, 0][None, :])
    mask = (du <= rad) & (dv <= rad) & (dl <= tol_ref[0, 0])
    d = jnp.where(mask, ham, BIG)

    # tile row-min / second / argmin over the TT axis
    t1 = jnp.min(d, axis=1, keepdims=True)                       # [Q, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    is_min = d <= t1
    # first column achieving the min
    a1 = jnp.min(jnp.where(is_min, cols, TT), axis=1, keepdims=True)
    d_wo = jnp.where(cols == a1, BIG, d)
    t2 = jnp.min(d_wo, axis=1, keepdims=True)

    r1, r2, ri = best_ref[:], second_ref[:], idx_ref[:]
    new_r1 = jnp.minimum(r1, t1)
    new_r2 = jnp.minimum(jnp.maximum(r1, t1), jnp.minimum(r2, t2))
    new_ri = jnp.where(t1 < r1, a1 + t * TT, ri)
    best_ref[:] = new_r1
    second_ref[:] = new_r2
    idx_ref[:] = new_ri


try:  # pallas import kept optional: CPU-only deployments use the jnp path
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


@functools.partial(
    jax.jit, static_argnames=("level_tol", "tile_t", "interpret")
)
def masked_best_match_pallas(
    desc_q: jnp.ndarray,   # [Q, B] uint8
    uv_q: jnp.ndarray,     # [Q, 2] f32
    oct_q: jnp.ndarray,    # [Q]    f32/i32
    desc_t: jnp.ndarray,   # [T, B] uint8
    uv_t: jnp.ndarray,     # [T, 2] f32
    rad_t: jnp.ndarray,    # [T]    f32 (per-target window radius; <0 disables)
    lvl_t: jnp.ndarray,    # [T]    f32 predicted level per target
    rad_q: jnp.ndarray = None,  # [Q] f32 per-query radius (None -> unlimited)
    level_tol: float = 1.0,
    tile_t: int = 512,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-wise (best, second, argmin) of the masked Hamming matrix.

    Returns (best [Q] f32, second [Q] f32, idx [Q] i32; idx = -1 when no
    target passed the mask). Padding targets get rad = -1 from the wrapper.
    """
    if interpret is None:  # off-TPU the kernel only runs interpreted
        interpret = not _on_tpu()
    Q, B = desc_q.shape
    T = desc_t.shape[0]
    D = 8 * B
    Qp = _round_up(max(Q, 8), 8)
    Tp = _round_up(max(T, tile_t), tile_t)

    a = unpack_pm1(desc_q).astype(jnp.bfloat16)
    b = unpack_pm1(desc_t).astype(jnp.bfloat16)
    a = jnp.pad(a, ((0, Qp - Q), (0, 0)))
    b = jnp.pad(b, ((0, Tp - T), (0, 0)))
    uvq = jnp.pad(uv_q.astype(jnp.float32), ((0, Qp - Q), (0, 0)))
    octq = jnp.pad(oct_q.astype(jnp.float32)[:, None], ((0, Qp - Q), (0, 0)))
    if rad_q is None:
        rad_q = jnp.full((Q,), 1e9, jnp.float32)
    # padded query rows are DISABLED (rad -1), like padded targets: they are
    # sliced off the outputs anyway, but must not claim targets in any
    # per-target reduction either
    radq = jnp.pad(
        rad_q.astype(jnp.float32)[:, None], ((0, Qp - Q), (0, 0)),
        constant_values=-1.0,
    )
    uvt = jnp.pad(uv_t.astype(jnp.float32), ((0, Tp - T), (0, 0)))
    radt = jnp.pad(
        rad_t.astype(jnp.float32)[:, None], ((0, Tp - T), (0, 0)),
        constant_values=-1.0,
    )
    lvlt = jnp.pad(lvl_t.astype(jnp.float32)[:, None], ((0, Tp - T), (0, 0)))
    tol = jnp.asarray([[level_tol]], jnp.float32)

    grid = (Tp // tile_t,)
    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Qp, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, 2), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 2), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((Qp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, uvq, octq, radq, b, uvt, radt, lvlt, tol)
    best = best[:Q, 0]
    second = second[:Q, 0]
    idx = idx[:Q, 0]
    # targets beyond T can never win (rad = -1 padding), but clamp anyway
    idx = jnp.where((idx >= 0) & (idx < T) & (best < BIG), idx, -1)
    return best, second, idx


@functools.partial(
    jax.jit, static_argnames=("level_tol", "tile_t", "interpret")
)
def masked_best_match_pallas_cams(
    desc_q: jnp.ndarray,   # [C, Q, B] uint8
    uv_q: jnp.ndarray,     # [C, Q, 2] f32
    oct_q: jnp.ndarray,    # [C, Q]    f32/i32
    desc_t: jnp.ndarray,   # [C, T, B] uint8 (or [T, B] broadcast by caller)
    uv_t: jnp.ndarray,     # [C, T, 2] f32
    rad_t: jnp.ndarray,    # [C, T]    f32 (<0 disables)
    lvl_t: jnp.ndarray,    # [C, T]    f32
    rad_q: jnp.ndarray = None,  # [C, Q] f32 (None -> unlimited)
    mask_q: jnp.ndarray = None,  # [C, Q, B] u8 mdBRIEF stability masks
    mask_t: jnp.ndarray = None,  # [C, T, B] u8 (or [T, B])
    level_tol: float = 1.0,
    tile_t: int = 512,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-cameras variant: ONE pallas_call with grid (C, T-tiles) instead of
    C sequential kernel launches — the camera axis is a grid dimension, per
    SURVEY.md §2.3 'batch over cameras inside every kernel'. Same semantics
    per camera as masked_best_match_pallas, plus a 4th output col_best [C, T]
    = per-TARGET best masked distance over all queries of that camera.

    When mask_q/mask_t are given, the distance is the mdBRIEF masked Hamming
    (cORBmatcher.cpp:2457-2480): d = (popcount(x&mQ)+popcount(x&mT))/2 with
    x = a xor b. On the MXU: popcount(x&m) = (|m| - (a*m).b)/2 for a,b in
    {-1,+1}, m in {0,1}, so the kernel runs TWO dots per tile instead of one
    (pre-multiplied +-1/0 descriptors as extra operands). Callers must scale
    thresholds x0.5 (matching.th_high/th_low masked variants)."""
    if interpret is None:
        interpret = not _on_tpu()
    C, Q, B = desc_q.shape
    T = desc_t.shape[-2]
    D = 8 * B
    Qp = _round_up(max(Q, 8), 8)
    Tp = _round_up(max(T, tile_t), tile_t)
    masked = mask_q is not None and mask_t is not None

    a = unpack_pm1(desc_q.reshape(C * Q, B)).astype(jnp.bfloat16).reshape(C, Q, D)
    b = unpack_pm1(desc_t.reshape(-1, B)).astype(jnp.bfloat16).reshape(desc_t.shape[:-1] + (D,))
    if b.ndim == 2:
        b = jnp.broadcast_to(b[None], (C, T, D))
    if masked:
        w8 = jnp.asarray((1 << np.arange(8)).astype(np.uint8))
        mq = ((mask_q.reshape(C * Q, B)[..., None] & w8) > 0).reshape(C, Q, D)
        mt_shape = mask_t.shape[:-1] + (D,)
        mt = ((mask_t.reshape(-1, B)[..., None] & w8) > 0).reshape(mt_shape)
        if mt.ndim == 2:
            mt = jnp.broadcast_to(mt[None], (C, T, D))
        am = (a * mq).astype(jnp.bfloat16)
        bm = (b * mt).astype(jnp.bfloat16)
        sumq = jnp.sum(mq, axis=-1, dtype=jnp.float32)[..., None]      # [C, Q, 1]
        sumt = jnp.sum(mt, axis=-1, dtype=jnp.float32)[..., None]      # [C, T, 1]
        am = jnp.pad(am, ((0, 0), (0, Qp - Q), (0, 0)))
        bm = jnp.pad(bm, ((0, 0), (0, Tp - T), (0, 0)))
        sumq = jnp.pad(sumq, ((0, 0), (0, Qp - Q), (0, 0)))
        sumt = jnp.pad(sumt, ((0, 0), (0, Tp - T), (0, 0)))
    a = jnp.pad(a, ((0, 0), (0, Qp - Q), (0, 0)))
    b = jnp.pad(b, ((0, 0), (0, Tp - T), (0, 0)))
    uvq = jnp.pad(uv_q.astype(jnp.float32), ((0, 0), (0, Qp - Q), (0, 0)))
    octq = jnp.pad(oct_q.astype(jnp.float32)[..., None], ((0, 0), (0, Qp - Q), (0, 0)))
    if rad_q is None:
        rad_q = jnp.full((C, Q), 1e9, jnp.float32)
    # padded query rows disabled (rad -1) so they cannot poison col_best
    radq = jnp.pad(
        rad_q.astype(jnp.float32)[..., None], ((0, 0), (0, Qp - Q), (0, 0)),
        constant_values=-1.0,
    )
    uvt = jnp.pad(uv_t.astype(jnp.float32), ((0, 0), (0, Tp - T), (0, 0)))
    radt = jnp.pad(
        rad_t.astype(jnp.float32)[..., None], ((0, 0), (0, Tp - T), (0, 0)),
        constant_values=-1.0,
    )
    lvlt = jnp.pad(lvl_t.astype(jnp.float32)[..., None], ((0, 0), (0, Tp - T), (0, 0)))
    tol = jnp.asarray([[level_tol]], jnp.float32)

    def _merge(d, t, TT, best_ref, second_ref, idx_ref, colb_ref):
        t1 = jnp.min(d, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        is_min = d <= t1
        a1 = jnp.min(jnp.where(is_min, cols, TT), axis=1, keepdims=True)
        d_wo = jnp.where(cols == a1, BIG, d)
        t2 = jnp.min(d_wo, axis=1, keepdims=True)
        r1, r2, ri = best_ref[0], second_ref[0], idx_ref[0]
        new_r1 = jnp.minimum(r1, t1)
        new_r2 = jnp.minimum(jnp.maximum(r1, t1), jnp.minimum(r2, t2))
        new_ri = jnp.where(t1 < r1, a1 + t * TT, ri)
        best_ref[0] = new_r1
        second_ref[0] = new_r2
        idx_ref[0] = new_ri
        # per-target best over the query axis (each (c, t) tile written once)
        colb_ref[0] = jnp.min(d, axis=0, keepdims=True)

    def _init(t, best_ref, second_ref, idx_ref):
        @pl.when(t == 0)
        def _():
            best_ref[:] = jnp.full(best_ref.shape, BIG, jnp.float32)
            second_ref[:] = jnp.full(second_ref.shape, BIG, jnp.float32)
            idx_ref[:] = jnp.full(idx_ref.shape, -1, jnp.int32)

    def _window(uvq_ref, octq_ref, radq_ref, uvt_ref, radt_ref, lvlt_ref, tol_ref):
        du = jnp.abs(uvq_ref[0, :, 0:1] - uvt_ref[0, :, 0][None, :])
        dv = jnp.abs(uvq_ref[0, :, 1:2] - uvt_ref[0, :, 1][None, :])
        rad = jnp.minimum(radq_ref[0, :, 0:1], radt_ref[0, :, 0][None, :])
        dl = jnp.abs(octq_ref[0, :, 0:1] - lvlt_ref[0, :, 0][None, :])
        return (du <= rad) & (dv <= rad) & (dl <= tol_ref[0, 0])

    def kernel(a_ref, uvq_ref, octq_ref, radq_ref, b_ref, uvt_ref, radt_ref,
               lvlt_ref, tol_ref, best_ref, second_ref, idx_ref, colb_ref):
        # identical math to _match_kernel; blocks carry a leading camera dim
        t = pl.program_id(1)
        TT = b_ref.shape[1]
        nbits = jnp.float32(a_ref.shape[-1])
        _init(t, best_ref, second_ref, idx_ref)
        dot = jax.lax.dot_general(
            a_ref[0], b_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [Q, TT]
        ham = 0.5 * (nbits - dot)
        mask = _window(uvq_ref, octq_ref, radq_ref, uvt_ref, radt_ref, lvlt_ref, tol_ref)
        d = jnp.where(mask, ham, BIG)
        _merge(d, t, TT, best_ref, second_ref, idx_ref, colb_ref)

    def kernel_masked(a_ref, am_ref, sumq_ref, uvq_ref, octq_ref, radq_ref,
                      b_ref, bm_ref, sumt_ref, uvt_ref, radt_ref, lvlt_ref,
                      tol_ref, best_ref, second_ref, idx_ref, colb_ref):
        # mdBRIEF masked distance: two dots per tile
        #   popcount(x & mQ) = (|mQ| - (a*mQ).b)/2 ; d = (pcQ + pcT)/2
        t = pl.program_id(1)
        TT = b_ref.shape[1]
        _init(t, best_ref, second_ref, idx_ref)
        dn = (((1,), (1,)), ((), ()))
        dot1 = jax.lax.dot_general(am_ref[0], b_ref[0], dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        dot2 = jax.lax.dot_general(a_ref[0], bm_ref[0], dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        ham = 0.25 * (sumq_ref[0, :, 0:1] - dot1) + 0.25 * (
            sumt_ref[0, :, 0][None, :] - dot2
        )
        mask = _window(uvq_ref, octq_ref, radq_ref, uvt_ref, radt_ref, lvlt_ref, tol_ref)
        d = jnp.where(mask, ham, BIG)
        _merge(d, t, TT, best_ref, second_ref, idx_ref, colb_ref)

    grid = (C, Tp // tile_t)
    q_spec = lambda w: pl.BlockSpec((1, Qp, w), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
    t_spec = lambda w: pl.BlockSpec((1, tile_t, w), lambda c, t: (c, t, 0), memory_space=pltpu.VMEM)
    if masked:
        operands = (a, am, sumq, uvq, octq, radq, b, bm, sumt, uvt, radt, lvlt, tol)
        in_specs = [
            q_spec(D), q_spec(D), q_spec(1), q_spec(2), q_spec(1), q_spec(1),
            t_spec(D), t_spec(D), t_spec(1), t_spec(2), t_spec(1), t_spec(1),
            pl.BlockSpec((1, 1), lambda c, t: (0, 0), memory_space=pltpu.SMEM),
        ]
        body = kernel_masked
    else:
        operands = (a, uvq, octq, radq, b, uvt, radt, lvlt, tol)
        in_specs = [
            q_spec(D), q_spec(2), q_spec(1), q_spec(1),
            t_spec(D), t_spec(2), t_spec(1), t_spec(1),
            pl.BlockSpec((1, 1), lambda c, t: (0, 0), memory_space=pltpu.SMEM),
        ]
        body = kernel
    best, second, idx, col_best = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Qp, 1), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, 1), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, 1), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t), lambda c, t: (c, 0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, 1, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    best = best[:, :Q, 0]
    second = second[:, :Q, 0]
    idx = idx[:, :Q, 0]
    idx = jnp.where((idx >= 0) & (idx < T) & (best < BIG), idx, -1)
    return best, second, idx, col_best[:, 0, :T]


def masked_best_match_reference(
    desc_q, uv_q, oct_q, desc_t, uv_t, rad_t, lvl_t, rad_q=None, level_tol=1.0
):
    """jnp oracle with identical semantics (used off-TPU and in tests)."""
    a = unpack_pm1(desc_q)
    b = unpack_pm1(desc_t)
    nbits = a.shape[-1]
    ham = 0.5 * (nbits - jnp.dot(a, b.T, preferred_element_type=jnp.float32))
    if rad_q is None:
        rad_q = jnp.full((desc_q.shape[0],), 1e9, jnp.float32)
    rad = jnp.minimum(rad_q[:, None], rad_t[None, :])
    du = jnp.abs(uv_q[:, None, 0] - uv_t[None, :, 0])
    dv = jnp.abs(uv_q[:, None, 1] - uv_t[None, :, 1])
    dl = jnp.abs(oct_q.astype(jnp.float32)[:, None] - lvl_t.astype(jnp.float32)[None, :])
    mask = (du <= rad) & (dv <= rad) & (dl <= level_tol)
    d = jnp.where(mask, ham, BIG)
    best = jnp.min(d, axis=1)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    d2 = d.at[jnp.arange(d.shape[0]), idx].set(BIG)
    second = jnp.min(d2, axis=1)
    idx = jnp.where(best < BIG, idx, -1)
    return best, second, idx


def _on_tpu() -> bool:
    """True when the default device is TPU hardware. Checks the device, not
    the backend name: tunneled TPU plugins (e.g. the 'axon' platform) report
    a TPU device_kind under a non-'tpu' platform string."""
    try:
        d = jax.devices()[0]
        return (
            jax.default_backend() == "tpu"
            or "tpu" in getattr(d, "platform", "").lower()
            or "tpu" in getattr(d, "device_kind", "").lower()
        )
    except Exception:  # pragma: no cover
        return False


def use_pallas() -> bool:
    """Pallas path gate: real TPU backends by default. MCSLAM_PALLAS=1
    forces it on (interpret mode off-TPU, for integration tests);
    MCSLAM_PALLAS=0 forces the jnp path everywhere."""
    import os

    v = os.environ.get("MCSLAM_PALLAS", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return _on_tpu()
