"""Per-frame multi-camera feature extraction (the cMultiFrame front half).

Replaces `mdBRIEFextractorOct::operator()` (/root/reference/src/
mdBRIEFextractorOct.cpp:1244-1337) + the per-camera OpenMP loop in the
cMultiFrame ctor (cMultiFrame.cpp:92-184). The whole rig is ONE jitted
program: pyramids, dense FAST, Harris scoring, grid top-K, IC angles, and
descriptors for all cameras and all levels execute as a single XLA graph on
device — the camera axis is a tensor dimension, not a thread.

Output is a fixed-capacity `FrameFeatures` pytree: K = n_features slots per
camera, with a validity mask (padding discipline per SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import OmniCamera, img_to_world, in_mirror_mask
from multicol_slam_tpu.models.rig import MultiCamRig
from multicol_slam_tpu.ops import fast as fast_ops
from multicol_slam_tpu.ops import image as image_ops
from multicol_slam_tpu.ops import brief as brief_ops
from multicol_slam_tpu.utils.config import ExtractorSettings

EDGE_BORDER = 19  # EDGE_THRESHOLD-ish detection border (keypoint patch safety)

# Version stamp of the descriptor pipeline, persisted in map checkpoints:
# descriptors extracted under a different version are NOT bit-compatible
# with a saved map (degraded relocalization on --load-map). Bump whenever
# the extraction math changes observable descriptor bits.
#   v1: IC angles from the raw pyramid level
#   v2: IC angles + descriptors both from the blurred level (shared patches)
DESC_PIPELINE_VERSION = 2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FrameFeatures:
    """All features of one multi-camera frame, padded to [C, K].

    uv       [C, K, 2] f32  level-0 pixel coords
    response [C, K]    f32
    octave   [C, K]    i32  pyramid level
    angle    [C, K]    f32  radians
    rays     [C, K, 3] f32  unit rays (mvKeysRays, cMultiFrame.h:92-95)
    desc     [C, K, B] u8   binary descriptors
    dmask    [C, K, B] u8   mdBRIEF stability masks (0xFF when unused)
    valid    [C, K]    bool
    """

    uv: jnp.ndarray
    response: jnp.ndarray
    octave: jnp.ndarray
    angle: jnp.ndarray
    rays: jnp.ndarray
    desc: jnp.ndarray
    dmask: jnp.ndarray
    valid: jnp.ndarray

    def tree_flatten(self):
        return (
            (self.uv, self.response, self.octave, self.angle, self.rays, self.desc, self.dmask, self.valid),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_cams(self):
        return self.uv.shape[0]

    @property
    def k(self):
        return self.uv.shape[1]


def _extract_level(
    level_img: jnp.ndarray,
    blurred: jnp.ndarray,
    cams: OmniCamera,
    settings: ExtractorSettings,
    level: int,
    quota: int,
    fast_th: float,
):
    """Detect + describe on one pyramid level for all cameras.

    level_img [C, h, w] raw; blurred [C, h, w] box-filtered (descriptors are
    sampled from the blurred image, detection from the raw one —
    mdBRIEFextractorOct.cpp:1301 order). Returns per-level padded outputs
    [C, quota, ...].
    """
    C, h, w = level_img.shape
    # Ranking score is the FAST response at every score_type: the reference's
    # live octree path keeps FAST response too — its HarrisResponses is dead
    # code (defined mdBRIEFextractorOct.cpp:88, called only from the disabled
    # ComputeKeyPointsOld; operator() at :1262 uses ComputeKeyPointsOctTree).
    # Dense per-level Harris would cost ~8 full-image convolutions per level
    # for a ranking the reference never computes.
    is_corner, score = fast_ops.fast_corners(
        level_img, fast_th, pattern=settings.fast_agast_type if settings.use_agast else 2
    )
    score = jnp.where(is_corner, score, -jnp.inf)
    # NMS on the detection score
    nms = score >= image_ops.max_pool_3x3(score)
    bmask = fast_ops.border_mask(h, w, EDGE_BORDER)[None]
    # mirror mask at this level: the level-0 circle scaled by the pyramid
    # scale (mdBRIEFextractorOct.cpp:1182 INTER_NEAREST mask resize)
    from multicol_slam_tpu.models.camera import mirror_mask_grid

    mmask = mirror_mask_grid(cams, h, w, scale=settings.scale_factor ** (-level))
    valid = nms & bmask & mmask & jnp.isfinite(score)
    uv_l, resp, ok = fast_ops.select_topk_grid(score, valid, quota)
    # ONE patch gather per keypoint (from the blurred level, which the
    # descriptors sample anyway) feeds both the IC-angle moments and the
    # descriptor one-hot sampler — patch gathers are the expensive TPU
    # primitive here, so they are never repeated. (Deviation from the
    # reference, which computes IC_Angle on the raw level: a 5x5 box blur
    # barely moves the intensity centroid, and descriptors/angles only need
    # to be self-consistent within this framework.)
    patches, r0, c0 = jax.vmap(brief_ops.gather_sample_patches)(blurred, uv_l)
    ang = jax.vmap(brief_ops.ic_angles_from_patches)(patches, uv_l, r0, c0)

    # descriptors per camera (vmap over the camera axis)
    def per_cam(patches_c, r0_c, c0_c, uv_c, ang_c, pol, invpol, cde, pp):
        if settings.use_mdbrief:
            scale = settings.scale_factor ** level
            a0 = pol[0]
            undist = brief_ops.undistort_keypoints(pol, cde, pp, a0, uv_c.astype(jnp.float32) * scale)
            desc, dmask = brief_ops.compute_dbrief_from_patches(
                patches_c, uv_c, r0_c, c0_c, undist, ang_c, invpol, cde, pp, a0,
                settings.desc_size, bool(settings.learn_masks),
            )
        else:
            desc = brief_ops.compute_orb_from_patches(
                patches_c, uv_c, r0_c, c0_c, ang_c, settings.desc_size
            )
            dmask = jnp.full(desc.shape, 255, jnp.uint8)
        return desc, dmask

    desc, dmask = jax.vmap(per_cam)(
        patches, r0, c0, uv_l, ang, cams.pol, cams.invpol, cams.cde, cams.pp
    )
    scale = settings.scale_factor ** level
    uv0 = uv_l.astype(jnp.float32) * scale
    octave = jnp.full(resp.shape, level, jnp.int32)
    return uv0, resp, octave, ang, desc, dmask, ok


def extract_features(
    images: jnp.ndarray,
    cams: OmniCamera,
    settings: ExtractorSettings,
    n_features: Optional[int] = None,
    fast_th: Optional[float] = None,
) -> FrameFeatures:
    """Full multi-camera extraction. images [C, H, W] float32 in [0, 255].

    Pure function of its inputs — wrap in jax.jit (shapes are static per
    (H, W, settings)). K slots = n_features (or the init-mode override,
    cTracking.cpp:152-158 doubles features at init with fast_th=5).
    """
    n_feats = int(n_features or settings.n_features)
    th = float(fast_th if fast_th is not None else settings.fast_th)
    # accept uint8 frames and cast ON DEVICE: hosts should upload camera
    # images in their native 1-byte depth (a f32 host cast quadruples the
    # host->device transfer — ~4.3 MB/frame at Lafida shape, the dominant
    # per-frame cost on a bandwidth-limited link)
    images = images.astype(jnp.float32)
    C, H, W = images.shape
    pyr = image_ops.build_pyramid(images, settings.n_levels, settings.scale_factor)
    quotas = fast_ops.level_quota(n_feats, settings.n_levels, settings.scale_factor)
    outs = []
    for lvl, img_l in enumerate(pyr):
        blurred = image_ops.box_filter(img_l, 5)
        outs.append(
            _extract_level(img_l, blurred, cams, settings, lvl, int(quotas[lvl]), th)
        )
    uv = jnp.concatenate([o[0] for o in outs], axis=1)
    resp = jnp.concatenate([o[1] for o in outs], axis=1)
    octave = jnp.concatenate([o[2] for o in outs], axis=1)
    ang = jnp.concatenate([o[3] for o in outs], axis=1)
    desc = jnp.concatenate([o[4] for o in outs], axis=1)
    dmask = jnp.concatenate([o[5] for o in outs], axis=1)
    ok = jnp.concatenate([o[6] for o in outs], axis=1)
    # unit rays in each camera frame (cMultiFrame.cpp:138-158)
    cam_ids = jnp.arange(C)[:, None]
    rays = img_to_world(cams.pol[cam_ids], cams.cde[cam_ids], cams.pp[cam_ids], uv)
    return FrameFeatures(uv, resp, octave, ang, rays, desc, dmask, ok)


@functools.partial(jax.jit, static_argnames=("settings", "n_features", "fast_th"))
def extract_features_jit(images, cams, settings, n_features=None, fast_th=None):
    return extract_features(images, cams, settings, n_features, fast_th)


def downselect_features(feats: FrameFeatures, K: int,
                        keep: Optional[np.ndarray] = None,
                        quotas: Optional[np.ndarray] = None):
    """Reduce a [C, K2] FrameFeatures (the init-mode extractor bank doubles
    features, cTracking.cpp:152-158) to the runtime [C, K] capacity the map
    store and tracking programs are shaped for.

    Per camera, rows flagged in `keep` (FLAT indices c*K2 + i — e.g. the
    initializer's triangulated features) win slots first; the rest fill by
    detector response. `quotas` (per-pyramid-level slot budgets, summing to
    <= K — pass ops.fast.level_quota of the RUNTIME bank) preserves the
    extractor's level distribution: a pure response ordering measurably
    starves the coarse levels (level-0 corners score higher), which guts
    scale-band matching as the camera moves. Host-side numpy — runs once per
    initialization event, never per frame. Returns (FrameFeatures [C, K],
    remap [C*K2] -> flat [C*K] index or -1)."""
    C, K2 = int(feats.uv.shape[0]), int(feats.uv.shape[1])
    fields = {
        name: np.asarray(getattr(feats, name))
        for name in ("uv", "response", "octave", "angle", "rays", "desc", "dmask", "valid")
    }
    keep_mask = np.zeros((C, K2), bool)
    if keep is not None and len(keep):
        keep = np.asarray(keep, np.int64)
        keep_mask[keep // K2, keep % K2] = True
    out = {name: np.zeros((C, K) + a.shape[2:], a.dtype) for name, a in fields.items()}
    out["dmask"][:] = 255
    remap = np.full(C * K2, -1, np.int64)
    for c in range(C):
        prio = np.where(fields["valid"][c], fields["response"][c], -np.inf)
        prio = np.where(keep_mask[c], prio + 1e9, prio)
        if quotas is not None:
            octv = fields["octave"][c]
            chosen: list = []
            taken = np.zeros(K2, bool)
            for lvl, q in enumerate(np.asarray(quotas, np.int64)):
                cand = np.nonzero((octv == lvl) & np.isfinite(prio))[0]
                cand = cand[np.argsort(-prio[cand], kind="stable")][:q]
                chosen.append(cand)
                taken[cand] = True
            # leftover capacity fills globally by priority
            rest = np.nonzero(~taken & np.isfinite(prio))[0]
            room = K - sum(len(x) for x in chosen)
            if room > 0 and len(rest):
                rest = rest[np.argsort(-prio[rest], kind="stable")][:room]
                chosen.append(rest)
            order = np.concatenate(chosen)[:K] if chosen else np.empty(0, np.int64)
        else:
            order = np.argsort(-prio, kind="stable")[:K]
            order = order[np.isfinite(prio[order])]
        n = len(order)
        for name, a in fields.items():
            out[name][c, :n] = a[c][order]
        out["valid"][c, n:] = False
        remap[c * K2 + order] = c * K + np.arange(n)
    return FrameFeatures(**{k: jnp.asarray(v) for k, v in out.items()}), remap
