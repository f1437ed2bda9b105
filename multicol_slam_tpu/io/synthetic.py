"""Synthetic multi-camera world generator (test oracle + benchmarks).

Generates a known trajectory + 3-D landmarks with stable binary descriptors
and synthesizes per-frame FrameFeatures by projecting through the full rig
model — exercising everything downstream of pixel-level extraction
(SURVEY.md §4e: 'miniature synthetic rig sequence (known trajectory)
end-to-end ATE ~ 0').
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.models.camera import OmniCamera, in_mirror_mask
from multicol_slam_tpu.models.rig import MultiCamRig
from multicol_slam_tpu.slam.features import FrameFeatures
from multicol_slam_tpu.utils.geometry import cayley_to_hom, hom_inverse, hom_to_cayley


def make_synthetic_rig(n_cams: int = 3, w: int = 256, h: int = 192) -> MultiCamRig:
    """Mild-fisheye rig with cameras offset/rotated from the body frame.
    The inverse polynomial is FIT from the forward one (self-consistent
    projection round trip — see camera.fit_inverse_poly)."""
    from multicol_slam_tpu.models.camera import fit_inverse_poly

    # z(rho) = 60 - rho^2/60: horizon (theta=0) at rho=60 px, FOV ~145 deg —
    # the whole landmark ring around the rig stays inside the mirror circle
    pol = [-60.0, 0.0, 1.0 / 60.0, 0.0, 0.0]
    invpol = fit_inverse_poly(pol, rho_max=0.95 * (h / 2.0 + 22.0))
    cams = OmniCamera.from_params(
        [pol] * n_cams,
        [list(invpol)] * n_cams,
        [[1.0, 0.0, 0.0]] * n_cams,
        [[w / 2.0, h / 2.0]] * n_cams,
        [[w, h]] * n_cams,
    )
    mc = np.zeros((n_cams, 6), np.float32)
    for c in range(n_cams):
        ang = 2.0 * np.pi * c / max(n_cams, 1)
        mc[c, :3] = [0.0, 0.15 * np.sin(ang), 0.1 * np.cos(ang)]  # mild rotations
        mc[c, 3:] = [0.15 * np.cos(ang), 0.15 * np.sin(ang), 0.0]
    return MultiCamRig.from_cayley(cams, mc)


@dataclasses.dataclass
class SyntheticWorld:
    rig: MultiCamRig
    points: np.ndarray          # [P, 3]
    descs: np.ndarray           # [P, B]
    poses: np.ndarray           # [T, 6] ground-truth body poses (M_t cayley)
    timestamps: np.ndarray      # [T]
    n_feats: int
    noise_px: float
    seed: int
    # visibility range: landmarks farther than this from the camera are not
    # observed (25 = the reference's distance gate; smaller values create
    # genuine loop structure where places leave view and reappear)
    max_vis_dist: float = 25.0

    def frame_features(self, t: int) -> FrameFeatures:
        return synthesize_features(
            self.rig, self.points, self.descs, self.poses[t], self.n_feats,
            noise_px=self.noise_px, seed=self.seed * 100003 + t,
            max_vis_dist=self.max_vis_dist,
        )


def make_world(
    n_points: int = 800,
    n_frames: int = 60,
    n_cams: int = 3,
    n_feats: int = 200,
    noise_px: float = 0.3,
    trajectory: str = "circle",
    radius: float = 4.0,
    seed: int = 0,
    period: Optional[int] = None,
    max_vis_dist: float = 25.0,
    landmarks: str = "ring",
    rig: Optional[MultiCamRig] = None,
) -> SyntheticWorld:
    """`period`: frames per lap for circular trajectories (defaults to
    n_frames = exactly one lap; smaller values revisit the start).
    `rig`: use this rig instead of the default mild-fisheye synthetic one —
    e.g. the REAL Lafida helmet rig loaded with utils.config.load_rig, so the
    real 754x480 polynomials / cde skew / mirror geometry are exercised.
    `landmarks='room'`: walls + ceiling layout for rigs with upward-looking
    cameras (the Lafida helmet's cam2 looks along body +z)."""
    rng = np.random.default_rng(seed)
    if rig is None:
        rig = make_synthetic_rig(n_cams)
    ang = rng.uniform(0, 2 * np.pi, n_points)
    if landmarks == "room":
        # indoor room around the trajectory: cylindrical wall band plus a
        # ceiling disk — every camera of an arbitrarily-oriented helmet rig
        # (incl. straight-up) sees texture from everywhere on the path
        n_wall = (2 * n_points) // 3
        rr = radius + rng.uniform(1.5, 4.0, n_wall)
        zw = rng.uniform(-1.0, 2.5, n_wall)
        wall = np.stack(
            [-radius + rr * np.cos(ang[:n_wall]), rr * np.sin(ang[:n_wall]), zw], -1
        )
        n_ceil = n_points - n_wall
        rc = np.sqrt(rng.uniform(0.0, 1.0, n_ceil)) * (radius + 4.0)
        ac = ang[n_wall:]
        zc = rng.uniform(2.5, 4.0, n_ceil)
        ceil = np.stack([-radius + rc * np.cos(ac), rc * np.sin(ac), zc], -1)
        points = np.concatenate([wall, ceil]).astype(np.float32)
    elif landmarks == "corridor":
        # landmarks lining a straight corridor along +x (matches the 'line' /
        # 'outback' trajectories): with a short max_vis_dist the feature set
        # turns over constantly — the long-run map-GROWTH profile (the
        # reference's unbounded map, culling as the only control,
        # cLocalMapping.cpp:520-597)
        Lx = 0.05 * n_frames * (0.5 if trajectory == "outback" else 1.0)
        x = rng.uniform(-2.0, Lx + 2.0, n_points)
        side = rng.choice([-1.0, 1.0], n_points)
        y = side * rng.uniform(1.0, 2.5, n_points)
        z = rng.uniform(-1.0, 2.0, n_points)
        points = np.stack([x, y, z], -1).astype(np.float32)
    elif landmarks == "pathroom":
        # 'path' drift profile (landmarks hugging the circular path, so with
        # a short max_vis_dist places leave view and reappear) but with a
        # ceiling strip above the path: an arbitrarily-oriented helmet rig
        # (the real Lafida cam2 looks along body +z) sees texture everywhere
        n_wall = (3 * n_points) // 4
        rr = radius + rng.uniform(1.0, 3.0, n_wall)
        zw = rng.uniform(-1.0, 2.0, n_wall)
        wall = np.stack(
            [-radius + rr * np.cos(ang[:n_wall]), rr * np.sin(ang[:n_wall]), zw], -1
        )
        n_ceil = n_points - n_wall
        rc = radius + rng.uniform(-1.5, 1.5, n_ceil)
        ac = ang[n_wall:]
        zc = rng.uniform(2.2, 3.2, n_ceil)
        ceil = np.stack([-radius + rc * np.cos(ac), rc * np.sin(ac), zc], -1)
        points = np.concatenate([wall, ceil]).astype(np.float32)
    elif landmarks == "path":
        # landmarks hugging the circular PATH (center (-radius, 0)): combined
        # with a short max_vis_dist, each frame sees only a local arc — places
        # leave view and reappear, the precondition for loop-closure tests
        rr = radius + rng.uniform(1.0, 3.0, n_points)
        z = rng.uniform(-1.0, 1.0, n_points)
        points = np.stack(
            [-radius + rr * np.cos(ang), rr * np.sin(ang), z], -1
        ).astype(np.float32)
    else:
        # landmarks in a ring around the origin (visible from everywhere)
        rad = rng.uniform(radius + 2.0, radius + 8.0, n_points)
        z = rng.uniform(-3.0, 3.0, n_points)
        points = np.stack([rad * np.cos(ang), rad * np.sin(ang), z], -1).astype(np.float32)
    descs = rng.integers(0, 256, size=(n_points, 32), dtype=np.uint8)
    poses = np.zeros((n_frames, 6), np.float32)
    per = period or n_frames
    for t in range(n_frames):
        if trajectory == "circle":
            th = 2.0 * np.pi * t / per
            poses[t, 3] = radius * np.cos(th) - radius
            poses[t, 4] = radius * np.sin(th)
            poses[t, 2] = np.tan(th / 2.0) if abs(th) < 3.0 else 0.0  # cayley yaw ~ tan(theta/2)
        elif trajectory == "circle_noyaw":
            # translate around the circle with fixed body orientation — no
            # Cayley singularity at theta=pi, ideal for multi-lap loop tests
            th = 2.0 * np.pi * t / per
            poses[t, 3] = radius * np.cos(th) - radius
            poses[t, 4] = radius * np.sin(th)
        elif trajectory == "line":
            poses[t, 3] = 0.05 * t
            poses[t, 0] = 0.001 * t
        elif trajectory == "outback":
            # out along +x for half the frames, then back over the same
            # corridor (no rotation): the return leg revisits every earlier
            # place with accumulated drift — loop closures fire over a LARGE
            # keyframe graph (the in-vivo essential-graph-at-scale scenario)
            half = n_frames // 2
            u = t if t < half else (2 * half - t)
            poses[t, 3] = 0.05 * u
        else:
            raise ValueError(trajectory)
    timestamps = np.arange(n_frames) / 25.0
    return SyntheticWorld(
        rig, points, descs, poses, timestamps, n_feats, noise_px, seed,
        max_vis_dist,
    )


def synthesize_features(
    rig: MultiCamRig,
    points: np.ndarray,
    descs: np.ndarray,
    pose6: np.ndarray,
    n_feats: int,
    noise_px: float = 0.3,
    desc_flip_bits: int = 2,
    seed: int = 0,
    max_vis_dist: float = 25.0,
) -> FrameFeatures:
    """Project landmarks into all cameras at the given body pose and emit a
    padded FrameFeatures with noisy pixels + lightly-corrupted descriptors."""
    rng = np.random.default_rng(seed)
    C = rig.n_cams
    B = descs.shape[1]
    Mt = np.asarray(cayley_to_hom(jnp.asarray(pose6, jnp.float32)))
    uv_list, ray_list, desc_list, valid_list = [], [], [], []
    from multicol_slam_tpu.models.camera import cam_img_to_world, cam_world_to_img

    for c in range(C):
        MtMc = Mt @ np.asarray(rig.Mc[c])
        Tinv = np.linalg.inv(MtMc)
        Xc = points @ Tinv[:3, :3].T + Tinv[:3, 3]
        uv = np.asarray(cam_world_to_img(rig.cams, c, jnp.asarray(Xc, jnp.float32)))
        ok = Xc[:, 2] > 0
        ok &= np.asarray(in_mirror_mask(rig.cams, c, jnp.asarray(uv, jnp.float32)))
        ok &= np.linalg.norm(Xc, axis=-1) < max_vis_dist
        idx = np.nonzero(ok)[0]
        rng.shuffle(idx)
        idx = idx[:n_feats]
        n = len(idx)
        uv_sel = uv[idx] + rng.normal(0, noise_px, (n, 2))
        d_sel = descs[idx].copy()
        # flip a couple of random bits per descriptor (matching noise)
        for _ in range(desc_flip_bits):
            byte = rng.integers(0, B, n)
            bit = rng.integers(0, 8, n).astype(np.uint8)
            d_sel[np.arange(n), byte] ^= (1 << bit).astype(np.uint8)
        pad = n_feats - n
        uv_p = np.pad(uv_sel, ((0, pad), (0, 0))).astype(np.float32)
        rays = np.asarray(cam_img_to_world(rig.cams, c, jnp.asarray(uv_p, jnp.float32)))
        uv_list.append(uv_p)
        ray_list.append(rays)
        desc_list.append(np.pad(d_sel, ((0, pad), (0, 0))))
        valid_list.append(np.pad(np.ones(n, bool), (0, pad)))
    K = n_feats
    return FrameFeatures(
        uv=jnp.asarray(np.stack(uv_list)),
        response=jnp.ones((C, K), jnp.float32),
        octave=jnp.zeros((C, K), jnp.int32),
        angle=jnp.zeros((C, K), jnp.float32),
        rays=jnp.asarray(np.stack(ray_list), jnp.float32),
        desc=jnp.asarray(np.stack(desc_list), jnp.uint8),
        dmask=jnp.full((C, K, descs.shape[1]), 255, jnp.uint8),
        valid=jnp.asarray(np.stack(valid_list)),
    )
