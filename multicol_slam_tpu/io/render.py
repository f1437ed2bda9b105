"""Synthetic image-sequence renderer: full-pixel-pipeline test datasets.

Renders the synthetic world (io/synthetic.py) into actual fisheye images —
each landmark is stamped as a small deterministic random-texture patch so
FAST finds corners and BRIEF descriptors are distinctive — and writes a
Lafida-layout dataset (images_and_timestamps.txt + the three calibration
YAML schemas), so the CLI runs on it exactly as it would on Lafida.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.io.synthetic import SyntheticWorld
from multicol_slam_tpu.models.camera import cam_world_to_img, in_mirror_mask
from multicol_slam_tpu.utils.geometry import cayley_to_hom

PATCH = 29  # stamped texture patch size (odd)


def _patch_window() -> np.ndarray:
    """Radial cosine falloff: patch edges fade into the background. A
    hard-edged stamp surrounds every landmark with identical dark-to-texture
    boundary corners — FAST fires on them at every pyramid level and their
    near-identical descriptors can never survive ratio/mutual matching,
    which starved triangulation of usable free features. Soft edges keep
    the distinctive interior texture corners only."""
    r = np.hypot(*np.meshgrid(*[np.arange(PATCH) - PATCH // 2] * 2, indexing="ij"))
    w = 0.5 * (1.0 + np.cos(np.clip(r / (PATCH / 2.0), 0, 1) * np.pi))
    return w


def render_frame(world: SyntheticWorld, t: int, rng_seed: int = 1234) -> np.ndarray:
    """[C, H, W] uint8 images of the world at ground-truth pose t."""
    rig = world.rig
    C = rig.n_cams
    W, H = (int(x) for x in np.asarray(rig.cams.wh[0]))
    rng = np.random.default_rng(rng_seed)
    # Per-landmark texture patches (deterministic across frames): ONE
    # dominant bright blob at the landmark center over low-contrast windowed
    # noise. The blob is the only structure clearing the FAST threshold, so
    # the detector finds exactly the landmark (repeatable by construction);
    # the surrounding noise feeds descriptor entropy without spawning
    # competing corners. (Full-noise patches were measured to make top-K
    # selection a per-frame lottery — every pixel a near-equal corner — so
    # two keyframes shared almost no re-detected free features and
    # triangulation starved.) Blob brightness varies per landmark so the
    # response ranking has stable structure.
    win = _patch_window()
    n_pts = len(world.points)
    # noise amplitude: strong enough to survive the descriptor pipeline's
    # 5-px pre-blur (so descriptors stay DISTINCT per landmark — at +-15 the
    # blob's common radial gradient dominated every descriptor and 90% of
    # features "matched" everything), weak enough that noise corners rank
    # far below the blobs in the detector's response ordering.
    noise = rng.integers(-12, 13, size=(n_pts, PATCH, PATCH)).astype(np.float64)
    yy, xx = np.meshgrid(*[np.arange(PATCH) - PATCH // 2] * 2, indexing="ij")
    r2 = (yy * yy + xx * xx)[None]
    blob_amp = rng.uniform(100.0, 210.0, size=(n_pts, 1, 1))
    blob = blob_amp * np.exp(-r2 / (2.0 * 1.8 ** 2))
    # a CONSTELLATION of satellite blobs at random per-landmark offsets:
    # their arrangement is the landmark's descriptor signature (structural
    # entropy — iid pixel noise either washes out under the descriptor
    # pre-blur or, at high amplitude, randomizes the intensity-centroid
    # moments so IC angles jitter and the rotation-consistency histogram
    # rejects ~2/3 of genuine matches), and their combined centroid offset
    # makes the IC angle stable and repeatable.
    N_SAT = 4
    sat = np.zeros_like(blob)
    for _ in range(N_SAT):
        theta = rng.uniform(0, 2 * np.pi, size=n_pts)
        sat_r = rng.uniform(3.5, 9.0, size=n_pts)
        sy, sx = sat_r * np.sin(theta), sat_r * np.cos(theta)
        sat_amp = blob_amp[:, 0, 0] * rng.uniform(0.3, 0.7, size=n_pts)
        sat += sat_amp[:, None, None] * np.exp(
            -((yy[None] - sy[:, None, None]) ** 2 + (xx[None] - sx[:, None, None]) ** 2)
            / (2.0 * 1.7 ** 2))
    raw = 60.0 + noise + blob + sat
    textures = np.clip(20 + (raw - 20) * win[None], 0, 255).astype(np.uint8)
    Mt = np.asarray(cayley_to_hom(jnp.asarray(world.poses[t], jnp.float32)))
    out = np.zeros((C, H, W), np.uint8)
    out[:] = 20  # dark background
    half = PATCH // 2
    for c in range(C):
        MtMc = Mt @ np.asarray(rig.Mc[c])
        Tinv = np.linalg.inv(MtMc)
        Xc = world.points @ Tinv[:3, :3].T + Tinv[:3, 3]
        uv = np.asarray(cam_world_to_img(rig.cams, c, jnp.asarray(Xc, jnp.float32)))
        ok = Xc[:, 2] > 0
        ok &= np.asarray(in_mirror_mask(rig.cams, c, jnp.asarray(uv, jnp.float32)))
        # honor the world's visibility budget: short-visibility drift worlds
        # (loop-closure benchmarks) must not leak far landmarks into pixels
        ok &= np.linalg.norm(Xc, axis=-1) < min(25.0, world.max_vis_dist)
        for i in np.nonzero(ok)[0]:
            u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
            if half <= u < W - half and half <= v < H - half:
                out[c, v - half : v + half + 1, u - half : u + half + 1] = textures[i]
    if world.noise_px > 0:
        # per-frame sensor noise (seeded by t: deterministic dataset, fresh
        # noise each frame): jitters detector localization by a fraction of
        # a pixel, the odometric random-walk source that makes long-run
        # drift realistic instead of machine-precision clean
        nrng = np.random.default_rng(rng_seed + 7919 * (t + 1))
        out = np.clip(
            out.astype(np.int16)
            + nrng.normal(0.0, 12.0 * world.noise_px, out.shape).astype(np.int16),
            0, 255).astype(np.uint8)
    return out


def _write_pgm(path: str, img: np.ndarray) -> None:
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(img.astype(np.uint8).tobytes())


def write_dataset(world: SyntheticWorld, out_dir: str, n_frames: Optional[int] = None) -> str:
    """Write images + images_and_timestamps.txt + the three YAML schemas.
    Returns the sequence directory (== calibration directory)."""
    os.makedirs(out_dir, exist_ok=True)
    rig = world.rig
    C = rig.n_cams
    T = n_frames or len(world.poses)
    lines = []
    for t in range(T):
        imgs = render_frame(world, t)
        names = []
        for c in range(C):
            name = f"cam{c}_{t:05d}.pgm"
            _write_pgm(os.path.join(out_dir, name), imgs[c])
            names.append(name)
        lines.append(f"{world.timestamps[t]:.6f} " + " ".join(names[:3]))
    with open(os.path.join(out_dir, "images_and_timestamps.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    write_calibration_yamls(world, out_dir)
    return out_dir


def write_calibration_yamls(world: SyntheticWorld, out_dir: str) -> None:
    """Emit the reference's three YAML schemas for the synthetic rig."""
    rig = world.rig
    C = rig.n_cams
    mc = np.asarray(rig.Mc_cayley)
    with open(os.path.join(out_dir, "MultiCamSys_Calibration.yaml"), "w") as f:
        f.write("%YAML:1.0\n\n")
        f.write(f"CameraSystem.nrCams: {C}\n")
        for c in range(C):
            for j in range(6):
                f.write(f"CameraSystem.cam{c + 1}_{j + 1}: {float(mc[c, j]):.12g}\n")
    for c in range(C):
        pol = np.asarray(rig.cams.pol[c])
        invpol = np.asarray(rig.cams.invpol[c])
        cde = np.asarray(rig.cams.cde[c])
        pp = np.asarray(rig.cams.pp[c])
        wh = np.asarray(rig.cams.wh[c])
        n_pol = max(int(np.max(np.nonzero(pol)[0], initial=0)) + 1, 2)
        n_inv = max(int(np.max(np.nonzero(invpol)[0], initial=0)) + 1, 2)
        with open(os.path.join(out_dir, f"InteriorOrientationFisheye{c}.yaml"), "w") as f:
            f.write("%YAML:1.0\n\n")
            f.write(f"Camera.Iw: {int(wh[0])}\nCamera.Ih: {int(wh[1])}\n")
            f.write(f"Camera.nrpol: {n_pol}\nCamera.nrinvpol: {n_inv}\n")
            for i in range(n_pol):
                f.write(f"Camera.a{i}: {float(pol[i]):.12g}\n")
            for i in range(n_inv):
                f.write(f"Camera.pol{i}: {float(invpol[i]):.12g}\n")
            f.write(f"Camera.c: {float(cde[0]):.12g}\nCamera.d: {float(cde[1]):.12g}\nCamera.e: {float(cde[2]):.12g}\n")
            f.write(f"Camera.u0: {float(pp[0]):.12g}\nCamera.v0: {float(pp[1]):.12g}\n")
            f.write("Camera.mirrorMask: 1\n")
    with open(os.path.join(out_dir, "Slam_Settings_synthetic.yaml"), "w") as f:
        f.write("%YAML:1.0\n\n")
        f.write("Camera.fps: 25.0\nCamera.RGB: 0\n")
        f.write("extractor.usemdBRIEF: 0\nextractor.masks: 0\nextractor.useAgast: 0\n")
        f.write("extractor.fastAgastType: 2\nextractor.descSize: 32\n")
        f.write(f"extractor.nFeatures: {world.n_feats}\n")
        f.write("extractor.scaleFactor: 1.2\nextractor.nLevels: 2\nextractor.fastTh: 20\n")
        f.write("extractor.nScoreType: 0\nUseMotionModel: 1\n")
        f.write(f"traj.StartFrame: 1\ntraj.EndFrame: {len(world.poses) + 1}\n")
