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

PATCH = 9  # stamped texture patch size (odd)


def render_frame(world: SyntheticWorld, t: int, rng_seed: int = 1234) -> np.ndarray:
    """[C, H, W] uint8 images of the world at ground-truth pose t."""
    rig = world.rig
    C = rig.n_cams
    W, H = (int(x) for x in np.asarray(rig.cams.wh[0]))
    rng = np.random.default_rng(rng_seed)
    # per-landmark texture patches (deterministic across frames)
    textures = rng.integers(60, 255, size=(len(world.points), PATCH, PATCH)).astype(np.uint8)
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
