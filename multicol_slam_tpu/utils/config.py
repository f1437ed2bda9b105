"""Config loading for the three reference YAML schemas (SURVEY.md §5 "Config").

Keeps the exact key names so the Lafida assets under
`/root/reference/Examples/Lafida/` are directly usable:
  1. SLAM settings      (Slam_Settings_indoor*.yaml, parsed cTracking.cpp:87-173)
  2. Rig calibration    (MultiCamSys_Calibration.yaml, parsed cSystem.cpp:129-143)
  3. Per-cam intrinsics (InteriorOrientationFisheye{c}.yaml, cSystem.cpp:146-172)

The files are OpenCV FileStorage YAML ("%YAML:1.0" directive, which pyyaml
rejects) — `load_opencv_yaml` strips the directive line.
"""
from __future__ import annotations

import dataclasses
import os
import re
from typing import Dict, List, Optional

import numpy as np
import yaml


def load_opencv_yaml(path: str) -> Dict:
    with open(path, "r") as f:
        text = f.read()
    lines = []
    for ln in text.splitlines():
        if ln.lstrip().startswith("%YAML"):
            continue
        # OpenCV FileStorage permits "key:value" (no space); pyyaml does not.
        lines.append(re.sub(r"^(\s*[\w.]+):(?=\S)", r"\1: ", ln))
    return yaml.safe_load("\n".join(lines)) or {}


@dataclasses.dataclass(frozen=True)
class ExtractorSettings:
    """Feature-extractor knobs (Slam_Settings_*.yaml `extractor.*` block)."""

    use_mdbrief: int = 0        # 0 -> ORB, 1 -> dBRIEF/mdBRIEF path
    learn_masks: int = 0        # mdBRIEF online stability masks
    use_agast: int = 0
    fast_agast_type: int = 2
    desc_size: int = 32         # descriptor bytes: 16/32/64
    n_features: int = 400
    scale_factor: float = 1.2
    n_levels: int = 8
    fast_th: int = 20
    score_type: int = 0         # 0 Harris, 1 FAST


@dataclasses.dataclass(frozen=True)
class SlamSettings:
    fps: float = 25.0
    rgb: int = 1
    use_motion_model: bool = True
    extractor: ExtractorSettings = dataclasses.field(default_factory=ExtractorSettings)
    traj_start_frame: int = 0
    traj_end_frame: int = -1
    # Derived keyframe-cadence constants (cTracking.cpp:93-94)
    @property
    def min_frames(self) -> int:
        return int(round(self.fps / 3.0))

    @property
    def max_frames(self) -> int:
        return int(round(2.0 * self.fps / 3.0))


def load_slam_settings(path: str) -> SlamSettings:
    d = load_opencv_yaml(path)
    ex = ExtractorSettings(
        use_mdbrief=int(d.get("extractor.usemdBRIEF", 0)),
        learn_masks=int(d.get("extractor.masks", 0)),
        use_agast=int(d.get("extractor.useAgast", 0)),
        fast_agast_type=int(d.get("extractor.fastAgastType", 2)),
        desc_size=int(d.get("extractor.descSize", 32)),
        n_features=int(d.get("extractor.nFeatures", 400)),
        scale_factor=float(d.get("extractor.scaleFactor", 1.2)),
        n_levels=int(d.get("extractor.nLevels", 8)),
        fast_th=int(d.get("extractor.fastTh", 20)),
        score_type=int(d.get("extractor.nScoreType", 0)),
    )
    return SlamSettings(
        fps=float(d.get("Camera.fps", 25.0)),
        rgb=int(d.get("Camera.RGB", 1)),
        use_motion_model=bool(d.get("UseMotionModel", 1)),
        extractor=ex,
        traj_start_frame=int(d.get("traj.StartFrame", 0)),
        traj_end_frame=int(d.get("traj.EndFrame", -1)),
    )


def load_rig_calibration(path: str) -> np.ndarray:
    """MultiCamSys_Calibration.yaml -> [C, 6] Cayley+t extrinsics M_c
    (cSystem.cpp:129-143: keys CameraSystem.cam{i}_{1..6}, i is 1-based)."""
    d = load_opencv_yaml(path)
    n = int(d["CameraSystem.nrCams"])
    out = np.zeros((n, 6), np.float64)
    for i in range(n):
        for j in range(6):
            out[i, j] = float(d[f"CameraSystem.cam{i + 1}_{j + 1}"])
    return out


@dataclasses.dataclass(frozen=True)
class IntrinsicsConfig:
    width: int
    height: int
    pol: List[float]          # forward poly a0..a{nrpol-1}
    invpol: List[float]       # inverse poly pol0..pol{nrinvpol-1}
    cde: List[float]          # affine c, d, e
    pp: List[float]           # principal point u0, v0
    mirror_mask: bool = True


def load_intrinsics(path: str) -> IntrinsicsConfig:
    d = load_opencv_yaml(path)
    nrpol = int(d["Camera.nrpol"])
    nrinvpol = int(d["Camera.nrinvpol"])
    return IntrinsicsConfig(
        width=int(d["Camera.Iw"]),
        height=int(d["Camera.Ih"]),
        pol=[float(d[f"Camera.a{i}"]) for i in range(nrpol)],
        invpol=[float(d[f"Camera.pol{i}"]) for i in range(nrinvpol)],
        cde=[float(d["Camera.c"]), float(d["Camera.d"]), float(d["Camera.e"])],
        pp=[float(d["Camera.u0"]), float(d["Camera.v0"])],
        mirror_mask=bool(d.get("Camera.mirrorMask", 1)),
    )


def load_rig(calib_dir: str, n_cams: Optional[int] = None):
    """Load a full rig from a calibration directory laid out like
    Examples/Lafida/: MultiCamSys_Calibration.yaml +
    InteriorOrientationFisheye{c}.yaml. Returns a MultiCamRig."""
    from multicol_slam_tpu.models.camera import OmniCamera
    from multicol_slam_tpu.models.rig import MultiCamRig

    mc = load_rig_calibration(os.path.join(calib_dir, "MultiCamSys_Calibration.yaml"))
    if n_cams is not None:
        mc = mc[:n_cams]
    intr = [
        load_intrinsics(os.path.join(calib_dir, f"InteriorOrientationFisheye{c}.yaml"))
        for c in range(mc.shape[0])
    ]
    cams = OmniCamera.from_params(
        [i.pol for i in intr],
        [i.invpol for i in intr],
        [i.cde for i in intr],
        [i.pp for i in intr],
        [[i.width, i.height] for i in intr],
    )
    return MultiCamRig.from_cayley(cams, np.asarray(mc))
