import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multicol_slam_tpu.models.camera import (
    OmniCamera,
    cam_img_to_world,
    cam_world_to_img,
    img_to_world,
    in_mirror_mask,
    mirror_mask_raster,
    rig_img_to_world,
    rig_world_to_img,
    world_to_img,
)
from multicol_slam_tpu.models.rig import MultiCamRig, camera_centers, project_mcs
from multicol_slam_tpu.utils.config import load_rig, load_slam_settings
from multicol_slam_tpu.utils.geometry import cayley_to_hom

CALIB_DIR = "/root/reference/Examples/Lafida"
HAS_CALIB = os.path.isdir(CALIB_DIR)

RNG = np.random.default_rng(1)


@pytest.fixture(scope="module")
def rig():
    if not HAS_CALIB:
        pytest.skip("reference calibration not available")
    return load_rig(CALIB_DIR)


def test_load_rig_shapes(rig):
    assert rig.n_cams == 3
    assert rig.Mc.shape == (3, 4, 4)
    assert rig.cams.pol.shape[0] == 3
    # cam3 in the YAML (index 2 here) has identity rotation
    np.testing.assert_allclose(rig.Mc[2, :3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(rig.Mc[2, :3, 3], [-0.00157612288268783, 0.103615531247527, 0.201416323496156], rtol=1e-5)


def test_unproject_project_roundtrip(rig):
    """WorldToImg(ImgToWorld(uv)) ~ uv for pixels inside the mirror mask
    (cam_model_omni.cpp round-trip; SURVEY.md §4a)."""
    cams = rig.cams
    for c in range(3):
        u0, v0 = np.asarray(cams.pp[c])
        # sample pixels well inside the mirror circle
        ang = RNG.uniform(0, 2 * np.pi, 200)
        rad = RNG.uniform(0, 0.7 * v0, 200)
        uv = jnp.asarray(
            np.stack([u0 + rad * np.cos(ang), v0 + rad * np.sin(ang)], -1), jnp.float32
        )
        rays = cam_img_to_world(cams, c, uv)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rays), axis=-1), 1.0, atol=1e-5)
        # rays point "in front" for the omni model: z positive (a0 < 0)
        assert np.mean(np.asarray(rays)[:, 2] > 0) > 0.95
        uv2 = cam_world_to_img(cams, c, rays)
        err = np.abs(np.asarray(uv2) - np.asarray(uv))
        assert np.percentile(err, 95) < 0.35, f"cam {c}: p95 err {np.percentile(err, 95)}"


def test_project_scale_invariant(rig):
    """Projection depends only on ray direction (omni model)."""
    cams = rig.cams
    ray = jnp.asarray([[0.2, -0.1, 0.97]], jnp.float32)
    uv1 = cam_world_to_img(cams, 0, ray)
    uv2 = cam_world_to_img(cams, 0, 7.5 * ray)
    np.testing.assert_allclose(uv1, uv2, atol=1e-3)


def test_rig_batched_matches_percam(rig):
    cams = rig.cams
    uv = jnp.asarray(RNG.uniform(100, 380, size=(3, 17, 2)), jnp.float32)
    rays_batched = rig_img_to_world(cams, uv)
    for c in range(3):
        rays_c = cam_img_to_world(cams, c, uv[c])
        np.testing.assert_allclose(rays_batched[c], rays_c, atol=1e-6)
    uv_b = rig_world_to_img(cams, rays_batched)
    for c in range(3):
        np.testing.assert_allclose(uv_b[c], cam_world_to_img(cams, c, rays_batched[c]), atol=1e-5)


def test_project_mcs_cheirality_and_consistency(rig):
    """Body-frame projection: a world point on a camera's ray must reproject
    to the same pixel, and z_cam<0 flags 'in front' (cam_system_omni.cpp:92-112)."""
    Mt_cayley = jnp.asarray([0.03, -0.02, 0.01, 0.5, -0.2, 0.1], jnp.float32)
    Mt = cayley_to_hom(Mt_cayley)
    cam_idx = jnp.asarray([0, 1, 2, 0, 1])
    u0v0 = np.asarray(rig.cams.pp)[np.asarray(cam_idx)]
    uv = jnp.asarray(u0v0 + RNG.uniform(-80, 80, size=(5, 2)), jnp.float32)
    rays_cam = cam_img_to_world(rig.cams, cam_idx, uv)
    # place world points at depth 4 along each ray, mapped through Mt*Mc
    MtMc = jnp.einsum("ij,njk->nik", Mt, rig.Mc[cam_idx])
    X = jnp.einsum("nij,nj->ni", MtMc[:, :3, :3], 4.0 * rays_cam) + MtMc[:, :3, 3]
    uv2, z = project_mcs(rig, Mt_cayley, cam_idx, X)
    np.testing.assert_allclose(uv2, uv, atol=0.01)
    assert np.all(np.asarray(z) > 0), "points in front must have z_cam > 0"


def test_mirror_mask(rig):
    masks = mirror_mask_raster(rig.cams, 0, 8)
    assert len(masks) == 8
    h0, w0 = masks[0].shape
    assert (w0, h0) == (754, 480)
    # principal point inside, corner outside
    u0, v0 = np.asarray(rig.cams.pp[0])
    assert masks[0][int(v0), int(u0)]
    assert not masks[0][0, 0]
    # analytic test agrees with raster at level 0 on a probe grid
    uu = jnp.asarray(RNG.uniform(1, w0 - 2, size=(500,)), jnp.float32)
    vv = jnp.asarray(RNG.uniform(1, h0 - 2, size=(500,)), jnp.float32)
    got = np.asarray(in_mirror_mask(rig.cams, 0, jnp.stack([uu, vv], -1)))
    want = masks[0][np.asarray(vv, np.int32), np.asarray(uu, np.int32)]
    assert np.mean(got == want) > 0.98


def test_camera_centers(rig):
    Mt = jnp.eye(4)
    centers = camera_centers(rig, Mt)
    np.testing.assert_allclose(centers, np.asarray(rig.Mc)[:, :3, 3], atol=1e-6)


def test_slam_settings_load():
    if not HAS_CALIB:
        pytest.skip("reference settings not available")
    s = load_slam_settings(os.path.join(CALIB_DIR, "Slam_Settings_indoor1.yaml"))
    assert s.fps == 25.0
    assert s.extractor.n_features == 400
    assert s.extractor.n_levels == 8
    assert s.extractor.scale_factor == pytest.approx(1.2)
    assert s.extractor.fast_th == 20
    assert s.min_frames == 8 and s.max_frames == 17
    assert s.traj_start_frame == 25 and s.traj_end_frame == 759


def test_intrinsics_vector_roundtrip(rig):
    vec = rig.cams.to_vector()
    # superset of the reference's 17-param vertex: + affine(c,d,e) + pp
    assert vec.shape == (3, 22)
    cams2 = OmniCamera.from_vector(vec, rig.cams.wh)
    uv = jnp.asarray([[300.0, 250.0]], jnp.float32)
    np.testing.assert_allclose(
        cam_world_to_img(cams2, 1, cam_img_to_world(rig.cams, 1, uv)), uv, atol=0.35
    )
