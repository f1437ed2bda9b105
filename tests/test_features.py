import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multicol_slam_tpu.models.camera import OmniCamera
from multicol_slam_tpu.ops import fast as fast_ops
from multicol_slam_tpu.ops import image as image_ops
from multicol_slam_tpu.ops import brief as brief_ops
from multicol_slam_tpu.slam.features import FrameFeatures, extract_features
from multicol_slam_tpu.utils.config import ExtractorSettings

RNG = np.random.default_rng(7)


def make_test_camera(n=1, w=256, h=192):
    """A mild fisheye whose mirror circle covers the whole image."""
    pol = [[-120.0, 0.0, 0.002, 0.0, 0.0]] * n
    invpol = [[115.0, 60.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]] * n
    cde = [[1.0, 0.0, 0.0]] * n
    pp = [[w / 2.0, h / 2.0]] * n
    wh = [[w, h]] * n
    return OmniCamera.from_params(pol, invpol, cde, pp, wh)


def checkerboard(h, w, sq=16, lo=40.0, hi=210.0):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    board = (((yy // sq) + (xx // sq)) % 2).astype(np.float32)
    return board * (hi - lo) + lo


def squares_image(h=96, w=128, step=24, sq=10, lo=40.0, hi=210.0):
    """Isolated bright squares: L-junction corners, which FAST-9 does fire on
    (a perfect checkerboard X-junction has two 8-arcs and never a 9-run)."""
    img = np.full((h, w), lo, np.float32)
    for y0 in range(8, h - sq - 4, step):
        for x0 in range(8, w - sq - 4, step):
            img[y0 : y0 + sq, x0 : x0 + sq] = hi
    return img


def test_fast_detects_square_corners():
    img_np = squares_image()
    is_corner, score = fast_ops.fast_corners(jnp.asarray(img_np[None]), 20.0)
    corners = np.argwhere(np.asarray(is_corner[0]))
    interior = (corners[:, 0] > 3) & (corners[:, 0] < 92) & (corners[:, 1] > 3) & (corners[:, 1] < 124)
    corners = corners[interior]
    assert len(corners) > 0
    # every detection is within 2px of a square corner
    ys = np.arange(8, 96 - 14, 24)
    xs = np.arange(8, 128 - 14, 24)
    cy = np.concatenate([ys, ys + 9])
    cx = np.concatenate([xs, xs + 9])
    dy = np.min(np.abs(corners[:, 0:1] - cy[None]), axis=1)
    dx = np.min(np.abs(corners[:, 1:2] - cx[None]), axis=1)
    assert np.all(dy <= 2) and np.all(dx <= 2)


def test_fast_flat_image_no_corners():
    img = jnp.full((1, 64, 64), 100.0)
    is_corner, _ = fast_ops.fast_corners(img, 10.0)
    assert not bool(jnp.any(is_corner))


def test_topk_grid_uniformity():
    score = jnp.asarray(RNG.uniform(0, 1, size=(1, 128, 128)).astype(np.float32))
    valid = jnp.ones_like(score, dtype=bool)
    uv, resp, ok = fast_ops.select_topk_grid(score, valid, 64, cell=32, k_per_cell=4)
    assert bool(jnp.all(ok))
    # with k_per_cell=4 and 16 cells, max 4 detections per 32x32 cell
    cells = (np.asarray(uv[0][:, 1]) // 32) * 4 + (np.asarray(uv[0][:, 0]) // 32)
    counts = np.bincount(cells, minlength=16)
    assert counts.max() <= 4


def test_level_quota_sums():
    q = fast_ops.level_quota(400, 8, 1.2)
    assert q.sum() == 400
    assert q[0] > q[-1] > 0


def test_ic_angle_rotation_equivariance():
    """Rotating the image rotates the IC angle accordingly."""
    # gradient blob off center
    h = w = 64
    yy, xx = np.meshgrid(np.arange(h) - 32, np.arange(w) - 32, indexing="ij")
    img = np.exp(-(((xx - 8) ** 2 + yy ** 2) / 50.0)).astype(np.float32) * 255
    ang0 = brief_ops.ic_angles(jnp.asarray(img), jnp.asarray([[32, 32]], jnp.int32))
    # 90 deg rotation (counterclockwise in array space)
    img90 = np.rot90(img)
    ang90 = brief_ops.ic_angles(jnp.asarray(img90.copy()), jnp.asarray([[32, 32]], jnp.int32))
    d = float(ang90[0] - ang0[0])
    d = (d + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(d) - np.pi / 2) < 0.1


def test_ic_angle_dense_matches_gather():
    """The dense-conv IC-angle path equals the patch-gather oracle away from
    image borders (the extraction path only queries inside the 19px border)."""
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 255, (2, 96, 128)).astype(np.float32)
    centers = np.stack(
        [rng.integers(20, 108, (2, 17)), rng.integers(20, 76, (2, 17))], axis=-1
    ).astype(np.int32)
    dense = np.asarray(brief_ops.ic_angles_dense(jnp.asarray(imgs), jnp.asarray(centers)))
    for c in range(2):
        ref = np.asarray(brief_ops.ic_angles(jnp.asarray(imgs[c]), jnp.asarray(centers[c])))
        np.testing.assert_allclose(dense[c], ref, atol=1e-3)


def test_orb_descriptor_deterministic_and_discriminative():
    img = jnp.asarray(RNG.uniform(0, 255, size=(128, 128)).astype(np.float32))
    blurred = image_ops.box_filter(img[None], 5)[0]
    centers = jnp.asarray(RNG.integers(20, 100, size=(32, 2)), jnp.int32)
    ang = brief_ops.ic_angles(img, centers)
    d1 = brief_ops.compute_orb(blurred, centers, ang)
    d2 = brief_ops.compute_orb(blurred, centers, ang)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert d1.shape == (32, 32) and d1.dtype == jnp.uint8
    # different keypoints -> different descriptors (with overwhelming prob.)
    ham = np.unpackbits(np.asarray(d1[0] ^ d1[1])).sum()
    assert ham > 30


def test_orb_rotation_invariance():
    """Steered BRIEF: descriptor of a rotated patch stays close in Hamming."""
    h = w = 96
    img = RNG.uniform(0, 255, size=(h, w)).astype(np.float32)
    img_s = np.asarray(image_ops.box_filter(jnp.asarray(img)[None], 5)[0])
    img90 = np.rot90(img_s, -1).copy()  # clockwise
    c = jnp.asarray([[48, 48]], jnp.int32)
    a0 = brief_ops.ic_angles(jnp.asarray(img_s), c)
    a90 = brief_ops.ic_angles(jnp.asarray(img90), c)
    d0 = brief_ops.compute_orb(jnp.asarray(img_s), c, a0)
    d90 = brief_ops.compute_orb(jnp.asarray(img90), c, a90)
    ham = np.unpackbits(np.asarray(d0 ^ d90)).sum()
    assert ham < 80, f"rotated-patch Hamming {ham} should stay well under 128"


def test_extract_features_end_to_end():
    settings = ExtractorSettings(n_features=128, n_levels=4, fast_th=15)
    cams = make_test_camera(n=2)
    imgs = np.stack(
        [squares_image(192, 256), RNG.uniform(0, 255, size=(192, 256)).astype(np.float32)]
    )
    feats = extract_features(jnp.asarray(imgs), cams, settings)
    assert feats.uv.shape == (2, 128, 2)
    assert feats.desc.shape == (2, 128, 32)
    assert feats.rays.shape == (2, 128, 3)
    n_valid = int(feats.valid.sum())
    assert n_valid > 60, f"expected plenty of valid features, got {n_valid}"
    # all valid keypoints inside image bounds
    v = np.asarray(feats.valid)
    uv = np.asarray(feats.uv)
    assert np.all(uv[v][:, 0] >= 0) and np.all(uv[v][:, 0] < 256)
    assert np.all(uv[v][:, 1] >= 0) and np.all(uv[v][:, 1] < 192)
    # rays are unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats.rays)[v], axis=-1), 1.0, atol=1e-4)


def test_extract_features_jittable():
    settings = ExtractorSettings(n_features=64, n_levels=3, fast_th=15)
    cams = make_test_camera(n=1, w=128, h=96)
    f = jax.jit(lambda im: extract_features(im, cams, settings))
    imgs = jnp.asarray(squares_image()[None])
    feats = f(imgs)
    assert feats.uv.shape == (1, 64, 2)


def test_mdbrief_path():
    settings = ExtractorSettings(n_features=64, n_levels=3, fast_th=15, use_mdbrief=1, learn_masks=1)
    cams = make_test_camera(n=1, w=128, h=96)
    imgs = jnp.asarray(squares_image()[None])
    feats = extract_features(imgs, cams, settings)
    assert feats.desc.shape == (1, 64, 32)
    # learned masks should not be all-ones everywhere (some bits unstable)
    v = np.asarray(feats.valid[0])
    if v.sum() > 0:
        masks = np.asarray(feats.dmask[0])[v]
        assert masks.min() < 255
