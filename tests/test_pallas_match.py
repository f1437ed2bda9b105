"""Pallas fused masked-Hamming match kernel vs the jnp oracle.

Runs the kernel in interpret mode on CPU (the standard way to validate
Pallas TPU kernels without a chip); the same code path compiles to Mosaic
on TPU where it streams target tiles through VMEM (ops/pallas_match.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multicol_slam_tpu.ops.pallas_match import (
    masked_best_match_pallas,
    masked_best_match_reference,
)


def _problem(seed, Q, T, B=32, frac_valid_t=0.8, frac_valid_q=0.9):
    rng = np.random.default_rng(seed)
    dq = rng.integers(0, 256, (Q, B), dtype=np.uint8)
    dt = rng.integers(0, 256, (T, B), dtype=np.uint8)
    uvq = rng.uniform(0, 500, (Q, 2)).astype(np.float32)
    uvt = rng.uniform(0, 500, (T, 2)).astype(np.float32)
    radt = np.where(
        rng.uniform(size=T) < frac_valid_t, rng.uniform(20, 300, T), -1.0
    ).astype(np.float32)
    lvlt = rng.integers(0, 8, T).astype(np.float32)
    octq = rng.integers(0, 8, Q).astype(np.float32)
    radq = np.where(rng.uniform(size=Q) < frac_valid_q, 1e9, -1.0).astype(np.float32)
    return dq, uvq, octq, dt, uvt, radt, lvlt, radq


@pytest.mark.parametrize("Q,T", [(37, 700), (128, 512), (5, 1030)])
def test_kernel_matches_oracle(Q, T):
    dq, uvq, octq, dt, uvt, radt, lvlt, radq = _problem(Q * 1000 + T, Q, T)
    args = (
        jnp.asarray(dq), jnp.asarray(uvq), jnp.asarray(octq),
        jnp.asarray(dt), jnp.asarray(uvt), jnp.asarray(radt), jnp.asarray(lvlt),
    )
    b1, s1, i1 = masked_best_match_pallas(
        *args, rad_q=jnp.asarray(radq), level_tol=2.0, interpret=True
    )
    b2, s2, i2 = masked_best_match_reference(
        *args, rad_q=jnp.asarray(radq), level_tol=2.0
    )
    b1, s1, i1, b2, s2, i2 = map(np.asarray, (b1, s1, i1, b2, s2, i2))
    matched = i2 >= 0
    assert (i1 == i2).all()
    np.testing.assert_allclose(b1[matched], b2[matched], rtol=0, atol=0.5)
    sec = s2 < 1e8
    np.testing.assert_allclose(s1[sec], s2[sec], rtol=0, atol=0.5)


def test_cams_kernel_matches_oracle():
    """The all-cameras grid variant == per-camera oracle on every camera."""
    from multicol_slam_tpu.ops.pallas_match import masked_best_match_pallas_cams

    C, Q, T = 3, 64, 600
    per_cam = [_problem(100 + c, Q, T) for c in range(C)]
    stack = lambda i: jnp.asarray(np.stack([p[i] for p in per_cam]))
    b, s, i, colb = masked_best_match_pallas_cams(
        stack(0), stack(1), stack(2), stack(3), stack(4), stack(5), stack(6),
        rad_q=stack(7), level_tol=2.0, interpret=True,
    )
    for c in range(C):
        dq, uvq, octq, dt, uvt, radt, lvlt, radq = per_cam[c]
        b2, s2, i2 = masked_best_match_reference(
            jnp.asarray(dq), jnp.asarray(uvq), jnp.asarray(octq),
            jnp.asarray(dt), jnp.asarray(uvt), jnp.asarray(radt), jnp.asarray(lvlt),
            rad_q=jnp.asarray(radq), level_tol=2.0,
        )
        assert (np.asarray(i[c]) == np.asarray(i2)).all()
        m = np.asarray(i2) >= 0
        np.testing.assert_allclose(np.asarray(b[c])[m], np.asarray(b2)[m], atol=0.5)
        # col_best == per-target min of the masked distance matrix
        from multicol_slam_tpu.ops.matching import unpack_pm1

        a_pm = np.asarray(unpack_pm1(jnp.asarray(dq)))
        t_pm = np.asarray(unpack_pm1(jnp.asarray(dt)))
        ham = 0.5 * (a_pm.shape[1] - a_pm @ t_pm.T)
        radm = np.minimum(radq[:, None], radt[None, :])
        du = np.abs(uvq[:, None, 0] - uvt[None, :, 0])
        dv = np.abs(uvq[:, None, 1] - uvt[None, :, 1])
        dl = np.abs(octq[:, None] - lvlt[None, :])
        mask = (du <= radm) & (dv <= radm) & (dl <= 2.0)
        dmat = np.where(mask, ham, 1e9)
        np.testing.assert_allclose(np.asarray(colb[c]), dmat.min(0), atol=0.5)


def test_all_masked_gives_minus_one():
    dq, uvq, octq, dt, uvt, radt, lvlt, _ = _problem(0, 16, 256)
    radt[:] = -1.0
    _, _, idx = masked_best_match_pallas(
        jnp.asarray(dq), jnp.asarray(uvq), jnp.asarray(octq),
        jnp.asarray(dt), jnp.asarray(uvt), jnp.asarray(radt), jnp.asarray(lvlt),
        level_tol=100.0, interpret=True,
    )
    assert (np.asarray(idx) == -1).all()


def test_track_stage_pallas_agrees_with_jnp(monkeypatch):
    """End-to-end: project_and_match via the kernel == the dense jnp path."""
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, track_stage

    world = make_world(n_points=256, n_frames=2, n_cams=2, n_feats=64, seed=0)
    rig = world.rig
    mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
    intr = jnp.asarray(rig.cams.to_vector())
    L = 256
    pts = LocalPoints(
        X=jnp.asarray(world.points[:L].astype(np.float32)),
        desc=jnp.asarray(world.descs[:L]),
        min_dist=jnp.full((L,), 5.0),
        max_dist=jnp.full((L,), 50.0),
        valid=jnp.ones((L,), bool),
    )
    feats = world.frame_features(1)
    pose0 = jnp.asarray(world.poses[1], jnp.float32)

    monkeypatch.setenv("MCSLAM_PALLAS", "1")
    jax.clear_caches()
    out_pl = track_stage(mc6, intr, rig.cams, feats, pose0, pts, radius=10.0, th_desc=80.0)
    monkeypatch.setenv("MCSLAM_PALLAS", "0")
    jax.clear_caches()
    out_np = track_stage(mc6, intr, rig.cams, feats, pose0, pts, radius=10.0, th_desc=80.0)
    assert int(out_np.n_matches) > 5  # sanity: the scene actually matches
    assert (np.asarray(out_pl.assign) == np.asarray(out_np.assign)).all()
    assert int(out_pl.n_inliers) == int(out_np.n_inliers)
    np.testing.assert_allclose(
        np.asarray(out_pl.pose), np.asarray(out_np.pose), atol=1e-5
    )


def test_cams_kernel_masked_distance_matches_formula():
    """The masked (mdBRIEF) kernel variant == the two-matmul masked-Hamming
    identity computed densely (cORBmatcher.cpp:2457-2480 semantics)."""
    from multicol_slam_tpu.ops.matching import hamming_matrix_masked
    from multicol_slam_tpu.ops.pallas_match import masked_best_match_pallas_cams

    C, Q, T, B = 2, 48, 600, 32
    rng = np.random.default_rng(9)
    dq = rng.integers(0, 256, (C, Q, B), dtype=np.uint8)
    dt = rng.integers(0, 256, (C, T, B), dtype=np.uint8)
    mq = rng.integers(0, 256, (C, Q, B), dtype=np.uint8)
    mt = rng.integers(0, 256, (C, T, B), dtype=np.uint8)
    uvq = rng.uniform(0, 500, (C, Q, 2)).astype(np.float32)
    uvt = rng.uniform(0, 500, (C, T, 2)).astype(np.float32)
    radt = np.full((C, T), 1e9, np.float32)
    lvlt = np.zeros((C, T), np.float32)
    best, second, idx, colb = masked_best_match_pallas_cams(
        jnp.asarray(dq), jnp.asarray(uvq), jnp.zeros((C, Q)),
        jnp.asarray(dt), jnp.asarray(uvt), jnp.asarray(radt), jnp.asarray(lvlt),
        mask_q=jnp.asarray(mq), mask_t=jnp.asarray(mt),
        level_tol=1e9, interpret=True,
    )
    for c in range(C):
        dmat = np.asarray(hamming_matrix_masked(
            jnp.asarray(dq[c]), jnp.asarray(mq[c]), jnp.asarray(dt[c]), jnp.asarray(mt[c])
        ))
        np.testing.assert_allclose(np.asarray(best[c]), dmat.min(1), atol=0.5)
        assert (np.asarray(idx[c]) == dmat.argmin(1)).all()
        np.testing.assert_allclose(np.asarray(colb[c]), dmat.min(0), atol=0.5)


def test_cams_kernel_full_masks_equal_plain_hamming():
    """All-ones masks reduce the masked distance to plain Hamming — the
    masked kernel is a strict generalization."""
    from multicol_slam_tpu.ops.pallas_match import masked_best_match_pallas_cams

    C, Q, T, B = 1, 16, 512, 32
    rng = np.random.default_rng(10)
    dq = rng.integers(0, 256, (C, Q, B), dtype=np.uint8)
    dt = rng.integers(0, 256, (C, T, B), dtype=np.uint8)
    full = np.full((C, Q, B), 255, np.uint8)
    fullt = np.full((C, T, B), 255, np.uint8)
    uvq = rng.uniform(0, 100, (C, Q, 2)).astype(np.float32)
    uvt = rng.uniform(0, 100, (C, T, 2)).astype(np.float32)
    radt = np.full((C, T), 1e9, np.float32)
    lvlt = np.zeros((C, T), np.float32)
    common = (jnp.asarray(dq), jnp.asarray(uvq), jnp.zeros((C, Q)),
              jnp.asarray(dt), jnp.asarray(uvt), jnp.asarray(radt), jnp.asarray(lvlt))
    b1, s1, i1, c1 = masked_best_match_pallas_cams(
        *common, mask_q=jnp.asarray(full), mask_t=jnp.asarray(fullt),
        level_tol=1e9, interpret=True)
    b2, s2, i2, c2 = masked_best_match_pallas_cams(*common, level_tol=1e9, interpret=True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=0.5)
    assert (np.asarray(i1) == np.asarray(i2)).all()
