import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.ops.matching import (
    hamming_matrix,
    hamming_matrix_masked,
    masked_best_match,
    mutual_filter,
    resolve_duplicate_targets,
    rotation_consistency,
    th_high,
    th_low,
    unpack_pm1,
    window_mask,
)

RNG = np.random.default_rng(11)


def rand_desc(n, b=32):
    return RNG.integers(0, 256, size=(n, b), dtype=np.uint8)


def np_hamming(a, b):
    return np.array(
        [[np.unpackbits(x ^ y).sum() for y in b] for x in a], np.float32
    )


def test_hamming_matrix_exact():
    """MXU-matmul Hamming == numpy popcount (SURVEY.md §4a)."""
    a, b = rand_desc(37), rand_desc(53)
    got = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np_hamming(a, b)
    np.testing.assert_array_equal(got, want)


def test_hamming_identity_zero():
    a = rand_desc(16)
    d = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_array_equal(np.diag(d), np.zeros(16))


def test_masked_hamming_matches_reference_formula():
    """d = (popcount(xor&mA) + popcount(xor&mB))/2 (cORBmatcher.cpp:2457-2480)."""
    a, b = rand_desc(9), rand_desc(13)
    ma, mb = rand_desc(9), rand_desc(13)
    got = np.asarray(
        hamming_matrix_masked(jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb))
    )
    want = np.zeros((9, 13), np.float32)
    for i in range(9):
        for j in range(13):
            x = a[i] ^ b[j]
            want[i, j] = 0.5 * (
                np.unpackbits(x & ma[i]).sum() + np.unpackbits(x & mb[j]).sum()
            )
    np.testing.assert_allclose(got, want)


def test_masked_best_match_with_ratio():
    dist = jnp.asarray(
        [
            [10.0, 50.0, 60.0],   # clear winner -> ok
            [10.0, 11.0, 60.0],   # ratio fails at 0.9
            [99.0, 98.0, 97.0],   # all above threshold
        ]
    )
    mask = jnp.ones((3, 3), bool)
    idx, d, ok = masked_best_match(dist, mask, max_dist=64.0, ratio=0.9)
    assert list(np.asarray(idx)[:2]) == [0, 0]
    assert list(np.asarray(ok)) == [True, False, False]


def test_masked_best_match_respects_mask():
    dist = jnp.asarray([[1.0, 5.0]])
    mask = jnp.asarray([[False, True]])
    idx, d, ok = masked_best_match(dist, mask, max_dist=64.0)
    assert int(idx[0]) == 1 and bool(ok[0])


def test_mutual_filter():
    idx_qt = jnp.asarray([1, 0, 2])
    idx_tq = jnp.asarray([1, 0, 0])
    ok = jnp.asarray([True, True, True])
    keep = mutual_filter(idx_qt, ok, idx_tq)
    assert list(np.asarray(keep)) == [True, True, False]


def test_resolve_duplicates():
    idx = jnp.asarray([0, 0, 1])
    dist = jnp.asarray([5.0, 3.0, 1.0])
    ok = jnp.asarray([True, True, True])
    keep = resolve_duplicate_targets(idx, dist, ok, n_targets=2)
    assert list(np.asarray(keep)) == [False, True, True]


def test_rotation_consistency_keeps_dominant_bins():
    # 80 matches at ~0 delta, 20 outliers spread out
    d = np.concatenate([RNG.normal(0, 0.02, 80), RNG.uniform(-3, 3, 20)])
    ok = np.ones(100, bool)
    keep = np.asarray(rotation_consistency(jnp.asarray(d, jnp.float32), jnp.asarray(ok)))
    assert keep[:80].all()
    assert keep[80:].sum() < 15


def test_window_mask():
    uv_q = jnp.asarray([[0.0, 0.0], [100.0, 100.0]])
    uv_t = jnp.asarray([[3.0, 4.0], [98.0, 101.0], [50.0, 50.0]])
    m = np.asarray(window_mask(uv_q, uv_t, 5.0))
    assert m.tolist() == [[True, False, False], [False, True, False]]


def test_thresholds():
    assert th_high(32) == 96 and th_low(32) == 64
    assert th_high(32, masked=True) == 48 and th_low(32, masked=True) == 32


def test_unpack_pm1_roundtrip():
    a = rand_desc(4)
    pm = np.asarray(unpack_pm1(jnp.asarray(a)).astype(jnp.float32))
    bits = (pm > 0).astype(np.uint8).reshape(4, 32, 8)
    repacked = np.packbits(bits, axis=-1, bitorder="little")[:, :, 0]
    np.testing.assert_array_equal(repacked, a)


# ---------------------------------------------------------------------------
# Live-path wiring: masked distance, rotation histogram, viewing-angle gate
# (cORBmatcher.cpp:46-65/2457-2480, rotHist :640-680, cMultiFrame.cpp:218-270)
# ---------------------------------------------------------------------------

def _frame_features(uv, desc, dmask=None, angle=None):
    import jax.numpy as jnp
    from multicol_slam_tpu.slam.features import FrameFeatures

    C, K, B = desc.shape
    return FrameFeatures(
        uv=jnp.asarray(uv, jnp.float32),
        response=jnp.ones((C, K), jnp.float32),
        octave=jnp.zeros((C, K), jnp.int32),
        angle=jnp.asarray(angle if angle is not None else np.zeros((C, K)), jnp.float32),
        rays=jnp.zeros((C, K, 3), jnp.float32),
        desc=jnp.asarray(desc),
        dmask=jnp.asarray(dmask if dmask is not None else np.full((C, K, B), 255, np.uint8)),
        valid=jnp.ones((C, K), bool),
    )


def test_masked_matching_rescues_unstable_bits():
    """mdBRIEF payoff: descriptors whose UNSTABLE (masked-out) bits are
    heavily corrupted still match under the masked distance but fail the
    plain-Hamming threshold — the mdBRIEF-on configuration measurably
    changes match quality."""
    from multicol_slam_tpu.slam.tracking_kernels import match_window_frames

    C, K, B = 1, 16, 32
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (C, K, B), dtype=np.uint8)
    # stability mask: first half of bytes stable, second half unstable
    dmask = np.zeros((C, K, B), np.uint8)
    dmask[..., : B // 2] = 255
    # target = base with ALL unstable bits flipped (worst-case instability)
    tgt = base.copy()
    tgt[..., B // 2:] ^= 0xFF
    uv = np.tile(rng.uniform(0, 100, (1, K, 2)), (C, 1, 1))
    fq = _frame_features(uv, base, dmask)
    ft = _frame_features(uv, tgt, dmask)
    # plain Hamming: distance = 128 bits > TH_LOW=64 -> nothing matches
    idx_plain, _ = match_window_frames(fq, ft, radius=5.0, th_desc=64.0, ratio=0.9)
    # masked Hamming: corrupted bits are masked out on both sides -> dist 0
    idx_masked, _ = match_window_frames(
        fq, ft, radius=5.0, th_desc=32.0, ratio=0.9, use_masks=True
    )
    assert int((np.asarray(idx_plain) >= 0).sum()) == 0
    matched = np.asarray(idx_masked)[0]
    assert (matched == np.arange(K)).mean() > 0.9


def test_rotation_consistency_wired_in_window_match():
    """A single match whose angle delta disagrees with the dominant rotation
    is rejected when check_rotation=True (rotHist, cORBmatcher.cpp:640-680)."""
    from multicol_slam_tpu.slam.tracking_kernels import match_window_frames

    C, K, B = 1, 64, 32
    rng = np.random.default_rng(4)
    desc = rng.integers(0, 256, (C, K, B), dtype=np.uint8)
    uv = np.tile(rng.uniform(0, 400, (1, K, 2)), (C, 1, 1))
    ang_q = np.zeros((C, K), np.float32)
    ang_t = np.full((C, K), 0.3, np.float32)   # dominant delta -0.3
    ang_t[0, 7] = 3.0                          # outlier rotation
    fq = _frame_features(uv, desc, angle=ang_q)
    ft = _frame_features(uv, desc, angle=ang_t)
    idx_no, _ = match_window_frames(fq, ft, radius=5.0, th_desc=64.0)
    idx_rot, _ = match_window_frames(fq, ft, radius=5.0, th_desc=64.0, check_rotation=True)
    idx_no, idx_rot = np.asarray(idx_no), np.asarray(idx_rot)
    assert idx_no[0, 7] == 7          # matches without the rotation check
    assert idx_rot[0, 7] == -1        # rejected by the histogram
    keep = np.delete(np.arange(K), 7)
    assert (idx_rot[0, keep] == keep).all()


def test_viewing_angle_gate_in_projection_match():
    """project_and_match rejects points whose mean viewing normal opposes the
    current viewing direction (isInFrustum viewCos<0.5, cMultiFrame.cpp:
    218-270); zero normals (not yet accumulated) pass."""
    import jax.numpy as jnp
    from multicol_slam_tpu.io.synthetic import make_world
    from multicol_slam_tpu.slam.map_store import cayley_to_hom_np
    from multicol_slam_tpu.slam.tracking_kernels import LocalPoints, project_and_match

    world = make_world(n_points=64, n_frames=2, n_cams=2, n_feats=64, seed=5)
    rig = world.rig
    mc6 = jnp.asarray(np.asarray(rig.Mc_cayley, np.float32))
    intr = jnp.asarray(rig.cams.to_vector())
    feats = world.frame_features(0)
    L = 64
    X = world.points[:L].astype(np.float32)
    # true viewing directions from the body origin (pose 0 ~ identity)
    dist0 = np.linalg.norm(X, axis=-1)
    view = X / dist0[:, None]

    def run(normals):
        pts = LocalPoints(
            X=jnp.asarray(X),
            desc=jnp.asarray(world.descs[:L]),
            # per-point distance band centered on the true viewing distance,
            # so the predicted pyramid level is 0 (octave of all features)
            min_dist=jnp.asarray(dist0 * 0.95),
            max_dist=jnp.asarray(dist0 * 1.5),
            valid=jnp.ones((L,), bool),
            normal=jnp.asarray(normals, jnp.float32),
        )
        assign, _, keep = project_and_match(
            mc6, intr, rig.cams, feats,
            jnp.asarray(world.poses[0], jnp.float32), pts,
            radius=10.0, th_desc=80.0,
        )
        return int(np.asarray(keep).sum())

    n_zero = run(np.zeros_like(X))          # gate disabled per-point
    n_good = run(view)                      # normals agree with view
    n_bad = run(-view)                      # normals oppose view
    assert n_good > 10
    assert n_zero == n_good
    assert n_bad == 0
