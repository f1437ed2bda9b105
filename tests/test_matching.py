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
