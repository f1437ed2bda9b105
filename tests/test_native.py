"""Native mapops library: build, and exact parity with the numpy fallback."""
import numpy as np
import pytest

from multicol_slam_tpu import native

RNG = np.random.default_rng(31)


def random_table(K=12, F=60, P=40):
    kf_point = np.full((K, F), -1, np.int32)
    fill = RNG.random((K, F)) < 0.6
    kf_point[fill] = RNG.integers(0, P, fill.sum())
    kf_octave = RNG.integers(0, 4, (K, F)).astype(np.int32)
    kf_valid = np.ones(K, bool)
    kf_valid[RNG.integers(0, K, 2)] = False
    return kf_point, kf_octave, kf_valid


def numpy_covis(kf_point, kf_valid, k):
    pts = kf_point[k]
    pts = np.unique(pts[pts >= 0])
    mask = np.isin(kf_point, pts) & (kf_point >= 0)
    counts = mask.sum(1).astype(np.int32)
    counts[k] = 0
    counts[~kf_valid] = 0
    return counts


def test_native_builds():
    assert native.available(), "g++ toolchain present in image; build must work"


def test_covisibility_parity():
    kf_point, kf_octave, kf_valid = random_table()
    for k in range(kf_point.shape[0]):
        got = native.covisibility_counts(kf_point, kf_valid, k)
        want = numpy_covis(kf_point, kf_valid, k)
        np.testing.assert_array_equal(got, want)


def test_count_observations_parity():
    kf_point, kf_octave, kf_valid = random_table()
    pt_ids = np.arange(40, dtype=np.int32)
    got = native.count_observations(kf_point, kf_valid, pt_ids)
    vp = kf_point[kf_valid]
    flat = vp[vp >= 0]
    want = np.bincount(flat, minlength=40)[:40]
    np.testing.assert_array_equal(got, want)


def test_redundancy_parity():
    kf_point, kf_octave, kf_valid = random_table()
    j = int(np.nonzero(kf_valid)[0][0])
    got = native.redundancy_counts(kf_point, kf_octave, kf_valid, j)
    # brute-force reference
    F = kf_point.shape[1]
    want = np.zeros(F, np.int32)
    for g in range(F):
        p = kf_point[j, g]
        if p < 0:
            continue
        n = 0
        for k in range(kf_point.shape[0]):
            if k == j or not kf_valid[k]:
                continue
            for f in range(F):
                if kf_point[k, f] == p and kf_octave[k, f] <= kf_octave[j, g] + 1:
                    n += 1
        want[g] = n
    np.testing.assert_array_equal(got, want)
