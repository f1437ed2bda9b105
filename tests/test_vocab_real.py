"""Validate the DBoW2-YAML loader on the REAL reference vocabulary file
(/root/reference/Examples/small_orb_omni_voc_9_6.yml, the exact file
cSystem.cpp:60-66 loads) — a multi-MB OpenCV-YAML format our hand-rolled
parser must handle byte-for-byte, not just synthetic fixtures."""
import os

import numpy as np
import pytest

VOC_PATH = "/root/reference/Examples/small_orb_omni_voc_9_6.yml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOC_PATH), reason="reference vocabulary not present"
)


@pytest.fixture(scope="module")
def real_voc():
    from multicol_slam_tpu.models.vocab import load_dbow2_yaml

    return load_dbow2_yaml(VOC_PATH)


def test_structure(real_voc):
    v = real_voc
    assert v.k == 9
    assert v.depth == 6
    assert v.node_desc.shape[1] == 32          # 32-byte ORB descriptors
    # a k=9 L=6 tree has at most sum_{l<=6} 9^l nodes; this "small" vocab is
    # heavily pruned (the real file holds 8822 nodes / 6999 words) but must
    # parse completely
    assert 8_000 < len(v.node_desc) < 600_000
    assert v.n_words > 5_000
    # every word lives on a leaf (padding slots are leaves without words)
    has_word = v.word_id >= 0
    assert v.is_leaf[has_word].all()
    # word ids are a bijection onto [0, n_words)
    w = np.sort(v.word_id[has_word])
    assert len(w) == v.n_words
    assert w[0] == 0 and w[-1] == v.n_words - 1
    assert len(np.unique(w)) == v.n_words
    # idf weights finite and non-negative
    assert np.isfinite(v.word_weight).all()
    assert (v.word_weight >= 0).all()


def test_transform_and_scoring(real_voc):
    from multicol_slam_tpu.models.vocab import bow_score, bow_vector, transform_words

    v = real_voc
    rng = np.random.default_rng(0)
    descs = rng.integers(0, 256, (128, 32), dtype=np.uint8)
    words = np.asarray(transform_words(v, descs))
    assert words.shape == (128,)
    assert (words >= 0).all() and (words < v.n_words).all()
    # deterministic
    words2 = np.asarray(transform_words(v, descs))
    assert (words == words2).all()
    # a node's own descriptor must land in that node's subtree direction:
    # at minimum, identical descriptor batches quantize identically and
    # self-similarity beats cross-similarity
    b1 = bow_vector(v, words[:64])
    b2 = bow_vector(v, words[:64])
    b3 = bow_vector(v, words[64:])
    assert bow_score(b1, b2) == pytest.approx(1.0, abs=1e-6)
    assert bow_score(b1, b3) < 0.9


def test_keyframe_database_with_real_vocab(real_voc):
    """Reloc/loop candidate retrieval over the real vocabulary: frames made
    of the same descriptors must retrieve each other ahead of unrelated
    frames (cMultiKeyFrameDatabase protocol on real word statistics)."""
    from multicol_slam_tpu.models.vocab import (
        KeyFrameDatabase,
        bow_vector,
        transform_words,
    )

    v = real_voc
    rng = np.random.default_rng(1)
    db = KeyFrameDatabase(v)
    sets = [rng.integers(0, 256, (200, 32), dtype=np.uint8) for _ in range(6)]
    for i, d in enumerate(sets):
        db.add(i, bow_vector(v, transform_words(v, d)))
    # query = a noisy copy of set 2 (flip one bit in each descriptor)
    q = sets[2].copy()
    q[:, 0] ^= 1
    bow_q = bow_vector(v, transform_words(v, q))
    res = db.query(bow_q, exclude=set(), min_score=0.0)
    assert res, "no candidates retrieved"
    assert res[0][0] == 2, f"expected KF 2 first, got {res[:3]}"
