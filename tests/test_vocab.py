import numpy as np
import pytest

from multicol_slam_tpu.models.vocab import (
    KeyFrameDatabase,
    bow_score,
    bow_vector,
    build_vocabulary,
    transform_words,
)

RNG = np.random.default_rng(23)


def clustered_descs(n_clusters=20, per_cluster=50, flip=4):
    """Descriptors grouped around cluster prototypes (BoW should separate)."""
    protos = RNG.integers(0, 256, size=(n_clusters, 32), dtype=np.uint8)
    out = []
    labels = []
    for i, p in enumerate(protos):
        for _ in range(per_cluster):
            d = p.copy()
            for _ in range(flip):
                b = RNG.integers(0, 32)
                d[b] ^= np.uint8(1 << RNG.integers(0, 8))
            out.append(d)
            labels.append(i)
    return np.stack(out), np.asarray(labels), protos


def test_vocabulary_quantizes_consistently():
    descs, labels, protos = clustered_descs()
    voc = build_vocabulary(descs, k=5, depth=3, seed=0)
    assert voc.n_words > 10
    words = transform_words(voc, descs)
    assert words.shape == (len(descs),)
    assert (words >= 0).all()
    # same cluster -> usually same word
    agree = 0
    for c in range(20):
        w = words[labels == c]
        agree += (w == np.bincount(w).argmax()).mean()
    assert agree / 20 > 0.8


def test_bow_score_similarity_ordering():
    descs, labels, protos = clustered_descs()
    voc = build_vocabulary(descs, k=5, depth=3, seed=0)
    # two "images" with overlapping content vs one disjoint
    img_a = descs[labels < 10]
    img_b = descs[(labels >= 5) & (labels < 15)]   # overlaps a
    img_c = descs[labels >= 15]                    # disjoint from a
    va = bow_vector(voc, transform_words(voc, img_a))
    vb = bow_vector(voc, transform_words(voc, img_b))
    vc = bow_vector(voc, transform_words(voc, img_c))
    s_ab = bow_score(va, vb)
    s_ac = bow_score(va, vc)
    s_aa = bow_score(va, va)
    assert s_aa == pytest.approx(1.0, abs=1e-6)
    assert s_ab > s_ac, (s_ab, s_ac)


def test_keyframe_database_retrieval():
    descs, labels, protos = clustered_descs()
    voc = build_vocabulary(descs, k=5, depth=3, seed=0)
    db = KeyFrameDatabase(voc)
    # 10 keyframes, each from 2 clusters; kf i uses clusters (2i, 2i+1)
    bows = []
    for i in range(10):
        sel = descs[(labels == 2 * i) | (labels == 2 * i + 1)]
        bow = bow_vector(voc, transform_words(voc, sel))
        bows.append(bow)
        db.add(i, bow)
    # query with a noisy re-observation of kf 3's content
    q_desc = descs[(labels == 6) | (labels == 7)]
    q = bow_vector(voc, transform_words(voc, q_desc))
    res = db.query(q, exclude={3}, min_score=0.0)
    # kf 3 excluded; remaining matches must score lower than kf3 itself
    s3 = bow_score(q, bows[3])
    assert all(s <= s3 + 1e-9 for _, s in res)
    res2 = db.query(q, exclude=set(), min_score=0.0)
    assert res2 and res2[0][0] == 3


def test_database_erase():
    descs, labels, _ = clustered_descs(5, 20)
    voc = build_vocabulary(descs, k=3, depth=2, seed=1)
    db = KeyFrameDatabase(voc)
    bow = bow_vector(voc, transform_words(voc, descs[:20]))
    db.add(0, bow)
    db.add(1, bow)
    db.erase(0)
    res = db.query(bow, exclude=set(), min_score=0.0)
    assert [k for k, _ in res] == [1]
