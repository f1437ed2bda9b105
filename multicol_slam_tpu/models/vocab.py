"""Visual vocabulary (BoW) + keyframe database — DBoW2 capability, TPU-shaped.

Replaces ThirdParty/DBoW2 (SURVEY.md §2.2): a hierarchical binary vocabulary
(k-ary tree, depth L) quantizes descriptors to leaf 'words'; keyframes get
sparse tf-idf BoW vectors scored with the DBoW2 L1 metric; an inverted file
supports loop / relocalization candidate retrieval
(cMultiKeyFrameDatabase.cpp:82-339 semantics).

TPU-first: the tree is dense arrays (node descriptors [N, B] + child index
table); `transform` descends ALL descriptors of ALL cameras in one jitted
loop over depth (gather children -> MXU Hamming -> argmin). Training is
k-majority (binary k-means) on host. The inverted file + scoring stay on
host (sparse, tiny). A DBoW2-YAML loader keeps the reference's vocabulary
files usable (cSystem.cpp:60-66 loads small_orb_omni_voc_9_6.yml).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multicol_slam_tpu.ops.matching import unpack_pm1


@dataclasses.dataclass
class Vocabulary:
    k: int                    # branching factor
    depth: int                # tree depth (levels below root)
    node_desc: np.ndarray     # [n_nodes, B] uint8 cluster centers
    children: np.ndarray      # [n_nodes, k] int32 child node ids (-1 pad)
    is_leaf: np.ndarray       # [n_nodes] bool
    word_id: np.ndarray       # [n_nodes] int32 leaf -> word id (-1 otherwise)
    word_weight: np.ndarray   # [n_words] f32 idf weights
    node_level: np.ndarray    # [n_nodes] int32 depth of each node

    @property
    def n_words(self) -> int:
        return len(self.word_weight)

    def device_tables(self):
        return (
            jnp.asarray(self.node_desc),
            jnp.asarray(self.children),
            jnp.asarray(self.word_id),
        )


def _kmajority(descs: np.ndarray, k: int, rng, iters: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Binary k-means: cluster descriptors by Hamming with bit-majority
    centroid updates. Returns (centers [k, B], assign [N])."""
    N = len(descs)
    k = min(k, N)
    centers = descs[rng.choice(N, k, replace=False)].copy()
    bits = np.unpackbits(descs, axis=1)  # [N, 8B]
    for _ in range(iters):
        cbits = np.unpackbits(centers, axis=1)
        d = (bits[:, None, :] != cbits[None, :, :]).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            sel = bits[assign == c]
            if len(sel):
                centers[c] = np.packbits((sel.mean(0) > 0.5).astype(np.uint8))
    cbits = np.unpackbits(centers, axis=1)
    d = (bits[:, None, :] != cbits[None, :, :]).sum(-1)
    return centers, d.argmin(1)


def build_vocabulary(
    descs: np.ndarray, k: int = 9, depth: int = 3, seed: int = 0, max_train: int = 20000
) -> Vocabulary:
    """Hierarchical k-majority training (the DBoW2 create() equivalent)."""
    rng = np.random.default_rng(seed)
    if len(descs) > max_train:
        descs = descs[rng.choice(len(descs), max_train, replace=False)]
    B = descs.shape[1]
    node_desc = [np.zeros(B, np.uint8)]
    children: List[List[int]] = [[]]
    levels = [0]
    stack = [(0, descs, 0)]  # (node, descriptors, level)
    while stack:
        node, d, lvl = stack.pop()
        if lvl >= depth or len(d) <= k:
            continue
        centers, assign = _kmajority(d, k, rng)
        for c in range(len(centers)):
            child = len(node_desc)
            node_desc.append(centers[c])
            children.append([])
            levels.append(lvl + 1)
            children[node].append(child)
            sub = d[assign == c]
            if len(sub):
                stack.append((child, sub, lvl + 1))
    n = len(node_desc)
    child_tab = np.full((n, k), -1, np.int32)
    for i, ch in enumerate(children):
        child_tab[i, : len(ch)] = ch
    is_leaf = (child_tab[:, 0] == -1)
    is_leaf[0] = False if n > 1 else True
    word_id = np.full(n, -1, np.int32)
    leaves = np.nonzero(is_leaf)[0]
    word_id[leaves] = np.arange(len(leaves), dtype=np.int32)
    # idf weights from the training set
    voc = Vocabulary(
        k=k,
        depth=depth,
        node_desc=np.stack(node_desc),
        children=child_tab,
        is_leaf=is_leaf,
        word_id=word_id,
        word_weight=np.ones(len(leaves), np.float32),
        node_level=np.asarray(levels, np.int32),
    )
    words = transform_words(voc, descs)
    counts = np.bincount(words[words >= 0], minlength=voc.n_words).astype(np.float64)
    n_docs = max(len(descs), 1)
    idf = np.log(n_docs / np.maximum(counts, 1.0))
    voc.word_weight = np.maximum(idf, 1e-3).astype(np.float32)
    return voc


# ---------------------------------------------------------------------------
# Batched transform (descriptors -> words) on device
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("depth", "k"))
def _descend(node_desc, children, word_id, descs, depth: int, k: int):
    q = unpack_pm1(descs)  # [N, 8B]
    nodes = jnp.zeros(descs.shape[0], jnp.int32)

    def level(i, nodes):
        ch = children[nodes]                      # [N, k]
        ch_valid = ch >= 0
        cd = node_desc[jnp.maximum(ch, 0)]        # [N, k, B]
        cb = unpack_pm1(cd.reshape(-1, cd.shape[-1])).reshape(cd.shape[0], k, -1)
        dots = jnp.einsum("nj,nkj->nk", q, cb, preferred_element_type=jnp.float32)
        ham = 0.5 * (q.shape[-1] - dots)
        ham = jnp.where(ch_valid, ham, jnp.inf)
        best = jnp.argmin(ham, axis=1)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        # stop at leaves (no children): keep current node
        return jnp.where(ch_valid.any(axis=1), nxt, nodes)

    nodes = jax.lax.fori_loop(0, depth, level, nodes)
    return word_id[nodes]


def transform_words(voc: Vocabulary, descs: np.ndarray) -> np.ndarray:
    """Quantize [N, B] descriptors to word ids [N] (-1 if unmapped)."""
    if len(descs) == 0:
        return np.empty(0, np.int32)
    nd, ch, wid = voc.device_tables()
    return np.asarray(_descend(nd, ch, wid, jnp.asarray(descs), voc.depth, voc.k))


def bow_vector(voc: Vocabulary, words: np.ndarray) -> Dict[int, float]:
    """tf-idf, L1-normalized sparse BoW (DBoW2 TemplatedVocabulary::transform
    with L1_NORM, TemplatedVocabulary.h:135-153 + :470-474)."""
    words = words[words >= 0]
    if len(words) == 0:
        return {}
    counts = np.bincount(words, minlength=voc.n_words).astype(np.float64)
    v = counts * voc.word_weight
    s = v.sum()
    if s <= 0:
        return {}
    nz = np.nonzero(v)[0]
    return {int(w): float(v[w] / s) for w in nz}


def bow_score(v1: Dict[int, float], v2: Dict[int, float]) -> float:
    """DBoW2 L1 score: 1 - 0.5 * |v1/|v1| - v2/|v2||_1 in [0, 1]
    (BowVector L1 scoring; higher = more similar)."""
    if not v1 or not v2:
        return 0.0
    common = set(v1) & set(v2)
    s = sum(abs(v1[w] - v2[w]) - abs(v1[w]) - abs(v2[w]) for w in common)
    s += sum(abs(x) for x in v1.values()) + sum(abs(x) for x in v2.values())
    return 1.0 - 0.5 * s


class KeyFrameDatabase:
    """BoW inverted file over keyframes (cMultiKeyFrameDatabase.{h,cpp})."""

    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.inverted: Dict[int, List[int]] = {}
        self.kf_bow: Dict[int, Dict[int, float]] = {}

    def add(self, kf_id: int, bow: Dict[int, float]):
        self.kf_bow[kf_id] = bow
        for w in bow:
            self.inverted.setdefault(w, []).append(kf_id)

    def erase(self, kf_id: int):
        bow = self.kf_bow.pop(kf_id, {})
        for w in bow:
            lst = self.inverted.get(w, [])
            if kf_id in lst:
                lst.remove(kf_id)

    def query(
        self, bow: Dict[int, float], exclude: set, min_score: float
    ) -> List[Tuple[int, float]]:
        """Candidate retrieval with the reference's shared-word protocol
        (DetectLoopCandidates, cMultiKeyFrameDatabase.cpp:82-221): count
        shared words, keep > 0.8*maxCommonWords, then score; group-score
        accumulation is done by the caller over covisibility groups."""
        shared: Dict[int, int] = {}
        for w in bow:
            for kf in self.inverted.get(w, []):
                if kf not in exclude:
                    shared[kf] = shared.get(kf, 0) + 1
        if not shared:
            return []
        max_common = max(shared.values())
        min_common = 0.8 * max_common
        out = []
        for kf, n in shared.items():
            if n > min_common:
                s = bow_score(bow, self.kf_bow.get(kf, {}))
                if s >= min_score:
                    out.append((kf, s))
        out.sort(key=lambda x: -x[1])
        return out


# ---------------------------------------------------------------------------
# DBoW2 YAML loader (keeps the reference's vocabulary files usable)
# ---------------------------------------------------------------------------

def load_dbow2_yaml(path: str) -> Vocabulary:
    """Parse the OpenCV-YAML DBoW2 vocabulary (vocabulary: {k, L, nodes:
    [{nodeId, parentId, weight, descriptor}], words: [{wordId, nodeId}]}).
    Hand-rolled line parser — the files are multi-MB so pyyaml is too slow.
    """
    import re

    k = depth = 0
    nodes: Dict[int, Tuple[int, float, np.ndarray]] = {}
    words: Dict[int, int] = {}
    cur: Dict[str, object] = {}
    section = None

    entry_re = re.compile(r'(\w+):\s*("[^"]*"|[^,}]+)')

    def parse_entry(text: str):
        cur: Dict[str, str] = {}
        for m in entry_re.finditer(text):
            cur[m.group(1)] = m.group(2).strip().strip('"')
        if "descriptor" in cur or ("nodeId" in cur and "parentId" in cur):
            nodes[int(cur["nodeId"])] = (
                int(cur.get("parentId", -1)),
                float(cur.get("weight", 0.0)),
                np.asarray([int(x) for x in cur.get("descriptor", "").split()], np.uint8),
            )
        elif "wordId" in cur:
            words[int(cur["wordId"])] = int(cur["nodeId"])

    # OpenCV YAML wraps entries across lines (`- { ...,\n  descriptor:"..." }`
    # — the real small_orb_omni_voc_9_6.yml does this for every node), so
    # accumulate from each `- {` until the closing `}` before parsing.
    with open(path) as f:
        entry: Optional[str] = None
        for line in f:
            ls = line.strip()
            if entry is not None:
                entry += " " + ls
                if "}" in ls:
                    parse_entry(entry)
                    entry = None
                continue
            if ls.startswith("k:"):
                k = int(ls.split(":")[1])
            elif ls.startswith("L:"):
                depth = int(ls.split(":")[1])
            elif ls.startswith("nodes:"):
                section = "nodes"
            elif ls.startswith("words:"):
                section = "words"
            elif ls.startswith("- {"):
                if "}" in ls:
                    parse_entry(ls)
                else:
                    entry = ls
    n = max(nodes) + 2 if nodes else 1
    B = len(next(iter(nodes.values()))[2]) if nodes else 32
    node_desc = np.zeros((n, B), np.uint8)
    children_map: Dict[int, List[int]] = {}
    for nid, (parent, w, d) in nodes.items():
        if len(d) == B:
            node_desc[nid] = d
        children_map.setdefault(parent, []).append(nid)
    child_tab = np.full((n, k or 10), -1, np.int32)
    for p, ch in children_map.items():
        if 0 <= p < n:
            child_tab[p, : min(len(ch), child_tab.shape[1])] = ch[: child_tab.shape[1]]
    is_leaf = child_tab[:, 0] == -1
    word_id = np.full(n, -1, np.int32)
    weights = np.zeros(max(words) + 1 if words else 1, np.float32)
    for wid, nid in words.items():
        word_id[nid] = wid
        weights[wid] = nodes[nid][1] if nid in nodes else 1.0
    return Vocabulary(
        k=k or 10,
        depth=depth or 6,
        node_desc=node_desc,
        children=child_tab,
        is_leaf=is_leaf,
        word_id=word_id,
        word_weight=np.maximum(weights, 1e-6),
        node_level=np.zeros(n, np.int32),
    )
