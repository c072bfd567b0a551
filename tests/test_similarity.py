"""Embedding similarity: exact brute-force top-k and LSH-bucketed ANN."""

import numpy as np
import pytest

from langid_mr_spark import similarity

DIM = 8
RNG = np.random.default_rng(7)

# three tight clusters around fixed centers
CENTERS = np.array([
    [1, 0, 0, 0, 1, 0, 0, 0],
    [0, 1, 0, 1, 0, 0, 1, 0],
    [0, 0, 1, 0, 0, 1, 0, 1],
], dtype=np.float64)
VECS = []
for i in range(60):
    c = CENTERS[i % 3]
    VECS.append((i, (c + RNG.normal(0, 0.05, DIM)).astype(np.float32).tolist()))
QUERIES = [(q, CENTERS[q].astype(np.float32).tolist()) for q in range(3)]


@pytest.fixture(scope="module")
def frames(spark):
    v = spark.createDataFrame(VECS, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(QUERIES, "qid long, qvec array<float>")
    return v, q


def _np_topk(qvec, k=5):
    sims = []
    for vid, vec in VECS:
        a, b = np.array(vec, dtype=np.float64), np.array(qvec, dtype=np.float64)
        d = np.sqrt((a * a).sum()) * np.sqrt((b * b).sum())
        sims.append((vid, float(a.dot(b) / d) if d else 0.0))
    sims.sort(key=lambda x: (-x[1], x[0]))
    return [vid for vid, _ in sims[:k]]


def test_cosine_topk_exact(frames):
    v, q = frames
    got = similarity.cosine_topk(v, q, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["sim"]))
    for qid, qvec in QUERIES:
        ranked = [vid for _, vid, _ in sorted(by_q[qid])]
        assert ranked == _np_topk(qvec)
        assert all(-1.0 <= s <= 1.0 for _, _, s in by_q[qid])


def test_lsh_recall(frames):
    v, q = frames
    exact = similarity.cosine_topk(v, q, k=5).collect()
    approx = similarity.lsh_bucket_topk(v, q, k=5, dim=DIM, planes=4).collect()
    exact_set = {(r["qid"], r["vec_id"]) for r in exact}
    approx_set = {(r["qid"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # clustered fixture: same-cluster vectors share sign patterns
    assert recall >= 0.8
    # approximate sims must still be true cosines (subset, same values)
    exact_sims = {(r["qid"], r["vec_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["qid"], r["vec_id"])
        if key in exact_sims:
            assert r["sim"] == exact_sims[key]
