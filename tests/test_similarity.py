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


def test_lsh_table_buckets_not_degenerate(frames):
    """dim must match the embedding length; a mismatch NULL-pads zip_with
    and collapses every bucket to 0 (silent brute force). With the right
    dim the clustered fixture must spread across buckets."""
    v, _ = frames
    b = similarity.lsh_table_buckets(v, dim=DIM, tables=4, planes=4)
    per_table = {r["table"]: r["n"] for r in
                 b.groupBy("table").agg(
                     similarity.F.countDistinct("bucket").alias("n")
                 ).collect()}
    assert all(n > 1 for n in per_table.values()), per_table


def test_lsh_near_dup_pairs_equals_exact(frames):
    """Scale path (banded sign-LSH candidates + exact verification) must
    reproduce the all-pairs truth on the fixture: verification is exact, so
    equality == full candidate recall."""
    v, _ = frames
    got = {(r["id_a"], r["id_b"], r["sim"]) for r in
           similarity.lsh_near_dup_pairs(
               v, threshold=0.9, dim=DIM, tables=16, planes=4).collect()}
    want = set()
    for i, (ia, va) in enumerate(VECS):
        for ib, vb in VECS[i + 1:]:
            a = np.array(va, dtype=np.float64)
            b = np.array(vb, dtype=np.float64)
            d = np.sqrt((a * a).sum()) * np.sqrt((b * b).sum())
            s = round(float(a.dot(b) / d), 6) if d else 0.0
            if s >= 0.9:
                want.add((ia, ib, s))
    assert {(a, b) for a, b, _ in got} == {(a, b) for a, b, _ in want}
    # sims must be the exact cosines (same rounding)
    gm = {(a, b): s for a, b, s in got}
    for a, b, s in want:
        assert abs(gm[(a, b)] - s) < 1e-9


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


def test_ivf_train_refines_anchors(frames):
    """Lloyd refinement: trained anchors are unit-norm, the right shape,
    and the trained quantizer's recall matches or beats the fixed-anchor
    default on the clustered fixture."""
    v, q = frames
    anchors = similarity.ivf_train(v, dim=DIM, n_cells=8, iters=3)
    assert len(anchors) == 8 and all(len(a) == DIM for a in anchors)
    import math
    init = similarity._hyperplanes(DIM, 8)
    updated = 0
    for a, a0 in zip(anchors, init):
        if list(a) == list(a0):
            continue  # empty cell kept its init anchor
        updated += 1
        n = math.sqrt(sum(x * x for x in a))
        assert abs(n - 1.0) < 1e-9  # spherical update → unit norm
    assert updated > 0

    exact = {(r["qid"], r["vec_id"])
             for r in similarity.cosine_topk(v, q, k=5).collect()}

    def recall(anc):
        got = {(r["qid"], r["vec_id"]) for r in similarity.ivf_topk(
            v, q, k=5, dim=DIM, n_cells=8, n_probe=3, anchors=anc).collect()}
        return len(got & exact) / len(exact)

    r_fixed, r_trained = recall(None), recall(anchors)
    assert r_trained >= max(0.8, r_fixed - 0.05), (r_fixed, r_trained)


def test_lsh_multiprobe_widens_with_probe_bits(frames):
    """probe_bits must genuinely enumerate Hamming-≤b probes: raising it
    can only widen the candidate set (monotone recall), and probing every
    bit (probe_bits=planes) covers all 2^planes buckets → exact top-k."""
    import pytest as _pytest

    v, q = frames
    planes = 4

    def pairs(pb):
        return {(r["qid"], r["vec_id"]) for r in similarity.lsh_bucket_topk(
            v, q, k=5, dim=DIM, planes=planes, probe_bits=pb).collect()}

    exact = {(r["qid"], r["vec_id"])
             for r in similarity.cosine_topk(v, q, k=5).collect()}
    p1, p2, pall = pairs(1), pairs(2), pairs(planes)
    assert pall == exact  # full probe = brute force
    assert len(p1 & exact) <= len(p2 & exact) <= len(pall & exact)
    with _pytest.raises(ValueError, match="probe_bits"):
        similarity.lsh_bucket_topk(v, q, planes=planes, probe_bits=5)


def test_ivf_recall_and_exact_sims(frames):
    """IVF probing on the clustered fixture: probed-cell candidates must
    recover most exact neighbors, and every returned sim must equal the
    exact cosine (scoring is exact; only candidate coverage is approximate)."""
    v, q = frames
    exact = similarity.cosine_topk(v, q, k=5).collect()
    approx = similarity.ivf_topk(v, q, k=5, dim=DIM,
                                 n_cells=8, n_probe=3).collect()
    exact_set = {(r["qid"], r["vec_id"]) for r in exact}
    approx_set = {(r["qid"], r["vec_id"]) for r in approx}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.8
    exact_sims = {(r["qid"], r["vec_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["qid"], r["vec_id"])
        if key in exact_sims:
            assert r["sim"] == exact_sims[key]


def test_ivf_train_skips_malformed_vectors(spark):
    """Poison-row philosophy in training (r3 advice): NULL elements, wrong
    length, or whole-NULL vectors must be skipped, not crash the driver
    with a TypeError on cell=None."""
    rows = [(i, [1.0 if j == i % 4 else 0.1 * j for j in range(4)])
            for i in range(8)]
    rows += [(100, [1.0, None, 0.0, 0.0]),   # NULL element
             (101, [1.0, 0.0]),              # wrong length
             (102, None)]                    # whole-NULL
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    anchors = similarity.ivf_train(df, dim=4, n_cells=2, iters=2)
    assert len(anchors) == 2
    assert all(len(a) == 4 and all(x is not None for x in a)
               for a in anchors)
