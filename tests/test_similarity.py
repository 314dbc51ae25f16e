"""Similarity-search quality: brute-force exactness vs numpy, LSH recall vs
the exact baseline, band-join equivalence."""

import math

import pytest
from pyspark.sql import functions as F

from etl_load_spark.operators.similarity import (
    cosine_topk, embedding_near_dup_pairs, lsh_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(80):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(16)]))
    # planted near-duplicate of vector 0 (tiny perturbation)
    base = rows[0][1]
    rows.append((900, [x + 0.001 for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_topk(rows, q_id, k):
    qv = next(v for i, v in rows if i == q_id)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    scored = sorted(((round(cos(qv, v), 6), i) for i, v in rows if i != q_id),
                    key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_bruteforce_matches_reference(spark, vectors):
    rows = [(r.vec_id, [float(x) for x in r.embedding])
            for r in vectors.collect()]
    out = cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=5)
    got = [r.n_id for r in out.collect()]
    assert got == _np_topk(rows, 0, 5)
    assert got[0] == 900  # the planted near-duplicate ranks first


def test_lsh_recall_vs_exact(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id)
             for r in cosine_topk(vectors, queries, k=3).collect()}
    approx = {(r.q_id, r.n_id)
              for r in lsh_topk(vectors, queries, k=3, dim=16,
                                n_planes=16, bands=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_embedding_near_dup_finds_planted(spark, vectors):
    pairs = {(r.id_a, r.id_b)
             for r in embedding_near_dup_pairs(vectors, threshold=0.99,
                                               dim=16).collect()}
    assert (0, 900) in pairs


def test_ivf_recall_vs_exact(spark, vectors):
    from etl_load_spark.operators.similarity import ivf_topk
    queries = vectors.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id)
             for r in cosine_topk(vectors, queries, k=3).collect()}
    approx = {(r.q_id, r.n_id)
              for r in ivf_topk(vectors, queries, k=3,
                                n_cells=4, n_probe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_full_probe_is_exact(spark, vectors):
    """n_probe = n_cells degrades to exact brute force."""
    from etl_load_spark.operators.similarity import ivf_topk
    queries = vectors.filter(F.col("vec_id") < 5)
    exact = [(r.q_id, r.n_id, r.cosine_sim)
             for r in cosine_topk(vectors, queries, k=3).collect()]
    full = [(r.q_id, r.n_id, r.cosine_sim)
            for r in ivf_topk(vectors, queries, k=3,
                              n_cells=4, n_probe=4).collect()]
    assert exact == full
