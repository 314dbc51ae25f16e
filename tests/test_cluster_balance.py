"""Anchor-based cluster assignment + balanced sampling (q140) and
source-divergence scoring (q141) — structural properties beyond the
DuckDB oracle gate (which covers cross-engine value parity)."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from etl_load_spark.operators.similarity import (anchor_assign,
                                                 cluster_balanced_sample,
                                                 min_id_anchors)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_assignment_is_map_side(spark, emb):
    """Anchors ride in the kernel closure: the assignment plan is one
    scan-fused Arrow kernel — no Exchange, no row-at-a-time Python.
    (r13: the per-anchor Column-expression form was replaced by the
    vectorized kernel — L interpreted HOF folds per row became one
    matmul per batch; ArrowEvalPython is the documented vectorized
    path, BatchEvalPython stays banned.)"""
    asg = anchor_assign(emb, min_id_anchors(emb))
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_assignment_matches_bruteforce(spark, emb):
    """Every vector lands on its true argmax anchor (round-6 sim,
    lowest-anchor tiebreak) — checked against a numpy recomputation."""
    import numpy as np
    anchors = min_id_anchors(emb)
    got = {r["vec_id"]: r["cluster"]
           for r in anchor_assign(emb, anchors).collect()}
    av = np.array([v for _, v in anchors], dtype=np.float64)
    av = av / np.linalg.norm(av, axis=1, keepdims=True)
    for r in emb.limit(200).collect():
        x = np.array(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(x)
        sims = np.round(av @ (x / n), 6) if n > 0 else np.full(len(av), -2.0)
        best = max(range(len(av)), key=lambda i: (sims[i], -anchors[i][0]))
        assert got[r["vec_id"]] == anchors[best][0]


def test_zero_vector_takes_sentinel_cluster(spark):
    """A zero-norm embedding must deterministically join the lowest-id
    anchor (the -2.0 sentinel path), not crash ANSI division or track
    engine NULL-ordering."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>")
    anchors = [(5, [1.0, 0.0]), (9, [0.0, 1.0])]
    got = {r["vec_id"]: r["cluster"]
           for r in anchor_assign(df, anchors).collect()}
    assert got == {1: 5, 2: 9, 3: 5}


def test_balance_keeps_smallest_cluster_whole(spark, emb):
    """u·n_members < n_min·1e6 is always true when n_members == n_min:
    the smallest cluster survives intact — rare modes are never thinned."""
    asg = anchor_assign(emb, min_id_anchors(emb))
    counts = {r["cluster"]: r["n_members"] for r in
              asg.groupBy("cluster").agg(
                  F.count(F.lit(1)).alias("n_members")).collect()}
    n_min = min(counts.values())
    kept = {r["cluster"]: r["n"] for r in
            cluster_balanced_sample(asg).groupBy("cluster").agg(
                F.count(F.lit(1)).alias("n")).collect()}
    for c, n in counts.items():
        if n == n_min:
            assert kept.get(c) == n
        # thinned clusters land near the target (binomial tail bound)
        assert kept.get(c, 0) <= n
    total_kept = sum(kept.values())
    assert total_kept <= len(counts) * n_min * 1.35 + 10


def test_balance_deterministic(spark, emb):
    asg = anchor_assign(emb, min_id_anchors(emb))
    a = sorted(r["vec_id"] for r in cluster_balanced_sample(asg).collect())
    b = sorted(r["vec_id"] for r in cluster_balanced_sample(asg).collect())
    assert a == b and len(a) > 0


def test_tv_divergence_exact_small_fixture(spark, tmp_path):
    """Hand-computed total-variation check: corpus of two sources with
    known unigram counts; the query's integer rearrangement must equal
    the exact Fraction arithmetic."""
    rows = [(1, "a a b", "x", "s1", 5), (2, "b c", "x", "s2", 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(p)
    from etl_load_spark.queries import QUERIES
    out = {r["source"]: r for r in
           QUERIES["q141_source_divergence"].fn(
               spark, str(tmp_path)).collect()}
    # s1: tokens a,a,b (n=3); s2: b,c (n=2); global: a2 b2 c1 (n=5)
    tv1 = (abs(Fraction(2, 3) - Fraction(2, 5))
           + abs(Fraction(1, 3) - Fraction(2, 5))
           + Fraction(1, 5)) / 2
    tv2 = (abs(Fraction(1, 2) - Fraction(2, 5))
           + abs(Fraction(1, 2) - Fraction(1, 5))
           + Fraction(2, 5)) / 2
    assert out["s1"]["n_tokens"] == 3 and out["s1"]["vocab"] == 2
    assert out["s2"]["n_tokens"] == 2 and out["s2"]["vocab"] == 2
    assert out["s1"]["tv_divergence"] == pytest.approx(float(tv1), abs=0)
    assert out["s2"]["tv_divergence"] == pytest.approx(float(tv2), abs=0)


def test_repeated_spans_planted(spark, tmp_path):
    """q142 structural check: an exact duplicate pair scores
    repetition_ratio 1.0 on both copies; a unique doc scores 0.0."""
    twenty = " ".join(f"w{i}" for i in range(20))
    uniq = " ".join(f"u{i}" for i in range(20))
    rows = [(1, twenty, "en", "web", 1), (2, twenty, "en", "web", 1),
            (3, uniq, "en", "web", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))
    from etl_load_spark.queries import QUERIES
    out = {r["doc_id"]: r for r in
           QUERIES["q142_repeated_spans"].fn(spark, str(tmp_path)).collect()}
    assert out[1]["repetition_ratio"] == 1.0
    assert out[2]["repetition_ratio"] == 1.0
    assert out[3]["repetition_ratio"] == 0.0
    assert out[1]["n_windows"] == 5       # 20 tokens -> 5 16-gram windows


def test_span_dedup_planted(spark, tmp_path):
    """q145 structural check: an exact duplicate doc is fully cut (its
    every window is a non-first occurrence), the original survives
    intact, and a half-overlapping doc loses exactly its repeated spans."""
    twenty = " ".join(f"w{i}" for i in range(20))
    uniq = " ".join(f"u{i}" for i in range(20))
    half = " ".join(f"w{i}" for i in range(16)) + " " + \
        " ".join(f"h{i}" for i in range(4))
    rows = [(1, twenty, "en", "web", 1), (2, twenty, "en", "web", 1),
            (3, uniq, "en", "web", 1), (4, half, "en", "web", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))
    from etl_load_spark.queries import QUERIES
    out = {r["doc_id"]: r for r in
           QUERIES["q145_span_dedup"].fn(spark, str(tmp_path)).collect()}
    import hashlib
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    # doc 1: first occurrence everywhere -> untouched
    assert out[1]["n_cut"] == 0 and out[1]["cleaned_md5"] == md5(twenty)
    # doc 2: byte-identical copy -> fully cut
    assert out[2]["n_cut"] == 20 and out[2]["cleaned_md5"] == md5("")
    # doc 3: unique -> untouched
    assert out[3]["n_cut"] == 0 and out[3]["cleaned_md5"] == md5(uniq)
    # doc 4: its window at position 0 (w0..w15) repeats doc 1's -> those
    # 16 tokens cut, the h-suffix survives
    assert out[4]["n_cut"] == 16
    assert out[4]["cleaned_md5"] == md5(" ".join(f"h{i}" for i in range(4)))
