"""Bloom-filter decontamination (operators/bloom.py, q139).

The operator's contract is exactness-through-probabilism: the bloom
prefilter may pass false positives but never drops a member, and the
exact verify join removes every false positive — so the final answer
must be bit-identical to the direct eval⋈train join at ANY fpp.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_load_spark.operators.bloom import (bloom_parameters, bloom_probe,
                                            build_bloom, decontaminate)
from etl_load_spark.operators.dedup import shingles_exploded


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _direct_join(tr_shingles, ev_shingles):
    return (tr_shingles.join(ev_shingles.select("_s").distinct(), "_s")
            .groupBy(F.col("_id").alias("train_doc_id"))
            .agg(F.countDistinct("_s").cast("bigint")
                 .alias("n_shared_ngrams"))
            .orderBy("train_doc_id"))


def test_parameters_shape():
    m, k = bloom_parameters(1000, fpp=0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/item at 1%
    assert 1 <= k <= 16
    # degenerate sizing never divides by zero / returns m=0
    m0, k0 = bloom_parameters(0, fpp=0.5)
    assert m0 >= 64 and k0 >= 1
    with pytest.raises(ValueError):
        bloom_parameters(10, fpp=0.0)


@pytest.mark.parametrize("fpp", [0.5, 0.01])
def test_equals_direct_join_at_any_fpp(spark, sf_dir, fpp):
    """Even a deliberately terrible filter (fpp=0.5, many survivors) must
    produce the exact direct-join answer — verify deletes the noise."""
    d = _docs(spark, sf_dir)
    ev, tr = d.filter(F.col("doc_id") % 10 == 0), d.filter(
        F.col("doc_id") % 10 != 0)
    got = decontaminate(tr, ev, fpp=fpp).collect()
    want = _direct_join(
        shingles_exploded(tr, "doc_id", "text", n=8),
        shingles_exploded(ev, "doc_id", "text", n=8, distinct=False),
    ).collect()
    assert got == want and len(got) > 0


def test_no_false_negatives_and_fpp_bound(spark, sf_dir):
    """Every true member probes True (structural: its k bits were all
    set at build time); non-member pass rate stays near the target fpp."""
    d = _docs(spark, sf_dir)
    ev = shingles_exploded(d.filter(F.col("doc_id") % 10 == 0),
                           "doc_id", "text", n=8,
                           distinct=False).select("_s").distinct()
    tr = shingles_exploded(d.filter(F.col("doc_id") % 10 != 0),
                           "doc_id", "text", n=8)
    words, m, k = build_bloom(ev, "_s", fpp=0.01)
    # members: probe the build-side relation itself — all must pass
    n_ev = ev.count()
    n_ev_pass = (bloom_probe(ev, "_s", words, m, k)
                 .filter(F.col("_maybe")).count())
    assert n_ev_pass == n_ev
    # non-members: pass rate ≲ a few × fpp (sizing uses approx distinct)
    probed = bloom_probe(tr, "_s", words, m, k).filter(F.col("_maybe"))
    n_tr, n_cand = tr.count(), probed.count()
    n_true = tr.join(ev, "_s").count()
    fp_rate = (n_cand - n_true) / max(n_tr - n_true, 1)
    assert fp_rate < 0.05, fp_rate
    # and the filter is doing real work: most of the corpus is cut
    assert n_cand < 0.2 * n_tr


def test_empty_eval_set(spark, sf_dir):
    d = _docs(spark, sf_dir)
    empty = d.filter(F.lit(False))
    out = decontaminate(d.limit(50), empty)
    assert out.count() == 0
    assert out.columns == ["train_doc_id", "n_shared_ngrams"]


def test_bounded_driver_state(spark, sf_dir):
    """The collected bloom state is m/64 words — a function of the EVAL
    side only. 10× the corpus changes nothing about driver memory."""
    d = _docs(spark, sf_dir)
    ev = shingles_exploded(d.filter(F.col("doc_id") % 10 == 0),
                           "doc_id", "text", n=8,
                           distinct=False).select("_s").distinct()
    words, m, k = build_bloom(ev, "_s", fpp=0.01)
    assert isinstance(words, np.ndarray) and words.dtype == np.uint64
    assert len(words) == m // 64
    # ~10 bits/item at 1% fpp: sane sizing, not corpus-scaled
    n = ev.count()
    assert m < 32 * n + 6400


def test_plan_shape(spark, sf_dir):
    """Corpus path: no cartesian/nested-loop anywhere; the verify join is
    a broadcast (eval side never shuffles the corpus for candidates)."""
    from etl_load_spark.queries import QUERIES
    df = QUERIES["q139_bloom_decontaminate"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # probe is Arrow-batched
