"""Bloom-filter decontamination — the 100 TB scale path for the exact
eval-set contamination join (q87, reference analog: the same n-gram
overlap semantics the direct join computes).

Why a bloom filter: at 100 TB the corpus-side shingle relation is the
dominant cost, and q87's direct equi-join shuffles every (doc, ngram)
pair. The eval set (held-out benchmarks) is small and FIXED, so it can be
compressed into a bloom filter (~10 bits per distinct eval n-gram at 1%
fpp — 40× smaller than the n-gram strings, 6× smaller than a 64-bit hash
list) and probed MAP-SIDE: the corpus never shuffles for candidate
generation. Survivors (true matches + ~fpp false positives) then go
through an exact broadcast verify join, which removes every false
positive — so the final result is EXACTLY the direct join's answer, and
the whole operator keeps a full SQL oracle despite the probabilistic
prefilter (no false negatives: a bloom filter never drops a member).

Plan shape at scale:
    corpus scan → shingle explode (map-side) → bloom probe (map-side,
    Arrow-vectorized) → broadcast verify join (eval side tiny) →
    one aggregation on the surviving (train_doc, ngram) pairs.
The only shuffle is the final aggregation over survivors, whose size is
bounded by the true contamination volume + fpp·|corpus shingles|.

Construction is one Spark aggregation: each distinct eval n-gram sets k
bit positions (independent xxhash64 seeds — no 64-bit add/mul, so safe
under ANSI overflow checking); positions group into 64-bit words via
bit_or, and the collect is bounded at m/64 longs — size depends only on
the EVAL set, never the corpus (the one deliberate driver
materialization, same contract as the IVF training sample,
similarity.py). The probe is a vectorized Arrow-batched pandas UDF
(numpy gather + shift on the broadcast word array); hashes are computed
JVM-side so Python only ever sees int64 columns.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bloom_parameters", "build_bloom", "bloom_probe", "decontaminate"]


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a standard bloom filter: m = -n·ln p / ln²2 rounded
    up to a multiple of 64, k = (m/n)·ln 2 clamped to [1, 16]."""
    n = max(int(n_items), 1)
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, min(16, int(round(m / n * math.log(2)))))
    return m, k


def _positions(col: Column, m: int, k: int, seed: int) -> list[Column]:
    """k independent bit positions in [0, m) for a string column.

    Each position is its own xxhash64 with a distinct literal seed column —
    deliberately NOT the Kirsch-Mitzenmacher h1 + i·h2 form, whose 64-bit
    add/multiply would raise under Spark's ANSI overflow checking."""
    return [F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(m))
            for i in range(k)]


def build_bloom(df: DataFrame, col: str, fpp: float = 0.01,
                n_items: int | None = None, seed: int = 42,
                ) -> tuple[np.ndarray, int, int]:
    """Build a bloom filter over the distinct values of ``df[col]``.

    Returns (words, m, k): ``words`` is a dense uint64 array of m/64 bloom
    words. One aggregation job: explode the k positions per value, bit_or
    the masks per word, collect m/64 rows (bounded by the filter size, not
    the input). ``n_items`` skips the sizing pass when the caller already
    knows the distinct count.
    """
    if n_items is None:
        n_items = df.agg(
            F.approx_count_distinct(col).alias("n")).collect()[0]["n"]
    m, k = bloom_parameters(n_items, fpp)
    pos = F.explode(F.array(*_positions(F.col(col), m, k, seed))).alias("_pos")
    words = (df.select(pos)
             .select((F.col("_pos") / 64).cast("long").alias("_w"),
                     # F.shiftleft takes a Python-int shift; the per-row
                     # shift must go through the SQL form
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(_pos % 64 AS INT))").alias("_m"))
             .groupBy("_w").agg(F.bit_or("_m").alias("_bits"))
             .collect())
    arr = np.zeros(m // 64, dtype=np.uint64)
    for r in words:
        arr[r["_w"]] = np.int64(r["_bits"]).view(np.uint64) if r["_bits"] < 0 \
            else np.uint64(r["_bits"])
    return arr, m, k


def bloom_probe(df: DataFrame, col: str, words: np.ndarray, m: int, k: int,
                seed: int = 42, out_col: str = "_maybe") -> DataFrame:
    """Add boolean ``out_col``: True iff ``col``'s value MIGHT be in the
    filter (never False for a true member). Positions are computed JVM-side
    (xxhash64 codegen); the bit test is one vectorized numpy gather+shift
    per hash over Arrow batches — no per-row Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    w = words  # closure-captured; ~10 bits/item, shipped once per executor

    @pandas_udf("boolean")
    def _probe(*poss):  # legacy-style: *args defeats type-hint inference
        out = np.ones(len(poss[0]), dtype=bool)
        for p in poss:
            pv = p.to_numpy(dtype="int64")
            sh = (pv & 63).astype(np.uint64)
            out &= ((w[pv >> 6] >> sh) & np.uint64(1)).astype(bool)
        return pd.Series(out)

    return df.withColumn(out_col,
                         _probe(*_positions(F.col(col), m, k, seed)))


def decontaminate(corpus: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, fpp: float = 0.01, seed: int = 42) -> DataFrame:
    """(train_doc_id, n_shared_ngrams) for every corpus document sharing at
    least one verbatim n-gram with the eval set — EXACTLY the direct-join
    answer (bloom prefilter + exact verify; see module docstring).

    The verify side broadcasts the distinct eval n-grams, so the corpus
    relational path is scan → explode → probe → broadcast join → agg with
    a single shuffle (the final per-doc aggregation over survivors). The
    corpus shingles are NOT pre-deduped: countDistinct in the final
    aggregation already dedups per document, and a distinct pass would
    add a survivor-relation exchange before the verify join.
    """
    from etl_load_spark.operators.dedup import shingles_exploded

    ev = shingles_exploded(eval_df, id_col, text_col, n=n, distinct=False)
    ev_s = ev.select("_s").distinct()
    tr = shingles_exploded(corpus, id_col, text_col, n=n, distinct=False)
    words, m, k = build_bloom(ev_s, "_s", fpp=fpp, seed=seed)
    cand = (bloom_probe(tr, "_s", words, m, k, seed=seed)
            .filter(F.col("_maybe")).drop("_maybe"))
    return (cand.join(F.broadcast(ev_s), "_s")
            .groupBy(F.col("_id").alias("train_doc_id"))
            .agg(F.countDistinct("_s").cast("bigint").alias("n_shared_ngrams"))
            .orderBy("train_doc_id"))
