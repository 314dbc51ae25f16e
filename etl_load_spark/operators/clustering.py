"""Z-order (Morton) clustering for multi-column file skipping.

``range_by`` (writers.py) clusters files on ONE key: footer min/max stats
are tight on that key, so predicates on it skip files. Z-ordering
generalizes to several columns: each column is linearly bucketed into
2^bits bins between its global min and max, the bucket bits are
interleaved into one Morton code, and the write range-partitions + sorts
on that code. Nearby codes are nearby in EVERY dimension, so each file
covers a small hyper-rectangle and predicates on ANY clustered column
skip most files — the Delta/Iceberg OPTIMIZE ZORDER idea as a plain
layout transformation.

Scale: one extra aggregate over the batch for per-column min/max, then a
single repartitionByRange on the code (one shuffle — the same shuffle any
clustered write pays). The code is a pure codegen'd expression
(bits × columns shift/or terms); linear bucketing is the simple variant —
rank-based bucketing (approx quantiles) handles heavy skew and plugs into
the same interleave.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def morton_interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each bucket column into one code.
    Bit b of column i lands at position b*ncols + i (MSB-major across
    columns), giving the classic Z-curve order."""
    ncols = len(bucket_cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(bucket_cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * ncols + i))
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_code(df: DataFrame, cols: list[str], bits: int = 8,
                method: str = "linear") -> Column:
    """Morton code over per-column buckets. Null values bucket to 0.

    ``method="linear"``: equal-width bins between global min/max (ONE
    extra aggregate job). Right when values are roughly uniform.
    ``method="rank"``: equal-FREQUENCY bins from approxQuantile
    boundaries (a mergeable sketch pass) — the skew-robust form: a
    power-law column still spreads across all 2^bits buckets instead of
    collapsing into one, at the cost of a when-chain of 2^bits-1
    codegen'd comparisons per row (keep bits ≤ 6 for this method).
    """
    buckets = []
    if method == "rank":
        nb = 1 << bits
        for c in cols:
            qs = df.stat.approxQuantile(
                c, [i / nb for i in range(1, nb)], 0.001)
            b = F.lit(0).cast("long")
            for i, boundary in enumerate(qs):
                b = F.when(F.col(c).cast("double") > float(boundary),
                           F.lit(i + 1).cast("long")).otherwise(b)
            buckets.append(F.coalesce(b, F.lit(0).cast("long")))
        return morton_interleave(buckets, bits)
    stats = df.agg(*[f(c).alias(f"{n}_{c}") for c in cols
                     for n, f in (("mn", F.min), ("mx", F.max))]).collect()[0]
    for c in cols:
        lo, hi = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = float(hi - lo) if hi is not None and hi != lo else 1.0
        frac = (F.coalesce(F.col(c).cast("double"), F.lit(float(lo or 0)))
                - float(lo or 0)) / span
        b = F.least(F.greatest(F.floor(frac * ((1 << bits) - 1)), F.lit(0)),
                    F.lit((1 << bits) - 1)).cast("long")
        buckets.append(b)
    return morton_interleave(buckets, bits)


def zorder_layout(df: DataFrame, cols: list[str], n_files: int,
                  bits: int = 8, method: str = "linear") -> DataFrame:
    """Range-partition + sort by the Morton code → n_files files, each
    covering a compact hyper-rectangle of the clustered columns."""
    coded = df.withColumn("_zcode", zorder_code(df, cols, bits, method))
    return (coded.repartitionByRange(n_files, "_zcode")
            .sortWithinPartitions("_zcode")
            .drop("_zcode"))
