"""Banded range join — the scale path for theta/band joins.

``a JOIN b ON b.val BETWEEN a.val - w AND a.val + w`` executes as
broadcast-nested-loop when one side is small; when both sides are large
that is O(n·m). This operator rewrites the band condition into an equi-join:
bucket both sides by floor(val/width), explode one side to its adjacent
buckets, equi-join on the bucket, then apply the exact residual predicate.
One shuffle on the bucket key, candidates bounded by band width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def band_join(left: DataFrame, right: DataFrame,
              left_val: str, right_val: str, width: float,
              how: str = "inner") -> DataFrame:
    """Join rows where |left.val - right.val| <= width via bucket blocking.

    Output columns: all left columns + all right columns (caller should
    pre-select/alias to avoid collisions).
    """
    bucket = lambda c: F.floor(F.col(c) / width).cast("bigint")  # noqa: E731
    l = left.withColumn("_lb", bucket(left_val))
    # each right row probes its own bucket and both neighbors: any pair
    # within `width` differs by at most one bucket index
    r = (right
         .withColumn("_rb0", bucket(right_val))
         .withColumn("_lb", F.explode(F.array(F.col("_rb0") - 1, F.col("_rb0"),
                                              F.col("_rb0") + 1)))
         .drop("_rb0"))
    # Residual must be the CONTRACT expression `r BETWEEN l-w AND l+w`,
    # not `abs(l-r) <= w`: the two round differently at exact band edges
    # (e.g. cents data where r-l is exactly 50.00 — `abs(l-r)` rounds the
    # subtraction while `l+w` rounds the addition, and IEEE disagreement
    # of 1 ulp flips membership; found as a real sf0.1 oracle mismatch).
    # Every SQL engine evaluates BETWEEN this way, so this form is the
    # bit-exact one.
    residual = ((F.col(right_val) >= F.col(left_val) - width)
                & (F.col(right_val) <= F.col(left_val) + width))
    return l.join(r, on=["_lb"], how=how).filter(residual).drop("_lb")
