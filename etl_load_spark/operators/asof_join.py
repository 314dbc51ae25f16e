"""As-of join — attach to each left row the most recent right row at or
before its timestamp, per key.

The reference engine has no joins at all (SURVEY.md §2.3 — single-source
jobs, multi-table work pushed into hand-written source SQL); the as-of join
is part of the extension surface the north star requires for time-series /
event data.

Scale design: the naive formulation is a range join (``r.ts <= l.ts``) plus
a per-left-row argmax — O(n·m) candidate pairs for hot keys, and a second
shuffle for the argmax. This implementation instead **unions the two sides
and runs one window** over (key, ts): a single shuffle, no join operator at
all, no candidate blow-up regardless of key skew. The right row's payload
travels as one struct so a single ``last(_, ignorenulls=True)`` running
aggregate (rows-unbounded-preceding — Spark evaluates it in one pass over
each sorted partition) carries the latest-seen right row forward onto every
subsequent left row. This is the same union-scan strategy pandas.merge_asof
uses per group, expressed as a distributed window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str | None = None,
              tolerance: Column | None = None,
              how: str = "left") -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` key group.

    Equivalent SQL (DuckDB): ``l ASOF [LEFT] JOIN r ON l.k = r.k AND
    l.ts >= r.ts``. Right payload columns appear with their own names
    (pre-alias to avoid collisions with left columns). ``tolerance`` is an
    optional interval Column (e.g. ``F.expr("INTERVAL 1 HOUR")``): matches
    older than ``left_ts - tolerance`` are treated as no-match.

    NULL contract (predicate semantics, three-valued logic): a NULL key or
    NULL timestamp can never satisfy ``l.k = r.k AND l.ts >= r.ts``, so
    such left rows come through unmatched and such right rows match
    nothing. Note DuckDB's native ASOF JOIN differs here — its sort-based
    implementation matches NULL order keys to each other by total order;
    this operator follows the join-condition contract instead
    (differential-tested in tests/test_asof.py).

    ``how``: "left" keeps unmatched left rows (right columns null);
    "inner" drops them.
    """
    right_ts = right_ts or left_ts
    on = list(on)
    payload_cols = [c for c in right.columns if c not in on]
    if not payload_cols:
        raise ValueError("right side has no payload columns besides keys")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload collides with left columns: "
                         f"{sorted(overlap)}; alias the right side first")

    # SQL ASOF semantics on NULLs: `l.k = r.k AND l.ts >= r.ts` can never
    # be true through a NULL key or NULL right_ts — but the union-window
    # form below groups NULL keys into their OWN partition (window
    # partitioning, like GROUP BY, treats NULLs as equal), which would
    # silently match NULL-key rows to each other. Dropping such right rows
    # restores the SQL contract exactly: NULL-key/NULL-ts left rows keep
    # flowing through the window, find no side-0 row, and come out
    # unmatched (how=left) or dropped (how=inner), same as the join form.
    null_free = F.lit(True)
    for k in [*on, right_ts]:
        null_free = null_free & F.col(k).isNotNull()
    right = right.filter(null_free)

    # One unioned relation: right rows sort before left rows at equal ts
    # (side 0 < 1) so an exact-ts right row is visible to its left row.
    carry = [c for c in left.columns if c not in on and c != left_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*payload_cols).alias(_PAYLOAD),
        *[F.lit(None).alias(c) for c in carry],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *carry,
    )
    w = (W.partitionBy(*on).orderBy(_TS, _SIDE)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = (l.unionByName(r.select(*l.columns))
               .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
               .withColumn(_TS + "_r",
                           F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)),
                                  ignorenulls=True).over(w))
               .filter(F.col(_SIDE) == 1))
    if tolerance is not None:
        in_window = F.col(_TS + "_r") >= F.col(_TS) - tolerance
        matched = matched.withColumn(
            _PAYLOAD, F.when(in_window, F.col(_PAYLOAD)))
    if how == "inner":
        matched = matched.filter(F.col(_PAYLOAD).isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r} (left|inner)")
    return matched.select(
        *on,
        F.col(_TS).alias(left_ts),
        *carry,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload_cols],
    )
