"""Custom stateful streaming operator (SURVEY.md §2.7, U1-adjacent): per-key
running statistics via ``applyInPandasWithState``.

This is the shape Spark's built-in windowed aggregates can't express: state
that survives across triggers with operator-defined contents and emission.
The reference has no data-plane streaming at all (its Kafka/AQ layer moves
job configs — wfqueuelistener.java:130, OracleAQListener.java:38); semantics
here are defined Spark-first.

Determinism contract (so the DuckDB oracle can hash-compare): totals are
accumulated as integer micro-units (floor(value·1e6) per event, summed as
int64) — integer addition is order-independent where float addition is not,
so the result is bit-identical no matter how rows are batched across
triggers or partitions.

Scale: state is one small tuple per key, partitioned by the grouping key
across executors; the state store is RocksDB-backed on a real cluster and
bounded by key cardinality, not stream length.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

STATS_OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, "
                       "total_micros bigint, max_value double")
STATS_STATE_SCHEMA = "n bigint, total_micros bigint, mx double"


def _update_user_stats(key: Tuple, pdfs: Iterator[pd.DataFrame],
                       state) -> Iterator[pd.DataFrame]:
    """State update: fold each Arrow batch into (count, Σ micros, max)."""
    if state.exists:
        n, total_micros, mx = state.get
    else:
        n, total_micros, mx = 0, 0, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        micros = np.floor(pdf["value"].to_numpy(dtype="float64")
                          * 1_000_000.0).astype("int64")
        total_micros += int(micros.sum())
        batch_max = float(pdf["value"].max())
        mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, total_micros, mx))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_micros": [total_micros], "max_value": [mx]})


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, total, max) with unbounded-by-key state.

    Streaming input → one emission per key per trigger carrying the state
    *so far* (monotone n_events; the final emission equals the batch
    aggregate). Batch input → same result via the plain aggregate path.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F
        return (events.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.floor(F.col("value") * 1_000_000.0).cast("bigint"))
                      .alias("total_micros"),
                     F.max("value").alias("max_value")))
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (events.groupBy("user_id")
            .applyInPandasWithState(_update_user_stats,
                                    STATS_OUTPUT_SCHEMA, STATS_STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
