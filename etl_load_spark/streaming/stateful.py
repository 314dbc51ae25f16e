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
        n, total_micros, mx = 0, None, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        # NULL values must match the batch twin exactly: F.floor propagates
        # NULL and SUM/MAX skip it (a NaN through np.floor(...).astype(
        # "int64") would silently poison total_micros), and SQL SUM over an
        # all-NULL group is NULL, not 0 — so drop NaNs before flooring and
        # keep the accumulator None until a non-null value arrives.
        vals = pdf["value"].dropna().to_numpy(dtype="float64")
        if len(vals):
            s = int(np.floor(vals * 1_000_000.0).astype("int64").sum())
            total_micros = s if total_micros is None else total_micros + s
            batch_max = float(vals.max())
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


try:  # transformWithState API shipped in Spark 4.0
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor \
        as _StatefulProcessorBase
except ImportError:  # pragma: no cover - older Spark
    _StatefulProcessorBase = object


class UserStatsProcessor(_StatefulProcessorBase):
    """transformWithStateInPandas form of the same per-key running stats:
    ValueState handle, same integer micro-unit accumulation -> same
    determinism contract as ``_update_user_stats``. Module-level class so
    the processor pickles to executors."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", STATS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        prev = self._state.get() if self._state.exists() else None
        n, total_micros, mx = prev if prev is not None else (0, None, None)
        for pdf in rows:
            if not len(pdf):
                continue
            n += len(pdf)
            # same NULL semantics as _update_user_stats: drop NaNs before
            # the floor; SUM over an all-NULL key stays NULL like SQL
            vals = pdf["value"].dropna().to_numpy(dtype="float64")
            if not len(vals):
                continue
            s = int(np.floor(vals * 1_000_000.0).astype("int64").sum())
            total_micros = s if total_micros is None else total_micros + s
            batch_max = float(vals.max())
            mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update((n, total_micros, mx))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_micros": [total_micros],
                            "max_value": [mx]})

    def close(self) -> None:
        pass


def stateful_user_stats_tws(events: DataFrame) -> DataFrame:
    """`transformWithStateInPandas` twin of ``stateful_user_stats`` —
    the current-generation arbitrary-state API (ValueState handles, timer
    support, optional TTL; requires the RocksDB state store provider).
    Batch input falls back to the same aggregate; streaming output per
    trigger carries the running state, identical to the
    applyInPandasWithState form (asserted equal in tests).
    """
    if not events.isStreaming:
        return stateful_user_stats(events)
    if _StatefulProcessorBase is object:
        raise NotImplementedError("transformWithState requires Spark >= 4.0")
    return (events.groupBy("user_id")
            .transformWithStateInPandas(statefulProcessor=UserStatsProcessor(),
                                        outputStructType=STATS_OUTPUT_SCHEMA,
                                        outputMode="Append",
                                        timeMode="None"))
