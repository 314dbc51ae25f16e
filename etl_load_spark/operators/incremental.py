"""Batch high-water-mark (HWM) incremental ingestion.

The JDBC-era incremental pattern the reference's chunked readers serve
(ItemReaderFactory.java cursor reads; the design docx's JdbcPagingItemReader
discussion): a monotonically increasing source column (id / updated_at)
identifies new rows; each run ingests only ``column > mark`` and advances
the persisted mark after a successful write. The streaming block is the
file-source equivalent (checkpoint-tracked); this form works on ANY batch
source — for JDBC-shaped endpoints the predicate pushes down into the
remote WHERE clause, so the source database only ships the delta.

Scale: the filter reaches the scan (predicate pushdown / partition pruning
when the table is partitioned on the mark column), the new-mark computation
is a single MAX over the already-filtered batch, and state is one tiny JSON
document — no per-row bookkeeping anywhere.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import tempfile

from pyspark.sql import Column, DataFrame, functions as F


def load_mark(state_path: str):
    """Read the persisted high-water mark; None when no state exists yet."""
    if not os.path.exists(state_path):
        return None
    with open(state_path) as f:
        return json.load(f).get("high_water_mark")


def save_mark(state_path: str, column: str, value, job_id: str) -> None:
    """Atomically persist the mark (write-temp + rename; a crashed run
    leaves the previous state intact, so the next run re-ingests the
    failed batch — at-least-once, the same contract as a task retry)."""
    d = os.path.dirname(os.path.abspath(state_path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".hwm_")
    with os.fdopen(fd, "w") as f:
        json.dump({"column": column, "high_water_mark": value,
                   "job_id": job_id}, f)
    os.replace(tmp, state_path)


def hwm_predicate(df: DataFrame, column: str, mark) -> Column:
    """``column > mark`` with the mark cast to the column's own type, so
    numeric, decimal, date and timestamp marks all compare natively (and
    the predicate stays pushdown-eligible)."""
    dt = dict(df.dtypes)[column]
    return F.col(column) > F.lit(str(mark)).cast(dt)


def serialize_mark(v):
    """Serialize a mark value for the JSON state file (None passes through:
    empty batch → no mark advance)."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
            else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def batch_max(df: DataFrame, column: str):
    """MAX(column) over the batch, serialized for the JSON state file.
    None when the batch is empty.

    NOTE: this runs a second action over the source plan. For file sources
    that re-read the same snapshot (InMemoryFileIndex lists files at read
    time), but for LIVE sources (JDBC) rows committed between the load and
    this max would advance the mark past data never written — which is why
    the runner uses ``attach_hwm_observation`` (the mark rides the write
    action itself) and this helper is for tests/ad-hoc use only."""
    row = df.agg(F.max(column).alias("m")).collect()[0]
    return serialize_mark(row["m"])


def attach_hwm_observation(df: DataFrame, column: str):
    """Attach a CollectMetrics node computing MAX(column) to the batch plan
    and return ``(df, observation)``.

    The new high-water mark is computed by the JOB'S OWN first action over
    this plan — never a second query against a live source (a JDBC table
    can receive commits between the write and a re-executed max; those
    rows would be skipped forever). Zero extra passes: CollectMetrics
    folds a map-side max into the existing scan.

    Safety direction: for mapping jobs the first action is the error
    split's count, and the write may re-scan a LIVE source at a later
    snapshot if the intermediate cache is evicted — in that case the mark
    LAGS the written rows, so the next run re-ingests the tail
    (at-least-once; the sink's append-mode contract documents idempotent
    re-runs). The mark can never EXCEED the written data — the loss mode
    of the re-query design this replaces — because every later action
    scans at least the first action's snapshot."""
    from pyspark.sql import Observation
    obs = Observation()
    return df.observe(obs, F.max(F.col(column)).alias("hwm")), obs


def observed_mark(obs) -> object:
    """Serialized mark from a completed observation (call only after the
    write action finished; ``Observation.get`` would otherwise block)."""
    return serialize_mark(obs.get.get("hwm"))
