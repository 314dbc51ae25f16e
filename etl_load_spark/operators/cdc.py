"""CDC Type-1 apply: fold a change feed (insert/update/delete) into a
snapshot.

The reference loads append-only (INSERT batches, ItemWriterFactory.java's
builder); its design docx discusses update flows but never implements one.
This operator supplies the batch MERGE the 100 TB lakehouse pattern needs:
``new_snapshot = apply_changes(snapshot, changes)`` with last-writer-wins
per key, delete support, and deterministic tie-breaking.

Scale shape: one shuffle of the (much smaller) change feed to pick the
latest change per key, then ONE key-partitioned join against the snapshot
— the snapshot itself never re-shuffles twice. Rows without changes pass
through untouched; with the snapshot stored partitioned/bucketed on the
key, AQE plans the join without moving unchanged partitions. Type-2
(history-keeping) semantics live in operators/scd.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def latest_changes(changes: DataFrame, keys: list[str], seq_col: str,
                   op_col: str = "op") -> DataFrame:
    """Collapse a change feed to the LAST change per key: the highest seq
    wins, and on a same-seq tie the op ordered ASCENDING makes the
    tiebreak deterministic with 'D' < 'I' < 'U' — a delete at the same
    sequence number beats an upsert (the conservative choice: a key that
    both died and changed at the same instant stays dead)."""
    w = W.partitionBy(*keys).orderBy(F.col(seq_col).desc(),
                                     F.col(op_col).asc())
    return (changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def apply_changes(snapshot: DataFrame, changes: DataFrame, keys: list[str],
                  seq_col: str, op_col: str = "op") -> DataFrame:
    """New snapshot = snapshot ⟂ changed-keys ∪ latest non-delete changes.

    ``changes`` carries the full row payload for I/U ops plus ``op_col``
    (values I/U/D) and ``seq_col`` (monotone change order). Unchanged rows
    survive via an anti join (no payload comparison); the latest I/U per
    key replaces/creates its row; keys whose latest op is D disappear.
    """
    last = latest_changes(changes, keys, seq_col, op_col)
    keep_cols = [c for c in snapshot.columns]
    upserts = (last.filter(F.col(op_col) != "D")
               .select(*[F.col(c) for c in keep_cols]))
    unchanged = snapshot.join(last.select(*keys), keys, "left_anti")
    return unchanged.unionByName(upserts)
