"""SCD Type-2 dimension merge (the warehouse upsert-with-history pattern).

The reference engine loads dimensions with truncate-or-append only
(TruncateTasklet.java:54-111 / batch insert, SURVEY §2.1 S7/S10); history-
preserving merges are the standard next step a warehouse ETL needs, so the
engine provides them as first-class dataframe algebra.

Contract: the dimension carries (key_cols, attr_cols, valid_from, valid_to,
is_current). An incoming update row produces
  - nothing, when every tracked attribute is null-safe-equal to the current
    version (no-op updates must NOT fork a new version);
  - a closed-out old version (valid_to = effective date, is_current=false)
    plus a new open version, when any attribute changed;
  - a single new open version, when the key is new.
History rows (is_current=false) pass through untouched.

Scale: two shuffles on the dimension key (change-detection join + the
anti/semi splits reuse the same partitioning under AQE); history rows never
join anything. In a lakehouse deployment the same algebra backs MERGE INTO;
partitioning the stored dimension by is_current means only the current
partition is rewritten — history files are immutable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

META_COLS = ("valid_from", "valid_to", "is_current")


def _any_attr_differs(attr_cols: list[str], old_prefix: str) -> Column:
    return reduce(lambda a, b: a | b,
                  [~F.col(a).eqNullSafe(F.col(f"{old_prefix}{a}"))
                   for a in attr_cols])


def scd2_merge(dim: DataFrame, updates: DataFrame, key_cols: list[str],
               attr_cols: list[str], effective_date) -> DataFrame:
    """Merge ``updates`` (key_cols + attr_cols) into an SCD2 ``dim``.

    ``effective_date`` is a Column (or literal-castable value) stamped on
    closed-out rows' valid_to and new versions' valid_from.
    """
    eff = effective_date if isinstance(effective_date, Column) \
        else F.lit(effective_date).cast("date")
    cur = dim.filter(F.col("is_current"))
    old = cur.select(*key_cols,
                     *[F.col(a).alias(f"__old_{a}") for a in attr_cols])
    # change detection: left join current versions onto the updates — a row
    # forks when the key is new (no current version) or any attribute
    # null-safe-differs
    j = updates.join(old, on=key_cols, how="left")
    # new keys join all-null __old_ columns, so any non-null update attr
    # null-safe-differs and the row forks into `fresh` (its `closed` semi
    # join then matches nothing) — one predicate covers changed AND new
    changed = j.filter(_any_attr_differs(attr_cols, "__old_"))
    change_keys = changed.select(*key_cols)
    history = dim.filter(~F.col("is_current"))
    untouched = cur.join(change_keys, on=key_cols, how="left_anti")
    closed = (cur.join(change_keys, on=key_cols, how="left_semi")
              .withColumn("valid_to", eff)
              .withColumn("is_current", F.lit(False)))
    fresh = (changed.select(*key_cols, *attr_cols)
             .withColumn("valid_from", eff)
             .withColumn("valid_to", F.lit(None).cast(dim.schema["valid_to"].dataType))
             .withColumn("is_current", F.lit(True)))
    return history.unionByName(untouched).unionByName(closed) \
                  .unionByName(fresh.select(*dim.columns))


def as_scd2(df: DataFrame, valid_from, key_cols: list[str] | None = None) -> DataFrame:
    """Bootstrap a plain table into SCD2 shape: every row becomes the open
    current version with the given valid_from."""
    vf = valid_from if isinstance(valid_from, Column) \
        else F.lit(valid_from).cast("date")
    return (df.withColumn("valid_from", vf)
            .withColumn("valid_to", F.lit(None).cast("date"))
            .withColumn("is_current", F.lit(True)))
