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

from pyspark.sql import Column, DataFrame, Window as W, functions as F

META_COLS = ("valid_from", "valid_to", "is_current")


def _check_dim_columns(dim: DataFrame, key_cols: list[str],
                       attr_cols: list[str], op_name: str) -> None:
    """SCD2 column contract (ADVICE r5): both merge operators rebuild new
    versions as key_cols + attr_cols + META_COLS and align them with the
    dimension via ``select(*dim.columns)``, so the dimension must contain
    EXACTLY that column set — an extra (audit/load-metadata) column would
    otherwise fail at analysis with an opaque unresolved-column error.
    Validate up front and raise a descriptive ValueError instead.

    Comparison is case-INSENSITIVE (ADVICE r6): Spark's default resolver
    (spark.sql.caseSensitive=false) resolves ``Valid_From`` against
    ``valid_from``, so a dimension that merges fine must not be rejected
    here on casing alone. The folding stays case-insensitive even when a
    session sets ``spark.sql.caseSensitive=true`` (ADVICE r7, deliberate):
    under that resolver mixed-case columns DO merge, so a stricter check
    would only reject dimensions that work — and the case-duplicate
    rejection below is then merely conservative, never wrong."""
    from collections import Counter
    expected = [*key_cols, *attr_cols, *META_COLS]
    exp_fold = {c.casefold() for c in expected}
    dim_fold = {c.casefold() for c in dim.columns}
    missing = [c for c in expected if c.casefold() not in dim_fold]
    extra = [c for c in dim.columns if c.casefold() not in exp_fold]
    # Compute BOTH duplicate sets unconditionally (ADVICE r8): a set-based
    # compare admits case-DUPLICATE columns (both valid_to and VALID_TO),
    # and a collision must be reported even when it co-occurs with
    # missing/extra columns — otherwise it stays hidden until the next
    # attempt. A duplicate on the SPEC side (key_cols/attr_cols naming
    # both "id" and "ID") is the caller's bug, not the dimension's, and
    # gets its own message.
    dim_dup = sorted(c for c, k in
                     Counter(c.casefold() for c in dim.columns).items()
                     if k > 1)
    spec_dup = sorted(c for c, k in
                      Counter(c.casefold() for c in expected).items()
                      if k > 1)
    if spec_dup:
        raise ValueError(
            f"{op_name}: key_cols/attr_cols themselves contain "
            f"case-duplicate names {spec_dup} (or repeat one of "
            f"{META_COLS}) — fix the merge SPEC, the dimension cannot "
            "satisfy it. Spark's default case-insensitive resolver would "
            "report such columns ambiguous mid-merge.")
    dup_note = ("" if not dim_dup else
                f" The dimension also carries case-duplicate columns "
                f"{dim_dup}, which Spark's default case-insensitive "
                "resolver would report ambiguous mid-merge — rename or "
                "drop the duplicates too.")
    if missing or extra:
        raise ValueError(
            f"{op_name}: the dimension must contain exactly "
            f"key_cols + attr_cols + {META_COLS} = {sorted(expected)}; "
            f"missing={missing} unexpected={extra}. Drop extra "
            "audit/metadata columns before the merge (and re-join them "
            "afterwards), or declare them in attr_cols if they are "
            f"version-tracked.{dup_note}")
    if dim_dup:
        raise ValueError(
            f"{op_name}: the dimension carries case-duplicate columns "
            f"{dim_dup} ({len(dim.columns)} columns for {len(expected)} "
            "expected names) — Spark's default case-insensitive resolver "
            "would report them ambiguous mid-merge. Rename or drop the "
            "duplicates first.")


def _field_type(df: DataFrame, name: str):
    """Schema field lookup under Spark's default case-INSENSITIVE
    resolution (StructType.__getitem__ is exact-match only)."""
    for f in df.schema.fields:
        if f.name.casefold() == name.casefold():
            return f.dataType
    raise KeyError(name)


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
    _check_dim_columns(dim, key_cols, attr_cols, "scd2_merge")
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
             .withColumn("valid_to", F.lit(None).cast(_field_type(dim, "valid_to")))
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


def cdc_scd2_apply(dim: DataFrame, changes: DataFrame, key_cols: list[str],
                   attr_cols: list[str], seq_col: str,
                   op_col: str = "op") -> DataFrame:
    """Fold a CDC change FEED into an SCD2 dimension — the lakehouse
    "apply changes with history" semantic (Delta's APPLY CHANGES ...
    STORED AS SCD TYPE 2): unlike ``scd2_merge`` (one snapshot, at most
    one new version per key) every EFFECTIVE change in the feed becomes
    its own version, so a key updated five times in one batch gains five
    versions with contiguous [valid_from, valid_to) ranges.

    Feed contract: (key_cols, attr_cols, seq_col, op_col) with op in
    I/U/D (anything else raises loudly) and seq monotone change order,
    strictly greater than the dimension's open valid_from for the key
    (standard CDC ordering). Semantics per key, in seq order:
      - same-seq ties collapse deterministically (D < I < U — a key that
        died and changed at the same instant stays dead);
      - an I/U whose tracked attrs null-safe-equal the previous
        effective state is a NO-OP (never forks a version); an I/U after
        a delete always reopens;
      - a D closes the open version at its seq (a D on a dead/absent key
        is a no-op);
      - the dimension's open version closes at the key's first effective
        change; keys with only no-op changes keep their open version
        bit-identically; history rows and untouched keys pass through.
    valid_from / valid_to carry the SEQ column's type (the dimension
    must use the same).

    Scale: both windows run on the FEED (plus one seed row per touched
    key), never the dimension — one feed-key shuffle serves the
    keep-filter lag and the version-bounding lead (same partitioning
    and ordering); the dimension is touched by one semi and one anti
    key join. The no-op suppression composes transitively: a dropped
    row null-safe-equals its raw predecessor, so comparing each row to
    its immediate predecessor equals comparing to the last EFFECTIVE
    state.

    Column contract: the dimension must contain EXACTLY
    key_cols + attr_cols + (valid_from, valid_to, is_current) — extra
    audit/metadata columns raise a descriptive ValueError up front
    (drop and re-join them around the merge, or declare them in
    attr_cols if version-tracked)."""
    _check_dim_columns(dim, key_cols, attr_cols, "cdc_scd2_apply")
    seq_t = changes.schema[seq_col].dataType
    op = F.col(op_col)
    checked_op = F.when(op.isin("I", "U", "D"), op).otherwise(
        F.raise_error(F.concat(
            F.lit("cdc_scd2_apply: op must be I/U/D, got "),
            F.coalesce(op.cast("string"), F.lit("NULL"))))).cast("string")
    # 1. same-seq collapse (D < I < U makes the tie deterministic)
    w0 = W.partitionBy(*key_cols, seq_col).orderBy(F.col(op_col).asc())
    ch = (changes.withColumn(op_col, checked_op)
          .withColumn("_rn", F.row_number().over(w0))
          .filter(F.col("_rn") == 1)
          .select(*key_cols, *attr_cols, seq_col, op_col,
                  F.lit(False).alias("_seed")))
    # 2. one seed row per touched key: the dimension's open version,
    #    sequenced at its own valid_from (sorts before every feed seq)
    cur = dim.filter(F.col("is_current"))
    touched = ch.select(*key_cols).distinct()
    seed = (cur.join(touched, key_cols, "left_semi")
            .select(*key_cols, *attr_cols,
                    F.col("valid_from").alias(seq_col),
                    F.lit("S").alias(op_col),
                    F.lit(True).alias("_seed")))
    uni = seed.unionByName(ch)
    # 3. effective-change filter: compare each row to its immediate
    #    predecessor (seed first at seq ties)
    wk = W.partitionBy(*key_cols).orderBy(
        F.col(seq_col).asc(), F.col("_seed").desc(), F.col(op_col).asc())
    lagged = uni.select(
        "*", F.lag(op_col).over(wk).alias("_pop"),
        *[F.lag(a).over(wk).alias(f"_p_{a}") for a in attr_cols])
    differs = _any_attr_differs(attr_cols, "_p_")
    keep = (F.col("_seed")
            | ((op != "D") & (F.col("_pop").isNull()
                              | (F.col("_pop") == "D") | differs))
            | ((op == "D") & F.col("_pop").isNotNull()
               & (F.col("_pop") != "D")))
    kept = lagged.filter(keep).select(*key_cols, *attr_cols, seq_col,
                                      op_col, "_seed")
    # 4. bound each version at the next effective change
    kept = kept.withColumn("_next", F.lead(seq_col).over(wk))
    versions = (kept.filter(op != "D")
                .select(*key_cols, *attr_cols,
                        F.col(seq_col).alias("valid_from"),
                        F.col("_next").cast(seq_t).alias("valid_to"),
                        F.col("_next").isNull().alias("is_current")))
    history = dim.filter(~F.col("is_current"))
    untouched = cur.join(touched, key_cols, "left_anti")
    return (history.unionByName(untouched)
            .unionByName(versions.select(*dim.columns)))
