"""Skew-safe joins: explicit key salting (SURVEY.md §7.5.6 / north-star
"salting for skew").

AQE's skew-join handling (spark.sql.adaptive.skewJoin.enabled, on by
default in the engine session) splits oversized *partitions* at runtime;
explicit salting is the complementary tool when a single *key* is hot
enough that one reducer would still drown — the hot key's rows spread over
``salt`` reducers, the other side replicates ``salt`` ways.

Semantics: identical to the plain equi-join (the salt column is internal);
works for inner/left joins where the replicated side is the lookup side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "_etl_salt"


def salted_join(skewed: DataFrame, lookup: DataFrame, on: list[str],
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Join ``skewed`` (rows spread across salts) with ``lookup``
    (replicated ``salt`` ways) on ``on`` + salt.

    The salt derives from a per-row id, not the key — rows sharing a hot
    key land on different reducers. Replication multiplies lookup shuffle
    bytes by ``salt``: size it to (hot-key rows / target-rows-per-task).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    s = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt)).cast("int"))
    rep = (lookup.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .withColumn(SALT_COL, F.col(SALT_COL).cast("int")))
    return (s.join(rep, on + [SALT_COL], how)
            .drop(SALT_COL))
