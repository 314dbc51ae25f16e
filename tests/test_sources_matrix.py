"""Connector round-trip matrix: one canonical typed DataFrame through every
file writer/reader pair — systematic null/type coverage that the per-query
round trips (q44-q46) sample piecemeal."""

import pytest

from pyspark.sql import functions as F

CANON_SCHEMA = ("id bigint, name string, price decimal(12,2), ratio double, "
                "flag boolean, born date, seen timestamp")

ROWS = [
    (1, "alpha", None, 0.5, True, None, None),
    (2, None, None, None, None, None, None),
    (3, "with,comma \"quoted\"", None, -1.25, False, None, None),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame(ROWS, CANON_SCHEMA)
    return (df
            .withColumn("price", F.when(F.col("id") == 1,
                                        F.lit("19.99").cast("decimal(12,2)")))
            .withColumn("born", F.when(F.col("id") == 1, F.to_date(F.lit("1999-12-31"))))
            .withColumn("seen", F.when(F.col("id") == 3,
                                       F.to_timestamp(F.lit("2024-06-01 12:34:56")))))


def _roundtrip(spark, canon, tmp_path, fmt):
    from etl_load_spark.sources.readers import (
        read_csv, read_json, read_orc, read_parquet)
    from etl_load_spark.sources.writers import (
        write_csv, write_json, write_orc, write_parquet)
    path = str(tmp_path / fmt)
    if fmt == "parquet":
        write_parquet(canon, {"path": path})
        return read_parquet(spark, {"path": path})
    if fmt == "orc":
        write_orc(canon, {"path": path})
        return read_orc(spark, {"path": path})
    if fmt == "csv":
        write_csv(canon, {"path": path})
        return read_csv(spark, {"path": path, "schema": CANON_SCHEMA})
    if fmt == "json":
        write_json(canon, {"path": path})
        return read_json(spark, {"path": path, "schema": CANON_SCHEMA})
    raise AssertionError(fmt)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_typed_roundtrip(spark, canon, tmp_path, fmt):
    back = _roundtrip(spark, canon, tmp_path, fmt)
    assert dict(back.dtypes) == dict(canon.dtypes)
    want = {r.id: tuple(r) for r in canon.collect()}
    got = {r.id: tuple(r) for r in back.collect()}
    # CSV renders null as "" (the reference's null-as-empty contract) and
    # reads "" back as null, so even the null-heavy rows round-trip exactly
    assert got == want
