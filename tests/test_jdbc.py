"""Live-connection JDBC evidence (SURVEY §2.1 S1-S4, S7, S10) against
embedded Derby — the in-JVM database Spark already ships in its jars
directory, so the reference's bread-and-butter JDBC path (the
ORACLE_DB/MSSQL_DB endpoints: ETLCoreJdbcReader.java:46-98 reads,
ItemWriterFactory.java:107-182 batch writes, TruncateTasklet.java:54-111
truncate-before-load) executes for real: connections open, batches insert,
fetchsize/partitioned scans run, TRUNCATE TABLE is issued.

``jdbc:derby:memory:`` databases are per-JVM-private and need no files or
network — exactly the shape of an embedded round-trip fixture. Derby folds
unquoted identifiers to UPPERCASE while Spark creates columns quoted, so
raw-query SQL (S2) quotes its identifiers — the same rule any
case-sensitive backend imposes on user SQL.
"""

import pytest

from etl_load_spark.runner import run_job
from etl_load_spark.sources.readers import read_jdbc
from etl_load_spark.sources.writers import write_jdbc
from etl_load_spark.spec import JobSpec

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


def _sample(spark, n=20):
    return spark.range(n).selectExpr(
        "id", "CAST(id * 2.5 AS DOUBLE) AS v", "concat('name_', id) AS name")


def _read_all(spark, url, table):
    return read_jdbc(spark, {"url": url, "table": table, "driver": DRIVER})


def test_jdbc_batch_write_then_table_scan(spark):
    """S7 (batch sink, batchsize) + S1 (table scan) + S3 (fetchsize)."""
    url = _url("rt")
    df = _sample(spark)
    metrics = write_jdbc(df, {"url": url, "table": "RT", "driver": DRIVER,
                              "batch_size": 7})
    assert metrics["records_written"] == 20
    back = read_jdbc(spark, {"url": url, "table": "RT", "driver": DRIVER,
                             "fetch_size": 5})
    key = lambda r: r["id"]  # noqa: E731
    assert sorted((r.asDict() for r in back.collect()), key=key) == \
        sorted((r.asDict() for r in df.collect()), key=key)


def test_jdbc_raw_query_scan(spark):
    """S2: the reference's build-SQL-or-passthrough raw-query source
    (ETLCoreJdbcReader.java:131-162). Identifiers quoted — Derby
    upper-folds bare names while Spark-created columns are quoted."""
    url = _url("rawq")
    write_jdbc(_sample(spark), {"url": url, "table": "RQ", "driver": DRIVER})
    out = read_jdbc(spark, {
        "url": url, "driver": DRIVER,
        "query": 'SELECT "name", "v" FROM RQ WHERE "id" >= 15'})
    rows = out.collect()
    assert len(rows) == 5
    assert {r["name"] for r in rows} == {f"name_{i}" for i in range(15, 20)}


def test_jdbc_partitioned_read(spark):
    """S4: range-partitioned parallel scan — numPartitions tasks, each with
    its own WHERE window, union equals the table."""
    url = _url("part")
    df = _sample(spark, 40)
    write_jdbc(df, {"url": url, "table": "PT", "driver": DRIVER})
    out = read_jdbc(spark, {
        "url": url, "table": "PT", "driver": DRIVER,
        "partition_column": '"id"', "lower_bound": 0, "upper_bound": 40,
        "num_partitions": 4})
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 40
    assert sorted(r["id"] for r in out.collect()) == list(range(40))


def test_jdbc_truncate_before_load(spark):
    """S10: truncate=True issues TRUNCATE TABLE (not DROP) before the
    batch insert — old rows gone, table (and its DDL) preserved."""
    url = _url("trunc")
    write_jdbc(_sample(spark, 10), {"url": url, "table": "TR",
                                    "driver": DRIVER})
    write_jdbc(_sample(spark, 3), {"url": url, "table": "TR",
                                   "driver": DRIVER, "truncate": True,
                                   "mode": "overwrite"})
    back = _read_all(spark, url, "TR")
    assert sorted(r["id"] for r in back.collect()) == [0, 1, 2]


def test_jdbc_job_spec_end_to_end(spark, tmp_path):
    """The reference's primary topology — DB source → mapping → file sink —
    through run_job with a live JDBC endpoint."""
    url = _url("job")
    write_jdbc(_sample(spark, 12), {"url": url, "table": "SRC",
                                    "driver": DRIVER})
    dest = str(tmp_path / "out_csv")
    spec = JobSpec.from_dict({
        "jobId": "jdbc-e2e",
        "source": {"type": "JDBC",
                   "details": {"url": url, "table": "SRC",
                               "driver": DRIVER, "fetch_size": 4}},
        "destination": {"type": "FILE_CSV",
                        "details": {"path": dest, "header": True,
                                    "mode": "overwrite"}},
        "mappings": [
            {"sourceFieldName": "id", "destinationFieldName": "dest_id",
             "destFieldType": "LONG", "isDestNullable": False},
            {"sourceFieldName": "name", "destinationFieldName": "name_up",
             "destFieldType": "STRING", "transformationRule": "UPPERCASE"},
        ],
        "errorHandling": {"strategy": "FAIL_JOB"},
        "orderBy": ["dest_id"],
    })
    result = run_job(spark, spec)
    assert result.status == "COMPLETED", result.error
    assert result.records_written == 12
    out = spark.read.option("header", True).csv(dest)
    assert out.count() == 12
    assert out.filter("name_up = 'NAME_3'").count() == 1


def test_jdbc_incremental_hwm_against_live_source(spark, tmp_path):
    """Incremental HWM over a LIVE JDBC source: run 1 ingests everything
    and marks max(id); rows inserted AFTER run 1; run 2 ingests exactly
    the delta. The mark is observed on the write's own scan (runner
    attach_hwm_observation), so no rows can fall between mark and write."""
    url = _url("inc")
    state = str(tmp_path / "hwm.json")
    dest = str(tmp_path / "inc_parquet")
    write_jdbc(_sample(spark, 10), {"url": url, "table": "EVT",
                                    "driver": DRIVER})
    spec = JobSpec.from_dict({
        "jobId": "jdbc-inc",
        "source": {"type": "JDBC",
                   "details": {"url": url, "table": "EVT", "driver": DRIVER}},
        "destination": {"type": "PARQUET", "details": {"path": dest}},
        "incremental": {"column": "id", "state_path": state},
    })
    r1 = run_job(spark, spec)
    assert r1.status == "COMPLETED", r1.error
    assert spark.read.parquet(dest).count() == 10

    # new rows land in the source AFTER the first run
    late = spark.range(10, 16).selectExpr(
        "id", "CAST(id * 2.5 AS DOUBLE) AS v", "concat('name_', id) AS name")
    write_jdbc(late, {"url": url, "table": "EVT", "driver": DRIVER})

    r2 = run_job(spark, spec)
    assert r2.status == "COMPLETED", r2.error
    assert r2.records_written == 6  # the delta only
    assert sorted(r["id"] for r in spark.read.parquet(dest).collect()) == \
        list(range(16))

    # idle re-run: empty delta, mark unchanged
    r3 = run_job(spark, spec)
    assert r3.status == "COMPLETED", r3.error
    assert r3.records_written == 0
    assert spark.read.parquet(dest).count() == 16


def test_jdbc_incremental_feeding_streaming_materialization(spark, tmp_path):
    """VERDICT r11 #7: the COMPOSED pipeline — HWM-incremental JDBC
    ingestion landing parquet deltas, a streaming TREND rollup
    materializing the landed directory through the update-mode
    group-key upsert — run over TWO insert rounds against a live Derby
    source. Each streaming re-run processes only the newly landed
    files (checkpoint), each incremental re-run ships only the source
    delta (HWM), and after every round the materialized rollup equals
    the batch rollup over everything inserted so far."""
    import datetime as dt
    from etl_load_spark.operators.timeseries import trend

    url = _url("incstream")
    state = str(tmp_path / "hwm.json")
    landing = str(tmp_path / "landing")
    rollup = str(tmp_path / "rollup")
    day = dt.datetime(2024, 6, 1)
    schema = "id bigint, user_id bigint, ts timestamp, value double"

    def rows(lo, hi):
        return [(i, i % 2, day + dt.timedelta(hours=i), float(i * 3 % 40))
                for i in range(lo, hi)]

    ingest = JobSpec.from_dict({
        "jobId": "jdbc-inc-land",
        "source": {"type": "JDBC",
                   "details": {"url": url, "table": "FEED",
                               "driver": DRIVER}},
        "destination": {"type": "PARQUET", "details": {"path": landing}},
        "incremental": {"column": "id", "state_path": state},
    })
    materialize = JobSpec.from_dict({
        "jobId": "trend-materialize",
        "source": {"type": "PARQUET",
                   "details": {"path": landing, "schema": schema}},
        "transformation": {"type": "TREND",
                           "parameters": {"keyColumn": "user_id",
                                          "valueColumn": "value"}},
        "destination": {"type": "PARQUET",
                        "details": {"path": rollup,
                                    "partition_by": ["bucket_ts"]}},
        "streaming": {"checkpoint": str(tmp_path / "chk"),
                      "output_mode": "update"},
    })
    cols = ["user_id", "bucket_ts", "n_samples", "slope_per_sec"]
    srt = lambda df: sorted(  # noqa: E731
        tuple(x[c] for c in cols) for x in df.collect())

    write_jdbc(spark.createDataFrame(rows(0, 30), schema),
               {"url": url, "table": "FEED", "driver": DRIVER})
    assert run_job(spark, ingest).status == "COMPLETED"
    s1 = run_job(spark, materialize)
    assert s1.status == "COMPLETED", s1.error
    assert s1.records_read == 30
    assert srt(spark.read.parquet(rollup)) == \
        srt(trend(spark.createDataFrame(rows(0, 30), schema),
                  value_col="value"))

    # round 2: more rows in the source — the HWM ships only the delta,
    # the stream drains only the newly landed files
    write_jdbc(spark.createDataFrame(rows(30, 42), schema),
               {"url": url, "table": "FEED", "driver": DRIVER})
    i2 = run_job(spark, ingest)
    assert i2.status == "COMPLETED", i2.error
    assert i2.records_written == 12
    s2 = run_job(spark, materialize)
    assert s2.status == "COMPLETED", s2.error
    assert s2.records_read == 12          # the landed delta only
    assert srt(spark.read.parquet(rollup)) == \
        srt(trend(spark.createDataFrame(rows(0, 42), schema),
                  value_col="value"))
