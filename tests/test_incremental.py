"""Batch high-water-mark incremental ingestion (spec.incremental)."""

import json
import os

from etl_load_spark.runner import run_job
from etl_load_spark.spec import JobSpec


def _spec(src, dst, state, extra=None):
    d = {
        "jobId": "inc_job",
        "source": {"type": "PARQUET", "path": src},
        "destination": {"type": "PARQUET", "path": dst},
        "steps": ["VALIDATE_SOURCE", "LOAD", "VALIDATE_LOAD"],
        "incremental": {"column": "seq", "state_path": state},
    }
    if extra:
        d.update(extra)
    return JobSpec.from_dict(d)


def test_hwm_ingests_only_new_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "hwm.json")
    spark.createDataFrame([(i, f"v{i}") for i in range(1, 6)],
                          "seq long, v string").write.parquet(src)
    r1 = run_job(spark, _spec(src, dst, state))
    assert r1.status == "COMPLETED", r1.error
    assert r1.records_written == 5
    assert json.load(open(state))["high_water_mark"] == 5

    # late-arriving file overlaps the ingested range: only seq>5 is new
    spark.createDataFrame([(i, f"v{i}") for i in range(4, 9)],
                          "seq long, v string").write.mode(
        "append").parquet(src)
    r2 = run_job(spark, _spec(src, dst, state))
    assert r2.status == "COMPLETED", r2.error
    assert r2.records_written == 3  # 6, 7, 8
    assert json.load(open(state))["high_water_mark"] == 8
    got = sorted(r.seq for r in spark.read.parquet(dst).collect())
    assert got == [1, 2, 3, 4, 5, 6, 7, 8]


def test_hwm_empty_delta_keeps_mark(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "hwm.json")
    spark.createDataFrame([(1, "a"), (2, "b")],
                          "seq long, v string").write.parquet(src)
    run_job(spark, _spec(src, dst, state))
    r2 = run_job(spark, _spec(src, dst, state))  # nothing new
    assert r2.status == "COMPLETED", r2.error
    assert r2.records_written == 0
    assert json.load(open(state))["high_water_mark"] == 2


def test_hwm_timestamp_column(spark, tmp_path):
    from datetime import datetime
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "hwm.json")
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    spark.createDataFrame(
        [(ts("2024-01-01 10:00:00"), 1)], "seq timestamp, id int"
    ).write.parquet(src)
    r1 = run_job(spark, _spec(src, dst, state))
    assert r1.status == "COMPLETED", r1.error
    spark.createDataFrame(
        [(ts("2024-01-01 09:00:00"), 2), (ts("2024-01-02 08:00:00"), 3)],
        "seq timestamp, id int").write.mode("append").parquet(src)
    r2 = run_job(spark, _spec(src, dst, state))
    assert r2.status == "COMPLETED", r2.error
    assert r2.records_written == 1  # only the 01-02 row is past the mark
    ids = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert ids == [1, 3]


def test_hwm_applies_before_query(spark, tmp_path):
    """The mark filters the SOURCE before the SQL query sees it, so
    aggregations run over the delta only."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "hwm.json")
    spark.createDataFrame([(i, i % 2) for i in range(1, 5)],
                          "seq long, k long").write.parquet(src)
    q = ("SELECT k, COUNT(*) AS n, MAX(seq) AS mx FROM src GROUP BY k")
    run_job(spark, _spec(src, dst, state, {"query": q}))
    spark.createDataFrame([(9, 1)], "seq long, k long").write.mode(
        "append").parquet(src)
    r2 = run_job(spark, _spec(src, dst, state, {"query": q}))
    assert r2.status == "COMPLETED", r2.error
    # second batch aggregated ONLY the delta row
    batch2 = [r for r in spark.read.parquet(dst).collect() if r.mx == 9]
    assert len(batch2) == 1 and batch2[0].n == 1
    assert json.load(open(state))["high_water_mark"] == 9


def test_streaming_and_incremental_mutually_exclusive(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "seq long, v string").write.parquet(src)
    spec = _spec(src, str(tmp_path / "dst"), str(tmp_path / "hwm.json"),
                 {"streaming": {"checkpoint": str(tmp_path / "chk")}})
    res = run_job(spark, spec)
    assert res.status == "FAILED"
    assert "mutually exclusive" in res.error


def test_state_file_is_atomic_and_readable(tmp_path):
    from etl_load_spark.operators.incremental import load_mark, save_mark
    p = str(tmp_path / "deep" / "dir" / "hwm.json")
    assert load_mark(p) is None
    save_mark(p, "seq", 42, "job1")
    assert load_mark(p) == 42
    save_mark(p, "seq", "2024-01-02 08:00:00", "job1")
    assert load_mark(p) == "2024-01-02 08:00:00"
    assert not [f for f in os.listdir(os.path.dirname(p))
                if f.startswith(".hwm_")]


def test_hwm_predicate_pushes_down(spark, tmp_path):
    """The mark comparison must reach the scan as a pushed filter — on a
    JDBC source this is what turns the run into a delta-only pull."""
    from etl_load_spark.operators.incremental import hwm_predicate
    src = str(tmp_path / "src")
    spark.createDataFrame([(i, "x") for i in range(10)],
                          "seq long, v string").write.parquet(src)
    df = spark.read.parquet(src)
    plan = (df.filter(hwm_predicate(df, "seq", 5))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(seq), GreaterThan(seq,5)]" in plan
