"""SCD2 through the job-spec engine: an initial load bootstraps the
dimension, a second job merges an update batch against it via
transformation.type=SCD2_MERGE with the stored dimension as extra source."""

from etl_load_spark.runner import run_job
from etl_load_spark.spec import JobSpec


def _spec(src_rows, dest, dim_path=None):
    d = {
        "job_id": "scd-demo",
        "source": {"type": "MEMORY", "details": {
            "rows": src_rows,
            "schema": "k bigint, seg string, bal double"}},
        "destination": {"type": "PARQUET", "details": {
            "path": dest, "mode": "overwrite"}},
        "transformation": {"type": "SCD2_MERGE", "parameters": {
            "keyColumns": ["k"], "attrColumns": ["seg", "bal"],
            "effectiveDate": "2021-06-01"}},
        "steps": ["LOAD"],
    }
    if dim_path:
        d["extra_sources"] = {"dim": {"type": "PARQUET",
                                      "details": {"path": dim_path}}}
    return JobSpec.from_dict(d)


def test_scd2_merge_via_spec(spark, tmp_path):
    dim_v1 = str(tmp_path / "dim_v1")
    dim_v2 = str(tmp_path / "dim_v2")

    r1 = run_job(spark, _spec([[1, "a", 10.0], [2, "b", 20.0]], dim_v1))
    assert r1.status == "COMPLETED", r1.error
    v1 = {r.k: r for r in spark.read.parquet(dim_v1).collect()}
    assert all(v1[k].is_current for k in (1, 2))
    assert str(v1[1].valid_from) == "2021-06-01" and v1[1].valid_to is None

    # batch 2: key 1 changes, key 2 is a no-op, key 3 is new
    r2 = run_job(spark, _spec([[1, "a", 99.0], [2, "b", 20.0],
                               [3, "c", 30.0]], dim_v2, dim_path=dim_v1))
    assert r2.status == "COMPLETED", r2.error
    out = spark.read.parquet(dim_v2).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert len(by_key[1]) == 2  # closed + reopened
    assert {r.is_current for r in by_key[1]} == {True, False}
    assert len(by_key[2]) == 1 and by_key[2][0].is_current  # no-op
    assert len(by_key[3]) == 1 and by_key[3][0].is_current  # insert


def test_scd2_missing_params_fails(spark, tmp_path):
    spec = _spec([[1, "a", 1.0]], str(tmp_path / "x"))
    spec.transformation.parameters = {"keyColumns": ["k"]}
    r = run_job(spark, spec)
    assert r.status == "FAILED" and "SCD2_MERGE parameters missing" in r.error


def test_cdc_scd2_apply_stage(spark, tmp_path):
    """Declarative CDC_SCD2_APPLY: the source is the change feed, the
    dimension comes from extraSources.dim; multi-change keys version
    correctly; missing dim / params raise."""
    import json as _json
    import pytest
    from etl_load_spark.plans.builder import build_plan
    from etl_load_spark.spec import JobSpec
    dim_p = tmp_path / "dim"
    spark.createDataFrame(
        [(1, "A", 0, None, True)],
        "k long, attr string, valid_from long, valid_to long,"
        " is_current boolean").write.parquet(str(dim_p))
    feed_p = tmp_path / "feed.json"
    feed_p.write_text("\n".join(_json.dumps(r) for r in [
        {"k": 1, "attr": "B", "seq": 10, "op": "U"},
        {"k": 1, "attr": "C", "seq": 20, "op": "U"}]))

    def spec(params, with_dim=True):
        d = {
            "jobId": "cdc-scd2",
            "source": {"type": "FILE_JSON", "details": {"path": str(feed_p)}},
            "transformation": {"type": "CDC_SCD2_APPLY",
                               "parameters": params},
        }
        if with_dim:
            d["extraSources"] = {"dim": {
                "type": "PARQUET", "details": {"path": str(dim_p)}}}
        return JobSpec.from_dict(d)

    full = {"keyColumns": ["k"], "attrColumns": ["attr"],
            "seqColumn": "seq"}
    got = sorted(map(tuple, build_plan(spark, spec(full)).collect()))
    assert got == [(1, "A", 0, 10, False), (1, "B", 10, 20, False),
                   (1, "C", 20, None, True)]
    with pytest.raises(ValueError, match="missing"):
        build_plan(spark, spec({"keyColumns": ["k"]}))
    with pytest.raises(ValueError, match="extraSources.dim"):
        build_plan(spark, spec(full, with_dim=False))
