"""U1 pluggable Python transform stage (CoreLibInterfaces.java:98-103):
DataFrame-level and Arrow-batched pandas hooks loaded from a script path."""
import textwrap

import pytest
from pyspark.sql import functions as F

from etl_load_spark.plans.builder import build_plan
from etl_load_spark.spec import JobSpec


def make_spec(tmp_path, script_body, rows="id long, v string"):
    script = tmp_path / "user_transform.py"
    script.write_text(textwrap.dedent(script_body))
    src = tmp_path / "src.json"
    src.write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
    return JobSpec.from_dict({
        "jobId": "t",
        "source": {"type": "FILE_JSON", "details": {"path": str(src)}},
        "transformation": {"type": "PYTHON_SCRIPT",
                           "scriptPath": str(script),
                           "parameters": {"suffix": "_x"}},
    })


def test_dataframe_hook(spark, tmp_path):
    spec = make_spec(tmp_path, """
        from pyspark.sql import functions as F
        def transform(df, spark, params):
            return df.withColumn("v", F.concat("v", F.lit(params["suffix"])))
    """)
    out = {(r.id, r.v) for r in build_plan(spark, spec).collect()}
    assert out == {(1, "a_x"), (2, "b_x")}


def test_pandas_hook_arrow_batched(spark, tmp_path):
    spec = make_spec(tmp_path, """
        def transform_pandas(pdf, params):
            pdf["v"] = pdf["v"] + params["suffix"]
            return pdf
    """)
    df = build_plan(spark, spec)
    out = {(r.id, r.v) for r in df.collect()}
    assert out == {(1, "a_x"), (2, "b_x")}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_missing_hook_raises(spark, tmp_path):
    spec = make_spec(tmp_path, "x = 1\n")
    with pytest.raises(ValueError, match="neither transform"):
        build_plan(spark, spec)


def test_none_type_is_passthrough(spark, tmp_path):
    spec = make_spec(tmp_path, "def transform(df, spark, p): return None\n")
    spec.transformation.type = "NONE"
    out = {(r.id, r.v) for r in build_plan(spark, spec).collect()}
    assert out == {(1, "a"), (2, "b")}
