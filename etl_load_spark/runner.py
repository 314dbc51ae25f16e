"""Ordered step execution (U7) + status/metrics (U8, U9, A1-A3).

The reference assembles VALIDATE_SOURCE → TRUNCATE_DESTINATION → LOAD →
VALIDATE_LOAD → NOTIFY_* into a linear flow (etlModel.java:166-174,
DynamicJobService.java:90-123, StepFactory.java:64-126). Here each step is a
small function over the JobSpec; LOAD builds one DataFrame plan and performs
one write action — Catalyst/AQE own everything between scan and sink.

Status machine mirrors CoreLibInterfaces.java:115-139 (UNKNOWN … CANCELLED);
notifications mirror NotifyTasklet.java:45-93 as a callback.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from etl_load_spark.operators.errors import JobFailedError, split_errors
from etl_load_spark.plans.builder import apply_transformation, build_plan
from etl_load_spark.sources.registry import read_source, write_sink
from etl_load_spark.spec import JobSpec

log = logging.getLogger(__name__)

DEFAULT_STEPS = ["VALIDATE_SOURCE", "LOAD", "VALIDATE_LOAD", "NOTIFY_SUCCESS"]


@dataclass
class JobResult:
    job_id: str
    status: str = "UNKNOWN"            # SUBMITTED RUNNING COMPLETED FAILED
    records_read: int = 0
    records_written: int = 0
    records_failed: int = 0
    duration_sec: float = 0.0
    step_log: list = field(default_factory=list)
    error: str | None = None
    #: per-expectation outcome dicts ({"check", "column(s)", "failed_rows",
    #: "passed", "severity"}) recorded by VALIDATE_LOAD
    expectation_results: list = field(default_factory=list)


def cancel_job(spark: SparkSession, job_id: str) -> None:
    """Cooperative cancellation (U6): cancels every Spark job tagged with
    this job id (CoreLibInterfaces.java:224-242 semantics — running stages
    are interrupted, the step runner surfaces FAILED). Call from any thread.
    """
    spark.sparkContext.cancelJobGroup(f"etl_load_{job_id}")


def run_job(spark: SparkSession, spec: JobSpec,
            notify=None) -> JobResult:
    """Execute the spec's step list; returns the final JobResult."""
    result = JobResult(job_id=spec.job_id, status="RUNNING")
    t0 = time.monotonic()
    # None → default; an explicit [] is a deliberate no-op job and runs
    # nothing (spec.from_dict applies the same distinction)
    steps = spec.steps if spec.steps is not None else DEFAULT_STEPS
    # tag all actions with a cancellable job group (U6)
    spark.sparkContext.setJobGroup(f"etl_load_{spec.job_id}",
                                   f"etl_load_spark job {spec.job_id}",
                                   interruptOnCancel=True)
    try:
        for step in steps:
            s = step.upper()
            result.step_log.append(s)
            if s == "VALIDATE_SOURCE":
                # source must open and have a readable schema (etlModel.java:167)
                df = read_source(spark, spec.source)
                if not df.schema.fields:
                    raise JobFailedError("source has no columns")
            elif s == "TRUNCATE_DESTINATION":
                # file sinks truncate via overwrite mode at write time (S10);
                # JDBC sinks get truncate=true in their writer options
                if spec.destination is not None:
                    spec.destination.details.setdefault("mode", "overwrite")
                    spec.destination.details.setdefault("truncate", True)
            elif s == "LOAD":
                _load(spark, spec, result)
            elif s == "VALIDATE_LOAD":
                # row-count integrity (etlModel.java:170, A3): written + failed
                # must account for everything read. Streaming file sinks
                # don't report numOutputRows in progress — their integrity
                # mechanism is the checkpoint/commit log, and expectations
                # below read the committed sink directly.
                if not spec.streaming and \
                        result.records_written + result.records_failed < result.records_read:
                    raise JobFailedError(
                        f"validate_load: read={result.records_read} != "
                        f"written={result.records_written} + failed={result.records_failed}")
                if spec.expectations:
                    _check_expectations(spec, result)
            elif s == "COMPACT_DESTINATION":
                # post-load small-file compaction (maintenance.py): rewrite
                # the just-written sink to ~target-size files. Path-based
                # parquet/orc sinks only — the sinks that fragment.
                from etl_load_spark.operators.maintenance import compact_files
                dest = spec.destination
                if dest is None or "path" not in dest.details:
                    raise JobFailedError(
                        "COMPACT_DESTINATION requires a path-based sink")
                fmt = dest.type.split("_")[-1].lower()
                if fmt not in ("parquet", "orc"):
                    raise JobFailedError(
                        f"COMPACT_DESTINATION unsupported for {dest.type}")
                m = compact_files(
                    spark, dest.details["path"],
                    target_file_mb=int(dest.details.get(
                        "compact_target_mb", 128)),
                    fmt=fmt, partition_by=dest.details.get("partition_by"))
                result.step_log[-1] = (f"COMPACT_DESTINATION:"
                                       f"{m['files_before']}->"
                                       f"{m['files_after']}")
                if getattr(result, "_output_is_readback", False):
                    # a sink-readback DataFrame captured the PRE-compaction
                    # file listing; re-read so a later VALIDATE_LOAD scans
                    # the swapped files instead of failing FILE_NOT_EXIST
                    result._output_df = read_source(spark, spec.destination)
            elif s in ("NOTIFY_SUCCESS", "NOTIFY_FAILURE"):
                pass  # emitted in the finally-style epilogue below
            else:
                raise ValueError(f"unknown step: {step}")
        result.status = "COMPLETED"
    except Exception as e:  # noqa: BLE001 — job boundary
        result.status = "FAILED"
        result.error = str(e)
        log.error("job %s failed: %s", spec.job_id, e)
    result.duration_sec = time.monotonic() - t0
    # the expectations cache is normally consumed by VALIDATE_LOAD; if the
    # write failed or the spec's explicit steps skip validation, release it
    # here — a long-running serve/listen session must not pin one cached
    # DataFrame per failed attempt
    leftover = getattr(result, "_unpersist_after_validate", None)
    if leftover is not None:
        try:
            leftover.unpersist()
        except Exception:  # noqa: BLE001 — cleanup must not mask the result
            pass
        result._unpersist_after_validate = None
    # Operator-internal persists (e.g. the LM_SURPRISAL stage's bigram
    # relation) register with the session cache registry; the job's write
    # action has materialized by now, so release them — a serve/listen
    # session must not accumulate one cache per job.
    from etl_load_spark.session import release_operator_caches
    release_operator_caches()
    wanted = {s.upper() for s in steps}
    if notify and (("NOTIFY_SUCCESS" in wanted and result.status == "COMPLETED")
                   or ("NOTIFY_FAILURE" in wanted and result.status == "FAILED")):
        notify(result)
    if result.status == "FAILED" and spec.error_handling.strategy == "FAIL_JOB" \
            and result.error and notify is None:
        pass
    return result


def _load(spark: SparkSession, spec: JobSpec, result: JobResult) -> None:
    """The LOAD step: plan → (optional error split) → single write action."""
    if spec.streaming:
        _load_streaming(spark, spec, result)
        return
    # Every mapping job goes through error accounting: FAIL_JOB needs it to
    # detect bad rows at all (casts are null-on-failure), the routing
    # strategies need the good/bad split.
    inc = spec.incremental
    inc_src = None
    prev_mark = None
    if inc:
        if spec.destination is not None:
            # appending deltas is the natural incremental sink mode
            spec.destination.details.setdefault("mode", "append")
        from etl_load_spark.operators.incremental import (
            attach_hwm_observation, hwm_predicate, load_mark)
        inc_src = read_source(spark, spec.source)
        prev_mark = load_mark(inc["state_path"])
        if prev_mark is not None:
            inc_src = inc_src.filter(
                hwm_predicate(inc_src, inc["column"], prev_mark))
        # the new mark is observed on the write's own scan — a re-executed
        # MAX against a live (JDBC) source would advance past rows
        # committed after the load and silently skip them forever
        inc_src, hwm_obs = attach_hwm_observation(inc_src, inc["column"])
    use_error_split = bool(spec.mappings) and spec.query is None
    if use_error_split:
        src_df = inc_src if inc_src is not None \
            else read_source(spark, spec.source)
        source_is_line = spec.source.type.upper() in ("FILE_FIXED", "TEXT")
        split = split_errors(src_df, spec, source_is_line)
        # the transform stage (U1 PYTHON_SCRIPT / SCD2_MERGE) applies to the
        # GOOD rows only — bad rows already routed per the error strategy
        df = apply_transformation(split.good, spark, spec)
        if spec.order_by:
            df = df.orderBy(*spec.order_by)
        result.records_failed = split.error_count
        result.records_read = split.error_count  # + good, added below
    else:
        df = build_plan(spark, spec, source_df=inc_src)
    result._output_df = df  # VALIDATE_LOAD expectations evaluate this plan
    if spec.destination is None:
        # query-only job: materialize nothing; caller uses build_plan directly
        n = df.count()
        result.records_read += n
        result.records_written = n
        return
    # Expectations must see the rows actually COMMITTED, not a re-execution
    # of the plan (non-deterministic plans — unordered LIMIT, sampling —
    # can produce different rows on the second run). Self-describing path
    # sinks are read back after the write (as the streaming path does);
    # other sinks persist the output so the write and the validation share
    # one materialization.
    readback = False
    if spec.expectations:
        fmt = spec.destination.type.split("_")[-1].lower()
        # append-mode sinks can't be read back batch-scoped (the sink holds
        # PRIOR batches too, and VALIDATE_LOAD's contract is "validate this
        # load") — those use the persist path below instead
        # dynamic partition overwrite keeps partitions untouched by this
        # batch, so a readback would validate historical data against
        # "this load"'s expectations — use the batch-scoped persist path
        readback = "path" in spec.destination.details \
            and fmt in ("parquet", "orc") \
            and spec.destination.details.get("mode", "overwrite") == "overwrite" \
            and not spec.destination.details.get("overwrite_partitions")
        if not readback:
            df = df.persist()
            result._unpersist_after_validate = df
            result._output_df = df
    metrics = write_sink(df, spec.destination)
    result.records_written = metrics.get("records_written", 0)
    result.records_read += result.records_written
    if readback:
        result._output_df = read_source(spark, spec.destination)
        result._output_is_readback = True
    if inc:
        # advance the mark only AFTER the write committed (a failed write
        # leaves the old mark → the next run re-ingests the batch); the
        # value comes from the write's own observation, not a re-query
        from etl_load_spark.operators.incremental import (observed_mark,
                                                          save_mark)
        new_mark = observed_mark(hwm_obs)
        if new_mark is not None:
            save_mark(inc["state_path"], inc["column"], new_mark,
                      spec.job_id)
    if use_error_split:
        split.unpersist()


def _check_expectations(spec: JobSpec, result: JobResult) -> None:
    """Evaluate the spec's declarative data-quality expectations against the
    loaded output in ONE aggregate pass (plus one Expand per ``unique``
    check — Spark's multi-distinct rewrite).

    Scale: every check compiles to a map-side-combinable aggregate over the
    already-built output plan — no per-check scans, no collect of data rows;
    the driver sees one row of violation counters. Error-severity
    violations raise ``JobFailedError`` (the job reports FAILED); warn
    severity records and continues. The reference's VALIDATE_LOAD checks
    row-count integrity only (etlModel.java:170); column-level expectations
    are the engine-extension equivalent of its per-field nullability
    validation (ETLCoreMappingProcessor.java null-route), applied post-load.
    """
    from pyspark.sql import functions as F

    df = getattr(result, "_output_df", None)
    if df is None:
        raise JobFailedError("expectations require a LOAD step before "
                             "VALIDATE_LOAD")
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, ex in enumerate(spec.expectations):
        check = ex.get("check")
        col = ex.get("column")
        if check == "not_null":
            bad = F.col(col).isNull()
        elif check == "range":
            c = F.col(col)
            conds = []
            if ex.get("min") is not None:
                conds.append(c < F.lit(ex["min"]))
            if ex.get("max") is not None:
                conds.append(c > F.lit(ex["max"]))
            bad = conds[0] if len(conds) == 1 else (conds[0] | conds[1])
            bad = c.isNotNull() & bad
        elif check == "accepted_values":
            bad = F.col(col).isNotNull() & ~F.col(col).isin(ex["values"])
        elif check == "expression":
            # rows where the declared boolean SQL is false OR null
            bad = ~F.coalesce(F.expr(ex["sql"]), F.lit(False))
        elif check == "unique":
            cols = ex.get("columns") or [col]
            aggs.append((F.count(F.lit(1))
                         - F.count_distinct(F.struct(*cols)))
                        .alias(f"__x{i}"))
            continue
        elif check in ("row_count_min", "row_count_max"):
            continue
        else:
            raise ValueError(f"unknown expectation check: {check!r}")
        aggs.append(F.sum(bad.cast("long")).alias(f"__x{i}"))
    counters = df.agg(*aggs).collect()[0].asDict()
    cached = getattr(result, "_unpersist_after_validate", None)
    if cached is not None:
        cached.unpersist()
        result._unpersist_after_validate = None
    n_rows = counters["__n_rows"]
    failures = []
    for i, ex in enumerate(spec.expectations):
        check = ex.get("check")
        if check == "row_count_min":
            failed = max(0, ex["value"] - n_rows) and 1
        elif check == "row_count_max":
            failed = max(0, n_rows - ex["value"]) and 1
        else:
            failed = int(counters.get(f"__x{i}") or 0)
        severity = ex.get("severity", "error")
        entry = {"check": check,
                 "column": ex.get("column") or ex.get("columns"),
                 "failed_rows": failed, "passed": failed == 0,
                 "severity": severity}
        result.expectation_results.append(entry)
        if failed and severity == "error":
            failures.append(entry)
    if failures:
        raise JobFailedError(f"expectations failed: {failures}")


def _load_streaming(spark: SparkSession, spec: JobSpec,
                    result: JobResult) -> None:
    """Streaming LOAD (SURVEY §7 step 7): the same spec, executed
    incrementally. The mapping pipeline, filter, SQL query, and
    DataFrame-level transforms all apply unchanged to the unbounded
    DataFrame; the checkpoint makes re-running the job process ONLY
    new source files (incremental ingest).

    Constraints inherent to streaming (enforced here, not silently
    ignored): a checkpoint is required; order_by and the count-based
    error-routing strategies don't apply (casts still null-on-failure —
    route-and-count error handling belongs to a batch backfill or a
    foreachBatch sink); AvailableNow is the default trigger so the job
    terminates after draining what exists.
    """
    from etl_load_spark.plans.builder import apply_transformation, \
        build_mapping_plan
    from etl_load_spark.sources.readers import read_stream_source
    from etl_load_spark.sources.writers import write_stream_sink

    if spec.incremental:
        raise ValueError("incremental (HWM) and streaming modes are "
                         "mutually exclusive — streaming checkpoints "
                         "already track progress")
    if not spec.streaming.get("checkpoint"):
        raise ValueError("streaming jobs require streaming.checkpoint")
    if spec.order_by:
        raise ValueError("order_by is undefined on an unbounded stream")
    if spec.destination is None:
        raise ValueError("streaming jobs require a destination")
    df = read_stream_source(spark, spec.source.type, spec.source.details)
    wm = spec.streaming.get("watermark")
    if wm:
        df = df.withWatermark(wm["column"], wm["delay"])
    if spec.query:
        df.createOrReplaceTempView("src")
        for name, ep in spec.extra_sources.items():
            # static dims join the stream (stream-static enrichment)
            read_source(spark, ep).createOrReplaceTempView(name)
        df = spark.sql(spec.query)
    else:
        df = build_mapping_plan(df, spec, False)
    df = apply_transformation(df, spark, spec)
    from etl_load_spark.plans.builder import streaming_merge_keys
    q = write_stream_sink(df, spec.destination.type, spec.destination.details,
                          spec.streaming, spec.job_id,
                          merge_keys=streaming_merge_keys(spec))
    try:
        if spec.streaming.get("trigger", "availableNow") == "availableNow":
            q.awaitTermination()
        else:
            q.awaitTermination(float(spec.streaming.get("timeout_sec", 60)))
            q.stop()
    finally:
        for p in q.recentProgress:
            result.records_read += int(p["numInputRows"])
            for sink_p in [p.get("sink") or {}]:
                n = sink_p.get("numOutputRows", -1)
                result.records_written += max(int(n), 0)
    if spec.expectations:
        # streaming loads validate what actually COMMITTED: read the sink
        # back (file/table sinks only — exactly the sinks with a committed
        # on-disk state to validate)
        result._output_df = read_source(spark, spec.destination)
        result._output_is_readback = True
