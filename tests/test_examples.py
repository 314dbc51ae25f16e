"""Every spec in examples/ must run end-to-end through the CLI path —
examples are user-facing documentation and may not rot."""

import glob
import json
import os

import pytest

EXAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples", "*.json")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_spec_runs(spark, path):
    from etl_load_spark.runner import run_job
    from etl_load_spark.spec import JobSpec
    spec = JobSpec.from_dict(json.load(open(path)))
    if spec.incremental:
        # fresh high-water mark: a stale /tmp state from a previous test
        # run would (correctly) yield an empty delta
        if os.path.exists(spec.incremental["state_path"]):
            os.remove(spec.incremental["state_path"])
    if spec.streaming:
        # fresh checkpoint + sink: a stale /tmp checkpoint from a prior
        # run would (correctly) drain zero new files
        import shutil
        for p in (spec.streaming["checkpoint"],
                  spec.destination.details.get("path")):
            if p and os.path.exists(p):
                shutil.rmtree(p)
    result = run_job(spark, spec)
    assert result.status == "COMPLETED", result.error
    if spec.streaming:
        # foreachBatch sinks don't report numOutputRows in progress;
        # the committed materialization is validated by VALIDATE_LOAD
        assert result.records_read > 0
    else:
        assert result.records_written > 0
    if spec.incremental:
        rerun = run_job(spark, spec)
        assert rerun.status == "COMPLETED", rerun.error
        assert rerun.records_written == 0  # nothing new → empty delta


def test_corpus_curation_output_shape(spark, tmp_path):
    """The curation demo writes a split-partitioned corpus with both splits
    present and no duplicate normalized texts."""
    import json as j
    from etl_load_spark.runner import run_job
    from etl_load_spark.spec import JobSpec
    path = [p for p in EXAMPLES if "corpus_curation" in p][0]
    d = j.load(open(path))
    out = str(tmp_path / "corpus")
    d["destination"]["details"]["path"] = out
    result = run_job(spark, JobSpec.from_dict(d))
    assert result.status == "COMPLETED", result.error
    back = spark.read.parquet(out)
    splits = {r.split for r in back.select("split").distinct().collect()}
    assert splits == {"train", "held_out"}
    n = back.count()
    assert back.select("doc_id").distinct().count() == n
    assert back.filter("n_tokens < 5").count() == 0


def test_refinery_chain_through_queue(spark, tmp_path):
    """The seven-stage training-refinery example chained the way production
    would run it: specs dropped into the spool queue in order, drained by
    the listener (ack-after-completion), funnel monotone through the
    LM-perplexity head, then the training-example assembly tail
    (sequence packing → shard layout) preserving every surviving row."""
    import shutil
    from etl_load_spark.queue_listener import FileQueueTransport, QueueListener
    shutil.rmtree("/tmp/etl_refinery", ignore_errors=True)
    stages = [p for p in EXAMPLES if "training_refinery" in p]
    assert len(stages) == 7
    q = FileQueueTransport(str(tmp_path / "q"))
    for p in stages:
        q.submit(json.load(open(p)))
    results = QueueListener(spark, q).drain()
    assert [r["status"] for r in results] == ["COMPLETED"] * 7
    n1 = spark.read.parquet("/tmp/etl_refinery/stage1_quality").count()
    n2 = spark.read.parquet("/tmp/etl_refinery/stage2_dedup").count()
    n3 = spark.read.parquet("/tmp/etl_refinery/stage3_decontam").count()
    n4 = spark.read.parquet("/tmp/etl_refinery/final_mixture").count()
    n5 = spark.read.parquet("/tmp/etl_refinery/final_lm_head").count()
    assert n1 >= n2 >= n3 >= n4 >= n5 > 0
    # the train/eval carve-out really applied: no held-out doc reaches the
    # training mixture (exact-cut semantics themselves are pinned in
    # tests/test_bloom.py and tests/test_transform_hook.py)
    held_out = spark.read.parquet(
        "/tmp/etl_refinery/stage3_decontam").filter("doc_id % 10 = 0")
    assert held_out.count() == 0
    # stage 6 (SEQUENCE_PACK annotate) keeps every surviving row and
    # assembles a gap-free packed stream: token widths (+1 EOS each)
    # sum exactly to the stream length implied by the last document
    packed = spark.read.parquet("/tmp/etl_refinery/final_packed")
    assert packed.count() == n5
    from pyspark.sql import functions as F
    agg = packed.agg(
        F.sum(F.col("n_tokens") + 1).alias("width"),
        F.max(F.col("start_off") + F.col("n_tokens") + 1).alias("end"))
    row = agg.collect()[0]
    assert row["width"] == row["end"]
    # stage 7 (ASSIGN_SHARDS) lays the packed corpus out by shard; the
    # manifest over the landed table reconciles exactly with the rows
    shards = spark.read.parquet("/tmp/etl_refinery/final_shards")
    assert shards.count() == n5
    from etl_load_spark.operators.corpus import shard_manifest
    man = shard_manifest(shards.select("doc_id", "text"), n_shards=16)
    mrows = man.collect()
    assert sum(r.n_docs for r in mrows) == n5
    assert {r.shard for r in shards.select("shard").distinct().collect()} \
        == {r.shard for r in mrows}
