"""Small-file compaction (operators/maintenance.py)."""

import glob

from etl_load_spark.operators.maintenance import compact_files


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "many")
    # 40 tiny files (one per partition of the write)
    (spark.range(0, 4000).selectExpr("id", "id % 7 AS k")
     .repartition(40).write.parquet(path))
    before = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    m = compact_files(spark, path, target_file_mb=128)
    assert m["files_before"] == 40
    assert m["files_after"] == 1  # 4000 ints ≪ 128 MB
    assert m["rows"] == 4000
    after = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    assert after == before
    # no temp/backup residue
    assert not glob.glob(str(tmp_path / "many.compact_tmp*"))
    assert not glob.glob(str(tmp_path / "many.pre_compact*"))


def test_compaction_preserves_partition_layout(spark, tmp_path):
    path = str(tmp_path / "bydate")
    (spark.createDataFrame(
        [(d, i) for d in ("2024-01-01", "2024-01-02") for i in range(100)],
        "day string, n int")
     .repartition(20).write.partitionBy("day").parquet(path))
    m = compact_files(spark, path, partition_by=["day"])
    assert m["files_before"] > m["files_after"]
    got = spark.read.parquet(path)
    assert got.count() == 200
    # hive layout intact: day survives as a partition directory
    assert sorted(str(r.day) for r in got.select("day").distinct().collect()) \
        == ["2024-01-01", "2024-01-02"]
    assert glob.glob(str(tmp_path / "bydate" / "day=2024-01-01" / "*.parquet"))


def test_cli_compact(spark, tmp_path, capsys):
    from etl_load_spark.cli import main
    path = str(tmp_path / "cli_many")
    spark.range(0, 1000).repartition(20).write.parquet(path)
    rc = main(["compact", path, "--target-mb", "64", "--json"])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_before"] == 20 and out["files_after"] == 1
    assert spark.read.parquet(path).count() == 1000


def test_compact_destination_step(spark, sf_dir, tmp_path):
    from etl_load_spark.runner import run_job
    from etl_load_spark.spec import JobSpec
    dst = str(tmp_path / "stepped")
    res = run_job(spark, JobSpec.from_dict({
        "jobId": "compact_step",
        "source": {"type": "PARQUET", "path": f"{sf_dir}/orders.parquet"},
        "destination": {"type": "PARQUET", "path": dst,
                        "repartition": 16, "compact_target_mb": 64},
        "query": "SELECT * FROM src",
        "steps": ["LOAD", "VALIDATE_LOAD", "COMPACT_DESTINATION"],
    }))
    assert res.status == "COMPLETED", res.error
    assert any(s.startswith("COMPACT_DESTINATION:16->") for s in res.step_log)
    assert spark.read.parquet(dst).count() == res.records_written


def test_compaction_restores_original_on_swap_failure(spark, tmp_path,
                                                      monkeypatch):
    """If the second rename of the swap fails, the original directory must
    be restored intact (the crash-safety claim)."""
    import os as _os
    import pytest
    from etl_load_spark.operators import maintenance

    path = str(tmp_path / "fragile")
    spark.range(0, 500).repartition(5).write.parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    real_rename = _os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the tmp -> path rename
            raise OSError("injected swap failure")
        return real_rename(src, dst)

    monkeypatch.setattr(maintenance.os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected"):
        maintenance.compact_files(spark, path, target_file_mb=64)
    monkeypatch.undo()
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before, "original data must survive a failed swap"


def test_compaction_recovers_from_interrupted_swap(spark, tmp_path):
    """A crash BETWEEN the two swap renames leaves no dataset at path and
    the original stranded in .pre_compact; the next compact_files call must
    restore it before proceeding (the recovery protocol)."""
    import os as _os

    path = str(tmp_path / "interrupted")
    spark.range(0, 300).repartition(6).write.parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    # simulate the crash state: path moved to backup, nothing at path
    _os.rename(path, path + ".pre_compact")
    m = compact_files(spark, path, target_file_mb=64)
    assert m["rows"] == 300
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before


def test_compaction_splits_large_partition(spark, tmp_path):
    """With partition_by, a hive partition larger than the target must be
    written as MULTIPLE files (salt + maxRecordsPerFile), not one oversized
    file per partition."""
    path = str(tmp_path / "skewed")
    # incompressible payloads so on-disk bytes reflect real volume
    big = spark.range(40_000).selectExpr(
        "'big' AS part", "id AS n",
        "repeat(md5(cast(id AS string)), 8) AS payload")
    small = spark.range(50).selectExpr(
        "'small' AS part", "id AS n",
        "md5(cast(id AS string)) AS payload")
    (big.union(small)
     .repartition(30).write.partitionBy("part").parquet(path))
    compact_files(spark, path, target_file_mb=1, partition_by=["part"])
    big_files = glob.glob(str(tmp_path / "skewed" / "part=big" / "*.parquet"))
    small_files = glob.glob(str(tmp_path / "skewed" / "part=small" / "*.parquet"))
    assert len(big_files) > 1, "large partition must split near the target"
    assert len(small_files) == 1, "small partition must not re-fragment"
    got = spark.read.parquet(path)
    assert got.count() == 40_050


def test_compact_partitioned_keeps_null_partition_rows(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__) must survive a
    partitioned compaction — an equality probe join would silently drop
    them from the rewrite."""
    from etl_load_spark.operators.maintenance import compact_files
    path = str(tmp_path / "nulled")
    rows = [(i, None if i % 3 == 0 else f"d{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, day string")
    df.repartition(8).write.partitionBy("day").parquet(path)
    m = compact_files(spark, path, target_file_mb=64, partition_by=["day"])
    assert m["rows"] == 300
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert back.filter("day IS NULL").count() == 100
