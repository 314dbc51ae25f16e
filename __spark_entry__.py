"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared query surface (SURVEY.md §2.9) backed
by ``etl_load_spark.queries`` — one entry per implemented operator, each
with a DuckDB oracle unless the operator is approximate/non-SQL by nature.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_load_spark.queries import QUERIES  # noqa: E402

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executors (the ``--py-files`` deployment story).

    Python-UDF closures are pickled by reference to ``etl_load_spark``;
    workers don't inherit the driver's ``sys.path``, so a driver that merely
    path-inserted this repo would fail at the first Arrow-batched UDF. A
    zip + ``addPyFile`` works identically on local[*] and a real cluster.
    """
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile
    root = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.mkdtemp(prefix="etl_load_spark_"),
                         "etl_load_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(os.path.join(root, "etl_load_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def _wrap(fn: Callable[[SparkSession, str], DataFrame]
          ) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        # release the PREVIOUS query's operator-internal persists (e.g.
        # q146's bigram relation) before building this one: the harness
        # collects each returned DataFrame and never unpersists, so
        # without this hand-off one query's cache would squat on executor
        # memory for every query that runs after it (round-3 lesson)
        from etl_load_spark.session import release_operator_caches
        release_operator_caches()
        return fn(spark, sf_dir)
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for approximate /
    non-SQL-expressible operators → driver records rows-only checks)."""
    return {name: q.oracle.strip() for name, q in QUERIES.items()
            if q.oracle is not None}
