"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the config deliberately mirrors what we would
set on a real cluster (AQE on, skew handling on, Arrow on, sane shuffle
partition count) so plans exercised in tests are the plans we'd ship.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would come from the cluster profile; locally they are sized
# for local[N] single-JVM runs (see SURVEY.md §6 / pyspark guide).
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.files.maxPartitionBytes": "128MB",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "16g",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # PySpark 4's DataFrame debugging wraps EVERY DataFrame API call with a
    # Python stack inspection plus ~3 py4j round trips (conf.get + origin
    # set/clear) purely to enrich error messages with user call sites.
    # Measured r14 (guide §1): plan BUILD time across the 189-query surface
    # was 89 s/pass — a third of the quiet-box bench — and ~half of it is
    # this wrapper (q24 build 2.1 s → 0.17 s, q28 1.8 → 0.9, q31 1.6 → 0.7
    # with it off). Results and plans are identical; only error-message
    # query-context decoration is lost, which a production engine trades
    # away gladly at this price. Re-enable ad hoc when debugging a query.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(app_name: str = "etl_load_spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    An already-active session is reused as-is (driver-owned sessions win).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(master or f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------------------
# Operator-internal cache registry.
#
# Some operators (bigram_surprisal, the error-split runner path) must persist
# an intermediate relation — Catalyst would otherwise re-plan an expensive
# shared subtree per consumer branch. A CacheManager-registered persist is
# held by a STRONG reference inside the session (never GC-collected), so an
# operator that persists and forgets pins executor memory for the life of a
# long-running session. Every operator-internal persist registers here; the
# materialization points (the job runner's epilogue, bench.py between
# queries, tests) call release_operator_caches() once the result is
# materialized. tests/test_session_hygiene.py asserts the contract
# mechanically for every declared query.
# ---------------------------------------------------------------------------

_OPERATOR_CACHES: list = []


def register_operator_cache(df):
    """Track an operator-internal persisted DataFrame for explicit release.

    Returns ``df`` so call sites can chain: ``register_operator_cache(
    rel.persist())``. Safe to call multiple times per operator invocation.
    """
    _OPERATOR_CACHES.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every registered operator cache; returns how many released.

    Idempotent and exception-safe: cleanup must never mask the job result,
    and an already-unpersisted or dead-session DataFrame is a no-op.
    """
    n = 0
    while _OPERATOR_CACHES:
        df = _OPERATOR_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — cleanup must not mask results
            pass
    return n


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver testdata table, normalizing physical-type quirks.

    The ``events`` table stores TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; we read it as int64 nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds
    with integer division — the same µs truncation DuckDB applies, so oracle
    comparisons stay exact.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # Session TZ is pinned to UTC, so NTZ -> LTZ is the identity on the
        # underlying micros value; keeps downstream epoch functions working.
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) -> dict:
    """Read the driver testdata tables and register them as temp views."""
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
