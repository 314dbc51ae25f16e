"""Connector registry: endpoint ``type`` string → reader/writer callable.

The Spark-native replacement for the reference's factory-bean lookup
(CoreLibInterfaces.java:404-414/440-447: type → bean name → DataReader/
DataWriter). Registries are plain dicts; third-party connectors register
themselves via ``register_reader`` / ``register_writer``.

Covered source types (SURVEY.md §2.1 S1-S9):
  PARQUET, FILE_CSV, FILE_JSON, FILE_ORC, FILE_XML (Spark 4 built-in),
  FILE_AVRO (package-gated), FILE_FIXED/TEXT, ORACLE_DB/MSSQL_DB/JDBC,
  API_REST (driver-side fetch), KAFKA (batch/stream, package-gated),
  ELASTICSEARCH / MONGODB (connector-format plumbing, package-gated — the
  reference declares both and implements neither), MEMORY (inline rows).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_load_spark.spec import EndpointConfig
from etl_load_spark.sources import readers, writers

_READERS: dict[str, Callable[[SparkSession, dict], DataFrame]] = {
    "PARQUET": readers.read_parquet,
    "FILE_PARQUET": readers.read_parquet,
    "FILE_CSV": readers.read_csv,
    "CSV": readers.read_csv,
    "FILE_JSON": readers.read_json,
    "JSON": readers.read_json,
    "FILE_ORC": readers.read_orc,
    "ORC": readers.read_orc,
    "FILE_XML": readers.read_xml,
    "XML": readers.read_xml,
    "FILE_AVRO": readers.read_avro,
    "AVRO": readers.read_avro,
    "FILE_FIXED": readers.read_text,
    "TEXT": readers.read_text,
    "ORACLE_DB": readers.read_jdbc,
    "MSSQL_DB": readers.read_jdbc,
    "JDBC": readers.read_jdbc,
    "API_REST": readers.read_rest,
    "KAFKA": readers.read_kafka,
    "ELASTICSEARCH": readers.read_elasticsearch,
    "MONGODB": readers.read_mongodb,
    "MEMORY": readers.read_memory,
}

_WRITERS: dict[str, Callable[[DataFrame, dict], dict]] = {
    "PARQUET": writers.write_parquet,
    "FILE_PARQUET": writers.write_parquet,
    "FILE_CSV": writers.write_csv,
    "CSV": writers.write_csv,
    "FILE_JSON": writers.write_json,
    "JSON": writers.write_json,
    "FILE_ORC": writers.write_orc,
    "ORC": writers.write_orc,
    "FILE_XML": writers.write_xml,
    "XML": writers.write_xml,
    "FILE_AVRO": writers.write_avro,
    "AVRO": writers.write_avro,
    "ORACLE_DB": writers.write_jdbc,
    "MSSQL_DB": writers.write_jdbc,
    "JDBC": writers.write_jdbc,
    "API_REST": writers.write_rest,
    "KAFKA": writers.write_kafka,
    "ELASTICSEARCH": writers.write_elasticsearch,
    "MONGODB": writers.write_mongodb,
    "MEMORY": writers.write_memory,
}


def register_reader(type_name: str, fn) -> None:
    _READERS[type_name.upper()] = fn


def register_writer(type_name: str, fn) -> None:
    _WRITERS[type_name.upper()] = fn


def read_source(spark: SparkSession, ep: EndpointConfig) -> DataFrame:
    try:
        fn = _READERS[ep.type.upper()]
    except KeyError:
        raise ValueError(f"Unsupported source type: {ep.type!r} "
                         f"(known: {sorted(_READERS)})") from None
    return fn(spark, ep.details)


#: transient failure markers retried by write_sink — the Spark-visible
#: analogues of the reference's IOException / SQLTransientException filter
#: (ETLCoreMainJobExecution.java:229-249). Spark already retries *task*
#: failures (spark.task.maxFailures); this guards whole-action failures
#: (sink connection drops, commit races).
_TRANSIENT_MARKERS = ("IOException", "SQLTransientException",
                      "SQLRecoverableException", "Connection refused",
                      "timed out", "TimeoutException")


def _is_transient(err: Exception) -> bool:
    s = repr(err)
    return any(m in s for m in _TRANSIENT_MARKERS)


def write_sink(df: DataFrame, ep: EndpointConfig, max_attempts: int = 3,
               backoff_sec: float = 1.0) -> dict:
    """Write with the reference's retry policy (U4): ``max_attempts`` tries,
    exponential backoff, transient errors only
    (ETLCoreMainJobExecution.java:184-221). File sinks commit atomically
    (Spark's commit protocol), so a retried attempt never double-writes;
    JDBC appends should use staging tables or idempotent keys (SURVEY §7.5.4).
    """
    import time as _time

    try:
        fn = _WRITERS[ep.type.upper()]
    except KeyError:
        raise ValueError(f"Unsupported destination type: {ep.type!r} "
                         f"(known: {sorted(_WRITERS)})") from None
    attempt = 0
    while True:
        try:
            return fn(df, ep.details)
        except Exception as e:  # noqa: BLE001 — filtered below
            attempt += 1
            if attempt >= max_attempts or not _is_transient(e):
                raise
            _time.sleep(backoff_sec * 2 ** (attempt - 1))
