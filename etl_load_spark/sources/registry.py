"""Connector registry: endpoint ``type`` string → reader/writer callable.

The Spark-native replacement for the reference's factory-bean lookup
(CoreLibInterfaces.java:404-414/440-447: type → bean name → DataReader/
DataWriter). Registries are plain dicts; third-party connectors register
themselves via ``register_reader`` / ``register_writer``.

Covered source types (SURVEY.md §2.1 S1-S9):
  PARQUET, FILE_CSV, FILE_JSON, FILE_FIXED/TEXT, ORACLE_DB/MSSQL_DB/JDBC,
  API_REST (driver-side fetch), MEMORY (inline rows for tests).
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
    "FILE_FIXED": readers.read_text,
    "TEXT": readers.read_text,
    "ORACLE_DB": readers.read_jdbc,
    "MSSQL_DB": readers.read_jdbc,
    "JDBC": readers.read_jdbc,
    "API_REST": readers.read_rest,
    "MEMORY": readers.read_memory,
}

_WRITERS: dict[str, Callable[[DataFrame, dict], dict]] = {
    "PARQUET": writers.write_parquet,
    "FILE_PARQUET": writers.write_parquet,
    "FILE_CSV": writers.write_csv,
    "CSV": writers.write_csv,
    "FILE_JSON": writers.write_json,
    "JSON": writers.write_json,
    "ORACLE_DB": writers.write_jdbc,
    "MSSQL_DB": writers.write_jdbc,
    "JDBC": writers.write_jdbc,
    "API_REST": writers.write_rest,
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


def write_sink(df: DataFrame, ep: EndpointConfig) -> dict:
    try:
        fn = _WRITERS[ep.type.upper()]
    except KeyError:
        raise ValueError(f"Unsupported destination type: {ep.type!r} "
                         f"(known: {sorted(_WRITERS)})") from None
    return fn(df, ep.details)
