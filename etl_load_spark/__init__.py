"""etl_load_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL system surveyed in ``SURVEY.md`` (amreekbasra/etl-load),
re-expressed Spark-first: declarative job specs compile to DataFrame plans,
Catalyst does all optimization, and the large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) are built on
DataFrame ops + Arrow-batched Pandas UDFs.

Layout:
    session    — tuned SparkSession builder
    types      — reference type-name / java.sql.Types → Spark DDL mapping
    spec       — JobSpec dataclasses (the jobconfigex.json shape, extended)
    plans      — spec → DataFrame plan builder (select/rename/cast/validate)
    sources    — reader/writer registry (parquet/csv/json/fixed-width/jdbc)
    functions  — transformation-rule registry + reference cast semantics
    operators  — error routing, dedup, similarity, text analysis, multimodal
    streaming  — watermarked windowed aggregations over event streams
    runner     — ordered step execution (validate/truncate/load/notify)
"""

__version__ = "0.1.0"

from etl_load_spark.session import get_spark  # noqa: F401
