"""Source readers (SURVEY.md §2.1 S1-S6).

Each reader takes (spark, details-dict) and returns a DataFrame. Details are
the job-spec endpoint detail keys; schemas come from the mapping list (via
``schema`` DDL string) or source inference, mirroring the reference's
declared-schema-with-ResultSetMetaData-fallback model (§1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, d: dict) -> DataFrame:
    """Parquet scan. ``merge_schema=True`` enables schema evolution: the
    schemas of all files union (columns added over time null-fill in old
    files); the merge cost is per-file footer metadata only, not data."""
    reader = spark.read
    if d.get("merge_schema"):
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(d["path"])


def read_csv(spark: SparkSession, d: dict) -> DataFrame:
    """CSV scan (S5: ItemReaderFactory.java:170-224 semantics).

    Default: comma delimiter, header on, UTF-8. With ``all_string=True`` the
    reference's read-everything-as-string behavior applies
    (ItemReaderFactory.java:212-221); typing then happens in the mapping cast.
    """
    reader = (spark.read
              .option("sep", d.get("delimiter", ","))
              .option("header", str(d.get("header", True)).lower())
              .option("encoding", d.get("encoding", "UTF-8"))
              .option("emptyValue", "")
              .option("nullValue", d.get("null_value", ""))
              # RFC-4180 embedded newlines (quoted) need multiLine parsing;
              # off by default because it disables line-split parallel reads
              .option("multiLine", str(d.get("multiline", False)).lower())
              .option("mode", d.get("mode", "PERMISSIVE")))
    if d.get("corrupt_column"):  # U3 parse-error path, same as FILE_JSON
        reader = reader.option("columnNameOfCorruptRecord", d["corrupt_column"])
        if d.get("schema") and d["corrupt_column"] not in d["schema"]:
            d = dict(d, schema=f"{d['schema']}, {d['corrupt_column']} string")
    if d.get("schema"):
        reader = reader.schema(d["schema"])
    elif not d.get("all_string", True):
        reader = reader.option("inferSchema", "true")
    # all_string default: columns arrive as strings (CSV has no types)
    return reader.csv(d["path"])


def read_json(spark: SparkSession, d: dict) -> DataFrame:
    """Line-delimited JSON (S6 FILE_JSON, etlModel.java:187).

    Malformed-line handling (the U3 parse-error path): default PERMISSIVE;
    with ``corrupt_column`` set the raw unparseable line lands in that
    column (appended to the declared schema as string) and everything else
    nulls — the error-routing split then sends those rows to the error
    sink exactly like cast failures. ``mode`` may also be DROPMALFORMED or
    FAILFAST."""
    reader = spark.read.option("mode", d.get("mode", "PERMISSIVE"))
    schema = d.get("schema")
    cc = d.get("corrupt_column")
    if cc:
        reader = reader.option("columnNameOfCorruptRecord", cc)
        if schema and cc not in schema:
            schema = f"{schema}, {cc} string"
    if schema:
        reader = reader.schema(schema)
    return reader.json(d["path"])


def read_orc(spark: SparkSession, d: dict) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning posture as parquet; here
    for lakes standardized on ORC (Hive heritage)."""
    reader = spark.read
    if d.get("merge_schema"):
        reader = reader.option("mergeSchema", "true")
    return reader.orc(d["path"])


def read_text(spark: SparkSession, d: dict) -> DataFrame:
    """Fixed-width / raw text: one ``value`` column per line (S6 FILE_FIXED).

    Field extraction happens in the mapping plan via ``fileColumnPosition``
    substrings (plans.builder.mapping_column)."""
    return spark.read.text(d["path"])


def read_jdbc(spark: SparkSession, d: dict) -> DataFrame:
    """JDBC scan (S1-S4): table or raw-query source, partitioned when bounds
    are declared.

    Mirrors ETLCoreJdbcReader.java:131-162's build-SQL-or-passthrough, with
    Spark's partitioned read replacing the docx's paging design (S4).
    Executed for real against embedded Derby (Spark's own jars) in
    tests/test_jdbc.py: table scan, raw query, fetchsize, partitioned read.
    """
    reader = (spark.read.format("jdbc")
              .option("url", d["url"])
              .option("fetchsize", str(d.get("fetch_size", 1000))))
    if d.get("query"):
        reader = reader.option("query", d["query"])  # S2 raw-query scan
    else:
        reader = reader.option("dbtable", d["table"])
    for k in ("user", "password", "driver"):
        if d.get(k):
            reader = reader.option(k, d[k])
    if d.get("partition_column"):  # S4: parallel range-partitioned scan
        reader = (reader
                  .option("partitionColumn", d["partition_column"])
                  .option("lowerBound", str(d["lower_bound"]))
                  .option("upperBound", str(d["upper_bound"]))
                  .option("numPartitions", str(d.get("num_partitions", 8))))
    return reader.load()


def read_rest(spark: SparkSession, d: dict) -> DataFrame:
    """API_REST source (S6): driver-side fetch → createDataFrame.

    Control-plane-sized payloads only (the reference uses REST for job
    submission, not bulk data). Network access may be absent in tests, so a
    pre-fetched ``rows`` payload is accepted.
    """
    rows = d.get("rows")
    if rows is None:
        import json
        import urllib.request
        with urllib.request.urlopen(d["url"], timeout=d.get("timeout", 30)) as r:
            rows = json.loads(r.read())
    return spark.createDataFrame(rows, schema=d.get("schema"))


def read_xml(spark: SparkSession, d: dict) -> DataFrame:
    """XML scan (Spark 4 built-in xml source — the reference's type bridge
    handles SQLXML, JdbcTypeHandler.java:126-128, and its FLAT_FILE world
    implies document interchange): one row per ``row_tag`` element.

    details: path, row_tag (default "row"), schema (DDL — without it the
    source samples and infers, an extra pass to avoid at scale),
    attribute_prefix ("_")."""
    reader = (spark.read.format("xml")
              .option("rowTag", d.get("row_tag", "row")))
    if d.get("attribute_prefix"):
        reader = reader.option("attributePrefix", d["attribute_prefix"])
    if d.get("schema"):
        reader = reader.schema(d["schema"])
    return reader.load(d["path"])


def read_avro(spark: SparkSession, d: dict) -> DataFrame:
    """AVRO scan (the row-oriented interchange format of Kafka/JDBC-era
    pipelines). The spark-avro module is external — package-gated like
    KAFKA: without it Spark raises its standard error naming the
    deployment coordinates.

    details: path, avro_schema (optional reader-schema JSON for
    evolution)."""
    reader = spark.read.format("avro")
    if d.get("avro_schema"):
        reader = reader.option("avroSchema", d["avro_schema"])
    return reader.load(d["path"])


def read_memory(spark: SparkSession, d: dict) -> DataFrame:
    """Inline rows (tests / fixtures)."""
    return spark.createDataFrame(d["rows"], schema=d.get("schema"))


def read_kafka(spark: SparkSession, d: dict) -> DataFrame:
    """KAFKA source (S6 declared slot, etlModel.java:182-190 "// Add others
    like KAFKA"): batch or streaming read of a topic.

    The reference uses Kafka only as a job-config control plane
    (wfqueuelistener.java:130-155); this connector is the data-plane
    upgrade: value bytes + metadata columns, optionally JSON-decoded via
    ``value_schema`` (DDL string). Requires the spark-sql-kafka package on
    the classpath (not bundled in this container — the option plumbing is
    tested for shape; a missing package raises Spark's standard
    DATA_SOURCE_NOT_FOUND with the coordinates to add).

    details: bootstrap_servers, topic (or topics/pattern), streaming
    (bool, default False), starting_offsets (default "earliest"),
    value_schema (optional DDL for from_json on the value).
    """
    from pyspark.sql import functions as F
    src = spark.readStream if d.get("streaming") else spark.read
    reader = (src.format("kafka")
              .option("kafka.bootstrap.servers", d["bootstrap_servers"])
              .option("startingOffsets", d.get("starting_offsets", "earliest")))
    if d.get("topic"):
        reader = reader.option("subscribe", d["topic"])
    elif d.get("topics"):
        reader = reader.option("subscribe", ",".join(d["topics"]))
    elif d.get("pattern"):
        reader = reader.option("subscribePattern", d["pattern"])
    else:
        raise ValueError("KAFKA source needs topic, topics, or pattern")
    df = reader.load()
    out = df.select(F.col("key").cast("string").alias("key"),
                    F.col("value").cast("string").alias("value"),
                    "topic", "partition", "offset", "timestamp")
    if d.get("value_schema"):
        out = out.withColumn("data", F.from_json("value", d["value_schema"]))
    return out


def read_elasticsearch(spark: SparkSession, d: dict) -> DataFrame:
    """ELASTICSEARCH source via es-hadoop (one Spark partition per index
    shard; ``query`` pushes the ES query DSL down to the cluster so only
    matching docs cross the wire). Package-gated like KAFKA.

    details: nodes, port, index, query (ES DSL JSON), user/password."""
    from etl_load_spark.sources.writers import es_options
    return (spark.read.format("org.elasticsearch.spark.sql")
            .options(**es_options(d)).load())


def read_mongodb(spark: SparkSession, d: dict) -> DataFrame:
    """MONGODB source via the mongo-spark connector (partitioned by the
    connector's sample-based splitter; ``pipeline`` pushes an aggregation
    stage down so filtering/projection happen server-side).

    details: uri, database, collection, pipeline (JSON array string)."""
    from etl_load_spark.sources.writers import mongo_options
    reader = spark.read.format("mongodb").options(**mongo_options(d))
    if d.get("pipeline"):
        reader = reader.option("aggregation.pipeline", d["pipeline"])
    return reader.load()


#: file formats that support incremental (streaming) reads
_STREAM_FILE_FORMATS = {"PARQUET": "parquet", "FILE_PARQUET": "parquet",
                        "ORC": "orc", "FILE_ORC": "orc",
                        "CSV": "csv", "FILE_CSV": "csv",
                        "JSON": "json", "FILE_JSON": "json"}


def read_stream_source(spark: SparkSession, type_name: str, d: dict) -> DataFrame:
    """Streaming read of a source endpoint (SURVEY §7 step 7): the same
    endpoint details as the batch readers, executed incrementally — each
    micro-batch processes only files not yet recorded in the checkpoint,
    which is what turns a batch spec into an incremental ingest job.

    File streams need a schema up front; if the spec doesn't declare one,
    it is inferred ONCE from the existing files via the batch reader
    (driver-side metadata read, not a data scan for parquet/orc).
    """
    t = type_name.upper()
    if t == "KAFKA":
        return read_kafka(spark, dict(d, streaming=True))
    if t not in _STREAM_FILE_FORMATS:
        raise ValueError(f"source type {type_name!r} does not support "
                         f"streaming (known: {sorted(_STREAM_FILE_FORMATS)}, KAFKA)")
    fmt = _STREAM_FILE_FORMATS[t]
    reader = spark.readStream.format(fmt)
    if fmt == "csv":
        reader = (reader.option("sep", d.get("delimiter", ","))
                  .option("header", str(d.get("header", True)).lower()))
    if d.get("max_files_per_trigger"):
        # bounds micro-batch size — the streaming analogue of chunked loads
        reader = reader.option("maxFilesPerTrigger",
                               int(d["max_files_per_trigger"]))
    schema = d.get("schema")
    if schema:
        reader = reader.schema(schema)
    else:
        from etl_load_spark.sources.registry import _READERS
        reader = reader.schema(_READERS[t](spark, d).schema)
    path = d["path"]
    import os
    if os.path.isfile(path):
        # the file-stream source needs a DIRECTORY ('basePath' must be a
        # directory); expose a single-file table through a symlinked temp
        # dir, no data copy (the streaming.windows.open_event_stream
        # pattern — and like there, link the FILE, never a directory:
        # the source does not recurse into a linked subdirectory).
        # The dir is DETERMINISTIC (keyed by the resolved source path,
        # ADVICE r12): the file-stream checkpoint's seen-files log keys
        # on the LISTED path, so a fresh mkdtemp per run made every
        # re-run with a retained checkpoint re-ingest the whole file as
        # new — double-counting rows into retained update-mode state.
        import hashlib
        import tempfile
        resolved = os.path.realpath(path)
        key = hashlib.md5(resolved.encode()).hexdigest()[:16]
        stream_dir = os.path.join(tempfile.gettempdir(),
                                  f"etl_stream_src_{key}")
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, os.path.basename(path))
        if os.path.lexists(link):
            if not os.path.islink(link) or os.readlink(link) != resolved:
                os.remove(link)
                os.symlink(resolved, link)
        else:
            os.symlink(resolved, link)
        path = stream_dir
    return reader.load(path)
