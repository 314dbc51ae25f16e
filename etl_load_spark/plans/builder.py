"""Spec → DataFrame plan builder.

Compiles a ``JobSpec`` into a single declarative DataFrame expression — the
Spark replacement for the reference's row-at-a-time mapping processor
(ETLCoreMappingProcessor.java:56-107). Order of column-level stages mirrors
the reference's per-row pipeline:

    project (P1/P2) → filter (P3) → fixed-width extract (P8) →
    rule (U2/F1-F2) → default (P7) → cast (P5) → rename (P4)

Everything stays inside Catalyst (whole-stage codegen); projection and the
filter push down into the source scan automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_load_spark.functions.casts import cast_column
from etl_load_spark.functions.rules import apply_rule
from etl_load_spark.spec import JobSpec, Mapping


def _positions(spec_str: str) -> tuple[int, int]:
    """Parse a fixed-width ``"start-end"`` 1-based inclusive position spec
    (etlModel.java:96-97)."""
    start, end = spec_str.split("-")
    return int(start), int(end)


def mapping_column(m: Mapping, source_is_line: bool = False) -> F.Column:
    """One destination column expression from one mapping entry."""
    if source_is_line and m.file_column_position:
        start, end = _positions(m.file_column_position)
        col = F.trim(F.substring(F.col("value"), start, end - start + 1))
    else:
        col = F.col(m.source)
    col = apply_rule(col, m.transformation_rule)
    if m.default_value is not None:
        # null/empty → default (etlModel.java:98-99)
        col = F.when(col.isNull() | (col.cast("string") == ""),
                     F.lit(m.default_value)).otherwise(col)
    col = cast_column(col, m.dest_type, m.format_pattern)
    return col.alias(m.dest)


def build_mapping_plan(df: DataFrame, spec: JobSpec,
                       source_is_line: bool = False) -> DataFrame:
    """Apply filter + mapping list to a source DataFrame."""
    if spec.filter:
        # predicate passthrough (P3): opaque SQL handed to Catalyst — parsed,
        # optimized, and pushed down to the scan where possible
        df = df.filter(F.expr(spec.filter))
    if spec.mappings:
        df = df.select(*[mapping_column(m, source_is_line) for m in spec.mappings])
    if spec.order_by:
        df = df.orderBy(*spec.order_by)
    return df


def build_plan(spark: SparkSession, spec: JobSpec,
               source_df: DataFrame | None = None) -> DataFrame:
    """Full plan: read source(s), register views, apply query or mappings.

    When ``spec.query`` is set, the source is registered as view ``src``
    (plus ``extra_sources`` under their keys) and the query is executed by
    Spark SQL — this is where joins/aggs/windows/set-ops live (§2.9 items
    3-8). Otherwise the mapping pipeline applies. ``source_df`` overrides
    the source read (the runner passes the HWM-filtered source for
    incremental jobs).
    """
    from etl_load_spark.sources.registry import read_source

    df = source_df if source_df is not None else read_source(spark, spec.source)
    source_is_line = spec.source.type.upper() in ("FILE_FIXED", "TEXT")
    if spec.query:
        df.createOrReplaceTempView("src")
        for name, ep in spec.extra_sources.items():
            read_source(spark, ep).createOrReplaceTempView(name)
        df = spark.sql(spec.query)
        df = build_mapping_plan(df, spec, False) if spec.mappings else df
    else:
        df = build_mapping_plan(df, spec, source_is_line)
    return apply_transformation(df, spark, spec)


def apply_transformation(df: DataFrame, spark: SparkSession,
                         spec: JobSpec) -> DataFrame:
    """U1 pluggable transform stage (spec.Transformation): load the user
    script and apply its ``transform`` (DataFrame-level) or
    ``transform_pandas`` (Arrow-batched mapInPandas) hook."""
    tr = spec.transformation
    if tr is None or tr.type.upper() == "NONE":
        return df
    if tr.type.upper() == "SCD2_MERGE":
        return _scd2_transform(df, spark, spec)
    if tr.type.upper() == "CDC_SCD2_APPLY":
        if df.isStreaming:
            raise ValueError(
                "transformation.type=CDC_SCD2_APPLY is batch-only (version "
                "bounding needs the whole key group); land the feed, then "
                "apply each landed batch downstream")
        return _cdc_scd2_transform(df, spark, spec)
    if tr.type.upper() == "DECONTAMINATE":
        if df.isStreaming:
            raise ValueError(
                "transformation.type=DECONTAMINATE is batch-only; the bloom "
                "probe and verify join are stream-safe map-side stages, but "
                "the per-document shared-n-gram aggregation needs a landed "
                "batch pass — land the stream, then run DECONTAMINATE "
                "downstream")
        return _decontaminate_transform(df, spark, spec)
    if tr.type.upper() == "INCREMENTAL_DEDUP":
        if df.isStreaming:
            raise ValueError(
                "transformation.type=INCREMENTAL_DEDUP is batch-only (the "
                "within-batch survivor needs the whole content group); use "
                "streaming.windows.stream_content_dedup for checkpointed "
                "first-seen-wins content admission on a live stream "
                "(stream-static anti join against the admitted index + "
                "stateful in-stream dedup), or land the stream and admit "
                "each landed batch downstream")
        return _incremental_dedup_transform(df, spark, spec)
    if tr.type.upper() == "IMPORTANCE_RESAMPLE":
        if df.isStreaming:
            raise ValueError(
                "transformation.type=IMPORTANCE_RESAMPLE is batch-only "
                "(the raw-corpus feature histogram is corpus-global); "
                "train the histograms offline, then score the stream with "
                "a broadcast join against the frozen bucket-score table")
        return _importance_resample_transform(df, spark, spec)
    if tr.type.upper() == "ASOF_JOIN":
        if df.isStreaming:
            raise ValueError(
                "transformation.type=ASOF_JOIN is batch-only (the "
                "union-window argmax needs each key's ordered history); "
                "for bounded-lookback stream enrichment use "
                "streaming.windows.stream_interval_join, or land the "
                "stream and enrich each landed batch downstream")
        return _asof_join_transform(df, spark, spec)
    if tr.type.upper() == "HARD_NEGATIVES":
        if df.isStreaming:
            raise ValueError(
                "transformation.type=HARD_NEGATIVES is batch-only (the "
                "per-anchor top-k and best-positive max need the whole "
                "corpus snapshot); land the stream, then mine each landed "
                "snapshot downstream")
        return _hard_negatives_transform(df, spark, spec)
    if tr.type.upper() in _CORPUS_TRANSFORMS:
        if df.isStreaming and tr.type.upper() in _STREAMING_TWINS:
            # pure-aggregate rollups stream as their watermark twins
            # (round 11): the identical aggregation minus the batch
            # output sort, state bounded by the watermark. With a
            # file destination use streaming.output_mode=update — the
            # sink materializes via the continuous-aggregate upsert
            # (dynamic partition overwrite per micro-batch).
            return _STREAMING_TWINS[tr.type.upper()](df,
                                                     tr.parameters or {})
        if df.isStreaming and tr.type.upper() in _BATCH_ONLY_TRANSFORMS:
            # multi-stage stateful plans are not expressible as ONE
            # streaming query. Fail with the right pointer instead of
            # Spark's output-mode error. (QUALITY_FILTER and
            # MIXTURE_SAMPLE are per-row and work on streams.)
            raise ValueError(
                f"transformation.type={tr.type.upper()} is batch-only; "
                f"{_BATCH_ONLY_TRANSFORMS[tr.type.upper()]}")
        return _CORPUS_TRANSFORMS[tr.type.upper()](df, tr.parameters or {})
    if tr.type.upper() != "PYTHON_SCRIPT":
        raise ValueError(f"unknown transformation.type: {tr.type!r} "
                         "(known: NONE, PYTHON_SCRIPT, SCD2_MERGE, "
                         "PASSAGE_DEDUP, QUALITY_FILTER, MIXTURE_SAMPLE, "
                         "QUALITY_CLASSIFIER, SEMANTIC_DEDUP, DECONTAMINATE, "
                         "CLUSTER_BALANCE, CHUNK_DOCUMENTS, LM_SURPRISAL, "
                         "CROSS_SOURCE_DEDUP, TOKEN_BUDGET, ASSIGN_SHARDS, "
                         "SEQUENCE_PACK, INCREMENTAL_DEDUP, "
                         "QUANTIZE_EMBEDDINGS, STRATIFIED_SAMPLE, "
                         "URL_CANONICALIZE, IMPORTANCE_RESAMPLE, MARKUP_STRIP, "
                         "CDC_SCD2_APPLY, ASSIGN_SPLIT, PRIORITY_SAMPLE, "
                         "QUOTA_SAMPLE, HARD_NEGATIVES, "
                         "WINDOW_MINHASH_DEDUP, GAPFILL, COUNTER_RATE, "
                         "OHLC, TIME_WEIGHTED_AVG, STATE_DURATIONS, "
                         "HEARTBEAT_UPTIME, LTTB, TREND, INSTANT_RATE, "
                         "VALUE_HISTOGRAM, DELTA, VALUE_STATS, CHANGES, "
                         "VALUE_TOPK, ASOF_JOIN)")
    if not tr.script_path:
        raise ValueError("transformation.type=PYTHON_SCRIPT requires scriptPath")
    import importlib.util
    mod_spec = importlib.util.spec_from_file_location("etl_user_transform",
                                                      tr.script_path)
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    if hasattr(mod, "transform"):
        return mod.transform(df, spark, tr.parameters)
    if hasattr(mod, "transform_pandas"):
        fn, params = mod.transform_pandas, tr.parameters
        return df.mapInPandas(lambda it: (fn(pdf, params) for pdf in it),
                              schema=df.schema)
    raise ValueError(
        f"{tr.script_path} defines neither transform(df, spark, params) "
        f"nor transform_pandas(pdf, params)")


def _scd2_transform(df: DataFrame, spark: SparkSession,
                    spec: JobSpec) -> DataFrame:
    """Declarative SCD Type-2 merge stage (operators/scd.py wired into the
    job spec): the mapped source rows are the UPDATE batch; the existing
    dimension comes from ``extra_sources["dim"]`` — usually the same table
    the destination points at — or, if absent, the incoming batch is
    bootstrapped into SCD2 shape (initial load). Parameters:

      keyColumns:   list[str]  (required)
      attrColumns:  list[str]  (required)
      effectiveDate: 'YYYY-MM-DD' (required)

    Write the result with mode=overwrite: the merge re-emits the full
    dimension (history + current). At lake scale, partition the stored
    dimension by is_current so history files rewrite-free (SCALE.md).
    """
    from etl_load_spark.operators.scd import as_scd2, scd2_merge
    from etl_load_spark.sources.registry import read_source

    p = spec.transformation.parameters or {}
    missing = [k for k in ("keyColumns", "attrColumns", "effectiveDate")
               if not p.get(k)]
    if missing:
        raise ValueError(f"SCD2_MERGE parameters missing: {missing}")
    if "dim" not in spec.extra_sources:
        return as_scd2(df, p["effectiveDate"])
    dim = read_source(spark, spec.extra_sources["dim"])
    return scd2_merge(dim, df, list(p["keyColumns"]), list(p["attrColumns"]),
                      p["effectiveDate"])


def _cdc_scd2_transform(df: DataFrame, spark: SparkSession,
                        spec: JobSpec) -> DataFrame:
    """Declarative CDC→SCD2 stage (operators/scd.cdc_scd2_apply wired
    into the job spec): the mapped source rows are the CHANGE FEED
    (op column with I/U/D + a monotone seq column); the existing
    dimension comes from ``extraSources.dim``. Parameters: keyColumns,
    attrColumns, seqColumn (all required), opColumn ('op'). Write the
    result with mode=overwrite (the fold re-emits the full dimension)."""
    from etl_load_spark.operators.scd import cdc_scd2_apply
    from etl_load_spark.sources.registry import read_source

    p = spec.transformation.parameters or {}
    missing = [k for k in ("keyColumns", "attrColumns", "seqColumn")
               if not p.get(k)]
    if missing:
        raise ValueError(f"CDC_SCD2_APPLY parameters missing: {missing}")
    if "dim" not in spec.extra_sources:
        raise ValueError("CDC_SCD2_APPLY requires extraSources.dim "
                         "(the existing SCD2 dimension; bootstrap one "
                         "with SCD2_MERGE first)")
    dim = read_source(spark, spec.extra_sources["dim"])
    return cdc_scd2_apply(dim, df, list(p["keyColumns"]),
                          list(p["attrColumns"]), p["seqColumn"],
                          op_col=p.get("opColumn", "op"))


def _passage_dedup_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative passage-level dedup stage (operators/corpus.py wired
    into the job spec): replaces ``textColumn`` with its first-occurrence
    rebuild, preserving every other column. Parameters: idColumn
    ('doc_id'), textColumn ('text'), blockTokens (16), dropEmptied (True —
    drop documents whose every passage was seen earlier)."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.corpus import passage_dedup
    id_col = p.get("idColumn", "doc_id")
    text_col = p.get("textColumn", "text")
    pd_ = passage_dedup(df, id_col, text_col,
                        int(p.get("blockTokens", 16)))
    if p.get("dropEmptied", True):
        pd_ = pd_.filter(F.col("n_kept") > 0)
    return (df.drop(text_col)
            .join(pd_.select(id_col,
                             F.col("text_deduped").alias(text_col)),
                  id_col))


def _quality_filter_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative Gopher-rule quality stage. mode='filter' (default)
    keeps only rows passing every rule; mode='annotate' appends the rule
    booleans + ``keep`` so downstream steps can route on them. Threshold
    parameters mirror operators/corpus.quality_rules."""
    from etl_load_spark.operators.corpus import quality_rules
    rules = quality_rules(
        df[p.get("textColumn", "text")],
        min_words=int(p.get("minWords", 30)),
        max_words=int(p.get("maxWords", 100_000)),
        min_mean_len=float(p.get("minMeanWordLen", 2.0)),
        max_mean_len=float(p.get("maxMeanWordLen", 12.0)),
        min_stopwords=int(p.get("minStopwords", 1)),
        min_distinct_ratio=float(p.get("minDistinctRatio", 0.1)))
    keep = rules[0] & rules[1] & rules[2] & rules[3]
    if p.get("mode", "filter") == "annotate":
        return df.select("*", *rules, keep.alias("keep"))
    return df.filter(keep)


def _mixture_sample_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative data-mixture stage: deterministic weighted sampling by
    a key column. Parameters: weights (dict source→fraction, required),
    keyColumn ('source'), idColumn ('doc_id'), defaultWeight (0.0),
    salt ('mix' — rotate to draw an independent sample)."""
    from etl_load_spark.operators.corpus import mixture_sample
    if not p.get("weights"):
        raise ValueError("MIXTURE_SAMPLE requires parameters.weights")
    return mixture_sample(
        df, {str(k): float(v) for k, v in p["weights"].items()},
        id_col=p.get("idColumn", "doc_id"),
        key_col=p.get("keyColumn", "source"),
        default_weight=float(p.get("defaultWeight", 0.0)),
        salt=p.get("salt", "mix"))





def _quality_classifier_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative model-based quality stage (operators/corpus.
    quality_classifier): mode='filter' (default) keeps rows the classifier
    scores above keepThreshold; mode='annotate' appends
    (n_tokens, mean_weight, keep). Parameters: idColumn, textColumn,
    keepThreshold (0.0)."""
    from etl_load_spark.operators.corpus import quality_classifier
    id_col = p.get("idColumn", "doc_id")
    scored = quality_classifier(df, id_col, p.get("textColumn", "text"),
                                float(p.get("keepThreshold", 0.0)))
    if p.get("mode", "filter") == "annotate":
        return df.join(scored, id_col)
    keep_ids = scored.filter("keep").select(id_col)
    return df.join(keep_ids, id_col, "left_semi")


def _semantic_dedup_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative SemDeDup stage (operators/similarity.semantic_dedup):
    finds near-duplicate pairs via k-means-blocked exact cosine and drops
    the HIGHER id of every pair. Parameters: idColumn ('vec_id'),
    vectorColumn ('embedding'), threshold (0.95), nCells (16), seed (42)."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.similarity import semantic_dedup
    id_col = p.get("idColumn", "vec_id")
    pairs = semantic_dedup(
        df, threshold=float(p.get("threshold", 0.95)),
        id_col=id_col, vec_col=p.get("vectorColumn", "embedding"),
        n_cells=int(p.get("nCells", 16)), seed=int(p.get("seed", 42)))
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def _chunk_documents_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative chunking stage (operators/corpus.chunk_documents):
    REPLACES the row shape with the chunk relation (idColumn, chunk_no,
    chunk_text, n_tokens) — the shard step ahead of embedding/indexing.
    Stateless per row, so it runs on streams. Parameters: idColumn
    ('doc_id'), textColumn ('text'), chunkTokens (64), overlap (16)."""
    from etl_load_spark.operators.corpus import chunk_documents
    return chunk_documents(df, p.get("idColumn", "doc_id"),
                           p.get("textColumn", "text"),
                           int(p.get("chunkTokens", 64)),
                           int(p.get("overlap", 16)))


def _lm_surprisal_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative LM-surprisal stage (operators/text.bigram_surprisal —
    the CCNet perplexity filter): score each document's bits-per-bigram
    under the corpus-trained Laplace-smoothed bigram model.
    mode='filter' keeps the predictable head, cut by exactly ONE of
    maxBits (absolute bits-per-bigram ceiling) or keepQuantile (keep
    the lowest-scoring fraction — CCNet's own corpus-relative form; a
    self-trained model's absolute scores shift with corpus size, so
    there is no defaultable absolute threshold). mode='annotate'
    appends (n_bigrams, total_bits, bits_per_bigram); <2-token
    documents score no events and are DROPPED in filter mode /
    NULL-scored in annotate mode. The quantile is percentile_approx
    over the doc-level score relation — t-digest, distributed, bounded
    memory at any corpus size. Parameters: idColumn ('doc_id'),
    textColumn ('text'), maxBits | keepQuantile, mode."""
    from etl_load_spark.operators.text import bigram_surprisal
    id_col = p.get("idColumn", "doc_id")
    scored = bigram_surprisal(df, id_col, p.get("textColumn", "text"))
    if p.get("mode", "filter") == "annotate":
        # annotate mode computes scores only — a cut parameter here is a
        # misconfigured spec, not a silent no-op (mirrors the filter-mode
        # exactly-one check below)
        stray = sorted(k for k in ("maxBits", "keepQuantile") if k in p)
        if stray:
            raise ValueError(
                f"LM_SURPRISAL mode='annotate' does not cut; remove "
                f"{stray} or use mode='filter'")
        return df.join(scored, id_col, "left")
    if ("maxBits" in p) == ("keepQuantile" in p):
        raise ValueError("LM_SURPRISAL filter mode requires exactly one "
                         "of maxBits (absolute bits-per-bigram cut) or "
                         "keepQuantile (keep the most predictable "
                         "fraction); use mode='annotate' to inspect the "
                         "score distribution first")
    if "keepQuantile" in p:
        q = float(p["keepQuantile"])
        if not 0.0 < q <= 1.0:
            raise ValueError(f"keepQuantile must be in (0, 1], got {q}")
        cut = scored.agg(F.percentile_approx(
            "bits_per_bigram", F.lit(q), F.lit(10000)).alias("_cut"))
        keep = (scored.crossJoin(F.broadcast(cut))
                .filter(F.col("bits_per_bigram") <= F.col("_cut"))
                .select(id_col))
    else:
        keep = (scored.filter(F.col("bits_per_bigram")
                              <= float(p["maxBits"]))
                .select(id_col))
    return df.join(keep, id_col, "left_semi")


def _decontaminate_transform(df: DataFrame, spark: SparkSession,
                             spec: JobSpec) -> DataFrame:
    """Declarative eval-set decontamination stage (operators/bloom.
    decontaminate): the held-out benchmark comes from
    ``extra_sources["eval"]``; mode='filter' (default) DROPS every
    document sharing a verbatim n-gram with it, mode='annotate' appends
    ``n_shared_ngrams`` (0 for clean docs). Parameters: idColumn
    ('doc_id'), textColumn ('text'), ngram (8), fpp (0.01),
    evalTextColumn / evalIdColumn (default to the corpus names),
    evalFilter (optional SQL predicate narrowing the eval source —
    e.g. a held-out split carved from a shared table)."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.bloom import decontaminate
    from etl_load_spark.sources.registry import read_source
    if "eval" not in spec.extra_sources:
        raise ValueError("DECONTAMINATE requires extraSources.eval "
                         "(the held-out benchmark to scrub against)")
    p = spec.transformation.parameters or {}
    id_col = p.get("idColumn", "doc_id")
    ev = read_source(spark, spec.extra_sources["eval"])
    if p.get("evalFilter"):
        ev = ev.filter(p["evalFilter"])
    ev = ev.select(
        F.col(p.get("evalIdColumn", id_col)).alias(id_col),
        F.col(p.get("evalTextColumn",
                    p.get("textColumn", "text"))).alias("text"))
    hits = decontaminate(
        df.select(F.col(id_col), F.col(p.get("textColumn", "text"))
                  .alias("text")),
        ev, id_col=id_col, text_col="text",
        n=int(p.get("ngram", 8)), fpp=float(p.get("fpp", 0.01)))
    if p.get("mode", "filter") == "annotate":
        return (df.join(hits.withColumnRenamed("train_doc_id", id_col),
                        id_col, "left")
                .withColumn("n_shared_ngrams",
                            F.coalesce("n_shared_ngrams", F.lit(0))))
    return df.join(hits.withColumnRenamed("train_doc_id", id_col),
                   id_col, "left_anti")


def _cluster_balance_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative cluster-balanced selection stage (operators/similarity
    anchor_assign + cluster_balanced_sample): assign rows to their
    nearest label anchor by cosine, thin every cluster toward the
    smallest. mode='filter' (default) keeps the sampled rows (original
    columns + ``cluster``); mode='annotate' returns ALL rows with their
    ``cluster`` — assignment only, no thinning. Parameters: idColumn
    ('vec_id'), vectorColumn ('embedding'), labelColumn ('label'),
    salt ('bal')."""
    from etl_load_spark.operators.similarity import (
        anchor_assign, cluster_balanced_sample, min_id_anchors)
    id_col = p.get("idColumn", "vec_id")
    vec_col = p.get("vectorColumn", "embedding")
    anchors = min_id_anchors(df, p.get("labelColumn", "label"),
                             id_col, vec_col)
    asg = anchor_assign(df, anchors, id_col, vec_col)
    if p.get("mode", "filter") == "annotate":
        return df.join(asg.select(id_col, "cluster"), id_col)
    kept = cluster_balanced_sample(asg, id_col, salt=p.get("salt", "bal"))
    return df.join(kept.select(id_col, "cluster"), id_col)


def _cross_source_dedup_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative cross-source priority dedup: keep one survivor per
    identical normalized content, preferring sources in
    parameters.priority order (required, best first), min id as
    tie-break. NULL-text rows drop (nothing to deduplicate). Row shape is
    preserved — survivors keep every column."""
    from etl_load_spark.operators.corpus import cross_source_dedup
    if not p.get("priority"):
        raise ValueError("CROSS_SOURCE_DEDUP requires parameters.priority "
                         "(preferred sources, best first)")
    id_col = p.get("idColumn", "doc_id")
    surv = cross_source_dedup(
        df, [str(s) for s in p["priority"]], id_col=id_col,
        text_col=p.get("textColumn", "text"),
        source_col=p.get("sourceColumn", "source"))
    return df.join(surv.select(id_col), id_col, "semi")


def _token_budget_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative token-budget mixture realization: keep documents that
    fit each source's TOKEN budget (parameters.budgets, required), taken
    in deterministic md5 order with the boundary document included.
    NULL-text and unbudgeted-source rows drop. Row shape is preserved."""
    from etl_load_spark.operators.corpus import token_budget_kept
    if not p.get("budgets"):
        raise ValueError("TOKEN_BUDGET requires parameters.budgets "
                         "(source -> token budget)")
    id_col = p.get("idColumn", "doc_id")
    kept = token_budget_kept(
        df, {str(k): int(v) for k, v in p["budgets"].items()},
        id_col=id_col, text_col=p.get("textColumn", "text"),
        source_col=p.get("sourceColumn", "source"),
        n_buckets=int(p.get("nBuckets", 4096)),
        salt=p.get("salt", "budget"))
    return df.join(kept.select(F.col("_id").alias(id_col)), id_col, "semi")


def _assign_shards_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative shard assignment: append a deterministic shard column
    (portable id-hash mod nShards) for the destination's partitionBy —
    a pure projection, so it is stream-safe and adds no shuffle."""
    from etl_load_spark.operators.corpus import shard_assign
    return shard_assign(df, n_shards=int(p.get("nShards", 64)),
                        id_col=p.get("idColumn", "doc_id"),
                        salt=p.get("salt", "shard"),
                        shard_col=p.get("shardColumn", "shard"))


def _sequence_pack_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative sequence packing (operators/corpus.sequence_pack):
    concat-and-chunk the corpus into fixed ``seqLen`` training windows
    in a deterministic pseudo-random order. mode='annotate' (default)
    appends the packing manifest columns (n_tokens, start_off,
    first_seq, last_seq, n_seqs) to every row; mode='manifest' returns
    the doc-level manifest alone — the table a sequence writer consumes.
    NULL-text/id rows get NULL manifest columns in annotate mode and
    are absent from manifest mode (no position in the packed stream).
    Parameters: seqLen (2048), idColumn ('doc_id'), textColumn
    ('text'), nBuckets (4096), salt ('pack')."""
    from etl_load_spark.operators.corpus import sequence_pack
    id_col = p.get("idColumn", "doc_id")
    man = sequence_pack(df, seq_len=int(p.get("seqLen", 2048)),
                        id_col=id_col,
                        text_col=p.get("textColumn", "text"),
                        n_buckets=int(p.get("nBuckets", 4096)),
                        salt=p.get("salt", "pack"))
    if p.get("mode", "annotate") == "manifest":
        return man
    return df.join(man, id_col, "left")


def _incremental_dedup_transform(df: DataFrame, spark: SparkSession,
                                 spec: JobSpec) -> DataFrame:
    """Declarative batch admission against the already-admitted corpus
    (operators/dedup.incremental_dedup): the admitted-content index
    comes from ``extraSources.history``; rows whose normalized content
    is already admitted — or appears in the batch under a smaller id —
    drop; survivors keep every column. ``historyBloom: true`` switches
    to the bloom-prefiltered anti-join (the oversized-history shape;
    answer identical). Parameters: idColumn ('doc_id'), textColumn
    ('text'), historyTextColumn (defaults to textColumn), historyBloom
    (false), bloomFpp (0.01)."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.dedup import incremental_dedup
    from etl_load_spark.sources.registry import read_source
    if "history" not in spec.extra_sources:
        raise ValueError("INCREMENTAL_DEDUP requires extraSources.history "
                         "(the already-admitted corpus or its content "
                         "index)")
    p = spec.transformation.parameters or {}
    id_col = p.get("idColumn", "doc_id")
    text_col = p.get("textColumn", "text")
    hist = read_source(spark, spec.extra_sources["history"]).select(
        F.col(p.get("historyTextColumn", text_col)).alias(text_col))
    surv = incremental_dedup(
        df, hist, id_col=id_col, text_col=text_col,
        history_bloom=bool(p.get("historyBloom", False)),
        bloom_fpp=float(p.get("bloomFpp", 0.01)))
    return df.join(surv.select(id_col), id_col, "semi")


def _importance_resample_transform(df: DataFrame, spark: SparkSession,
                                   spec: JobSpec) -> DataFrame:
    """Declarative DSIR-style targeted selection (operators/corpus.
    importance_weights): score documents by the quantized
    log-likelihood ratio of their hashed n-gram features under the
    ``extraSources.target`` distribution vs the raw corpus.
    mode='annotate' appends (n_feats, total_bits, bits_per_feat);
    mode='filter' (default) keeps the most target-like ``keepQuantile``
    fraction (required in filter mode — a self-relative cut, since
    quantized LLR scales with corpus/target overlap). Parameters:
    idColumn ('doc_id'), textColumn ('text'), nBuckets (1024),
    targetFilter (optional SQL predicate narrowing the target source),
    keepQuantile, mode."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.corpus import importance_weights
    from etl_load_spark.sources.registry import read_source
    if "target" not in spec.extra_sources:
        raise ValueError("IMPORTANCE_RESAMPLE requires extraSources.target "
                         "(the distribution to select toward)")
    p = spec.transformation.parameters or {}
    id_col = p.get("idColumn", "doc_id")
    text_col = p.get("textColumn", "text")
    tgt = read_source(spark, spec.extra_sources["target"])
    if p.get("targetFilter"):
        tgt = tgt.filter(p["targetFilter"])
    # loud config check: an empty target distribution would NULL the
    # smoothing constant (SUM over zero rows) and silently NULL-score
    # the whole corpus
    if tgt.filter(F.col(text_col).isNotNull()).limit(1).count() == 0:
        raise ValueError(
            "IMPORTANCE_RESAMPLE: extraSources.target has no non-NULL "
            f"{text_col!r} rows" + (f" after targetFilter "
                                    f"{p['targetFilter']!r}"
                                    if p.get("targetFilter") else ""))
    scored = importance_weights(df, tgt, id_col=id_col, text_col=text_col,
                                n_buckets=int(p.get("nBuckets", 1024)))
    if p.get("mode", "filter") == "annotate":
        return df.join(scored, id_col, "left")
    if "keepQuantile" not in p:
        raise ValueError("IMPORTANCE_RESAMPLE filter mode requires "
                         "keepQuantile (the most target-like fraction to "
                         "keep); use mode='annotate' to inspect scores")
    q = float(p["keepQuantile"])
    if not 0.0 < q <= 1.0:
        raise ValueError(f"keepQuantile must be in (0, 1], got {q}")
    cut = scored.agg(F.percentile_approx(
        "bits_per_feat", F.lit(1.0 - q), F.lit(10000)).alias("_cut"))
    keep = (scored.crossJoin(F.broadcast(cut))
            .filter(F.col("bits_per_feat") >= F.col("_cut"))
            .select(id_col))
    return df.join(keep, id_col, "left_semi")


def _quantize_embeddings_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative int8 scalar quantization (operators/similarity.
    quantize_kernel_udf): appends q_min, q_max, q_sum, codes — the
    per-vector calibration range plus the full SQ8 code vector. A PURE
    PROJECTION (one Arrow-batched kernel fused into the scan — no
    shuffle, no state), so it is STREAM-SAFE; dirty rows (NULL/empty
    array, NULL/NaN/±inf element) get all-NULL quantization columns
    rather than dropping (keep row shape; filter downstream if
    desired). Parameters: vectorColumn ('embedding')."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.similarity import quantize_kernel_udf
    vec = p.get("vectorColumn", "embedding")
    q = quantize_kernel_udf()(F.col(vec)).alias("_q")
    return (df.withColumn("_q", q)
            .withColumn("q_min", F.col("_q.q_min"))
            .withColumn("q_max", F.col("_q.q_max"))
            .withColumn("q_sum", F.col("_q.q_sum"))
            .withColumn("codes", F.col("_q.codes"))
            .drop("_q"))


def _stratified_sample_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative minority-class balancing (operators/corpus.
    stratified_sample): keep the first min-stratum-size rows of every
    stratum in deterministic md5 order. NULL stratum/id rows drop (no
    deterministic position). Row shape is preserved. Parameters:
    stratumColumn ('lang'), idColumn ('doc_id'), nBuckets (4096),
    salt ('strat')."""
    from etl_load_spark.operators.corpus import stratified_sample
    id_col = p.get("idColumn", "doc_id")
    kept = stratified_sample(df,
                             stratum_col=p.get("stratumColumn", "lang"),
                             id_col=id_col,
                             n_buckets=int(p.get("nBuckets", 4096)),
                             salt=p.get("salt", "strat"))
    return df.join(kept.select(id_col), id_col, "semi")


def _assign_split_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative leakage-safe split assignment (operators/corpus.
    grouped_split): append a deterministic train/valid/test split keyed
    on ``groupColumn`` (required — e.g. a registered-domain column, so
    same-site near-duplicates never straddle splits; pass the id column
    to get the q60 doc-level behavior). Parameters: groupColumn,
    splits ([[name, percent], ...] summing to 100; default 80/10/10),
    outputColumn ('split'), salt ('gsplit'). Pure projection —
    STREAM-SAFE, no shuffle."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.corpus import DEFAULT_SPLITS, grouped_split
    if not p.get("groupColumn"):
        raise ValueError("ASSIGN_SPLIT requires parameters.groupColumn "
                         "(the leakage-grouping key)")
    splits = (tuple((str(n), int(w)) for n, w in p["splits"])
              if p.get("splits") else DEFAULT_SPLITS)
    return df.withColumn(
        p.get("outputColumn", "split"),
        grouped_split(F.col(p["groupColumn"]), splits=splits,
                      salt=p.get("salt", "gsplit")))


def _markup_strip_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative markup hygiene (operators/text.strip_markup): append
    the cleaned text as ``outputColumn`` ('clean_text'; set it to
    textColumn to clean in place) and — when ``withStats`` (default
    true) — the boilerplate signals n_tags / n_links / link_chars.
    Pure map-side regex — STREAM-SAFE, no shuffle."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.text import markup_stats, strip_markup
    text_col = p.get("textColumn", "text")
    out = df
    if p.get("withStats", True):
        out = out.select("*", *markup_stats(F.col(text_col)))
    return out.withColumn(p.get("outputColumn", "clean_text"),
                          strip_markup(F.col(text_col)))


def _url_canonicalize_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative URL key hygiene (operators/text.canonicalize_url):
    append the canonical form of ``urlColumn`` (required — no corpus
    convention to default to) as ``outputColumn`` ('canonical_url'),
    plus the registered domain as ``domainColumn`` when set. Pure
    map-side regex/array expressions — STREAM-SAFE, no shuffle."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.text import (canonicalize_url,
                                               registered_domain)
    if not p.get("urlColumn"):
        raise ValueError("URL_CANONICALIZE requires parameters.urlColumn")
    url = F.col(p["urlColumn"])
    out = df.withColumn(p.get("outputColumn", "canonical_url"),
                        canonicalize_url(url))
    if p.get("domainColumn"):
        out = out.withColumn(p["domainColumn"],
                             registered_domain(url, from_url=True))
    return out


def _priority_sample_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative exact-SIZE weighted sampling (operators/corpus.
    priority_sample — the q169 A-Res scheme): keep exactly ``size``
    rows, weight-proportionally without replacement, deterministic
    (hash-uniform draws, no RNG). The SIZE-budget complement of
    MIXTURE_SAMPLE's rate and IMPORTANCE_RESAMPLE's quantile modes —
    the form a fixed token/example budget needs. Rows with NULL or
    non-positive weight are excluded. Row shape is preserved.
    Parameters: size (required), weightColumn (required),
    idColumn ('doc_id'), salt ('ares')."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.corpus import priority_sample
    missing = [k for k in ("size", "weightColumn") if not p.get(k)]
    if missing:
        raise ValueError(f"PRIORITY_SAMPLE parameters missing: {missing}")
    return priority_sample(df, int(p["size"]),
                           F.col(p["weightColumn"]),
                           id_col=p.get("idColumn", "doc_id"),
                           salt=p.get("salt", "ares")).drop("_priority")


def _quota_sample_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative balanced fine-tune set (operators/corpus.
    quota_stratified_sample — q170): EXACTLY min(quota, stratum size)
    rows per listed stratum, unlisted strata excluded; per-stratum
    A-Res weight-proportional selection when ``weightColumn`` is given,
    uniform-deterministic otherwise. Row shape is preserved.
    Parameters: quotas (required — {stratum: size} object),
    stratumColumn ('lang'), idColumn ('doc_id'),
    weightColumn (optional), nBuckets (4096), salt ('quota')."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.corpus import quota_stratified_sample
    if not p.get("quotas"):
        raise ValueError("QUOTA_SAMPLE requires parameters.quotas "
                         "({stratum: size})")
    id_col = p.get("idColumn", "doc_id")
    kept = quota_stratified_sample(
        df, {str(s): int(q) for s, q in p["quotas"].items()},
        stratum_col=p.get("stratumColumn", "lang"), id_col=id_col,
        weight=(F.col(p["weightColumn"]) if p.get("weightColumn")
                else None),
        n_buckets=int(p.get("nBuckets", 4096)),
        salt=p.get("salt", "quota"))
    return df.join(kept.select(id_col), id_col, "semi")


def _window_minhash_dedup_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative paragraph-granularity near-dedup stage
    (operators/dedup.window_minhash_pairs — q171): finds document pairs
    sharing at least one NEAR-duplicate sliding token window (edited
    boilerplate, lightly-reworded quoted passages — invisible to
    whole-document MinHash and to exact passage dedup) and drops the
    HIGHER id of every pair, the SEMANTIC_DEDUP survivorship rule. Row
    shape is preserved. ``minWindowPairs`` optionally requires that
    many matching window pairs before a pair counts (1 = any shared
    near-dup paragraph); ``maxBucketWindows`` is the documented
    hot-bucket approximation knob for corpus scale. The id column must
    be integral (the operator refuses strings up front). Parameters:
    idColumn ('doc_id'), textColumn ('text'), windowTokens (32),
    stride (16), n (3), threshold (0.5), minWindowPairs (1),
    maxBucketWindows (None)."""
    from pyspark.sql import functions as F

    from etl_load_spark.operators.dedup import window_minhash_pairs
    id_col = p.get("idColumn", "doc_id")
    mbw = p.get("maxBucketWindows")
    pairs = window_minhash_pairs(
        df, id_col, p.get("textColumn", "text"),
        window_tokens=int(p.get("windowTokens", 32)),
        stride=int(p.get("stride", 16)), n=int(p.get("n", 3)),
        threshold=float(p.get("threshold", 0.5)),
        max_bucket_windows=(int(mbw) if mbw is not None else None))
    if int(p.get("minWindowPairs", 1)) > 1:
        pairs = pairs.filter(
            F.col("n_window_pairs") >= int(p["minWindowPairs"]))
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def _gapfill_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative time-series gap fill (operators/timeseries.gapfill —
    q172): bucket-resample a (key, ts, value) feed onto the dense
    global bucket grid and emit the actual per-bucket average plus the
    LOCF and linear-interpolation fills with the Timescale edge
    contract (leading buckets NULL for both fills; trailing buckets
    carry LOCF only). Row shape CHANGES to
    (key, bucket_ts, val, locf_val, interp_val). Values must be
    non-negative (the exact fixed-point half-up arithmetic is unsigned;
    the operator documents the restriction). Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import gapfill
    return gapfill(df, key_col=p.get("keyColumn", "user_id"),
                   ts_col=p.get("tsColumn", "ts"),
                   value_col=p.get("valueColumn", "value"),
                   bucket=p.get("bucket", "1 day"))


def _counter_rate_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative counter increase/rate with reset detection
    (operators/timeseries.counter_rate — q173): per-series
    sample-to-sample deltas ordered by (tsColumn, orderColumn), a
    decrease = counter restart (the post-reset value is the step),
    rolled up per bucket to (key, bucket_ts, n_samples, n_resets,
    increase, rate_per_sec). Row shape CHANGES to the rollup. Values
    must be non-negative (counters are). Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    orderColumn ('event_id'), bucket ('1 day'), bucketSeconds (the
    rate denominator; defaults to the parsed bucket width, so it
    cannot silently drift from the bucket — set it only to rate
    against a different horizon), hotSplit (an interval string, e.g.
    '1 day': engages the parallel-prefix stitch for feeds where one
    series dwarfs the rest — identical results, the per-series sort
    parallelizes per time slice)."""
    from etl_load_spark.operators.timeseries import counter_rate
    bs = p.get("bucketSeconds")
    return counter_rate(df, key_col=p.get("keyColumn", "user_id"),
                        ts_col=p.get("tsColumn", "ts"),
                        value_col=p.get("valueColumn", "value"),
                        order_col=p.get("orderColumn", "event_id"),
                        bucket=p.get("bucket", "1 day"),
                        bucket_seconds=int(bs) if bs is not None else None,
                        hot_split=p.get("hotSplit"))


def _ohlc_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative OHLC / candlestick rollup (operators/timeseries.ohlc
    — q174): per (type, bucket) the open/high/low/close sample values
    and the sample count; open/close are deterministic via the
    raise-guarded padded (epoch_micros, orderColumn) key (non-negative
    timestamps and order ids only — a violating feed fails LOUDLY, it
    never mis-orders). Row shape CHANGES to (type, bucket_ts, open,
    high, low, close, n_events). One map-side-combinable hash
    aggregate: the shuffle is candle-sized, never sample-sized.
    Parameters: typeColumn ('event_type'), tsColumn ('ts'),
    valueColumn ('value'), orderColumn ('event_id'), bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import ohlc
    return ohlc(df, type_col=p.get("typeColumn", "event_type"),
                ts_col=p.get("tsColumn", "ts"),
                value_col=p.get("valueColumn", "value"),
                order_col=p.get("orderColumn", "event_id"),
                bucket=p.get("bucket", "1 day"))


def _time_weighted_avg_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative time-weighted average (operators/timeseries.
    time_weighted_avg — q175): each sample weighted by how long it HELD
    (the in-bucket LOCF integral), so burst sampling cannot bias the
    bucket mean the way a plain average can. Row shape CHANGES to
    (key, bucket_ts, n_samples, twa). By default the contract is
    self-contained per bucket; ``carryIn: true`` selects the
    Timescale interpolated_average contract (q176 — the previous
    bucket's value weights the bucket-start span). Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    orderColumn ('event_id'), bucket ('1 day'), carryIn (false),
    hotSplit (interval string; with carryIn, parallelizes a dominant
    series' cross-bucket carry per time slice — identical results)."""
    from etl_load_spark.operators.timeseries import time_weighted_avg
    return time_weighted_avg(df, key_col=p.get("keyColumn", "user_id"),
                             ts_col=p.get("tsColumn", "ts"),
                             value_col=p.get("valueColumn", "value"),
                             order_col=p.get("orderColumn", "event_id"),
                             bucket=p.get("bucket", "1 day"),
                             carry_in=bool(p.get("carryIn", False)),
                             hot_split=p.get("hotSplit"))


def _state_durations_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative time-in-state rollup (operators/timeseries.
    state_durations — q177): per (key, bucket, state) the
    integer-millisecond hold time (in-bucket LOCF), the entry count
    and the sample count. Row shape CHANGES to (key, bucket_ts,
    state, held_ms, n_entries, n_samples). Self-contained per bucket
    by default; ``carryIn: true`` selects the Timescale
    interpolated_duration_in contract (q180 — the previous recorded
    state holds from the bucket start to the first sample).
    Parameters: keyColumn ('user_id'), tsColumn ('ts'),
    stateColumn ('event_type'), orderColumn ('event_id'),
    bucket ('1 day'), carryIn (false), hotSplit (interval string;
    with carryIn, parallelizes a dominant series' cross-bucket carry
    per time slice — identical results)."""
    from etl_load_spark.operators.timeseries import state_durations
    return state_durations(df, key_col=p.get("keyColumn", "user_id"),
                           ts_col=p.get("tsColumn", "ts"),
                           state_col=p.get("stateColumn", "event_type"),
                           order_col=p.get("orderColumn", "event_id"),
                           bucket=p.get("bucket", "1 day"),
                           carry_in=bool(p.get("carryIn", False)),
                           hot_split=p.get("hotSplit"))


def _heartbeat_uptime_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative heartbeat/liveness rollup (operators/timeseries.
    heartbeat_uptime — q178): each row is a heartbeat keeping its
    series live for ``tolerance``; per (key, bucket) the beat count,
    the uptime (union of tolerance-clipped in-bucket live intervals,
    integer ms) and the mid-bucket outage count. Row shape CHANGES to
    (key, bucket_ts, n_beats, uptime_ms, n_gaps). Self-contained per
    bucket by default; ``carryIn: true`` selects the Timescale
    interpolated_uptime contract (q181 — the previous beat's tolerance
    window extends across the bucket boundary). Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), orderColumn ('event_id'),
    bucket ('1 day'), tolerance ('15 minutes'), carryIn (false),
    hotSplit (interval string; with carryIn, parallelizes a dominant
    series' cross-bucket carry per time slice — identical results),
    emitDowntime (false; appends downtime_ms = bucket width − uptime,
    the Timescale (interpolated_)downtime complement)."""
    from etl_load_spark.operators.timeseries import heartbeat_uptime
    return heartbeat_uptime(df, key_col=p.get("keyColumn", "user_id"),
                            ts_col=p.get("tsColumn", "ts"),
                            order_col=p.get("orderColumn", "event_id"),
                            bucket=p.get("bucket", "1 day"),
                            tolerance=p.get("tolerance", "15 minutes"),
                            carry_in=bool(p.get("carryIn", False)),
                            hot_split=p.get("hotSplit"),
                            emit_downtime=bool(p.get("emitDowntime",
                                                     False)))


def _trend_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative per-bucket least-squares trend (operators/
    timeseries.trend — q183): the OLS slope of value over time within
    each (key, bucket), in value units per second at 4 exact decimals
    (pure integer sums, sign-split half-up quotient); NULL when the
    bucket has zero time variance. Row shape CHANGES to (key,
    bucket_ts, n_samples, slope_per_sec). One map-side-combinable
    hash aggregate — the shuffle is trend-sized. Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import trend
    return trend(df, key_col=p.get("keyColumn", "user_id"),
                 ts_col=p.get("tsColumn", "ts"),
                 value_col=p.get("valueColumn", "value"),
                 bucket=p.get("bucket", "1 day"))


def _instant_rate_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative instant rate (operators/timeseries.instant_rate —
    q184, Prometheus irate): per (key, bucket) the rate between the
    bucket's LAST TWO samples in value/second at 4 exact decimals,
    Prometheus reset rule on the final step; NULL under two samples or
    a zero time delta. Row shape CHANGES to (key, bucket_ts,
    n_samples, irate_per_sec). One exchange — lag window and max_by
    rollup share (key, bucket). Parameters: keyColumn ('user_id'),
    tsColumn ('ts'), valueColumn ('value'), orderColumn ('event_id'),
    bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import instant_rate
    return instant_rate(df, key_col=p.get("keyColumn", "user_id"),
                        ts_col=p.get("tsColumn", "ts"),
                        value_col=p.get("valueColumn", "value"),
                        order_col=p.get("orderColumn", "event_id"),
                        bucket=p.get("bucket", "1 day"))


def _value_histogram_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative per-bucket value histogram (operators/timeseries.
    value_histogram — q185, Timescale histogram()): nbins equal
    cent-exact bins over [lo, hi) plus underflow bin 0 and overflow
    bin nbins+1, one row per non-empty (key, bucket, bin) with its
    count. Row shape CHANGES to (key, bucket_ts, bin, n_samples). One
    map-side-combinable hash aggregate — the shuffle is
    histogram-sized. Parameters: keyColumn ('user_id'), tsColumn
    ('ts'), valueColumn ('value'), bucket ('1 day'), lo (0.0),
    hi (100.0), nbins (10)."""
    from etl_load_spark.operators.timeseries import value_histogram
    return value_histogram(df, key_col=p.get("keyColumn", "user_id"),
                           ts_col=p.get("tsColumn", "ts"),
                           value_col=p.get("valueColumn", "value"),
                           bucket=p.get("bucket", "1 day"),
                           lo=float(p.get("lo", 0.0)),
                           hi=float(p.get("hi", 100.0)),
                           nbins=int(p.get("nbins", 10)))


def _delta_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative per-bucket gauge delta (operators/timeseries.delta —
    q186, Timescale delta()): last value − first value over the padded
    (epoch_micros, order) key, exact integer cents. Row shape CHANGES
    to (key, bucket_ts, n_samples, delta). One map-side-combinable
    min_by/max_by aggregate. Parameters: keyColumn ('user_id'),
    tsColumn ('ts'), valueColumn ('value'), orderColumn ('event_id'),
    bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import delta
    return delta(df, key_col=p.get("keyColumn", "user_id"),
                 ts_col=p.get("tsColumn", "ts"),
                 value_col=p.get("valueColumn", "value"),
                 order_col=p.get("orderColumn", "event_id"),
                 bucket=p.get("bucket", "1 day"))


def _value_stats_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative per-bucket exact mean/variance (operators/
    timeseries.value_stats — q187, Timescale stats_agg): 4-decimal
    fixed-point mean (sign-split half-up) and sample variance
    S/(n(n−1)) from three integer sums; variance NULL under two
    samples. Row shape CHANGES to (key, bucket_ts, n_samples, mean,
    variance). One map-side-combinable aggregate. Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import value_stats
    return value_stats(df, key_col=p.get("keyColumn", "user_id"),
                       ts_col=p.get("tsColumn", "ts"),
                       value_col=p.get("valueColumn", "value"),
                       bucket=p.get("bucket", "1 day"))


def _changes_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative per-bucket change count (operators/timeseries.
    changes — q188, Prometheus changes()): consecutive differing cents
    over the (ts, order) total order; the bucket's first sample is a
    baseline. Row shape CHANGES to (key, bucket_ts, n_samples,
    n_changes). The in-bucket lag window and the rollup share one
    (key, bucket_ts) exchange. Parameters: keyColumn ('user_id'),
    tsColumn ('ts'), valueColumn ('value'), orderColumn ('event_id'),
    bucket ('1 day')."""
    from etl_load_spark.operators.timeseries import changes
    return changes(df, key_col=p.get("keyColumn", "user_id"),
                   ts_col=p.get("tsColumn", "ts"),
                   value_col=p.get("valueColumn", "value"),
                   order_col=p.get("orderColumn", "event_id"),
                   bucket=p.get("bucket", "1 day"))


def _value_topk_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative per-bucket top-k frequent values (operators/
    timeseries.value_topk — q189, ClickHouse topK exact form): one row
    per (key, bucket, rank ≤ k) with the value and its count,
    deterministic (count DESC, value ASC) order. Row shape CHANGES to
    (key, bucket_ts, rank, value, n_occurrences). Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    bucket ('1 day'), k (3)."""
    from etl_load_spark.operators.timeseries import value_topk
    return value_topk(df, key_col=p.get("keyColumn", "user_id"),
                      ts_col=p.get("tsColumn", "ts"),
                      value_col=p.get("valueColumn", "value"),
                      bucket=p.get("bucket", "1 day"),
                      k=int(p.get("k", 3)))


def _lttb_transform(df: DataFrame, p: dict) -> DataFrame:
    """Declarative LTTB visual downsampling (operators/timeseries.lttb
    — q179): per series keep exactly ``resolution`` points (first,
    last, and per equal-count bucket the largest-triangle point vs the
    previous selection and the next bucket's centroid); series with
    ≤ resolution points pass through. Row shape: a subset of
    (key, ts, order, value). The selection is sequential per series —
    a grouped Arrow kernel (the one Pandas-backed stage in the
    hypertable family; the task memory bound is one series' points,
    pre-slice upstream for unbounded series — maxPointsPerSeries
    turns that contract into a loud in-kernel guard). Parameters:
    keyColumn ('user_id'), tsColumn ('ts'), valueColumn ('value'),
    orderColumn ('event_id'), resolution (12),
    maxPointsPerSeries (int, optional)."""
    from etl_load_spark.operators.timeseries import lttb
    mps = p.get("maxPointsPerSeries")
    return lttb(df, key_col=p.get("keyColumn", "user_id"),
                ts_col=p.get("tsColumn", "ts"),
                value_col=p.get("valueColumn", "value"),
                order_col=p.get("orderColumn", "event_id"),
                resolution=int(p.get("resolution", 12)),
                max_points_per_series=None if mps is None else int(mps))


def _hard_negatives_transform(df: DataFrame, spark: SparkSession,
                              spec: JobSpec) -> DataFrame:
    """Declarative hard-negative mining (operators/similarity.
    hard_negatives — q156): for each anchor, the k most-similar
    corpus vectors with a DIFFERENT label, plus the best same-label
    similarity and margin. The incoming (mapped) rows are the corpus;
    anchors come from ``extraSources.anchors`` or, if absent, from
    ``parameters.anchorPredicate`` applied to the corpus itself (one of
    the two is required). Output shape is the mining result
    (q_id, n_id, cosine_sim, pos_sim, margin, rank). Parameters:
    k (5), idColumn ('vec_id'), vectorColumn ('embedding'),
    labelColumn ('label'), anchorPredicate, dupCeiling (0.999)."""
    from etl_load_spark.operators.similarity import hard_negatives
    from etl_load_spark.sources.registry import read_source

    p = spec.transformation.parameters or {}
    if "anchors" in spec.extra_sources:
        anchors = read_source(spark, spec.extra_sources["anchors"])
        if p.get("anchorPredicate"):
            anchors = anchors.filter(p["anchorPredicate"])
    elif p.get("anchorPredicate"):
        anchors = df.filter(p["anchorPredicate"])
    else:
        raise ValueError(
            "HARD_NEGATIVES requires extraSources.anchors (the training-"
            "batch slice to mine for) or parameters.anchorPredicate "
            "(a predicate selecting anchors from the corpus)")
    return hard_negatives(df, anchors, k=int(p.get("k", 5)),
                          id_col=p.get("idColumn", "vec_id"),
                          vec_col=p.get("vectorColumn", "embedding"),
                          label_col=p.get("labelColumn", "label"),
                          dup_ceiling=float(p.get("dupCeiling", 0.999)))


def _asof_join_transform(df: DataFrame, spark: SparkSession,
                         spec: JobSpec) -> DataFrame:
    """Declarative backward as-of join (operators/asof_join — q51):
    attach to each row the most recent ``extraSources.<rightSource>``
    row at or before its timestamp, per key. Parameters: rightSource
    ('right' — an extraSources key), on (key column list,
    ['user_id']), leftTsColumn ('ts'), rightTsColumn (defaults to
    leftTsColumn), tolerance (optional day-time interval string,
    validated against the strict grammar — the injection-surface
    rule), how ('left' | 'inner'). Right payload columns must not
    collide with left columns (pre-alias in the right source's
    query/table). 100 TB: the operator unions the two sides and runs
    ONE window over (key, ts) — a single shuffle, no join operator,
    no candidate blow-up on hot keys (asof_join module docstring)."""
    from etl_load_spark.operators.asof_join import asof_join
    from etl_load_spark.sources.registry import read_source
    p = spec.transformation.parameters or {}
    src_key = p.get("rightSource", "right")
    if src_key not in spec.extra_sources:
        raise ValueError(
            f"ASOF_JOIN requires extraSources.{src_key!r} (the right "
            "side to attach); set parameters.rightSource to pick a "
            "different extraSources key")
    right = read_source(spark, spec.extra_sources[src_key])
    tol = None
    if p.get("tolerance"):
        from etl_load_spark.operators.timeseries import validate_bucket
        validate_bucket(p["tolerance"])
        tol = F.expr(f"INTERVAL {p['tolerance']}")
    return asof_join(df, right, on=p.get("on", ["user_id"]),
                     left_ts=p.get("leftTsColumn", "ts"),
                     right_ts=p.get("rightTsColumn"),
                     tolerance=tol, how=p.get("how", "left"))


_CORPUS_TRANSFORMS = {
    "PASSAGE_DEDUP": _passage_dedup_transform,
    "QUALITY_FILTER": _quality_filter_transform,
    "MIXTURE_SAMPLE": _mixture_sample_transform,
    "QUALITY_CLASSIFIER": _quality_classifier_transform,
    "SEMANTIC_DEDUP": _semantic_dedup_transform,
    "CLUSTER_BALANCE": _cluster_balance_transform,
    "CHUNK_DOCUMENTS": _chunk_documents_transform,
    "LM_SURPRISAL": _lm_surprisal_transform,
    "CROSS_SOURCE_DEDUP": _cross_source_dedup_transform,
    "TOKEN_BUDGET": _token_budget_transform,
    "ASSIGN_SHARDS": _assign_shards_transform,
    "SEQUENCE_PACK": _sequence_pack_transform,
    "QUANTIZE_EMBEDDINGS": _quantize_embeddings_transform,
    "STRATIFIED_SAMPLE": _stratified_sample_transform,
    "URL_CANONICALIZE": _url_canonicalize_transform,
    "MARKUP_STRIP": _markup_strip_transform,
    "ASSIGN_SPLIT": _assign_split_transform,
    "PRIORITY_SAMPLE": _priority_sample_transform,
    "QUOTA_SAMPLE": _quota_sample_transform,
    "WINDOW_MINHASH_DEDUP": _window_minhash_dedup_transform,
    "GAPFILL": _gapfill_transform,
    "COUNTER_RATE": _counter_rate_transform,
    "OHLC": _ohlc_transform,
    "TIME_WEIGHTED_AVG": _time_weighted_avg_transform,
    "STATE_DURATIONS": _state_durations_transform,
    "HEARTBEAT_UPTIME": _heartbeat_uptime_transform,
    "LTTB": _lttb_transform,
    "TREND": _trend_transform,
    "INSTANT_RATE": _instant_rate_transform,
    "VALUE_HISTOGRAM": _value_histogram_transform,
    "DELTA": _delta_transform,
    "VALUE_STATS": _value_stats_transform,
    "CHANGES": _changes_transform,
    "VALUE_TOPK": _value_topk_transform,
}


def _streaming_ohlc_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_ohlc
    return streaming_ohlc(df, type_col=p.get("typeColumn", "event_type"),
                          ts_col=p.get("tsColumn", "ts"),
                          value_col=p.get("valueColumn", "value"),
                          order_col=p.get("orderColumn", "event_id"),
                          bucket=p.get("bucket", "1 day"),
                          watermark=p.get("watermark", "30 minutes"))


def _streaming_trend_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_trend
    return streaming_trend(df, key_col=p.get("keyColumn", "user_id"),
                           ts_col=p.get("tsColumn", "ts"),
                           value_col=p.get("valueColumn", "value"),
                           bucket=p.get("bucket", "1 day"),
                           watermark=p.get("watermark", "30 minutes"))


def _streaming_value_histogram_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import (
        streaming_value_histogram,
    )
    return streaming_value_histogram(
        df, key_col=p.get("keyColumn", "user_id"),
        ts_col=p.get("tsColumn", "ts"),
        value_col=p.get("valueColumn", "value"),
        bucket=p.get("bucket", "1 day"), lo=float(p.get("lo", 0.0)),
        hi=float(p.get("hi", 100.0)), nbins=int(p.get("nbins", 10)),
        watermark=p.get("watermark", "30 minutes"))


def _streaming_state_durations_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_state_durations
    if p.get("carryIn"):
        raise ValueError(
            "STATE_DURATIONS carryIn=true is batch-only on a stream: the "
            "carried state is the previous bucket's last sample, which "
            "the watermark has already evicted when the next bucket "
            "opens — land the self-contained rollup incrementally, then "
            "interpolate carries downstream (the batch operator's "
            "carry_in=True over the landed table)")
    if p.get("hotSplit"):
        raise ValueError(
            "STATE_DURATIONS hotSplit only applies to the batch carry "
            "form (there is no per-key window to split on a stream — "
            "the streaming twin is already per-bucket-parallel)")
    return streaming_state_durations(
        df, key_col=p.get("keyColumn", "user_id"),
        ts_col=p.get("tsColumn", "ts"),
        state_col=p.get("stateColumn", "event_type"),
        order_col=p.get("orderColumn", "event_id"),
        bucket=p.get("bucket", "1 day"),
        watermark=p.get("watermark", "30 minutes"))


def _streaming_heartbeat_uptime_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_heartbeat_uptime
    if p.get("carryIn"):
        raise ValueError(
            "HEARTBEAT_UPTIME carryIn=true is batch-only on a stream: "
            "the carried beat is the previous bucket's last sample, "
            "which the watermark has already evicted when the next "
            "bucket opens — land the self-contained rollup "
            "incrementally, then interpolate carries downstream (the "
            "batch operator's carry_in=True over the landed table)")
    if p.get("hotSplit"):
        raise ValueError(
            "HEARTBEAT_UPTIME hotSplit only applies to the batch carry "
            "form (there is no per-key window to split on a stream — "
            "the streaming twin is already per-bucket-parallel)")
    return streaming_heartbeat_uptime(
        df, key_col=p.get("keyColumn", "user_id"),
        ts_col=p.get("tsColumn", "ts"),
        order_col=p.get("orderColumn", "event_id"),
        bucket=p.get("bucket", "1 day"),
        tolerance=p.get("tolerance", "15 minutes"),
        emit_downtime=bool(p.get("emitDowntime", False)),
        watermark=p.get("watermark", "30 minutes"))


#: rollup stages with a STREAMING form (streaming/windows.py twins).
#: OHLC/TREND/VALUE_HISTOGRAM are the identical pure aggregation with a
#: watermark (round 11); STATE_DURATIONS/HEARTBEAT_UPTIME (round 12,
#: non-carry only) run as ONE watermarked collect_list aggregation plus
#: a stateless per-bucket fold — the batch lead/lag replayed inside the
#: sorted sample array. On a streaming job these dispatch INSTEAD of
#: the batch transform — same parameters plus `watermark`
#: ('30 minutes'); the batch output sort is dropped (streams cannot
#: sort), and a file destination materializes via the update-mode
#: continuous-aggregate upsert (sources/writers.write_stream_sink).
def _streaming_instant_rate_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_instant_rate
    return streaming_instant_rate(
        df, key_col=p.get("keyColumn", "user_id"),
        ts_col=p.get("tsColumn", "ts"),
        value_col=p.get("valueColumn", "value"),
        order_col=p.get("orderColumn", "event_id"),
        bucket=p.get("bucket", "1 day"),
        watermark=p.get("watermark", "30 minutes"))


def _streaming_twa_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import (
        streaming_time_weighted_avg,
    )
    if p.get("carryIn"):
        raise ValueError(
            "TIME_WEIGHTED_AVG carryIn=true is batch-only on a stream: "
            "the carried sample is the previous bucket's last row, "
            "which the watermark has already evicted when the next "
            "bucket opens — land the self-contained rollup "
            "incrementally, then interpolate carries downstream (the "
            "batch operator's carry_in=True over the landed table)")
    if p.get("hotSplit"):
        raise ValueError(
            "TIME_WEIGHTED_AVG hotSplit only applies to the batch carry "
            "form (there is no per-key window to split on a stream — "
            "the streaming twin is already per-bucket-parallel)")
    return streaming_time_weighted_avg(
        df, key_col=p.get("keyColumn", "user_id"),
        ts_col=p.get("tsColumn", "ts"),
        value_col=p.get("valueColumn", "value"),
        order_col=p.get("orderColumn", "event_id"),
        bucket=p.get("bucket", "1 day"),
        watermark=p.get("watermark", "30 minutes"))


def _streaming_delta_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_delta
    return streaming_delta(df, key_col=p.get("keyColumn", "user_id"),
                           ts_col=p.get("tsColumn", "ts"),
                           value_col=p.get("valueColumn", "value"),
                           order_col=p.get("orderColumn", "event_id"),
                           bucket=p.get("bucket", "1 day"),
                           watermark=p.get("watermark", "30 minutes"))


def _streaming_value_stats_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_value_stats
    return streaming_value_stats(
        df, key_col=p.get("keyColumn", "user_id"),
        ts_col=p.get("tsColumn", "ts"),
        value_col=p.get("valueColumn", "value"),
        bucket=p.get("bucket", "1 day"),
        watermark=p.get("watermark", "30 minutes"))


def _streaming_changes_twin(df: DataFrame, p: dict) -> DataFrame:
    from etl_load_spark.streaming.windows import streaming_changes
    return streaming_changes(df, key_col=p.get("keyColumn", "user_id"),
                             ts_col=p.get("tsColumn", "ts"),
                             value_col=p.get("valueColumn", "value"),
                             order_col=p.get("orderColumn", "event_id"),
                             bucket=p.get("bucket", "1 day"),
                             watermark=p.get("watermark", "30 minutes"))


_STREAMING_TWINS = {
    "OHLC": _streaming_ohlc_twin,
    "TREND": _streaming_trend_twin,
    "VALUE_HISTOGRAM": _streaming_value_histogram_twin,
    "STATE_DURATIONS": _streaming_state_durations_twin,
    "HEARTBEAT_UPTIME": _streaming_heartbeat_uptime_twin,
    "DELTA": _streaming_delta_twin,
    "VALUE_STATS": _streaming_value_stats_twin,
    "CHANGES": _streaming_changes_twin,
    "INSTANT_RATE": _streaming_instant_rate_twin,
    "TIME_WEIGHTED_AVG": _streaming_twa_twin,
}


def streaming_merge_keys(spec) -> list[str] | None:
    """The FULL group key of a streaming rollup stage's output — what the
    update-mode continuous-aggregate upsert merges micro-batches on
    (sources/writers.rollup_upsert_writer). Update mode emits only the
    groups changed per batch, so the sink must know the key to avoid
    deleting sibling groups in a touched bucket partition. Returns None
    for non-rollup specs (a raw update-mode SQL aggregate declares
    destination.details.merge_keys itself)."""
    tr = getattr(spec, "transformation", None)
    if tr is None or not tr.type:
        return None
    t = tr.type.upper()
    p = tr.parameters or {}
    if t == "OHLC":
        return [p.get("typeColumn", "event_type"), "bucket_ts"]
    if t == "TREND":
        return [p.get("keyColumn", "user_id"), "bucket_ts"]
    if t == "VALUE_HISTOGRAM":
        return [p.get("keyColumn", "user_id"), "bucket_ts", "bin"]
    if t == "STATE_DURATIONS":
        return [p.get("keyColumn", "user_id"), "bucket_ts",
                p.get("stateColumn", "event_type")]
    if t in ("HEARTBEAT_UPTIME", "DELTA", "VALUE_STATS", "CHANGES",
             "INSTANT_RATE", "TIME_WEIGHTED_AVG"):
        return [p.get("keyColumn", "user_id"), "bucket_ts"]
    return None

#: stages whose plan needs multiple stateful stages — impossible as ONE
#: streaming query; each error names the streaming-native alternative
_BATCH_ONLY_TRANSFORMS = {
    "PASSAGE_DEDUP": ("streaming.windows.stream_block_dedup (checkpointed "
                      "first-occurrence block filter) and reassemble "
                      "documents in a downstream batch job"),
    "QUALITY_CLASSIFIER": ("score incrementally with a watermarked "
                           "aggregation, or run the classifier as a "
                           "downstream batch job over the landed stream"),
    "SEMANTIC_DEDUP": ("dedup each landed increment in a downstream batch "
                       "job (k-means blocking needs a corpus snapshot)"),
    "CLUSTER_BALANCE": ("anchor fitting and cluster counts need a corpus "
                        "snapshot; fit anchors offline, then apply "
                        "anchor_assign (a map-side projection) in the "
                        "stream and balance in a downstream batch job"),
    "LM_SURPRISAL": ("the bigram count table needs a corpus snapshot; "
                     "train offline with operators/text.bigram_model, "
                     "then score with score_with_bigram_model inside "
                     "foreachBatch (a stream-safe stream-static join "
                     "feeding a per-micro-batch reduction)"),
    "CROSS_SOURCE_DEDUP": ("survivor choice needs the whole content "
                           "group; dedup each landed increment in a "
                           "downstream batch job, or use "
                           "streaming.windows.stream_block_dedup for "
                           "checkpointed first-seen-wins without source "
                           "preference"),
    "TOKEN_BUDGET": ("the running token total is corpus-global; land the "
                     "stream, then realize the budget in a downstream "
                     "batch job (ASSIGN_SHARDS is the stream-safe layout "
                     "stage)"),
    "SEQUENCE_PACK": ("the packed stream's offsets are a corpus-global "
                      "prefix sum; land the stream, then pack in a "
                      "downstream batch job (ASSIGN_SHARDS is the "
                      "stream-safe layout stage)"),
    "STRATIFIED_SAMPLE": ("the minority-stratum size is corpus-global; "
                          "land the stream, then balance in a downstream "
                          "batch job (MIXTURE_SAMPLE is the stream-safe "
                          "fixed-rate alternative)"),
    "PRIORITY_SAMPLE": ("the exact-size cut is a corpus-global top-k; "
                        "land the stream, then sample the landed batch "
                        "downstream (MIXTURE_SAMPLE is the stream-safe "
                        "fixed-rate alternative)"),
    "QUOTA_SAMPLE": ("per-stratum exact sizes are corpus-global top-k "
                     "cuts; land the stream, then sample the landed "
                     "batch downstream (MIXTURE_SAMPLE is the "
                     "stream-safe fixed-rate alternative)"),
    "WINDOW_MINHASH_DEDUP": ("the banded LSH self-join and exact verify "
                             "need a corpus snapshot; land the stream, "
                             "then dedup each landed batch downstream "
                             "(streaming.windows.stream_content_dedup is "
                             "the stream-safe exact-content alternative)"),
    "GAPFILL": ("the dense grid bounds and the LOCF/interpolation "
                "windows are feed-global; run the streaming rollup "
                "(streaming.windows.time_bucket_rollup) to land bucket "
                "aggregates incrementally, then gap-fill the landed "
                "table downstream"),
    "COUNTER_RATE": ("sample-to-sample lag needs each series' full "
                     "ordered history; keep the last sample per series "
                     "in keyed state (streaming.stateful, "
                     "applyInPandasWithState) to emit deltas "
                     "incrementally, or land the stream and roll up "
                     "each landed batch downstream"),
    "LTTB": ("the largest-triangle selection is sequential over each "
             "series' complete point set; land the stream, then "
             "downsample each landed slice downstream (the per-bucket "
             "rollups — OHLC, TIME_WEIGHTED_AVG — are the incremental "
             "alternatives)"),
    "VALUE_TOPK": ("the frequency ranking is two chained aggregations "
                   "(per-value counts, then the rank cut) — not ONE "
                   "streaming query; land the stream, then rank each "
                   "landed batch downstream (VALUE_HISTOGRAM is the "
                   "stream-safe distribution rollup)"),
}
