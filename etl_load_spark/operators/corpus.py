"""Corpus-curation operators a training-data pipeline needs at 100 TB:
passage-level dedup (the Dolma/CCNet paragraph-dedup pattern), rule-based
quality filtering (Gopher-style), and deterministic weighted source mixing.

The reference has no corpus ops (it moves rows between RDBMS/CSV endpoints,
ETLCoreMappingProcessor.java:1-241); these are north-star extensions in the
same declarative style: every rule/threshold is data, every computation is a
Catalyst expression (no Python in the hot path), and every operator has an
exact SQL twin so the DuckDB oracle replays the full algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


# ---------------------------------------------------------------------------
# Passage-level dedup (paragraph dedup for separator-less corpora)
# ---------------------------------------------------------------------------

def doc_blocks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", block_tokens: int = 16) -> DataFrame:
    """Decompose documents into fixed token-window blocks:
    (id, _bno, _btext, _bhash). Pure JVM expressions (posexplode +
    slice + array_join) — the fan-out is plan-visible and works
    identically on batch and streaming DataFrames; shared by
    ``passage_dedup`` and the streaming first-occurrence filter."""
    toks = F.split(F.col(text_col), " ")
    n_blocks = F.greatest(F.ceil(F.size(toks) / F.lit(block_tokens))
                          .cast("int"), F.lit(1))
    return (df.select(F.col(id_col), toks.alias("_toks"),
                      F.posexplode(F.sequence(F.lit(0), n_blocks - 1))
                      .alias("_bno", "_i"))
            .select(id_col, "_bno",
                    F.array_join(
                        F.slice("_toks",
                                F.col("_bno") * block_tokens + 1,
                                block_tokens), " ").alias("_btext"))
            .withColumn("_bhash", F.xxhash64("_btext")))


def passage_dedup(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  block_tokens: int = 16) -> DataFrame:
    """Remove duplicated passages ACROSS the corpus, keeping each passage's
    first occurrence (document order, then position) — the paragraph-dedup
    stage of a pretraining pipeline, expressed over fixed ``block_tokens``
    token windows because the synthetic corpus has no paragraph separators
    (swap the tokenizer for a split on ``\\n\\n`` when the data has one).

    Returns (id, text_deduped, n_blocks, n_kept) — documents whose every
    passage was seen earlier come back with an empty string, mirroring how
    paragraph dedup can empty a page.

    100 TB shape: two shuffles. (1) first-occurrence resolution is a
    min-struct aggregate over (block_hash, block_text) — map-side partial
    combine collapses repeats before the wire, and the 8-byte hash leads
    the shuffle key so equality checks short-circuit; grouping on the text
    too keeps the operator EXACT under hash collision (a certainty at
    100 TB block counts), unlike hash-only Bloom dedup. The probe join
    back is an equi-join on the same keys, so AQE plans both sides off one
    Exchange profile — never a window sort over the corpus. (2) reassembly
    groups by document id, carrying each surviving block once.
    """
    blocks = (doc_blocks(df, id_col, text_col, block_tokens)
              # one Exchange feeds both the first-occurrence aggregate and
              # the probe side (ReusedExchange): the tokenize+block subplan
              # runs once, not once per branch. The explicit not-null
              # filters mirror the join's inferred ones so both branches
              # stay byte-identical (reuse requires identical subplans).
              .filter(F.col(id_col).isNotNull() & F.col("_btext").isNotNull())
              .repartition("_bhash", "_btext"))
    first = (blocks.groupBy("_bhash", "_btext")
             .agg(F.min(F.struct(id_col, "_bno")).alias("_first")))
    kept = (blocks.join(first, ["_bhash", "_btext"])
            .filter((F.col(f"_first.{id_col}") == F.col(id_col))
                    & (F.col("_first._bno") == F.col("_bno"))))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("_bno", "_btext"))),
                            lambda s: s["_btext"]), " ")
                    .alias("text_deduped"),
                    F.count(F.lit(1)).cast("bigint").alias("n_kept")))
    n_blocks = F.greatest(
        F.ceil(F.size(F.split(F.col(text_col), " ")) / F.lit(block_tokens))
        .cast("int"), F.lit(1))
    totals = df.select(F.col(id_col), n_blocks.cast("bigint")
                       .alias("n_blocks"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
                    "n_blocks",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept")))


def passage_dedup_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", block_tokens: int = 16,
                      dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``passage_dedup`` (xxhash64 is Spark-only, but the
    hash only BUCKETS identical strings — the oracle dedups on the block
    text itself, which is the same equivalence relation)."""
    bt = block_tokens
    return f"""
WITH d AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {table}),
nb AS (
  SELECT {id_col}, toks,
         greatest(CAST(ceil(len(toks) / {bt}.0) AS BIGINT), 1) AS n_blocks
  FROM d),
b AS (
  SELECT {id_col}, n_blocks,
         CAST(unnest(range(n_blocks)) AS INT) AS bno, toks
  FROM nb),
bt AS (
  SELECT {id_col}, n_blocks, bno,
         array_to_string(list_slice(toks, bno * {bt} + 1,
                                    (bno + 1) * {bt}), ' ') AS btext
  FROM b),
k AS (
  -- NULL-id / NULL-btext blocks are excluded BEFORE first-occurrence
  -- resolution, matching the Spark side's filters (a NULL-id block must
  -- not claim rn=1 of a btext it shares with a real doc, and a NULL
  -- btext must not count toward n_kept on real data)
  SELECT {id_col}, n_blocks, bno, btext,
         row_number() OVER (PARTITION BY btext
                            ORDER BY {id_col}, bno) AS rn
  FROM bt
  WHERE {id_col} IS NOT NULL AND btext IS NOT NULL),
agg AS (
  SELECT {id_col},
         string_agg(CASE WHEN rn = 1 THEN btext END, ' '
                    ORDER BY bno) AS text_deduped,
         CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept
  FROM k GROUP BY {id_col})
-- totals-side LEFT JOIN mirrors the Spark operator: every input doc stays
-- in the output (NULL-id / NULL-text docs get '', 0) — the filters above
-- only govern dedup resolution, not output membership
SELECT nb.{id_col},
       coalesce(agg.text_deduped, '') AS text_deduped,
       nb.n_blocks,
       coalesce(agg.n_kept, 0) AS n_kept
FROM nb LEFT JOIN agg ON nb.{id_col} = agg.{id_col}
ORDER BY nb.{id_col}
"""


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------

#: (rule name, threshold description) — the rule set is DATA: each entry
#: becomes one boolean column and one conjunct of ``keep``.
QUALITY_RULE_NAMES = ("r_word_count", "r_mean_word_len", "r_stopwords",
                     "r_distinct_ratio")


def quality_rules(col: Column, min_words: int = 30, max_words: int = 100_000,
                  min_mean_len: float = 2.0, max_mean_len: float = 12.0,
                  min_stopwords: int = 1,
                  min_distinct_ratio: float = 0.1) -> list[Column]:
    """Gopher-style repetition/shape filters as pure Catalyst expressions
    (Rae et al. 2021 §A1.1 thresholds, adapted): word-count bounds, mean
    word length bounds, a minimum stopword count, and a minimum
    distinct-token ratio (mass repetition ⇒ ratio → 0). Returns the rule
    columns in ``QUALITY_RULE_NAMES`` order; ``keep`` is their AND.

    All four are per-row projections — at 100 TB this stage is map-side
    only: no shuffle, no UDF, pushed straight onto the scan.

    Every statistic is computed over the SAME normalized tokenization
    (dedup.normalize_text, the corpus-wide canonical form): mixing raw
    and normalized denominators would let case/punctuation variants of
    one word defeat the repetition filter and punctuation inflate the
    mean word length."""
    from etl_load_spark.operators.dedup import normalize_text
    from etl_load_spark.operators.text import stopword_count, token_count
    n = token_count(col)
    norm = normalize_text(col)
    # mean word length from total non-space chars: one pass, no HOF fold
    chars = F.length(F.regexp_replace(norm, " ", ""))
    mean_len = chars / n
    distinct_ratio = F.size(F.array_distinct(F.split(norm, " "))) / n
    return [
        n.between(min_words, max_words).alias("r_word_count"),
        mean_len.between(min_mean_len, max_mean_len).alias("r_mean_word_len"),
        (stopword_count(col) >= min_stopwords).alias("r_stopwords"),
        (distinct_ratio >= min_distinct_ratio).alias("r_distinct_ratio"),
    ]


def quality_rules_sql(col: str, min_words: int = 30,
                      max_words: int = 100_000, min_mean_len: float = 2.0,
                      max_mean_len: float = 12.0, min_stopwords: int = 1,
                      min_distinct_ratio: float = 0.1,
                      dialect: str = "duckdb") -> dict[str, str]:
    """SQL twins of ``quality_rules`` keyed by rule name (same normalized
    tokenization on both engines)."""
    from etl_load_spark.operators.dedup import normalize_text_sql
    from etl_load_spark.operators.text import (stopword_count_sql,
                                               token_count_sql)
    n = token_count_sql(col, dialect)
    norm = normalize_text_sql(col, dialect)
    g = ", 'g'" if dialect == "duckdb" else ""
    chars = f"length(regexp_replace({norm}, ' ', ''{g}))"
    distinct = f"len(list_distinct(string_split({norm}, ' ')))"
    return {
        "r_word_count": f"({n} BETWEEN {min_words} AND {max_words})",
        "r_mean_word_len": (f"(({chars} * 1.0 / {n}) BETWEEN {min_mean_len} "
                            f"AND {max_mean_len})"),
        "r_stopwords": f"({stopword_count_sql(col, dialect)} >= {min_stopwords})",
        "r_distinct_ratio": (f"(({distinct} * 1.0 / {n}) >= "
                             f"{min_distinct_ratio})"),
    }


# ---------------------------------------------------------------------------
# Deterministic weighted source mixing
# ---------------------------------------------------------------------------

def mixture_sample(df: DataFrame, weights: dict[str, float],
                   id_col: str = "doc_id", key_col: str = "source",
                   default_weight: float = 0.0,
                   salt: str = "mix") -> DataFrame:
    """Weighted per-source sampling — the data-mixing stage that turns raw
    corpus proportions into a training mixture. Deterministic: row ``i`` is
    kept iff ``pmod(portable_hash64(id || ':' || salt), 1e6) < w·1e6`` for
    its source's weight ``w`` — no RNG, stable under re-runs, engines and
    partitionings, and re-executable incrementally (a re-run over the same
    ids picks the same rows, so downstream caches stay valid).

    100 TB: a pure map-side filter (hash + literal map lookup) fused into
    the scan; changing the mixture re-runs only this projection. The
    weights map is a LITERAL, not a join — mixtures are dozens of entries,
    never data-sized."""
    from etl_load_spark.operators.dedup import portable_hash64
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w = F.coalesce(wmap[F.col(key_col)], F.lit(float(default_weight)))
    u = F.pmod(portable_hash64(F.concat(F.col(id_col).cast("string"),
                                        F.lit(":" + salt))),
               F.lit(1_000_000))
    return df.withColumn("_keep", u < w * 1_000_000).filter("_keep") \
             .drop("_keep")


def mixture_sample_sql(table: str, weights: dict[str, float],
                       id_col: str = "doc_id", key_col: str = "source",
                       default_weight: float = 0.0, salt: str = "mix",
                       dialect: str = "duckdb") -> str:
    """SQL twin of ``mixture_sample`` (a filtered SELECT over ``table``)."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    h = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
    u = f"((({h}) % 1000000 + 1000000) % 1000000)"
    cases = " ".join(f"WHEN '{k}' THEN {v!r}" for k, v in weights.items())
    w = f"(CASE {key_col} {cases} ELSE {default_weight!r} END)"
    return f"SELECT * FROM {table} WHERE {u} < {w} * 1000000"


# ---------------------------------------------------------------------------
# Model-based quality classification (fastText/DCLM-style linear scorer)
# ---------------------------------------------------------------------------

def quality_classifier(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       keep_threshold: float = 0.0) -> DataFrame:
    """Model-based quality filter — the fastText-style linear classifier
    stage (score documents with a trained model, keep above threshold;
    the DCLM/CCNet pattern). Score = mean token weight; a real deployment
    broadcasts trained weights, and this deterministic stand-in derives
    each token's weight from its md5 hash (uniform integer in
    [-1000, 1000] — the documented injection slot, same posture as the
    multimodal fake kernels).

    Integer-exact scoring: weights are integers, the per-document sum is
    exact, and ``mean_weight`` is ONE IEEE division — so the generated
    DuckDB oracle (quality_classifier_sql) reproduces the doubles
    bit-for-bit and the driver hash certifies the whole scorer.

    Returns (id, n_tokens, mean_weight, keep).

    100 TB: explode + broadcast-free hashing (the "model" is a hash
    function here; a trained vocab is a broadcast map) + one combinable
    sum aggregation keyed by document — one shuffle of (id, partial-sum)
    rows. The mean, not a sigmoid, is the hashed surface: transcendental
    libm calls differ across engines in the last ulp."""
    from etl_load_spark.operators.dedup import normalize_text, portable_hash64
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " "))
        .alias("_tok"))
    w = F.pmod(portable_hash64(F.col("_tok")), F.lit(2001)) - 1000
    scored = (tok.groupBy(id_col)
              .agg(F.sum(w).cast("bigint").alias("_wsum"),
                   F.count(F.lit(1)).cast("bigint").alias("n_tokens")))
    mean_w = F.col("_wsum") / (1000.0 * F.col("n_tokens"))
    return scored.select(id_col, "n_tokens", mean_w.alias("mean_weight"),
                         (mean_w > keep_threshold).alias("keep"))


def quality_classifier_sql(table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text",
                           keep_threshold: float = 0.0,
                           dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``quality_classifier``."""
    from etl_load_spark.operators.dedup import (normalize_text_sql,
                                                portable_hash64_sql)
    h = portable_hash64_sql("tok", dialect)
    return f"""
WITH tok AS (
  SELECT {id_col},
         unnest(string_split({normalize_text_sql(text_col, dialect)}, ' '))
           AS tok
  FROM {table}),
s AS (
  SELECT {id_col},
         CAST(SUM((({h}) % 2001 + 2001) % 2001 - 1000) AS BIGINT) AS wsum,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok GROUP BY {id_col})
SELECT {id_col}, n_tokens,
       wsum / (1000.0 * n_tokens) AS mean_weight,
       (wsum / (1000.0 * n_tokens)) > {keep_threshold} AS keep
FROM s ORDER BY {id_col}
"""


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Overlapping token-window chunking — the embedding/RAG shard step:
    split each document into ``chunk_tokens``-token windows advancing by
    ``chunk_tokens − overlap``, so consecutive chunks share ``overlap``
    tokens of context. Returns (id, chunk_no, chunk_text, n_tokens).

    Chunk starts are exact integer arithmetic (i·stride; the chunk count
    is 1 + ceil(max(n − chunk_tokens, 0)/stride) via div — engine-
    portable, no float indexing), tokens are a raw single-space split
    (both engines split and rejoin identically, so the SQL twin is
    bit-exact). Map-side only: sequence + posexplode + slice/concat_ws,
    fused into the scan; stream-safe (stateless per row). At 100 TB the
    fan-out is plan-visible (n/stride rows per doc) and output partition
    sizing follows chunk_tokens, not input document skew."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens "
                         f"({chunk_tokens})")
    stride = chunk_tokens - overlap
    # NULL text yields NO chunks (filtered here; the SQL twin's WHERE
    # matches). Without the filter Spark's NULL-skipping greatest()
    # still schedules one chunk and emits a (md5(''), NULL) hybrid row.
    toks = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("_id"),
                    F.split(F.col(text_col), " ").alias("_toks"),
                    F.size(F.split(F.col(text_col), " ")).alias("_n")))
    m = (F.lit(1)
         + F.expr(f"(greatest(_n - {chunk_tokens}, 0) + {stride} - 1) "
                  f"div {stride}"))
    ex = toks.select("_id", "_toks", "_n",
                     F.explode(F.sequence(F.lit(0), m - 1)).alias("_c"))
    sl = F.slice("_toks", F.col("_c") * stride + 1, chunk_tokens)
    return ex.select(F.col("_id").alias(id_col),
                     F.col("_c").cast("bigint").alias("chunk_no"),
                     F.concat_ws(" ", sl).alias("chunk_text"),
                     F.size(sl).cast("bigint").alias("n_tokens"))


def chunk_documents_sql(table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text", chunk_tokens: int = 64,
                        overlap: int = 16) -> str:
    """Exact SQL twin of ``chunk_documents`` (DuckDB): same raw split,
    same integer chunk math, inclusive list slicing mirrors F.slice."""
    stride = chunk_tokens - overlap
    return f"""
WITH tk AS (
  SELECT {id_col} AS _id, string_split({text_col}, ' ') AS _toks,
         len(string_split({text_col}, ' ')) AS _n
  FROM {table} WHERE {text_col} IS NOT NULL),
ex AS (
  SELECT _id, _toks,
         unnest(generate_series(0,
           (greatest(_n - {chunk_tokens}, 0) + {stride} - 1) // {stride}
         )) AS _c
  FROM tk)
SELECT _id AS {id_col}, CAST(_c AS BIGINT) AS chunk_no,
       array_to_string(_toks[_c * {stride} + 1 :
                              _c * {stride} + {chunk_tokens}], ' ')
         AS chunk_text,
       CAST(len(_toks[_c * {stride} + 1 :
                      _c * {stride} + {chunk_tokens}]) AS BIGINT)
         AS n_tokens
FROM ex
"""


#: first-occurrence encoding factor: enc = doc_id·10⁶ + position. Positions
#: at or beyond the factor would silently mis-order resolution, so the
#: operator raises instead (ANSI-style loud failure); widen the factor (or
#: switch the min to a struct) for corpora with >10⁶-token documents.
_SPAN_POS_LIMIT = 1_000_000


def span_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", span_tokens: int = 16,
               stop_span_df: int | None = None) -> DataFrame:
    """Exact span-level dedup — the CUT operator behind q142's
    measurement (the substring-dedup step of the dedup literature,
    window-approximated): every occurrence of a repeated
    ``span_tokens``-token window EXCEPT the globally first one is cut
    from its document; documents are rebuilt from the surviving tokens.
    Returns (id, n_tokens, n_cut, cleaned_md5) for every non-NULL-text
    document (fully-cut documents keep a row with md5('')).

    Exactness contract: "repeated" = the raw-token window string occurs
    at ≥ 2 (doc, position) sites corpus-wide (within-doc repeats count);
    "first" = the minimum (doc_id, position), encoded as
    doc_id·10⁶ + position so both engines order identically with ONE
    int64 min. A token position at or beyond 10⁶ raises loudly instead
    of silently mis-ordering (``_SPAN_POS_LIMIT``). Cut windows mark
    their ``span_tokens`` token positions covered; surviving tokens
    rejoin in position order with single spaces. Finer than q128's
    aligned-block dedup (any offset, not block boundaries); the exact
    window analogue of suffix-based substring dedup.

    ``stop_span_df`` (optional, default None = exact semantics): spans
    occurring at ≥ that many (doc, position) sites are treated as
    structural boilerplate and NOT cut — the corpus-curation knob for
    ultra-high-DF spans a dedicated boilerplate pass owns.

    Scale (the q128 pattern, replacing round 3's window form): the span
    relation shuffles ONCE on an xxhash64-led key — the hash leads the
    sort/compare so hash-unequal rows never touch the span string, and
    grouping on the string too keeps the operator EXACT under hash
    collision (a certainty at 100 TB span counts). Occurrence count and
    first-occurrence min are HASH AGGREGATES with map-side partial
    combine, so a boilerplate span collapses to one row per map task —
    the window form buffered a hot span's entire partition on one task.
    The probe join back streams over the same Exchange (ReusedExchange:
    identical columns, non-nullable keys, no inferred filters) and AQE
    skew-split divides any residual hot probe partition. Then
    covered-position dedup and the per-doc rebuild, whose memory is
    bounded by document length (the q128 contract)."""
    toks = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("_id"),
                    F.split(F.col(text_col), " ").alias("_toks")))
    n_tok = toks.select("_id", F.size("_toks").cast("bigint").alias("_n"))
    win = (toks.select(
        "_id", "_toks",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.size("_toks") - span_tokens, F.lit(0))))
        .alias("_p"))
        .select("_id", "_p",
                F.concat_ws(" ", F.slice("_toks", F.col("_p") + 1,
                                         span_tokens)).alias("_s")))
    enc = F.when(
        F.col("_p") < _SPAN_POS_LIMIT,
        F.col("_id") * _SPAN_POS_LIMIT + F.col("_p")
    ).otherwise(F.raise_error(F.concat(
        F.lit("span_dedup: token position "), F.col("_p").cast("string"),
        F.lit(f" >= {_SPAN_POS_LIMIT} overflows the first-occurrence "
              "encoding; widen _SPAN_POS_LIMIT"))).cast("bigint"))
    spans = win.withColumn("_h", F.xxhash64("_s")).repartition("_h", "_s")
    st = (spans.groupBy("_h", "_s")
          .agg(F.count(F.lit(1)).alias("_occ"), F.min(enc).alias("_first")))
    keep_cut = (F.col("_occ") >= 2) & (enc != F.col("_first"))
    if stop_span_df is not None:
        keep_cut = keep_cut & (F.col("_occ") < stop_span_df)
    # shuffle_hash on the aggregated (distinct-span) side: sort-merge
    # would re-SORT the occurrence relation — on the skew stress (one
    # span at 15.6M sites) the probe sort made SMJ 64s vs 24s for the
    # sort-free hash join (the r3 window form: 38-54s, with the whole
    # hot partition buffered in ONE task); the build side is the
    # aggregate's output partition (distinct spans), never the raw
    # occurrence rows, so build memory is dedup-bounded
    rep = (spans.join(st.hint("shuffle_hash"), ["_h", "_s"])
           .filter(keep_cut)
           .select("_id", "_p"))
    covered = (rep.select(
        "_id", F.explode(F.sequence(
            F.col("_p"), F.col("_p") + span_tokens - 1)).alias("_cpos"))
        .dropDuplicates(["_id", "_cpos"]))
    tokpos = toks.select(
        "_id", F.posexplode("_toks").alias("_pos", "_tok"))
    # null-safe on _id: covered never carries a NULL id (a NULL-id span
    # can't beat the first-occurrence min), so <=> is semantically the
    # plain equi-join here — but it stops InferFiltersFromConstraints
    # from pushing isnotnull(_id) down covered's lineage into the shared
    # span exchange, which made the two (_h, _s) branches non-identical
    # and re-planned the corpus explode per branch (no ReusedExchange)
    clean = tokpos.join(
        covered,
        tokpos["_id"].eqNullSafe(covered["_id"])
        & (tokpos["_pos"] == covered["_cpos"]), "left_anti")
    rebuilt = (clean.groupBy("_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("_kept"),
                    F.concat_ws(" ", F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("_pos", "_tok"))),
                        lambda x: x["_tok"])).alias("_cleaned")))
    return (n_tok.join(rebuilt, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.col("_n").alias("n_tokens"),
                    (F.col("_n") - F.coalesce("_kept", F.lit(0)))
                    .cast("bigint").alias("n_cut"),
                    F.md5(F.coalesce("_cleaned", F.lit("")))
                    .alias("cleaned_md5"))
            .orderBy(id_col))


def span_dedup_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text", span_tokens: int = 16) -> str:
    """Exact SQL twin of ``span_dedup`` (DuckDB): same raw split, same
    windowing, the same int64 (doc·10⁶ + pos) first-occurrence order."""
    k = span_tokens
    return f"""
WITH tk AS (
  SELECT {id_col} AS _id, string_split({text_col}, ' ') AS ws
  FROM {table} WHERE {text_col} IS NOT NULL),
w AS (
  SELECT _id, ws,
         unnest(generate_series(0, greatest(len(ws) - {k}, 0))) AS p
  FROM tk),
win AS (
  SELECT _id, p, array_to_string(ws[p + 1 : p + {k}], ' ') AS s FROM w),
st AS (
  SELECT s, COUNT(*) AS occ, MIN(_id * 1000000 + p) AS first_enc
  FROM win GROUP BY s),
rep AS (
  SELECT win._id, win.p
  FROM win JOIN st USING (s)
  WHERE st.occ >= 2 AND win._id * 1000000 + win.p <> st.first_enc),
cov AS (
  SELECT DISTINCT _id, unnest(generate_series(p, p + {k} - 1)) AS cpos
  FROM rep),
tokpos AS (
  SELECT _id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS tok
  FROM tk),
clean AS (
  SELECT t._id, t.pos, t.tok
  FROM tokpos t LEFT JOIN cov ON t._id = cov._id AND t.pos = cov.cpos
  WHERE cov.cpos IS NULL),
reb AS (
  SELECT _id, CAST(COUNT(*) AS BIGINT) AS kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned
  FROM clean GROUP BY _id),
base AS (SELECT _id, CAST(len(ws) AS BIGINT) AS n_tokens FROM tk)
SELECT b._id AS {id_col}, b.n_tokens,
       CAST(b.n_tokens - coalesce(r.kept, 0) AS BIGINT) AS n_cut,
       md5(coalesce(r.cleaned, '')) AS cleaned_md5
FROM base b LEFT JOIN reb r ON b._id = r._id
ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# Cross-source priority dedup (survivor selection)
# ---------------------------------------------------------------------------

#: survivor encoding factor: enc = source_rank·10¹² + id. An id at or beyond
#: the factor would corrupt the min-based survivor choice, so the operator
#: raises instead; widen (or switch the min to a struct) for larger id spaces.
_SURVIVOR_ID_LIMIT = 1_000_000_000_000


def _source_rank(source_col: str, priority: list[str]):
    """0-based rank of ``source_col`` in ``priority``; unlisted (and NULL)
    sources rank after every listed one."""
    rank = None
    for i, s in enumerate(priority):
        cond = (F.col(source_col) == F.lit(s), F.lit(i))
        rank = F.when(*cond) if rank is None else rank.when(*cond)
    return (rank.otherwise(F.lit(len(priority))) if rank is not None
            else F.lit(len(priority))).cast("bigint")


def cross_source_dedup(df: DataFrame, priority: list[str],
                       id_col: str = "doc_id", text_col: str = "text",
                       source_col: str = "source") -> DataFrame:
    """Source-preference exact dedup — among documents with identical
    normalized content, keep ONE survivor chosen by source priority (the
    cross-dump curation rule: prefer the curated source, fall back to the
    earliest id). ``priority`` lists preferred sources best-first; unlisted
    and NULL sources rank after every listed one. NULL-text documents are
    excluded (no content to compare); content identity is
    dedup.content_key (md5 of normalized text, md5 of RAW text when the
    normalization empties it — so non-latin/punctuation-only docs never
    collapse onto the shared md5('') key).

    Returns one row per distinct content:
    (content_md5, id, source, n_copies, n_sources) — the surviving
    document's id/source plus how many copies and distinct non-NULL
    sources the content appeared under.

    Survivor = min(rank·10¹² + id): ONE int64 min that any engine orders
    identically; an id at or beyond 10¹² raises loudly
    (``_SURVIVOR_ID_LIMIT``) instead of silently mis-choosing.

    Scale: the (key, enc, source) relation — a 32-char hash, an int64 and
    a short string per row, never the document text — shuffles ONCE on
    the content hash; survivor stats are a hash aggregate over that
    exchange, and the survivor fetch joins the aggregate's dedup-bounded
    output back over the SAME exchange (ReusedExchange) as a sort-free
    shuffle-hash join — the span_dedup pattern. The id is DECODED from
    the encoding (enc mod 10¹²) rather than carried as its own column:
    both consumer branches then prune to the identical column set, which
    is what keeps the shared exchange shared (per-branch pruning defeats
    ReusedExchange). The reference has no data-level dedup (its only
    duplicate check is job-level: wfqueuelistener.java:261-280 skips a
    job config already RUNNING); this operator belongs to the
    training-data curation surface added on top of the reference's
    ETL scope."""
    from etl_load_spark.operators.dedup import content_key

    idc = F.col(id_col)
    enc = F.when(
        idc < _SURVIVOR_ID_LIMIT,
        _source_rank(source_col, priority) * _SURVIVOR_ID_LIMIT + idc
    ).otherwise(F.raise_error(F.concat(
        F.lit("cross_source_dedup: id "), idc.cast("string"),
        F.lit(f" >= {_SURVIVOR_ID_LIMIT} overflows the survivor "
              "encoding; widen _SURVIVOR_ID_LIMIT"))).cast("bigint"))
    # the explicit isnotnull pair pre-empts InferFiltersFromConstraints:
    # the join would otherwise push isnotnull(_enc) into the probe branch
    # only and isnotnull(_key) into the aggregate branch only, making the
    # two subtrees under the shared repartition differ (no ReusedExchange)
    rel = (df.filter(F.col(text_col).isNotNull())
           .select(content_key(F.col(text_col)).alias("_key"),
                   F.col(source_col).alias("_src"),
                   enc.alias("_enc"))
           .filter(F.col("_key").isNotNull() & F.col("_enc").isNotNull())
           .repartition("_key"))
    st = (rel.groupBy("_key")
          .agg(F.min("_enc").alias("_min"),
               F.count(F.lit(1)).cast("bigint").alias("n_copies"),
               F.countDistinct("_src").cast("bigint").alias("n_sources")))
    # survivor test as `<=` not `==`: equal in effect (ids are unique, so
    # exactly one row attains the min), but an EQUALITY here is absorbed
    # into the join as a second key pair (_enc = _min), re-keying the
    # probe's distribution to (_key, _enc) and splitting the shared
    # exchange; the inequality stays a post-join filter and the join
    # stays on _key alone
    return (rel.join(st.hint("shuffle_hash"), "_key")
            .filter(F.col("_enc") <= F.col("_min"))
            .select(F.col("_key").alias("content_md5"),
                    F.pmod(F.col("_enc"), F.lit(_SURVIVOR_ID_LIMIT))
                    .alias(id_col),
                    F.col("_src").alias(source_col),
                    "n_copies", "n_sources")
            .orderBy(id_col))


def cross_source_dedup_sql(table: str, priority: list[str],
                           id_col: str = "doc_id", text_col: str = "text",
                           source_col: str = "source",
                           dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``cross_source_dedup``. ``table`` may be an
    aliased inline subquery (e.g. a planted-corpus UNION ALL)."""
    from etl_load_spark.operators.dedup import content_key_sql
    key = content_key_sql(text_col, dialect)
    cases = " ".join(f"WHEN '{s}' THEN {i}" for i, s in enumerate(priority))
    return f"""
WITH rel AS (
  SELECT {id_col} AS _id, {source_col} AS _src,
         {key} AS _key,
         CAST(CASE {source_col} {cases} ELSE {len(priority)} END AS BIGINT)
           * {_SURVIVOR_ID_LIMIT} + {id_col} AS _enc
  FROM {table} WHERE {text_col} IS NOT NULL),
st AS (
  SELECT _key, MIN(_enc) AS _min,
         CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(COUNT(DISTINCT _src) AS BIGINT) AS n_sources
  FROM rel GROUP BY _key)
SELECT rel._key AS content_md5, rel._id AS {id_col},
       rel._src AS {source_col}, st.n_copies, st.n_sources
FROM rel JOIN st USING (_key)
WHERE rel._enc = st._min
ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# Token-budget mixture realization (distributed prefix sum)
# ---------------------------------------------------------------------------

def token_budget_kept(df: DataFrame, budgets: dict[str, int],
                      id_col: str = "doc_id", text_col: str = "text",
                      source_col: str = "source", n_buckets: int = 4096,
                      salt: str = "budget") -> DataFrame:
    """The doc-level kept relation behind ``token_budget_select`` (and the
    TOKEN_BUDGET spec stage): (_id, _src, _n, _bkt, _ok, _off, _cum) rows
    for every document the per-source token budget admits. See
    token_budget_select for semantics and the distributed-prefix-sum
    shape."""
    from etl_load_spark.operators.dedup import portable_hash64
    from etl_load_spark.operators.text import token_count

    bkt = F.pmod(portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(n_buckets))
    # tokenize ONCE, below the shared exchange: the tokenized projection
    # (id, src, n, bkt, ok — tiny rows, no text) shuffles on (src, bucket)
    # and BOTH consumers read it through the within-bucket running-sum
    # window. Bucket totals come from the window output (max of the
    # running sum), NOT from a sibling aggregate over the raw projection:
    # a sibling branch pruned to fewer columns re-plans the scan and runs
    # the tokenizer twice — measured 86.4s vs 46.8s for a naive per-source
    # window on a 1.28M-doc single-source stress (tokenization dominates).
    # With the totals derived downstream, the window needs every column on
    # both branches, the exchange subtrees stay identical (ReusedExchange)
    # and the only duplicated work is the bounded within-bucket sort.
    # the explicit isnotnull pair is the q147 recipe (the broadcast join
    # would otherwise push inferred isnotnull(_src)/isnotnull(_bkt) into
    # the probe's scan only, splitting the shared exchange) and is also
    # semantics: a NULL source can never be kept (budget coalesces to 0)
    # and a NULL id has no deterministic position — both engines drop them
    cumd = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("_id"),
                    F.col(source_col).alias("_src"),
                    token_count(F.col(text_col)).alias("_n"),
                    bkt.alias("_bkt"),
                    F.md5(F.col(id_col).cast("string")).alias("_ok"))
            .filter(F.col("_src").isNotNull() & F.col("_bkt").isNotNull())
            .repartition("_src", "_bkt")
            .withColumn("_cum_in", F.sum("_n").over(
                W.partitionBy("_src", "_bkt").orderBy("_ok", "_id"))))
    boff = (cumd.groupBy("_src", "_bkt")
            .agg(F.max("_cum_in").alias("_bt"))
            .withColumn(
                "_off", F.coalesce(
                    F.sum("_bt").over(
                        W.partitionBy("_src").orderBy("_bkt")
                        .rowsBetween(W.unboundedPreceding, -1)),
                    F.lit(0).cast("bigint")))
            .select("_src", "_bkt", "_off"))
    bmap = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    budget = F.coalesce(bmap[F.col("_src")].cast("bigint"),
                        F.lit(0).cast("bigint"))
    return (cumd.join(F.broadcast(boff), ["_src", "_bkt"])
            .withColumn("_cum", F.col("_off") + F.col("_cum_in"))
            .filter(F.col("_cum") - F.col("_n") < budget))


def token_budget_select(df: DataFrame, budgets: dict[str, int],
                        id_col: str = "doc_id", text_col: str = "text",
                        source_col: str = "source", n_buckets: int = 4096,
                        salt: str = "budget") -> DataFrame:
    """Token-budget mixture realization — the step that turns per-source
    TOKEN budgets (not doc-count weights: mixture papers specify token
    proportions) into a concrete document selection. Documents are taken
    in a deterministic pseudo-random order per source (md5 of the id)
    until the source's budget is met; the document crossing the boundary
    is included (fill-to-budget), sources without a budget contribute
    nothing, and NULL-text documents are excluded. Deterministic: re-runs,
    engines and partitionings pick the identical set (mixture_sample's
    contract, at token granularity).

    Returns a per-source manifest (source, n_docs, n_tokens, sel_xor):
    ``sel_xor`` is the XOR of a portable 64-bit hash of each selected id —
    an order-free, combinable certificate of the exact selected set.

    Scale — a DISTRIBUTED PREFIX SUM, not a per-source window: a window
    partitioned by source alone would put an entire source's corpus slice
    in ONE task (unbounded at 100 TB). Instead each doc hashes to one of
    ``n_buckets`` ordered buckets; the within-bucket running sum is a
    window over (source, bucket) partitions of ~corpus/n_buckets rows;
    per-bucket totals are the MAX of that running sum (derived from the
    window output, so both consumers share one tokenize + one exchange —
    see token_budget_kept); bucket offsets are a window over the BOUNDED
    totals relation (n_buckets rows per source) and broadcast back.
    Measured on a 1.28M-doc single-source stress (the worst case):
    49.6 s, identical selection to the naive per-source window's 46.8 s
    (which buffers the whole source in one task — the unbounded shape)
    — and 86.4 s for a sibling-aggregate variant whose pruned second
    branch re-ran the tokenizer over the corpus (tokenization dominates;
    never fork below the tokenized projection)."""
    from etl_load_spark.operators.dedup import portable_hash64

    sel_h = portable_hash64(F.concat(F.col("_id").cast("string"),
                                     F.lit(":sel")))
    return (token_budget_kept(df, budgets, id_col=id_col, text_col=text_col,
                              source_col=source_col, n_buckets=n_buckets,
                              salt=salt)
            .groupBy("_src")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("_n").cast("bigint").alias("n_tokens"),
                 F.bit_xor(sel_h).alias("sel_xor"))
            .select(F.col("_src").alias(source_col),
                    "n_docs", "n_tokens", "sel_xor")
            .orderBy(source_col))


def token_budget_select_sql(table: str, budgets: dict[str, int],
                            id_col: str = "doc_id", text_col: str = "text",
                            source_col: str = "source",
                            n_buckets: int = 4096, salt: str = "budget",
                            dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``token_budget_select``: ONE plain window replays
    the distributed prefix sum (global cum per source over (bucket,
    order-key, id) decomposes exactly into bucket offset + within-bucket
    running sum — pure integer arithmetic)."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    from etl_load_spark.operators.text import token_count_sql
    hb = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
    hs = portable_hash64_sql(f"CAST(_id AS VARCHAR) || ':sel'", dialect)
    cases = " ".join(f"WHEN '{k}' THEN {int(v)}" for k, v in budgets.items())
    return f"""
WITH d AS (
  SELECT {id_col} AS _id, {source_col} AS _src,
         {token_count_sql(text_col, dialect)} AS _n,
         (({hb}) % {n_buckets} + {n_buckets}) % {n_buckets} AS _bkt,
         md5(CAST({id_col} AS VARCHAR)) AS _ok
  FROM {table}
  WHERE {text_col} IS NOT NULL AND {id_col} IS NOT NULL
    AND {source_col} IS NOT NULL),
c AS (
  SELECT *, SUM(_n) OVER (PARTITION BY _src ORDER BY _bkt, _ok, _id
                          ROWS UNBOUNDED PRECEDING) AS _cum
  FROM d),
k AS (
  SELECT * FROM c
  WHERE _cum - _n < CAST(COALESCE(
          CASE _src {cases} ELSE 0 END, 0) AS BIGINT))
SELECT _src AS {source_col}, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(_n) AS BIGINT) AS n_tokens,
       CAST(bit_xor({hs}) AS BIGINT) AS sel_xor
FROM k GROUP BY _src ORDER BY {source_col}
"""


# ---------------------------------------------------------------------------
# Deterministic shard manifest (training-data export)
# ---------------------------------------------------------------------------

def shard_assign(df: DataFrame, n_shards: int = 64,
                 id_col: str = "doc_id", salt: str = "shard",
                 shard_col: str = "shard") -> DataFrame:
    """``df`` plus a deterministic shard column: portable 64-bit hash of
    the id mod ``n_shards``, so any engine, re-run or partitioning
    assigns identically. A pure projection — map-side, stream-safe, and
    the column a writer's partitionBy uses for shard-layout output (the
    ASSIGN_SHARDS spec stage)."""
    from etl_load_spark.operators.dedup import portable_hash64
    return df.withColumn(shard_col, F.pmod(portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(n_shards)))


def shard_manifest(df: DataFrame, n_shards: int = 64,
                   id_col: str = "doc_id", text_col: str = "text",
                   salt: str = "shard") -> DataFrame:
    """Deterministic shard assignment + manifest — the training-data
    export step: every document hashes to one of ``n_shards`` shards
    (portable hash of its id, so any engine or re-run assigns
    identically), and the manifest certifies each shard's exact contents:
    (shard, n_docs, n_tokens, manifest_xor) where ``manifest_xor`` XORs a
    portable 64-bit hash of each (id, token-count) pair — order-free and
    combinable, so two exports match iff their manifests match. NULL-text
    documents are excluded (nothing to ship).

    Scale: assignment is a pure projection fused into the scan (a writer
    partitionBy(shard) needs no extra shuffle beyond the write's own) and
    the manifest is ONE map-side-combinable hash aggregation of n_shards
    output rows — no window, no join, nothing driver-side."""
    from etl_load_spark.operators.dedup import portable_hash64
    from etl_load_spark.operators.text import token_count

    docs = (shard_assign(df.filter(F.col(text_col).isNotNull()),
                         n_shards=n_shards, id_col=id_col, salt=salt)
            .select(F.col(id_col).alias("_id"), "shard",
                    token_count(F.col(text_col)).alias("_n")))
    man_h = portable_hash64(F.concat(F.col("_id").cast("string"),
                                     F.lit(":"),
                                     F.col("_n").cast("string")))
    return (docs.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("_n").cast("bigint").alias("n_tokens"),
                 F.bit_xor(man_h).alias("manifest_xor"))
            .orderBy("shard"))


def shard_manifest_sql(table: str = "documents", n_shards: int = 64,
                       id_col: str = "doc_id", text_col: str = "text",
                       salt: str = "shard", dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``shard_manifest``."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    from etl_load_spark.operators.text import token_count_sql
    hb = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
    hm = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':' || CAST(_n AS VARCHAR)", dialect)
    return f"""
WITH d AS (
  SELECT {id_col},
         (({hb}) % {n_shards} + {n_shards}) % {n_shards} AS shard,
         {token_count_sql(text_col, dialect)} AS _n
  FROM {table} WHERE {text_col} IS NOT NULL)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(_n) AS BIGINT) AS n_tokens,
       CAST(bit_xor({hm}) AS BIGINT) AS manifest_xor
FROM d GROUP BY shard ORDER BY shard
"""


# ---------------------------------------------------------------------------
# Sequence packing (training-example assembly)
# ---------------------------------------------------------------------------

def sequence_pack(df: DataFrame, seq_len: int = 2048,
                  id_col: str = "doc_id", text_col: str = "text",
                  n_buckets: int = 4096, salt: str = "pack") -> DataFrame:
    """Concat-and-chunk sequence packing — the training-example assembly
    step: documents are concatenated in a deterministic pseudo-random
    order (each followed by ONE separator/EOS token) and the token stream
    is chunked into fixed ``seq_len`` context windows. Returns the
    doc-level packing manifest (doc_id, n_tokens, start_off, first_seq,
    last_seq, n_seqs): exactly where every document lands in the packed
    stream, which training sequences it spans, and hence (n_seqs > 1)
    whether it is split across sequence boundaries. Zero padding by
    construction — only the final partial sequence is short.

    Deterministic: the global order is (bucket, md5(id), id), so re-runs,
    engines and partitionings pack identically; every output column is
    exact integer arithmetic on the prefix sum.

    Scale — the token_budget_select distributed prefix sum, global
    instead of per-source: a single ORDER BY over the corpus would sort
    100 TB on one boundary; instead each doc hashes to one of
    ``n_buckets`` ordered buckets, the within-bucket running sum is a
    window over ~corpus/n_buckets rows, bucket totals are the MAX of
    that running sum (derived downstream of the shared window so the
    tokenize + exchange happen once — never fork below the tokenized
    projection), and bucket offsets are a window over the BOUNDED
    totals relation (n_buckets rows, one task is fine) broadcast back.
    Sequence ids are pure projections off the offsets: no second
    shuffle, no explode of per-sequence rows."""
    from etl_load_spark.operators.dedup import portable_hash64
    from etl_load_spark.operators.text import token_count

    bkt = F.pmod(portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(n_buckets))
    # the explicit isnotnull(_bkt) is the q147/q148 recipe: the offsets
    # join would otherwise push an inferred isnotnull into the probe
    # branch only, making the two subtrees under the shared repartition
    # differ — no ReusedExchange, tokenizer re-run per branch
    cumd = (df.filter(F.col(text_col).isNotNull()
                      & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("_id"),
                    token_count(F.col(text_col)).alias("_n"),
                    bkt.alias("_bkt"),
                    F.md5(F.col(id_col).cast("string")).alias("_ok"))
            .filter(F.col("_bkt").isNotNull())
            .repartition("_bkt")
            # width = tokens + 1 EOS separator per document
            .withColumn("_cum_in", F.sum(F.col("_n") + 1).over(
                W.partitionBy("_bkt").orderBy("_ok", "_id"))))
    boff = (cumd.groupBy("_bkt")
            .agg(F.max("_cum_in").alias("_bt"))
            .withColumn(
                "_off", F.coalesce(
                    F.sum("_bt").over(
                        W.orderBy("_bkt")
                        .rowsBetween(W.unboundedPreceding, -1)),
                    F.lit(0).cast("bigint")))
            .select("_bkt", "_off"))
    start = F.col("_off") + F.col("_cum_in") - F.col("_n") - 1
    return (cumd.join(F.broadcast(boff), "_bkt")
            .withColumn("_start", start)
            .select(F.col("_id").alias(id_col),
                    F.col("_n").alias("n_tokens"),
                    F.col("_start").alias("start_off"),
                    F.expr(f"_start div {int(seq_len)}").alias("first_seq"),
                    F.expr(f"(_start + _n - 1) div {int(seq_len)}")
                    .alias("last_seq"))
            .withColumn("n_seqs",
                        F.col("last_seq") - F.col("first_seq") + F.lit(1))
            .orderBy(id_col))


def sequence_pack_sql(table: str = "documents", seq_len: int = 2048,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_buckets: int = 4096, salt: str = "pack",
                      dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``sequence_pack``: one plain window replays the
    distributed prefix sum (global cum over (bucket, md5, id) decomposes
    exactly into bucket offset + within-bucket running sum); sequence
    ids are integer division on the prefix sum."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    from etl_load_spark.operators.text import token_count_sql
    hb = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
    L = int(seq_len)
    return f"""
WITH d AS (
  SELECT {id_col} AS _id,
         {token_count_sql(text_col, dialect)} AS _n,
         (({hb}) % {n_buckets} + {n_buckets}) % {n_buckets} AS _bkt,
         md5(CAST({id_col} AS VARCHAR)) AS _ok
  FROM {table}
  WHERE {text_col} IS NOT NULL AND {id_col} IS NOT NULL),
c AS (
  SELECT *, SUM(_n + 1) OVER (ORDER BY _bkt, _ok, _id
                              ROWS UNBOUNDED PRECEDING) AS _cum
  FROM d)
SELECT _id AS {id_col}, CAST(_n AS BIGINT) AS n_tokens,
       CAST(_cum - _n - 1 AS BIGINT) AS start_off,
       CAST((_cum - _n - 1) // {L} AS BIGINT) AS first_seq,
       CAST((_cum - 2) // {L} AS BIGINT) AS last_seq,
       CAST((_cum - 2) // {L} - (_cum - _n - 1) // {L} + 1 AS BIGINT)
         AS n_seqs
FROM c ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# Stratified sampling (class balancing)
# ---------------------------------------------------------------------------

def stratified_sample(df: DataFrame, stratum_col: str = "lang",
                      id_col: str = "doc_id", n_buckets: int = 4096,
                      salt: str = "strat") -> DataFrame:
    """Balance strata to the minority class: keep the first
    ``min-stratum-size`` documents of EVERY stratum in a deterministic
    pseudo-random order (md5 of the id) — the exact-count analogue of
    mixture_sample for data-dependent targets (class balancing for
    classifier training sets, language rebalancing). Deterministic:
    re-runs, engines and partitionings select the identical set. NULL
    stratum or id rows are excluded (no deterministic position).

    Returns the kept (id, stratum) rows.

    Scale — per-stratum RANK via the distributed prefix sum, not a
    per-stratum window (which would buffer a whole stratum in one
    task): docs hash into ordered buckets, within-bucket row_number
    windows are bounded (~corpus/n_buckets rows), bucket totals derive
    from the window output (max row_number — the shared-exchange rule),
    offsets+thresholds are windows/aggregates over the BOUNDED totals
    relation (n_buckets x strata rows) broadcast back. The minority
    size is an aggregate of the same totals relation, never a second
    corpus pass."""
    from etl_load_spark.operators.dedup import portable_hash64

    bkt = F.pmod(portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(n_buckets))
    # explicit isnotnull(_bkt): same shared-exchange recipe as
    # sequence_pack/token_budget_kept (three consumers here — the doc
    # probe, the offsets window and the minority-size aggregate — must
    # stay byte-identical below the repartition)
    cumd = (df.filter(F.col(stratum_col).isNotNull()
                      & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("_id"),
                    F.col(stratum_col).alias("_st"),
                    bkt.alias("_bkt"),
                    F.md5(F.col(id_col).cast("string")).alias("_ok"))
            .filter(F.col("_bkt").isNotNull())
            .repartition("_st", "_bkt")
            .withColumn("_rn_in", F.row_number().over(
                W.partitionBy("_st", "_bkt").orderBy("_ok", "_id"))
                .cast("bigint")))
    bt = cumd.groupBy("_st", "_bkt").agg(F.max("_rn_in").alias("_bt"))
    boff = (bt.withColumn(
                "_off", F.coalesce(
                    F.sum("_bt").over(
                        W.partitionBy("_st").orderBy("_bkt")
                        .rowsBetween(W.unboundedPreceding, -1)),
                    F.lit(0).cast("bigint")))
            .select("_st", "_bkt", "_off"))
    m = (bt.groupBy("_st").agg(F.sum("_bt").alias("_cnt"))
         .agg(F.min("_cnt").alias("_m")))
    return (cumd.join(F.broadcast(boff), ["_st", "_bkt"])
            .join(F.broadcast(m))
            .filter(F.col("_off") + F.col("_rn_in") <= F.col("_m"))
            .select(F.col("_id").alias(id_col),
                    F.col("_st").alias(stratum_col))
            .orderBy(id_col))


def stratified_sample_sql(table: str = "documents",
                          stratum_col: str = "lang",
                          id_col: str = "doc_id", n_buckets: int = 4096,
                          salt: str = "strat",
                          dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``stratified_sample``: a per-stratum ROW_NUMBER
    ordered (bucket, md5, id) replays the bucketed rank decomposition."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    hb = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
    return f"""
WITH d AS (
  SELECT {id_col} AS _id, {stratum_col} AS _st,
         (({hb}) % {n_buckets} + {n_buckets}) % {n_buckets} AS _bkt,
         md5(CAST({id_col} AS VARCHAR)) AS _ok
  FROM {table}
  WHERE {stratum_col} IS NOT NULL AND {id_col} IS NOT NULL),
c AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY _st
                               ORDER BY _bkt, _ok, _id) AS _rn
  FROM d),
m AS (SELECT MIN(cnt) AS _m
      FROM (SELECT COUNT(*) AS cnt FROM d GROUP BY _st))
SELECT _id AS {id_col}, _st AS {stratum_col}
FROM c, m WHERE _rn <= _m ORDER BY {id_col}
"""


def quota_stratified_sample(df: DataFrame, quotas: dict[str, int],
                            stratum_col: str = "lang",
                            id_col: str = "doc_id",
                            weight: Column | None = None,
                            n_buckets: int = 4096,
                            salt: str = "quota") -> DataFrame:
    """Exact per-stratum SIZES — the "balanced fine-tune set" ask:
    ``quotas`` maps stratum value → requested document count, and each
    listed stratum yields EXACTLY min(quota, stratum size) documents;
    unlisted (and NULL) strata are excluded — the output is precisely
    the requested mixture, nothing else. stratified_sample (q153)
    balances every stratum to the data-dependent minority size;
    mixture_sample (q75) hits a RATE; priority_sample (q169) hits one
    GLOBAL size — this is the remaining cell of the matrix: explicit
    per-stratum sizes.

    Within a stratum, selection is weight-proportional WITHOUT
    replacement when ``weight`` is given (Efraimidis–Spirakis A-Res:
    the quota largest rounded ``ln(u)/w`` priorities win, u a
    deterministic hash-uniform draw — the q169 scheme applied per
    stratum) and uniform-deterministic otherwise (ascending md5(id),
    the q153 order, expressed as priority via the SAME descending rank:
    negative md5-prefix fraction). Rows with NULL id — and, under a
    weight, NULL/non-positive weights — are excluded (no valid
    priority). Deterministic: no RNG; identical selection across
    re-runs, engines and partitionings (priorities rounded to 12 dp
    before ranking, id tie-break — the round-before-rank rule).

    Returns (id, stratum, _priority) rows.

    Scale — per-stratum top-k WITHOUT sorting a whole stratum in one
    task, in two bounded phases: (1) docs hash into ``n_buckets``
    ordered buckets; a within-(stratum, bucket) row_number (bounded
    ~stratum/n_buckets rows per task) keeps only each bucket's local
    top-quota — a global winner is necessarily a local winner, so this
    is lossless; (2) the surviving candidate relation — ≤ n_buckets ×
    quota tiny (id, priority) rows per stratum, never the corpus, never
    payloads — is ranked per stratum and cut at the quota. The quotas
    map itself is a broadcast literal relation (pipelines size it by
    hand; it is product config, not data). For quotas in the multi-
    million range, shrink ``n_buckets`` so phase 2 stays bounded; the
    candidate bound is explicit, not probabilistic."""
    from etl_load_spark.operators.dedup import portable_hash64

    if not quotas:
        raise ValueError("quota_stratified_sample: quotas must be a "
                         "non-empty {stratum: size} mapping")
    bad = {s: q for s, q in quotas.items() if q < 0}
    if bad:
        raise ValueError(f"quota_stratified_sample: negative quotas {bad}")
    spark = df.sparkSession
    # VALUES, not createDataFrame: PySpark materializes a driver-local list
    # as a PYTHON RDD — the broadcast build then runs a defaultParallelism-
    # task stage that spawns the Python daemon and pays a worker round trip
    # per task, for THREE rows. Thread dumps of q170's slow runs (r14) sat
    # in PythonWorkerFactory.startDaemon / PythonRunner reads — the only
    # Python stage in the query, and the reason the untouched q170 measured
    # 10-39 s in loaded benches. A VALUES literal is a pure-JVM
    # LocalRelation: no job, no Python, same rows and types.
    def _sq(s: str) -> str:
        return "'" + str(s).replace("\\", "\\\\").replace("'", "''") + "'"
    vals = ", ".join(f"({_sq(s)}, CAST({int(q)} AS BIGINT))"
                     for s, q in quotas.items())
    qdf = F.broadcast(spark.sql(
        f"SELECT * FROM (VALUES {vals}) AS _q(`{stratum_col}`, `_quota`)"))

    if weight is not None:
        u = (F.pmod(portable_hash64(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
            F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
        pri = F.round(F.log(u) / weight.cast("double"), 12)
        valid = weight.isNotNull() & (weight.cast("double") > 0)
    else:
        # q153's ascending-md5 order as a DESCENDING priority: the
        # first 12 hex chars as a negative fraction (exact in float64 —
        # 48 bits < 53-bit mantissa; no libm, replays bit-identically)
        pri = -F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                                  1, 12), 16, 10).cast("double")
        valid = F.lit(True)
    bkt = F.pmod(portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(":b" + salt))),
        F.lit(n_buckets))
    cand = (df.filter(F.col(id_col).isNotNull()
                      & F.col(stratum_col).isNotNull() & valid)
            .select(F.col(id_col).alias("_id"),
                    F.col(stratum_col).cast("string").alias("_st"),
                    pri.alias("_priority"), bkt.alias("_bkt"))
            .join(qdf.withColumnRenamed(stratum_col, "_st"), "_st")
            .withColumn("_rn", F.row_number().over(
                W.partitionBy("_st", "_bkt")
                .orderBy(F.col("_priority").desc(), "_id")))
            .filter(F.col("_rn") <= F.col("_quota"))
            .drop("_bkt", "_rn"))
    return (cand
            .withColumn("_rk", F.row_number().over(
                W.partitionBy("_st")
                .orderBy(F.col("_priority").desc(), "_id")))
            .filter(F.col("_rk") <= F.col("_quota"))
            .select(F.col("_id").alias(id_col),
                    F.col("_st").alias(stratum_col), "_priority")
            .orderBy(id_col))


def quota_stratified_sample_sql(table: str, quotas: dict[str, int],
                                stratum_col: str = "lang",
                                id_col: str = "doc_id",
                                weight_expr: str | None = None,
                                salt: str = "quota",
                                dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``quota_stratified_sample``: one per-stratum
    ROW_NUMBER over the same rounded priority replays the two-phase
    bucketed cut (phase 1 is lossless, so the flat rank is identical)."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    if weight_expr is not None:
        h = portable_hash64_sql(
            f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
        u = (f"((CAST((({h}) % 1000000 + 1000000) % 1000000 AS DOUBLE)"
             f" + 0.5) / 1000000.0)")
        pri = f"ROUND(ln({u}) / CAST({weight_expr} AS DOUBLE), 12)"
        valid = (f"AND {weight_expr} IS NOT NULL "
                 f"AND CAST({weight_expr} AS DOUBLE) > 0")
    else:
        pri = (f"-CAST(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR))"
               f", 1, 12) AS BIGINT) AS DOUBLE)")
        valid = ""
    qrows = " UNION ALL ".join(
        f"SELECT '{s}' AS _st, CAST({int(q)} AS BIGINT) AS _quota"
        for s, q in quotas.items())
    return f"""
WITH q AS ({qrows}),
d AS (
  SELECT {id_col} AS _id, CAST({stratum_col} AS VARCHAR) AS _st,
         {pri} AS _priority
  FROM {table}
  WHERE {id_col} IS NOT NULL AND {stratum_col} IS NOT NULL {valid}),
r AS (
  SELECT d.*, q._quota,
         ROW_NUMBER() OVER (PARTITION BY d._st
                            ORDER BY _priority DESC, _id) AS _rk
  FROM d JOIN q ON d._st = q._st)
SELECT _id AS {id_col}, _st AS {stratum_col}, _priority
FROM r WHERE _rk <= _quota ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (targeted data selection)
# ---------------------------------------------------------------------------

def hashed_feature_relation(df: DataFrame, id_col: str, text_col: str,
                            n_buckets: int,
                            hasher: str = "portable",
                            target_flag: Column | None = None) -> DataFrame:
    """(_id, _b) — one row per hashed n-gram feature occurrence: word
    unigrams AND adjacent bigrams of the normalized token stream, hashed
    into ``n_buckets`` buckets. One posexplode over token positions;
    each position emits its unigram plus — when a successor exists —
    its bigram, via a two-element array explode (never a higher-order
    transform over the full token array: HOF lambdas are interpreted
    per element). Documents whose normalized text is empty or NULL
    yield no rows (no features to weigh).

    ``hasher='portable'`` (default) uses the md5-derived 64-bit hash so
    the whole featurizer replays as oracle SQL; ``hasher='fast'`` uses
    JVM xxhash64 — the 100 TB production setting (the bucket hash is an
    arbitrary projection, so any uniform hash gives statistically
    identical DSIR weights; only cross-engine replayability changes).
    Measured in SCALE.md.

    ``target_flag`` (a boolean Column over ``df``'s columns, constant
    per document) adds a ``_t`` output column so one featurizer pass
    can serve both the raw and the target-slice histograms — the q155
    single-pass path."""
    from etl_load_spark.operators.dedup import normalize_text, portable_hash64

    if hasher not in ("portable", "fast"):
        raise ValueError(f"hasher must be 'portable' or 'fast', got {hasher!r}")

    norm = normalize_text(F.col(text_col))
    carry = [] if target_flag is None else [target_flag.alias("_t")]
    t = (df.filter(F.col(text_col).isNotNull()
                   & F.col(id_col).isNotNull())
         .select(F.col(id_col).alias("_id"), norm.alias("_nt"), *carry)
         .filter(F.length("_nt") > 0)
         .select("_id", F.split("_nt", " ").alias("_ws"),
                 *(["_t"] if carry else [])))
    occ = t.select(
        "_id",
        F.posexplode("_ws").alias("_i", "_w"),
        # try_: the last token has no successor and ANSI element_at throws
        F.try_element_at("_ws", F.col("_i") + 2).alias("_nx"),
        *(["_t"] if carry else []))
    feat = occ.select(
        "_id",
        F.explode(F.when(F.col("_nx").isNull(), F.array("_w"))
                  .otherwise(F.array(
                      F.col("_w"),
                      F.concat_ws(" ", "_w", "_nx")))).alias("_f"),
        *(["_t"] if carry else []))
    h = (portable_hash64(F.col("_f")) if hasher == "portable"
         else F.xxhash64(F.col("_f")))
    return feat.select("_id", F.pmod(h, F.lit(n_buckets)).alias("_b"),
                       *(["_t"] if carry else []))


def importance_weights(df: DataFrame, target_df: DataFrame | None = None,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_buckets: int = 1024,
                       hasher: str = "portable",
                       target_pred: Column | None = None) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed n-gram features are
    under the TARGET distribution than under the raw corpus — the
    data-selection stage that picks pretraining data resembling a
    high-quality target domain. Features are hashed word uni+bigrams in
    ``n_buckets`` buckets; both distributions are Laplace-smoothed bag
    models, and the per-feature log-likelihood ratio is QUANTIZED to
    whole bits with the exact integer floor-log2 (the q146 rule: never
    hash a transcendental), so scores are bit-replayable in any engine:

        s(b) = fl2(c_t(b)+1) - fl2(c_r(b)+1)
        K    = fl2(N_r + B)  - fl2(N_t + B)
        total_bits(doc) = sum_feats s(b) + n_feats * K

    Positive = more target-like. Returns (id, n_feats, total_bits,
    bits_per_feat) with bits_per_feat the ONE IEEE division, computed
    after both integer aggregates.

    Scale: ONE token-level shuffle for the corpus. The hashed-feature
    relation repartitions on the bucket (hash(_b) satisfies the
    (_id,_b) grouping too), aggregates to the dedup-compressed
    (_id,_b,k) relation ONCE (persisted + registered with the session
    cache registry — it feeds the raw histogram AND the scoring probe;
    without the boundary Catalyst clones the tokenizer per consumer,
    the q146 lesson), the RAW histogram is derived from it (never a
    second corpus pass), the target histogram is a separate bounded
    pass over the (small, fixed) target set, the B-row score relation
    broadcasts back, and the per-document reduction ships
    (doc, bucket)-level partial sums. The reference has no selection
    ops; this extends the curation surface (module docstring).

    The target set is given EITHER as ``target_df`` (a separate
    relation — the declarative stage's two-source form, tokenized in
    its own bounded pass) OR as ``target_pred`` (a boolean Column over
    ``df``'s own columns, constant per document). The predicate form is
    the single-pass path: the flag rides the one corpus featurizer
    pass and the target histogram is SUM(_k) over flagged docs in the
    already-aggregated (_id,_b,_k) relation — per bucket that equals
    the occurrence count a second tokenizer pass over the slice would
    produce, so results are bit-identical while the target slice's
    tokenize+explode+hash work disappears."""
    from etl_load_spark.operators.text import floor_log2
    from etl_load_spark.session import register_operator_cache

    if (target_df is None) == (target_pred is None):
        raise ValueError(
            "exactly one of target_df / target_pred must be given")
    B = int(n_buckets)
    if target_pred is not None:
        docb = register_operator_cache(
            hashed_feature_relation(df, id_col, text_col, B, hasher,
                                    target_flag=target_pred)
            .repartition("_b")
            .groupBy("_id", "_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_k"),
                 F.max("_t").alias("_t"))
            .persist())
        tgt = (docb.filter("_t").groupBy("_b")
               .agg(F.sum("_k").cast("bigint").alias("_ct")))
        docb = docb.drop("_t")
    else:
        docb = register_operator_cache(
            hashed_feature_relation(df, id_col, text_col, B, hasher)
            .repartition("_b")
            .groupBy("_id", "_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_k"))
            .persist())
        tgt = (hashed_feature_relation(target_df, id_col, text_col, B,
                                       hasher)
               .groupBy("_b")
               .agg(F.count(F.lit(1)).cast("bigint").alias("_ct")))
    raw = docb.groupBy("_b").agg(F.sum("_k").cast("bigint").alias("_cr"))
    nr = raw.agg(F.sum("_cr").cast("bigint").alias("_nr"))
    nt = tgt.agg(F.sum("_ct").cast("bigint").alias("_nt"))
    scores = (raw.join(tgt, "_b", "left")
              .select("_b", (floor_log2(F.coalesce(F.col("_ct"),
                                                   F.lit(0)) + 1)
                             - floor_log2(F.col("_cr") + 1)).alias("_s")))
    k_const = (floor_log2(F.col("_nr") + F.lit(B))
               - floor_log2(F.col("_nt") + F.lit(B)))
    return (docb.join(F.broadcast(scores), "_b")
            .groupBy(F.col("_id").alias(id_col))
            .agg(F.sum("_k").cast("bigint").alias("n_feats"),
                 F.sum(F.col("_k") * F.col("_s")).cast("bigint")
                 .alias("_sb"))
            .crossJoin(F.broadcast(nr))
            .crossJoin(F.broadcast(nt))
            .select(id_col, "n_feats",
                    (F.col("_sb") + F.col("n_feats") * k_const)
                    .cast("bigint").alias("total_bits"))
            .withColumn("bits_per_feat",
                        F.col("total_bits").cast("double")
                        / F.col("n_feats").cast("double"))
            .orderBy(id_col))


def _hashed_feats_cte(table: str, pred: str, id_col: str, text_col: str,
                      n_buckets: int, dialect: str) -> str:
    """Shared oracle CTE body for the hashed uni+bigram featurizer."""
    from etl_load_spark.operators.dedup import (normalize_text_sql,
                                                portable_hash64_sql)
    norm = normalize_text_sql(text_col, dialect)
    hf = portable_hash64_sql("f", dialect)
    return f"""
  SELECT _id, (({hf}) % {n_buckets} + {n_buckets}) % {n_buckets} AS _b
  FROM (
    SELECT _id, unnest(list_concat(
             ws, [ws[i] || ' ' || ws[i + 1]
                  for i in generate_series(1, len(ws) - 1)])) AS f
    FROM (SELECT {id_col} AS _id, string_split({norm}, ' ') AS ws
          FROM {table}
          WHERE {text_col} IS NOT NULL AND {id_col} IS NOT NULL
            AND {norm} <> '' {pred}) tk) oc"""


def importance_weights_sql(table: str, target_pred: str,
                           id_col: str = "doc_id", text_col: str = "text",
                           n_buckets: int = 1024,
                           dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``importance_weights`` where the target set is
    ``table`` rows satisfying ``target_pred`` (the q155 planted-target
    form). Replays the featurizer, both smoothed histograms, the
    integer floor-log2 ratio and the per-doc reduction."""
    from etl_load_spark.operators.text import floor_log2_sql
    fl2 = floor_log2_sql
    B = int(n_buckets)
    return f"""
WITH rawf AS ({_hashed_feats_cte(table, "", id_col, text_col, B, dialect)}),
tgtf AS ({_hashed_feats_cte(table, f"AND ({target_pred})", id_col,
                            text_col, B, dialect)}),
docb AS (SELECT _id, _b, CAST(COUNT(*) AS BIGINT) AS k
         FROM rawf GROUP BY _id, _b),
rh AS (SELECT _b, CAST(SUM(k) AS BIGINT) AS cr FROM docb GROUP BY _b),
th AS (SELECT _b, CAST(COUNT(*) AS BIGINT) AS ct FROM tgtf GROUP BY _b),
nr AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr FROM rh),
nt AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt FROM th),
sc AS (SELECT rh._b,
              {fl2("COALESCE(th.ct, 0) + 1")} - {fl2("rh.cr + 1")} AS s
       FROM rh LEFT JOIN th ON rh._b = th._b),
agg AS (SELECT _id, CAST(SUM(k) AS BIGINT) AS n_feats,
               CAST(SUM(k * s) AS BIGINT) AS sb
        FROM docb JOIN sc USING (_b) GROUP BY _id)
SELECT _id AS {id_col}, n_feats,
       CAST(sb + n_feats * ({fl2(f"nr.nr + {B}")} - {fl2(f"nt.nt + {B}")})
            AS BIGINT) AS total_bits,
       CAST(sb + n_feats * ({fl2(f"nr.nr + {B}")} - {fl2(f"nt.nt + {B}")})
            AS DOUBLE) / CAST(n_feats AS DOUBLE) AS bits_per_feat
FROM agg, nr, nt ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# Eval-leakage report (per-eval-document contamination coverage)
# ---------------------------------------------------------------------------

def eval_leakage(corpus: DataFrame, eval_df: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n: int = 8) -> DataFrame:
    """Per-EVAL-document leakage coverage — the reverse direction of the
    q87/q139 contamination check: for every held-out document, what
    fraction of its distinct verbatim n-grams appears ANYWHERE in the
    training corpus. The decontamination stage answers "which train
    docs must go"; this report answers "how burned is each benchmark
    item" — the number an eval-integrity review quotes.

    Returns (eval_doc_id, n_ngrams, n_leaked, leak_ratio) for every
    eval document with at least one n-gram; leak_ratio is the ONE IEEE
    division of the two counts.

    Scale: the eval shingle set is small and fixed — it BROADCASTS; the
    corpus streams through one map-side semi probe (broadcast hash
    join) and contributes only its matched shingles, deduped to a
    relation bounded by the EVAL size. The corpus never shuffles; no
    (eval x train) pair relation is ever built (q87 builds one because
    it must name the contaminating train docs; coverage does not)."""
    from etl_load_spark.operators.dedup import shingles_exploded

    ev = (shingles_exploded(eval_df, id_col, text_col, n=n)
          .select(F.col("_id").alias("eval_doc_id"), "_s")
          .distinct())
    ev_s = ev.select("_s").distinct()
    tr = shingles_exploded(corpus, id_col, text_col, n=n, distinct=False)
    found = (tr.join(F.broadcast(ev_s), "_s", "left_semi")
             .select("_s").distinct())
    totals = ev.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ngrams"))
    leaked = (ev.join(F.broadcast(found), "_s")
              .groupBy("eval_doc_id")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked")))
    return (totals.join(leaked, "eval_doc_id", "left")
            .select("eval_doc_id", "n_ngrams",
                    F.coalesce("n_leaked", F.lit(0)).cast("bigint")
                    .alias("n_leaked"))
            .withColumn("leak_ratio",
                        F.col("n_leaked").cast("double")
                        / F.col("n_ngrams").cast("double"))
            .orderBy("eval_doc_id"))


# ---------------------------------------------------------------------------
# Group-keyed dataset split (leakage-safe train/valid/test)
# ---------------------------------------------------------------------------

#: default split weights in integer percent (must sum to 100); shared
#: between the Spark and oracle forms.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 80), ("valid", 10), ("test", 10))


def grouped_split(group: Column, splits=DEFAULT_SPLITS,
                  salt: str = "gsplit") -> Column:
    """Split assignment keyed on a GROUP (registered domain, source
    site, author…), not the row: every row of a group lands in the same
    split. Doc-level hash splits (q60) leak near-duplicate same-site
    content across train and test — the classic contamination vector a
    crawl corpus has to close at the GROUP level. Deterministic
    (portable hash bucket in [0,100), integer-percent thresholds), no
    RNG, pure map-side projection at any scale. NULL groups get a NULL
    split (no deterministic assignment — filter or route upstream)."""
    from etl_load_spark.operators.dedup import portable_hash64
    weights = [w for _, w in splits]
    if sum(weights) != 100 or any(w <= 0 for w in weights):
        raise ValueError(f"split weights must be positive and sum to "
                         f"100, got {splits}")
    u = F.pmod(portable_hash64(F.concat(group, F.lit(":" + salt))),
               F.lit(100))
    expr = F.when(group.isNull(), F.lit(None).cast("string"))
    hi = 0
    for name, w in splits:
        hi += w
        expr = expr.when(u < hi, F.lit(name))
    return expr


def grouped_split_sql(group_expr: str, splits=DEFAULT_SPLITS,
                      salt: str = "gsplit",
                      dialect: str = "duckdb") -> str:
    """DuckDB twin of ``grouped_split`` for a group expression."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    h = portable_hash64_sql(f"({group_expr}) || ':{salt}'", dialect)
    u = f"((({h}) % 100 + 100) % 100)"
    whens, hi = [], 0
    for name, w in splits:
        hi += w
        whens.append(f"WHEN {u} < {hi} THEN '{name}'")
    return (f"(CASE WHEN ({group_expr}) IS NULL THEN NULL "
            + " ".join(whens) + " END)")


# ---------------------------------------------------------------------------
# Dense surrogate-key assignment (distributed, deterministic)
# ---------------------------------------------------------------------------

def dense_ids(df: DataFrame, key_col: str, id_col: str = "surrogate_id",
              start_at: int = 1, n_buckets: int = 4096,
              salt: str = "sk") -> DataFrame:
    """Assign DENSE, deterministic surrogate ids (start_at … start_at+n-1)
    keyed on a unique natural key — the dimension-load primitive a
    warehouse ETL needs that Spark does not ship:
    ``monotonically_increasing_id`` is sparse and partitioning-dependent,
    and a global ``row_number`` puts the whole table in one task. NULL
    keys are excluded (no deterministic position); ``start_at`` continues
    an existing dimension's id range (pass max(existing)+1).

    Determinism: the global order is (bucket, md5(key), key) — re-runs,
    engines and partitionings assign identical ids (ids are dense and
    stable but deliberately NOT in natural-key order; surrogate keys
    carry no meaning by definition).

    Scale — the q148/q150 distributed prefix sum, counting rows instead
    of tokens: keys hash into ``n_buckets`` ordered buckets, the
    within-bucket row_number is a window over ~n/n_buckets rows, bucket
    totals derive from that window's max (the shared-exchange rule —
    never a sibling scan), offsets are a window over the BOUNDED totals
    relation broadcast back, and the id is a pure projection
    offset + row_number. No global sort, no single-task window."""
    from etl_load_spark.operators.dedup import portable_hash64

    bkt = F.pmod(portable_hash64(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))),
        F.lit(n_buckets))
    cumd = (df.filter(F.col(key_col).isNotNull())
            .select("*", bkt.alias("_bkt"),
                    F.md5(F.col(key_col).cast("string")).alias("_ok"))
            .filter(F.col("_bkt").isNotNull())
            .repartition("_bkt")
            .withColumn("_rn", F.row_number().over(
                W.partitionBy("_bkt").orderBy("_ok", key_col))
                .cast("bigint")))
    boff = (cumd.groupBy("_bkt")
            .agg(F.max("_rn").alias("_bt"))
            .withColumn(
                "_off", F.coalesce(
                    F.sum("_bt").over(
                        W.orderBy("_bkt")
                        .rowsBetween(W.unboundedPreceding, -1)),
                    F.lit(0).cast("bigint")))
            .select("_bkt", "_off"))
    return (cumd.join(F.broadcast(boff), "_bkt")
            .withColumn(id_col,
                        F.col("_off") + F.col("_rn")
                        + F.lit(int(start_at) - 1))
            .drop("_bkt", "_ok", "_rn", "_off"))


def dense_ids_sql(table: str, key_col: str, id_col: str = "surrogate_id",
                  start_at: int = 1, n_buckets: int = 4096,
                  salt: str = "sk", dialect: str = "duckdb") -> str:
    """Exact SQL twin of ``dense_ids``: one plain window replays the
    bucketed prefix sum (global row_number over (bucket, md5, key))."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    hb = portable_hash64_sql(
        f"CAST({key_col} AS VARCHAR) || ':{salt}'", dialect)
    return f"""
SELECT *, CAST(row_number() OVER (
            ORDER BY (({hb}) % {n_buckets} + {n_buckets}) % {n_buckets},
                     md5(CAST({key_col} AS VARCHAR)), {key_col})
          + {int(start_at) - 1} AS BIGINT) AS {id_col}
FROM {table} WHERE {key_col} IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Exact-size weighted sampling without replacement (A-Res priority sampling)
# ---------------------------------------------------------------------------

def priority_sample(df: DataFrame, k: int, weight: Column,
                    id_col: str = "doc_id",
                    salt: str = "ares") -> DataFrame:
    """Weight-proportional sample of EXACTLY ``k`` rows without
    replacement — the Efraimidis–Spirakis A-Res scheme: each row draws
    a deterministic hash-uniform u ∈ (0,1) and the k largest
    ``u^(1/w)`` keys win (implemented as the rank-equivalent monotone
    ``ln(u)/w``, one log + one divide). mixture_sample (q75) hits a
    RATE per stratum; this hits a SIZE — the form a fixed token/example
    budget needs. Deterministic: no RNG, identical sample on re-runs,
    engines and partitionings; the priority is ROUNDED to 12 dp before
    ranking with an id tie-break (the round-before-rank rule: ln is
    libm, the last ulp is engine-specific). Rows with NULL or
    non-positive weight are excluded (no valid priority).

    Scale: the priority is a pure map-side projection; top-k is
    TakeOrderedAndProject-shaped (no global sort materializes).
    Returns the sampled rows plus ``_priority``."""
    from etl_load_spark.operators.dedup import portable_hash64

    u = (F.pmod(portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(1_000_000)).cast("double") + 0.5) / 1_000_000.0
    pri = F.round(F.log(u) / weight.cast("double"), 12)
    return (df.filter(weight.isNotNull() & (weight.cast("double") > 0))
            .withColumn("_priority", pri)
            .orderBy(F.col("_priority").desc(), F.col(id_col))
            .limit(int(k)))


def priority_sample_sql(table: str, k: int, weight_expr: str,
                        id_col: str = "doc_id", salt: str = "ares",
                        dialect: str = "duckdb") -> str:
    """DuckDB twin of ``priority_sample`` (same u, same rounded
    priority, same tie-break)."""
    from etl_load_spark.operators.dedup import portable_hash64_sql
    h = portable_hash64_sql(
        f"CAST({id_col} AS VARCHAR) || ':{salt}'", dialect)
    u = (f"((CAST((({h}) % 1000000 + 1000000) % 1000000 AS DOUBLE) + 0.5)"
         f" / 1000000.0)")
    return f"""
SELECT *, ROUND(ln({u}) / CAST({weight_expr} AS DOUBLE), 12) AS _priority
FROM {table}
WHERE {weight_expr} IS NOT NULL AND CAST({weight_expr} AS DOUBLE) > 0
ORDER BY _priority DESC, {id_col} LIMIT {int(k)}
"""
