"""Text-analysis operators for corpus pipelines: token counting, quality
scoring, language ID, document fingerprinting.

Each operator exists in two synchronized forms: a Column expression (the
engine) and a SQL-fragment generator (for DuckDB oracle parity) — both
derived from the same constants, so the correctness harness can verify the
exact formula the engine computes. Everything is built-in functions; no
Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from etl_load_spark.operators.dedup import normalize_text, normalize_text_sql

# language-ID marker words: tiny deterministic n-gram/stopword heuristic.
# Order matters (tie-break = first in list).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def token_count(text: Column) -> Column:
    """Whitespace token count of the normalized text (bigint)."""
    return F.size(F.split(normalize_text(text), " ")).cast("bigint")


def token_count_sql(col: str, dialect: str = "spark") -> str:
    norm = normalize_text_sql(col, dialect)
    if dialect == "duckdb":
        return f"CAST(len(string_split({norm}, ' ')) AS BIGINT)"
    return f"CAST(size(split({norm}, ' ')) AS BIGINT)"


BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count over the raw text: letter runs, digit runs, and
    individual punctuation marks each count as one token — the pre-merge
    word-split shape BPE tokenizers start from. RE2-safe pattern (no
    lookahead) so the same regex runs in Spark and DuckDB."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))) \
        .cast("bigint")


def token_count_bpe_sql(col: str, dialect: str = "spark") -> str:
    if dialect == "duckdb":
        return f"CAST(len(regexp_extract_all({col}, '{BPE_TOKEN_RE}')) AS BIGINT)"
    return f"CAST(size(regexp_extract_all({col}, '{BPE_TOKEN_RE}', 0)) AS BIGINT)"


def _count_occurrences(text: Column, word: str) -> Column:
    """# of occurrences of ``word`` as a token, via padded-replace trick
    (identical semantics in any SQL dialect)."""
    padded = F.concat(F.lit(" "), normalize_text(text), F.lit(" "))
    target = f" {word} "
    # each removal shortens the string by len(word)+1 (one space retained)
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(target), F.lit(" "))))
            / (len(word) + 1)).cast("bigint")


def _count_occurrences_sql(col: str, word: str, dialect: str) -> str:
    norm = normalize_text_sql(col, dialect)
    # || not concat(): DuckDB's concat() IGNORES NULL args (emits '  '
    # for NULL text → count 0), while Spark's concat propagates NULL.
    # || propagates NULL in both engines, keeping the NULL-text contract
    # (NULL in → NULL count) identical.
    padded = f"(' ' || {norm} || ' ')"
    return (f"CAST((length({padded}) - length(replace({padded}, ' {word} ', ' ')))"
            f" / {len(word) + 1} AS BIGINT)")


def stopword_count(text: Column) -> Column:
    out = F.lit(0).cast("bigint")
    for w in STOPWORDS:
        out = out + _count_occurrences(text, w)
    return out


def stopword_count_sql(col: str, dialect: str = "spark") -> str:
    return "(" + " + ".join(_count_occurrences_sql(col, w, dialect)
                            for w in STOPWORDS) + ")"


def punct_count(text: Column) -> Column:
    """# of punctuation characters in the raw text."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))


def punct_count_sql(col: str, dialect: str = "spark") -> str:
    flags = ", 'g'" if dialect == "duckdb" else ""
    return (f"CAST(length({col}) - length(regexp_replace({col}, '[.,!?;:]', ''{flags}))"
            f" AS BIGINT)")


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards stopword presence
    (natural language) and mid-range length; penalizes punctuation soup.
    score = 0.5·min(1, stop_ratio·5) + 0.3·min(1, n_tokens/100) +
            0.2·(1 − min(1, punct_ratio·10))
    """
    n_tok = token_count(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    score = (F.least(stop_ratio * 5, F.lit(1.0)) * 0.5
             + F.least(n_tok / 100, F.lit(1.0)) * 0.3
             + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2)
    # NULL text → NULL score, NOT a garbage number: Spark's least/greatest
    # SKIP NULL args, so without the guard a NULL text scores 0.8
    return F.when(text.isNotNull(), score)


def quality_score_sql(col: str, dialect: str = "spark") -> str:
    n_tok = f"CAST({token_count_sql(col, dialect)} AS DOUBLE)"
    stop = f"CAST({stopword_count_sql(col, dialect)} AS DOUBLE)"
    punct = f"CAST({punct_count_sql(col, dialect)} AS DOUBLE)"
    length = f"greatest(CAST(length({col}) AS DOUBLE), 1.0)"
    return (f"(CASE WHEN {col} IS NULL THEN NULL ELSE "
            f"least({stop} / greatest({n_tok}, 1.0) * 5, 1.0) * 0.5"
            f" + least({n_tok} / 100, 1.0) * 0.3"
            f" + (1.0 - least({punct} / {length} * 10, 1.0)) * 0.2 END)")


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: sum((_count_occurrences(text, w) for w in words[1:]),
                      _count_occurrences(text, words[0]))
            for lang, words in LANG_MARKERS.items()}


def predict_lang(text: Column) -> Column:
    """argmax over marker-word counts; 'und' (undetermined) when all zero.
    Ties break by LANG_MARKERS order — mirrored exactly in the SQL form."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[g] for g in langs])
    expr = F.when(best <= 0, F.lit("und"))
    for g in langs:
        expr = expr.when(scores[g] == best, F.lit(g))
    return expr


def predict_lang_sql(col: str, dialect: str = "spark") -> str:
    scores = {g: "(" + " + ".join(_count_occurrences_sql(col, w, dialect)
                                  for w in ws) + ")"
              for g, ws in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(scores[g] for g in langs) + ")"
    whens = "".join(f" WHEN {scores[g]} = {best} THEN '{g}'" for g in langs)
    return f"(CASE WHEN {best} <= 0 THEN 'und'{whens} END)"


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text — identical across
    engines, robust to whitespace/punctuation noise."""
    return F.md5(normalize_text(text))


def fingerprint_sql(col: str, dialect: str = "spark") -> str:
    return f"md5({normalize_text_sql(col, dialect)})"


# ---------------------------------------------------------------------------
# PII detection / redaction (the Dolma/CCNet PII-masking curation stage)
# ---------------------------------------------------------------------------

#: (class name, RE2-safe pattern) — no lookaround, no backreferences, so the
#: same pattern string runs under Java regex (Spark) and RE2 (DuckDB).
#: Order is the REDACTION order: email first (its local part may contain
#: digits a later class would partially eat), then the purely-numeric
#: classes, which are mutually non-overlapping by shape (ipv4 needs three
#: dots, ssn is 3-2-4, phone 3-3-4).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class PII match counts over the RAW text (before any redaction,
    so counts are independent of redaction order). Pure JVM regexp —
    map-side only, no shuffle at any corpus size."""
    return {name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .cast("bigint")
            for name, pat in PII_PATTERNS}


def pii_counts_sql(col: str, dialect: str = "spark") -> dict[str, str]:
    if dialect == "duckdb":
        return {name: f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)"
                for name, pat in PII_PATTERNS}
    return {name: f"CAST(size(regexp_extract_all({col}, '{pat}', 0)) AS BIGINT)"
            for name, pat in PII_PATTERNS}


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its class tag (``[EMAIL]`` …), applied
    in PII_PATTERNS order; the tags contain no digits or ``@``, so earlier
    replacements can never create later-class matches."""
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_redact_sql(col: str, dialect: str = "spark") -> str:
    out = col
    for name, pat in PII_PATTERNS:
        flags = ", 'g'" if dialect == "duckdb" else ""
        out = f"regexp_replace({out}, '{pat}', '[{name.upper()}]'{flags})"
    return out


# ---------------------------------------------------------------------------
# Bigram language-model surprisal (CCNet-style perplexity filtering)
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020) ranks documents by perplexity under a KenLM
# 5-gram model and keeps the low-perplexity head. The distributed SHAPE of
# that stage is what matters here: train/ingest an n-gram count table, join
# each document's n-grams against it, and reduce per-document log-probs in
# one combinable aggregate. This implementation keeps that exact shape with
# a corpus-trained Laplace-smoothed bigram model and a bit-replayable
# integer surprisal quantization:
#
#   s(w1 w2) = floor(log2 (c(w1) + V)) - floor(log2 c(w1 w2))
#
# (exact integers; V = context vocabulary size) — the smoothed conditional
# -log2 (c12 / (c1 + V)) within 1 bit. Smoothing matters even self-scored:
# unsmoothed MLE gives every hapax context probability 1, scoring random
# unique-word noise as perfectly predictable (0 bits); the +V denominator
# charges a hapax transition ~log2 V bits, restoring the CCNet ordering
# (boilerplate cheap, noise expensive). Integer
# floor-log2 is length(bin(x)) - 1 in BOTH engines — no libm
# transcendental, so the DuckDB oracle replays the whole pipeline and the
# check is full value equality (the q141 TV-distance pattern). Production
# swaps the corpus-trained counts for a pretrained LM count table read as
# a DataFrame; every join/aggregate downstream is unchanged.


def floor_log2(col: Column) -> Column:
    """Exact floor(log2(x)) for a positive integral column: the bit length
    of the binary rendering, minus one. Never a float log."""
    return (F.length(F.bin(col)) - 1).cast("bigint")


def floor_log2_sql(expr: str) -> str:
    """DuckDB twin of ``floor_log2`` (bin() exists in both engines and
    renders positive integers without leading zeros)."""
    return f"CAST(length(bin({expr})) - 1 AS BIGINT)"


def bigram_relation(df, id_col: str, text_col: str):
    """(_id, _bg) — one row per adjacent token pair of the normalized
    token stream, in the shingles_exploded throughput form (posexplode of
    the start index + codegen'd slice/concat; no higher-order functions).
    Documents with fewer than two tokens (including NULL / empty /
    normalized-away text) yield NO rows: a bigram LM has no events to
    score there, and the oracle's generate_series(1, len-1) agrees."""
    toks = df.select(F.col(id_col).alias("_id"),
                     F.split(normalize_text(F.col(text_col)), " ")
                     .alias("_toks"))
    idx = F.sequence(F.lit(0), F.size("_toks") - 2)
    return (toks.filter(F.size("_toks") >= 2)
            .select("_id", F.explode(idx).alias("_i"), "_toks")
            .select("_id",
                    F.concat_ws(" ", F.slice("_toks", F.col("_i") + 1, 2))
                    .alias("_bg")))


def bigram_surprisal(df, id_col: str, text_col: str):
    """Per-document quantized bigram-LM surprisal: (id_col, n_bigrams,
    total_bits, bits_per_bigram). Lower bits ⇒ more predictable text —
    CCNet keeps the low-perplexity head, boilerplate/repetition scores
    near 0, shuffled-vocabulary noise scores high.

    Scale: ONE token-level shuffle. The exploded occurrence relation is
    repartitioned on the bigram key, and hash(_bg) satisfies every
    downstream clustering — the (doc, bigram) count, the global bigram
    count, and the scoring join probe all run on that single Exchange
    with no further big-relation shuffle (the q141 pattern; the
    immediate aggregate is the boundary that keeps per-branch column
    pruning from splitting the exchange). Context counts derive from the
    bigram counts (vocab-sized, never a second corpus pass); the
    smoothing constant V is one scalar broadcast. The per-document
    reduction ships (doc, bigram)-level partial sums. Self-scoring means
    every document bigram hits the count table (inner join is total);
    with a pretrained external table, switch the scoring join to a left
    join and charge unseen bigrams floor_log2(c1 + V) (c12=1 Laplace
    mass). The one IEEE division happens after both integer
    aggregates."""
    # ONE token-level shuffle, ONE corpus pass: the occurrence explode is
    # repartitioned on the bigram key BEFORE the (doc, bigram) count —
    # hash(_bg) already satisfies the {_id, _bg} grouping, so the
    # aggregate adds no exchange — and the result is persisted. docbg
    # feeds four consumers (bigram counts, context counts, the V scalar,
    # the scoring probe); without the cache boundary Catalyst clones the
    # corpus explode per consumer (pushed join predicates and per-branch
    # column pruning make the subtrees non-identical, measured 3 scans),
    # and cache materialization is its own query execution, so exchange
    # reuse cannot replace the persist. The cached relation is the
    # dedup-compressed corpus — (id, bigram, count), hash(_bg)
    # partitioned, MEMORY_AND_DISK — the materialized intermediate a
    # production pipeline would keep (or write) between the train and
    # score halves of the stage. The persist is REGISTERED with the
    # session cache registry: a CacheManager entry is never GC-released,
    # so the materialization point (runner epilogue, bench, tests) calls
    # session.release_operator_caches() once the scored result is
    # materialized — round 3 measured +23% on unrelated queries while
    # this relation squatted in executor memory.
    from etl_load_spark.session import register_operator_cache
    docbg = register_operator_cache(
        bigram_relation(df, id_col, text_col)
        .repartition("_bg")
        .groupBy("_id", "_bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_k"))
        .persist())
    c12 = docbg.groupBy("_bg").agg(F.sum("_k").cast("bigint").alias("_c12"))
    w1 = F.split_part(F.col("_bg"), F.lit(" "), F.lit(1))
    c1 = (c12.groupBy(w1.alias("_w1"))
          .agg(F.sum("_c12").cast("bigint").alias("_c1")))
    v = c1.agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    scored = (c12.select("_bg", "_c12", w1.alias("_w1"))
              .join(c1, "_w1")
              .crossJoin(F.broadcast(v))
              .select("_bg",
                      (floor_log2(F.col("_c1") + F.col("_v"))
                       - floor_log2(F.col("_c12"))).alias("_s")))
    return (docbg.join(scored, "_bg")
            .groupBy(F.col("_id").alias(id_col))
            .agg(F.sum("_k").cast("bigint").alias("n_bigrams"),
                 F.sum(F.col("_k") * F.col("_s")).cast("bigint")
                 .alias("total_bits"))
            .select(id_col, "n_bigrams", "total_bits",
                    (F.col("total_bits").cast("double")
                     / F.col("n_bigrams").cast("double"))
                    .alias("bits_per_bigram")))


def bigram_surprisal_sql(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """The ENTIRE ``bigram_surprisal`` pipeline as one DuckDB oracle
    statement (normalize → bigram → MLE counts → integer floor-log2
    surprisal → per-doc reduction). Generated from the same constants, so
    the oracle checks algorithm equality, not an approximation."""
    norm = normalize_text_sql(text_col, "duckdb")
    fl2 = floor_log2_sql
    return f"""
WITH tok AS (
  SELECT {id_col} AS _id, string_split({norm}, ' ') AS ws FROM {table}),
occ AS (
  SELECT _id, unnest([ws[i] || ' ' || ws[i + 1]
         for i in generate_series(1, len(ws) - 1)]) AS bg
  FROM tok WHERE len(ws) >= 2),
c12 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM occ GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c12) AS BIGINT) AS c1
       FROM c12 GROUP BY 1),
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
scored AS (SELECT bg, {fl2('c1.c1 + v.v')} - {fl2('c12.c12')} AS s
           FROM c12 JOIN c1 ON split_part(c12.bg, ' ', 1) = c1.w1
           CROSS JOIN v),
agg AS (SELECT _id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(s) AS BIGINT) AS total_bits
        FROM occ JOIN scored USING (bg) GROUP BY _id)
SELECT _id AS {id_col}, n_bigrams, total_bits,
       CAST(total_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS bits_per_bigram
FROM agg ORDER BY {id_col}
"""


def bigram_model(df, id_col: str, text_col: str):
    """Train the FROZEN bigram-LM artifact the production pipeline stores
    between its train and score halves (the q146 docstring's promised
    external-table mode): (bg, s, w1, unseen_s, v_bits) — per-bigram
    quantized surprisal, per-context unseen charge fl2(c1 + V) (the
    Laplace c12=1 mass), and the whole-vocabulary-unseen charge fl2(V)
    replicated per row (a scalar a consumer reads with first()).

    Scale: identical plan to the train half of ``bigram_surprisal`` —
    one corpus pass, one token-level shuffle; the artifact is
    vocab-sized, persistable as a plain table, and broadcastable to the
    scoring side."""
    from etl_load_spark.session import register_operator_cache
    docbg = register_operator_cache(
        bigram_relation(df, id_col, text_col)
        .repartition("_bg")
        .groupBy("_id", "_bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_k"))
        .persist())
    c12 = docbg.groupBy("_bg").agg(F.sum("_k").cast("bigint").alias("_c12"))
    w1 = F.split_part(F.col("_bg"), F.lit(" "), F.lit(1))
    c1 = (c12.groupBy(w1.alias("_w1"))
          .agg(F.sum("_c12").cast("bigint").alias("_c1")))
    v = c1.agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    return (c12.select("_bg", w1.alias("w1"), "_c12")
            .join(c1, F.col("w1") == F.col("_w1"))
            .crossJoin(F.broadcast(v))
            .select(F.col("_bg").alias("bg"),
                    (floor_log2(F.col("_c1") + F.col("_v"))
                     - floor_log2(F.col("_c12"))).alias("s"),
                    "w1",
                    floor_log2(F.col("_c1") + F.col("_v"))
                    .alias("unseen_s"),
                    floor_log2(F.col("_v")).alias("v_bits")))


def score_with_bigram_model(df, model, id_col: str, text_col: str):
    """Score documents against a FROZEN bigram model (trained elsewhere,
    possibly on a different corpus/epoch): seen bigrams charge the
    model's s, unseen bigrams under a KNOWN context charge the
    context's fl2(c1 + V), fully-unknown contexts charge fl2(V) — the
    standard back-off for out-of-vocabulary events, matching
    ``bigram_surprisal`` bit-for-bit when the model was trained on the
    same corpus (self-scoring is total, so the fallbacks never fire —
    pinned in tests). Returns (id, n_bigrams, total_bits,
    bits_per_bigram).

    Scale: the scoring side is ONE pass over the stream of documents —
    explode, two LEFT joins against the vocab-sized artifact (broadcast
    when it fits), one per-doc reduction. Deployment on a live stream:
    run this operator inside foreachBatch (per-doc aggregation over an
    unbounded keyless stream has no append-mode watermark), or land the
    stream and score downstream — the LM_SURPRISAL streaming refusal
    names this recipe."""
    occ = bigram_relation(df, id_col, text_col)
    w1 = F.split_part(F.col("_bg"), F.lit(" "), F.lit(1))
    ctx = model.select(F.col("w1").alias("_w1"), "unseen_s").distinct()
    vb = model.select(F.col("v_bits")).limit(1)
    scored = (occ.withColumn("_w1", w1)
              .join(F.broadcast(model.select("bg", "s")),
                    occ["_bg"] == F.col("bg"), "left")
              .join(F.broadcast(ctx), "_w1", "left")
              .crossJoin(F.broadcast(vb))
              .select("_id", F.coalesce("s", "unseen_s", "v_bits")
                      .alias("_s")))
    return (scored.groupBy(F.col("_id").alias(id_col))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 F.sum("_s").cast("bigint").alias("total_bits"))
            .select(id_col, "n_bigrams", "total_bits",
                    (F.col("total_bits").cast("double")
                     / F.col("n_bigrams").cast("double"))
                    .alias("bits_per_bigram")))


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-curation key hygiene)
# ---------------------------------------------------------------------------

#: query parameters that never change page identity (tracking/attribution);
#: shared verbatim between the Spark and oracle forms.
TRACKING_PARAM_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=")

_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the key-hygiene step
    before any URL-level dedup or domain aggregation over a crawl (the
    same content is crawled under case-varied hosts, default ports,
    tracking parameters, fragments and trailing slashes; without
    canonicalization every URL-keyed operator undercounts duplicates).

    Rules (all pure JVM regex/array expressions, RE2-safe so the oracle
    replays them verbatim): lowercase scheme and host; strip a leading
    ``www.``; strip the scheme's default port (:80 http, :443 https);
    collapse trailing slashes (root stays ``/``, empty path becomes
    ``/``); drop tracking parameters (``TRACKING_PARAM_PREFIXES``) and
    empty params, sort the survivors bytewise; drop the fragment.

    Scale: a pure projection — fuses into the scan, streams, and costs
    a handful of regex evaluations per row. Input contract: absolute
    URLs with a scheme; rows that don't match produce empty host/path
    parts rather than erroring (filter upstream if needed)."""
    scheme = F.lower(F.regexp_extract(url, _URL_SCHEME_RE, 1))
    hp = F.lower(F.regexp_extract(url, _URL_HOST_RE, 1))
    hp = (F.when(scheme == "http", F.regexp_replace(hp, r":80$", ""))
          .when(scheme == "https", F.regexp_replace(hp, r":443$", ""))
          .otherwise(hp))
    host = F.regexp_replace(hp, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(url, _URL_PATH_RE, 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    def _keep_param(x):
        # derived from TRACKING_PARAM_PREFIXES so the Spark and oracle
        # filters cannot silently diverge when the tuple is edited
        cond = x != ""
        for p in TRACKING_PARAM_PREFIXES:
            cond = cond & ~x.startswith(p)
        return cond

    params = F.filter(
        F.split(F.regexp_extract(url, _URL_QUERY_RE, 1), "&"), _keep_param)
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(scheme, F.lit("://"), host, path,
                    F.when(qs == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), qs)))


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of ``canonicalize_url`` for a URL expression — same
    regexes verbatim, list_filter/list_sort for the parameter set. Every
    regexp_extract is COALESCEd to '': DuckDB yields NULL on no match
    where Spark yields '' (a URL without a query string would otherwise
    NULL the whole concatenation)."""
    scheme = (f"lower(coalesce(regexp_extract({expr}, "
              f"'{_URL_SCHEME_RE}', 1), ''))")
    hp = (f"lower(coalesce(regexp_extract({expr}, "
          f"'{_URL_HOST_RE}', 1), ''))")
    hp2 = (f"CASE WHEN {scheme} = 'http' "
           f"THEN regexp_replace({hp}, ':80$', '') "
           f"WHEN {scheme} = 'https' "
           f"THEN regexp_replace({hp}, ':443$', '') ELSE {hp} END")
    host = f"regexp_replace({hp2}, '^www\\.', '')"
    path0 = (f"regexp_replace(coalesce(regexp_extract({expr}, "
             f"'{_URL_PATH_RE}', 1), ''), '/+$', '')")
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    flt = " AND NOT ".join(
        ["x <> ''"] + [f"starts_with(x, '{p}')"
                       for p in TRACKING_PARAM_PREFIXES])
    # outer coalesce: DuckDB's array_to_string of an EMPTY list is NULL
    # where Spark's array_join is ''
    qs = (f"coalesce(array_to_string(list_sort(list_filter(string_split("
          f"coalesce(regexp_extract({expr}, '\\?([^#]*)', 1), ''), '&'), "
          f"x -> {flt})), '&'), '')")
    return (f"({scheme} || '://' || {host} || {path} || "
            f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)")


def registered_domain(host_or_url: Column, from_url: bool = False) -> Column:
    """Last-two-labels approximation of the registered domain (a full
    public-suffix list is a broadcast lookup in production; the
    aggregation shape is identical)."""
    h = (F.lower(F.regexp_extract(host_or_url, _URL_HOST_RE, 1))
         if from_url else host_or_url)
    h = F.regexp_replace(h, r":[0-9]+$", "")
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def registered_domain_sql(url_expr: str) -> str:
    h = (f"regexp_replace(lower(coalesce(regexp_extract({url_expr}, "
         f"'{_URL_HOST_RE}', 1), '')), ':[0-9]+$', '')")
    return f"coalesce(regexp_extract({h}, '([^.]+\\.[^.]+)$', 1), '')"


# ---------------------------------------------------------------------------
# Markup stripping / boilerplate stats (crawl-text hygiene)
# ---------------------------------------------------------------------------

#: regexes shared verbatim between the Spark and oracle forms. RE2-safe:
#: no backreferences (script and style are separate passes — RE2 cannot
#: express <(script|style)>.*?</\1>), lazy quantifiers + (?is) flags only.
_MD_COMMENT_RE = r"(?s)<!--.*?-->"
_MD_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_MD_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_MD_TAG_RE = r"<[^>]*>"
_MD_LINK_TEXT_RE = r"(?is)<a[^>]*>(.*?)</a>"

#: HTML entity unescapes applied after tag removal, in THIS order
#: (&amp; last so '&amp;lt;' decodes to the literal '&lt;', not '<').
MARKUP_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                   ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def strip_markup(col: Column) -> Column:
    """Plain text of an HTML-ish payload — the markup-hygiene step before
    any text-quality scoring of crawled pages: comments, script/style
    BLOCKS (content dropped — code is not prose), then every remaining
    tag (content kept), basic entity unescapes, whitespace collapse.
    Deliberately a hygiene pass, not a browser: malformed markup
    degrades to extra text, never an error. Pure map-side regex —
    fuses into the scan, streams."""
    c = F.regexp_replace(col, _MD_COMMENT_RE, " ")
    c = F.regexp_replace(c, _MD_SCRIPT_RE, " ")
    c = F.regexp_replace(c, _MD_STYLE_RE, " ")
    c = F.regexp_replace(c, _MD_TAG_RE, " ")
    for ent, rep in MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_markup_sql(expr: str) -> str:
    """DuckDB twin of ``strip_markup`` — same regexes verbatim ('g' flag:
    DuckDB replaces first-match-only by default where Spark replaces
    all)."""
    c = f"regexp_replace({expr}, '{_MD_COMMENT_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_MD_SCRIPT_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_MD_STYLE_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_MD_TAG_RE}', ' ', 'g')"
    for ent, rep in MARKUP_ENTITIES:
        rep_sql = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def markup_stats(col: Column) -> "list[Column]":
    """Boilerplate signals of an HTML-ish payload: tag count, link count,
    and the total character length of link anchor texts (link density =
    link_chars / clean text length is the classic boilerplate
    discriminator — nav/footer blocks are nearly all links). The
    per-link length fold is a HOF over the per-document link array
    (bounded by links-per-doc, not corpus size)."""
    links = F.regexp_extract_all(col, F.lit(_MD_LINK_TEXT_RE), F.lit(1))
    return [
        F.size(F.regexp_extract_all(col, F.lit(_MD_TAG_RE), F.lit(0)))
        .cast("bigint").alias("n_tags"),
        F.size(links).cast("bigint").alias("n_links"),
        F.aggregate(links, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.length(x)).alias("link_chars"),
    ]


def markup_stats_sql(expr: str) -> "dict[str, str]":
    """DuckDB twins of ``markup_stats`` (same regexes verbatim)."""
    links = f"regexp_extract_all({expr}, '{_MD_LINK_TEXT_RE}', 1)"
    return {
        "n_tags": (f"CAST(len(regexp_extract_all({expr}, "
                   f"'{_MD_TAG_RE}', 0)) AS BIGINT)"),
        "n_links": f"CAST(len({links}) AS BIGINT)",
        # the inner coalesce covers DuckDB's list_sum([]) = NULL (Spark's
        # aggregate over [] is the 0 initializer); the CASE keeps NULL
        # input NULL (coalesce alone would turn it into 0)
        "link_chars": (f"(CASE WHEN {expr} IS NULL THEN NULL ELSE "
                       f"CAST(coalesce(list_sum(list_transform({links}, "
                       f"x -> length(x))), 0) AS BIGINT) END)"),
    }
