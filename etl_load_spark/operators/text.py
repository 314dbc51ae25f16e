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
