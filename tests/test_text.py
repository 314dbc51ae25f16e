"""PII detection/redaction unit behavior (q138's operator): per-class
counts, class-tag redaction, pattern non-interference, NULL propagation."""

from pyspark.sql import functions as F

from etl_load_spark.operators.text import pii_counts, pii_redact


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    cnts = pii_counts(F.col("t"))
    row = df.select(*[c.alias(f"n_{k}") for k, c in cnts.items()],
                    pii_redact(F.col("t")).alias("red")).collect()[0]
    return row


def test_pii_counts_and_redaction(spark):
    r = _one(spark, "mail a.b+c@ex-site.org, ip 192.168.0.1, "
                    "ssn 123-45-6789, call 555-123-4567 or 555.123.4567")
    assert (r.n_email, r.n_ipv4, r.n_ssn, r.n_phone) == (1, 1, 1, 2)
    assert r.red == ("mail [EMAIL], ip [IPV4], ssn [SSN], "
                     "call [PHONE] or [PHONE]")


def test_pii_classes_do_not_interfere(spark):
    """The numeric classes are shape-disjoint: an SSN never counts as a
    phone (3-2-4 vs 3-3-4), a dotted phone never as an IP (2 vs 3 dots),
    and a digit-bearing email local part is consumed by the email pass
    before any numeric class sees it."""
    r = _one(spark, "ssn only 123-45-6789")
    assert (r.n_ssn, r.n_phone, r.n_ipv4) == (1, 0, 0)
    r = _one(spark, "dotted phone 555.123.4567")
    assert (r.n_phone, r.n_ipv4) == (1, 0)
    r = _one(spark, "user123-45-6789@x.io")
    assert r.n_email == 1 and r.red == "[EMAIL]"


def test_pii_clean_text_untouched(spark):
    r = _one(spark, "no pii here, just sections 1.2 and 3-4")
    assert (r.n_email, r.n_ipv4, r.n_ssn, r.n_phone) == (0, 0, 0, 0)
    assert r.red == "no pii here, just sections 1.2 and 3-4"


def test_pii_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "t string")
    row = df.select(pii_redact(F.col("t")).alias("red")).collect()[0]
    assert row.red is None


# ---------------------------------------------------------------------------
# Bigram-LM surprisal (q146's operator)
# ---------------------------------------------------------------------------

def _surprisal(spark, rows):
    from etl_load_spark.operators.text import bigram_surprisal
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in bigram_surprisal(df, "doc_id", "text").collect()}


def test_bigram_surprisal_hand_computed(spark):
    """c12('the cat')=2, c12('cat sat')=c12('cat ran')=1;
    c1('the')=c1('cat')=2; V = |{the, cat}| = 2 — so
    s('the cat') = flog2(2+2) - flog2(2) = 1 and
    s('cat sat') = s('cat ran') = flog2(2+2) - flog2(1) = 2."""
    out = _surprisal(spark, [(1, "the cat sat"), (2, "the cat ran")])
    assert out[1].n_bigrams == 2 and out[1].total_bits == 3
    assert out[2].n_bigrams == 2 and out[2].total_bits == 3
    assert out[1].bits_per_bigram == 1.5


def test_bigram_surprisal_degenerates_excluded(spark):
    """<2-token docs (NULL / empty / punctuation-only / one-token) carry
    no bigram events and are absent — same rule both engines."""
    out = _surprisal(spark, [(1, "the cat sat"), (2, "the cat sat"),
                             (3, None), (4, ""), (5, "?!"), (6, "word")])
    assert set(out) == {1, 2}


def test_bigram_surprisal_ranks_noise_above_repetition(spark):
    """The CCNet ordering property: repetitive/boilerplate text scores
    fewer bits per bigram than text of unique word transitions."""
    rep = "spam ham " * 40                  # one dominant transition
    uniq = " ".join(f"w{i}" for i in range(80))  # every transition unique
    out = _surprisal(spark, [(1, rep), (2, uniq), (3, "spam ham filler"),
                             (4, " ".join(f"v{i}" for i in range(80)))])
    assert out[1].bits_per_bigram < out[2].bits_per_bigram


def test_importance_weights_fast_hasher_same_structure(spark):
    """hasher='fast' (xxhash64 buckets, the 100 TB setting) must agree
    with the portable form on everything except the arbitrary bucket
    choice: same rows, same n_feats per doc (bucketing never changes
    feature counts), finite scores; bad hasher names raise."""
    import pytest
    from etl_load_spark.operators.corpus import importance_weights
    rows = [(i, "alpha beta gamma " + " ".join(f"w{i}x{j}" for j in range(5)))
            for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = d.filter("doc_id < 5")
    a = {r.doc_id: r for r in importance_weights(d, tgt).collect()}
    b = {r.doc_id: r for r in
         importance_weights(d, tgt, hasher="fast").collect()}
    assert set(a) == set(b) == set(range(20))
    assert all(a[i].n_feats == b[i].n_feats for i in a)
    assert all(b[i].total_bits is not None for i in b)
    with pytest.raises(ValueError, match="hasher"):
        importance_weights(d, tgt, hasher="md5")
    from etl_load_spark.session import release_operator_caches
    release_operator_caches()  # operator-cache hygiene contract


def test_canonicalize_url_idempotent_and_oracle_parity(spark):
    """Property sweep over composed URLs: canonicalization is IDEMPOTENT
    (a canonical URL re-canonicalizes to itself — the key-hygiene
    requirement for repeated pipeline runs) and bit-identical to the
    DuckDB twin on every generated case."""
    import duckdb
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F
    from etl_load_spark.operators.text import (canonicalize_url,
                                               canonicalize_url_sql)

    schemes = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
    hosts = st.sampled_from(["example.com", "WWW.Example.COM", "sub.a.org",
                             "www.x.io:443", "x.io:80", "h.net:8080"])
    paths = st.sampled_from(["", "/", "/a", "/a/", "/a//b///", "/A/b.c"])
    params = st.lists(st.sampled_from(
        ["utm_source=x", "utm_medium=mail", "ref=home", "fbclid=1",
         "gclid=2", "b=1", "a=2", "z=", "q=hello", ""]), max_size=5)
    frags = st.sampled_from(["", "#frag", "#a/b?c=1"])

    @settings(max_examples=20, deadline=None)
    @given(schemes, hosts, paths, params, frags)
    def check(sch, host, path, ps, frag):
        url = f"{sch}://{host}{path}"
        if ps:
            url += "?" + "&".join(ps)
        url += frag
        df = spark.createDataFrame([(url,)], "u string")
        row = df.select(
            canonicalize_url(F.col("u")).alias("c1"),
            canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
        ).collect()[0]
        assert row.c1 == row.c2, f"not idempotent: {url!r} -> {row.c1!r} -> {row.c2!r}"
        con = duckdb.connect()
        # literal, not a prepared param: the fragment references the
        # expression many times and each ? would count separately
        lit = "'" + url.replace("'", "''") + "'"
        want = con.sql("SELECT " + canonicalize_url_sql(lit)).fetchone()[0]
        assert row.c1 == want, f"{url!r}: spark {row.c1!r} duck {want!r}"

    check()


def test_frozen_bigram_model_scoring(spark):
    """The frozen-model split (train offline, score elsewhere): scoring
    the TRAINING corpus against its own frozen model matches
    bigram_surprisal bit-for-bit (self-scoring is total — the fallbacks
    never fire); scoring a DIFFERENT corpus charges unseen bigrams the
    context's fl2(c1+V) and fully-unknown contexts fl2(V)."""
    from etl_load_spark.operators.text import (bigram_model,
                                               bigram_surprisal,
                                               score_with_bigram_model)
    from etl_load_spark.session import release_operator_caches
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string")
    model = bigram_model(train, "doc_id", "text").cache()
    model.count()
    # self-scoring == bigram_surprisal
    a = sorted(map(tuple, score_with_bigram_model(
        train, model, "doc_id", "text").collect()))
    b = sorted(map(tuple, bigram_surprisal(
        train, "doc_id", "text").collect()))
    assert a == b
    # cross-scoring: "the cat" seen (s=1); "cat flew" unseen under known
    # context 'cat' (c1=2, V=2 -> fl2(4)=2); "zz qq" fully unknown
    # context (fl2(V)=fl2(2)=1)
    new = spark.createDataFrame(
        [(10, "the cat flew"), (11, "zz qq")], "doc_id long, text string")
    got = {r.doc_id: r for r in score_with_bigram_model(
        new, model, "doc_id", "text").collect()}
    assert got[10].n_bigrams == 2 and got[10].total_bits == 1 + 2
    assert got[11].n_bigrams == 1 and got[11].total_bits == 1
    model.unpersist()
    release_operator_caches()
