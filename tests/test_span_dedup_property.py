"""Property test: span_dedup exactly matches a sequential reference fold.

The Spark operator is distributed (span-keyed shuffles, int64-encoded
first-occurrence min, anti-join coverage); the reference below is the
obvious single-threaded algorithm over the same definition. Agreement on
randomized corpora with forced repeats pins the distributed formulation
— ordering, tie-breaking, window slicing at document tails, overlap
coverage — against the simple spec, complementing the DuckDB oracle
(which shares SQL semantics but not this independent formulation).
"""

from hypothesis import given, settings, strategies as st

from etl_load_spark.operators.corpus import span_dedup

K = 4  # span_tokens — small so short random docs exercise repeats

_word = st.sampled_from(["a", "b", "c", "dd", "e5"])
_doc = st.lists(_word, min_size=1, max_size=14)


def _reference(docs: list[list[str]], k: int):
    """Sequential spec: windows at every start 0..max(n-k, 0); an
    occurrence list per span string in (doc, pos) order; every non-first
    occurrence covers its k positions; rebuild from uncovered tokens."""
    occ = {}
    for d, toks in enumerate(docs):
        n = len(toks)
        for p in range(0, max(n - k, 0) + 1):
            s = " ".join(toks[p:p + k])
            occ.setdefault(s, []).append((d, p))
    covered = {d: set() for d in range(len(docs))}
    for s, sites in occ.items():
        if len(sites) < 2:
            continue
        first = min(sites)
        for (d, p) in sites:
            if (d, p) != first:
                covered[d].update(range(p, p + k))
    out = {}
    for d, toks in enumerate(docs):
        kept = [t for i, t in enumerate(toks) if i not in covered[d]]
        out[d] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=6))
def test_span_dedup_matches_sequential_fold(spark, docs):
    import hashlib
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cleaned_md5"])
           for r in span_dedup(df, span_tokens=K).collect()}
    # the operator splits on single spaces exactly like the join above
    want = {d: (n, cut, hashlib.md5(cleaned.encode()).hexdigest())
            for d, (n, cut, cleaned) in _reference(docs, K).items()}
    assert got == want


def test_span_dedup_position_guard_raises(spark):
    """A token position at or beyond the encoding factor must FAIL LOUDLY
    (ADVICE r3: the doc_id·10⁶+pos min silently mis-orders past 10⁶) —
    exercised with a temporarily narrowed limit so the test corpus stays
    tiny."""
    import pytest
    from etl_load_spark.operators import corpus as C

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(40))),
         (2, " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, text string")
    old = C._SPAN_POS_LIMIT
    C._SPAN_POS_LIMIT = 16          # positions reach 40 - K > 16
    try:
        with pytest.raises(Exception, match="span_dedup: token position"):
            span_dedup(df, span_tokens=K).collect()
    finally:
        C._SPAN_POS_LIMIT = old
    # under the real limit the same corpus dedups fine
    assert span_dedup(df, span_tokens=K).count() == 2


def test_span_dedup_stop_span_cap(spark):
    """stop_span_df: spans at or above the occurrence cap are structural
    boilerplate and are NOT cut; everything below the cap keeps exact
    all-but-first semantics."""
    # "x x x x" boilerplate appears in every doc; "p q r s" repeats twice
    boiler = "x0 x1 x2 x3"
    rows = [(i, f"{boiler} u{i} v{i}") for i in range(6)]
    rows += [(100, "p q r s end0"), (101, "p q r s end1")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r["doc_id"]: r["n_cut"]
             for r in span_dedup(df, span_tokens=K).collect()}
    capped = {r["doc_id"]: r["n_cut"]
              for r in span_dedup(df, span_tokens=K,
                                  stop_span_df=5).collect()}
    # exact: every non-first boilerplate occurrence is cut
    assert exact[0] == 0 and all(exact[i] > 0 for i in range(1, 6))
    # capped: the 6-occurrence boilerplate span is exempt...
    assert all(capped[i] == 0 for i in range(6))
    # ...but the 2-occurrence repeat is still cut in both modes
    assert capped[100] == 0 and capped[101] == exact[101] > 0
