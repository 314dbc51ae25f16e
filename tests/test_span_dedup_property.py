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
