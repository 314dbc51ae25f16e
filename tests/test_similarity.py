"""Similarity-search quality: brute-force exactness vs numpy, LSH recall vs
the exact baseline, band-join equivalence."""

import math

import pytest
from pyspark.sql import functions as F

from etl_load_spark.operators.similarity import (
    cosine_topk, embedding_near_dup_pairs, lsh_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(80):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(16)]))
    # planted near-duplicate of vector 0 (tiny perturbation)
    base = rows[0][1]
    rows.append((900, [x + 0.001 for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_topk(rows, q_id, k):
    qv = next(v for i, v in rows if i == q_id)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    scored = sorted(((round(cos(qv, v), 6), i) for i, v in rows if i != q_id),
                    key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_bruteforce_matches_reference(spark, vectors):
    rows = [(r.vec_id, [float(x) for x in r.embedding])
            for r in vectors.collect()]
    out = cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=5)
    got = [r.n_id for r in out.collect()]
    assert got == _np_topk(rows, 0, 5)
    assert got[0] == 900  # the planted near-duplicate ranks first


def test_lsh_recall_vs_exact(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id)
             for r in cosine_topk(vectors, queries, k=3).collect()}
    approx = {(r.q_id, r.n_id)
              for r in lsh_topk(vectors, queries, k=3, dim=16,
                                n_planes=16, bands=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_embedding_near_dup_finds_planted(spark, vectors):
    pairs = {(r.id_a, r.id_b)
             for r in embedding_near_dup_pairs(vectors, threshold=0.99,
                                               dim=16).collect()}
    assert (0, 900) in pairs


def test_ivf_recall_vs_exact(spark, vectors):
    from etl_load_spark.operators.similarity import ivf_topk
    queries = vectors.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id)
             for r in cosine_topk(vectors, queries, k=3).collect()}
    approx = {(r.q_id, r.n_id)
              for r in ivf_topk(vectors, queries, k=3,
                                n_cells=4, n_probe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_full_probe_is_exact(spark, vectors):
    """n_probe = n_cells degrades to exact brute force."""
    from etl_load_spark.operators.similarity import ivf_topk
    queries = vectors.filter(F.col("vec_id") < 5)
    exact = [(r.q_id, r.n_id, r.cosine_sim)
             for r in cosine_topk(vectors, queries, k=3).collect()]
    full = [(r.q_id, r.n_id, r.cosine_sim)
            for r in ivf_topk(vectors, queries, k=3,
                              n_cells=4, n_probe=4).collect()]
    assert exact == full


def test_degenerate_vectors_never_match(spark):
    """Zero-norm and NaN-poisoned vectors must yield no similarity results
    (NULL sim, filtered) instead of failing the job under ANSI
    divide-by-zero or ranking first via NaN's sorts-greatest semantics."""
    from pyspark.sql import functions as F
    from etl_load_spark.operators.similarity import (
        cosine_topk, embedding_near_dup_pairs, ivf_topk, lsh_topk)
    rows = [(1, [0.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),
            (4, [float("nan"), 1.0, 0.0, 0.0]),
            (5, [0.0, 1.0, 0.0, 0.0])]
    vec = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = vec.filter(F.col("vec_id").isin(1, 2, 4))
    out = cosine_topk(vec, q, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r.n_id)
    assert 1 not in by_q and 4 not in by_q      # degenerate queries: no rows
    assert by_q[2][0] == 3                       # exact dup still ranks first
    assert all(n not in (1, 4) for n in by_q[2])  # degenerate neighbors gone
    pairs = sorted((r.id_a, r.id_b) for r in
                   embedding_near_dup_pairs(vec, threshold=0.9, dim=4).collect())
    assert pairs == [(2, 3)]
    lsh = lsh_topk(vec, q, k=4, dim=4).collect()
    assert all(r.q_id not in (1, 4) and r.n_id not in (1, 4) for r in lsh)
    ivf = ivf_topk(vec, q, k=4, n_cells=2, n_probe=2).collect()
    assert all(r.q_id not in (1, 4) and r.n_id not in (1, 4) for r in ivf)


def test_pq_recall_vs_exact(spark, vectors):
    """PQ/ADC with exact re-rank must recover most of the exact top-10
    (8 subspaces × 16 codes on 64-dim unit vectors, pool 4k)."""
    from etl_load_spark.operators.similarity import cosine_topk, pq_topk
    q = vectors.filter("vec_id < 5")
    exact = {(r.q_id, r.n_id)
             for r in cosine_topk(vectors, q, k=10).collect()}
    approx = {(r.q_id, r.n_id)
              for r in pq_topk(vectors, q, k=10, m=8, n_codes=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"PQ recall too low: {recall}"


def test_pq_deterministic_across_runs(spark, vectors):
    from etl_load_spark.operators.similarity import pq_topk
    q = vectors.filter("vec_id < 3")
    a = sorted(map(tuple, pq_topk(vectors, q, k=5).collect()))
    b = sorted(map(tuple, pq_topk(vectors, q, k=5,
                                  ).collect()))
    assert a == b and len(a) > 0


def test_semantic_dedup_degenerate_dup_and_string_ids(spark):
    """Review regressions pinned: NULL embeddings are ignored (not a
    crash), duplicated id values never emit self-pairs, and the output id
    columns keep the caller's id type (string keys)."""
    from etl_load_spark.operators.similarity import semantic_dedup
    rows = [("a", [1.0, 0.0, 0.0, 0.0]),
            ("a", [1.0, 0.0, 0.0, 0.0]),      # duplicate id value
            ("b", [2.0, 0.0, 0.0, 0.0]),      # same direction as "a"
            ("z", None),                       # NULL embedding
            ("n", [0.0, 0.0, 0.0, 0.0]),      # zero norm
            ("c", [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = semantic_dedup(df, threshold=0.95, n_cells=2)
    assert dict(out.dtypes)["id_a"] == "string"
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert ("a", "b") in pairs
    assert all(a != b for a, b in pairs)       # no self-pairs
    assert all("z" not in p and "n" not in p for p in pairs)


def test_semantic_dedup_salted_cell_cap_exact(spark):
    """Pathological k-means skew (~90% of the corpus in one cell) must not
    unbound per-task memory: with max_cell_rows small, the oversized cell
    is triangle-salt-blocked — every group holds O(max_cell_rows) rows —
    and the pair set is IDENTICAL to the unsalted gram (every pair is
    computed exactly once: diagonal groups do the within-salt triangle,
    off-diagonal groups only the cross block)."""
    import random
    from etl_load_spark.operators.similarity import semantic_dedup
    rnd = random.Random(11)
    rows = []
    for i in range(180):  # one tight cluster → one giant cell
        rows.append((i, [1.0] + [0.02 * rnd.uniform(-1, 1) for _ in range(7)]))
    for i in range(180, 200):  # scattered remainder
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    unsalted = sorted(map(tuple, semantic_dedup(
        df, threshold=0.97, n_cells=4, seed=5).collect()))
    salted = sorted(map(tuple, semantic_dedup(
        df, threshold=0.97, n_cells=4, seed=5, max_cell_rows=16).collect()))
    assert len(unsalted) > 50          # the skewed cell really pairs up
    assert salted == unsalted


def test_fit_centroids_degenerate_inputs(spark):
    """ADVICE r2: empty / all-NULL samples built a 1-D (0,) array that
    raised AxisError inside fit_centroids, and ragged vectors an object
    array that broke the matmul. Degenerate corpora must fail soft
    (empty model → empty result), ragged input must fail loud."""
    import pytest as _pytest
    from etl_load_spark.operators.similarity import (
        fit_centroids, ivf_topk, semantic_dedup)
    schema = "vec_id long, embedding array<float>"
    empty = spark.createDataFrame([], schema)
    assert fit_centroids(empty) == []
    allnull = spark.createDataFrame([(1, None), (2, None)], schema)
    assert fit_centroids(allnull) == []
    assert semantic_dedup(allnull).count() == 0
    assert ivf_topk(allnull, allnull, k=1).count() == 0
    ragged = spark.createDataFrame([(1, [1.0, 2.0]), (2, [1.0])], schema)
    with _pytest.raises(ValueError, match="ragged"):
        fit_centroids(ragged)


def test_pq_degenerate_inputs(spark, vectors):
    """PQ twins of the IVF degenerate guards: all-NULL corpus → empty
    result (no AxisError in codebook training); NULL query vectors are
    skipped, not np.stack-crashed."""
    from etl_load_spark.operators.similarity import pq_topk
    schema = "vec_id long, embedding array<float>"
    allnull = spark.createDataFrame([(1, None), (2, None)], schema)
    assert pq_topk(allnull, allnull, k=1).count() == 0
    nullq = spark.createDataFrame([(500, None)], schema)
    assert pq_topk(vectors, nullq, k=1).count() == 0
    mixed = spark.createDataFrame([(500, None)], schema).unionByName(
        vectors.filter("vec_id = 0"))
    out = pq_topk(vectors, mixed, k=1).collect()
    assert [r.q_id for r in out] == [0]      # real query answered, NULL skipped


def test_hard_negatives_semantics(spark):
    """Mining contract on a constructed corpus: same-label rows never
    appear as negatives, near-identical cross-label rows are excluded by
    the dup ceiling, margins use the anchor's best same-label sim, and
    an anchor without a same-label peer gets NULL pos_sim/margin."""
    from etl_load_spark.operators.similarity import hard_negatives
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "a"),    # anchor
        (1, [1.0, 0.0, 0.0, 0.0], "b"),    # cross-label exact dup → excluded
        (2, [0.9, 0.1, 0.0, 0.0], "b"),    # the real hard negative
        (3, [0.8, 0.2, 0.0, 0.0], "a"),    # positive (same label)
        (4, [0.0, 1.0, 0.0, 0.0], "b"),    # easy negative
        (10, [0.0, 0.0, 1.0, 0.0], "c"),   # anchor with no same-label peer
        (11, [0.0, 0.0, 0.9, 0.3], "b"),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>,"
                              " label string")
    out = hard_negatives(e, e.filter("vec_id IN (0, 10)"), k=3)
    got = {(r.q_id, r.rank): r for r in out.collect()}
    # anchor 0: rank 1 must be vec 2 (vec 1 is dup-ceiling'd out,
    # vec 3 is same-label)
    assert got[(0, 1)].n_id == 2
    assert all(got[k].n_id != 3 for k in got if k[0] == 0)
    assert all(got[k].n_id != 1 for k in got if k[0] == 0)
    # margin against the label-a positive (vec 3)
    import math
    pos = got[(0, 1)].pos_sim
    assert math.isclose(pos, 0.8 / math.sqrt(0.68), rel_tol=1e-5)
    assert math.isclose(got[(0, 1)].margin, pos - got[(0, 1)].cosine_sim,
                        rel_tol=1e-9)
    # anchor 10 has no same-label peer: NULL pos_sim/margin, negatives
    # still mined
    assert got[(10, 1)].pos_sim is None and got[(10, 1)].margin is None
    assert got[(10, 1)].n_id == 11


def test_cosine_batch_matches_fold_on_adversarial_inputs(spark):
    """cosine_batch (the r13 Arrow kernel behind ivf_topk/hard_negatives
    scoring) is bit-identical to the cosine() expression fold — including
    every degenerate class: NULL array, ragged pair (zip_with NULL
    padding), empty array, NULL element, NaN element, ±inf element and
    zero-norm. NULL results must agree row for row, and defined results
    must agree to the last ulp (no rounding applied here on purpose)."""
    from etl_load_spark.operators.similarity import cosine, cosine_batch
    rows = [
        (0, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (1, None, [1.0, 0.0]),                       # NULL array
        (2, [1.0, 2.0], None),
        (3, [1.0, 2.0, 3.0], [1.0, 2.0]),            # ragged pair
        (4, [], []),                                  # empty arrays
        (5, [1.0, None, 3.0], [1.0, 2.0, 3.0]),       # NULL element
        (6, [1.0, float("nan")], [1.0, 2.0]),         # NaN element
        (7, [1.0, float("inf")], [1.0, 2.0]),         # inf element
        (8, [0.0, 0.0], [1.0, 2.0]),                  # zero-norm side
        (9, [0.0, 0.0], [0.0, 0.0]),                  # both zero-norm
        (10, [1e-200, 1e-200], [1e-200, 1e-200]),     # denormal-range den
        (11, [0.1, 0.2, 0.30000000000000004], [0.7, 0.11, 0.13]),
        (12, [-1.0, 1.0], [1.0, -1.0]),
    ]
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>")
    got = (df.select("i", cosine(F.col("a"), F.col("b")).alias("fold"),
                     cosine_batch(F.col("a"), F.col("b")).alias("kern"))
           .orderBy("i").collect())
    for r in got:
        if r.fold is None:
            assert r.kern is None, f"row {r.i}: fold NULL, kernel {r.kern}"
        else:
            assert r.kern == r.fold, \
                f"row {r.i}: fold {r.fold!r} != kernel {r.kern!r}"
