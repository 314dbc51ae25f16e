"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline; broadcast the query set and
    score with built-in array expressions (zip_with + aggregate) — JVM-side,
    no Python. Suitable whenever |queries| is broadcastable.
  - LSH-bucketed top-k: random-hyperplane signatures (deterministic,
    hash-derived planes) + multi-probe banding — the 100 TB path: candidate
    generation is an equi-join on bucket keys, scoring touches only
    candidates.

An IVF variant (k-means coarse quantizer via pyspark.ml, probe nearest
cells) is the third stage of this ladder; LSH covers the blocked-candidate
pattern without an iterative fit.

PLACEMENT INVARIANT for the Arrow kernels (_unit/_sig/_cells/_assign/_dot/
_cos): all five are pure but marked ``asNondeterministic()`` so Catalyst
does not duplicate them under pushed/join-inferred ``isnotnull`` filters
(guide §4.4; plan evidence in plans/r13/). The marker has two side
effects every call site must respect: (1) nondeterministic expressions are
only legal in Project/Filter — any new call site outside those positions
(e.g. a join condition or aggregate argument) throws AnalysisException at
runtime only; (2) predicate pushdown stops at their projections, so a
caller filtering on ids AFTER applying a kernel loses scan pruning —
filter/prune BEFORE the kernel projection. Current call sites are all
Project-positioned with pruning upstream; keep new ones that way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision (float elements widen exactly)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _null_if_nan(c: Column) -> Column:
    return F.nanvl(c, F.lit(None).cast("double"))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (never an error, never NaN) for degenerate
    inputs — a zero-norm vector (ANSI division by zero otherwise: one bad
    embedding would fail the whole job) or NaN components. Consumers filter
    NULL sims out, so degenerate vectors simply produce no matches."""
    return _null_if_nan(F.try_divide(dot(a, b), norm(a) * norm(b)))


def valid_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Relation-level degenerate filter shared by the similarity family:
    drop NULL arrays, arrays containing NULL/NaN/±inf elements, and
    zero-norm vectors (empty arrays fall out of the zero-norm check).
    Degenerate embeddings carry no direction, so they can match
    nothing — and they must be excluded BEFORE any cross-engine scoring:
    DuckDB's vectorized list_cosine_similarity raises on a NULL element
    (scores zero-norm as -1.0 where Spark's cosine yields NULL, and an
    inf element turns the dot/norm ratio into engine-dependent nan), so
    the oracle contract is exclusion on BOTH sides
    (valid_embeddings_sql). Map-side only; fuses into the scan."""
    v = F.col(vec_col)
    bad_elem = F.exists(v, lambda x: _not_finite(x))
    return df.filter(v.isNotNull() & ~bad_elem & (dot(v, v) > 0))


def _not_finite(x):
    """Element predicate: NULL, NaN or ±inf — the Spark spelling of
    DuckDB's ``x IS NULL OR NOT isfinite(x)``."""
    xd = x.cast("double")
    return (x.isNull() | F.isnan(xd)
            | (F.abs(xd) == F.lit(float("inf"))))


def valid_embeddings_sql(col: str = "embedding") -> str:
    """DuckDB twin of ``valid_embeddings``'s predicate."""
    c = f"CAST({col} AS DOUBLE[])"
    return (f"({col} IS NOT NULL AND len(list_filter({col}, "
            f"x -> x IS NULL OR NOT isfinite(CAST(x AS DOUBLE)))) = 0 "
            f"AND list_dot_product({c}, {c}) > 0)")


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Returns (q_id, n_id, cosine_sim, rank).

    Determinism: ranking key is (round(sim, 6) desc, n_id) so float noise in
    the last ulps cannot reorder results across engines/partitionings.
    Scale: queries broadcast; corpus never shuffles. For large query sets
    use lsh_topk.
    """
    queries = valid_embeddings(queries, vec_col)
    vectors = valid_embeddings(vectors, vec_col)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"))
    c = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("_cv"))
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("n_id"))
    return (c.crossJoin(F.broadcast(q))
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim").isNotNull())  # degenerate vectors
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(_id, _u): vectors scaled to unit length (double) — cosine of two
    unit vectors is a plain dot product, one fold instead of three.
    Zero-norm (and NULL-element, pre-``valid_embeddings``) vectors scale
    to all-NULL arrays, which propagate to NULL dot products downstream
    instead of erroring.

    Arrow-batched numpy kernel, NOT a transform() lambda: the captured
    norm expression gets inlined into the HOF body and the interpreted
    ||v|| fold re-runs PER ELEMENT (~dim² interpreted ops per row —
    measured 0.84 s for 2,000 dim-64 rows at sf0.1; this kernel runs the
    same rows in ~0.05 s). Bit-exactness: np.add.accumulate is strictly
    left-to-right, matching the Column fold's summation order, and
    np.sqrt / np.divide are the same IEEE-754 ops the JVM executes — the
    unit vectors are bit-identical to the expression form's
    (collect-compared at sf0.1; the planted ×2.0-copy oracles certify it
    every round).

    asNondeterministic: the function is pure, but the marker stops the
    optimizer duplicating the kernel when a downstream filter references
    its output (guide §4.4 — the pushed isnotnull was planning TWO
    ArrowEvalPython nodes per consumer)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _unit(v):
        import numpy as np
        import pandas as pd
        rows = [None if r is None else np.asarray(r, dtype=np.float64)
                for r in v.to_numpy()]
        if rows and all(r is not None for r in rows) \
                and len({r.shape for r in rows}) == 1 and rows[0].size:
            m = np.stack(rows)                        # (batch, dim)
            nrm = np.sqrt(np.add.accumulate(m * m, axis=1)[:, -1])
            bad = (nrm == 0.0) | np.isnan(nrm)
            un = m / np.where(bad, 1.0, nrm)[:, None]
            out = list(un)
            for i in np.flatnonzero(bad):
                out[i] = [None] * m.shape[1]
        else:                                         # ragged / NULL / empty
            out = []
            for r in rows:
                if r is None:
                    out.append(None)
                    continue
                sq = r * r
                nrm = np.sqrt(np.add.accumulate(sq)[-1]) if sq.size else 0.0
                out.append([None] * len(r)
                           if nrm == 0.0 or np.isnan(nrm) else r / nrm)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("_id"),
        _unit.asNondeterministic()(
            F.col(vec_col).cast("array<double>")).alias("_u"))


def _planes_np(dim: int, n_planes: int):
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim — md5-derived,
    no RNG state, reproducible across runs and machines. (n_planes, dim)."""
    import hashlib

    import numpy as np
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"rp:{p}:{d}".encode()).digest()
            out[p, d] = int.from_bytes(h[:8], "big") / 2 ** 63 - 1.0
    return out


def rp_signatures(vectors: DataFrame, id_col: str, vec_col: str,
                  dim: int, n_planes: int = 16) -> DataFrame:
    """(_id, _sig) random-hyperplane (SimHash-for-vectors) signatures:
    bit p = sign of ⟨vec, plane_p⟩, packed into one bigint.

    Arrow-batched numpy matmul (batch × dim) @ (dim × n_planes) — the
    textbook case where a vectorized Pandas UDF beats Catalyst expressions:
    n_planes codegen'd sum-aggregates over a posexplode'd corpus measured
    ~4× slower at sf0.1, and interpreted HOF folds ~40× slower. Signature
    bytes per row: 8 — candidate generation downstream never carries the
    vector itself. n_planes ≤ 64 (one uint64 word).
    """
    if not 0 < n_planes <= 64:
        raise ValueError("n_planes must be in 1..64")
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    planes_t = _planes_np(dim, n_planes).T       # (dim, n_planes)
    weights = 1 << np.arange(n_planes, dtype=np.uint64)

    def _sig(v):
        import pandas as pd
        m = np.stack(v.to_numpy())               # (batch, dim) float64
        bits = (m @ planes_t > 0).astype(np.uint64)
        return pd.Series((bits @ weights).view(np.int64))

    # asNondeterministic: pure function; the marker only stops optimizer
    # re-evaluation when downstream filters reference the output (§4.4)
    sig = pandas_udf(_sig, returnType="long").asNondeterministic()

    vectors = valid_embeddings(vectors, vec_col)
    return vectors.select(
        F.col(id_col).alias("_id"),
        sig(F.col(vec_col).cast("array<double>")).alias("_sig"))


def band_keys(sig: Column, n_planes: int, bands: int) -> Column:
    """Split an n_planes-bit signature into ``bands`` sub-keys (array)."""
    r = n_planes // bands
    mask = (1 << r) - 1
    return F.array(*[
        F.shiftrightunsigned(sig, r * b).bitwiseAND(F.lit(mask))
        for b in range(bands)])


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_planes: int = 16, bands: int = 4) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signature, banded
    candidate join, exact re-scoring of candidates only.

    The n_planes-bit signature splits into ``bands`` sub-keys; a candidate
    is any corpus vector sharing at least one sub-key with the query
    (multi-band OR — same construction as MinHash LSH). Recall rises with
    bands; cost is one equi-join per the exploded band table.

    Scale shape: candidate generation joins (id, band, key) rows only —
    8-byte signatures, never the vectors; vectors are fetched back by id
    for the deduped candidate set, then scored as a unit-vector dot.
    """
    qsig = rp_signatures(queries, id_col, vec_col, dim, n_planes)
    csig = rp_signatures(vectors, id_col, vec_col, dim, n_planes)

    def bucketed(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col("_id").alias(out_id),
            F.posexplode(band_keys(F.col("_sig"), n_planes, bands))
            .alias("_band", "_key"))

    cand = (bucketed(qsig, "q_id").join(bucketed(csig, "n_id"),
                                        ["_band", "_key"])
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id")
            .dropDuplicates(["q_id", "n_id"]))
    qu = unit_vectors(queries, id_col, vec_col)
    cu = unit_vectors(vectors, id_col, vec_col).repartition("_id")
    sim = _null_if_nan(F.round(dot_batch(F.col("_qu"), F.col("_nu")), 6))
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("n_id"))
    return (cand
            .join(F.broadcast(qu.select(F.col("_id").alias("q_id"),
                                        F.col("_u").alias("_qu"))), "q_id")
            .join(cu.select(F.col("_id").alias("n_id"),
                            F.col("_u").alias("_nu")), "n_id")
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim").isNotNull())
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def fit_centroids(vectors: DataFrame, vec_col: str = "embedding",
                  n_cells: int = 16, seed: int = 42,
                  max_iter: int = 8, fit_sample: int = 100_000,
                  normalize: bool = False) -> list[list[float]]:
    """IVF coarse quantizer: k-means cell centers, trained on a bounded
    sample collected to the driver (numpy Lloyd's iterations).

    This is the faiss-style IVF training pattern: quantizer quality needs
    only O(cells · dim) information, so a ≤``fit_sample``-row sample
    (~50 MB at 100k × 64 doubles) is collected once and iterated in
    memory — no per-iteration cluster jobs. The *assignment* phase
    (``nearest_cells``) stays a distributed map-side pass over the full
    corpus; only training is driver-local, and it is the only deliberate
    ``collect`` outside tests (bounded by fit_sample, independent of
    corpus size). Deterministic for a given seed and sample."""
    import numpy as np
    n = vectors.count()
    s = vectors.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if n > fit_sample:
        s = s.sample(fraction=fit_sample / n, seed=seed)
    # per-element conversion: NULL and EMPTY vectors are skipped (both
    # carry no geometry; an empty row would trip the ragged check), NULL
    # elements become NaN and fall to the isfinite filter below
    rows = [np.asarray(r._v, dtype=np.float64)
            for r in s.collect() if r._v is not None and len(r._v) > 0]
    # degenerate inputs: an empty / all-NULL sample would build a 1-D (0,)
    # array (AxisError below), and ragged vector lengths an object array
    # that breaks the matmul — fail soft with an empty model / hard with a
    # clear message instead
    if not rows:
        return []
    if len({len(r) for r in rows}) != 1:
        raise ValueError(
            f"ragged {vec_col!r} lengths in k-means sample: "
            f"{sorted({len(r) for r in rows})[:5]}")
    x = np.stack(rows)
    x = x[np.isfinite(x).all(axis=1)]  # NaN/inf rows would poison the means
    if not len(x):
        return []
    if normalize:
        n = np.linalg.norm(x, axis=1, keepdims=True)
        x = np.divide(x, n, out=np.zeros_like(x), where=n > 0)
        x = x[(n > 0).ravel()]
    n_cells = min(n_cells, len(x))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), n_cells, replace=False)].copy()
    for _ in range(max_iter):
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
        assign = d.argmin(axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent.tolist()


def nearest_cells(vec: Column, centroids: list[list[float]],
                  n_probe: int = 1, normalize: bool = False) -> Column:
    """The ``n_probe`` nearest centroid ids for ``vec`` (array<int>), by
    squared L2. Arrow-batched numpy: per batch one (batch × dim) @
    (dim × cells) matmul — centroids ride inside the serialized closure
    (they are O(cells · dim) doubles, broadcast with the task). Ties break
    toward the lower cell id (stable argsort) in both this and any
    expression formulation. Marked nondeterministic (pure in reality) so
    a join-inferred isnotnull on the cell id cannot duplicate the kernel
    below its own projection (guide §4.4 — q47's corpus side planned the
    assignment TWICE)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    cent = np.asarray(centroids, dtype=np.float64)        # (cells, dim)
    cent_sq = (cent * cent).sum(axis=1)                   # ‖c‖² per cell

    def _cells(v):
        import pandas as pd
        dim = cent.shape[1]
        # NULL rows/elements become NaN rows: assigned arbitrarily and
        # dropped by downstream degenerate-row filters
        m = np.array([np.full(dim, np.nan) if r is None
                      else np.asarray(r, dtype=np.float64)
                      for r in v.to_numpy()])             # (batch, dim)
        if normalize:
            # L2-normalize in the SAME numpy pass — callers working in
            # cosine space then never pay the per-element HOF transform
            n = np.linalg.norm(m, axis=1, keepdims=True)
            m = np.divide(m, n, out=np.zeros_like(m), where=n > 0)
        # argmin ‖x−c‖² = argmin ‖c‖² − 2⟨x,c⟩ (‖x‖² constant per row)
        d = cent_sq[None, :] - 2.0 * (m @ cent.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return pandas_udf(_cells, returnType="array<int>").asNondeterministic()(
        vec.cast("array<double>"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 16, n_probe: int = 4,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, probe the n_probe
    nearest cells per query, exact cosine re-scoring of cell members only.

    The scale path when the corpus outgrows broadcast: corpus partitioned
    (and pre-partitionable/bucketable) by cell id; each query touches
    n_probe/n_cells of the data. Recall rises with n_probe (n_probe =
    n_cells degrades gracefully to exact brute force).

    Assignment runs in COSINE space (train + assign on unit vectors):
    scoring is cosine, so clustering raw magnitudes would scatter
    same-direction vectors across cells. This also makes q136's planted
    certificate structural: unit(2·x) is bit-identical to unit(x) in IEEE
    float (power-of-two scaling is exact through square/sum/sqrt/divide),
    so a ×2-scaled query probes exactly its original's cell first."""
    vectors = valid_embeddings(vectors, vec_col)
    queries = valid_embeddings(queries, vec_col)
    cents = (centroids if centroids is not None
             else fit_centroids(vectors, vec_col, n_cells, normalize=True))
    if not cents:  # degenerate corpus (empty / all-NULL embeddings)
        id_type = dict(vectors.dtypes)[id_col]
        return vectors.sparkSession.createDataFrame(
            [], f"q_id {id_type}, n_id {id_type}, cosine_sim double, "
                "rank bigint")
    c = vectors.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("_cv"),
        F.element_at(nearest_cells(F.col(vec_col), cents, 1,
                                   normalize=True), 1).alias("_cell"))
    # two selects, not explode(udf(...)) inline: the Generate then
    # consumes a plain attribute, which keeps the nondeterministic
    # kernel in a Project (the only place analysis allows it)
    q = (queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"),
            nearest_cells(F.col(vec_col), cents, n_probe,
                          normalize=True).alias("_qcells"))
         .select("q_id", "_qv", F.explode("_qcells").alias("_cell")))
    # cosine_batch, not the interpreted fold: the fold was evaluated
    # TWICE per candidate pair (join condition + projection — §4.4) at
    # ~dim² interpreted ops each; the kernel is bit-identical (see its
    # docstring) and runs once, post-join
    sim = _null_if_nan(F.round(cosine_batch(F.col("_qv"), F.col("_cv")),
                               6))
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("n_id"))
    return (c.join(F.broadcast(q), "_cell")
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim").isNotNull())
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             dim: int = 64, n_planes: int = 16,
                             bands: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold)
    with LSH band blocking — no all-pairs scan.

    Scale shape: the self-join sees only (id, band, key) rows (8-byte
    signatures) off one shared Exchange; candidate pairs are deduped as
    bare id pairs, and only then are unit vectors fetched back by id (one
    shared Exchange for both fetch joins) and scored with a single dot
    fold. Selectivity tuning: wider bands (more bits per key) cut the
    candidate count geometrically — n_planes=64/bands=8 keeps recall ≥ 93%
    at cosine 0.9 (→ ~100% by 0.99) with 256× finer buckets than the
    16/4 default."""
    vectors = valid_embeddings(vectors, vec_col)
    sigs = rp_signatures(vectors, id_col, vec_col, dim, n_planes)
    buckets = (sigs.select("_id",
                           F.posexplode(band_keys(F.col("_sig"), n_planes,
                                                  bands))
                           .alias("_band", "_key"))
               # shared Exchange for both join sides (ReusedExchange) — the
               # signature pipeline runs once, not twice
               .repartition("_band", "_key"))
    cand = (buckets.select(F.col("_id").alias("id_a"), "_band", "_key")
            .join(buckets.select(F.col("_id").alias("id_b"), "_band", "_key"),
                  ["_band", "_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"]))
    u = unit_vectors(vectors, id_col, vec_col).repartition("_id")
    sim = _null_if_nan(F.round(dot_batch(F.col("_ua"), F.col("_ub")), 6))
    return (cand
            .join(u.select(F.col("_id").alias("id_a"),
                           F.col("_u").alias("_ua")), "id_a")
            .join(u.select(F.col("_id").alias("id_b"),
                           F.col("_u").alias("_ub")), "id_b")
            .select("id_a", "id_b", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))


def fit_pq_codebooks(vectors: DataFrame, vec_col: str = "embedding",
                     m: int = 8, n_codes: int = 16, seed: int = 42,
                     max_iter: int = 8,
                     fit_sample: int = 100_000) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the (unit-normalized) vector
    into ``m`` contiguous subspaces and k-means each to ``n_codes``
    centroids — the faiss-PQ training pattern. Like ``fit_centroids``,
    training runs on a bounded driver sample (quantizer quality needs
    O(m · n_codes · dim) information, not the corpus); encoding and search
    stay distributed. Deterministic for a given seed and sample.

    Memory story at 100 TB: an encoded vector is ``m`` small ints
    (m=8 → 8 bytes) instead of dim floats (64 dims → 256 bytes) — the
    whole encoded corpus fits where 3% of the raw vectors would, which is
    what makes exhaustive ADC scans over billions of vectors feasible.
    """
    import numpy as np
    n = vectors.count()
    s = vectors.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if n > fit_sample:
        s = s.sample(fraction=fit_sample / n, seed=seed)
    rows = [np.asarray(r._v, dtype=np.float64)
            for r in s.collect() if r._v is not None]
    if not rows:
        return []
    if len({len(r) for r in rows}) != 1:
        raise ValueError(
            f"ragged {vec_col!r} lengths in PQ training sample: "
            f"{sorted({len(r) for r in rows})[:5]}")
    x = np.stack(rows)
    x = x[np.isfinite(x).all(axis=1)]
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[nrm[:, 0] > 0] / nrm[nrm[:, 0] > 0]
    if not len(x):
        return []
    books = []
    rng = np.random.RandomState(seed)
    for sub in np.array_split(x, m, axis=1):
        kk = min(n_codes, len(sub))
        cent = sub[rng.choice(len(sub), kk, replace=False)].copy()
        for _ in range(max_iter):
            d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = d.argmin(axis=1)
            for c in range(kk):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent.tolist())
    return books


def pq_encode(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace nearest-centroid codes (Arrow-batched
    numpy; codebooks ride in the closure — O(m · n_codes · dim) doubles).
    Input is unit-normalized inside the UDF so codes match the codebooks'
    training space."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    cents = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(cents)

    def _enc(v):
        import pandas as pd
        x = np.stack(v.to_numpy())
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        x = x / nrm
        codes = np.empty((len(x), m), dtype=np.int32)
        for i, sub in enumerate(np.array_split(x, m, axis=1)):
            c = cents[i]
            d = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
            codes[:, i] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return pandas_udf(_enc, returnType="array<int>")(vec.cast("array<double>"))


def pq_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            m: int = 8, n_codes: int = 16, pool_factor: int = 4,
            codebooks: list[list[list[float]]] | None = None) -> DataFrame:
    """PQ approximate top-k with asymmetric distance (ADC) + exact
    re-rank: encode the corpus to m-byte codes, score every code against
    per-query lookup tables (query·centroid dots — queries stay
    full-precision, hence "asymmetric"), pool the global ADC top
    ``pool_factor·k`` deterministically, then exact-cosine re-rank the
    pool to k. Returns (q_id, n_id, cosine_sim, rank).

    Scale: the scan side carries only (id, m-byte code); scoring is a
    per-batch numpy table-gather emitting batch-local top-pool rows per
    query (global top-pool ⊆ union of batch top-pools, so the reduction
    is exact w.r.t. ADC); only the pooled candidates ever touch the
    full-precision vectors again. Recall rises with m / n_codes /
    pool_factor; memory per corpus vector is m bytes instead of 4·dim.
    """
    import numpy as np
    vectors = valid_embeddings(vectors, vec_col)
    queries = valid_embeddings(queries, vec_col)
    books = codebooks or fit_pq_codebooks(vectors, vec_col, m, n_codes)
    if not books:  # degenerate corpus (empty / all-NULL embeddings)
        id_type = dict(vectors.dtypes)[id_col]
        return vectors.sparkSession.createDataFrame(
            [], f"q_id {id_type}, n_id {id_type}, cosine_sim double, "
                "rank bigint")
    cents = [np.asarray(b, dtype=np.float64) for b in books]
    qrows = [r for r in queries.select(
                 F.col(id_col).alias("q_id"),
                 F.col(vec_col).cast("array<double>").alias("_qv")).collect()
             if r._qv is not None]  # NULL query vectors: no matches
    if not qrows:
        id_type = dict(vectors.dtypes)[id_col]
        return vectors.sparkSession.createDataFrame(
            [], f"q_id {id_type}, n_id {id_type}, cosine_sim double, "
                "rank bigint")
    q_ids = np.asarray([r.q_id for r in qrows], dtype=np.int64)
    qx = np.stack([r._qv for r in qrows])
    qn = np.linalg.norm(qx, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qx = qx / qn
    # tables[q][i][c] = <q_sub_i, centroid_c> ; ADC score = Σ_i table lookup
    tables = [sub @ cents[i].T
              for i, sub in enumerate(np.array_split(qx, len(cents), axis=1))]
    pool = pool_factor * k

    codes = vectors.select(F.col(id_col).alias("n_id"),
                           pq_encode(F.col(vec_col), books).alias("_code"))

    def _score(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            cb = np.stack(pdf["_code"].to_numpy())            # (batch, m)
            nid = pdf["n_id"].to_numpy()
            # scores (Q, batch): gather per subspace table at the code
            scores = np.zeros((len(q_ids), len(cb)))
            for i, tbl in enumerate(tables):                  # tbl (Q, codes)
                scores += tbl[:, cb[:, i]]
            take = min(pool, len(cb))
            idx = np.argpartition(-scores, take - 1, axis=1)[:, :take]
            out_q = np.repeat(q_ids, take)
            out_n = nid[idx].ravel()
            out_s = np.take_along_axis(scores, idx, axis=1).ravel()
            yield pd.DataFrame({"q_id": out_q, "n_id": out_n,
                                "adc": out_s})

    cand = codes.mapInPandas(_score, schema="q_id long, n_id long, adc double")
    w_adc = W.partitionBy("q_id").orderBy(F.col("adc").desc(), "n_id")
    pooled = (cand.filter(F.col("q_id") != F.col("n_id"))
              .withColumn("_r", F.row_number().over(w_adc))
              .filter(F.col("_r") <= pool).select("q_id", "n_id"))
    u = unit_vectors(vectors, id_col, vec_col)
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"))
    sim = _null_if_nan(F.round(cosine(F.col("_qv"), F.col("_nv")), 6))
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), "n_id")
    return (pooled
            .join(u.select(F.col("_id").alias("n_id"),
                           F.col("_u").alias("_nv")), "n_id")
            .join(F.broadcast(qv), "q_id")
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim").isNotNull())
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def dot_batch(a: Column, b: Column) -> Column:
    """Row-wise dot product as an Arrow-batched numpy einsum — the fast
    path when a relation carries MILLIONS of vector pairs. The interpreted
    ``zip_with``+``aggregate`` fold costs ~40× per element (verify-guide
    measurement); q30's broadcast top-k keeps the fold because its pair
    count is tiny, but semantic dedup's within-cell pair relation is
    exactly the regime where Arrow batching wins."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(x, y):
        import numpy as np
        import pandas as pd
        # asarray(dtype=float) maps NULL elements (degenerate unit vectors)
        # to NaN, which the _null_if_nan wrapper downstream turns into the
        # operator contract's NULL-similarity
        xm = np.array([np.asarray(r, dtype=np.float64) for r in x.to_numpy()])
        ym = np.array([np.asarray(r, dtype=np.float64) for r in y.to_numpy()])
        return pd.Series(np.einsum("ij,ij->i", xm, ym))

    # asNondeterministic: pure, but the downstream isnotnull(cosine_sim)
    # filter was planning the kernel TWICE per candidate pair (§4.4)
    return _dot.asNondeterministic()(a, b)


def cosine_batch(a: Column, b: Column) -> Column:
    """Row-wise cosine as an Arrow-batched numpy kernel, BIT-IDENTICAL to
    the ``cosine()`` expression: the dot and both norm sums run
    ``np.add.accumulate`` (strictly left-to-right — the Column fold's
    summation order), and sqrt/multiply/divide are the same IEEE-754
    double ops the JVM executes, so every defined value matches the fold
    to the last ulp. NULL contract mirrored exactly: NULL array, ragged
    pair (zip_with's NULL padding), empty array, NULL/NaN element and
    zero-norm all yield NULL (NaN results cross the Arrow boundary as
    NULL; callers keep the ``_null_if_nan(round(...))`` wrapper, which is
    then a no-op, for parity with the fold form).

    Why it exists (guide §4): the interpreted fold costs ~dim² per pair
    AND was being evaluated twice — once in the join condition the pushed
    isnotnull landed in, once in the projection (q47's before-plan).
    Marked nondeterministic like ``dot_batch`` so the §4.4 duplication
    cannot reappear around the kernel itself."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(x, y):
        import numpy as np
        import pandas as pd
        ra = [None if r is None else np.asarray(r, dtype=np.float64)
              for r in x.to_numpy()]
        rb = [None if r is None else np.asarray(r, dtype=np.float64)
              for r in y.to_numpy()]
        res = np.full(len(ra), np.nan)
        by_dim: dict = {}
        for i, (va, vb) in enumerate(zip(ra, rb)):
            if va is None or vb is None or va.shape != vb.shape \
                    or not va.size:
                continue                      # NULL / ragged / empty → NULL
            by_dim.setdefault(va.shape[0], []).append(i)
        for d, idx in by_dim.items():
            am = np.stack([ra[i] for i in idx])
            bm = np.stack([rb[i] for i in idx])
            dots = np.add.accumulate(am * bm, axis=1)[:, -1]
            na = np.sqrt(np.add.accumulate(am * am, axis=1)[:, -1])
            nb = np.sqrt(np.add.accumulate(bm * bm, axis=1)[:, -1])
            den = na * nb
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(den == 0.0, np.nan, dots / den)
            res[idx] = s
        return pd.Series(res)

    return _cos.asNondeterministic()(a.cast("array<double>"),
                                     b.cast("array<double>"))


def semantic_dedup(vectors: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_cells: int = 16, seed: int = 42,
                   max_cell_rows: int = 100_000) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means blocks
    the corpus into cells, then near-duplicate pairs are resolved by EXACT
    pairwise cosine within each cell only — pair cost Σ|cell|² instead of
    n², with the cluster step reusing the IVF machinery (bounded driver
    sample for training, distributed map-side assignment).

    Returns (id_a, id_b, cosine_sim) with id_a < id_b and sim ≥ threshold;
    callers drop id_b per pair (or cluster-close like q57) downstream.

    Recall contract: a pair is found iff both members land in the same
    cell. Same-direction duplicates ALWAYS do (identical unit vectors ⇒
    identical assignment), which is the planted-recovery oracle q133
    certifies; general near-pairs can straddle a cell boundary — raise
    n_probe-style multi-assignment or lower n_cells when the corpus
    clusters loosely (the SemDeDup paper's k≪n regime).

    100 TB: training reads a ≤100k sample; assignment is one Arrow-batched
    matmul pass; the main shuffle moves each vector once, keyed by cell
    (plus salt replicas for oversized cells, below). Within a cell the
    pair search is one BLAS gram matrix (C·Cᵀ) in an ``applyInPandas``
    group — pairs are never materialized as a join relation (a 10k-vector
    corpus already means ~3M joined pair rows carrying two 512-byte arrays
    each; the gram form was measured 5× faster at that size and the gap
    grows quadratically).

    Per-task memory is HARD-BOUNDED by ``max_cell_rows``: k-means cells
    skew on real corpora, and an unbounded cell would OOM a task at scale.
    A cell of n > max_cell_rows rows is triangle-salt-blocked: rows get a
    deterministic salt r ∈ [0, s) with s = ⌈n / max_cell_rows⌉, and every
    unordered salt pair (i ≤ j) becomes its own group — diagonal groups
    (i, i) compute the within-salt upper triangle, off-diagonal groups
    (i, j) only the i×j cross block — so each of the s(s+1)/2 groups
    holds ≤ ~2·max_cell_rows rows regardless of cell skew, every pair is
    computed exactly once, and the result set is IDENTICAL to the
    unsalted gram. Replication cost: each row is shuffled s times — paid
    only by rows in oversized cells. Sizing the salts needs per-cell
    counts, so the assignment pass runs twice (count + main); at cluster
    scale persist/checkpoint the assignment frame between the passes."""
    import pandas as pd

    # NULL and EMPTY embeddings are degenerate input ("no matches",
    # module contract) — filter JVM-side so the numpy kernels never see
    # a None row or a ragged zero-length row; rows with NULL ELEMENTS,
    # inf or zero norm are dropped in find_pairs (their
    # nan-normalization marks them). Everything downstream normalizes
    # inside its own numpy pass — no per-element HOF transform, and the
    # shuffle carries the raw float32 arrays (half the bytes of
    # materialized unit-vector doubles).
    clean = vectors.filter(F.col(vec_col).isNotNull()
                           & (F.size(F.col(vec_col)) > 0))
    raw = clean.select(F.col(id_col).alias("_id"),
                       F.col(vec_col).alias("_v"))
    cents = fit_centroids(clean, vec_col=vec_col, n_cells=n_cells,
                          seed=seed, normalize=True)
    # output ids keep the caller's id type (string/uuid keys work)
    id_type = dict(vectors.dtypes)[id_col]
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"
    if not cents:  # degenerate corpus (empty / all-NULL embeddings)
        return vectors.sparkSession.createDataFrame([], out_schema)
    cell = raw.withColumn(
        "_cell", nearest_cells(F.col("_v"), cents, 1, normalize=True)[0])
    # per-cell salt count s = ⌈|cell| / max_cell_rows⌉ (1 ⇒ no salting);
    # the sizes relation is ≤ n_cells rows — always broadcastable
    sizes = cell.groupBy("_cell").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(max_cell_rows))
        .cast("int").alias("_s"))
    salt = F.pmod(F.xxhash64(F.col("_id")), F.col("_s")).cast("int")
    grp = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.col("_s") - 1),
        lambda j: F.struct(F.least(F.col("_salt"), j).alias("i"),
                           F.greatest(F.col("_salt"), j).alias("j"))))
    salted = (cell.join(F.broadcast(sizes), "_cell")
              .withColumn("_salt", salt)
              .select("_id", "_v", "_cell", "_salt",
                      F.explode(grp).alias("_g"))
              .select("_id", "_v", "_cell", "_salt",
                      F.col("_g.i").alias("_gi"), F.col("_g.j").alias("_gj")))

    def _pairs_from(ids_a, m_a, ids_b, m_b, cross: bool):
        import numpy as np
        if cross:
            sims = np.round(m_a @ m_b.T, 6)
            ia, ib = np.nonzero(sims >= threshold)
            sim = sims[ia, ib]
            left, right = ids_a[ia], ids_b[ib]
        else:
            sims = np.round(m_a @ m_a.T, 6)
            ia, ib = np.triu_indices(len(ids_a), k=1)
            keep = sims[ia, ib] >= threshold
            ia, ib = ia[keep], ib[keep]
            sim = sims[ia, ib]
            left, right = ids_a[ia], ids_a[ib]
        id_a = np.minimum(left, right)
        id_b = np.maximum(left, right)
        # duplicated id VALUES (a dedup stage's natural input) would pair
        # with themselves — the id_a < id_b contract excludes self-pairs
        neq = id_a != id_b
        return pd.DataFrame({"id_a": id_a[neq], "id_b": id_b[neq],
                             "cosine_sim": sim[neq]})

    def find_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                              "id_b": pd.Series([], dtype=object),
                              "cosine_sim": pd.Series([], dtype="float64")})
        if len(pdf) < 2:
            return empty

        def clean_block(block: pd.DataFrame):
            ids = block["_id"].to_numpy()
            # per-element conversion maps NULL elements to NaN instead of
            # raising on an object array
            m = np.array([np.asarray(r, dtype=np.float64)
                          for r in block["_v"].to_numpy()])
            if m.ndim != 2:
                return ids[:0], np.zeros((0, 0))
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            ok = (norms > 0).ravel() & np.isfinite(m).all(axis=1)
            ids, m, norms = ids[ok], m[ok], norms[ok]
            return ids, (m / norms if len(ids) else m)

        gi, gj = int(pdf["_gi"].iat[0]), int(pdf["_gj"].iat[0])
        if gi == gj:                       # within-salt upper triangle
            ids, m = clean_block(pdf)
            if len(ids) < 2:
                return empty
            return _pairs_from(ids, m, ids, m, cross=False)
        ids_a, m_a = clean_block(pdf[pdf["_salt"] == gi])
        ids_b, m_b = clean_block(pdf[pdf["_salt"] == gj])
        if not len(ids_a) or not len(ids_b):
            return empty
        return _pairs_from(ids_a, m_a, ids_b, m_b, cross=True)

    return salted.groupBy("_cell", "_gi", "_gj").applyInPandas(
        find_pairs, schema=out_schema)


# ---------------------------------------------------------------------------
# Anchor-based cluster assignment + cluster-balanced sampling (q140)
# ---------------------------------------------------------------------------

def min_id_anchors(df: DataFrame, label_col: str = "label",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """One deterministic anchor vector per label: the embedding of the
    min-id member (min_by — SQL-replayable as DuckDB arg_min). Degenerate
    embeddings and NULL labels are excluded (valid_embeddings contract).
    The collect is bounded by the number of LABELS, never the corpus
    (same bounded contract as the IVF training sample)."""
    rows = (valid_embeddings(df, vec_col)
            .filter(F.col(label_col).isNotNull())
            .groupBy(label_col)
            .agg(F.min_by(vec_col, id_col).alias("_av"))
            .collect())
    return sorted((r[label_col], list(r["_av"])) for r in rows)


def anchor_assign(df: DataFrame, anchors: list[tuple[int, list[float]]],
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  out_col: str = "cluster") -> DataFrame:
    """Assign every vector to its nearest anchor by cosine — MAP-SIDE ONLY.

    The anchors ride inside the serialized kernel closure (dozens of
    anchors × embedding dim — task-broadcast-sized, never a join), so
    assignment stays one scan-fused pass: no shuffle at any corpus size.
    Determinism: argmax key is (round(sim, 6) desc, anchor asc);
    degenerate rows (zero-norm / NaN / NULL / length-mismatched vectors →
    NULL cosine in the expression form) take a -2.0 sentinel (below the
    cosine floor of -1), so they deterministically land in the lowest-id
    anchor rather than tracking engine NULL-ordering rules.

    Arrow-batched numpy kernel, not per-anchor Column expressions: the
    expression form built L × (dot + 2 norm) interpreted HOF folds per
    row (the SKILL.md interpreted-HOF class — measured ~2.5 s/pass on
    2,000 dim-64 rows × 20 anchors, and q140 pays it twice), where one
    (batch × dim) @ (dim × L) matmul per Arrow batch is milliseconds.
    test_cluster_balance pins the argmax/tiebreak/sentinel semantics
    against an independent numpy recomputation, and the q140 oracle
    replays the whole assignment in DuckDB."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    order = sorted(range(len(anchors)), key=lambda i: anchors[i][0])
    aids = np.asarray([anchors[i][0] for i in order], dtype=np.int64)
    avs_list = [np.asarray(anchors[i][1], dtype=np.float64) for i in order]
    # anchors grouped by dim: a vector only scores against anchors of its
    # own length (the zip_with NULL-padding of the expression form made
    # every length-mismatched pair a NULL cosine → sentinel)
    dims = sorted({a.shape[0] for a in avs_list})
    by_dim = {d: np.flatnonzero([a.shape[0] == d for a in avs_list])
              for d in dims}
    mats = {d: (np.stack([avs_list[j] for j in by_dim[d]]),
                np.sqrt(np.stack([(avs_list[j] * avs_list[j]).sum()
                                  for j in by_dim[d]])))
            for d in dims}

    @pandas_udf("bigint")
    def _assign(v):
        import numpy as np
        import pandas as pd
        rows = [None if r is None else np.asarray(r, dtype=np.float64)
                for r in v.to_numpy()]
        sims = np.full((len(rows), len(aids)), -2.0)
        for d, cols in by_dim.items():
            idx = np.flatnonzero([r is not None and r.shape == (d,)
                                  for r in rows])
            if not idx.size:
                continue
            am, anorm = mats[d]
            m = np.stack([rows[i] for i in idx])
            vn = np.sqrt((m * m).sum(axis=1))
            den = vn[:, None] * anorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = (m @ am.T) / den
            s = np.where(np.isfinite(s) & (den > 0.0), np.round(s, 6), -2.0)
            sims[np.ix_(idx, cols)] = s
        # ties break toward the lowest anchor id: aids ascending + argmax
        # returns the first maximum
        return pd.Series(aids[np.argmax(sims, axis=1)])

    # asNondeterministic (pure in reality): the join-inferred
    # isnotnull(cluster) in q140's consumers planned the kernel TWICE per
    # branch (guide §4.4); the marker keeps one ArrowEvalPython per branch
    return df.select(F.col(id_col), F.col(vec_col),
                     _assign.asNondeterministic()(
                         F.col(vec_col).cast("array<double>"))
                     .alias(out_col))


def cluster_balanced_sample(assigned: DataFrame, id_col: str = "vec_id",
                            cluster_col: str = "cluster",
                            salt: str = "bal") -> DataFrame:
    """Down-sample every cluster to (approximately) the smallest cluster's
    size — the cluster-balancing curation stage (cf. cluster-then-sample
    selection à la SemDeDup/DCLM pipelines): over-represented modes are
    thinned, rare modes survive whole.

    Deterministic and engine-portable: row kept iff
    ``u * n_members < n_min * 1e6`` with u = pmod(portable_hash64(id:salt),
    1e6) — an EXACT integer comparison (no float fraction), so re-runs,
    engines and partitionings keep identical rows. Scale: cluster counts
    are an anchor-sized aggregate broadcast back onto the stream; the
    filter itself is map-side."""
    from etl_load_spark.operators.dedup import portable_hash64
    counts = assigned.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members"))
    n_min = counts.agg(F.min("n_members").alias("n_min"))
    u = F.pmod(portable_hash64(F.concat(F.col(id_col).cast("string"),
                                        F.lit(":" + salt))),
               F.lit(1_000_000))
    return (assigned
            .join(F.broadcast(counts), cluster_col)
            .crossJoin(F.broadcast(n_min))
            .withColumn("_keep", u * F.col("n_members")
                        < F.col("n_min") * F.lit(1_000_000))
            .filter("_keep")
            .drop("_keep", "n_min"))


# ---------------------------------------------------------------------------
# int8 scalar quantization (index compression)
# ---------------------------------------------------------------------------

def quantizable_embeddings(df: DataFrame, vec_col: str = "embedding"
                           ) -> DataFrame:
    """Relation-level input filter for quantization: drop NULL arrays,
    EMPTY arrays (no components → no calibration range; the oracle's
    unnest would silently emit zero rows where a pass-through kernel
    emits one), and arrays containing NULL/NaN/±inf elements (NaN
    poisons min/max; inf makes the scale expression cast-undefined).
    Unlike ``valid_embeddings``, ZERO-NORM vectors are kept —
    quantization needs a value range, not a direction, and a constant
    vector quantizes exactly (all codes 0)."""
    v = F.col(vec_col)
    bad_elem = F.exists(v, lambda x: _not_finite(x))
    return df.filter(v.isNotNull() & (F.size(v) > 0) & ~bad_elem)


def quantizable_embeddings_sql(col: str = "embedding") -> str:
    """DuckDB twin of ``quantizable_embeddings``'s predicate."""
    return (f"({col} IS NOT NULL AND len({col}) > 0 "
            f"AND len(list_filter({col}, "
            f"x -> x IS NULL OR NOT isfinite(CAST(x AS DOUBLE)))) = 0)")


def quantize_kernel_udf():
    """The Arrow-batched SQ8 kernel as a reusable scalar pandas UDF
    returning struct<q_min, q_max, q_sum, codes>. DEFENSIVE on dirty
    rows (NULL array, empty array, NULL/NaN/±inf element → all-NULL
    struct fields; MIXED-dimension batches are processed per length
    bucket so vstack never sees ragged rows), so the
    QUANTIZE_EMBEDDINGS spec stage can apply it as a pure
    projection — no pre-filter, no join-back, stream-safe. The q152
    operator still excludes dirty rows relation-level
    (quantizable_embeddings) so its oracle contract stays two-sided."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<q_min: double, q_max: double, q_sum: bigint, "
                "codes: string>")
    def _quant(*cols):  # legacy-style: *args defeats type-hint inference
        # (this module stringizes annotations via `from __future__ import
        # annotations`, which breaks pandas_udf signature resolution —
        # the bloom_probe pattern)
        import numpy as np
        vecs = cols[0]
        n = len(vecs)
        out = pd.DataFrame({"q_min": [None] * n, "q_max": [None] * n,
                            "q_sum": [None] * n, "codes": [None] * n},
                           dtype=object)
        if n == 0:
            return out
        arrs = [None if v is None else np.asarray(v, dtype=np.float64)
                for v in vecs]
        ok = [i for i, a in enumerate(arrs)
              if a is not None and a.size > 0 and np.isfinite(a).all()]
        if not ok:
            return out
        # bucket by dimension: a projection-shape kernel may see mixed
        # dims in one Arrow batch (schema says array<float>, not a fixed
        # dim) and vstack raises on ragged input
        by_dim: dict = {}
        for i in ok:
            by_dim.setdefault(arrs[i].size, []).append(i)
        for idxs in by_dim.values():
            a = np.vstack([arrs[i] for i in idxs])
            mn = a.min(axis=1)
            mx = a.max(axis=1)
            rng = mx - mn
            safe = rng > 0.0
            scaled = np.zeros_like(a)
            # exact expression shape shared with the oracle SQL:
            # ((x - mn) * 255.0) / rng, floored, capped at 255
            np.divide((a - mn[:, None]) * 255.0, rng[:, None],
                      out=scaled, where=safe[:, None])
            q = np.minimum(np.floor(scaled), 255.0).astype(np.int64)
            q[~safe, :] = 0
            qs = q.sum(axis=1)
            for j, i in enumerate(idxs):
                out.iat[i, 0] = float(mn[j])
                out.iat[i, 1] = float(mx[j])
                out.iat[i, 2] = int(qs[j])
                out.iat[i, 3] = ",".join(map(str, q[j]))
        return out

    return _quant


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-vector int8 scalar quantization — the index-compression step
    of an ANN/RAG pipeline (4x smaller than float32; the form FAISS
    calls SQ8 with per-vector min/max calibration): each component maps
    to floor((x - min) * 255 / (max - min)) in [0, 255], constant
    vectors (max == min) map to all-zero codes. Math is float64
    throughout — bit-identical IEEE ops in any engine, so codes are
    EXACTLY replayable (no transcendentals, one multiply + one divide +
    one floor per component).

    Returns (id, q_min, q_max, q_sum, codes): the calibration range,
    the code sum, and the full code vector as a comma-joined string —
    an exact certificate of every byte the quantized index would store.

    Scale: a PURE PROJECTION — one Arrow-batched vectorized kernel
    (numpy row-wise min/max/scale over the batch matrix), no shuffle,
    no window, no state; 100 TB of embeddings quantize in one map pass
    fused into the scan. The JVM alternative (posexplode + per-vector
    window min/max) shuffles a dims-times-amplified relation; the HOF
    alternative (transform with a captured array_min) re-evaluates the
    min per element after CollapseProject inlining — both wrong-shaped
    at scale."""
    out = quantizable_embeddings(df, vec_col).select(
        F.col(id_col), quantize_kernel_udf()(F.col(vec_col)).alias("_q"))
    return (out.select(id_col, "_q.q_min", "_q.q_max", "_q.q_sum",
                       "_q.codes")
            .orderBy(id_col))


def quantize_embeddings_sql(table: str = "embeddings",
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    """Exact SQL twin of ``quantize_embeddings`` (DuckDB): unnest with
    subscripts, per-vector window min/max, the identical float64
    expression, string_agg in component order. ``table`` may be an
    aliased inline subquery."""
    return f"""
WITH e AS (
  SELECT {id_col}, CAST(unnest({vec_col}) AS DOUBLE) AS x,
         generate_subscripts({vec_col}, 1) AS pos
  FROM {table}
  WHERE {quantizable_embeddings_sql(vec_col)}),
s AS (
  SELECT {id_col}, x, pos,
         MIN(x) OVER (PARTITION BY {id_col}) AS mn,
         MAX(x) OVER (PARTITION BY {id_col}) AS mx
  FROM e),
q AS (
  SELECT {id_col}, mn, mx, pos,
         CASE WHEN mx > mn
              THEN LEAST(CAST(FLOOR(((x - mn) * 255.0) / (mx - mn))
                              AS BIGINT), 255)
              ELSE 0 END AS qi
  FROM s)
SELECT {id_col}, MIN(mn) AS q_min, MIN(mx) AS q_max,
       CAST(SUM(qi) AS BIGINT) AS q_sum,
       string_agg(CAST(qi AS VARCHAR), ',' ORDER BY pos) AS codes
FROM q GROUP BY {id_col} ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-retrieval training data)
# ---------------------------------------------------------------------------

def hard_negatives(vectors: DataFrame, anchors: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   dup_ceiling: float = 0.999) -> DataFrame:
    """DPR/Contriever-style hard-negative mining: for each anchor, the k
    most-similar corpus vectors with a DIFFERENT label (same-label rows
    are potential positives, not negatives), plus the anchor's best
    same-label similarity and the resulting margin — the triplet-quality
    signal a contrastive trainer thresholds on. Cross-label pairs at or
    above ``dup_ceiling`` are excluded from negatives (near-identical
    vectors across labels are labeling noise — mining them as negatives
    poisons the loss with false negatives).

    Returns (q_id, n_id, cosine_sim, pos_sim, margin, rank) with
    margin = pos_sim - cosine_sim (positive ⇒ the positive still
    outranks the mined negative; NULL when the anchor has no same-label
    peer). Determinism: sims round to 6 dp before ranking/thresholds
    (the q30 rule), rank ties break on n_id. Label comparison is
    null-safe: a NULL-label corpus row is a different-label row for
    every labeled anchor.

    Scale — the cosine_topk contract: ``anchors`` is the BOUNDED
    training-batch slice and broadcasts; the corpus never shuffles for
    scoring (partition-local cross score), the positive max is a
    map-side-combinable aggregate. The per-anchor top-k window is NOT
    a corpus-sized sort (the VERDICT r6 #3 hazard): Catalyst's
    InferWindowGroupLimit rewrites a row_number-rank filter into a
    WindowGroupLimit pair — a PARTIAL limit below the exchange keeps
    only k rows per (anchor, map-partition) map-side, so the shuffle
    carries ≤ k × map_partitions tiny rows per anchor and the Final
    per-anchor sort is over that bounded relation, never the corpus.
    Measured at 8M vectors × 1 anchor (the worst skew): this form
    3.0 s steady vs 3.6 s for an explicit q170-style two-phase bucketed
    cut — the manual pre-cut only ADDS an exchange on a relation the
    optimizer already bounds harder (SCALE.md). The plan shape is
    pinned (tests/test_plans.py: WindowGroupLimit Partial present).
    When the anchor set outgrows broadcast, generate candidates with
    lsh_topk/ivf_topk and re-rank exactly — the mining semantics here
    are unchanged."""
    anchors = valid_embeddings(anchors, vec_col)
    vectors = valid_embeddings(vectors, vec_col)
    q = anchors.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("_qv"),
                       F.col(label_col).alias("_ql"))
    c = vectors.select(F.col(id_col).alias("n_id"),
                       F.col(vec_col).alias("_cv"),
                       F.col(label_col).alias("_cl"))
    # cosine_batch (bit-identical Arrow kernel) instead of the
    # interpreted fold: both consumer branches replay the scoring
    # cross-join, and within each branch the pushed isnotnull was
    # duplicating the fold (§4.4) — 4 fold evaluations per pair → 2
    # kernel batches
    sim = _null_if_nan(F.round(cosine_batch(F.col("_qv"), F.col("_cv")),
                               6))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      F.col("_ql").eqNullSafe(F.col("_cl")).alias("_same"),
                      sim.alias("cosine_sim"))
              .filter(F.col("cosine_sim").isNotNull()))
    pos = (scored.filter(F.col("_same"))
           .groupBy("q_id").agg(F.max("cosine_sim").alias("pos_sim")))
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(),
                                      F.col("n_id"))
    return (scored.filter(~F.col("_same")
                          & (F.col("cosine_sim") < dup_ceiling))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .join(F.broadcast(pos), "q_id", "left")
            .select("q_id", "n_id", "cosine_sim", "pos_sim",
                    (F.col("pos_sim") - F.col("cosine_sim")).alias("margin"),
                    "rank")
            .orderBy("q_id", "rank"))


def hard_negatives_sql(table: str = "embeddings", anchor_pred: str =
                       "vec_id < 10", k: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding", label_col: str = "label",
                       dup_ceiling: float = 0.999) -> str:
    """Exact DuckDB twin of ``hard_negatives`` with the anchor set =
    ``table`` rows satisfying ``anchor_pred``."""
    ve = valid_embeddings_sql(vec_col)
    return f"""
WITH ef AS MATERIALIZED (
  -- MATERIALIZED: DuckDB otherwise pushes the cosine below this filter
  -- and errors on degenerate (NULL-element) vectors
  SELECT {id_col}, {vec_col}, {label_col} FROM {table} WHERE {ve}),
q AS (SELECT {id_col} AS q_id, CAST({vec_col} AS DOUBLE[]) AS qv,
             {label_col} AS ql
      FROM ef WHERE {anchor_pred}),
c AS (SELECT {id_col} AS n_id, CAST({vec_col} AS DOUBLE[]) AS cv,
             {label_col} AS cl FROM ef),
s AS (SELECT q_id, n_id, (ql IS NOT DISTINCT FROM cl) AS same,
             round(list_cosine_similarity(qv, cv), 6) AS cosine_sim
      FROM q CROSS JOIN c WHERE q_id <> n_id),
p AS (SELECT q_id, MAX(cosine_sim) AS pos_sim FROM s WHERE same
      GROUP BY q_id),
r AS (SELECT q_id, n_id, cosine_sim,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cosine_sim DESC, n_id) AS BIGINT) AS rank
      FROM s WHERE NOT same AND cosine_sim < {dup_ceiling})
SELECT r.q_id, r.n_id, r.cosine_sim, p.pos_sim,
       p.pos_sim - r.cosine_sim AS margin, r.rank
FROM r LEFT JOIN p ON r.q_id = p.q_id
WHERE r.rank <= {k}
ORDER BY r.q_id, r.rank
"""
