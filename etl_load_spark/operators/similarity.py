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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision (float elements widen exactly)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Returns (q_id, n_id, cosine_sim, rank).

    Determinism: ranking key is (round(sim, 6) desc, n_id) so float noise in
    the last ulps cannot reorder results across engines/partitionings.
    Scale: queries broadcast; corpus never shuffles. For large query sets
    use lsh_topk.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"))
    c = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("_cv"))
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("n_id"))
    return (c.crossJoin(F.broadcast(q))
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def _plane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim — md5-derived,
    no RNG state, reproducible across runs and machines."""
    import hashlib
    out = []
    for d in range(dim):
        h = hashlib.md5(f"rp:{plane}:{d}".encode()).digest()
        out.append(int.from_bytes(h[:8], "big") / 2 ** 63 - 1.0)
    return out


def rp_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane (SimHash-for-vectors) signature: bit p = sign of
    ⟨vec, plane_p⟩. Returns bigint bucket key. Convenience Column form —
    hot paths use ``rp_signatures`` (HOF folds are interpreted per element)."""
    acc = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _plane(p, dim)])
        proj = dot(vec, plane)
        acc = acc + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(0)
    return acc


def rp_signatures(vectors: DataFrame, id_col: str, vec_col: str,
                  dim: int, n_planes: int = 16) -> DataFrame:
    """(_id, _sig) random-hyperplane signatures via posexplode + n_planes
    codegen'd sum-aggregates — the throughput form of ``rp_signature``
    (zip_with/aggregate folds are interpreted per element; explode + sum()
    stays in whole-stage codegen with map-side partial aggregation)."""
    ex = vectors.select(F.col(id_col).alias("_id"),
                        F.posexplode(F.col(vec_col)).alias("_d", "_x"))
    aggs = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _plane(p, dim)])
        aggs.append(F.sum(F.col("_x").cast("double")
                          * F.element_at(plane, F.col("_d") + 1))
                    .alias(f"_pr{p}"))
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        sig = sig + F.when(F.col(f"_pr{p}") > 0,
                           F.lit(1 << p).cast("bigint")).otherwise(0)
    return ex.groupBy("_id").agg(*aggs).select("_id", sig.alias("_sig"))


def _with_sig(df: DataFrame, id_col: str, vec_col: str, prefix: str,
              dim: int, n_planes: int) -> DataFrame:
    """(prefix_id, _prefixv, _sig): vectors joined with their signatures."""
    sigs = rp_signatures(df, id_col, vec_col, dim, n_planes)
    return (df.select(F.col(id_col).alias(f"{prefix}_id"),
                      F.col(vec_col).alias(f"_{prefix}v"))
            .join(sigs.withColumnRenamed("_id", f"{prefix}_id"),
                  f"{prefix}_id"))


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_planes: int = 16, bands: int = 4) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signature, banded
    candidate join, exact re-scoring of candidates only.

    The n_planes-bit signature splits into ``bands`` sub-keys; a candidate
    is any corpus vector sharing at least one sub-key with the query
    (multi-band OR — same construction as MinHash LSH). Recall rises with
    bands; cost is one equi-join per the exploded band table.
    """
    r = n_planes // bands
    mask = (1 << r) - 1

    def with_bands(df: DataFrame, prefix: str, small: bool) -> DataFrame:
        if small:
            # query side is broadcast-small by contract: the inline Column
            # signature avoids an aggregation+join round trip
            d = df.select(F.col(id_col).alias(f"{prefix}_id"),
                          F.col(vec_col).alias(f"_{prefix}v"),
                          rp_signature(F.col(vec_col), dim, n_planes)
                          .alias("_sig"))
        else:
            d = _with_sig(df, id_col, vec_col, prefix, dim, n_planes)
        band_arr = F.array(*[
            F.shiftrightunsigned(F.col("_sig"), r * b).bitwiseAND(F.lit(mask))
            for b in range(bands)])
        return d.select(f"{prefix}_id", f"_{prefix}v",
                        F.posexplode(band_arr).alias("_band", "_key"))

    qb = with_bands(queries, "q", small=True)
    cb = with_bands(vectors, "n", small=False)
    sim = F.round(cosine(F.col("_qv"), F.col("_nv")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("n_id"))
    return (qb.join(cb, ["_band", "_key"])
            .filter(F.col("q_id") != F.col("n_id"))
            .dropDuplicates(["q_id", "n_id"])
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def fit_centroids(vectors: DataFrame, vec_col: str = "embedding",
                  n_cells: int = 16, seed: int = 42,
                  max_iter: int = 20) -> list[list[float]]:
    """IVF coarse quantizer: k-means cell centers via pyspark.ml.

    At corpus scale, fit on a bounded sample (k-means quality needs only
    O(cells · dim) information); assignment is a full-corpus map-side pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    data = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(data)
    return [c.tolist() for c in model.clusterCenters()]


def nearest_cells(vec: Column, centroids: list[list[float]],
                  n_probe: int = 1) -> Column:
    """The ``n_probe`` nearest centroid ids for ``vec`` (array<int>), by
    squared L2. Centroids ride as literal arrays — evaluated JVM-side per
    row, no shuffle, no Python."""
    cent = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    scored = F.transform(
        cent,
        lambda c, i: F.struct(
            F.aggregate(F.zip_with(vec, c,
                                   lambda x, y: (x.cast("double") - y) ** 2),
                        F.lit(0.0), lambda acc, x: acc + x).alias("d"),
            i.alias("cell")))
    return F.transform(F.slice(F.array_sort(scored), 1, n_probe),
                       lambda s: s["cell"])


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 16, n_probe: int = 4,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, probe the n_probe
    nearest cells per query, exact cosine re-scoring of cell members only.

    The scale path when the corpus outgrows broadcast: corpus partitioned
    (and pre-partitionable/bucketable) by cell id; each query touches
    n_probe/n_cells of the data. Recall rises with n_probe (n_probe =
    n_cells degrades gracefully to exact brute force)."""
    cents = centroids or fit_centroids(vectors, vec_col, n_cells)
    c = vectors.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("_cv"),
        F.element_at(nearest_cells(F.col(vec_col), cents, 1), 1).alias("_cell"))
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"),
        F.explode(nearest_cells(F.col(vec_col), cents, n_probe)).alias("_cell"))
    sim = F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("n_id"))
    return (c.join(F.broadcast(q), "_cell")
            .filter(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id", sim.alias("cosine_sim"))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             dim: int = 64, n_planes: int = 16,
                             bands: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold)
    with LSH band blocking — no all-pairs scan."""
    r = n_planes // bands
    mask = (1 << r) - 1
    d = (_with_sig(vectors, id_col, vec_col, "x", dim, n_planes)
         .select(F.col("x_id").alias("_id"), F.col("_xv").alias("_v"), "_sig"))
    band_arr = F.array(*[
        F.shiftrightunsigned(F.col("_sig"), r * b).bitwiseAND(F.lit(mask))
        for b in range(bands)])
    e = (d.select("_id", "_v", F.posexplode(band_arr).alias("_band", "_key"))
         # shared Exchange for both join sides (ReusedExchange) — the
         # signature projection runs once, not twice
         .repartition("_band", "_key"))
    a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_band", "_key")
    b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_band", "_key")
    sim = F.round(cosine(F.col("_va"), F.col("_vb")), 6)
    return (a.join(b, ["_band", "_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))
