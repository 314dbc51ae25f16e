"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The container has no image/audio codecs, so the decode kernels are STUBS
behind ``decoder=`` injection points (a deterministic fake is provided for
tests); the Spark-side plumbing — schema, batch iteration, partitioning —
is real. On a cluster with PIL/ffmpeg available, swap the decoder and
nothing else changes.

Design notes for 100 TB:
  - binary payloads ride in their own column; metadata is a struct column so
    filters on (modality, width, duration) prune without touching bytes.
  - mapInPandas streams Arrow batches — bounded memory per task regardless
    of payload count; spark.sql.execution.arrow.maxRecordsPerBatch caps
    batch size for large blobs.
  - derived features (embeddings, histograms) come back as array columns,
    feeding the similarity operators directly.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

MEDIA_SCHEMA = ("media_id bigint, content binary, "
                "meta struct<modality:string, format:string, width:int, "
                "height:int, duration_ms:int>")

FEATURE_SCHEMA = "media_id bigint, feature array<float>, feat_dim int"


def fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio decoder: a 16-bin byte
    histogram, normalized. Vectorized (numpy) — a per-byte Python loop made
    the decode stage the pipeline bottleneck. Replace with a real kernel in
    production."""
    if content is None:
        return [0.0] * 16
    import numpy as np
    arr = np.frombuffer(content, dtype=np.uint8)
    n = max(len(arr), 1)
    hist = np.bincount(arr >> 4, minlength=16)[:16]
    return (hist / n).tolist()


def real_decode(content: bytes) -> list[float]:
    """The production decode slot. Requires codec libraries not present in
    this container."""
    raise NotImplementedError(
        "image/audio decode requires PIL/soundfile/ffmpeg — inject a decoder "
        "or use fake_decode for plumbing tests")


def extract_features(media: DataFrame,
                     decoder: Callable[[bytes], list[float]] = fake_decode,
                     content_col: str = "content",
                     id_col: str = "media_id",
                     min_parallelism: int | None = None) -> DataFrame:
    """binary content → feature vector via Arrow-batched mapInPandas.

    Decode is CPU-bound Python: parallelism equals partition count, and a
    small/compacted source can arrive as one partition — repartition up to
    the cluster's default parallelism first (a corpus-linear shuffle buys
    N-way decode; at 100 TB the source is already many partitions and this
    is a no-op)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[content_col].map(decoder)
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "feature": feats,
                "feat_dim": feats.map(len).astype("int32"),
            })

    sc = media.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if media.rdd.getNumPartitions() < target:
        media = media.repartition(target)
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def attach_metadata(df: DataFrame, content_col: str = "content",
                    modality: str = "image", fmt: str = "raw") -> DataFrame:
    """Wrap a binary column with the typed metadata struct (dimensions
    unknown until decode → null, filled by the decode stage in production)."""
    return df.withColumn("meta", F.struct(
        F.lit(modality).alias("modality"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.col(content_col).isNotNull(),
               F.length(content_col)).cast("int").alias("duration_ms")))


RESIZED_SCHEMA = ("media_id bigint, content binary, out_width int, "
                  "out_height int, out_len int")


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize kernel: nearest-neighbor
    sample of the raw byte stream down/up to width*height bytes. Replace
    with a real PIL/cv2 kernel in production — the Spark plumbing
    (schema, Arrow batching, partitioning) is identical either way."""
    import numpy as np
    if content is None or len(content) == 0:
        return bytes(width * height)
    arr = np.frombuffer(content, dtype=np.uint8)
    idx = np.linspace(0, len(arr) - 1, num=width * height).astype(np.int64)
    return arr[idx].tobytes()


def real_resize(content: bytes, width: int, height: int) -> bytes:
    """The production resize slot. Requires image libraries not present in
    this container."""
    raise NotImplementedError(
        "image resize requires PIL/opencv — inject a resizer or use "
        "fake_resize for plumbing tests")


def resize_media(media: DataFrame, width: int, height: int,
                 resizer: Callable[[bytes, int, int], bytes] = fake_resize,
                 content_col: str = "content",
                 id_col: str = "media_id",
                 min_parallelism: int | None = None) -> DataFrame:
    """binary content → fixed-dimension binary via Arrow-batched mapInPandas
    (the resize stage of an image pipeline; reference has no media ops —
    north-star extension per SURVEY §2.9 item 10).

    100 TB: same posture as extract_features — CPU-bound Python kernel, so
    parallelism = partition count; output payloads are fixed-size
    (width*height), so downstream partition sizing is predictable
    regardless of input skew in blob sizes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[content_col].map(lambda c: resizer(c, width, height))
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "content": out,
                "out_width": width,
                "out_height": height,
                "out_len": out.map(len).astype("int32"),
            })

    sc = media.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if media.rdd.getNumPartitions() < target:
        media = media.repartition(target)
    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024,
                  content_col: str = "content",
                  id_col: str = "media_id") -> DataFrame:
    """Frame-sampling stub: emit one row per sampled offset (stands in for
    video frame extraction; same explode-shaped output a real sampler has).
    Spark-side: posexplode of an offset sequence — no Python."""
    n_frames = F.greatest((F.length(content_col) / every_n_bytes).cast("int"), F.lit(1))
    offsets = F.sequence(F.lit(0), n_frames - 1)
    return (media.select(F.col(id_col), F.posexplode(offsets).alias("frame_no", "_i"))
            .select(id_col, "frame_no",
                    (F.col("_i") * every_n_bytes).alias("byte_offset")))


CHUNK_FEATURE_SCHEMA = ("media_id bigint, chunk_no int, n_bytes int, "
                        "energy double")


def chunk_media(media: DataFrame, chunk_bytes: int = 2048,
                content_col: str = "content",
                id_col: str = "media_id") -> DataFrame:
    """Fixed-size chunking of a binary stream column (the audio analogue
    of frame sampling: PCM windows of ``chunk_bytes`` ≙ a fixed duration
    at a given sample rate/width). ALL JVM-side: posexplode of the chunk
    index + substring slicing of the binary — the chunk relation is
    codegen'd, shuffle-free, and its row count is plan-visible
    (len/chunk_bytes per media row). Python only ever sees one chunk at a
    time downstream, so executor memory is bounded by chunk_bytes ×
    Arrow batch size regardless of blob-size skew.
    """
    n_chunks = F.greatest(F.ceil(F.length(content_col) / F.lit(chunk_bytes))
                          .cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (media
            .select(F.col(id_col), F.col(content_col),
                    F.posexplode(idx).alias("chunk_no", "_i"))
            .select(id_col, "chunk_no",
                    F.substring(F.col(content_col),
                                F.col("chunk_no") * chunk_bytes + 1,
                                chunk_bytes).alias("chunk")))


def fake_energy(chunk: bytes) -> float:
    """Deterministic stand-in for a real PCM RMS-energy kernel: mean
    high-nibble of the raw bytes scaled to [0, 1]. Computed as ONE IEEE
    division of two exactly-representable integers, so any engine that
    replays the integer nibble sum reproduces the double bit-for-bit
    (q100's generated DuckDB oracle does, via hex-pair extraction).
    Replace with a real soundfile/scipy kernel in production."""
    if chunk is None or len(chunk) == 0:
        return 0.0
    import numpy as np
    arr = np.frombuffer(chunk, dtype=np.uint8)
    return int((arr >> 4).sum(dtype=np.int64)) / (15.0 * len(arr))


def chunk_features(media: DataFrame, chunk_bytes: int = 2048,
                   energy_fn: Callable[[bytes], float] = fake_energy,
                   content_col: str = "content",
                   id_col: str = "media_id") -> DataFrame:
    """Per-chunk feature extraction (RMS-energy-shaped): chunk JVM-side,
    then one Arrow-batched pass computes a scalar per chunk through the
    injected kernel (deterministic fake here; a real audio decoder is a
    drop-in — reference treats media as opaque bytes, so the engine owns
    only the plumbing: schema, batching, partitioning)."""
    from typing import Iterator

    import pandas as pd

    chunks = chunk_media(media, chunk_bytes, content_col, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "chunk_no": pdf["chunk_no"],
                "n_bytes": [len(c) if c is not None else 0
                            for c in pdf["chunk"]],
                "energy": [energy_fn(c) for c in pdf["chunk"]]})

    return chunks.mapInPandas(run, schema=CHUNK_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Image near-duplicate detection: 64-bit average hash + pigeonhole bands
# ---------------------------------------------------------------------------

def ahash_signatures(media: DataFrame, id_col: str = "media_id",
                     content_col: str = "content") -> DataFrame:
    """(_id, _b0.._b3): 64-bit average-hash (aHash) of a binary payload
    as FOUR 16-bit band ints — the perceptual-dedup signature, PURE JVM
    expressions, bit-replayable in SQL (ahash_near_dup_sql).

    "Pixels" are 64 bytes integer-sampled at idx_k = (k·(n−1)) div 63 —
    exact integer arithmetic, so both engines pick identical bytes (a
    float linspace would round differently at divisible boundaries).
    Byte values come from hex(content) pairs (the q37 nibble trick,
    extended to full bytes via conv(hex, 16, 10)). Bit k is set iff
    64·p_k > Σp — an exact integer comparison, no float mean. Keeping
    the signature as four ints (never one signed long) lets band
    extraction and Hamming (Σ bit_count(xor)) skip sign-bit assembly.

    A REAL image aHash resizes decoded luma to 8×8 first; here the
    sampling IS the deterministic stand-in resize (same contract as
    fake_decode/fake_resize — production swaps in decode+resize and the
    banding/verify plumbing is unchanged). Empty/NULL payloads carry no
    visual signal and are excluded (the shingle-relation rule:
    degenerates pair with everything or nothing — exact dedup still
    catches byte-identical empties)."""
    d = (media.filter(F.col(content_col).isNotNull()
                      & (F.length(content_col) > 0))
         .select(F.col(id_col).alias("_id"),
                 F.hex(content_col).alias("_hx"),
                 F.length(content_col).cast("bigint").alias("_n")))
    # exploded form, NOT 64 projected columns: CollapseProject would
    # inline each _p's conv(substring(hex)) tree into the sum AND every
    # threshold bit — ~4000 hex() evaluations of the full payload per
    # row (measured: the projected form ran 4.4s at sf0.1). Exploding
    # (_id, k, p) rows computes each sampled byte ONCE. The per-id
    # reduction is a window sum (the threshold total) + 4 conditional
    # band sums over the SAME _id partitioning — one exchange, ~5
    # when-evals per exploded row. The previous 65-buffer pivot
    # (1 sum + 64 max(when(_k==k)) aggregates) evaluated 64 predicates
    # per exploded row ≈ 4096 per document and ran 2.6× slower
    # (r13: signature stage 2.34 s → 0.90 s at sf0.1).
    ex = (d.select("_id", "_n", "_hx",
                   F.explode(F.sequence(F.lit(0), F.lit(63))).alias("_k"))
          .select("_id", "_k",
                  F.conv(F.substring(
                      "_hx",
                      (F.expr("(_k * (_n - 1)) div 63") * 2 + 1).cast("int"),
                      2), 16, 10).cast("int").alias("_p")))
    row = ex.withColumn(
        "_tot", F.sum("_p").over(Window.partitionBy("_id")))
    term = F.when(F.col("_p") * 64 > F.col("_tot"),
                  F.expr("shiftleft(1, _k % 16)")).otherwise(F.lit(0))
    return row.groupBy("_id").agg(
        *[F.sum(F.when((F.col("_k") >= 16 * b) & (F.col("_k") < 16 * (b + 1)),
                       term).otherwise(F.lit(0))).cast("int").alias(f"_b{b}")
          for b in range(4)])


def ahash_near_dup_pairs(media: DataFrame, id_col: str = "media_id",
                         content_col: str = "content",
                         max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs: aHash signature + 4×16-bit pigeonhole bands.

    Any pair within Hamming ≤ 3 of 64 bits shares at least one exact
    band, so candidates come from an equi-join on (band_index,
    band_value) — never all-pairs — and the verify is
    Σ_bands bit_count(xor) ≤ max_hamming. Same scale shape as SimHash
    text dedup (dedup.py): one shared Exchange for both join sides,
    signature-only shuffle rows, payloads never move."""
    sigs = ahash_signatures(media, id_col, content_col)
    exploded = (sigs.select(
        "_id", "_b0", "_b1", "_b2", "_b3",
        F.posexplode(F.array("_b0", "_b1", "_b2", "_b3"))
        .alias("_band", "_val"))
        .repartition("_band", "_val"))
    a = exploded.select(F.col("_id").alias("id_a"),
                        *[F.col(f"_b{b}").alias(f"_a{b}") for b in range(4)],
                        "_band", "_val")
    b = exploded.select(F.col("_id").alias("id_b"),
                        *[F.col(f"_b{b}").alias(f"_c{b}") for b in range(4)],
                        "_band", "_val")
    ham = None
    for i in range(4):
        h = F.bit_count(F.col(f"_a{i}").bitwiseXOR(F.col(f"_c{i}")))
        ham = h if ham is None else ham + h
    return (a.join(b, ["_band", "_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def ahash_near_dup_sql(table: str = "documents", id_col: str = "doc_id",
                       content_expr: str = "encode(text)",
                       max_hamming: int = 3) -> str:
    """The ENTIRE ahash_near_dup_pairs pipeline as one DuckDB oracle SQL
    statement — generated from the same constants as the Column form so
    the 64 byte-samples, the 64 threshold bits and the band assembly
    cannot drift (the simhash_near_dup_sql pattern)."""
    p_cols = ",\n       ".join(
        f"CAST('0x' || substr(_hx, CAST(({k} * (_n - 1)) // 63 AS BIGINT)"
        f" * 2 + 1, 2) AS INT) AS _p{k}"
        for k in range(64))
    total = " + ".join(f"_p{k}" for k in range(64))
    band_exprs = []
    for b in range(4):
        terms = " + ".join(
            f"(CASE WHEN _p{16 * b + j} * 64 > _sum THEN {1 << j} "
            f"ELSE 0 END)" for j in range(16))
        band_exprs.append(f"CAST({terms} AS INT) AS _b{b}")
    bands_sql = ",\n       ".join(band_exprs)
    ham = " + ".join(f"bit_count(xor(a._b{i}, c._b{i}))" for i in range(4))
    return f"""
WITH src AS (
  SELECT {id_col} AS _id, hex({content_expr}) AS _hx,
         octet_length({content_expr}) AS _n
  FROM {table}
  WHERE {content_expr} IS NOT NULL AND octet_length({content_expr}) > 0),
p AS (SELECT _id,
       {p_cols}
      FROM src),
s AS (SELECT *, {total} AS _sum FROM p),
sig AS (SELECT _id,
       {bands_sql}
       FROM s),
bands AS (SELECT _id, _b0, _b1, _b2, _b3, u._band,
                 CASE u._band WHEN 0 THEN _b0 WHEN 1 THEN _b1
                              WHEN 2 THEN _b2 ELSE _b3 END AS _val
          FROM sig CROSS JOIN (SELECT unnest(range(4)) AS _band) u),
pairs AS (SELECT DISTINCT a._id AS id_a, c._id AS id_b,
                 a._b0, a._b1, a._b2, a._b3,
                 c._b0 AS _c0, c._b1 AS _c1, c._b2 AS _c2, c._b3 AS _c3
          FROM bands a JOIN bands c
            ON a._band = c._band AND a._val = c._val AND a._id < c._id),
h AS (SELECT id_a, id_b,
             CAST(bit_count(xor(_b0, _c0)) + bit_count(xor(_b1, _c1))
                  + bit_count(xor(_b2, _c2)) + bit_count(xor(_b3, _c3))
                AS INT) AS hamming
      FROM pairs)
SELECT id_a, id_b, hamming FROM h
WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b
"""
