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

from pyspark.sql import DataFrame, functions as F

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
