"""Multimodal operator units (operators/multimodal.py): decode stub,
feature extraction, resize, frame sampling — the Spark-side plumbing is
real (schema, Arrow batching, partitioning); kernels are deterministic
fakes behind injection points (SURVEY §2.9 item 10)."""

import pytest

from pyspark.sql import functions as F

from etl_load_spark.operators.multimodal import (
    attach_metadata, extract_features, fake_decode, fake_resize, real_decode,
    real_resize, resize_media, sample_frames)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(i % 7, i % 7 + 40 + 13 * (i % 5)))) for i in range(20)]
    rows.append((99, None))
    return spark.createDataFrame(rows, "media_id bigint, content binary")


def test_fake_resize_deterministic_and_sized():
    content = bytes(range(200))
    out = fake_resize(content, 8, 8)
    assert len(out) == 64
    assert out == fake_resize(content, 8, 8)
    # nearest-neighbor sample preserves endpoints
    assert out[0] == content[0] and out[-1] == content[-1]
    # null/empty payloads resize to zero-filled target size
    assert fake_resize(None, 4, 4) == bytes(16)
    assert fake_resize(b"", 4, 4) == bytes(16)
    # upsampling also lands on the exact target size
    assert len(fake_resize(b"ab", 8, 8)) == 64


def test_resize_media_schema_and_rows(media):
    out = resize_media(media, width=8, height=8)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "content", "out_width", "out_height", "out_len"]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 21
    assert all(r.out_len == 64 and len(r.content) == 64 for r in rows.values())
    # kernel matches the local function exactly (no Arrow mangling)
    local = fake_resize(bytes(range(0, 40)), 8, 8)
    assert bytes(rows[0].content) == local


def test_resize_media_parallelism(media):
    out = resize_media(media.coalesce(1), width=4, height=4)
    # single-partition input is fanned out to defaultParallelism before decode
    assert out.rdd.getNumPartitions() > 1


def test_extract_features_dim_and_norm(media):
    feats = extract_features(media).collect()
    assert all(r.feat_dim == 16 for r in feats)
    by_id = {r.media_id: r.feature for r in feats}
    assert by_id[0] == pytest.approx(fake_decode(bytes(range(0, 40))))
    assert by_id[99] == [0.0] * 16
    # normalized histogram sums to ~1 for non-null payloads
    assert sum(by_id[0]) == pytest.approx(1.0)


def test_real_kernels_are_marked_stubs():
    with pytest.raises(NotImplementedError):
        real_decode(b"x")
    with pytest.raises(NotImplementedError):
        real_resize(b"x", 2, 2)


def test_attach_metadata_struct(media):
    out = attach_metadata(media, modality="audio", fmt="pcm")
    r = out.filter(F.col("media_id") == 0).collect()[0]
    assert r.meta.modality == "audio" and r.meta.format == "pcm"
    assert r.meta.width is None and r.meta.duration_ms == 40
    null_r = out.filter(F.col("media_id") == 99).collect()[0]
    assert null_r.meta.duration_ms is None


def test_sample_frames_offsets(media):
    out = sample_frames(media, every_n_bytes=16)
    rows = [r for r in out.collect() if r.media_id == 0]
    # 40 bytes / 16 → 2 frames at offsets 0, 16
    assert [(r.frame_no, r.byte_offset) for r in sorted(rows)] == [
        (0, 0), (1, 16)]


def test_chunking_reconciles_with_lengths(spark):
    """Chunk counts and byte totals must reconstruct the source blobs."""
    from pyspark.sql import functions as F
    from etl_load_spark.operators.multimodal import chunk_features, chunk_media
    rows = [(1, b"x" * 5000), (2, b"y" * 2048), (3, b"z" * 10), (4, None)]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    chunks = chunk_media(media, chunk_bytes=2048).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 3 and len(by_id[2]) == 1 and len(by_id[3]) == 1
    assert sum(len(r.chunk) for r in by_id[1]) == 5000
    assert [len(r.chunk) for r in sorted(by_id[1], key=lambda r: r.chunk_no)] \
        == [2048, 2048, 904]
    feats = chunk_features(media, chunk_bytes=2048)
    agg = {r.media_id: r for r in
           feats.groupBy("media_id")
                .agg(F.sum("n_bytes").alias("total"),
                     F.count("*").alias("n")).collect()}
    assert agg[1].total == 5000 and agg[1].n == 3
    assert agg[2].total == 2048 and agg[3].total == 10
    e = {(r.media_id, r.chunk_no): r.energy for r in feats.collect()}
    assert all(0.0 <= v <= 1.0 for v in e.values())
    # single-valued buffer: every byte is 'y' (0x79) -> mean nibble 7/15
    assert abs(e[(2, 0)] - 7.0 / 15) < 1e-9
    assert e[(4, 0)] == 0.0


def test_ahash_exact_copy_recovers_hamming_zero(spark):
    """A byte-identical payload shares all four bands: candidate
    generation and hamming-0 recovery are structural."""
    from etl_load_spark.operators.multimodal import ahash_near_dup_pairs
    payload = bytes(range(200)) * 2
    rows = [(1, payload), (2, payload), (3, bytes(reversed(payload)))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {(r.id_a, r.id_b): r.hamming
           for r in ahash_near_dup_pairs(media).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_ahash_unsampled_byte_change_is_invisible(spark):
    """Only 64 integer-sampled positions feed the signature: flipping a
    byte strictly between sampled indices leaves the hash bit-identical
    (the perceptual-robustness contract of the stand-in sampler)."""
    from etl_load_spark.operators.multimodal import ahash_signatures
    n = 128
    sampled = {(k * (n - 1)) // 63 for k in range(64)}
    hole = next(i for i in range(n) if i not in sampled)
    base = bytearray(range(100, 228))
    mod = bytearray(base)
    mod[hole] = (mod[hole] + 97) % 256
    media = spark.createDataFrame(
        [(1, bytes(base)), (2, bytes(mod))], "media_id long, content binary")
    sigs = {r["_id"]: (r["_b0"], r["_b1"], r["_b2"], r["_b3"])
            for r in ahash_signatures(media).collect()}
    assert sigs[1] == sigs[2]


def test_ahash_degenerate_payloads_excluded(spark):
    from etl_load_spark.operators.multimodal import ahash_near_dup_pairs
    rows = [(1, None), (2, b""), (3, b"x" * 100), (4, b"x" * 100)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {(r.id_a, r.id_b) for r in ahash_near_dup_pairs(media).collect()}
    assert got == {(3, 4)}


def test_ahash_plan_jvm_only(spark, sf_dir):
    """q143's relational path: no Python eval, no cartesian — signature
    is a projection, candidates come from the band equi-join."""
    from etl_load_spark.queries import QUERIES
    plan = (QUERIES["q143_image_near_dup"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ahash_sql_parity_edge_lengths(spark, tmp_path):
    """Signature parity Spark vs the DuckDB replay on adversarial payload
    lengths (1 byte, just-below/at/above the 64-sample count, repeats,
    0x00/0xFF runs) — pins hex/substring/conv indexing and the exact
    integer sampling across engines."""
    import duckdb
    payloads = [bytes([7]), bytes([0]) * 63, bytes(range(64)),
                bytes(range(65)), bytes([255]) * 200,
                bytes([i % 251 for i in range(1000)]),
                b"\x00\xff" * 100]
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    p = str(tmp_path / "media.parquet")
    df.coalesce(1).write.parquet(p)
    from etl_load_spark.operators.multimodal import (ahash_near_dup_sql,
                                                     ahash_signatures)
    got = sorted(tuple(r) for r in ahash_signatures(df).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW media AS SELECT * FROM '{p}/*.parquet'")
    sql = ahash_near_dup_sql(table="media", id_col="media_id",
                             content_expr="content")
    sig_cte = sql[:sql.index("bands AS")] + (
        "sel AS (SELECT 1) SELECT _id, _b0, _b1, _b2, _b3 FROM sig "
        "ORDER BY _id")
    want = sorted(tuple(r) for r in con.sql(sig_cte).fetchall())
    assert got == want
