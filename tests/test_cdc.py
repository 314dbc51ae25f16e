"""CDC Type-1 apply (operators/cdc.py) edge semantics."""

from etl_load_spark.operators.cdc import apply_changes, latest_changes


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_delete_insert(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    ch = spark.createDataFrame(
        [(2, "b2", "U", 10), (3, "c", "D", 10), (4, "d", "I", 10)],
        "k long, v string, op string, seq long")
    out = apply_changes(snap, ch, keys=["k"], seq_col="seq")
    assert _rows(out) == [(1, "a"), (2, "b2"), (4, "d")]


def test_last_writer_wins_and_same_seq_delete_wins(spark):
    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ch = spark.createDataFrame(
        [(1, "a1", "U", 1), (1, "a2", "U", 5), (1, "a3", "U", 3),
         (2, "b9", "U", 7), (2, "bX", "D", 7)],
        "k long, v string, op string, seq long")
    out = apply_changes(snap, ch, keys=["k"], seq_col="seq")
    # key 1: seq 5 wins; key 2: same-seq D beats U → row gone
    assert _rows(out) == [(1, "a2")]


def test_empty_feed_is_identity(spark):
    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    ch = spark.createDataFrame([], "k long, v string, op string, seq long")
    out = apply_changes(snap, ch, keys=["k"], seq_col="seq")
    assert _rows(out) == [(1, "a")]


def test_latest_changes_composite_key(spark):
    ch = spark.createDataFrame(
        [(1, "x", "v1", "U", 1), (1, "x", "v2", "U", 2),
         (1, "y", "w1", "U", 9)],
        "k long, sub string, v string, op string, seq long")
    last = latest_changes(ch, ["k", "sub"], "seq")
    assert _rows(last.select("k", "sub", "v")) == [
        (1, "x", "v2"), (1, "y", "w1")]
