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


def test_apply_changes_matches_python_fold(spark):
    """Differential property test: for random change feeds, apply_changes
    must equal an independent sequential Python fold of the same feed.
    One Spark job per batch of generated feeds (hypothesis examples are
    pre-drawn so Spark runs once per example set)."""
    from hypothesis import given, settings, strategies as st

    keys = st.integers(min_value=0, max_value=6)
    ops = st.sampled_from(["I", "U", "D"])

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(keys, st.text("ab", max_size=2), ops),
                    max_size=12))
    def check(feed):
        snap_rows = [(k, f"s{k}") for k in range(4)]
        # seq = position in the feed (unique, monotone)
        ch_rows = [(k, v, op, i) for i, (k, v, op) in enumerate(feed)]
        # reference: sequential fold, last write wins
        state = dict(snap_rows)
        for k, v, op in feed:
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v
        snap = spark.createDataFrame(snap_rows, "k long, v string")
        ch = spark.createDataFrame(
            ch_rows, "k long, v string, op string, seq long") \
            if ch_rows else spark.createDataFrame(
                [], "k long, v string, op string, seq long")
        got = sorted(tuple(r) for r in
                     apply_changes(snap, ch, ["k"], "seq").collect())
        assert got == sorted(state.items())

    check()
