"""As-of join operator: backward match, exact-ts tie, tolerance, inner."""
import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from etl_load_spark.operators.asof_join import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame([
        Row(k="a", t=ts(5), lv="a5"),
        Row(k="a", t=ts(10), lv="a10"),
        Row(k="a", t=ts(1), lv="a1"),     # before any right row
        Row(k="b", t=ts(7), lv="b7"),
        Row(k="c", t=ts(3), lv="c3"),     # key with no right rows
    ])
    right = spark.createDataFrame([
        Row(k="a", rt=ts(2), rv=20),
        Row(k="a", rt=ts(5), rv=50),      # exact-ts tie with left a5
        Row(k="a", rt=ts(8), rv=80),
        Row(k="b", rt=ts(6), rv=60),
    ])
    return left, right


def collect(df):
    return {(r.k, r.t): (r.rt, r.rv) for r in df.collect()}


def test_backward_match_and_exact_tie(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt")
    got = collect(out)
    assert got[("a", ts(5))] == (ts(5), 50)     # exact ts matches
    assert got[("a", ts(10))] == (ts(8), 80)    # latest prior
    assert got[("a", ts(1))] == (None, None)    # nothing prior
    assert got[("b", ts(7))] == (ts(6), 60)
    assert got[("c", ts(3))] == (None, None)    # keyless
    assert len(got) == 5


def test_inner_drops_unmatched(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    how="inner")
    got = collect(out)
    assert set(got) == {("a", ts(5)), ("a", ts(10)), ("b", ts(7))}


def test_tolerance_nulls_stale_matches(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    tolerance=F.expr("INTERVAL 1 SECOND"))
    got = collect(out)
    assert got[("a", ts(5))] == (ts(5), 50)     # 0s old: kept
    assert got[("b", ts(7))] == (ts(6), 60)     # 1s old: kept
    assert got[("a", ts(10))] == (None, None)   # 2s old: too stale


def test_payload_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right.withColumnRenamed("rv", "lv"),
                  on=["k"], left_ts="t", right_ts="rt")


def test_single_shuffle_no_join(frames):
    """Scale contract: the plan is window-over-union — exactly one
    Exchange on the key, and no join operator at all."""
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_null_keys_never_match_like_sql_asof(spark):
    """SQL ASOF semantics: `l.k = r.k AND l.ts >= r.ts` is never true
    through a NULL key or NULL right_ts — but window PARTITION BY groups
    NULLs as equal, so the union-window form must drop NULL-key/NULL-ts
    right rows or it silently invents matches. Differential vs DuckDB's
    native ASOF LEFT JOIN on null-injected data."""
    import duckdb
    left = spark.createDataFrame([
        Row(k="a", t=ts(5), lv="a5"),
        Row(k=None, t=ts(6), lv="n6"),    # NULL-key left: must stay unmatched
        Row(k="a", t=None, lv="an"),      # NULL-ts left: must stay unmatched
    ])
    right = spark.createDataFrame([
        Row(k="a", rt=ts(2), rv=20),
        Row(k=None, rt=ts(3), rv=30),     # NULL-key right: matches nothing
        Row(k="a", rt=None, rv=40),       # NULL-ts right: matches nothing
    ])
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt")
    got = sorted(((r.k, r.t, r.rt, r.rv) for r in out.collect()),
                 key=str)
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    # The oracle is the PREDICATE formulation (argmax over rows where
    # `l.k = r.k AND r.rt <= l.t` holds under three-valued logic), not
    # DuckDB's native ASOF JOIN: DuckDB's sort-based ASOF matches NULL
    # order keys to each other by total order — an implementation
    # artifact, not the join-condition contract.
    want = sorted(((x[0], None if x[1] is None else x[1].replace(tzinfo=None),
                    None if x[2] is None else x[2].replace(tzinfo=None), x[3])
                   for x in con.sql("""
        SELECT l.k, l.t, x.rt, x.rv FROM l LEFT JOIN LATERAL (
            SELECT rt, rv FROM r WHERE r.k = l.k AND r.rt <= l.t
            ORDER BY rt DESC LIMIT 1) x ON TRUE""").fetchall()),
                 key=str)
    got = sorted(((k, None if t is None else t.replace(tzinfo=None),
                   None if rt is None else rt.replace(tzinfo=None), rv)
                  for k, t, rt, rv in got), key=str)
    assert got == want
    assert ("a", ts(5), ts(2), 20) in got          # the real match survives
    assert all(rv is None for k, t, rt, rv in got if k is None or t is None)
