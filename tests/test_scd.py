"""SCD2 merge semantics: no-op updates don't fork, changed rows close +
reopen, new keys insert, null attributes compare null-safely, and applying
the same batch twice is idempotent."""

from pyspark.sql import functions as F

from etl_load_spark.operators.scd import as_scd2, scd2_merge


def _dim(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0)],
        "k bigint, seg string, bal double")
    return as_scd2(base, "2020-01-01")


def _merge(dim, updates):
    return scd2_merge(dim, updates, ["k"], ["seg", "bal"], "2021-06-01")


def test_changed_new_noop_and_null_attrs(spark):
    updates = spark.createDataFrame(
        [(1, "a", 99.0),    # changed balance -> fork
         (2, "b", None),    # identical incl. null bal -> NO fork
         (4, "d", 40.0)],   # new key -> insert
        "k bigint, seg string, bal double")
    out = _merge(_dim(spark), updates).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert len(by_key[1]) == 2
    closed = next(r for r in by_key[1] if not r.is_current)
    assert str(closed.valid_to) == "2021-06-01" and closed.bal == 10.0
    fresh = next(r for r in by_key[1] if r.is_current)
    assert str(fresh.valid_from) == "2021-06-01" and fresh.bal == 99.0
    assert fresh.valid_to is None
    assert len(by_key[2]) == 1 and by_key[2][0].is_current  # null == null
    assert len(by_key[3]) == 1 and by_key[3][0].is_current  # not in batch
    assert len(by_key[4]) == 1 and by_key[4][0].is_current
    assert str(by_key[4][0].valid_from) == "2021-06-01"


def test_null_transition_forks(spark):
    updates = spark.createDataFrame([(2, "b", 5.0)],
                                    "k bigint, seg string, bal double")
    out = _merge(_dim(spark), updates).collect()
    rows2 = [r for r in out if r.k == 2]
    assert len(rows2) == 2  # null -> 5.0 is a change
    assert {r.is_current for r in rows2} == {True, False}


def test_merge_is_idempotent(spark):
    updates = spark.createDataFrame(
        [(1, "a", 99.0), (4, "d", 40.0)],
        "k bigint, seg string, bal double")
    once = _merge(_dim(spark), updates)
    twice = _merge(once, updates)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b  # same batch re-applied changes nothing


def test_history_rows_pass_through(spark):
    updates = spark.createDataFrame([(1, "a", 99.0)],
                                    "k bigint, seg string, bal double")
    once = _merge(_dim(spark), updates)
    # second merge touching key 1 again: its history row must survive
    upd2 = spark.createDataFrame([(1, "a", 123.0)],
                                 "k bigint, seg string, bal double")
    out = scd2_merge(once, upd2, ["k"], ["seg", "bal"], "2022-01-01").collect()
    rows1 = sorted((str(r.valid_from), str(r.valid_to), r.is_current, r.bal)
                   for r in out if r.k == 1)
    assert rows1 == [
        ("2020-01-01", "2021-06-01", False, 10.0),
        ("2021-06-01", "2022-01-01", False, 99.0),
        ("2022-01-01", "None", True, 123.0)]
