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


def test_cdc_scd2_apply_semantics(spark):
    """Hand-built walk of the APPLY CHANGES semantics: no-op suppression,
    multi-version batches, delete closing, dead-key delete no-op,
    post-delete reopen, same-seq D-beats-U tie, untouched/no-op keys kept
    bit-identically, history passthrough, new keys."""
    from etl_load_spark.operators.scd import cdc_scd2_apply
    dim = spark.createDataFrame(
        [(1, "A", 0, None, True),
         (1, "Z", -5, 0, False),        # history row
         (2, "B", 0, None, True),       # untouched
         (3, "C", 0, None, True)],      # no-op updates only
        "k long, attr string, valid_from long, valid_to long,"
        " is_current boolean")
    feed = spark.createDataFrame(
        [(1, "A", 10, "U"),    # no-op vs the open version
         (1, "B", 20, "U"),    # real change
         (1, "B", 30, "D"),    # closes at 30
         (1, "B", 35, "D"),    # delete on dead key: no-op
         (1, "C", 40, "I"),    # reopen after delete
         (3, "C", 50, "U"),    # no-op
         (4, "N", 15, "I"),    # new key
         (4, "N2", 25, "U"),   # second version, same batch
         (5, "X", 11, "D"),    # delete of an absent key
         (6, "Y", 7, "U"),
         (6, "Y", 7, "D")],    # same-seq: D wins, key 6 never exists
        "k long, attr string, seq long, op string")
    got = sorted(map(tuple,
                     cdc_scd2_apply(dim, feed, ["k"], ["attr"],
                                    "seq").collect()))
    assert got == [
        (1, "A", 0, 20, False),
        (1, "B", 20, 30, False),
        (1, "C", 40, None, True),
        (1, "Z", -5, 0, False),
        (2, "B", 0, None, True),
        (3, "C", 0, None, True),
        (4, "N", 15, 25, False),
        (4, "N2", 25, None, True),
    ]


def test_cdc_scd2_apply_rejects_unknown_op(spark):
    import pytest
    from etl_load_spark.operators.scd import cdc_scd2_apply
    dim = spark.createDataFrame(
        [(1, "A", 0, None, True)],
        "k long, attr string, valid_from long, valid_to long,"
        " is_current boolean")
    feed = spark.createDataFrame([(1, "B", 10, "UPSERT")],
                                 "k long, attr string, seq long, op string")
    with pytest.raises(Exception, match="op must be I/U/D"):
        cdc_scd2_apply(dim, feed, ["k"], ["attr"], "seq").collect()


def test_dim_column_contract_validated_up_front(spark):
    """ADVICE r5 regression: a dimension with an extra audit column (or a
    missing meta column) must fail FAST with a descriptive ValueError on
    both merge operators, not an unresolved-column analysis error at the
    final select(*dim.columns)."""
    import pytest
    from etl_load_spark.operators.scd import cdc_scd2_apply, scd2_merge
    dim_extra = spark.createDataFrame(
        [(1, "A", 0, None, True, "loader-7")],
        "k long, attr string, valid_from long, valid_to long,"
        " is_current boolean, load_src string")
    feed = spark.createDataFrame([(1, "B", 10, "U")],
                                 "k long, attr string, seq long, op string")
    with pytest.raises(ValueError, match="unexpected=\\['load_src'\\]"):
        cdc_scd2_apply(dim_extra, feed, ["k"], ["attr"], "seq")
    with pytest.raises(ValueError, match="unexpected=\\['load_src'\\]"):
        scd2_merge(dim_extra, feed.select("k", "attr"), ["k"], ["attr"],
                   "2021-06-01")
    dim_missing = spark.createDataFrame(
        [(1, "A", 0, True)],
        "k long, attr string, valid_from long, is_current boolean")
    with pytest.raises(ValueError, match="missing=\\['valid_to'\\]"):
        cdc_scd2_apply(dim_missing, feed, ["k"], ["attr"], "seq")
    # declaring the extra column as version-tracked is the sanctioned path
    feed2 = spark.createDataFrame(
        [(1, "B", "loader-8", 10, "U")],
        "k long, attr string, load_src string, seq long, op string")
    out = cdc_scd2_apply(dim_extra, feed2, ["k"], ["attr", "load_src"],
                         "seq")
    assert {r.load_src for r in out.collect()} == {"loader-7", "loader-8"}


def test_dim_column_contract_case_insensitive(spark):
    """ADVICE r6 regression: Spark's default resolver is case-insensitive
    (spark.sql.caseSensitive=false), so a dimension whose meta columns
    differ only in casing ('Valid_From') merges fine and must pass the
    up-front contract check instead of being reported as both missing
    and unexpected."""
    from etl_load_spark.operators.scd import scd2_merge
    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01", None, True)],
        "k long, attr string, Valid_From string, VALID_TO string,"
        " Is_Current boolean").selectExpr(
        "k", "attr", "CAST(Valid_From AS DATE) AS Valid_From",
        "CAST(VALID_TO AS DATE) AS VALID_TO", "Is_Current")
    updates = spark.createDataFrame([(1, "B")], "k long, attr string")
    out = scd2_merge(dim, updates, ["k"], ["attr"], "2021-06-01").collect()
    assert len(out) == 2 and {r.attr for r in out} == {"A", "B"}


def test_dim_column_contract_rejects_case_duplicates(spark):
    """ADVICE r7 regression: a dimension carrying BOTH valid_to and
    VALID_TO slipped past the casefold set compare (missing/extra both
    empty) and then died mid-merge with the ambiguous-column analysis
    error the validator exists to pre-empt. The count check must catch
    the collision up front and name the colliding column."""
    import pytest

    from etl_load_spark.operators.scd import scd2_merge
    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01", None, None, True)],
        "k long, attr string, valid_from string, valid_to string,"
        " VALID_TO2 string, is_current boolean") \
        .withColumnRenamed("VALID_TO2", "VALID_TO")
    updates = spark.createDataFrame([(1, "B")], "k long, attr string")
    with pytest.raises(ValueError, match="case-duplicate.*valid_to"):
        scd2_merge(dim, updates, ["k"], ["attr"], "2021-06-01")


def test_dim_column_contract_duplicate_reported_alongside_missing(spark):
    """ADVICE r8 regression: a dimension with BOTH a case-duplicate column
    and a missing/extra column previously reported only the missing/extra
    error — the collision stayed hidden until the next attempt. The
    missing/extra message must now mention the duplicates too."""
    import pytest

    from etl_load_spark.operators.scd import scd2_merge
    # valid_to duplicated AND is_current missing AND an extra audit column
    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01", None, None, "loader-7")],
        "k long, attr string, valid_from string, valid_to string,"
        " VALID_TO2 string, load_src string") \
        .withColumnRenamed("VALID_TO2", "VALID_TO")
    updates = spark.createDataFrame([(1, "B")], "k long, attr string")
    with pytest.raises(ValueError,
                       match=r"(?s)missing=\['is_current'\].*"
                             r"unexpected=\['load_src'\].*"
                             r"case-duplicate columns \['valid_to'\]"):
        scd2_merge(dim, updates, ["k"], ["attr"], "2021-06-01")


def test_dim_column_contract_spec_side_duplicates_blame_the_spec(spark):
    """ADVICE r8 regression: when key_cols/attr_cols THEMSELVES contain
    case-duplicate names, the old branch raised with an empty duplicate
    list ("case-duplicate columns []") blaming the dimension for a spec
    problem. The validator must name the spec as the culprit instead."""
    import pytest

    from etl_load_spark.operators.scd import scd2_merge
    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01", None, True)],
        "k long, attr string, valid_from string, valid_to string,"
        " is_current boolean")
    updates = spark.createDataFrame([(1, "B")], "k long, attr string")
    with pytest.raises(ValueError, match=r"key_cols/attr_cols themselves "
                                         r"contain case-duplicate names "
                                         r"\['attr'\]"):
        scd2_merge(dim, updates, ["k"], ["attr", "ATTR"], "2021-06-01")
    # repeating a META column in attr_cols is the same spec bug
    with pytest.raises(ValueError, match="key_cols/attr_cols"):
        scd2_merge(dim, updates, ["k"], ["attr", "valid_to"], "2021-06-01")
