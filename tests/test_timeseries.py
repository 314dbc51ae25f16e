"""Gap-fill operator: dense grid, LOCF, linear interpolation, edges.

The hand fixtures pin the FILL CONTRACT (Timescale gapfill/locf/
interpolate semantics) row by row; q172's oracle-parity gate in
test_entry.py separately certifies the full query at sf_dir scale.
"""
import datetime as dt

import pytest
from pyspark.sql import Row

from etl_load_spark.operators.timeseries import gapfill


def d(day, hour=0):
    return dt.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture(scope="module")
def filled(spark):
    """Two series over a global grid of Jan 1–7 (7 daily buckets).

    - series 1: actuals on days 1, 2, 5 (values 10, 20, 50 — the day-5
      bucket averages two events 40 and 60), then a trailing gap;
      the day-3/4 gap interpolates the 20 → 50 segment.
    - series 2: first actual on day 3 (leading gap), second on day 7
      with value equal to day 3's (flat interpolation), and an
      interior 3-day gap whose step is NOT an integer multiple of the
      value delta (rounding path).
    """
    events = spark.createDataFrame([
        Row(user_id=1, ts=d(1, 6), value=10.0),
        Row(user_id=1, ts=d(2, 1), value=20.0),
        Row(user_id=1, ts=d(5, 3), value=40.0),
        Row(user_id=1, ts=d(5, 9), value=60.0),
        Row(user_id=2, ts=d(3, 12), value=7.0),
        Row(user_id=2, ts=d(7, 0), value=8.0),
    ])
    rows = gapfill(events).collect()
    return {(r.user_id, r.bucket_ts.day): (r.val, r.locf_val, r.interp_val)
            for r in rows}


def test_dense_global_grid(filled):
    # 2 series x 7 buckets, every (series, day) present exactly once
    assert len(filled) == 14
    assert {k[1] for k in filled} == set(range(1, 8))


def test_actuals_pass_through(filled):
    assert filled[(1, 1)] == (10.0, 10.0, 10.0)
    assert filled[(1, 2)] == (20.0, 20.0, 20.0)
    # day-5 bucket averages the two events: (40 + 60) / 2
    assert filled[(1, 5)] == (50.0, 50.0, 50.0)


def test_interior_gap_locf_and_interp(filled):
    # series 1, days 3-4: locf carries 20; interp blends 20 -> 50 over
    # the 3-day segment (day 3 = 20 + 30*(1/3), day 4 = 20 + 30*(2/3))
    assert filled[(1, 3)] == (None, 20.0, 30.0)
    assert filled[(1, 4)] == (None, 20.0, 40.0)


def test_trailing_gap_locf_carries_interp_null(filled):
    for day in (6, 7):
        assert filled[(1, day)] == (None, 50.0, None)


def test_leading_gap_all_null(filled):
    for day in (1, 2):
        assert filled[(2, day)] == (None, None, None)


def test_noninteger_step_rounds_half_up(filled):
    # series 2: 7.0 -> 8.0 over 4 days; exact steps 7.25, 7.5, 7.75.
    # Scale-4 fixed point represents these exactly; the half-up rule is
    # pinned by day 5's x.5 midpoint at scale 1 (exact at scale 4).
    assert filled[(2, 4)] == (None, 7.0, 7.25)
    assert filled[(2, 5)] == (None, 7.0, 7.5)
    assert filled[(2, 6)] == (None, 7.0, 7.75)
    assert filled[(2, 7)] == (8.0, 8.0, 8.0)


def test_single_point_series(spark):
    # one actual: that bucket keeps its value, locf carries forward,
    # interp is NULL off the observed range in BOTH directions
    events = spark.createDataFrame([
        Row(user_id=1, ts=d(1), value=5.0),
        Row(user_id=1, ts=d(3), value=5.0),
        Row(user_id=2, ts=d(2), value=9.0),
    ])
    got = {(r.user_id, r.bucket_ts.day): (r.val, r.locf_val, r.interp_val)
           for r in gapfill(events).collect()}
    assert got[(2, 1)] == (None, None, None)
    assert got[(2, 2)] == (9.0, 9.0, 9.0)
    assert got[(2, 3)] == (None, 9.0, None)


def test_null_ts_rows_ignored(spark):
    events = spark.createDataFrame([
        Row(user_id=1, ts=d(1), value=1.0),
        Row(user_id=1, ts=None, value=99.0),
    ])
    rows = gapfill(events).collect()
    assert len(rows) == 1 and rows[0].val == 1.0


def test_null_value_samples_do_not_dilute(spark):
    """A NULL sample is a missed scrape, not a zero: it must not enter
    the bucket average's denominator (found by self-review: SUM skips
    NULLs but COUNT(*) counted them, silently diluting the average —
    invisible to oracle parity because the twin shared the formula),
    and an all-NULL bucket is a GAP, not a value."""
    events = spark.createDataFrame([
        Row(user_id=1, ts=d(1, 1), value=10.0),
        Row(user_id=1, ts=d(1, 2), value=None),   # must not halve day 1
        Row(user_id=1, ts=d(2, 1), value=None),   # all-NULL bucket = gap
        Row(user_id=1, ts=d(3, 1), value=30.0),
    ])
    got = {r.bucket_ts.day: (r.val, r.locf_val, r.interp_val)
           for r in gapfill(events).collect()}
    assert got[1] == (10.0, 10.0, 10.0)           # NOT 5.0
    assert got[2] == (None, 10.0, 20.0)           # gap: locf + interp
    assert got[3] == (30.0, 30.0, 30.0)


def test_empty_input_is_empty_not_descending(spark):
    # Spark sequence(lo, hi) DESCENDS when lo > hi (round-8 lesson);
    # the NULL-bounds guard must yield zero rows, not a crash or grid
    events = spark.createDataFrame(
        [], "user_id bigint, ts timestamp, value double")
    assert gapfill(events).count() == 0


def test_nondefault_bucket_oracle_parity(spark, sf_dir):
    """The bucket parameter routes through both sides and stays
    oracle-exact for a sub-week non-default width ('6 hours') — the
    width class where Spark window() and DuckDB time_bucket share the
    epoch alignment (the gapfill_sql docstring contract)."""
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import duckdb_connection, compare
    from etl_load_spark.operators.timeseries import gapfill, gapfill_sql
    from etl_load_spark.session import read_table
    df = gapfill(read_table(spark, sf_dir, "events"), bucket="6 hours")
    ok, msg = compare(df, duckdb_connection(sf_dir),
                      gapfill_sql("events", bucket="6 hours"))
    assert ok, msg


def test_gapfill_matches_reference_property(spark):
    """Derandomized property: random sparse feeds (multi-sample buckets,
    NULL values, single-point and late-starting series) match a pure-
    Python replay of the whole fill contract — global grid bounds,
    exact fixed-point average, LOCF, integer-interpolation — exactly."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import gapfill

    samples = st.lists(
        st.tuples(st.integers(0, 2),               # series
                  st.integers(0, 9),               # day
                  st.integers(0, 23),              # hour
                  st.one_of(st.none(),             # NULL sample
                            st.integers(0, 30000))),   # cents
        min_size=1, max_size=30)

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [(u, d(day + 1, hour), None if c is None else c / 100.0)
                for u, day, hour, c in rows]
        df = spark.createDataFrame(
            data, "user_id bigint, ts timestamp, value double")
        got = {(r.user_id, r.bucket_ts.day):
               (r.val, r.locf_val, r.interp_val)
               for r in gapfill(df).collect()}
        # reference replay (integer fixed point end-to-end)
        buckets = {}                       # (u, day) -> [cents]
        for u, day, hour, c in rows:
            if c is not None:
                buckets.setdefault((u, day + 1), []).append(c)
        if not buckets:
            assert got == {}
            return
        val4 = {k: (2 * sum(cs) * 100 + len(cs)) // (2 * len(cs))
                for k, cs in buckets.items()}
        days = range(min(d_ for _, d_ in val4), max(d_ for _, d_ in val4) + 1)
        expect = {}
        for u in {u_ for u_, _ in val4}:
            series = {d_: v for (u_, d_), v in val4.items() if u_ == u}
            have = sorted(series)
            for day in days:
                v = series.get(day)
                prevs = [x for x in have if x <= day]
                nexts = [x for x in have if x >= day]
                p = prevs[-1] if prevs else None
                n = nexts[0] if nexts else None
                locf = series[p] / 10000.0 if p is not None else None
                if v is not None:
                    interp = v / 10000.0
                elif p is None or n is None:
                    interp = None
                else:
                    d1, d2 = (day - p) * 86400, (n - p) * 86400
                    num = series[p] * (d2 - d1) + series[n] * d1
                    interp = ((2 * num + d2) // (2 * d2)) / 10000.0
                expect[(u, day)] = (v / 10000.0 if v is not None else None,
                                    locf, interp)
        assert got == expect

    check()


def test_counter_rate_reset_semantics(spark):
    """Reset contract (Timescale counter_agg / Prometheus increase):
    a decrease means the counter restarted, so the post-reset value IS
    the step; the first sample contributes 0; NULL-value samples are
    excluded; same-timestamp samples break ties on order_col."""
    from etl_load_spark.operators.timeseries import counter_rate
    events = spark.createDataFrame([
        # series 1, one bucket: 10 -> 25 (+15) -> reset to 4 (+4)
        # -> 4 (same ts, later event_id; +0) -> 30 (+26)
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=25.0),
        Row(event_id=3, user_id=1, ts=d(1, 3), value=4.0),
        Row(event_id=4, user_id=1, ts=d(1, 3), value=4.0),
        Row(event_id=5, user_id=1, ts=d(1, 4), value=30.0),
        # a NULL sample: missed scrape, not a zero — excluded entirely
        Row(event_id=6, user_id=1, ts=d(1, 5), value=None),
        # series 2 spans two buckets; the day-2 step crosses buckets
        # and lands in day 2 (the bucket of the LATER sample)
        Row(event_id=7, user_id=2, ts=d(1, 23), value=100.0),
        Row(event_id=8, user_id=2, ts=d(2, 1), value=107.0),
    ])
    got = {(r.user_id, r.bucket_ts.day):
           (r.n_samples, r.n_resets, r.increase, r.rate_per_sec)
           for r in counter_rate(events).collect()}
    assert got[(1, 1)] == (5, 1, 45.0, 0.0005)      # 45/86400 half-up @4
    assert got[(2, 1)] == (1, 0, 0.0, 0.0)          # first sample: 0
    assert got[(2, 2)] == (1, 0, 7.0, 0.0001)       # cross-bucket delta


def test_counter_rate_tiebreak_is_deterministic(spark):
    """Two same-ts samples in the OTHER order flip which delta is the
    reset — the (ts, order_col) contract pins one answer."""
    from etl_load_spark.operators.timeseries import counter_rate
    events = spark.createDataFrame([
        Row(event_id=2, user_id=1, ts=d(1, 1), value=50.0),
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=3, user_id=1, ts=d(1, 2), value=60.0),
    ])
    r = counter_rate(events).collect()[0]
    # order_col order: 10 -> 50 (+40) -> 60 (+10); no reset
    assert (r.n_samples, r.n_resets, r.increase) == (3, 0, 50.0)


def test_counter_rate_matches_reference_property(spark):
    """Derandomized property (the house collector rule): random sample
    feeds — duplicate timestamps, zeros, resets at bucket edges —
    match a pure-Python reference of the counter contract exactly."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import counter_rate

    samples = st.lists(
        st.tuples(st.integers(0, 2),          # user
                  st.integers(0, 3 * 86400 - 1),   # offset seconds
                  st.integers(0, 5000)),      # value in cents
        min_size=1, max_size=40)

    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    value=c / 100.0)
                for i, (u, off, c) in enumerate(rows)]
        got = {(r.user_id, r.bucket_ts): (r.n_samples, r.n_resets,
                                          r.increase, r.rate_per_sec)
               for r in counter_rate(spark.createDataFrame(data)).collect()}
        # reference: per user ordered by (ts, event_id), integer cents
        expect = {}
        by_user = {}
        for r in sorted(data, key=lambda r: (r.user_id, r.ts, r.event_id)):
            c = round(r.value * 100)
            prev = by_user.get(r.user_id)
            by_user[r.user_id] = c
            step = 0 if prev is None else (c - prev if c >= prev else c)
            reset = 1 if (prev is not None and c < prev) else 0
            day = dt.datetime(r.ts.year, r.ts.month, r.ts.day)
            k = (r.user_id, day)
            n, nr, inc = expect.get(k, (0, 0, 0))
            expect[k] = (n + 1, nr + reset, inc + step)
        assert set(got) == set(expect)
        for k, (n, nr, inc) in expect.items():
            rate4 = (2 * inc * 100 + 86400) // (2 * 86400)
            assert got[k] == (n, nr, inc / 100.0, rate4 / 10000.0), k

    check()


def test_bucket_width_derivation(spark):
    """The rate denominator is DERIVED from the bucket string (via the
    validated day-time grammar, whose fixed unit widths are exactly
    Spark's), so the two cannot drift; hourly buckets rate against
    3600 without a second parameter."""
    from etl_load_spark.operators.timeseries import (
        bucket_width_seconds, counter_rate,
    )
    assert bucket_width_seconds("1 day") == 86400
    assert bucket_width_seconds("15 minutes") == 900
    assert bucket_width_seconds("6 hours") == 21600
    assert bucket_width_seconds("1 hour 30 minutes") == 5400
    assert bucket_width_seconds("1 week") == 7 * 86400
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=46.0),
    ])
    r = counter_rate(events, bucket="1 hour").collect()
    # the +36 step lands in the 02:00 bucket, rated against 3600 s
    by_hour = {row.bucket_ts.hour: row.rate_per_sec for row in r}
    assert by_hour[2] == 0.01                 # 36/3600
    assert by_hour[1] == 0.0


def test_null_key_series_fills(spark):
    """ADVICE r9 (medium): the grid join must be NULL-SAFE on the key —
    plain equality gave a NULL-key series grid rows whose fills were
    all-NULL even at buckets that HAVE data, and the USING-join oracle
    twin shared the wart so parity stayed green around it. NULL is a
    legitimate series here (the counter_rate/ohlc/twa groupBy
    convention, the q71 eqNullSafe precedent): it must fill exactly
    like any other key."""
    events = spark.createDataFrame([
        Row(user_id=None, ts=d(1, 6), value=10.0),
        Row(user_id=None, ts=d(3, 6), value=30.0),
        Row(user_id=1, ts=d(2, 0), value=5.0),
    ], "user_id bigint, ts timestamp, value double")
    got = {(r.user_id, r.bucket_ts.day): (r.val, r.locf_val, r.interp_val)
           for r in gapfill(events).collect()}
    assert len(got) == 6                          # 2 series x 3 days
    assert got[(None, 1)] == (10.0, 10.0, 10.0)   # actuals MATCH the grid
    assert got[(None, 2)] == (None, 10.0, 20.0)   # interior gap fills
    assert got[(None, 3)] == (30.0, 30.0, 30.0)
    assert got[(1, 2)] == (5.0, 5.0, 5.0)


def test_null_key_series_oracle_parity(spark):
    """The null-safe join is mirrored in the SQL twin (IS NOT DISTINCT
    FROM) and the NULLS LAST output order matches — pinned against
    DuckDB on a feed that contains a NULL-key series, the exact fixture
    class the shared-wart pair used to pass vacuously."""
    import duckdb
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare
    from etl_load_spark.operators.timeseries import gapfill_sql
    events = spark.createDataFrame([
        Row(user_id=None, ts=d(1, 6), value=10.0),
        Row(user_id=None, ts=d(3, 6), value=30.0),
        Row(user_id=1, ts=d(2, 0), value=5.0),
        Row(user_id=2, ts=d(1, 1), value=7.0),
    ], "user_id bigint, ts timestamp, value double")
    con = duckdb.connect()
    con.register("events", events.toPandas())
    ok, msg = compare(gapfill(events), con, gapfill_sql("events"))
    assert ok, msg


def test_bucket_string_is_validated_not_interpolated(spark):
    """ADVICE r9: bucket strings flow from user-supplied job-spec
    parameters into interval expressions — malformed or hostile values
    must fail as a spec ValueError, never as a raw SQL parse error or
    an expression injection."""
    import pytest as _pytest
    from etl_load_spark.operators.timeseries import (
        bucket_width_seconds, counter_rate, gapfill, gapfill_sql,
        instant_rate, ohlc, time_weighted_avg, trend, validate_bucket,
        value_histogram,
    )
    events = spark.createDataFrame(
        [], "event_id bigint, event_type string, user_id bigint,"
            " ts timestamp, value double")
    hostile = "1 day) AS s; DROP TABLE events; --"
    for bad in [hostile, "", "day", "1", "1 month", "1 fortnight",
                "-1 day", "1.5 hours", "0 seconds"]:
        with _pytest.raises(ValueError, match="bucket"):
            validate_bucket(bad)
        for op in (gapfill, counter_rate, time_weighted_avg, ohlc,
                   trend, instant_rate, value_histogram):
            with _pytest.raises(ValueError, match="bucket"):
                op(events, bucket=bad)
        with _pytest.raises(ValueError, match="bucket"):
            gapfill_sql("events", bucket=bad)
    # sub-second residue cannot be a rate denominator
    with _pytest.raises(ValueError, match="whole"):
        bucket_width_seconds("500 milliseconds")
    # but compound and plural/singular forms parse
    assert validate_bucket("2 hours 30 minutes") == 9000 * 10**6
    assert validate_bucket("1 Second") == 10**6


def test_bucket_validator_rejects_non_ascii_digits_and_overflow():
    """ADVICE r10: isdigit() admitted fullwidth digits ('１ day') that
    then died INSIDE F.expr's interval parser — the raw-parse failure
    mode the validator promises to preclude — and superscript digits
    that crash int() itself; and with no upper bound an astronomically
    wide bucket validated, then overflowed Spark's int64-microsecond
    day-time interval downstream. All three now fail as spec
    ValueErrors."""
    from etl_load_spark.operators.timeseries import validate_bucket
    for bad in ["１ day",        # fullwidth ONE: isdigit() True
                "¹ day",        # superscript one: int() crashes
                "٠ day"]:       # Arabic-Indic zero: isdecimal True
        with pytest.raises(ValueError, match="bucket"):
            validate_bucket(bad)
    # the cap is exact: the widest representable day-time interval
    # passes, one day past it fails as a spec error
    assert validate_bucket("106751991 days") == 106751991 * 86400 * 10**6
    with pytest.raises(ValueError, match="day-time interval"):
        validate_bucket("106751992 days")
    with pytest.raises(ValueError, match="day-time interval"):
        validate_bucket("9999999999999999999999 hours")


def test_sql_twins_raise_on_week_and_coarser_buckets():
    """ADVICE r10: DuckDB time_bucket snaps week-and-coarser buckets to
    a Monday origin while Spark window() aligns to the epoch — a twin
    built on time_bucket at such a grain compares SHIFTED buckets and
    reports spurious (or vacuous) parity. Every time_bucket twin now
    raises instead of inheriting gapfill_sql's prose-only caveat."""
    from etl_load_spark.operators.timeseries import (
        counter_rate_sql, gapfill_sql, heartbeat_uptime_sql, ohlc_sql,
        state_durations_sql, time_weighted_avg_sql,
    )
    twins = (counter_rate_sql, gapfill_sql, heartbeat_uptime_sql,
             ohlc_sql, state_durations_sql, time_weighted_avg_sql)
    for twin in twins:
        # round 11 closed the finer hole too: the exact condition is
        # that the width DIVIDES the 10,959-day origin gap — '2 days'
        # and '5 hours' pass a naive sub-week check but still bucket
        # on shifted boundaries (verified against both engines)
        for bad in ("1 week", "7 days", "2 weeks", "1 week 1 hour",
                    "2 days", "4 days", "5 hours", "7 hours"):
            with pytest.raises(ValueError, match="Monday"):
                twin("events", bucket=bad)
        # gap-dividing grains still build ('3 days' and '36 hours'
        # agree across engines despite being multi-day)
        for ok in ("6 hours", "1 day", "3 days", "36 hours",
                   "90 minutes"):
            assert "time_bucket" in twin("events", bucket=ok)
    # the carry variants ride the same guard
    for twin in (time_weighted_avg_sql, state_durations_sql,
                 heartbeat_uptime_sql):
        with pytest.raises(ValueError, match="Monday"):
            twin("events", bucket="1 week", carry_in=True)


def test_gap_dividing_multiday_bucket_parity(spark):
    """The round-11 guard condition is EXACT, not conservative: a
    multi-day width that divides the 10,959-day origin gap ('3 days',
    '36 hours') must produce identical buckets on both engines —
    pinned with live parity on a fixture spanning several buckets
    (if DuckDB ever changes its default origin, this fails loud)."""
    import duckdb
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare
    from etl_load_spark.operators.timeseries import (
        counter_rate, counter_rate_sql,
    )
    events = spark.createDataFrame([
        Row(event_id=i, user_id=1 + i % 2,
            ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=11 * i),
            value=float((i * 7) % 50))
        for i in range(20)
    ])
    con = duckdb.connect()
    con.register("events", events.toPandas())
    for bucket in ("3 days", "36 hours"):
        ok, msg = compare(counter_rate(events, bucket=bucket), con,
                          counter_rate_sql("events", bucket=bucket))
        assert ok, f"{bucket}: {msg}"


def test_sql_twins_derive_denominator_from_bucket(spark):
    """ADVICE r9 (low): the SQL twins' bucket_seconds now derives from
    the bucket string exactly like the Spark side — a '6 hours' twin
    called with defaults must rate against 21600, not 86400 (the
    oracle-side variant of the drift commit a0c9160 removed)."""
    import duckdb
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare
    from etl_load_spark.operators.timeseries import (
        counter_rate, counter_rate_sql, time_weighted_avg,
        time_weighted_avg_sql,
    )
    assert "21600" in counter_rate_sql("events", bucket="6 hours")
    assert "86400" not in counter_rate_sql("events", bucket="6 hours")
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=46.0),
        Row(event_id=3, user_id=1, ts=d(1, 9), value=100.0),
        Row(event_id=4, user_id=2, ts=d(1, 3), value=9.0),
    ])
    con = duckdb.connect()
    con.register("events", events.toPandas())
    ok, msg = compare(counter_rate(events, bucket="6 hours"), con,
                      counter_rate_sql("events", bucket="6 hours"))
    assert ok, msg
    ok, msg = compare(time_weighted_avg(events, bucket="6 hours"), con,
                      time_weighted_avg_sql("events", bucket="6 hours"))
    assert ok, msg


def test_counter_rate_hot_split_equivalence_fixture(spark):
    """The parallel-prefix stitch (hot_split) must be result-IDENTICAL
    to the single-window form on the boundary cases that make it
    subtle: a reset exactly across a slice boundary, empty slices
    between samples (the carry must reach across them), same-ts ties
    at a boundary, and a multi-series feed."""
    from etl_load_spark.operators.timeseries import counter_rate
    events = spark.createDataFrame([
        # series 1: rising across slice boundaries, reset lands exactly
        # on a 6-hour slice edge
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 6), value=25.0),   # slice edge
        Row(event_id=3, user_id=1, ts=d(1, 12), value=4.0),   # reset @edge
        Row(event_id=4, user_id=1, ts=d(1, 12), value=4.0),   # same-ts tie
        # 36h silence: two EMPTY slices; the carry crosses them
        Row(event_id=5, user_id=1, ts=d(3, 1), value=30.0),
        Row(event_id=6, user_id=2, ts=d(1, 3), value=7.0),
    ])
    plain = sorted(map(tuple, counter_rate(events).collect()))
    split = sorted(map(tuple, counter_rate(
        events, hot_split="6 hours").collect()))
    assert split == plain


def test_counter_rate_hot_split_equivalence_property(spark):
    """Derandomized property: on random feeds (duplicate timestamps,
    resets, multi-day spans) counter_rate(hot_split=...) equals the
    canonical single-window counter_rate exactly, for both a
    coarse and a fine slice width."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import counter_rate

    samples = st.lists(
        st.tuples(st.integers(0, 2),               # user
                  st.integers(0, 3 * 86400 - 1),   # offset seconds
                  st.integers(0, 5000)),           # cents
        min_size=1, max_size=40)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    value=c / 100.0)
                for i, (u, off, c) in enumerate(rows)]
        df = spark.createDataFrame(data)
        plain = sorted(map(tuple, counter_rate(df).collect()))
        for width in ("1 day", "1 hour"):
            split = sorted(map(tuple, counter_rate(
                df, hot_split=width).collect()))
            assert split == plain, width

    check()


def test_counter_rate_hot_split_plan_shape(spark, sf_dir):
    """The stitch stays on the plan floor (no cartesian, no Python, no
    BNLJ — the boundary join is slice-keyed and the feed side reuses
    the lag window's exchange), and the BUCKET-ALIGNED form saves one
    data exchange over the generic DIV slice: slicing on the bucket_ts
    attribute itself lets the lag window, the boundary join and the
    rollup share clustering (an aliased copy of the same value is a
    different attribute to the planner)."""
    import re
    from etl_load_spark.operators.timeseries import (
        counter_rate, time_weighted_avg,
    )
    from etl_load_spark.session import read_table
    e = read_table(spark, sf_dir, "events")
    counts = {}
    for label, df in [
            ("cr-aligned", counter_rate(e, hot_split="1 day")),
            ("cr-generic", counter_rate(e, hot_split="6 hours")),
            ("twa-aligned", time_weighted_avg(e, carry_in=True,
                                              hot_split="1 day")),
            ("twa-generic", time_weighted_avg(e, carry_in=True,
                                              hot_split="6 hours"))]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, label
        assert "BroadcastNestedLoopJoin" not in plan, label
        assert "BatchEvalPython" not in plan, label
        counts[label] = len(re.findall(r"Exchange (hash|range)", plan))
    assert counts["cr-aligned"] == counts["cr-generic"] - 1, counts
    assert counts["twa-aligned"] == counts["twa-generic"] - 1, counts


def test_counter_rate_plan_shape(spark, sf_dir):
    """ONE series-keyed exchange serves both the lag window and the
    bucket aggregate (hashpartitioning(user_id) satisfies the
    (user_id, bucket) clustering); the only other exchange is the
    output ORDER BY. No joins, no Python."""
    from etl_load_spark.queries import QUERIES
    import re
    df = QUERIES["q173_counter_rate"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert " div " in plan          # fixed-point rate stayed integral


def test_ohlc_semantics_and_tiebreak(spark):
    """Candle contract: open = first by (ts, event_id), close = last,
    high/low = extremes, NULL samples excluded; same-timestamp samples
    resolve by event_id through the padded-string key."""
    from etl_load_spark.operators.timeseries import ohlc
    events = spark.createDataFrame([
        Row(event_id=2, event_type="x", ts=d(1, 1), value=50.0),
        Row(event_id=1, event_type="x", ts=d(1, 1), value=10.0),  # open
        Row(event_id=3, event_type="x", ts=d(1, 2), value=99.0),  # high
        Row(event_id=4, event_type="x", ts=d(1, 3), value=2.0),   # low
        Row(event_id=6, event_type="x", ts=d(1, 4), value=30.0),  # close
        Row(event_id=5, event_type="x", ts=d(1, 4), value=70.0),
        Row(event_id=7, event_type="x", ts=d(1, 5), value=None),  # excluded
        Row(event_id=8, event_type="y", ts=d(2, 1), value=7.0),
    ])
    got = {(r.event_type, r.bucket_ts.day): r
           for r in ohlc(events).collect()}
    x = got[("x", 1)]
    assert (x.open, x.high, x.low, x.close, x.n_events) == \
        (10.0, 99.0, 2.0, 30.0, 6)
    y = got[("y", 2)]
    assert (y.open, y.high, y.low, y.close, y.n_events) == \
        (7.0, 7.0, 7.0, 7.0, 1)
    assert len(got) == 2


def test_ohlc_key_domain_raises_not_misorders(spark):
    """VERDICT r9 #4: the padded-key contract (non-negative epoch and
    order id) was docstring-only — a violating feed got silently WRONG
    open/close. Now the key expression raises: negative order ids and
    pre-1970 timestamps are loud failures."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from etl_load_spark.operators.timeseries import ohlc
    neg_id = spark.createDataFrame([
        Row(event_id=-1, event_type="x", ts=d(1, 1), value=10.0),
        Row(event_id=2, event_type="x", ts=d(1, 2), value=20.0),
    ])
    with _pytest.raises(Exception, match="non-negative") as ei:
        ohlc(neg_id).collect()
    assert isinstance(ei.value, Py4JJavaError) or "ohlc" in str(ei.value)
    pre_epoch = spark.createDataFrame([
        Row(event_id=1, event_type="x",
            ts=dt.datetime(1969, 12, 31, 23, 0, 0), value=10.0),
    ])
    with _pytest.raises(Exception, match="non-negative"):
        ohlc(pre_epoch).collect()
    # ADVICE r10: a NULL order id must raise too — (ep<0)|(oc<0) is NULL
    # for a NULL id, so the row previously fell to the otherwise branch
    # where format_string rendered the literal text 'null' (sorts after
    # every digit, can silently WIN open/close) while the DuckDB twin's
    # lpad(NULL) key is NULL and arg_min/arg_max SKIP the row — a
    # silent cross-engine divergence, now a loud failure.
    null_id = spark.createDataFrame([
        Row(event_id=2, event_type="x", ts=d(1, 2), value=20.0),
        Row(event_id=None, event_type="x", ts=d(1, 3), value=99.0),
    ])
    with _pytest.raises(Exception, match="NON-NULL"):
        ohlc(null_id).collect()


def test_ohlc_wide_order_id_stays_portable(spark):
    """ADVICE r9 (low): order ids ≥ 10¹² overflowed the original
    12-digit pad — Spark's format_string WIDENED the field (breaking
    lexicographic order) while DuckDB's lpad TRUNCATED it (diverging
    engines). Both sides now pad to 19 digits (full non-negative
    int64): a feed mixing 13-digit and 1-digit ids must agree with the
    oracle and order chronologically."""
    import duckdb
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare
    from etl_load_spark.operators.timeseries import ohlc, ohlc_sql
    events = spark.createDataFrame([
        # same-ts tiebreak across the old 12-digit boundary: the
        # 13-digit id must sort AFTER the small id, not before
        Row(event_id=5_000_000_000_000, event_type="x",
            ts=d(1, 1), value=50.0),
        Row(event_id=7, event_type="x", ts=d(1, 1), value=10.0),  # open
        Row(event_id=9_223_372_036_854_775_807, event_type="x",
            ts=d(1, 2), value=30.0),                              # close
    ])
    got = ohlc(events).collect()[0]
    assert (got.open, got.close) == (10.0, 30.0)
    con = duckdb.connect()
    con.register("events", events.toPandas())
    ok, msg = compare(ohlc(events), con, ohlc_sql("events"))
    assert ok, msg


def test_ohlc_plan_shape(spark, sf_dir):
    """ONE map-side-combinable hash aggregate: a single
    hashpartitioning exchange of candle-sized partials (partial min_by
    visible), plus the output sort. No window, no join, no Python."""
    from etl_load_spark.queries import QUERIES
    import re
    df = QUERIES["q174_ohlc"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 2
    assert "partial_min_by" in plan or "partial_min" in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_time_weighted_avg_semantics(spark):
    """TWA contract: weight = hold time to the next in-bucket sample
    (the last extends to bucket end); irregular sampling cannot bias
    the mean; a single-sample bucket IS its value."""
    from etl_load_spark.operators.timeseries import time_weighted_avg
    events = spark.createDataFrame([
        # value 10 holds 00:00->18:00 (64.8Ms), 40 holds 18:00->24:00
        # (21.6Ms): twa = (10*0.75 + 40*0.25) = 17.5 — the equally-
        # weighted mean would say 25
        Row(event_id=1, user_id=1, ts=d(1, 0), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 18), value=40.0),
        # single-sample bucket: holds to bucket end -> twa = value
        Row(event_id=3, user_id=1, ts=d(2, 23), value=7.0),
        # burst sampling: three 5.0 readings in one minute then 11.0 at
        # 12:00 — twa is dominated by hold time, not sample count
        Row(event_id=4, user_id=2, ts=d(1, 0), value=5.0),
        Row(event_id=5, user_id=2, ts=d(1, 0), value=5.0),
        Row(event_id=6, user_id=2, ts=d(1, 0), value=5.0),
        Row(event_id=7, user_id=2, ts=d(1, 12), value=11.0),
    ])
    got = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.twa)
           for r in time_weighted_avg(events).collect()}
    assert got[(1, 1)] == (2, 17.5)
    assert got[(1, 2)] == (1, 7.0)
    # user 2: 5.0 holds 12h, 11.0 holds 12h -> 8.0 (mean would be 6.5)
    assert got[(2, 1)] == (4, 8.0)


def test_twa_carry_in_semantics(spark):
    """q176 contract (Timescale interpolated_average, LOCF method):
    the previous sample — from ANY earlier bucket — weights
    [bucket_start, first_sample); a series' first-ever bucket falls
    back to the self-contained span; LOCF carries across an EMPTY
    bucket (though the empty bucket itself is not emitted)."""
    from etl_load_spark.operators.timeseries import time_weighted_avg
    events = spark.createDataFrame([
        # day 1: only sample at 12:00 (v=10) -> first-ever bucket:
        # twa = 10 over [12:00, 24:00) (no carry exists)
        Row(event_id=1, user_id=1, ts=d(1, 12), value=10.0),
        # day 2: sample at 06:00 (v=30). carry-in weights
        # [00:00, 06:00) with 10: twa = (10*6 + 30*18)/24 = 25.0
        Row(event_id=2, user_id=1, ts=d(2, 6), value=30.0),
        # day 3 empty; day 4: sample at 18:00 (v=50). the carry is
        # day 2's 30 across the empty day 3:
        # twa = (30*18 + 50*6)/24 = 35.0
        Row(event_id=3, user_id=1, ts=d(4, 18), value=50.0),
    ])
    got = {r.bucket_ts.day: (r.n_samples, r.twa)
           for r in time_weighted_avg(events, carry_in=True).collect()}
    assert got == {1: (1, 10.0), 2: (1, 25.0), 4: (1, 35.0)}
    # the self-contained default is UNCHANGED by the new parameter
    plain = {r.bucket_ts.day: r.twa
             for r in time_weighted_avg(events).collect()}
    assert plain == {1: 10.0, 2: 30.0, 4: 50.0}


def test_twa_carry_in_matches_reference_property(spark):
    """Derandomized property: random sparse multi-bucket feeds match a
    pure-Python replay of the carry contract (cross-bucket LOCF into
    the bucket-start span, in-bucket holds, exact fixed-point
    quotient) exactly."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import time_weighted_avg

    samples = st.lists(
        st.tuples(st.integers(0, 1),                 # user
                  st.integers(0, 4 * 86400 - 1),     # offset seconds
                  st.integers(0, 5000)),             # cents
        min_size=1, max_size=25)

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    value=c / 100.0)
                for i, (u, off, c) in enumerate(rows)]
        got = {(r.user_id, r.bucket_ts): (r.n_samples, r.twa)
               for r in time_weighted_avg(
                   spark.createDataFrame(data), carry_in=True).collect()}
        day_ms = 86400 * 1000
        expect = {}
        by_user = {}
        for r in sorted(data, key=lambda r: (r.user_id, r.ts, r.event_id)):
            by_user.setdefault(r.user_id, []).append(
                (r.ts, round(r.value * 100)))
        for u, srs in by_user.items():
            buckets = {}
            for i, (ts, c) in enumerate(srs):
                day = dt.datetime(ts.year, ts.month, ts.day)
                tm = int(ts.timestamp() * 1000)
                b0 = int(day.timestamp() * 1000)
                nxt = srs[i + 1][0] if i + 1 < len(srs) else None
                nxt_same = (nxt is not None
                            and nxt.date() == ts.date())
                end = (int(nxt.timestamp() * 1000) if nxt_same
                       else b0 + day_ms)
                n, num, den = buckets.get(day, (0, 0, 0))
                if n == 0 and i > 0:              # carry into first sample
                    pc = srs[i - 1][1]
                    num += pc * (tm - b0)
                    den += tm - b0
                buckets[day] = (n + 1, num + c * (end - tm),
                                den + (end - tm))
            for day, (n, num, den) in buckets.items():
                twa4 = (200 * num + den) // (2 * den)
                expect[(u, day)] = (n, twa4 / 10000.0)
        assert got == expect

    check()


def test_twa_carry_hot_split_equivalence(spark):
    """The carry stitch (hot_split on carry_in=True) must be
    result-identical to the plain per-key lag: boundary cases are a
    bucket's first sample whose predecessor sits in the SAME slice, in
    the PREVIOUS slice, and across EMPTY slices; plus the hand fixture
    and a derandomized random sweep over two slice widths."""
    import pytest as _pytest
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import time_weighted_avg

    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 12), value=10.0),
        Row(event_id=2, user_id=1, ts=d(2, 6), value=30.0),
        Row(event_id=3, user_id=1, ts=d(4, 18), value=50.0),  # empty day 3
        Row(event_id=4, user_id=2, ts=d(1, 1), value=7.0),
    ])
    plain = sorted(map(tuple, time_weighted_avg(
        events, carry_in=True).collect()))
    for width in ("6 hours", "2 days"):
        split = sorted(map(tuple, time_weighted_avg(
            events, carry_in=True, hot_split=width).collect()))
        assert split == plain, width
    with _pytest.raises(ValueError, match="carry_in"):
        time_weighted_avg(events, hot_split="1 day")

    samples = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 4 * 86400 - 1),
                  st.integers(0, 5000)),
        min_size=1, max_size=25)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    value=c / 100.0)
                for i, (u, off, c) in enumerate(rows)]
        df = spark.createDataFrame(data)
        plain = sorted(map(tuple, time_weighted_avg(
            df, carry_in=True).collect()))
        for width in ("1 day", "3 hours"):
            split = sorted(map(tuple, time_weighted_avg(
                df, carry_in=True, hot_split=width).collect()))
            assert split == plain, width

    check()


def test_state_durations_semantics(spark):
    """q177 contract (Timescale state_agg/duration_in): holds close on
    the next in-bucket sample (any state), the last extends to bucket
    end; entries count transitions (first sample opens its state;
    re-entering after a different state is a new entry); NULL-state
    samples are missed scrapes, excluded."""
    from etl_load_spark.operators.timeseries import state_durations
    h = 3600 * 1000
    events = spark.createDataFrame([
        # user 1 day 1: a(00-06) b(06-08) a(08-24) -> a: 22h/2 entries
        Row(event_id=1, user_id=1, event_type="a", ts=d(1, 0), value=0.0),
        Row(event_id=2, user_id=1, event_type="b", ts=d(1, 6), value=0.0),
        Row(event_id=3, user_id=1, event_type="a", ts=d(1, 8), value=0.0),
        # consecutive same-state sample: more held time, NOT an entry
        Row(event_id=4, user_id=1, event_type="a", ts=d(1, 20), value=0.0),
        Row(event_id=5, user_id=1, event_type=None, ts=d(1, 22), value=0.0),
        # user 2 day 2: single sample holds to bucket end
        Row(event_id=6, user_id=2, event_type="x", ts=d(2, 18), value=0.0),
    ])
    got = {(r.user_id, r.bucket_ts.day, r.event_type):
           (r.held_ms, r.n_entries, r.n_samples)
           for r in state_durations(events).collect()}
    assert got[(1, 1, "a")] == (22 * h, 2, 3)
    assert got[(1, 1, "b")] == (2 * h, 1, 1)
    assert got[(2, 2, "x")] == (6 * h, 1, 1)
    assert len(got) == 3


def test_state_durations_carry_in_semantics(spark):
    """q180 contract (Timescale interpolated_duration_in): the
    previous RECORDED state holds from bucket start to the first
    sample (an n_samples=0 row when that state has no own sample in
    the bucket; LOCF crosses empty buckets); the bucket's first sample
    is an entry only if it differs from the carried state; a series'
    first-ever bucket falls back to the self-contained span."""
    from etl_load_spark.operators.timeseries import state_durations
    h = 3600 * 1000
    events = spark.createDataFrame([
        # day 1: a from 18:00 (first-ever bucket: no carry, 6h, entry)
        Row(event_id=1, user_id=1, event_type="a", ts=d(1, 18), value=0.),
        # day 2: first sample b at 06:00 -> carried 'a' holds 00-06
        # (n_samples=0 row), b is an entry (differs from carry)
        Row(event_id=2, user_id=1, event_type="b", ts=d(2, 6), value=0.),
        # day 4 (day 3 empty): first sample b at 12:00 -> carried 'b'
        # holds 00-12 AND the sample is NOT an entry (same state);
        # b's day-4 held = 12h carry + 12h own, 0 entries
        Row(event_id=3, user_id=1, event_type="b", ts=d(4, 12), value=0.),
    ])
    got = {(r.bucket_ts.day, r.event_type):
           (r.held_ms, r.n_entries, r.n_samples)
           for r in state_durations(events, carry_in=True).collect()}
    assert got[(1, "a")] == (6 * h, 1, 1)
    assert got[(2, "a")] == (6 * h, 0, 0)      # carried-only row
    assert got[(2, "b")] == (18 * h, 1, 1)
    assert got[(4, "b")] == (24 * h, 0, 1)     # carry merges, no entry
    assert len(got) == 4
    # the self-contained default is UNCHANGED by the new parameter
    plain = {(r.bucket_ts.day, r.event_type): (r.held_ms, r.n_entries)
             for r in state_durations(events).collect()}
    assert plain == {(1, "a"): (6 * h, 1), (2, "b"): (18 * h, 1),
                     (4, "b"): (12 * h, 1)}


def test_state_durations_carry_plan_shape(spark, sf_dir):
    """q180 100 TB posture: the cross-bucket lag (key), the in-bucket
    lead/lag (key, bucket), the explode and the (key, bucket, state)
    rollup all ride ONE hash exchange (subset clustering); plus the
    output sort. No joins, no Python."""
    import re
    from etl_load_spark.queries import QUERIES
    df = QUERIES["q180_state_interpolated"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_state_durations_carry_hot_split_equivalence(spark):
    """VERDICT r10 #3: the carry lag is the q173 per-key serialization
    class — the parallel-prefix stitch (hot_split) must be
    result-IDENTICAL to the plain per-key lag. Boundary cases: a
    bucket's first sample whose predecessor sits in the SAME slice, in
    the PREVIOUS slice, and across EMPTY slices; a transition exactly
    at a slice edge; a first sample matching the carried state (no
    entry); a sample exactly at bucket start (zero-width carry span);
    plus a derandomized random sweep over two slice widths."""
    import pytest as _pytest
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import state_durations

    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 12), event_type="a"),
        Row(event_id=2, user_id=1, ts=d(2, 0), event_type="a"),   # @start
        Row(event_id=3, user_id=1, ts=d(2, 6), event_type="b"),   # edge
        Row(event_id=4, user_id=1, ts=d(2, 6), event_type="c"),   # tie
        Row(event_id=5, user_id=1, ts=d(4, 18), event_type="c"),  # empty d3
        Row(event_id=6, user_id=2, ts=d(1, 1), event_type="x"),
    ])
    plain = sorted(map(tuple, state_durations(
        events, carry_in=True).collect()))
    for width in ("6 hours", "1 day", "2 days"):
        split = sorted(map(tuple, state_durations(
            events, carry_in=True, hot_split=width).collect()))
        assert split == plain, width
    with _pytest.raises(ValueError, match="carry_in"):
        state_durations(events, hot_split="1 day")

    samples = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 4 * 86400 - 1),
                  st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=25)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    event_type=stt)
                for i, (u, off, stt) in enumerate(rows)]
        df = spark.createDataFrame(data)
        plain = sorted(map(tuple, state_durations(
            df, carry_in=True).collect()))
        for width in ("1 day", "3 hours"):
            split = sorted(map(tuple, state_durations(
                df, carry_in=True, hot_split=width).collect()))
            assert split == plain, width

    check()


def test_heartbeat_carry_hot_split_equivalence(spark):
    """VERDICT r10 #3, liveness curve: hot_split on the heartbeat
    carry lag must be result-identical to the plain per-key lag.
    Boundary cases: the previous beat in the same slice / previous
    slice / across empty slices; a beat whose tolerance window is
    exhausted before the bucket starts (greatest(0,...) clamp);
    same-millisecond duplicate beats at a slice edge; plus a
    derandomized random sweep over two slice widths."""
    import pytest as _pytest
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import heartbeat_uptime

    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 23)),
        Row(event_id=2, user_id=1, ts=d(2, 0)),    # carry reaches 2
        Row(event_id=3, user_id=1, ts=d(2, 6)),    # slice edge
        Row(event_id=4, user_id=1, ts=d(2, 6)),    # same-ms duplicate
        Row(event_id=5, user_id=1, ts=d(5, 1)),    # empty days 3-4:
        Row(event_id=6, user_id=2, ts=d(1, 2)),    #  clamp to 0
    ])
    plain = sorted(map(tuple, heartbeat_uptime(
        events, carry_in=True, tolerance="2 hours").collect()))
    for width in ("6 hours", "1 day", "2 days"):
        split = sorted(map(tuple, heartbeat_uptime(
            events, carry_in=True, tolerance="2 hours",
            hot_split=width).collect()))
        assert split == plain, width
    with _pytest.raises(ValueError, match="carry_in"):
        heartbeat_uptime(events, hot_split="1 day")

    samples = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 4 * 86400 - 1)),
        min_size=1, max_size=25)

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off))
                for i, (u, off) in enumerate(rows)]
        df = spark.createDataFrame(data)
        plain = sorted(map(tuple, heartbeat_uptime(
            df, carry_in=True, tolerance="3 hours").collect()))
        for width in ("1 day", "3 hours"):
            split = sorted(map(tuple, heartbeat_uptime(
                df, carry_in=True, tolerance="3 hours",
                hot_split=width).collect()))
            assert split == plain, width

    check()


def test_state_heartbeat_hot_split_plan_shape(spark, sf_dir):
    """The q180/q181 stitches stay on the plan floor and the
    bucket-aligned form saves exactly one data exchange over the
    generic DIV slice (the literal-column clustering rule), matching
    the counter_rate/TWA pins."""
    import re
    from etl_load_spark.operators.timeseries import (
        heartbeat_uptime, state_durations,
    )
    from etl_load_spark.session import read_table
    e = read_table(spark, sf_dir, "events")
    counts = {}
    for label, df in [
            ("sd-aligned", state_durations(e, carry_in=True,
                                           hot_split="1 day")),
            ("sd-generic", state_durations(e, carry_in=True,
                                           hot_split="6 hours")),
            ("hb-aligned", heartbeat_uptime(e, carry_in=True,
                                            hot_split="1 day")),
            ("hb-generic", heartbeat_uptime(e, carry_in=True,
                                            hot_split="6 hours"))]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, label
        assert "BroadcastNestedLoopJoin" not in plan, label
        assert "BatchEvalPython" not in plan, label
        counts[label] = len(re.findall(r"Exchange (hash|range)", plan))
    assert counts["sd-aligned"] == counts["sd-generic"] - 1, counts
    assert counts["hb-aligned"] == counts["hb-generic"] - 1, counts


def test_hot_split_null_key_series_keeps_carry(spark):
    """ADVICE r11 (medium): NULL is a legitimate series key — the plain
    path's Window.partitionBy groups NULLs into one partition — but the
    hot_split boundary join used plain column equality, which never
    matches NULL keys, so a NULL-key series silently lost its
    cross-slice carry (violating the docstring's 'results are
    IDENTICAL' contract). The stitch key now rides in a one-field
    struct (struct equality is null-safe under a plain equi-join, no
    extra exchange); all four carry-class operators must match the
    plain path exactly on a fixture whose NULL-key series carries
    across an empty day (and through a reset, for counter_rate)."""
    from etl_load_spark.operators.timeseries import (
        counter_rate, heartbeat_uptime, state_durations,
        time_weighted_avg,
    )
    events = spark.createDataFrame([
        Row(event_id=1, user_id=None, event_type="a",
            ts=d(1, 12), value=10.0),
        Row(event_id=2, user_id=None, event_type="b",
            ts=d(2, 6), value=25.0),
        # empty day 3 — the carry must cross it; value drop = a reset
        Row(event_id=3, user_id=None, event_type="b",
            ts=d(4, 18), value=4.0),
        Row(event_id=4, user_id=1, event_type="a",
            ts=d(1, 1), value=7.0),
    ])
    # None sorts don't compose with ints — compare stringified rows
    rows = lambda df: sorted(  # noqa: E731
        tuple(str(x) for x in r) for r in df.collect())
    for op, kw in [(counter_rate, {}),
                   (time_weighted_avg, {"carry_in": True}),
                   (state_durations, {"carry_in": True}),
                   (heartbeat_uptime, {"carry_in": True})]:
        plain = rows(op(events, **kw))
        assert any(r[0] == "None" for r in plain), op.__name__
        for width in ("1 day", "6 hours"):
            split = rows(op(events, hot_split=width, **kw))
            assert split == plain, (op.__name__, width)


def test_trend_semantics(spark):
    """Hand fixture pinning the OLS slope contract: a rising 3-sample
    bucket (hand-computed num/den → 0.0002 value/s half-up), a falling
    pair (−20 over 4 h = −0.0013889 → −0.0014 half-up), a single
    sample and a same-millisecond pair (zero time variance → NULL),
    and a NULL-key series (legitimate group)."""
    from etl_load_spark.operators.timeseries import trend
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 5), value=20.0),
        Row(event_id=3, user_id=1, ts=d(1, 9), value=15.5),
        Row(event_id=4, user_id=1, ts=d(2, 3), value=100.0),
        Row(event_id=5, user_id=2, ts=d(1, 2), value=5.0),
        Row(event_id=6, user_id=2, ts=d(1, 2), value=7.0),
        Row(event_id=7, user_id=3, ts=d(1, 4), value=30.0),
        Row(event_id=8, user_id=3, ts=d(1, 8), value=10.0),
        Row(event_id=9, user_id=None, ts=d(1, 1), value=1.0),
        Row(event_id=10, user_id=None, ts=d(1, 7), value=2.0),
        Row(event_id=11, user_id=4, ts=None, value=9.0),     # excluded
        Row(event_id=12, user_id=4, ts=d(1, 3), value=None),  # excluded
    ])
    got = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.slope_per_sec)
           for r in trend(events).collect()}
    # hand-computed: num = 3·Σxy − Σx·Σy = 2.376e10 cents·ms,
    # den = 3·Σxx − Σx² = 1.243728e15 ms² → ·10/den = 1.9104e-4 value/s
    assert got[(1, 1)] == (3, 0.0002)
    assert got[(1, 2)] == (1, None)          # single sample
    assert got[(2, 1)] == (2, None)          # same-ms pair, den = 0
    assert got[(3, 1)] == (2, -0.0014)       # −20 value / 4 h, half-up
    assert got[(None, 1)] == (2, 0.0)        # 1 value / 6 h → 0.0000
    assert (4, 1) not in got                 # both samples excluded


def test_trend_matches_reference_property(spark):
    """Derandomized property (the shared-wart rule): random feeds —
    duplicate timestamps, vertical pairs, negative drifts, NULL keys —
    match a pure-Python integer replay of the sign-split half-up
    quotient exactly (Python ints are a third implementation next to
    Spark decimal(38,0) and DuckDB HUGEINT)."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import trend

    samples = st.lists(
        st.tuples(st.integers(0, 1),                  # user
                  st.integers(0, 2 * 86400 - 1),      # offset seconds
                  st.integers(-5000, 5000)),          # cents
        min_size=1, max_size=30)

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    value=c / 100.0)
                for i, (u, off, c) in enumerate(rows)]
        df = spark.createDataFrame(data)
        got = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.slope_per_sec)
               for r in trend(df).collect()}
        by_bucket = {}
        for r in data:
            day = dt.datetime(r.ts.year, r.ts.month, r.ts.day)
            by_bucket.setdefault((r.user_id, day), []).append(r)
        expect = {}
        for (u, day), srs in by_bucket.items():
            b0 = int(day.timestamp() * 1000)
            xs = [int(r.ts.timestamp() * 1000) - b0 for r in srs]
            ys = [round(r.value * 100) for r in srs]
            n = len(srs)
            num = n * sum(x * y for x, y in zip(xs, ys)) \
                - sum(xs) * sum(ys)
            den = n * sum(x * x for x in xs) - sum(xs) ** 2
            if den > 0:
                mag = (2 * abs(num) * 10 * 10000 + den) // (2 * den)
                slope = (mag if num >= 0 else -mag) / 10000.0
            else:
                slope = None
            expect[(u, day.day)] = (n, slope)
        assert got == expect

    check()


def test_instant_rate_semantics(spark):
    """Hand fixture pinning the irate contract: only the LAST TWO
    samples matter (earlier movement ignored), the Prometheus reset
    rule on the final step (drop ⇒ increase = new value), NULL under
    two samples and on a zero final time delta, NULL-key series
    legitimate."""
    from etl_load_spark.operators.timeseries import instant_rate
    events = spark.createDataFrame([
        # user 1: noisy early movement, final step +9 over 1 h
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=90.0),
        Row(event_id=3, user_id=1, ts=d(1, 5), value=21.0),
        Row(event_id=4, user_id=1, ts=d(1, 6), value=30.0),
        # user 2: reset on the final step (30 -> 4)
        Row(event_id=5, user_id=2, ts=d(1, 3), value=30.0),
        Row(event_id=6, user_id=2, ts=d(1, 4), value=4.0),
        # user 3: single sample
        Row(event_id=7, user_id=3, ts=d(1, 2), value=7.0),
        # user 4: last two share a millisecond
        Row(event_id=8, user_id=4, ts=d(1, 1), value=1.0),
        Row(event_id=9, user_id=4, ts=d(1, 2), value=2.0),
        Row(event_id=10, user_id=4, ts=d(1, 2), value=3.0),
        Row(event_id=11, user_id=None, ts=d(1, 1), value=0.0),
        Row(event_id=12, user_id=None, ts=d(1, 3), value=72.0),
    ])
    got = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.irate_per_sec)
           for r in instant_rate(events).collect()}
    assert got[(1, 1)] == (4, 0.0025)        # 9 / 3600 s
    assert got[(2, 1)] == (2, 0.0011)        # reset: 4 / 3600 s, half-up
    assert got[(3, 1)] == (1, None)
    assert got[(4, 1)] == (3, None)          # zero final delta
    assert got[(None, 1)] == (2, 0.01)       # 72 / 7200 s


def test_instant_rate_negative_value_raises_both_engines(spark):
    """ADVICE r11 (low): the non-negative-counter precondition is a
    GUARD, not prose — a negative value makes the unsigned half-up
    quotient invalid (Spark's truncating DIV vs DuckDB's flooring //
    diverge there), so both the operator (raise_error) and the oracle
    (error()) must fail loudly instead of silently disagreeing."""
    import duckdb
    import pytest as _pytest
    from etl_load_spark.operators.timeseries import (
        instant_rate, instant_rate_sql,
    )
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=-3.0),
    ])
    with _pytest.raises(Exception, match="negative counter value"):
        instant_rate(events).collect()
    con = duckdb.connect()
    con.register("events", events.toPandas())
    with _pytest.raises(Exception, match="negative counter value"):
        con.sql(instant_rate_sql("events")).fetchall()


def test_instant_rate_matches_reference_property(spark):
    """Derandomized property: random feeds (duplicate timestamps,
    resets, two users) match a pure-Python integer replay of the
    last-two pick + unsigned half-up quotient exactly."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import instant_rate

    samples = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 2 * 86400 - 1),
                  st.integers(0, 5000)),
        min_size=1, max_size=30)

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    value=c / 100.0)
                for i, (u, off, c) in enumerate(rows)]
        df = spark.createDataFrame(data)
        got = {(r.user_id, r.bucket_ts.day):
               (r.n_samples, r.irate_per_sec)
               for r in instant_rate(df).collect()}
        by_bucket = {}
        for r in sorted(data, key=lambda x: (x.user_id, x.ts,
                                             x.event_id)):
            day = dt.datetime(r.ts.year, r.ts.month, r.ts.day)
            by_bucket.setdefault((r.user_id, day), []).append(r)
        expect = {}
        for (u, day), srs in by_bucket.items():
            n = len(srs)
            rate = None
            if n >= 2:
                c = round(srs[-1].value * 100)
                pc = round(srs[-2].value * 100)
                dms = int(srs[-1].ts.timestamp() * 1000) \
                    - int(srs[-2].ts.timestamp() * 1000)
                if dms > 0:
                    inc = c - pc if c >= pc else c
                    rate = ((2 * inc * 10 * 10000 + dms)
                            // (2 * dms)) / 10000.0
            expect[(u, day.day)] = (n, rate)
        assert got == expect

    check()


def test_value_histogram_semantics(spark):
    """Hand fixture pinning the binning contract: cent-exact edges
    (a sample AT an interior edge goes to the higher bin, AT hi to
    overflow), underflow/overflow bins, only non-empty bins emitted,
    NULL-key series legitimate, parameter validation."""
    import pytest as _pytest
    from etl_load_spark.operators.timeseries import value_histogram
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=-0.01),  # underflow
        Row(event_id=2, user_id=1, ts=d(1, 2), value=0.0),    # bin 1
        Row(event_id=3, user_id=1, ts=d(1, 3), value=9.99),   # bin 1
        Row(event_id=4, user_id=1, ts=d(1, 4), value=10.0),   # edge: bin 2
        Row(event_id=5, user_id=1, ts=d(1, 5), value=99.99),  # bin 10
        Row(event_id=6, user_id=1, ts=d(1, 6), value=100.0),  # overflow
        Row(event_id=7, user_id=None, ts=d(1, 1), value=55.0),  # bin 6
    ])
    got = {(r.user_id, r.bucket_ts.day, r.bin): r.n_samples
           for r in value_histogram(events, lo=0.0, hi=100.0,
                                    nbins=10).collect()}
    assert got == {(1, 1, 0): 1, (1, 1, 1): 2, (1, 1, 2): 1,
                   (1, 1, 10): 1, (1, 1, 11): 1, (None, 1, 6): 1}
    with _pytest.raises(ValueError, match="nbins"):
        value_histogram(events, nbins=0)
    with _pytest.raises(ValueError, match="range is empty"):
        value_histogram(events, lo=5.0, hi=5.0)


def test_heartbeat_downtime_complement(spark):
    """q182: downtime_ms is the exact bucket-width complement of the
    carry uptime on every emitted row, and the default (no
    emit_downtime) schema is UNCHANGED by the new parameter; the
    boundary-crossing outage that n_gaps does NOT count IS downtime
    (the documented divergence knob's complement)."""
    from etl_load_spark.operators.timeseries import heartbeat_uptime
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 23)),
        Row(event_id=2, user_id=1, ts=d(2, 12)),  # boundary outage
        Row(event_id=3, user_id=2, ts=d(1, 1)),
    ])
    rows = heartbeat_uptime(events, carry_in=True, tolerance="2 hours",
                            emit_downtime=True).collect()
    day_ms = 86400 * 1000
    assert all(r.uptime_ms + r.downtime_ms == day_ms for r in rows)
    got = {(r.user_id, r.bucket_ts.day): r for r in rows}
    # user 1, day 2: the 23:00→12:00 silence crosses the boundary —
    # n_gaps stays 0 (not an in-bucket gap) but downtime covers the
    # dead 01:00→12:00 stretch: uptime = 1 h carried from the day-1
    # 23:00 beat (clipped at 01:00) + the noon beat's 2 h window
    r = got[(1, 2)]
    assert (r.n_gaps, r.uptime_ms) == (0, 3 * 3600 * 1000)
    assert r.downtime_ms == day_ms - 3 * 3600 * 1000
    plain = heartbeat_uptime(events, carry_in=True, tolerance="2 hours")
    assert [f.name for f in plain.schema.fields] == [
        "user_id", "bucket_ts", "n_beats", "uptime_ms", "n_gaps"]


def test_state_durations_matches_reference_property(spark):
    """Derandomized property (the shared-wart rule: the DuckDB twin
    mirrors the formula, so parity alone can't catch a wart both
    sides share): random multi-state feeds — duplicate timestamps,
    NULL states, single-sample buckets — match a pure-Python replay
    of the state contract exactly."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import state_durations

    samples = st.lists(
        st.tuples(st.integers(0, 1),                  # user
                  st.integers(0, 2 * 86400 - 1),      # offset seconds
                  st.one_of(st.none(), st.sampled_from("abc"))),
        min_size=1, max_size=30)

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
                    event_type=s)
                for i, (u, off, s) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "event_id bigint, user_id bigint, ts timestamp,"
                  " event_type string")
        got = {(r.user_id, r.bucket_ts.day, r.event_type):
               (r.held_ms, r.n_entries, r.n_samples)
               for r in state_durations(df).collect()}
        by_bucket = {}
        for r in sorted((x for x in data if x.event_type is not None),
                        key=lambda x: (x.user_id, x.ts, x.event_id)):
            day = dt.datetime(r.ts.year, r.ts.month, r.ts.day)
            by_bucket.setdefault((r.user_id, day), []).append(r)
        expect = {}
        for (u, day), srs in by_bucket.items():
            end_ms = int((day + dt.timedelta(days=1)).timestamp() * 1000)
            for i, r in enumerate(srs):
                nxt = (int(srs[i + 1].ts.timestamp() * 1000)
                       if i + 1 < len(srs) else end_ms)
                held = nxt - int(r.ts.timestamp() * 1000)
                entered = (1 if i == 0
                           or srs[i - 1].event_type != r.event_type
                           else 0)
                k = (u, day.day, r.event_type)
                h, e, n = expect.get(k, (0, 0, 0))
                expect[k] = (h + held, e + entered, n + 1)
        assert got == expect

    check()


def test_heartbeat_uptime_matches_reference_property(spark):
    """Derandomized property: random beat feeds — duplicate
    millisecond beats, gaps straddling the tolerance — match a
    pure-Python replay of the liveness contract exactly."""
    from hypothesis import given, settings, strategies as st
    from etl_load_spark.operators.timeseries import heartbeat_uptime

    samples = st.lists(
        st.tuples(st.integers(0, 1),                  # user
                  st.integers(0, 2 * 86400 - 1)),     # offset seconds
        min_size=1, max_size=30)
    tol_ms = 900 * 1000                               # 15 minutes

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(samples)
    def check(rows):
        data = [Row(event_id=i, user_id=u,
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off))
                for i, (u, off) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "event_id bigint, user_id bigint, ts timestamp")
        got = {(r.user_id, r.bucket_ts.day):
               (r.n_beats, r.uptime_ms, r.n_gaps)
               for r in heartbeat_uptime(
                   df, tolerance="15 minutes").collect()}
        by_bucket = {}
        for r in sorted(data, key=lambda x: (x.user_id, x.ts, x.event_id)):
            day = dt.datetime(r.ts.year, r.ts.month, r.ts.day)
            by_bucket.setdefault((r.user_id, day), []).append(
                int(r.ts.timestamp() * 1000))
        expect = {}
        for (u, day), tms in by_bucket.items():
            end_ms = int((day + dt.timedelta(days=1)).timestamp() * 1000)
            up = gaps = 0
            for i, tm in enumerate(tms):
                nxt = tms[i + 1] if i + 1 < len(tms) else end_ms
                up += min(nxt - tm, tol_ms)
                if i + 1 < len(tms) and tms[i + 1] - tm > tol_ms:
                    gaps += 1
            expect[(u, day.day)] = (len(tms), up, gaps)
        assert got == expect

    check()


def test_heartbeat_carry_in_semantics(spark):
    """q181 contract (Timescale interpolated_uptime): a beat near the
    previous bucket's end extends liveness into this bucket —
    [bucket_start, min(prev + tol, first_beat)) — never past the
    first in-bucket beat (union stays disjoint) and 0 when the
    previous beat's window died before the boundary; gap accounting
    unchanged; a series' first-ever bucket has no carry."""
    from etl_load_spark.operators.timeseries import heartbeat_uptime
    m = 60 * 1000
    events = spark.createDataFrame([
        # user 1: beat 23:55 day 1 (15m tol -> 10m crosses into day 2);
        # day-2 first beat at 00:05 CAPS the carry at 5m
        Row(event_id=1, user_id=1, ts=dt.datetime(2024, 1, 1, 23, 55),
            value=0.0),
        Row(event_id=2, user_id=1, ts=dt.datetime(2024, 1, 2, 0, 5),
            value=0.0),
        # user 2: beat 23:55 day 1; day-2 first beat at 01:00 -> carry
        # is the full residual 10m (window dies at 00:10)
        Row(event_id=3, user_id=2, ts=dt.datetime(2024, 1, 1, 23, 55),
            value=0.0),
        Row(event_id=4, user_id=2, ts=dt.datetime(2024, 1, 2, 1, 0),
            value=0.0),
        # user 3: beat at 12:00 day 1 (window long dead by midnight);
        # day-2 beat gets NO carry
        Row(event_id=5, user_id=3, ts=d(1, 12), value=0.0),
        Row(event_id=6, user_id=3, ts=d(2, 12), value=0.0),
    ])
    got = {(r.user_id, r.bucket_ts.day): r.uptime_ms
           for r in heartbeat_uptime(events, tolerance="15 minutes",
                                     carry_in=True).collect()}
    assert got[(1, 1)] == 5 * m                   # clipped at midnight
    assert got[(1, 2)] == 5 * m + 15 * m          # carry 5m + own 15m
    assert got[(2, 2)] == 10 * m + 15 * m         # full residual carry
    assert got[(3, 2)] == 15 * m                  # dead window: no carry
    assert got[(3, 1)] == 15 * m                  # first-ever: no carry
    # the self-contained default is UNCHANGED by the new parameter
    plain = {(r.user_id, r.bucket_ts.day): r.uptime_ms
             for r in heartbeat_uptime(events,
                                       tolerance="15 minutes").collect()}
    assert plain[(1, 2)] == 15 * m and plain[(2, 2)] == 15 * m


def test_heartbeat_carry_oracle_parity_and_plan(spark, sf_dir):
    """q181 parity at sf_dir scale plus the one-exchange plan pin (the
    cross-bucket lag rides the same key-hashed exchange — no join, no
    explode, no Python)."""
    import re
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare, duckdb_connection
    from etl_load_spark.queries import QUERIES
    q = QUERIES["q181_heartbeat_interpolated"]
    ok, msg = compare(q.fn(spark, sf_dir), duckdb_connection(sf_dir),
                      q.oracle)
    assert ok, msg
    plan = (q.fn(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_heartbeat_uptime_semantics(spark):
    """q178 contract (Timescale heartbeat_agg/uptime): each beat is
    live for min(gap-to-next, tolerance); the last beat clips to the
    bucket end; a silence past the tolerance is a mid-bucket gap (the
    bucket-end clip is not); same-ms duplicate beats add 0."""
    from etl_load_spark.operators.timeseries import heartbeat_uptime
    m = 60 * 1000
    events = spark.createDataFrame([
        # beats 00:00, 00:10, 01:00 with 15 min tolerance:
        # 00:00 live 10m (next inside tol), 00:10 live 15m (50m gap
        # -> tol-clipped, ONE gap), 01:00 live 15m (bucket-end clip
        # far away -> tol) => uptime 40m, 1 gap
        Row(event_id=1, user_id=1, ts=d(1, 0), value=0.0),
        Row(event_id=2, user_id=1, ts=dt.datetime(2024, 1, 1, 0, 10),
            value=0.0),
        Row(event_id=3, user_id=1, ts=d(1, 1), value=0.0),
        # duplicate-ms beat: 0 extra uptime, no gap
        Row(event_id=4, user_id=1, ts=d(1, 1), value=0.0),
        # user 2: beat 5 min before bucket end -> clipped to 5m, 0 gaps
        Row(event_id=5, user_id=2, ts=dt.datetime(2024, 1, 1, 23, 55),
            value=0.0),
    ])
    got = {(r.user_id, r.bucket_ts.day): (r.n_beats, r.uptime_ms, r.n_gaps)
           for r in heartbeat_uptime(events, tolerance="15 minutes")
           .collect()}
    assert got[(1, 1)] == (4, 40 * m, 1)
    assert got[(2, 1)] == (1, 5 * m, 0)


def test_new_hypertable_plan_shapes(spark, sf_dir):
    """q176/q177/q178 100 TB posture: q176's cross-bucket lag, in-bucket
    lead and rollup all ride ONE hashpartitioning(user_id) exchange
    (subset clustering, the counter_rate reuse); q177/q178 keep the
    q175 shape (one hash exchange + the output sort). No joins, no
    Python anywhere."""
    import re
    from etl_load_spark.queries import QUERIES
    for name in ("q176_twa_interpolated", "q177_state_durations",
                 "q178_heartbeat_uptime"):
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange (hash|range)", plan)) == 2, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    # q176's fixed-point quotient stayed integral
    plan176 = (QUERIES["q176_twa_interpolated"].fn(spark, sf_dir)
               ._jdf.queryExecution().executedPlan().toString())
    assert " div " in plan176


def test_trend_and_downtime_plan_shapes(spark, sf_dir):
    """q183 100 TB posture: ONE map-side-combinable hash aggregate
    (partial_count/partial_sum visible below the exchange — the
    shuffle ships five integer sums per (key, bucket), never samples)
    plus the output sort; no window, no join, no Python. q182 keeps
    q181's one-exchange-plus-sort shape — the downtime complement is
    derived in the same rollup, zero extra exchanges."""
    import re
    from etl_load_spark.queries import QUERIES
    for name in ("q182_heartbeat_downtime", "q183_trend_slope"):
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange (hash|range)", plan)) == 2, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    plan183 = (QUERIES["q183_trend_slope"].fn(spark, sf_dir)
               ._jdf.queryExecution().executedPlan().toString())
    assert "partial_" in plan183     # map-side combine before the shuffle
    assert "Window" not in plan183
    # the fixed-point quotient stayed integral (no float division
    # upstream of the single final cast)
    assert " div " in plan183.lower() or " DIV " in plan183


def test_instant_rate_and_histogram_plan_shapes(spark, sf_dir):
    """q184 keeps the q175 one-exchange shape (in-bucket lag window and
    max_by rollup share (key, bucket) clustering) plus the output
    sort; q185 is the q174/q183 shape — ONE map-side-combinable hash
    aggregate (no window at all), histogram-sized shuffle. No joins,
    no Python."""
    import re
    from etl_load_spark.queries import QUERIES
    for name in ("q184_instant_rate", "q185_value_histogram"):
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange (hash|range)", plan)) == 2, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    plan185 = (QUERIES["q185_value_histogram"].fn(spark, sf_dir)
               ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan185
    assert "partial_count" in plan185    # map-side combine


def test_delta_stats_changes_plan_shapes(spark, sf_dir):
    """Round-12 operators: q186 (delta) and q187 (value_stats) are the
    q174/q183 shape — ONE map-side-combinable hash aggregate, no
    window at all, plus the output sort; q188 (changes) is the q175
    one-exchange shape (in-bucket lag window and rollup share (key,
    bucket) clustering). No joins, no Python."""
    import re
    from etl_load_spark.queries import QUERIES
    for name in ("q186_value_delta", "q187_value_stats",
                 "q188_value_changes"):
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange (hash|range)", plan)) == 2, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "partial_count" in plan, name     # map-side combine
        if name != "q188_value_changes":
            assert "Window" not in plan, name


def test_value_stats_semantics(spark):
    """Hand fixture for the stats_agg contract: exact 4-decimal mean
    (half-up, sign-split) and sample variance S/(n(n−1)); variance
    NULL under two samples; NULL-value rows excluded; NULL key
    legitimate."""
    from etl_load_spark.operators.timeseries import value_stats
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=20.0),
        Row(event_id=3, user_id=1, ts=d(1, 3), value=40.0),
        Row(event_id=4, user_id=2, ts=d(1, 1), value=7.0),
        Row(event_id=5, user_id=2, ts=d(1, 2), value=None),
        Row(event_id=6, user_id=None, ts=d(1, 1), value=-3.335),
    ])
    got = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.mean, r.variance)
           for r in value_stats(events).collect()}
    # mean 70/3 = 23.3333…  → 23.3333; var of (10,20,40) = 233.3333…
    assert got[(1, 1)] == (3, 23.3333, 233.3333)
    assert got[(2, 1)] == (1, 7.0, None)
    # cents quantize -3.335 → -333.5 → -334 half-up-away? decimal(12,2)
    # HALF_UP rounds -3.335 to -3.34 → mean -3.34 exactly
    assert got[(None, 1)] == (1, -3.34, None)


def test_delta_and_changes_semantics(spark):
    """delta: last − first over the (ts, order) total order (ties broken
    by order id, the q174 key); changes: consecutive differing cents,
    first sample is a baseline."""
    from etl_load_spark.operators.timeseries import changes, delta
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=10.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=10.0),   # no change
        Row(event_id=3, user_id=1, ts=d(1, 3), value=4.5),
        Row(event_id=4, user_id=1, ts=d(1, 3), value=7.0),    # same-ts tie
        Row(event_id=5, user_id=2, ts=d(1, 5), value=9.0),
    ])
    dgot = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.delta)
            for r in delta(events).collect()}
    assert dgot[(1, 1)] == (4, -3.0)     # 7.0 − 10.0
    assert dgot[(2, 1)] == (1, 0.0)
    cgot = {(r.user_id, r.bucket_ts.day): (r.n_samples, r.n_changes)
            for r in changes(events).collect()}
    assert cgot[(1, 1)] == (4, 2)        # 10→4.5, 4.5→7
    assert cgot[(2, 1)] == (1, 0)


def test_value_topk_semantics_and_plan(spark, sf_dir):
    """q189 contract: exact per-value counts, (count DESC, value ASC)
    deterministic order, rank cut at k with the smaller value winning
    frequency ties; plan carries a Partial WindowGroupLimit below the
    exchange (InferWindowGroupLimit on the literal limit — the round-7
    lesson) and no joins/Python."""
    from etl_load_spark.operators.timeseries import value_topk
    events = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=d(1, 1), value=5.0),
        Row(event_id=2, user_id=1, ts=d(1, 2), value=5.0),
        Row(event_id=3, user_id=1, ts=d(1, 3), value=9.0),
        Row(event_id=4, user_id=1, ts=d(1, 4), value=9.0),   # tie w/ 5.0
        Row(event_id=5, user_id=1, ts=d(1, 5), value=2.0),
        Row(event_id=6, user_id=None, ts=d(1, 6), value=7.0),
    ])
    got = [(r.user_id, r.rank, r.value, r.n_occurrences)
           for r in value_topk(events, k=2).collect()]
    assert got == [(1, 1, 5.0, 2), (1, 2, 9.0, 2),   # tie → smaller first
                   (None, 1, 7.0, 1)]
    from etl_load_spark.queries import QUERIES
    plan = (QUERIES["q189_value_topk"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_time_weighted_avg_plan_shape(spark, sf_dir):
    """ONE hash exchange serves the lead window AND the (key, bucket)
    aggregate (identical partition keys); the only other exchange is
    the output sort. No joins, no Python, integral div on the path."""
    from etl_load_spark.queries import QUERIES
    import re
    df = QUERIES["q175_time_weighted_avg"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert " div " in plan


def test_lttb_semantics(spark):
    """q179 contract (Steinarsson LTTB): exactly `resolution` points
    per big series, first/last always kept, the planted extreme in
    each interior bucket kept (the visual-shape guarantee), small
    series pass through whole."""
    from etl_load_spark.operators.timeseries import lttb
    # one series, 10 points, resolution 4 => 2 interior buckets of 4;
    # plant one extreme per bucket (1000.0 and 0.0 on a flat 5.0 line)
    rows = [Row(event_id=i, user_id=1,
                ts=d(1, 2 * i), value=v)
            for i, v in enumerate([5.0, 5.0, 1000.0, 5.0,
                                   5.0, 0.0, 5.0, 5.0, 5.0, 5.0])]
    rows += [Row(event_id=20, user_id=2, ts=d(1, 1), value=1.0),
             Row(event_id=21, user_id=2, ts=d(1, 2), value=2.0)]
    out = lttb(spark.createDataFrame(rows), resolution=4).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 4
    got_vals = [r.value for r in by_user[1]]
    assert got_vals[0] == 5.0 and got_vals[-1] == 5.0   # first/last kept
    assert 1000.0 in got_vals and 0.0 in got_vals       # planted extremes
    assert [r.value for r in by_user[2]] == [1.0, 2.0]  # pass-through
    # column surface: unique total order (key, ts, order) + value
    assert out[0].__fields__ == ["user_id", "ts", "event_id", "value"]


def test_lttb_resolution_validation(spark):
    import pytest as _pytest
    from etl_load_spark.operators.timeseries import lttb, lttb_sql
    events = spark.createDataFrame(
        [], "event_id bigint, user_id bigint, ts timestamp, value double")
    with _pytest.raises(ValueError, match="resolution"):
        lttb(events, resolution=2)
    with _pytest.raises(ValueError, match="resolution"):
        lttb_sql("events", resolution=2)
    with _pytest.raises(ValueError, match="DISTINCT"):
        lttb(events, order_col="user_id")


def test_lttb_oversized_series_fails_loud_not_oom(spark):
    """VERDICT r10 #4: the 'pre-slice unbounded series upstream'
    contract was docstring-only — a series too big for one task died
    as a generic executor OOM. With max_points_per_series set, an
    oversized series now fails with lttb's OWN error naming the
    pre-slice fix, before any selection work; series within the cap
    are unaffected (identical output with and without the guard),
    and a cap below the resolution is rejected up front."""
    import pytest as _pytest
    from etl_load_spark.operators.timeseries import lttb
    rows = [Row(event_id=i, user_id=1,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                value=float(i % 7))
            for i in range(40)]
    rows += [Row(event_id=100 + i, user_id=2,
                 ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                 value=1.0) for i in range(5)]
    events = spark.createDataFrame(rows)
    with _pytest.raises(Exception, match="pre-slice") as ei:
        lttb(events, resolution=4, max_points_per_series=30).collect()
    assert "max_points_per_series=30" in str(ei.value)
    guarded = sorted(map(tuple, lttb(
        events, resolution=4, max_points_per_series=40).collect()))
    plain = sorted(map(tuple, lttb(events, resolution=4).collect()))
    assert guarded == plain
    with _pytest.raises(ValueError, match="below"):
        lttb(events, resolution=12, max_points_per_series=11)


def test_lttb_oracle_parity_independent_implementations(spark):
    """The kernel (sequential Python-int selection) and the oracle
    (unrolled chained-CTE HUGEINT replay) are INDEPENDENT
    implementations of the same contract — parity on a fixture with
    multi-bucket series, a pass-through small series, duplicate
    timestamps, a NULL-key series and NULL samples is a real
    cross-check, not a mirrored formula."""
    import duckdb
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare
    from etl_load_spark.operators.timeseries import lttb, lttb_sql
    rows = []
    for i in range(40):                                   # big series
        rows.append(Row(event_id=i, user_id=1,
                        ts=d(1 + i // 8, i % 8),
                        value=float((i * 37) % 23)))
    rows += [Row(event_id=100 + j, user_id=2, ts=d(2, j), value=float(j))
             for j in range(3)]                           # pass-through
    rows += [Row(event_id=200 + j, user_id=None, ts=d(1 + j // 5, j % 5),
                 value=float((j * 13) % 7)) for j in range(20)]  # NULL key
    rows += [Row(event_id=300, user_id=1, ts=d(1, 0), value=None),
             Row(event_id=301, user_id=1, ts=None, value=1.0)]   # excluded
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double")
    con = duckdb.connect()
    con.register("events", df.toPandas())
    for res in (3, 5, 12):
        ok, msg = compare(lttb(df, resolution=res), con,
                          lttb_sql("events", resolution=res))
        assert ok, f"resolution={res}: {msg}"


def test_lttb_exact_path_beyond_int64(spark):
    """The kernel's vectorized int64 path hands off to exact Python
    ints when the translated area bound exceeds 2^62 (decade-spanning
    high-magnitude series). Parity against the HUGEINT oracle on a
    feed engineered past the bound proves the fallback engages AND
    stays exact: 2·n3·span·crange ≈ 1e24 here, far beyond int64."""
    import duckdb
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare
    from etl_load_spark.operators.timeseries import lttb, lttb_sql
    rows = [Row(event_id=i, user_id=1,
                ts=dt.datetime(2014 + i // 4, 1 + (i % 4) * 3, 5),
                value=float((i * 7919) % 9_000_000_000))
            for i in range(40)]                     # 10-year span, 9e9 vals
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double")
    con = duckdb.connect()
    con.register("events", df.toPandas())
    ok, msg = compare(lttb(df, resolution=7), con,
                      lttb_sql("events", resolution=7))
    assert ok, msg


def test_lttb_oracle_parity_sf(spark, sf_dir):
    """Full-table parity at sf_dir scale (the q179 registration)."""
    import sys
    sys.path.insert(0, "tests")
    from oracle_utils import compare, duckdb_connection
    from etl_load_spark.queries import QUERIES
    q = QUERIES["q179_lttb_downsample"]
    ok, msg = compare(q.fn(spark, sf_dir), duckdb_connection(sf_dir),
                      q.oracle)
    assert ok, msg


def test_plan_shape(spark, sf_dir):
    """100TB posture: pushed ts filter, pruned scans, the ONE
    BroadcastNestedLoopJoin is the 1-row bounds broadcast, no
    cartesian, no Python, exact integer `div` on the data path."""
    from etl_load_spark.queries import QUERIES
    df = QUERIES["q172_gapfill"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(ts)" in plan
    assert " div " in plan  # fixed-point average/interp stayed integral
