"""Semantic + plan contracts for operators/timeseries.py: gap_fill,
rolling_stats, funnel, retention. The DuckDB oracles pin whole-query
equality at sf0.01; these tests pin the SEMANTIC corners (planted gaps,
strict funnel ordering, cohort offsets) on hand-built fixtures and the
scale shape (map-side partials before any ordered window; no cartesian
anything) on the real tables."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tiny_md_hbase_spark import plans as P
from tiny_md_hbase_spark.operators import timeseries as TS
from tiny_md_hbase_spark.sources import load_table

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


_EPOCH = dt.datetime(1970, 1, 1)


def _nanos(ts) -> int:
    """UTC wall-clock -> the engine's canonical int64 epoch nanoseconds
    (sources/tables.py load_table normalizes events.ts the same way)."""
    if not isinstance(ts, dt.datetime):
        ts = dt.datetime.fromisoformat(ts)
    return ((ts - _EPOCH) // dt.timedelta(microseconds=1)) * 1000


def _events(spark, rows):
    """rows: (event_id, iso-ts-or-datetime, user_id, event_type, value)."""
    data = [
        (int(eid), _nanos(ts), int(uid), et, float(v), "{}")
        for eid, ts, uid, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )


def test_gap_fill_zero_fills_and_carries_forward(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:10:00", 1, "a", 1.5),
            (2, "2024-01-01T03:20:00", 1, "a", 2.0),
            (3, "2024-01-01T03:40:00", 2, "a", 0.25),
        ],
    )
    rows = {r["bucket_s"]: r for r in TS.gap_fill(ev).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert sorted(rows) == [base, base + 3600, base + 7200, base + 10800]
    # observed first bucket
    assert rows[base]["n_events"] == 1
    assert rows[base]["sum_value_micros"] == 1_500_000
    assert rows[base]["ff_sum_value_micros"] == 1_500_000
    # planted gap: zero-filled counts, carried-forward sum
    for gap in (base + 3600, base + 7200):
        assert rows[gap]["n_events"] == 0
        assert rows[gap]["sum_value_micros"] == 0
        assert rows[gap]["ff_sum_value_micros"] == 1_500_000
    # hour 3 aggregates both events exactly in integer micros
    assert rows[base + 10800]["n_events"] == 2
    assert rows[base + 10800]["sum_value_micros"] == 2_250_000
    assert rows[base + 10800]["ff_sum_value_micros"] == 2_250_000


def test_gap_fill_null_value_counts_as_zero(spark):
    """A NULL value contributes 0 micros (but still counts as an event),
    so bucket sums are never NULL — pinning the coalesce that keeps the
    Spark side aligned with the oracle's COALESCE(h.sum, 0) spine."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:10:00", 1, "a", 1.0),
            (3, "2024-01-01T02:30:00", 1, "a", 0.5),
        ],
    ).unionByName(
        _events(spark, [(2, "2024-01-01T02:10:00", 2, "a", 0.0)]).withColumn(
            "value", F.lit(None).cast("double")
        )
    )
    rows = {r["bucket_s"]: r for r in TS.gap_fill(ev).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # the all-NULL-free hour is unaffected
    assert rows[base]["sum_value_micros"] == 1_000_000
    # hour 2: NULL-value event counts but adds 0 micros; sum is 500000, not NULL
    assert rows[base + 7200]["n_events"] == 2
    assert rows[base + 7200]["sum_value_micros"] == 500_000
    assert rows[base + 7200]["ff_sum_value_micros"] == 500_000


def test_gap_fill_null_event_type_series_cross_engine(spark):
    """A NULL event_type forms its OWN series on both engines: Spark's
    generate path keeps NULL groups natively, and the twin's spine join
    is IS NOT DISTINCT FROM — a plain equi-join missed the NULL series'
    observed row and zeroed it (found by the r10 events-poison probe)."""
    import duckdb

    rows = [
        (1, "2024-01-01 00:10:00", 1, None, 1.5),
        (2, "2024-01-01 02:20:00", 1, None, 2.0),
        (3, "2024-01-01 00:30:00", 2, "a", 0.25),
    ]
    ev = _events(spark, [(i, t.replace(" ", "T"), u, e, v) for i, t, u, e, v in rows])
    key = lambda t: (t[0] or "", *t[1:])  # noqa: E731 — None sorts first
    got = sorted(
        (
            (r.event_type, r.bucket_s, r.n_events, r.sum_value_micros,
             r.ff_sum_value_micros)
            for r in TS.gap_fill(ev).collect()
        ),
        key=key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, TIMESTAMP '{t}', {u}, "
            + ("NULL" if e is None else f"'{e}'")
            + f", {v})"
            for i, t, u, e, v in rows
        )
        + ") t(event_id, ts, user_id, event_type, value)"
    )
    want = sorted(map(tuple, con.sql(TS.gap_fill_sql()).fetchall()), key=key)
    assert got == want
    # the NULL series has its observed buckets + the gap between them
    null_series = [g for g in got if g[0] is None]
    assert len(null_series) == 3  # hour 0 observed, hour 1 gap, hour 2 observed
    assert null_series[0][2] == 1 and null_series[1][2] == 0


def test_gap_fill_spines_are_per_type(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:00:30", 1, "a", 1.0),
            (2, "2024-01-01T05:00:30", 1, "a", 1.0),
            (3, "2024-01-02T00:00:30", 1, "b", 1.0),
        ],
    )
    out = TS.gap_fill(ev).groupBy("event_type").count().collect()
    counts = {r["event_type"]: r["count"] for r in out}
    # type a spans 6 hourly buckets; type b's spine is its single bucket,
    # NOT stretched to the global min/max
    assert counts == {"a": 6, "b": 1}


def test_rolling_stats_range_frame_ages_out(spark):
    base = dt.datetime(2024, 1, 1)
    ev = _events(
        spark,
        [
            (1, base, 1, "a", 1.0),
            (2, base + dt.timedelta(hours=23), 1, "a", 2.0),
            (3, base + dt.timedelta(hours=30), 1, "a", 4.0),
        ],
    )
    rows = {r["bucket_s"]: r for r in TS.rolling_stats(ev).collect()}
    b0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # hour 23 still sees hour 0 (trailing 24h = buckets 0..23 inclusive)
    assert rows[b0 + 23 * 3600]["rolling_sum_micros"] == 3_000_000
    assert rows[b0 + 23 * 3600]["rolling_events"] == 2
    # hour 30's frame is [hour 7, hour 30]: hour 0 aged out, hour 23 still in
    assert rows[b0 + 30 * 3600]["rolling_sum_micros"] == 6_000_000
    assert rows[b0 + 30 * 3600]["rolling_events"] == 2
    # gaps between observations produce no spine rows in rolling_stats
    assert len(rows) == 3


def test_ohlc_first_last_min_max(spark):
    t = dt.datetime(2024, 1, 1)
    ev = _events(
        spark,
        [
            (1, t + dt.timedelta(minutes=10), 1, "a", 2.0),   # open
            (2, t + dt.timedelta(minutes=20), 1, "a", 5.0),   # high
            (3, t + dt.timedelta(minutes=30), 1, "a", 0.25),  # low
            (4, t + dt.timedelta(minutes=40), 1, "a", 3.0),   # close
            (5, t + dt.timedelta(hours=2), 1, "a", 7.0),      # other bucket
        ],
    )
    rows = {r["bucket_s"]: r for r in TS.ohlc(ev).collect()}
    base = int(t.replace(tzinfo=dt.timezone.utc).timestamp())
    r0 = rows[base]
    assert (
        r0["open_micros"],
        r0["high_micros"],
        r0["low_micros"],
        r0["close_micros"],
        r0["n_events"],
    ) == (2_000_000, 5_000_000, 250_000, 3_000_000, 4)
    r2 = rows[base + 7200]
    assert r2["open_micros"] == r2["close_micros"] == 7_000_000
    assert r2["n_events"] == 1


def test_ohlc_ties_resolve_by_event_id(spark):
    """Two events in the SAME microsecond: first/last come from the
    smaller/larger event_id — deterministic in both engines, not
    whichever row an arg_min kept."""
    t = dt.datetime(2024, 1, 1, 0, 30)
    ev = _events(
        spark,
        [
            (7, t, 1, "a", 9.0),
            (3, t, 2, "a", 1.0),  # same ts, smaller event_id -> open
        ],
    )
    r = TS.ohlc(ev).collect()[0]
    assert r["open_micros"] == 1_000_000
    assert r["close_micros"] == 9_000_000


def test_ohlc_single_mapside_partial_shuffle(spark, sf_dir):
    q = TS.ohlc(load_table(spark, sf_dir, "events"))
    plan = P.explain_str(q, "simple")
    assert "partial_" in plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert P.exchange_count(q) == 1


def test_ohlc_null_values_skip_extremes_but_count(spark):
    """NULL values never become a bucket's low/open/close (min/max skip
    them) yet still count in n_events; an all-NULL bucket has NULL
    extremes — unlike the sum convention, where NULL contributes 0."""
    t = dt.datetime(2024, 1, 1)
    base_rows = _events(
        spark,
        [
            (1, t + dt.timedelta(minutes=10), 1, "a", 5.0),
            (2, t + dt.timedelta(minutes=20), 1, "a", 3.0),
        ],
    )
    null_rows = _events(
        spark,
        [
            (3, t + dt.timedelta(minutes=5), 1, "a", 0.0),   # earliest, NULL
            (4, t + dt.timedelta(hours=3), 1, "a", 0.0),     # all-NULL bucket
        ],
    ).withColumn("value", F.lit(None).cast("double"))
    rows = {r["bucket_s"]: r for r in TS.ohlc(base_rows.unionByName(null_rows)).collect()}
    base = int(t.replace(tzinfo=dt.timezone.utc).timestamp())
    r0 = rows[base]
    # the NULL event is the earliest but cannot be the open; low is 3, not 0
    assert r0["open_micros"] == 5_000_000
    assert r0["low_micros"] == 3_000_000
    assert r0["n_events"] == 3
    r3 = rows[base + 3 * 3600]
    assert r3["n_events"] == 1
    assert r3["open_micros"] is None
    assert r3["high_micros"] is None
    assert r3["close_micros"] is None


def test_gap_fill_chunked_expansion_crosses_chunk_boundaries(spark):
    """A gap longer than GAP_CHUNK buckets expands through the two-level
    generate with no seam: every bucket appears exactly once, zero-filled,
    with the carry-forward intact."""
    n_gap = TS.GAP_CHUNK * 2 + 37  # spans 3 level-1 chunks
    ev = _events(
        spark,
        [
            (1, "2024-01-01T00:00:30", 1, "a", 1.0),
            (2, "2024-01-01T00:00:30", 1, "b", 2.0),
        ],
    )
    # move type a's second observation n_gap+1 minutes later at 60s buckets
    later = _events(
        spark, [(3, dt.datetime(2024, 1, 1, 0, 0, 30) + dt.timedelta(minutes=n_gap + 1), 1, "a", 4.0)]
    )
    out = TS.gap_fill(ev.unionByName(later), bucket_s=60).filter(
        F.col("event_type") == "a"
    )
    rows = sorted(r["bucket_s"] for r in out.collect())
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert rows == [base + 60 * i for i in range(n_gap + 2)]
    # every gap bucket zero-fills and carries type a's first sum forward
    mid = out.filter(
        (F.col("bucket_s") > base) & (F.col("bucket_s") < base + 60 * (n_gap + 1))
    )
    agg = mid.agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("ev"),
        F.min("ff_sum_value_micros").alias("ff_lo"),
        F.max("ff_sum_value_micros").alias("ff_hi"),
    ).collect()[0]
    assert (agg["n"], agg["ev"], agg["ff_lo"], agg["ff_hi"]) == (
        n_gap, 0, 1_000_000, 1_000_000
    )


def test_input_guards_raise(spark):
    import pytest as _pytest

    ev = _events(spark, [(1, "2024-01-01T00:00:00", 1, "a", 1.0)])
    with _pytest.raises(ValueError):
        TS.gap_fill(ev, bucket_s=0)
    with _pytest.raises(ValueError):
        TS.gap_fill_sql(bucket_s=-60)
    with _pytest.raises(ValueError):
        TS.rolling_stats(ev, hours=0)
    with _pytest.raises(ValueError):
        TS.rolling_stats_sql(hours=0)
    with _pytest.raises(ValueError):
        TS.ohlc(ev, bucket_s=0)
    with _pytest.raises(ValueError):
        TS.funnel(ev, steps=[])
    with _pytest.raises(ValueError):
        TS.funnel_sql(steps=[])


def test_funnel_sql_escapes_step_names():
    sql = TS.funnel_sql(["add'to'cart", "purchase"])
    assert "'add''to''cart'" in sql
    # DuckDB must parse the escaped literal
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT 1::BIGINT AS user_id, "
        "'view' AS event_type, now()::TIMESTAMP AS ts WHERE false"
    )
    assert con.execute(sql).fetchall() == [(1, "add'to'cart", 0), (2, "purchase", 0)]


def test_funnel_requires_strict_order(spark):
    t = dt.datetime(2024, 1, 1)

    def at(minutes):
        return t + dt.timedelta(minutes=minutes)

    ev = _events(
        spark,
        [
            # user 1: full ordered conversion
            (1, at(0), 1, "view", 0.0),
            (2, at(1), 1, "click", 0.0),
            (3, at(2), 1, "purchase", 0.0),
            # user 2: click BEFORE first view -> no step-2 credit
            (4, at(0), 2, "click", 0.0),
            (5, at(1), 2, "view", 0.0),
            # user 3: view only
            (6, at(0), 3, "view", 0.0),
            # user 4: click at the SAME microsecond as view -> strict >
            (7, at(5), 4, "view", 0.0),
            (8, at(5), 4, "click", 0.0),
            # user 5: purchase without ever viewing -> no credit at all
            (9, at(0), 5, "purchase", 0.0),
        ],
    )
    out = {r["step"]: (r["event_type"], r["users"]) for r in TS.funnel(ev).collect()}
    assert out == {1: ("view", 4), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_uses_first_touch_anchor(spark):
    t = dt.datetime(2024, 1, 1)
    # click falls between the user's two views: credit comes from the
    # EARLIEST view, so the click converts
    ev = _events(
        spark,
        [
            (1, t, 1, "view", 0.0),
            (2, t + dt.timedelta(minutes=1), 1, "click", 0.0),
            (3, t + dt.timedelta(minutes=2), 1, "view", 0.0),
        ],
    )
    out = {r["step"]: r["users"] for r in TS.funnel(ev).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


def test_retention_cohort_triangle(spark):
    week = dt.timedelta(days=7)
    # epoch-week boundaries: pick a base safely inside week w0
    w0 = dt.datetime(2024, 1, 4)
    ev = _events(
        spark,
        [
            # user 1: first active w0, returns w0+1 and w0+3
            (1, w0, 1, "view", 0.0),
            (2, w0 + week, 1, "view", 0.0),
            (3, w0 + 3 * week, 1, "click", 0.0),
            # two events in the SAME week count once
            (4, w0 + 3 * week + dt.timedelta(hours=1), 1, "view", 0.0),
            # user 2: single week, one cohort later
            (5, w0 + week, 2, "view", 0.0),
        ],
    )
    out = TS.retention(ev).collect()
    cohorts = {(r["cohort_week"] - min(x["cohort_week"] for x in out), r["week_offset"]): r["users"] for r in out}
    assert cohorts == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}


# ---------------------------------------------------------------------------
# plan contracts — the 100 TB shape
# ---------------------------------------------------------------------------


def test_gap_fill_aggregates_before_ordered_window(spark, sf_dir):
    q = TS.gap_fill(load_table(spark, sf_dir, "events"))
    plan = P.explain_str(q, "simple")
    # raw events collapse via map-side partial aggregation; the per-type
    # ordered window (the sequential pass) runs over the bounded series
    assert "partial_sum" in plan
    # the lead+sequence expansion needs no join and no second scan
    assert "Join" not in plan
    assert plan.count("FileScan") == 1
    # one exchange for the aggregate, one to re-key the series by type
    assert P.exchange_count(q) <= 2


def test_rolling_stats_window_reuses_agg_partitioning(spark, sf_dir):
    q = TS.rolling_stats(load_table(spark, sf_dir, "events"))
    plan = P.explain_str(q, "simple")
    assert "partial_sum" in plan
    # one exchange for the (event_type, bucket_s) aggregate, one to
    # re-key the bounded spine by event_type for the RANGE window —
    # nothing data-sized past the first
    assert P.exchange_count(q) <= 2
    assert "Join" not in plan


def test_funnel_joins_stay_on_user_id(spark, sf_dir):
    # funnel() itself is eager (it counts + unpersists its stage caches
    # before returning a literal result) — pin the plan contract on the
    # lazy stage chain it is built from
    stages = TS.funnel_stages(
        load_table(spark, sf_dir, "events"), TS.FUNNEL_STEPS
    )
    q = stages[-1]
    plan = P.explain_str(q, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no window functions, no per-user collect_list
    assert "Window" not in plan
    assert "collect_list" not in plan


def test_funnel_unpersists_stage_caches(spark, sf_dir):
    """funnel() must leave the block manager exactly as it found it: the
    per-stage caches exist only for the duration of its own eager count
    pass (a long-lived session running funnel repeatedly must not
    accumulate orphaned cached relations)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = TS.funnel(load_table(spark, sf_dir, "events"))
    assert out.count() == len(TS.FUNNEL_STEPS)
    assert jsc.getPersistentRDDs().size() == before


def test_retention_counts_without_distinct_recount(spark, sf_dir):
    q = TS.retention(load_table(spark, sf_dir, "events"))
    plan = P.explain_str(q, "simple")
    # the (user, week) dedup is the ONLY distinct pass; the final count
    # is a plain count over the join output
    assert plan.count("count(distinct") == 0
    assert "CartesianProduct" not in plan


def test_rolling_equals_gap_fill_cumulative_on_dense_series(spark):
    """Cross-operator consistency: on a gap-free series, the trailing
    24h rolling sum at bucket t equals the gap-filled series' sum of
    the last 24 buckets — pinning that both share the same bucket
    arithmetic and micros scaling."""
    base = dt.datetime(2024, 2, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "a", float(i) / 4) for i in range(40)
    ]
    ev = _events(spark, rows)
    roll = {
        r["bucket_s"]: r["rolling_sum_micros"]
        for r in TS.rolling_stats(ev).collect()
    }
    dense = sorted(
        (r["bucket_s"], r["sum_value_micros"]) for r in TS.gap_fill(ev).collect()
    )
    sums = [v for _, v in dense]
    for idx, (bucket, _) in enumerate(dense):
        lo = max(0, idx - 23)
        assert roll[bucket] == sum(sums[lo : idx + 1])


# ---- SCD2 interval build -------------------------------------------------


def test_scd2_intervals_matches_python_reference(spark, sf_dir):
    """Full output pinned against a driver-side gaps-and-islands
    recomputation from the raw events."""
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("user_id", "event_id", "event_type", F.expr("ts div 1000").alias("ts_us")).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, r.event_type))
    want = []
    for uid, evs in per_user.items():
        evs.sort()
        islands = []
        for ts_us, _, state in evs:
            if islands and islands[-1][0] == state:
                islands[-1][2] += 1
            else:
                islands.append([state, ts_us, 1])
        for i, (state, vf, n) in enumerate(islands):
            vt = islands[i + 1][1] if i + 1 < len(islands) else None
            want.append((uid, state, vf, vt, n))
    want.sort(key=lambda t: (t[0], t[2]))
    got = [
        (r.user_id, r.state, r.valid_from, r.valid_to, r.n_events)
        for r in TS.scd2_intervals(ev).collect()
    ]
    assert got == want


def test_scd2_intervals_contiguous_compacted_invariants(spark, sf_dir):
    """Per user: intervals tile the stream (valid_to == next
    valid_from), exactly one open interval, and no two consecutive
    intervals share a state (compaction actually compacted)."""
    out = TS.scd2_intervals(load_table(spark, sf_dir, "events")).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.valid_to is None) == 1
        assert ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, uid
            assert a.state != b.state, uid
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in out) == total  # every event absorbed once


# ---- CUSUM change points -------------------------------------------------


def test_change_points_matches_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.select("event_type", F.expr("ts div 1000").alias("ts_us"))
        .collect()
    )
    from collections import Counter

    per_type: dict[str, Counter] = {}
    for r in rows:
        per_type.setdefault(r.event_type, Counter())[
            (r.ts_us // 3_600_000_000) * 3600
        ] += 1
    want = []
    for et, c in per_type.items():
        buckets = sorted(c)
        n, total = len(buckets), sum(c.values())
        cum, best = 0, None
        for t, b in enumerate(buckets, 1):
            cum += c[b]
            s = abs(n * cum - t * total)
            if best is None or s > best[0]:
                best = (s, b)
        want.append((et, best[1], best[0], n))
    want.sort()
    got = [
        (r.event_type, r.change_bucket_s, r.s_abs_max, r.n_buckets)
        for r in TS.change_points(ev).collect()
    ]
    assert got == want


def test_change_points_finds_planted_level_shift(spark):
    """A series at rate 2/bucket that jumps to 10/bucket at bucket 50:
    the CUSUM argmax must land exactly on the last pre-shift bucket."""
    ns_per_bucket = 3600 * 1_000_000_000
    rows = []
    eid = 0
    for b in range(100):
        rate = 2 if b < 50 else 10
        for i in range(rate):
            rows.append((eid, b * ns_per_bucket + i, 1, "x", 0.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    out = TS.change_points(df).collect()
    assert len(out) == 1
    # S_t = n*cum - t*total ramps most negative at the shift: bucket 49
    assert out[0].change_bucket_s == 49 * 3600
    assert out[0].n_buckets == 100
