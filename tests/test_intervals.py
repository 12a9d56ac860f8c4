"""Interval-overlap / band-join / histogram tests: hand-computed small
cases plus a brute-force cross-check of the binning rewrite (the rewrite
must find exactly the pairs the naive O(n²) predicate finds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import intervals as IV

EV_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    # rows: (event_id, ts_us, user_id, event_type, value_minutes)
    return spark.createDataFrame(
        [(e, t * 1000, u, k, v, "") for (e, t, u, k, v) in rows], EV_SCHEMA
    )


def test_interval_join_hand_case(spark):
    m = 60 * 1_000_000  # one minute in µs
    ev = _events(
        spark,
        [
            # user 1: e1 [0, 10m], e2 [5m, 7m] (inside e1), e3 [20m, 21m]
            (1, 0, 1, "a", 10.0),
            (2, 5 * m, 1, "a", 2.0),
            (3, 20 * m, 1, "a", 1.0),
            # user 2 at the same times — must not pair with user 1
            (4, 0, 2, "b", 10.0),
            # touching endpoints are closed-interval overlap (Range.java:46-48)
            (5, 30 * m, 1, "a", 5.0),
            (6, 35 * m, 1, "a", 1.0),
        ],
    )
    got = {
        (r.a_event_id, r.b_event_id): r.overlap_us
        for r in IV.interval_join(ev).collect()
    }
    assert got == {(1, 2): 2 * m, (5, 6): 0}


def test_time_band_join_matches_bruteforce(spark, sf_dir):
    from tiny_md_hbase_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r.a_type, r.b_type): (r.n_pairs, r.min_gap_us)
        for r in IV.time_band_join(ev).collect()
    }
    e = ev.select(
        "event_id", "event_type", F.expr("ts div 1000").alias("t")
    )
    a, b = e.alias("a"), e.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.event_id") < F.col("b.event_id"))
            & (
                F.abs(F.col("a.t") - F.col("b.t"))
                <= IV.BAND_RADIUS_US
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("a_type"),
            F.col("b.event_type").alias("b_type"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(F.abs(F.col("a.t") - F.col("b.t"))).alias("min_gap_us"),
        )
    )
    want = {(r.a_type, r.b_type): (r.n_pairs, r.min_gap_us) for r in brute.collect()}
    assert got == want and len(got) > 0


def test_grouped_histogram_buckets(spark):
    li = spark.createDataFrame(
        [
            ("A", "F", 0.0),        # bucket 0
            ("A", "F", 4999.99),    # bucket 0
            ("A", "F", 5000.0),     # bucket 1 (left-closed edges)
            ("N", "O", 999_999.0),  # clamps to the last bucket
        ],
        "l_returnflag string, l_linestatus string, l_extendedprice double",
    )
    rows = {
        (r.l_returnflag, r.bucket): (r.n, r.bucket_lo, r.sum_price_cents)
        for r in IV.grouped_histogram(li).collect()
    }
    assert rows[("A", 0)] == (2, 0.0, 499999)
    assert rows[("A", 1)] == (1, 5000.0, 500000)
    assert rows[("N", IV.HIST_NBINS - 1)][0] == 1


def test_time_band_join_no_cartesian(spark, sf_dir):
    """The binning rewrite must compile to an equi-join, never a
    broadcast-nested-loop / cartesian product."""
    from tiny_md_hbase_spark.sources import load_table

    plan = IV.time_band_join(
        load_table(spark, sf_dir, "events")
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
