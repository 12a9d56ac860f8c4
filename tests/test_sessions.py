"""Sessionization tests: batch window logic, cluster labeling, and the
stateful streaming variant vs the batch ground truth."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import dedup as D
from tiny_md_hbase_spark.operators import sessions as SES
from tiny_md_hbase_spark.sources import load_table
from tiny_md_hbase_spark.streaming import ingest as ING


def test_sessionize_gap_logic(spark):
    us = 1_000_000
    rows = [
        # user 1: two sessions (gap 40min between e2 and e3)
        (1, 0 * us, 1, 1.5, "a", "p"),
        (1, 60 * 60 * us // 60, 2, 2.5, "a", "p"),  # +1 min
        (1, (1 + 41) * 60 * us, 3, 1.0, "a", "p"),  # +40 min -> new session
        # user 2: single event
        (2, 0, 4, 9.0, "b", "p"),
    ]
    ev = spark.createDataFrame(
        [(e, t * 1000, u, k, v, p) for (u, t, e, v, k, p) in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.sum_value_micros)
        for r in SES.sessionize(ev).collect()
    }
    assert got[(1, 0)] == (2, 4_000_000)
    assert got[(1, 1)] == (1, 1_000_000)
    assert got[(2, 0)] == (1, 9_000_000)


def test_sessionize_fixture_totals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sess = SES.sessionize(ev)
    assert sess.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    bad = sess.filter(F.col("session_end_us") < F.col("session_start_us"))
    assert bad.count() == 0


def test_rollup_hierarchy_matches_direct_day_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    via_hierarchy = {
        (r.day_idx, r.event_type): (r.sum_value_micros, r.n_events)
        for r in SES.rollup_hierarchy(ev).collect()
    }
    direct = {
        (r.day_idx, r.event_type): (r.s, r.c)
        for r in ev.groupBy(
            F.expr("(ts div 1000) div 86400000000").alias("day_idx"), "event_type"
        )
        .agg(
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("s"),
            F.count("*").alias("c"),
        )
        .collect()
    }
    assert via_hierarchy == direct


def test_dedup_clusters_transitivity(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 2) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.9), (4, 5, 0.9)],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {r.doc_id: r.cluster_id for r in D.dedup_clusters(docs, pairs).collect()}
    # chain 0-1-2 collapses transitively; 3 singleton; 4-5 pair
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    # the distributed min-label-propagation fallback (collect_limit=0)
    # must produce the identical labeling
    dist = {
        r.doc_id: r.cluster_id
        for r in D.dedup_clusters(docs, pairs, collect_limit=0).collect()
    }
    assert dist == got


def test_dedup_clusters_distributed_matches_unionfind_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard(docs)
    a = sorted(
        (r.doc_id, r.cluster_id) for r in D.dedup_clusters(docs, pairs).collect()
    )
    b = sorted(
        (r.doc_id, r.cluster_id)
        for r in D.dedup_clusters(docs, pairs, collect_limit=0).collect()
    )
    assert a == b


def test_stream_sessionize_matches_batch(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="sess_")
    try:
        ev = load_table(spark, sf_dir, "events")
        ev.write.parquet(f"{tmp}/src")
        q = (
            ING.stream_sessionize(spark, f"{tmp}/src")
            .writeStream.format("memory")
            .queryName("stream_sessions")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        streamed = {
            (r.user_id, r.session_start_us): (r.session_end_us, r.n_events, r.sum_value_micros)
            for r in spark.sql("SELECT * FROM stream_sessions").collect()
        }
        batch = SES.sessionize(ev).collect()
        # the stream emits every CLOSED session; the per-user last session
        # stays open in state. Closed sessions must match batch exactly.
        last_seq = {}
        for r in batch:
            last_seq[r.user_id] = max(last_seq.get(r.user_id, -1), r.session_seq)
        closed_batch = {
            (r.user_id, r.session_start_us): (r.session_end_us, r.n_events, r.sum_value_micros)
            for r in batch
            if r.session_seq < last_seq[r.user_id]
        }
        assert streamed == closed_batch
        assert len(streamed) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_counts_totals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = SES.windowed_counts(ev).collect()
    assert sum(r.n_events for r in out) == ev.count()
    hour = SES.HOUR_US
    assert all(r.window_start_us % hour == 0 for r in out)


def test_stream_dedup_drops_redeliveries(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="sdedup_")
    try:
        ev = load_table(spark, sf_dir, "events").limit(2000)
        # simulate at-least-once delivery: the same batch lands twice
        ev.write.parquet(f"{tmp}/src")
        ev.write.mode("append").parquet(f"{tmp}/src")
        q = (
            ING.stream_dedup_events(spark, f"{tmp}/src")
            .writeStream.format("memory")
            .queryName("stream_dedup")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        got = spark.sql("SELECT event_id FROM stream_dedup").collect()
        ids = [r.event_id for r in got]
        assert len(ids) == len(set(ids))
        assert set(ids) == {r.event_id for r in ev.select("event_id").collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_asof_join_semantics(spark):
    us = 1_000_000
    rows = [
        # (user, t_us, event_id, type)
        (1, 10 * us, 100, "error"),
        (1, 20 * us, 101, "click"),   # -> error 100, lag 10s
        (1, 30 * us, 102, "error"),
        (1, 30 * us, 103, "click"),   # same µs: all side-0 errors sort first
        (1, 30 * us, 104, "error"),   # -> highest-id same-µs error (104) wins
        (1, 40 * us, 105, "view"),    # -> error 104
        (2, 5 * us, 200, "click"),    # no prior error -> NULL
    ]
    ev = spark.createDataFrame(
        [(e, t * 1000, u, k, 1.0, "p") for (u, t, e, k) in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    got = {r.event_id: (r.prev_error_event_id, r.lag_us)
           for r in SES.asof_join(ev).collect()}
    assert got[101] == (100, 10 * us)
    assert got[103] == (104, 0)
    assert got[105] == (104, 10 * us)
    assert got[200] == (None, None)
    # right rows are not emitted as left rows
    assert set(got) == {101, 103, 105, 200}


def test_asof_join_fixture_shape(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = SES.asof_join(ev)
    n_left = ev.filter(F.col("event_type") != "error").count()
    assert out.count() == n_left
    assert out.filter(F.col("lag_us") < 0).count() == 0


# ---- session path mining -------------------------------------------------


def test_session_paths_matches_python_reference(spark, sf_dir):
    """Paths recomputed driver-side from the raw events with the same
    gap rule, tie order, and truncation."""
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    ).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(
            (r.ts_us, r.event_id, r.event_type)
        )
    from collections import Counter

    paths: Counter = Counter()
    for evs in per_user.values():
        evs.sort()
        cur: list[str] = []
        prev_ts = None
        for ts_us, _, et in evs:
            if prev_ts is not None and ts_us - prev_ts > SES.SESSION_GAP_US:
                paths[">".join(cur[:8])] += 1
                cur = []
            cur.append(et)
            prev_ts = ts_us
        if cur:
            paths[">".join(cur[:8])] += 1
    want = sorted(((-n, p) for p, n in paths.items()))[:20]
    want = [(p, -negn) for negn, p in want]
    got = [
        (r.path, r.n_sessions)
        for r in SES.session_paths(ev).collect()
    ]
    assert got == want and got


def test_session_paths_truncates_and_orders_within_session(spark):
    """A 10-event session truncates to its first 8 types in time
    order; ties on ts break by event_id. ``ts`` is int64 nanoseconds,
    exactly how Spark surfaces the fixture's TIMESTAMP(NANOS)."""
    S = 1_000_000_000  # 1 second in ns
    evs = [(i, i * S, 1, f"t{i}", 0.0, None) for i in range(10)]
    # three events share one ts two days later; event_id decides order
    day2 = 2 * 86400 * S
    evs += [
        (100, day2, 2, "a", 0.0, None),
        (102, day2, 2, "c", 0.0, None),
        (101, day2, 2, "b", 0.0, None),
    ]
    df = spark.createDataFrame(
        evs,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.path: r.n_sessions for r in SES.session_paths(df).collect()}
    assert got == {
        ">".join(f"t{i}" for i in range(8)): 1,
        "a>b>c": 1,
    }
