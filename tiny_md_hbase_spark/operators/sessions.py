"""Event sessionization: batch (window functions) and the streaming
building block.

Batch sessionization is the canonical windowed-analytics shape: partition
by user, order by time, cut a session whenever the gap exceeds the
threshold, then aggregate per session. All JVM-side; the shuffle key is
``user_id`` (one shuffle), and AQE handles skewed users. Timestamps stay
as int64 nanoseconds end-to-end (the fixtures are TIMESTAMP(NANOS); exact
integer comparisons, no float/timezone hazards, and the DuckDB oracle
compares via epoch_ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "asof_join", "session_paths", "SESSION_GAP_US"]

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min

# timestamps are compared in µs: DuckDB's TIMESTAMP truncates the fixture's
# nanos to µs on read, so the Spark side floors identically for parity


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Per-user sessions: a new session starts when the gap to the
    previous event exceeds ``gap_us``. Returns one row per session with
    start/end (µs), event count, and value sum."""
    ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_break = (
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1)
        .otherwise(0)
    )
    with_sess = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        "value",
        F.sum(gap_break)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            # exact integer micro-units: double sums are accumulation-order
            # dependent and would not hash-match across engines
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "sum_value_micros"
            ),
        )
        .select(
            "user_id",
            "session_seq",
            "session_start_us",
            "session_end_us",
            "n_events",
            "sum_value_micros",
        )
    )


def asof_join(events: DataFrame, right_type: str = "error") -> DataFrame:
    """Backward as-of join within one event stream: every non-``right_type``
    event is annotated with the most recent ``right_type`` event of the same
    user at-or-before its timestamp (the "attach last error before this
    click" shape; no reference counterpart — SURVEY.md §2.5 notes the
    reference has no joins at all).

    Spark has no ASOF JOIN operator; the naive formulation is an
    inequality range join (O(left x right) per user). This implements the
    classic union-and-window rewrite instead: tag right rows, union (here:
    one pass over the single stream), and take ``last(..., ignorenulls)``
    over a (ts, side, event_id)-ordered per-user window. ONE shuffle on
    ``user_id``, linear work, no join node — the plan a range join should
    have compiled to. At 100 TB the per-user sort is partition-local after
    the shuffle and AQE splits skewed users' partitions.

    Ties: a right row at the same microsecond sorts before left rows
    (side 0 < 1) so it is visible to them; among right rows at the same
    microsecond the highest event_id wins (window order is ascending and
    ``last`` takes the latest). Fully deterministic.
    """
    is_r = F.col("event_type") == F.lit(right_type)
    tagged = events.select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        "event_type",
        F.when(is_r, 0).otherwise(1).alias("side"),
        F.when(is_r, F.col("event_id")).alias("r_eid"),
        F.when(is_r, F.expr("ts div 1000")).alias("r_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts_us",
            "event_type",
            "side",
            F.last("r_eid", ignorenulls=True).over(w).alias("prev_error_event_id"),
            F.last("r_ts", ignorenulls=True).over(w).alias("prev_error_ts_us"),
        )
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "event_type",
            "prev_error_event_id",
            "prev_error_ts_us",
            (F.col("ts_us") - F.col("prev_error_ts_us")).alias("lag_us"),
        )
    )


def asof_join_sql(right_type: str = "error") -> str:
    """DuckDB twin of :func:`asof_join` — the same union-window rewrite
    (ANSI window syntax; avoids DuckDB's ASOF JOIN so the same-microsecond
    tie rule is bit-identical to the Spark plan)."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, "
        "event_type FROM events), "
        "t AS (SELECT user_id, ts_us, event_id, event_type, "
        f"CASE WHEN event_type = '{right_type}' THEN 0 ELSE 1 END AS side, "
        f"CASE WHEN event_type = '{right_type}' THEN event_id END AS r_eid, "
        f"CASE WHEN event_type = '{right_type}' THEN ts_us END AS r_ts FROM e), "
        "j AS (SELECT event_id, user_id, ts_us, event_type, side, "
        "last_value(r_eid IGNORE NULLS) OVER w AS prev_error_event_id, "
        "last_value(r_ts IGNORE NULLS) OVER w AS prev_error_ts_us FROM t "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
        "SELECT event_id, user_id, ts_us, event_type, prev_error_event_id, "
        "prev_error_ts_us, ts_us - prev_error_ts_us AS lag_us "
        "FROM j WHERE side = 1"
    )


def sessionize_sql(gap_us: int = SESSION_GAP_US) -> str:
    """DuckDB twin (the TIMESTAMP_NS fixture truncates to µs via
    epoch_us)."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value "
        "FROM events), "
        "marked AS (SELECT user_id, ts_us, event_id, value, "
        "CASE WHEN ts_us - lag(ts_us) OVER w > "
        f"{gap_us} THEN 1 ELSE 0 END AS brk FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), "
        "sess AS (SELECT user_id, ts_us, event_id, value, "
        "sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq "
        "FROM marked) "
        "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, "
        "min(ts_us) AS session_start_us, max(ts_us) AS session_end_us, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
        "AS sum_value_micros FROM sess GROUP BY user_id, session_seq"
    )


HOUR_US = 3600 * 1_000_000


def windowed_counts(events: DataFrame, window_us: int = HOUR_US) -> DataFrame:
    """Tumbling-window counts/sums per event_type — the batch twin of
    ``streaming.ingest.stream_windowed_counts`` (same grouping, no
    watermark needed at rest). Window assignment is exact integer µs
    arithmetic (``ts_us - ts_us % window``), which is what ``F.window``
    computes for tumbling windows without the timestamp-type round trip —
    keeping the result hashable across engines. One map-side partially
    aggregated shuffle on (window, event_type)."""
    ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    return (
        ev.groupBy(
            (F.col("ts_us") - F.col("ts_us") % window_us).alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "sum_value_micros"
            ),
        )
    )


def latest_state(events: DataFrame) -> DataFrame:
    """CDC compaction: the latest event per user — last-writer-wins on
    (ts, event_id). The upsert/merge shape every changelog-backed table
    needs: one shuffle on the key, then a per-partition sort and
    row_number; no self-join against a 'current snapshot'. At scale this
    is the compaction step of a merge-on-read table — AQE coalesces the
    post-shuffle partitions, and the window never materializes more than
    one partition's rows."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_type",
            F.round(F.col("value") * 1_000_000).cast("long").alias("value_micros"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts_us", "event_type", "value_micros")
    )


def latest_state_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, "
        "CAST(round(value * 1000000) AS BIGINT) AS value_micros FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts_us DESC, event_id DESC) AS rn FROM e) "
        "SELECT user_id, event_id, ts_us, event_type, value_micros "
        "FROM r WHERE rn = 1"
    )


def rollup_hierarchy(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous aggregate: minute → hour → day, each
    level aggregating the one below instead of the raw stream.

    At 100 TB this is the difference between a day rollup that reads the
    raw event log (full scan per refresh) and one that reads the minute
    aggregate (~1/n_events_per_minute of the data): the minute level is
    the only pass over raw data, and every coarser resolution is a
    re-aggregation of sums/counts — possible because sum and count are
    commutative monoids, exactly the partial-agg contract Spark itself
    uses map-side. Returns the day level; the intermediate levels are
    the same frame with a coarser integer-index division.
    """
    minute = (
        events.select(
            F.expr("(ts div 1000) div 60000000").alias("minute_idx"),
            "event_type",
            F.round(F.col("value") * 1_000_000).cast("long").alias("v_micros"),
        )
        .groupBy("minute_idx", "event_type")
        .agg(F.sum("v_micros").alias("sum_value_micros"), F.count("*").alias("n_events"))
    )
    hour = (
        minute.groupBy(
            F.expr("minute_idx div 60").alias("hour_idx"), F.col("event_type")
        )
        .agg(
            F.sum("sum_value_micros").alias("sum_value_micros"),
            F.sum("n_events").alias("n_events"),
        )
    )
    return (
        hour.groupBy(F.expr("hour_idx div 24").alias("day_idx"), F.col("event_type"))
        .agg(
            F.sum("sum_value_micros").alias("sum_value_micros"),
            F.sum("n_events").alias("n_events"),
        )
    )


def rollup_hierarchy_sql() -> str:
    """DuckDB twin of :func:`rollup_hierarchy` — the direct day-grain
    aggregate (the hierarchy is an execution strategy; the logical result
    is identical because sum/count re-aggregate losslessly)."""
    return (
        "SELECT epoch_us(ts) // 86400000000 AS day_idx, event_type, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
        "AS sum_value_micros, CAST(count(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY 1, 2"
    )


def windowed_counts_sql(window_us: int = HOUR_US) -> str:
    """DuckDB twin of :func:`windowed_counts`."""
    return (
        "WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events) "
        f"SELECT ts_us - ts_us % {window_us} AS window_start_us, event_type, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
        "AS sum_value_micros FROM e GROUP BY 1, 2"
    )


def session_paths(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    max_len: int = 8,
    k: int = 20,
) -> DataFrame:
    """Top event-type paths: the most common ordered event-type
    sequences across sessions — the "what do users actually do"
    path-analysis report behind every funnel refinement. Sessions are
    cut exactly as :func:`sessionize` (same gap rule, same (ts,
    event_id) tie order); a session's path is its first ``max_len``
    event types joined with ``>``; paths are counted across all
    sessions and the top-``k`` returned as (path, n_sessions) under
    the total order (n_sessions desc, path). The truncation is the
    standard path-mining cap — it bounds BOTH the path-string size and
    the distinct-path cardinality (≤ |types|^max_len) regardless of
    session length.

    Scale shape: one user_id shuffle shared by the gap window and the
    per-session collect; the per-session ordered list is built by
    sort_array over (ts, event_id, type) structs — deterministic
    without trusting collect_list order — and is bounded by session
    length, while everything after (path counting) is map-side-partial
    aggregation over ≤ |types|^max_len distinct keys ending in
    TakeOrderedAndProject."""
    ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_break = (
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1).otherwise(0)
    )
    with_sess = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        "event_type",
        F.sum(gap_break)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    path = F.array_join(
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts_us", "event_id", "event_type")
                    )
                ),
                lambda s: s["event_type"],
            ),
            1,
            max_len,
        ),
        ">",
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def session_paths_sql(
    gap_us: int = SESSION_GAP_US, max_len: int = 8, k: int = 20
) -> str:
    """DuckDB twin of :func:`session_paths` — ordered list() aggregate
    replaces the sort_array(collect_list(struct)) idiom; same gap rule,
    slice bound, and total order."""
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, "
        "event_type FROM events), "
        "marked AS (SELECT user_id, ts_us, event_id, event_type, "
        f"CASE WHEN ts_us - lag(ts_us) OVER w > {gap_us} "
        "THEN 1 ELSE 0 END AS brk FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), "
        "sess AS (SELECT user_id, ts_us, event_id, event_type, "
        "sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq "
        "FROM marked), "
        "p AS (SELECT user_id, session_seq, "
        "array_to_string(list(event_type ORDER BY ts_us, event_id)"
        f"[1:{max_len}], '>') AS path "
        "FROM sess GROUP BY user_id, session_seq) "
        "SELECT path, CAST(count(*) AS BIGINT) AS n_sessions "
        "FROM p GROUP BY path "
        f"ORDER BY n_sessions DESC, path LIMIT {k}"
    )
