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

__all__ = ["sessionize", "SESSION_GAP_US"]

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


def windowed_counts_sql(window_us: int = HOUR_US) -> str:
    """DuckDB twin of :func:`windowed_counts`."""
    return (
        "WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events) "
        f"SELECT ts_us - ts_us % {window_us} AS window_start_us, event_type, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
        "AS sum_value_micros FROM e GROUP BY 1, 2"
    )
