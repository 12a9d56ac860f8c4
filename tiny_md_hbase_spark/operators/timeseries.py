"""Time-series analytics over the event stream: gap-filled regular
grids, rolling-window statistics, ordered funnels, and cohort
retention.

The reference engine stores points and answers spatial lookups
(`Client.java:61-131`); a production deployment of the same data
model invariably grows a time axis (ingest timestamps, event logs).
This module supplies the four time-series shapes every such workload
needs, built scale-first:

- every operator AGGREGATES RAW EVENTS FIRST with map-side partial
  aggregation (one shuffle on a small composite key), and only then
  runs ordered windows over the *aggregated spine*, whose size is
  O(span / bucket) per series — bounded by calendar time, NOT by data
  volume.  At 100 TB the raw-event scan stays embarrassingly
  parallel; the sequential per-series pass touches a few thousand
  rows regardless of input size.  This is the fix-shape the round-4
  verdict prescribed for `corpus_budget` (two-phase: distributed
  partials, then a bounded ordered pass), applied from the start.
- all value arithmetic is integer micros (``value * 1e6`` as LONG),
  so sums are exact and engine-independent — the same idiom
  `running_total` (analytics.py) uses to hash-match its DuckDB twin.
- timestamps become integer epoch microseconds via ``ts div 1000``
  (matching DuckDB's ``epoch_us``), bucketed with integer division —
  no float time math anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_S = 3600
HOUR_US = 3600 * 1_000_000
WEEK_US = 7 * 86400 * 1_000_000

FUNNEL_STEPS = ["view", "click", "purchase"]
ROLLING_HOURS = 24

# gap_fill expands each inter-observation gap in two explode levels of
# at most this many elements each (see gap_fill) so a single sparse
# series can never build one giant in-memory array on one row
GAP_CHUNK = 1024


def _require_positive(name: str, value: int) -> None:
    if value <= 0:
        raise ValueError(f"{name} must be a positive integer, got {value!r}")


def _value_micros(null_as_zero: bool):
    """``value`` as exact LONG micros — the module's ONE definition of
    the micros conversion (both engines mirror it in SQL via
    :func:`_value_micros_sql`).  ``null_as_zero`` picks the NULL
    convention: sums treat a NULL value as 0 (bucket sums are never
    NULL, matching the oracles' COALESCE spine forms); extremes
    (:func:`ohlc`) keep NULL so min/max skip the row."""
    m = F.round(F.col("value") * 1_000_000).cast("long")
    return F.coalesce(m, F.lit(0)) if null_as_zero else m


def _value_micros_sql(null_as_zero: bool) -> str:
    m = "CAST(round(value * 1000000) AS BIGINT)"
    return f"COALESCE({m}, 0)" if null_as_zero else m


def _hourly(events: DataFrame, bucket_s: int = HOUR_S) -> DataFrame:
    """Per-(event_type, bucket) exact sums — the shared first phase.

    One groupBy = one shuffle on (event_type, bucket_s) with map-side
    partial aggregation: every raw partition pre-collapses its rows to
    at most |types| x |buckets-it-spans| partials before the exchange,
    so the shuffled volume is bounded by the spine size per input
    partition, not the row count.  ``bucket_s`` is epoch seconds of
    the bucket start (integer arithmetic end to end).
    """
    _require_positive("bucket_s", bucket_s)
    bucket_us = bucket_s * 1_000_000
    return (
        events.select(
            "event_type",
            F.expr("ts div 1000").alias("ts_us"),
            _value_micros(null_as_zero=True).alias("value_micros"),
        )
        .groupBy(
            "event_type",
            (F.expr(f"(ts_us div {bucket_us}) * {bucket_s}")).alias("bucket_s"),
        )
        .agg(
            F.sum("value_micros").alias("sum_value_micros"),
            F.count("*").alias("n_events"),
        )
    )


def _hourly_sql(bucket_s: int = HOUR_S) -> str:
    _require_positive("bucket_s", bucket_s)
    return (
        "hourly AS (SELECT event_type, "
        f"(epoch_us(ts) // {bucket_s * 1_000_000}) * {bucket_s} AS bucket_s, "
        f"CAST(sum({_value_micros_sql(null_as_zero=True)}) AS BIGINT) AS sum_value_micros, "
        "count(*) AS n_events FROM events GROUP BY 1, 2)"
    )


def gap_fill(events: DataFrame, bucket_s: int = HOUR_S) -> DataFrame:
    """Regularize each event-type series onto a dense time grid,
    zero-filling counts and forward-filling the last observed sum.

    The missing-bucket problem: a raw groupBy emits NO row for an hour
    with no events, so downstream rolling/plotting/joins silently skip
    gaps.  Rather than generate a spine and left-join the observations
    back (two scans of the raw table — Catalyst cannot share the
    bounds aggregate with the sums aggregate), each OBSERVED bucket
    emits itself plus every empty bucket up to (exclusive) the next
    observation in its series, via ``lead`` + ``sequence`` +
    ``explode``:

    - an emitted row at its own bucket keeps its ``n_events`` /
      ``sum_value_micros``; a gap row zero-fills both,
    - ``ff_sum_value_micros`` is the generating row's sum in both
      cases — the step-function carry-forward comes out of the
      expansion for free, with no ignore-nulls window.

    Plan shape: ONE scan -> map-side-partial aggregate (exchange on
    (event_type, bucket_s)) -> re-key to event_type for the ``lead``
    window -> generate.  No join, no second scan.  The ordered window
    partitions by event_type but runs over the aggregated series
    (span/bucket rows per type — a year of hours is 8,760 rows), never
    over raw events, so the sequential pass is calendar-bounded, not
    data-bounded.

    The expansion itself is TWO nested generate levels — coarse chunk
    starts (``GAP_CHUNK`` buckets apart), then buckets within each
    chunk — so one row's in-memory ``sequence`` array is at most
    ``gap/GAP_CHUNK`` (level 1) or ``GAP_CHUNK`` (level 2) elements.
    A single flat ``sequence`` would build the whole gap as one array
    on one row: a decade-long gap at minute granularity is a ~5M-element
    (tens of MB) single-row allocation, and past 2^31 elements Spark's
    ``sequence`` throws outright.
    """
    hourly = _hourly(events, bucket_s)
    w = Window.partitionBy("event_type").orderBy("bucket_s")
    step = F.lit(bucket_s).cast("long")
    chunk = F.lit(bucket_s * GAP_CHUNK).cast("long")
    expanded = (
        hourly.withColumn("next_bucket_s", F.lead("bucket_s").over(w))
        .withColumn(
            "gap_end_s",
            F.coalesce(F.col("next_bucket_s") - step, F.col("bucket_s")),
        )
        .select(
            "event_type",
            F.col("bucket_s").alias("obs_bucket_s"),
            "n_events",
            "sum_value_micros",
            "gap_end_s",
            F.explode(
                F.sequence("bucket_s", "gap_end_s", chunk)
            ).alias("chunk_s"),
        )
        .select(
            "event_type",
            "obs_bucket_s",
            "n_events",
            "sum_value_micros",
            F.explode(
                F.sequence(
                    "chunk_s",
                    F.least(F.col("chunk_s") + chunk - step, F.col("gap_end_s")),
                    step,
                )
            ).alias("bucket_s"),
        )
    )
    observed = F.col("bucket_s") == F.col("obs_bucket_s")
    zero = F.lit(0).cast("long")
    return expanded.select(
        "event_type",
        "bucket_s",
        F.when(observed, F.col("n_events")).otherwise(zero).alias("n_events"),
        F.when(observed, F.col("sum_value_micros"))
        .otherwise(zero)
        .alias("sum_value_micros"),
        F.col("sum_value_micros").alias("ff_sum_value_micros"),
    )


def gap_fill_sql(bucket_s: int = HOUR_S) -> str:
    return (
        f"WITH {_hourly_sql(bucket_s)}, "
        "bounds AS (SELECT event_type, min(bucket_s) AS lo, max(bucket_s) AS hi "
        "FROM hourly GROUP BY 1), "
        "spine AS (SELECT event_type, "
        f"unnest(range(lo, hi + {bucket_s}, {bucket_s})) AS bucket_s FROM bounds) "
        "SELECT s.event_type, s.bucket_s, "
        "COALESCE(h.n_events, 0) AS n_events, "
        "COALESCE(h.sum_value_micros, 0) AS sum_value_micros, "
        "last_value(h.sum_value_micros IGNORE NULLS) OVER "
        "(PARTITION BY s.event_type ORDER BY s.bucket_s) AS ff_sum_value_micros "
        # NULL-safe series key: a NULL event_type forms its own series in
        # the Spark generate-based path (groupBy keeps NULL groups), but a
        # plain equi-join would drop it from the spine match and zero the
        # observed row — IS NOT DISTINCT FROM keeps the engines aligned
        "FROM spine s LEFT JOIN hourly h "
        "ON s.event_type IS NOT DISTINCT FROM h.event_type "
        "AND s.bucket_s = h.bucket_s"
    )


def rolling_stats(events: DataFrame, hours: int = ROLLING_HOURS) -> DataFrame:
    """Trailing ``hours``-hour sum and event count per type at each
    observed hourly bucket — the moving-aggregate shape (RANGE frame).

    A RANGE frame over *epoch seconds* (not ROWS) makes gaps behave:
    a bucket preceded by an empty day aggregates only what actually
    falls inside the trailing window, identically in both engines.
    Frame = ``[(hours-1) * 3600 seconds preceding, current]``, i.e.
    exactly the ``hours`` hourly buckets ending at the current one.

    Scale: same two-phase shape as :func:`gap_fill` — the RANGE window
    sorts the bounded per-type spine, not raw events.  Sums are exact
    LONG micros, so the rolling sum is order-independent.
    """
    _require_positive("hours", hours)
    frame_lo = -(hours - 1) * HOUR_S
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rangeBetween(frame_lo, 0)
    )
    return _hourly(events).select(
        "event_type",
        "bucket_s",
        "n_events",
        "sum_value_micros",
        F.sum("sum_value_micros").over(w).alias("rolling_sum_micros"),
        F.sum("n_events").over(w).alias("rolling_events"),
    )


def rolling_stats_sql(hours: int = ROLLING_HOURS) -> str:
    _require_positive("hours", hours)
    preceding = (hours - 1) * HOUR_S
    frame = (
        f"OVER (PARTITION BY event_type ORDER BY bucket_s "
        f"RANGE BETWEEN {preceding} PRECEDING AND CURRENT ROW)"
    )
    return (
        f"WITH {_hourly_sql()} "
        "SELECT event_type, bucket_s, n_events, sum_value_micros, "
        f"CAST(sum(sum_value_micros) {frame} AS BIGINT) AS rolling_sum_micros, "
        f"CAST(sum(n_events) {frame} AS BIGINT) AS rolling_events "
        "FROM hourly"
    )


def ohlc(events: DataFrame, bucket_s: int = HOUR_S) -> DataFrame:
    """Open/high/low/close downsampling: per (event_type, hourly
    bucket), the first and last observed value plus the min/max — the
    standard lossy time-series compaction (candlesticks, dashboard
    downsampling, feature rollups).

    First/last are deterministic under ties: "first" is the value at
    the lexicographically smallest ``(ts_us, event_id)`` — two events
    in the same microsecond resolve by event_id, identically in both
    engines, rather than by whichever row an engine's arg_min happens
    to keep.  Implemented as ``min``/``max`` over a
    ``struct(ts_us, event_id, value_micros)``: structs compare
    lexicographically in Spark and DuckDB alike, and struct min/max is
    an ordinary declarative aggregate, so the whole query is ONE
    map-side-partial shuffle on (event_type, bucket_s) — every raw
    partition collapses to at most one partial per bucket it spans, no
    window, no join, no second scan.

    NULL values are IGNORED for the extremes (min/max skip them, in
    both engines, via a NULL micros / NULL struct) but still counted
    in ``n_events`` — coalescing them to 0 like the sum convention
    would report a phantom 0 as a bucket's low/open/close.  A bucket
    whose every value is NULL yields NULL extremes.
    """
    _require_positive("bucket_s", bucket_s)
    bucket_us = bucket_s * 1_000_000
    micros = _value_micros(null_as_zero=False)
    tagged = events.select(
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        micros.alias("value_micros"),
        "event_id",
    ).select(
        "event_type",
        (F.expr(f"(ts_us div {bucket_us}) * {bucket_s}")).alias("bucket_s"),
        F.when(
            F.col("value_micros").isNotNull(),
            F.struct("ts_us", "event_id", "value_micros"),
        ).alias("tev"),
        "value_micros",
    )
    return tagged.groupBy("event_type", "bucket_s").agg(
        F.min("tev").getField("value_micros").alias("open_micros"),
        F.max("value_micros").alias("high_micros"),
        F.min("value_micros").alias("low_micros"),
        F.max("tev").getField("value_micros").alias("close_micros"),
        F.count("*").alias("n_events"),
    )


def ohlc_sql(bucket_s: int = HOUR_S) -> str:
    _require_positive("bucket_s", bucket_s)
    tev = (
        "CASE WHEN value_micros IS NULL THEN NULL "
        "ELSE {'t': ts_us, 'e': event_id, 'v': value_micros} END"
    )
    return (
        "WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, "
        f"{_value_micros_sql(null_as_zero=False)} AS value_micros, "
        "event_id FROM events) "
        f"SELECT event_type, (ts_us // {bucket_s * 1_000_000}) * {bucket_s} AS bucket_s, "
        f"(min({tev})).v AS open_micros, "
        "max(value_micros) AS high_micros, "
        "min(value_micros) AS low_micros, "
        f"(max({tev})).v AS close_micros, "
        "count(*) AS n_events "
        "FROM e GROUP BY 1, 2"
    )


def funnel(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Ordered-funnel user counts: how many users performed step 1,
    then step 2 STRICTLY AFTER their first step 1, then step 3 after
    that, ... — the product-analytics conversion query.

    Semantics (first-touch): a user converts step *i* if they have any
    ``steps[i]`` event strictly later (in microseconds) than their
    earliest qualifying ``steps[i-1]`` time.  Each stage is

        events[type = step_i]  ⋈user_id  prev_stage,  ts_us > prev.t,
        groupBy user -> min(ts_us)

    Scale: stage 1 is one filtered aggregate; every later stage joins
    events (filtered to ONE type) against the shrinking per-user
    stage table on user_id — all stages hash-partition by user_id, so
    a co-partitioned layout carries one logical shuffle through the
    whole chain.  The final per-stage counts are single-row
    aggregates unioned together; no window functions, no
    collect_list of per-user event arrays (which would break on a
    100 TB power user).

    Each stage table is ``cache()``d (MEMORY_AND_DISK): stage *i*
    feeds BOTH its own count branch and stage *i+1*'s join, and
    without the cache Spark re-executes the whole chain's lineage per
    consumer — O(steps²) scans of the event table for a k-step
    funnel.  The cached relations are per-user aggregates (bounded by
    the user count, ~16 bytes/row), not raw events.  The per-stage
    counts are materialized EAGERLY so every stage cache can be
    unpersisted before returning — a long-lived session (a bench
    driver, a notebook) must not accumulate one orphaned cached
    relation per funnel call in the block manager.  The returned
    DataFrame is the (steps)-row literal result.
    """
    steps = FUNNEL_STEPS if steps is None else steps
    if not steps:
        raise ValueError("funnel needs at least one step event type")
    spark = events.sparkSession
    stages = funnel_stages(events, steps)
    for s in stages:
        s.cache()
    try:
        # ONE collect over the unioned per-stage count aggregates — the
        # branches share the cached stage relations and run inside a
        # single job (per-stage .count() calls would serialize k jobs)
        counts = None
        for i, (name, s) in enumerate(zip(steps, stages), start=1):
            c = s.agg(F.count("*").alias("users")).select(
                F.lit(i).alias("step"),
                F.lit(name).alias("event_type"),
                "users",
            )
            counts = c if counts is None else counts.unionByName(c)
        rows = [(r.step, r.event_type, r.users) for r in counts.collect()]
    finally:
        for s in stages:
            s.unpersist()
    return spark.createDataFrame(rows, "step int, event_type string, users long")


def funnel_stages(events: DataFrame, steps: list[str]) -> list[DataFrame]:
    """The lazy per-stage building blocks of :func:`funnel`: stage *i* is
    the per-user earliest time of a qualifying ``steps[i]`` event (strict
    first-touch chain).  Exposed uncached so plan tests can pin the join
    shape; :func:`funnel` caches each stage for the duration of its own
    eager count pass and unpersists before returning."""
    ev = events.select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    stage = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t"))
    )
    stages = [stage]
    for name in steps[1:]:
        stage = (
            ev.filter(F.col("event_type") == name)
            .join(stage.select("user_id", F.col("t").alias("_prev_t")), "user_id")
            .filter(F.col("ts_us") > F.col("_prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias("t"))
        )
        stages.append(stage)
    return stages


def funnel_sql(steps: list[str] | None = None) -> str:
    steps = FUNNEL_STEPS if steps is None else steps
    if not steps:
        raise ValueError("funnel needs at least one step event type")

    def q(name: str) -> str:
        # SQL string literal: double embedded quotes so a step name like
        # "add'to'cart" parses (the Spark twin takes it via F.lit as-is)
        return "'" + name.replace("'", "''") + "'"

    ctes = [
        "e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events)",
        (
            f"s1 AS (SELECT user_id, min(ts_us) AS t FROM e "
            f"WHERE event_type = {q(steps[0])} GROUP BY 1)"
        ),
    ]
    for i, name in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts_us) AS t "
            f"FROM e JOIN s{i - 1} USING (user_id) "
            f"WHERE e.event_type = {q(name)} AND e.ts_us > s{i - 1}.t GROUP BY 1)"
        )
    selects = [
        (
            f"SELECT {i} AS step, {q(name)} AS event_type, "
            f"CAST(count(*) AS BIGINT) AS users FROM s{i}"
        )
        for i, name in enumerate(steps, start=1)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by their first active
    week (epoch week index), counted in each later week they return —
    the cohort-triangle every growth dashboard is built on.

    Shape: distinct (user_id, week) pairs (one shuffle, map-side
    partial dedup), a per-user min for the cohort week (same user_id
    partitioning, reused), a co-partitioned self-join on user_id, and
    a final count per (cohort_week, week_offset).  The join output is
    distinct-by-construction in (user_id, week), so the final count is
    a plain ``count(*)`` — no countDistinct shuffle-dedup pass.
    """
    uw = (
        events.select(
            "user_id", F.expr(f"(ts div 1000) div {WEEK_US}").alias("week")
        )
        .distinct()
    )
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("users"))
    )


def retention_sql() -> str:
    return (
        "WITH uw AS (SELECT DISTINCT user_id, "
        f"epoch_us(ts) // {WEEK_US} AS week FROM events), "
        "cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1) "
        "SELECT c.cohort_week, u.week - c.cohort_week AS week_offset, "
        "CAST(count(*) AS BIGINT) AS users "
        "FROM uw u JOIN cohort c USING (user_id) GROUP BY 1, 2"
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """SCD2 / CDC state-interval build: compact each user's event
    stream into effective-dated state intervals — (user_id, state,
    valid_from, valid_to, n_events) where ``state`` is the
    ``event_type``, consecutive repeats of the same state collapse
    into one interval (the gaps-and-islands pattern), ``valid_to`` is
    the next interval's start (NULL for the current state), and
    ``n_events`` counts the raw events the interval absorbed. This is
    the slowly-changing-dimension type-2 build every warehouse runs to
    turn a change-data-capture log into an as-of-joinable dimension
    (``latest_state`` is its last-row projection; asof_join probes it).

    Times are integer epoch microseconds (the module idiom), ordering
    is (ts, event_id) so ties are deterministic cross-engine.

    Scale shape: ONE shuffle on user_id; the lag/flag window, the
    running-sum island numbering, the (user_id, grp) aggregation
    (user_id-partitioning satisfies the clustering — no second
    exchange) and the lead() stitching all reuse that partitioning.
    The sequential pass is per-user, bounded by per-entity event
    counts, not data volume — the same two-phase contract as the rest
    of this module."""
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.expr("ts div 1000").alias("ts_us"),
    )
    prev = F.lag("state").over(w_ord)
    flagged = base.withColumn(
        "chg",
        F.when(prev.isNull() | (F.col("state") != prev), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    grp = flagged.withColumn(
        "grp",
        F.sum("chg").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = grp.groupBy("user_id", "grp").agg(
        F.min("state").alias("state"),  # constant within an island
        F.min("ts_us").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_g = Window.partitionBy("user_id").orderBy("grp")
    return iv.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_g).alias("valid_to"),
        "n_events",
    ).orderBy("user_id", "valid_from")


def scd2_intervals_sql() -> str:
    """DuckDB twin of :func:`scd2_intervals` — same island numbering,
    same (ts, event_id) tie order, same NULL open end."""
    return (
        "WITH b AS (SELECT user_id, event_id, event_type AS state, "
        "epoch_us(ts) AS ts_us FROM events), "
        "f AS (SELECT *, CASE WHEN lag(state) OVER w IS NULL "
        "OR state <> lag(state) OVER w THEN 1 ELSE 0 END AS chg "
        "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), "
        "g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id "
        "ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS grp FROM f), "
        "iv AS (SELECT user_id, grp, min(state) AS state, "
        "min(ts_us) AS valid_from, CAST(count(*) AS BIGINT) AS n_events "
        "FROM g GROUP BY user_id, grp) "
        "SELECT user_id, state, valid_from, "
        "lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp) "
        "AS valid_to, n_events "
        "FROM iv ORDER BY user_id, valid_from"
    )


def change_points(events: DataFrame, bucket_s: int = HOUR_S) -> DataFrame:
    """CUSUM change-point estimation per event type: the bucket where
    the cumulative deviation from the series mean peaks — the classic
    argmax-CUSUM estimator for a sustained level shift (a mean SHIFT
    builds a ramp in the cumulative deviation that peaks at the shift
    point, where z-score anomaly flagging — `anomaly_zscore` — only
    sees isolated outliers). Returns one row per event_type:
    (event_type, change_bucket_s, s_abs_max, n_buckets), ordered by
    event_type.

    All-integer statistic: with per-bucket counts c_t, series total T
    and length n, the scaled cumulative deviation is
    ``S_t = n·Σ_{i≤t} c_i − t·T`` (= n·Σ(c_i − T/n) without the
    division), so the argmax is exact — no float mean, no rounding
    contract. Bounds: n ≤ calendar buckets (10^5 at a year of seconds),
    Σc ≤ 10^12 at 100 TB → n·Σc ≤ 10^17 < int64.

    Scale shape: phase 1 is the shared map-side-partial hourly
    aggregation (spine-sized output); the windows (cumsum, row_number,
    argmax) run per event_type over the calendar-bounded spine — the
    module's two-phase contract."""
    hourly = _hourly(events, bucket_s).select(
        "event_type", "bucket_s", "n_events"
    )
    w = Window.partitionBy("event_type").orderBy("bucket_s")
    wall = Window.partitionBy("event_type")
    scored = hourly.select(
        "event_type",
        "bucket_s",
        F.sum("n_events")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.row_number().over(w).alias("t"),
        F.sum("n_events").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select(
        "event_type",
        "bucket_s",
        "n",
        F.abs(
            F.col("n") * F.col("cum") - F.col("t") * F.col("total")
        ).cast("long").alias("s_abs"),
    )
    best = Window.partitionBy("event_type").orderBy(
        F.col("s_abs").desc(), "bucket_s"
    )
    return (
        scored.withColumn("rk", F.row_number().over(best))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("bucket_s").alias("change_bucket_s"),
            F.col("s_abs").alias("s_abs_max"),
            F.col("n").cast("long").alias("n_buckets"),
        )
        .orderBy("event_type")
    )


def change_points_sql(bucket_s: int = HOUR_S) -> str:
    """DuckDB twin of :func:`change_points` — same integer statistic,
    same (s_abs desc, bucket_s) argmax tie rule."""
    return (
        f"WITH {_hourly_sql(bucket_s)}, "
        "scored AS (SELECT event_type, bucket_s, "
        "abs((count(*) OVER (PARTITION BY event_type)) * "
        "(sum(n_events) OVER (PARTITION BY event_type ORDER BY bucket_s "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - "
        "(row_number() OVER (PARTITION BY event_type ORDER BY bucket_s)) * "
        "(sum(n_events) OVER (PARTITION BY event_type))) AS s_abs, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM hourly), "
        "ranked AS (SELECT event_type, bucket_s, s_abs, n, "
        "row_number() OVER (PARTITION BY event_type "
        "ORDER BY s_abs DESC, bucket_s) AS rk FROM scored) "
        "SELECT event_type, bucket_s AS change_bucket_s, "
        "CAST(s_abs AS BIGINT) AS s_abs_max, CAST(n AS BIGINT) AS n_buckets "
        "FROM ranked WHERE rk = 1 ORDER BY event_type"
    )
