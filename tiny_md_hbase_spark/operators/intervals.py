"""Interval-overlap and band joins, plus grouped numeric histograms.

The reference has no joins at all (SURVEY.md §2.5 — its only two-table
interaction is the index→data lookup), so these are beyond-parity
operators in the spirit of its interval machinery: ``Range.intersect``
(`Range.java:46-48`) is exactly the 1-D overlap predicate
``a.min <= b.max AND b.min <= a.max``; here it is lifted from a scalar
predicate to set-at-a-time join operators, the way a warehouse would run
it.

Scale design:

- :func:`interval_join` has an equality key (``user_id``), so it is a
  plain shuffle join with the overlap condition as a residual — one
  shuffle, AQE splits skewed users. Never a cartesian node.
- :func:`time_band_join` has NO equality key; the naive plan is a
  broadcast-nested-loop over all pairs (O(n²) — dead at 100 TB). We
  derive the equality key: with bin width == band radius, two rows
  within the band sit in the same or adjacent bins, so exploding one
  side to its three candidate bins turns the band join into an
  equi-join on ``bin`` (3× one side's rows shuffled, pairs found
  exactly once — no dedup pass). This is the standard point-band
  binning rewrite (cf. Spark's own range-join hints in Databricks /
  Sedona's grid partitioning, and the grid trick already used by
  ``spatial.distance_join``).
- :func:`grouped_histogram` is a single map-side-partial aggregation on
  (group, bucket) — the canonical linear-scale shape; bucket ids come
  from integer arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "interval_join",
    "interval_join_sql",
    "time_band_join",
    "time_band_join_sql",
    "grouped_histogram",
    "grouped_histogram_sql",
]

MINUTE_US = 60 * 1_000_000


def _event_intervals(events: DataFrame) -> DataFrame:
    """Each event as a closed interval [ts, ts + value minutes] in µs.

    µs (not the fixture's native ns) because DuckDB truncates
    TIMESTAMP_NS to µs on read; ``round(value * 6e7)`` is one IEEE-754
    double op, bit-identical across engines.
    """
    s = F.expr("ts div 1000")
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        s.alias("s_us"),
        (s + F.round(F.col("value") * MINUTE_US).cast("long")).alias("e_us"),
    )


def interval_join(events: DataFrame) -> DataFrame:
    """Overlapping-interval pairs within each user: events become
    intervals [ts, ts + value minutes], and the op returns every pair of
    a user's events whose intervals overlap (closed ends, exactly
    ``Range.intersect``'s predicate), with the overlap length.

    Plan shape: self equi-join on ``user_id`` with the two interval
    inequalities as residuals — ONE shuffle of each side keyed by user,
    per-user pairing is partition-local, output ordered by nothing
    (driver compare is order-insensitive). ``a.event_id < b.event_id``
    both deduplicates the symmetric pair and drops self-pairs.
    """
    # single-file sources arrive as one partition, and with the small side
    # broadcast the pair-production stage inherits the stream side's
    # parallelism — repartition the RAW rows (not the projection) so the
    # per-user pairing spreads across the session's cores
    para = events.sparkSession.sparkContext.defaultParallelism
    if events.rdd.getNumPartitions() < para // 2:
        events = events.repartition(para, "user_id")
    iv = _event_intervals(events)
    a = iv.alias("a")
    b = iv.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.event_id") < F.col("b.event_id"),
                F.col("a.s_us") <= F.col("b.e_us"),
                F.col("b.s_us") <= F.col("a.e_us"),
            ],
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("a_event_id"),
            F.col("b.event_id").alias("b_event_id"),
            F.col("a.event_type").alias("a_type"),
            F.col("b.event_type").alias("b_type"),
            (
                F.least(F.col("a.e_us"), F.col("b.e_us"))
                - F.greatest(F.col("a.s_us"), F.col("b.s_us"))
            ).alias("overlap_us"),
        )
    )


def interval_join_sql() -> str:
    """DuckDB twin of :func:`interval_join` (DuckDB plans the inequality
    pair via IEJoin — different physical plan, same rows)."""
    return (
        "WITH iv AS (SELECT user_id, event_id, event_type, "
        "epoch_us(ts) AS s_us, "
        f"epoch_us(ts) + CAST(round(value * {MINUTE_US}) AS BIGINT) AS e_us "
        "FROM events) "
        "SELECT a.user_id, a.event_id AS a_event_id, b.event_id AS b_event_id, "
        "a.event_type AS a_type, b.event_type AS b_type, "
        "least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us "
        "FROM iv a JOIN iv b ON a.user_id = b.user_id "
        "AND a.event_id < b.event_id "
        "AND a.s_us <= b.e_us AND b.s_us <= a.e_us"
    )


BAND_RADIUS_US = 10 * 1_000_000  # ±10 s


def time_band_join(
    events: DataFrame, radius_us: int = BAND_RADIUS_US
) -> DataFrame:
    """Cross-user temporal co-occurrence: count event pairs whose
    timestamps are within ``radius_us`` of each other, grouped by the
    (type, type) pair — "what fires together" without any join key.

    The binning rewrite: bin width = radius, so |Δt| ≤ r implies the two
    bins differ by at most 1. One side keeps its single bin; the other
    explodes to {bin-1, bin, bin+1}; the join is then a pure EQUI-join
    on the bin (shuffle-hash, AQE-balanced) and each qualifying pair is
    produced exactly once because the kept side's bin is unique per row.
    The |Δt| residual removes adjacent-bin false positives. Shuffle
    volume: 4× the (8-byte ts, type) projection — independent of the
    O(n²/bins) pair count the nested-loop plan would materialize.
    """
    para = events.sparkSession.sparkContext.defaultParallelism
    if events.rdd.getNumPartitions() < para // 2:
        events = events.repartition(para)
    e = events.select(
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("t_us"),
    )
    b = e.withColumn("bin", F.col("t_us") - F.col("t_us") % radius_us)
    probe = b.select(
        F.col("event_id").alias("a_eid"),
        F.col("event_type").alias("a_type"),
        F.col("t_us").alias("a_t"),
        F.explode(
            F.array(
                F.col("bin") - radius_us, F.col("bin"), F.col("bin") + radius_us
            )
        ).alias("bin"),
    )
    build = b.select(
        F.col("event_id").alias("b_eid"),
        F.col("event_type").alias("b_type"),
        F.col("t_us").alias("b_t"),
        "bin",
    )
    pairs = probe.join(build, "bin").filter(
        (F.col("a_eid") < F.col("b_eid"))
        & (F.abs(F.col("a_t") - F.col("b_t")) <= radius_us)
    )
    return pairs.groupBy("a_type", "b_type").agg(
        F.count("*").alias("n_pairs"),
        F.min(F.abs(F.col("a_t") - F.col("b_t"))).alias("min_gap_us"),
    )


def time_band_join_sql(radius_us: int = BAND_RADIUS_US) -> str:
    """DuckDB twin: the straightforward band join (DuckDB's IEJoin makes
    the O(n²) formulation tractable at oracle scale)."""
    return (
        "WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS t FROM events) "
        "SELECT a.event_type AS a_type, b.event_type AS b_type, "
        "CAST(count(*) AS BIGINT) AS n_pairs, "
        "min(abs(a.t - b.t)) AS min_gap_us "
        "FROM e a JOIN e b ON a.event_id < b.event_id "
        f"AND abs(a.t - b.t) <= {radius_us} "
        "GROUP BY 1, 2"
    )


HIST_LO = 0.0
HIST_WIDTH = 5_000.0
HIST_NBINS = 22  # covers l_extendedprice ∈ [0, 110000)


def grouped_histogram(
    lineitem: DataFrame,
    lo: float = HIST_LO,
    width: float = HIST_WIDTH,
    nbins: int = HIST_NBINS,
) -> DataFrame:
    """Equi-width histogram of ``l_extendedprice`` per
    (``l_returnflag``, ``l_linestatus``) group: bucket index, row count,
    and exact cent-sum per bucket (the grouped-percentile companion —
    ``text_percentiles`` gives quantiles, this gives the shape).

    Bucket assignment is ``least(nbins-1, floor((v - lo) / width))`` in
    plain column arithmetic — JVM codegen, no UDF, and identical IEEE
    double steps on the DuckDB side so bucket edges agree bit-for-bit.
    One (group, bucket)-keyed aggregation with map-side partials; at
    100 TB this is a fixed-cardinality (groups × nbins) result, the
    cheapest distributed shape there is.
    """
    bucket = F.least(
        F.lit(nbins - 1),
        F.floor((F.col("l_extendedprice") - F.lit(lo)) / F.lit(width)),
    ).cast("int")
    return (
        lineitem.groupBy(
            "l_returnflag", "l_linestatus", bucket.alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("sum_price_cents"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            "n",
            "sum_price_cents",
        )
    )


def grouped_histogram_sql(
    lo: float = HIST_LO, width: float = HIST_WIDTH, nbins: int = HIST_NBINS
) -> str:
    """DuckDB twin of :func:`grouped_histogram`."""
    return (
        "WITH b AS (SELECT l_returnflag, l_linestatus, l_extendedprice, "
        f"CAST(least({nbins - 1}, floor((l_extendedprice - {lo}) / {width})) "
        "AS INTEGER) AS bucket FROM lineitem) "
        "SELECT l_returnflag, l_linestatus, bucket, "
        f"{lo} + bucket * {width} AS bucket_lo, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_price_cents "
        "FROM b GROUP BY 1, 2, 3"
    )
