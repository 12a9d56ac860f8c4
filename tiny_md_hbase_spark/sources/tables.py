"""Fixture loaders and the derived ``points`` view (FIXTURES.md).

The reference stores exactly one entity kind — ``Point(id, x, y)`` with
non-negative coordinates (``Point.java:24-36``). The driver fixtures are
TPC-H-ish parquet, so spatial operators run over a deterministic derived
view of ``lineitem``; the SQL text and the DataFrame expression below must
stay expression-for-expression identical (the DuckDB oracle computes the
same view from the same parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# ANSI SQL twin of points() — inlined as a CTE in every spatial oracle query.
POINTS_SQL = (
    "SELECT l_orderkey * 8 + l_linenumber AS id, "
    "CAST(l_partkey % 4096 AS INTEGER) AS x, "
    "CAST((l_suppkey * 997 + l_orderkey) % 4096 AS INTEGER) AS y "
    "FROM lineitem"
)

# Coordinate domain of the derived view (FIXTURES.md): [0, 4095]^2.
DOMAIN_MAX = 4095


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # older fixture generations store TIMESTAMP(NANOS), which the parquet
    # reader rejects natively; set here (not only in our session factory) so
    # the driver's own vanilla SparkSession can run every query — nanos ts
    # columns surface as nanos-longs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_type = df.schema["ts"].dataType.typeName() if name == "events" else "long"
    if ts_type != "long":
        # current fixtures store ts as timestamp[us] (read as TIMESTAMP_NTZ);
        # normalize to the engine's canonical event-time representation —
        # int64 nanoseconds since epoch — so all time arithmetic stays exact
        # integer math and `ts div 1000` (µs) matches the DuckDB oracle's
        # epoch_us(ts) bit-for-bit. NTZ wall-clock is measured against the
        # epoch with timestampdiff — pure calendar arithmetic, independent
        # of the session timezone (no session-config mutation: a loader
        # that flips spark.sql.session.timeZone would make every other
        # timezone-sensitive query order-dependent on whether events was
        # loaded first).
        if ts_type == "timestamp_ntz":
            micros = F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        else:
            # absolute-instant TIMESTAMP: unix_micros is timezone-free
            micros = F.unix_micros(F.col("ts"))
        df = df.withColumn("ts", (micros * 1000).cast("long"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def write_as(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Materialize a table in another interchange format. Parquet is the
    engine's native layout (columnar, stats, pruning); ORC is the other
    columnar warehouse format (built-in, carries min/max stats and
    predicate pushdown just like parquet — the interchange a
    Hive/Trino-era lake hands over); CSV/JSON are the ingest/egress
    formats a pipeline meets at its edges. Timestamps are already plain
    longs here (nanos), so they survive textual round trips losslessly.
    (Avro is deliberately absent: it is an external Spark module, not
    available in this environment.)"""
    w = df.write.mode(mode)
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def load_as(spark: SparkSession, path: str, fmt: str, schema: str) -> DataFrame:
    """Read a table back from any supported format with an EXPLICIT
    schema — at 100 TB, schema inference is a full extra pass over text
    data and silently drifts types (a long column with one float row
    becomes double); the engine always states the schema at the edge."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        return r.option("header", "true").csv(path)
    if fmt == "json":
        return r.json(path)
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "orc":
        return r.orc(path)
    raise ValueError(f"unsupported format: {fmt}")


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived spatial-parity table: one row per lineitem, id unique,
    0 <= x, y <= 4095. Catalyst prunes the scan to the three source
    columns; the projection folds into the scan stage (no shuffle)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        (F.col("l_partkey") % 4096).cast("int").alias("x"),
        ((F.col("l_suppkey") * 997 + F.col("l_orderkey")) % 4096).cast("int").alias("y"),
    )
