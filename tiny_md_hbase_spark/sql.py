"""SQL facade: run the engine through plain ``spark.sql``.

Everything else in this package builds DataFrames programmatically; this
module is the declarative door — register the fixture tables as temp
views and any ANSI query runs through the same Catalyst planner with the
same pushdown/pruning/AQE behavior the DataFrame API gets. The flagship
here is the TPC-H Q1 pricing summary, the canonical scan-heavy
aggregation: one pass over lineitem, map-side partial aggs onto a
4-group key, shuffle carries four rows per task.

All money/quantity aggregates are exact integer (micro-)cents —
``round(expr * 10^k)`` is a single IEEE op on deterministically-ordered
arithmetic, so results are bit-identical across engines, unlike double
sums. The averages divide two exact integers (one IEEE division each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tiny_md_hbase_spark.sources.tables import TABLE_NAMES, load_table

__all__ = ["register_views", "pricing_summary", "PRICING_SUMMARY_SQL"]

# Runs verbatim on Spark AND DuckDB (ANSI subset both parse identically).
PRICING_SUMMARY_SQL = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) "
    "AS sum_qty_cents, "
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
    "AS sum_base_cents, "
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) "
    "AS BIGINT)) AS BIGINT) AS sum_disc_price_micro, "
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
    "* 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_micro, "
    "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) "
    "/ count(*) AS avg_qty_cents, "
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) "
    "/ count(*) AS avg_price_cents, "
    "CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) "
    "/ count(*) AS avg_disc_bps, "
    "CAST(count(*) AS BIGINT) AS count_order "
    "FROM lineitem "
    "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus"
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so users can address
    the engine with plain SQL. Temp views are lazy — no data is read
    until a query scans them, and Catalyst prunes columns/filters into
    the parquet scans exactly as with the DataFrame API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape via the SQL surface (the same text is the DuckDB
    oracle — one source of truth, two engines)."""
    register_views(spark, sf_dir)
    return spark.sql(PRICING_SUMMARY_SQL)
