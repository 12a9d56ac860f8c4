"""Classic warehouse analytics over the TPC-H-ish fixtures: multi-way
join rollups and per-group top-k — the query shapes the reference cannot
express at all (it has no joins, grouping, or windows; SURVEY.md §2.5)
but any engine claiming its workload at 100 TB must run well.

Scale design:

- :func:`sales_rollup` joins the two FACT tables (lineitem ⋈ orders) on
  their shared key — the one unavoidable shuffle; at rest both would be
  bucketed by orderkey to make it co-located. The DIMENSION tables
  (customer, nation) are hint-broadcast: no shuffle, no skew exposure,
  and the aggregation on top is map-side partial over a tiny
  (nation × year) key space.
- :func:`topk_per_group` pre-aggregates to the (group, item) grain
  BEFORE ranking — the window then runs over the reduced table (one row
  per item), not the fact table, so the sort behind ``row_number`` is
  proportional to distinct items, not input rows.

Money is summed in exact integer cents (``round(x*100)`` is one IEEE op,
bit-identical in DuckDB) — double sums are accumulation-order dependent
and would not hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sales_rollup", "sales_rollup_sql", "topk_per_group", "topk_per_group_sql"]


def _rev_cents(price: str = "l_extendedprice", disc: str = "l_discount"):
    return F.round(F.col(price) * (1 - F.col(disc)) * 100).cast("long")


def sales_rollup(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Discounted revenue by customer nation × order year (TPC-H Q5's
    shape): fact ⋈ fact shuffle join + broadcast dims + small-key rollup.
    """
    o_year = F.year(F.col("o_orderdate"))
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name"), o_year.alias("o_year"))
        .agg(
            F.sum(_rev_cents()).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def sales_rollup_sql() -> str:
    """DuckDB twin of :func:`sales_rollup`."""
    return (
        "SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents, "
        "CAST(count(*) AS BIGINT) AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY 1, 2"
    )


TOPK_K = 3


def topk_per_group(lineitem: DataFrame, part: DataFrame, k: int = TOPK_K) -> DataFrame:
    """Top-``k`` parts by revenue within each brand: broadcast-join the
    part dim, aggregate to (brand, part) BEFORE the window, then
    ``row_number`` over the reduced table with a deterministic
    (revenue DESC, partkey ASC) total order.
    """
    per_part = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue_cents").desc(), F.col("p_partkey")
    )
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("p_brand", "p_partkey", "revenue_cents", "rank")
    )


def topk_per_group_sql(k: int = TOPK_K) -> str:
    """DuckDB twin of :func:`topk_per_group`."""
    return (
        "WITH per_part AS (SELECT p_brand, p_partkey, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY 1, 2), "
        "ranked AS (SELECT p_brand, p_partkey, revenue_cents, "
        "CAST(row_number() OVER (PARTITION BY p_brand "
        "ORDER BY revenue_cents DESC, p_partkey) AS INT) AS rank "
        "FROM per_part) "
        f"SELECT p_brand, p_partkey, revenue_cents, rank FROM ranked "
        f"WHERE rank <= {k}"
    )
