"""SQL facade: temp-view registration and the Q1 pricing summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiny_md_hbase_spark import plans as P
from tiny_md_hbase_spark import sql as SQLF
from tiny_md_hbase_spark.sources import load_table


def test_pricing_summary_totals_and_pushdown(spark, sf_dir):
    q = SQLF.pricing_summary(spark, sf_dir)
    rows = q.collect()
    li = load_table(spark, sf_dir, "lineitem")
    expect = li.filter(F.col("l_shipdate") <= "1998-09-02").count()
    assert sum(r.count_order for r in rows) == expect
    # the shipdate predicate reaches the parquet scan
    assert any("l_shipdate" in p for p in P.pushed_filters(q))
    # scan-heavy agg: one shuffle carrying 4-group partials only
    assert P.exchange_count(q) <= 1


def test_register_views_covers_all_tables(spark, sf_dir):
    SQLF.register_views(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS c FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].c
    assert got > 0
