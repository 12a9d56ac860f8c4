"""Warehouse analytics tests: multi-way join rollup and per-group top-k
on tiny in-memory frames plus invariant checks on the fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import analytics as AN
from tiny_md_hbase_spark.sources import load_table


def _tiny_tables(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.10),  # order 1, part 10 -> 90.00
            (1, 20, 50.0, 0.00),  # order 1, part 20 -> 50.00
            (2, 10, 200.0, 0.50),  # order 2, part 10 -> 100.00
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [
            (1, 7, dt.datetime(1995, 3, 1)),
            (2, 8, dt.datetime(1996, 6, 1)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(7, 0), (8, 1)], "c_custkey long, c_nationkey int"
    )
    nation = spark.createDataFrame(
        [(0, "ALGERIA"), (1, "BRAZIL")], "n_nationkey int, n_name string"
    )
    part = spark.createDataFrame(
        [(10, "Brand#1"), (20, "Brand#2")], "p_partkey long, p_brand string"
    )
    return lineitem, orders, customer, nation, part


def test_sales_rollup_tiny(spark):
    li, o, c, n, _ = _tiny_tables(spark)
    got = {
        (r.n_name, r.o_year): (r.revenue_cents, r.n_items)
        for r in AN.sales_rollup(li, o, c, n).collect()
    }
    assert got == {
        ("ALGERIA", 1995): (9000 + 5000, 2),
        ("BRAZIL", 1996): (10000, 1),
    }


def test_topk_per_group_tiny(spark):
    li, _, _, _, part = _tiny_tables(spark)
    got = [
        (r.p_brand, r.p_partkey, r.revenue_cents, r.rank)
        for r in AN.topk_per_group(li, part, k=1).collect()
    ]
    # Brand#1 part 10: 9000+10000=19000; Brand#2 part 20: 5000
    assert sorted(got) == [("Brand#1", 10, 19000, 1), ("Brand#2", 20, 5000, 1)]


def test_sales_rollup_fixture_totals(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    roll = AN.sales_rollup(li, o, c, n)
    # every lineitem has a matching order+customer+nation (fixture FK integrity)
    assert roll.agg(F.sum("n_items")).collect()[0][0] == li.count()


def test_topk_rank_invariants(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    top = AN.topk_per_group(li, part, k=3).collect()
    per_brand: dict[str, list] = {}
    for r in top:
        per_brand.setdefault(r.p_brand, []).append(r)
    for rows in per_brand.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        revs = [r.revenue_cents for r in rows]
        assert revs == sorted(revs, reverse=True)
