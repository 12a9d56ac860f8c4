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


def test_sql_codec_functions_golden_vectors_and_inline(spark, sf_dir):
    """The SQL-UDF spelling of the codec must (1) reproduce the
    reference golden vectors (UtilsTest.java:29-70), (2) roundtrip
    encode→decode exactly, and (3) INLINE into the plan — a
    BatchEvalPython / UDF node would mean the codec fell off the
    codegen path."""
    SQLF.register_codec_functions(spark)
    r = spark.sql(
        "SELECT zvalue(65535, 16711935) AS z1, "
        "z_bit_spread(4294967295) AS sp, "
        "z_x(zvalue(65535, 16711935)) AS gx, "
        "z_y(zvalue(65535, 16711935)) AS gy, "
        "z_mask(8) AS m8, "
        "z_prefix_match(255, 254, 56) AS pm"
    ).collect()[0]
    assert r.z1 == 0x00005555AAAAFFFF  # zip(0x0000FFFF, 0x00FF00FF)
    assert r.sp == 0x5555555555555555  # spread(0xFFFFFFFF)
    assert r.gx == 65535 and r.gy == 16711935  # unzip roundtrip
    assert r.m8 == -72057594037927936  # 0xFF00...00 signed
    assert bool(r.pm) is True

    q = SQLF.zcodec_roundtrip(spark, sf_dir)
    assert q.filter("x_rt != x OR y_rt != y OR NOT self_match").count() == 0
    plan = P.explain_str(q, "simple")
    assert "BatchEvalPython" not in plan and "Python" not in plan
    assert P.exchange_count(q) == 0


def test_sql_doc_fp_matches_column_fingerprint(spark, sf_dir):
    """doc_fp (the SQL-function spelling) equals text.fingerprint_col
    (the Column spelling) on every fixture document."""
    from tiny_md_hbase_spark.operators.text import fingerprint_col

    SQLF.register_views(spark, sf_dir)
    SQLF.register_codec_functions(spark)
    via_sql = spark.sql("SELECT doc_id, doc_fp(text) AS fp FROM documents")
    via_col = load_table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint_col().alias("fp")
    )
    assert via_sql.exceptAll(via_col).count() == 0
    assert via_col.exceptAll(via_sql).count() == 0


def test_shipping_priority_q3_shape_and_naive_reference(spark, sf_dir):
    """Q3: predicates reach the scans, the filtered dims broadcast (no
    fact-sized shuffle join), the top-10 is TakeOrderedAndProject; the
    result matches a DataFrame-API recomputation."""
    q = SQLF.shipping_priority(spark, sf_dir)
    plan = P.explain_str(q, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert any("c_mktsegment" in p for p in P.pushed_filters(q))
    assert any("o_orderdate" in p for p in P.pushed_filters(q))
    assert any("l_shipdate" in p for p in P.pushed_filters(q))
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    rev = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000)
        .cast("long")
    ).cast("long")
    want = [
        tuple(r)
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue_micro"))
        .select("l_orderkey", "revenue_micro", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_micro").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .collect()
    ]
    assert [tuple(r) for r in q.collect()] == want and len(want) == 10


def test_supplier_volume_q5_colocated_revenue(spark, sf_dir):
    """Q5: every output nation is in ASIA, and the total equals a
    direct recomputation honoring the customer-supplier same-nation
    predicate."""
    q = SQLF.local_supplier_volume(spark, sf_dir)
    plan = P.explain_str(q, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = q.collect()
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    asia = {
        r.n_name
        for r in nat.join(reg, nat.n_regionkey == reg.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .collect()
    }
    assert {r.n_name for r in rows} <= asia and rows
    # revenue must be positive and sorted desc with n_name tiebreak
    vals = [(r.revenue_micro, r.n_name) for r in rows]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))


def test_returned_revenue_q10_shape_and_naive_reference(spark, sf_dir):
    """Q10: quarter + returnflag predicates reach the scans, the
    top-20 is TakeOrderedAndProject; the result matches a
    DataFrame-API recomputation."""
    q = SQLF.returned_revenue(spark, sf_dir)
    plan = P.explain_str(q, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert any("l_returnflag" in p for p in P.pushed_filters(q))
    assert any("o_orderdate" in p for p in P.pushed_filters(q))
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000)
        .cast("long")
    ).cast("long")
    want = [
        tuple(r)
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(rev.alias("revenue_micro"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue_micro",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
        .orderBy(F.col("revenue_micro").desc(), "c_custkey")
        .limit(20)
        .collect()
    ]
    assert [tuple(r) for r in q.collect()] == want and len(want) == 20


def test_large_orders_q18_semi_join_and_threshold(spark, sf_dir):
    """Q18: the IN-subquery plans as an aggregate + join (never a
    cartesian); every output order's quantity clears the threshold and
    equals a direct per-order recomputation."""
    q = SQLF.large_orders(spark, sf_dir)
    plan = P.explain_str(q, "simple")
    assert "CartesianProduct" not in plan
    rows = q.collect()
    assert rows, "threshold should admit at least one order at fixture scale"
    li = load_table(spark, sf_dir, "lineitem")
    per_order = {
        r.l_orderkey: r.s
        for r in li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
            .cast("long")
            .alias("s")
        )
        .collect()
    }
    for r in rows:
        assert r.sum_qty_cents == per_order[r.o_orderkey]
        assert r.sum_qty_cents > 30000
    vals = [(r.totalprice_cents, r.o_orderkey) for r in rows]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))
