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

from tiny_md_hbase_spark.sources.tables import POINTS_SQL, TABLE_NAMES, load_table

__all__ = [
    "register_views",
    "pricing_summary",
    "PRICING_SUMMARY_SQL",
    "shipping_priority",
    "SHIPPING_PRIORITY_SQL",
    "local_supplier_volume",
    "LOCAL_SUPPLIER_VOLUME_SQL",
    "returned_revenue",
    "RETURNED_REVENUE_SQL",
    "large_orders",
    "LARGE_ORDERS_SQL",
    "register_codec_functions",
    "zcodec_roundtrip",
    "ZCODEC_SQL",
]

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


# TPC-H Q3 shape (shipping priority): the canonical selective 3-way
# join — two dimension filters (segment, order date) prune before the
# fact join, revenue in exact integer micros, top-10 under a total
# order (revenue desc, o_orderdate, l_orderkey). The fixture has no
# o_shippriority column; o_orderpriority plays its role. Catalyst
# broadcasts the filtered customer side (small dim) and the top-10 is
# a TakeOrderedAndProject — no global sort.
SHIPPING_PRIORITY_SQL = (
    "SELECT l_orderkey, "
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) "
    "AS BIGINT)) AS BIGINT) AS revenue_micro, "
    "o_orderdate, o_orderpriority "
    "FROM customer, orders, lineitem "
    "WHERE c_mktsegment = 'BUILDING' "
    "AND c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
    "AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00' "
    "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
    "ORDER BY revenue_micro DESC, o_orderdate, l_orderkey LIMIT 10"
)

# TPC-H Q5 shape (local supplier volume): the 6-way snowflake join with
# the co-location predicate (customer and supplier in the SAME nation)
# that makes it the classic join-order stress test. Region + date
# filters prune two dims before anything fact-sized joins; revenue is
# exact integer micros; (revenue desc, n_name) is a total order.
LOCAL_SUPPLIER_VOLUME_SQL = (
    "SELECT n_name, "
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) "
    "AS BIGINT)) AS BIGINT) AS revenue_micro "
    "FROM customer, orders, lineitem, supplier, nation, region "
    "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
    "AND r_name = 'ASIA' "
    "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY n_name "
    "ORDER BY revenue_micro DESC, n_name"
)


# TPC-H Q10 shape (returned-item report): which customers returned the
# most revenue in a quarter — the classic "problem customers" report.
# One quarter + returnflag filter prunes the fact scan; the customer →
# nation lookup is a broadcast; revenue in exact integer micros;
# (revenue desc, c_custkey) is a total order. Top-20.
RETURNED_REVENUE_SQL = (
    "SELECT c_custkey, c_name, n_name, "
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) "
    "AS BIGINT)) AS BIGINT) AS revenue_micro, "
    "CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents "
    "FROM customer, orders, lineitem, nation "
    "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND l_returnflag = 'R' "
    "AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00' "
    "AND c_nationkey = n_nationkey "
    "GROUP BY c_custkey, c_name, n_name, c_acctbal "
    "ORDER BY revenue_micro DESC, c_custkey LIMIT 20"
)

# TPC-H Q18 shape (large-volume orders): orders whose total quantity
# clears a high threshold — the HAVING-subquery pattern that exercises
# aggregate-then-semi-join planning. Quantity in exact integer cents;
# the inner aggregate runs once and semi-joins the fact table (Spark
# and DuckDB both plan the IN as a semi join on the aggregated keys).
# (totalprice_cents desc, o_orderkey) is a total order. Top-20.
LARGE_ORDERS_SQL = (
    "SELECT c_custkey, c_name, o_orderkey, o_orderdate, "
    "CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents, "
    "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) "
    "AS sum_qty_cents "
    "FROM customer, orders, lineitem "
    "WHERE o_orderkey IN ("
    "SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
    "HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000) "
    "AND c_custkey = o_custkey AND o_orderkey = l_orderkey "
    "GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice "
    "ORDER BY totalprice_cents DESC, o_orderkey LIMIT 20"
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


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via the SQL surface (same-text oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(SHIPPING_PRIORITY_SQL)


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape via the SQL surface (same-text oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(LOCAL_SUPPLIER_VOLUME_SQL)


def returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape via the SQL surface (same-text oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(RETURNED_REVENUE_SQL)


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape via the SQL surface (same-text oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(LARGE_ORDERS_SQL)


# ---------------------------------------------------------------------------
# SQL scalar functions: the z-codec for SQL-only users
# ---------------------------------------------------------------------------

# one source of constants: the spread masks live in zorder.py (the
# module of record for the codec, Utils.java:49-82 semantics); both the
# spread and its inverse's round table are derived from that list, so a
# codec change lands in one place across all three spellings (Column /
# Spark SQL / DuckDB oracle). Golden vectors in tests/test_zorder.py and
# tests/test_sql.py pin every spelling.
from tiny_md_hbase_spark.zorder import _SPREAD_MASKS  # noqa: E402

_SPREAD_ROUNDS = [(16 >> i, m) for i, m in enumerate(_SPREAD_MASKS)]
# inverse: shifts reversed/doubled back, masks walked the other way,
# ending on the low-32 collect mask
_SQUASH_ROUNDS = [
    (16 >> i, m)
    for i, m in zip(range(4, -1, -1), _SPREAD_MASKS[:-1][::-1] + [0x00000000FFFFFFFF])
]


def _spread_expr(v: str) -> str:
    e = f"CAST({v} AS BIGINT)"
    for shift, mask in _SPREAD_ROUNDS:
        e = f"(({e} | shiftleft({e}, {shift})) & {mask})"
    return e


def _squash_expr(v: str) -> str:
    e = f"({v} & {_SPREAD_MASKS[-1]})"  # keep even bits
    for shift, mask in _SQUASH_ROUNDS:
        e = f"(({e} | shiftright({e}, {shift})) & {mask})"
    return f"CAST({e} AS INT)"


def register_codec_functions(spark: SparkSession) -> None:
    """Register the z-order codec as Spark SQL *scalar UDFs* (``CREATE
    TEMPORARY FUNCTION ... RETURN <expr>``) so a SQL-only user gets the
    full codec — ``SELECT zvalue(x, y) FROM points`` — without touching
    the DataFrame API.

    These are SQL functions, not Python UDFs: the planner INLINES the
    body into the calling query (the physical plan shows the raw
    bitwise expression, no UDF call node), so they run inside
    whole-stage codegen with identical performance to the Column
    builders in ``zorder.py`` — the codec has one semantics, three
    spellings (Column, Spark SQL, DuckDB oracle SQL), and the golden
    vectors in tests/test_zorder.py pin all of them. Temp functions are
    session-scoped; call this once per session (idempotent)."""
    defs = {
        # bit i of a 32-bit non-negative int -> bit 2i of a BIGINT
        "z_bit_spread(v BIGINT) RETURNS BIGINT": _spread_expr("v"),
        # Morton interleave: x odd (upper) positions, y even
        "zvalue(x BIGINT, y BIGINT) RETURNS BIGINT": (
            f"shiftleft({_spread_expr('x')}, 1) | {_spread_expr('y')}"
        ),
        "z_x(z BIGINT) RETURNS INT": _squash_expr("shiftright(z, 1)"),
        "z_y(z BIGINT) RETURNS INT": _squash_expr("z"),
        # pl-bit prefix mask; shiftleft uses the low 6 bits of the
        # amount, so BOTH ends need a short-circuit: pl >= 64 -> all
        # ones (zorder.make_mask) and pl <= 0 -> 0 (empty prefix —
        # without it shiftleft(-1, 64) wraps to -1 and
        # z_prefix_match(z, pz, 0) would wrongly demand z = pz instead
        # of being vacuously true)
        "z_mask(pl INT) RETURNS BIGINT": (
            "CASE WHEN pl >= 64 THEN CAST(-1 AS BIGINT) "
            "WHEN pl <= 0 THEN CAST(0 AS BIGINT) "
            "ELSE shiftleft(CAST(-1 AS BIGINT), 64 - pl) END"
        ),
        "z_prefix_match(z BIGINT, pz BIGINT, pl INT) RETURNS BOOLEAN": (
            "(z & z_mask(pl)) = (pz & z_mask(pl))"
        ),
        # portable rolling content fingerprint (text.fingerprint_col) —
        # same empty-content convention: NULL ≡ '' fingerprints to the
        # seed 0 (the coalesce keeps the SQL door equal to the
        # DataFrame door for degenerate docs too)
        "doc_fp(t STRING) RETURNS BIGINT": (
            "aggregate(transform(split(coalesce(t, ''), ''), "
            "c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), "
            "(acc, x) -> (acc * 31 + x) % 1000000007)"
        ),
    }
    for sig, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {sig} RETURN {body}")


# round-trips the codec through the SQL door over the derived points
# view; identical rows to the zorder_encode/decode DataFrame operators
ZCODEC_SQL = (
    "SELECT id, x, y, zvalue(x, y) AS zvalue, "
    "z_x(zvalue(x, y)) AS x_rt, z_y(zvalue(x, y)) AS y_rt, "
    "z_prefix_match(zvalue(x, y), zvalue(x, y), 16) AS self_match "
    "FROM points"
)


def zcodec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec via the SQL surface: encode, decode back, and a prefix
    self-match — proving the SQL-function spelling of the codec agrees
    with the Column spelling (same golden vectors) and with the DuckDB
    oracle."""
    register_views(spark, sf_dir)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW points AS {POINTS_SQL}"
    )
    register_codec_functions(spark)
    return spark.sql(ZCODEC_SQL)
