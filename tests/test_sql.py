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
