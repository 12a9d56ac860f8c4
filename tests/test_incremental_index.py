"""Incremental index refresh: equivalence with a full rebuild across
append sequences, including splits triggered by the increment."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import index as IX
from tiny_md_hbase_spark.operators import write as W
from tiny_md_hbase_spark.sources import points


@pytest.fixture()
def tmp_table():
    d = tempfile.mkdtemp(prefix="tmh_inc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _index_set(spark, path):
    return sorted(
        (r.bucket_z, r.pl, r.size)
        for r in spark.read.parquet(f"{path}/index").collect()
    )


def _full_set(spark, path):
    pts = spark.read.parquet(f"{path}/points").select("id", "x", "y")
    return sorted(
        (r.bucket_z, r.pl, r.size) for r in IX.index_build(pts).collect()
    )


def test_incremental_matches_full_rebuild(spark, sf_dir, tmp_table):
    path = f"{tmp_table}/t"
    base = points(spark, sf_dir).limit(2000)
    W.table_create(spark, path)
    # initial load with full refresh
    enc = W.with_generated_ids(base).select("id", "x", "y")
    from tiny_md_hbase_spark.sources.writer import with_zvalue

    with_zvalue(enc).sortWithinPartitions("zvalue").write.mode("append").parquet(
        f"{path}/points"
    )
    W.refresh_index(spark, path)

    # three appends, each refreshed incrementally
    rest = points(spark, sf_dir).subtract(base)
    batches = [
        rest.limit(500),
        spark.createDataFrame(
            [(10_000 + i, 77, 99) for i in range(25)], "id long, x int, y int"
        ),  # pile-up on one cell: forces deep splits incl. the depth cap
        spark.createDataFrame(
            [(20_000 + i, i % 50, (i * 3) % 50) for i in range(300)],
            "id long, x int, y int",
        ),
    ]
    for b in batches:
        enc_b = W.with_generated_ids(b).select("id", "x", "y")
        with_zvalue(enc_b).sortWithinPartitions("zvalue").write.mode(
            "append"
        ).parquet(f"{path}/points")
        W.refresh_index_incremental(spark, path, b)
        assert _index_set(spark, path) == _full_set(spark, path)


def test_incremental_no_overflow_touches_nothing_heavy(spark, tmp_table):
    path = f"{tmp_table}/t2"
    W.table_create(spark, path)
    first = spark.createDataFrame(
        [(i, i, i) for i in range(5)], "id long, x int, y int"
    )
    W.insert_append(spark, path, first)  # full refresh inside
    # append 3 points that keep every bucket under threshold
    b = spark.createDataFrame(
        [(100, 1000, 1000), (101, 2000, 2000), (102, 3000, 3000)],
        "id long, x int, y int",
    )
    from tiny_md_hbase_spark.sources.writer import with_zvalue

    with_zvalue(b).write.mode("append").parquet(f"{path}/points")
    W.refresh_index_incremental(spark, path, b)
    assert _index_set(spark, path) == _full_set(spark, path)
    total = spark.read.parquet(f"{path}/index").agg(F.sum("size")).collect()[0][0]
    assert total == 8
