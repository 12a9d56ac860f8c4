"""d-dimensional codec, corpus_clean composite, and compaction tests."""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tiny_md_hbase_spark import zorder as Z
from tiny_md_hbase_spark import zorder_nd as ZND
from tiny_md_hbase_spark.operators import text as T
from tiny_md_hbase_spark.sources import load_table, points
from tiny_md_hbase_spark.sources.writer import (
    compact_points_table,
    with_zvalue,
)


# --- nd codec -------------------------------------------------------------

@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
@settings(max_examples=100, deadline=None)
def test_nd_matches_2d_layout(x, y):
    # d=2, 31 bits reproduces the 2-D codec on its domain (bit 31 is 0)
    assert ZND.zvalue_nd_py([x, y], 31) == Z.zorder_encode_py(x, y)


@given(st.lists(st.integers(0, 2**10 - 1), min_size=3, max_size=3))
@settings(max_examples=100, deadline=None)
def test_nd_monotone_per_axis(vals):
    z = ZND.zvalue_nd_py(vals, 10)
    for i in range(3):
        if vals[i] < 2**10 - 1:
            bumped = list(vals)
            bumped[i] += 1
            assert ZND.zvalue_nd_py(bumped, 10) > z


def test_nd_rejects_overflow():
    with pytest.raises(ValueError):
        ZND.zvalue_nd_py([1, 2, 3, 4, 5, 6, 7], 10)  # 7*10=70 > 63
    with pytest.raises(ValueError):
        ZND.zvalue_nd_py([1024], 10)


def test_nd_spark_matches_python(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1024), rng.randrange(1024), rng.randrange(8)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x int, y int, t int")
    got = df.select(
        "x", "y", "t", ZND.zvalue_nd(["x", "y", "t"], 10).alias("z")
    ).collect()
    for r in got:
        assert r.z == ZND.zvalue_nd_py([r.x, r.y, r.t], 10)


# --- corpus_clean ---------------------------------------------------------

def test_corpus_clean_composes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = T.corpus_clean(docs, quality_threshold=0.0).collect()
    # threshold 0 keeps everything; texts are distinct in the fixture
    assert sum(r.n_docs_kept for r in out) == docs.count()
    strict = T.corpus_clean(docs, quality_threshold=0.99).collect()
    assert sum(r.n_docs_kept for r in strict) <= docs.count()


# --- compaction -----------------------------------------------------------

def test_compaction_restores_global_order(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="compact_")
    pts = points(spark, sf_dir)
    # two unsorted-relative-to-each-other appends
    first = with_zvalue(pts.limit(3000))
    second = with_zvalue(pts.subtract(pts.limit(3000)))
    first.write.parquet(f"{d}/points")
    second.write.mode("append").parquet(f"{d}/points")
    n_before = spark.read.parquet(f"{d}/points").count()

    compact_points_table(spark, d, num_partitions=4)

    after = spark.read.parquet(f"{d}/points")
    assert after.count() == n_before
    spans = sorted(
        (r.mn, r.mx)
        for r in after.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zvalue").alias("mn"), F.max("zvalue").alias("mx"))
        .collect()
    )
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint file z-spans again
