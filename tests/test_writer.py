"""Z-sorted layout tests: round-trip fidelity, predicate pushdown reaching
the parquet scan, and query equivalence on the materialized table."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import spatial
from tiny_md_hbase_spark.sources import points
from tiny_md_hbase_spark.sources.writer import (
    load_points_zsorted,
    write_points_zsorted,
)


@pytest.fixture(scope="module")
def zsorted(spark, sf_dir):
    pts = points(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="zsorted_") + "/points"
    write_points_zsorted(pts, path, num_partitions=8)
    return pts, load_points_zsorted(spark, path)


def test_roundtrip_and_sorted(zsorted):
    from pyspark.sql import Window as W

    pts, zt = zsorted
    assert zt.count() == pts.count()
    assert set(zt.columns) == {"id", "x", "y", "zvalue"}
    # within-file z order: row order inside a parquet split is preserved,
    # monotonically_increasing_id is ordered within a partition
    tagged = zt.withColumn("pid", F.spark_partition_id()).withColumn(
        "seq", F.monotonically_increasing_id()
    )
    w = W.partitionBy("pid").orderBy("seq")
    unsorted = tagged.withColumn("prev", F.lag("zvalue").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("zvalue") < F.col("prev"))
    )
    assert unsorted.count() == 0
    # across files: range partitioning ⇒ disjoint z spans
    spans = sorted(
        (r.mn, r.mx)
        for r in tagged.groupBy("pid")
        .agg(F.min("zvalue").alias("mn"), F.max("zvalue").alias("mx"))
        .collect()
    )
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_pushdown_reaches_scan(zsorted):
    _, zt = zsorted
    q = spatial.range_query(zt, (512, 1535), (1024, 3071), z_prefilter=True)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    for col in ("x", "y", "zvalue"):
        assert f"GreaterThanOrEqual({col}" in plan, f"{col} bound not pushed:\n{plan}"


def test_query_equivalence_on_materialized_table(zsorted):
    pts, zt = zsorted
    rect = ((512, 1535), (1024, 3071))
    a = spatial.range_query(pts, *rect).orderBy("id", "x", "y").collect()
    b = (
        spatial.range_query(zt, *rect, z_prefilter=True)
        .orderBy("id", "x", "y")
        .collect()
    )
    assert [(r.id, r.x, r.y) for r in a] == [(r.id, r.x, r.y) for r in b]


def test_zcover_query_equivalence_and_tightness(zsorted):
    pts, zt = zsorted
    # thin band straddling the y=2047|2048 z split: worst case for the
    # single window, the cover must still return exactly the same rows
    rect = ((0, 4095), (2000, 2100))
    a = spatial.range_query(pts, *rect).orderBy("id", "x", "y").collect()
    b = (
        spatial.range_query(zt, *rect, z_cover=16)
        .orderBy("id", "x", "y")
        .collect()
    )
    assert [(r.id, r.x, r.y) for r in a] == [(r.id, r.x, r.y) for r in b]
    # the cover prefilter alone admits far fewer rows than the window
    from tiny_md_hbase_spark.operators.spatial import z_cover_predicate, z_window

    zmin, zmax = z_window(*rect)
    n_window = zt.filter(F.col("zvalue").between(zmin, zmax)).count()
    n_cover = zt.filter(z_cover_predicate(zt, *rect, 16)).count()
    assert n_cover <= n_window
    assert n_cover < zt.count() / 2


def test_zcover_requires_materialized_zvalue(zsorted):
    pts, _ = zsorted
    with pytest.raises(ValueError):
        spatial.z_cover_predicate(pts, (0, 10), (0, 10))
