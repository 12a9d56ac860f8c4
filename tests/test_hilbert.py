"""Hilbert codec: column forms vs the driver-side reference, exact
roundtrip, unit-step adjacency (the locality property Z-order lacks),
and plan shape (pure projection, no shuffle)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tiny_md_hbase_spark import hilbert as H
from tiny_md_hbase_spark.sources.tables import points


def test_hilbert_encode_matches_python_reference(spark, sf_dir):
    pts = points(spark, sf_dir).limit(2000)
    rows = pts.select(
        "id", "x", "y", H.hilbert_encode("x", "y").alias("h")
    ).collect()
    assert rows
    for r in rows:
        assert r.h == H.hilbert_encode_py(r.x, r.y)


def test_hilbert_decode_matches_python_reference(spark):
    random.seed(11)
    ds = [(i, random.randrange(4096 * 4096)) for i in range(1500)]
    df = spark.createDataFrame(ds, "id long, d long")
    rows = df.select("id", "d", H.hilbert_decode("d").alias("p")).collect()
    for r in rows:
        assert (r.p.x, r.p.y) == H.hilbert_decode_py(r.d)


def test_hilbert_roundtrip_on_points(spark, sf_dir):
    pts = points(spark, sf_dir)
    bad = (
        pts.select("x", "y", H.hilbert_decode(H.hilbert_encode("x", "y")).alias("p"))
        .filter((F.col("p.x") != F.col("x")) | (F.col("p.y") != F.col("y")))
        .count()
    )
    assert bad == 0


def test_hilbert_unit_step_adjacency(spark):
    # consecutive curve positions are ALWAYS one grid step apart — the
    # defining locality property (Z-order violates it at every Z jump)
    df = spark.range(0, 4096).select(F.col("id").alias("d"))
    dec = df.select("d", H.hilbert_decode("d").alias("p"))
    w_next = dec.select(
        "d", F.col("p.x").alias("x"), F.col("p.y").alias("y")
    )
    a = w_next.alias("a")
    b = w_next.alias("b")
    steps = (
        a.join(b, F.col("a.d") + 1 == F.col("b.d"))
        .select(
            (
                F.abs(F.col("a.x") - F.col("b.x"))
                + F.abs(F.col("a.y") - F.col("b.y"))
            ).alias("step")
        )
    )
    assert steps.filter("step != 1").count() == 0
    assert steps.count() == 4095


def test_hilbert_is_a_bijection_on_a_subgrid(spark):
    # every d in [0, 64*64) maps to a distinct cell and back (order-6)
    df = spark.range(0, 64 * 64).select(F.col("id").alias("d"))
    dec = df.select("d", H.hilbert_decode("d", bits=6).alias("p"))
    assert dec.select("p.x", "p.y").distinct().count() == 64 * 64
    back = dec.select(
        "d", H.hilbert_encode(F.col("p.x"), F.col("p.y"), bits=6).alias("h")
    )
    assert back.filter("d != h").count() == 0


def test_hilbert_encode_plan_is_pure_projection(spark, sf_dir):
    pts = points(spark, sf_dir)
    plan = (
        pts.select("id", H.hilbert_encode("x", "y").alias("h"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scalar fold: no shuffle, scan-fused
