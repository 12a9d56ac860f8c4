"""Write-path operators (SURVEY.md §2.2): insert, table lifecycle, id-gen.

The reference inserts one point per client call — z-encode, floor-lookup
the bucket, ``Put``, atomically bump the bucket counter, maybe split
(``Client.insert``, ``Client.java:55-59``; 4+ RPCs per point). The Spark
shape is the batch/micro-batch append: z-encode the whole batch with
native expressions, append to the z-clustered table, then refresh the
index by aggregation — exact counts (the reference's counters drift on
overwrites, SURVEY.md §1.3), one shuffle per batch instead of per-point
RPCs. The streaming wrapper lives in ``streaming/ingest.py``.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators.index import DEFAULT_THRESHOLD, index_build
from tiny_md_hbase_spark.sources.writer import with_zvalue

__all__ = [
    "table_create",
    "table_drop",
    "insert_append",
    "refresh_index",
    "with_generated_ids",
]

_POINTS_SCHEMA = "id long, x int, y int"


def table_create(spark: SparkSession, path: str) -> None:
    """Create an empty points table + seeded index (``Index.java:77-105``:
    data table + index table with the root bucket)."""
    empty = spark.createDataFrame([], _POINTS_SCHEMA)
    with_zvalue(empty).write.mode("errorifexists").parquet(f"{path}/points")
    index_build(empty).write.mode("overwrite").parquet(f"{path}/index")


def table_drop(path: str) -> None:
    """Drop both tables (CLI ``drop``, ``Client.java:217-224``)."""
    shutil.rmtree(path, ignore_errors=True)


def with_generated_ids(points: DataFrame) -> DataFrame:
    """Fill missing ids (``id_gen``: the reference draws random ints,
    ``Client.java:177-182``; we use the collision-free distributed
    generator)."""
    if "id" in points.columns:
        return points.withColumn(
            "id",
            F.coalesce(F.col("id"), F.monotonically_increasing_id()),
        )
    return points.withColumn("id", F.monotonically_increasing_id())


def insert_append(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Append a batch of points and refresh the index.

    Appended files are z-sorted *within the batch* (each new file carries
    tight zvalue min/max stats, so scans keep pruning); global re-cluster
    is a periodic compaction concern, exactly like HBase flushes +
    compactions in the reference's storage layer.
    """
    enc = with_zvalue(with_generated_ids(batch).select("id", "x", "y"))
    enc.sortWithinPartitions("zvalue").write.mode("append").parquet(f"{path}/points")
    refresh_index(spark, path)


def refresh_index(
    spark: SparkSession, path: str, threshold: int = DEFAULT_THRESHOLD
) -> None:
    """Recompute the bucket index from the table state (exact; replaces
    the reference's drift-prone online counters)."""
    pts = spark.read.parquet(f"{path}/points")
    index_build(pts, threshold=threshold).write.mode("overwrite").parquet(
        f"{path}/index"
    )
