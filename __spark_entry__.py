"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
returns one builder per implemented operator (SURVEY.md §2); ``oracle_sql()``
returns the DuckDB-equivalent ANSI SQL for each SQL-expressible key. Column
names/aliases match pairwise so the driver's sorted-column value hash lines
up.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tiny_md_hbase_spark import zorder as Z  # noqa: E402
from tiny_md_hbase_spark.operators import index as IX  # noqa: E402
from tiny_md_hbase_spark.operators import spatial  # noqa: E402
from tiny_md_hbase_spark.sources import POINTS_SQL, points  # noqa: E402

# FIXTURES.md pinned parameters
RECT_X = (512, 1535)
RECT_Y = (1024, 3071)
# flagship rectangle for entry(): x is bounded by the part-table size, which
# at sf0.001 only reaches ~200 — keep the flagship window in the populated
# low-x band so the smoke query returns real matches at every sf
ENTRY_RECT_X = (0, 255)
ENTRY_RECT_Y = (1024, 3071)
KNN_Q = (2048, 2048)
KNN_K = 10
RENDER_PL = 12

_POINTS_CTE = f"WITH points AS ({POINTS_SQL})"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: rectangle count over the derived points view at sf0.001."""
    pts = points(spark, "/root/testdata/sf0.001")
    return spatial.range_count(pts, ENTRY_RECT_X, ENTRY_RECT_Y)


# ---------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame, one per operator key
# ---------------------------------------------------------------------------

def _q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.full_scan(points(spark, sf_dir))


def _q_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.range_query(points(spark, sf_dir), RECT_X, RECT_Y, z_prefilter=True)


def _q_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.range_count(points(spark, sf_dir), RECT_X, RECT_Y, z_prefilter=True)


def _q_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.point_get_lookup(points(spark, sf_dir))


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.knn(points(spark, sf_dir), *KNN_Q, KNN_K)


def _q_zorder_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return points(spark, sf_dir).select("id", Z.zvalue("x", "y").alias("zvalue"))


def _q_zorder_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    enc = points(spark, sf_dir).select("id", Z.zvalue("x", "y").alias("zvalue"))
    return enc.select("id", Z.z_x("zvalue").alias("x"), Z.z_y("zvalue").alias("y"))


def _q_prefix_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    enc = points(spark, sf_dir).select("id", Z.zvalue("x", "y").alias("zvalue"))
    return enc.select("id", Z.prefix_render("zvalue", RENDER_PL).alias("bucket_name"))


def _q_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return IX.index_build(points(spark, sf_dir), threshold=IX.DEFAULT_THRESHOLD)


def _q_index_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return IX.index_inspect(IX.index_build(points(spark, sf_dir)))


def _q_floor_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = IX.index_build(points(spark, sf_dir))
    return IX.floor_lookup(idx, Z.zorder_encode_py(*KNN_Q))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "full_scan": _q_full_scan,
        "range_query": _q_range_query,
        "range_count": _q_range_count,
        "point_get": _q_point_get,
        "knn": _q_knn,
        "zorder_encode": _q_zorder_encode,
        "zorder_decode": _q_zorder_decode,
        "prefix_render": _q_prefix_render,
        "index_build": _q_index_build,
        "index_inspect": _q_index_inspect,
        "floor_lookup": _q_floor_lookup,
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB ANSI twins over the pre-registered parquet views
# ---------------------------------------------------------------------------

def _index_cte() -> str:
    """Recursive-CTE twin of index_build: one-bit-at-a-time splitting
    exactly as ``Index.splitBucket`` (``Index.java:183-230``), threshold 10,
    depth cap 64. ``leafidx`` holds (bucket_z, pl, size). DuckDB refuses to
    left-shift negative numbers, so the prefix mask uses the two's-
    complement identity ``-1 << s == -(1 << s)``."""
    zsql = Z.zvalue_sql("x", "y")
    mask = "(CASE WHEN {pl} >= 64 THEN CAST(-1 AS BIGINT) ELSE -(CAST(1 AS BIGINT) << (64 - {pl})) END)"
    size_of = (
        "(SELECT COALESCE(sum(c), 0) FROM zcells WHERE (z & "
        + mask
        + ") = {bz})"
    )
    t_size = size_of.format(pl="t.pl", bz="t.bucket_z")
    return (
        f"WITH RECURSIVE points AS ({POINTS_SQL}), "
        f"zcells AS (SELECT {zsql} AS z, CAST(count(*) AS BIGINT) AS c "
        "FROM points GROUP BY 1), "
        "tree(bucket_z, pl) AS ("
        "  SELECT CAST(0 AS BIGINT), 2"
        "  UNION ALL"
        "  SELECT CASE WHEN b.bit = 0 THEN t.bucket_z"
        "              ELSE t.bucket_z | (CAST(1 AS BIGINT) << (63 - t.pl)) END,"
        "         t.pl + 1"
        "  FROM tree t CROSS JOIN (VALUES (0), (1)) b(bit)"
        f"  WHERE t.pl < 64 AND {t_size} > {IX.DEFAULT_THRESHOLD}"
        "), "
        "leafidx AS ("
        f"  SELECT t.bucket_z, t.pl, {t_size} AS size FROM tree t"
        f"  WHERE NOT ({t_size} > {IX.DEFAULT_THRESHOLD} AND t.pl < 64)"
        ")"
    )


def oracle_sql() -> dict[str, str]:
    zsql = Z.zvalue_sql("x", "y")
    rect = (
        f"x BETWEEN {RECT_X[0]} AND {RECT_X[1]} "
        f"AND y BETWEEN {RECT_Y[0]} AND {RECT_Y[1]}"
    )
    dist_sq = (
        f"(CAST(x AS BIGINT) - {KNN_Q[0]}) * (CAST(x AS BIGINT) - {KNN_Q[0]}) "
        f"+ (CAST(y AS BIGINT) - {KNN_Q[1]}) * (CAST(y AS BIGINT) - {KNN_Q[1]})"
    )
    return {
        "full_scan": f"{_POINTS_CTE} SELECT id, x, y FROM points",
        "range_query": f"{_POINTS_CTE} SELECT id, x, y FROM points WHERE {rect}",
        "range_count": (
            f"{_POINTS_CTE} SELECT count(*) AS cnt FROM points WHERE {rect}"
        ),
        "point_get": (
            f"{_POINTS_CTE} SELECT p.id, p.x, p.y FROM points p "
            "JOIN (SELECT x, y FROM points ORDER BY id LIMIT 1) q "
            "USING (x, y)"
        ),
        "knn": (
            f"{_POINTS_CTE} SELECT id, x, y, dist_sq, sqrt(dist_sq) AS dist "
            f"FROM (SELECT id, x, y, CAST({dist_sq} AS BIGINT) AS dist_sq "
            f"FROM points) ORDER BY dist_sq, id, x, y LIMIT {KNN_K}"
        ),
        "zorder_encode": (
            f"{_POINTS_CTE} SELECT id, {zsql} AS zvalue FROM points"
        ),
        "zorder_decode": f"{_POINTS_CTE} SELECT id, x, y FROM points",
        "prefix_render": (
            f"{_POINTS_CTE} SELECT id, "
            f"rpad(substring(lpad(bin({zsql}), 64, '0'), 1, {RENDER_PL}), 64, '*') "
            "AS bucket_name FROM points"
        ),
        "index_build": f"{_index_cte()} SELECT bucket_z, pl, size FROM leafidx",
        "index_inspect": (
            f"{_index_cte()} SELECT rpad(substring(lpad(bin(bucket_z), 64, '0'), 1, pl), 64, '*') "
            "AS bucket_name, size FROM leafidx ORDER BY bucket_name"
        ),
        "floor_lookup": (
            f"{_index_cte()} SELECT bucket_z, pl, size FROM leafidx "
            f"WHERE bucket_z <= {Z.zorder_encode_py(*KNN_Q)} "
            "ORDER BY bucket_z DESC LIMIT 1"
        ),
    }
