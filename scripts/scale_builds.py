"""10x scale probe for the build/write-path bench entries.

The per-round bench measures these entries at sf0.1 on a host with
documented degraded-I/O phases; when one of them moves between rounds
(r08: inverted_index_build 5.98 -> 8.51 s) the open question is always
"host noise or a real scaling regression?". This script answers it
in-round the way the r08 skew tables did for the pair operators: run
each build at 1x (the sf0.1 fixture) and at 10x (the same fixture
unioned with perturbed ids — BENCH.md's standard 10x construction) and
report the wall-time ratio. A healthy build scales ~linearly (ratio
~<= 10, usually well under on 32 threads because the 1x run is
overhead-dominated); a super-linear ratio is a real regression no host
phase can explain away.

Covers: zsort_write, hsort_write, inverted_index_build,
embeddings_clustered_build, cms_shards_build, stream_scd2 (staged
streaming replay, parquet sink), and skyline at 10x DISTINCT X (the
two-phase prefix-min's scaling axis — distinct x is what the old
single-partition window sorted in one task).

All scratch goes to /dev/shm when available (same rationale as
bench.py). Each timing is the min of two passes. Prints a markdown
table for BENCH.md.

Run: python scripts/scale_builds.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def build_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    scratch_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if scratch_base:
        local = tempfile.mkdtemp(prefix="scale_builds_spark_", dir=scratch_base)
        os.environ.setdefault("SPARK_LOCAL_DIRS", local)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-builds")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def _scratch() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix="scale_builds_", dir=base)


def widen(df, copies: int, id_col: str):
    """Union `copies` perturbed-id copies — BENCH.md's 10x construction."""
    from pyspark.sql import functions as F

    n_ids = df.agg(F.max(id_col)).collect()[0][0] + 1
    out = None
    for c in range(copies):
        d = df.withColumn(id_col, F.col(id_col) + F.lit(c * n_ids))
        out = d if out is None else out.unionByName(d)
    return out


def timed(fn, passes: int = 2) -> float:
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators import analytics as AN
    from tiny_md_hbase_spark.operators import spatial as SP
    from tiny_md_hbase_spark.sources import load_table, points
    from tiny_md_hbase_spark.sources import writer as WR
    from tiny_md_hbase_spark.streaming import ingest as ING

    spark = build_spark()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows: list[tuple[str, float, float, str]] = []

    pts1 = points(spark, args.sf_dir).localCheckpoint()
    pts10 = widen(pts1, 10, "id").localCheckpoint()
    docs1 = load_table(spark, args.sf_dir, "documents").localCheckpoint()
    docs10 = widen(docs1, 10, "doc_id").localCheckpoint()
    emb1 = load_table(spark, args.sf_dir, "embeddings").localCheckpoint()
    emb10 = widen(emb1, 10, "vec_id").localCheckpoint()

    def bench_build(name: str, fn1, fn10, note: str) -> None:
        def run(fn):
            d = _scratch()
            try:
                return timed(lambda: fn(d))
            finally:
                shutil.rmtree(d, ignore_errors=True)

        t1, t10 = run(fn1), run(fn10)
        rows.append((name, t1, t10, note))
        print(f"  {name}: 1x {t1:.2f}s 10x {t10:.2f}s ratio {t10 / t1:.2f}")

    bench_build(
        "zsort_write",
        lambda d: WR.write_points_zsorted(pts1, f"{d}/z", num_partitions=cpus),
        lambda d: WR.write_points_zsorted(pts10, f"{d}/z", num_partitions=cpus),
        "range-partition on z + sorted write",
    )
    bench_build(
        "hsort_write",
        lambda d: WR.write_points_hsorted(pts1, f"{d}/h", num_partitions=cpus),
        lambda d: WR.write_points_hsorted(pts10, f"{d}/h", num_partitions=cpus),
        "Hilbert twin of zsort_write",
    )
    bench_build(
        "inverted_index_build",
        lambda d: WR.write_inverted_index(docs1, f"{d}/ii"),
        lambda d: WR.write_inverted_index(docs10, f"{d}/ii"),
        "explode+agg; salted (bucket, crc32(term)) write",
    )
    bench_build(
        "embeddings_clustered_build",
        lambda d: WR.write_embeddings_clustered(emb1, f"{d}/e"),
        lambda d: WR.write_embeddings_clustered(emb10, f"{d}/e"),
        "row-local assign; salted (cluster, crc32) write",
    )
    bench_build(
        "cms_shards_build",
        lambda d: AN.write_cms_shards(docs1, f"{d}/c"),
        lambda d: AN.write_cms_shards(docs10, f"{d}/c"),
        "per-shard count_min_sketch partials",
    )

    # stream_scd2: staged bounded replay, parquet sink (no driver-side
    # memory sink), 10x = 10x users x the same per-user event history
    ev1 = load_table(spark, args.sf_dir, "events")
    ev10 = widen(
        ev1.withColumn("event_id", F.col("event_id").cast("long")), 10, "user_id"
    ).localCheckpoint()

    def scd2(ev, d: str) -> None:
        ev.write.parquet(f"{d}/src")
        q = (
            ING.stream_scd2(spark, f"{d}/src")
            .writeStream.format("parquet")
            .option("path", f"{d}/out")
            .option("checkpointLocation", f"{d}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def run_scd2(ev):
        def once():
            d = _scratch()
            try:
                t0 = time.perf_counter()
                scd2(ev, d)
                return time.perf_counter() - t0
            finally:
                shutil.rmtree(d, ignore_errors=True)

        return min(once(), once())

    t1, t10 = run_scd2(ev1.localCheckpoint()), run_scd2(ev10)
    rows.append((
        "stream_scd2",
        t1,
        t10,
        "applyInPandasWithState replay; O(active users) state",
    ))
    print(f"  stream_scd2: 1x {t1:.2f}s 10x {t10:.2f}s ratio {t10 / t1:.2f}")

    # skyline at 10x DISTINCT X: the scaling axis of the two-phase
    # prefix min. 1x = the fixture's 4096-value x domain; 10x = 10x rows
    # re-keyed onto a 40960-value domain (distinct-x table 10x wider).
    sky10 = pts10.select(
        "id",
        F.pmod(F.xxhash64("id"), F.lit(40960)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(40960)).cast("int").alias("y"),
    ).localCheckpoint()

    def run_skyline(df):
        return timed(
            lambda: SP.skyline(df).write.format("noop").mode("overwrite").save()
        )

    t1, t10 = run_skyline(pts1), run_skyline(sky10)
    rows.append((
        "skyline (10x distinct x)",
        t1,
        t10,
        "two-phase prefix min; distinct-x table 10x wider",
    ))
    print(f"  skyline: 1x {t1:.2f}s 10x {t10:.2f}s ratio {t10 / t1:.2f}")

    print("\n| entry | 1x sec | 10x sec | ratio | note |")
    print("|---|---|---|---|---|")
    for name, a, b, note in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f} | {note} |")


if __name__ == "__main__":
    main()
