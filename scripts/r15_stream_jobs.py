"""Jobs-per-trigger audit for the streaming drains the r14 verdict
asked about (stream_scd2, stream_output_compact, stream_manifest) —
the ingest-audit pattern applied beyond stream_index_maintain: count
Spark JOBS (DAGScheduler.numTotalJobs deltas) around each phase of the
drain so "the remaining cost is per-trigger machinery" is a measured
claim, not an assertion.

Phases per key: staging (source write), drain (the stream itself,
jobs / n_triggers), readback (the entry's post-drain output). Prints
one JSON line.

Run: PYTHONPATH=/root/repo python scripts/r15_stream_jobs.py
     env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tiny_md_hbase_spark.session import get_spark  # noqa: E402
from tiny_md_hbase_spark.sources import load_table  # noqa: E402


def _jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("r15-stream-jobs", cpus=cpus)
    from bench import _warm_streaming

    from tiny_md_hbase_spark.streaming import ingest as ING

    _warm_streaming(spark)
    out: dict[str, dict] = {}

    # ---- stream_scd2: staging write + applyInPandasWithState drain +
    # sentinel-unmapping readback
    d = tempfile.mkdtemp(prefix="audit_scd2_")
    try:
        ev = load_table(spark, sf_dir, "events")
        sentinels = ev.groupBy("user_id").agg(F.max("ts").alias("mts")).select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("mts") + F.lit(3_600_000_000_000)).alias("ts"),
            "user_id",
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("").alias("props"),
        )
        j0, t0 = _jobs(spark), time.perf_counter()
        ev.select(*sentinels.columns).union(sentinels).write.parquet(f"{d}/src")
        j1, t1 = _jobs(spark), time.perf_counter()
        q = (
            ING.stream_scd2(spark, f"{d}/src")
            .writeStream.format("memory")
            .queryName("audit_scd2_sink")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_trig = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        n_trig_all = len(q.recentProgress)
        j2, t2 = _jobs(spark), time.perf_counter()
        spark.table("audit_scd2_sink").write.format("noop").mode(
            "overwrite"
        ).save()
        j3, t3 = _jobs(spark), time.perf_counter()
        out["stream_scd2"] = {
            "staging_jobs": j1 - j0, "staging_sec": round(t1 - t0, 3),
            "drain_jobs": j2 - j1, "drain_sec": round(t2 - t1, 3),
            "triggers_with_rows": n_trig, "triggers_total": n_trig_all,
            "readback_jobs": j3 - j2, "readback_sec": round(t3 - t2, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    # ---- stream_output_compact: stream_dedup_docs drain (4 staged
    # files, maxFilesPerTrigger=1) + compaction fold + selection read
    d = tempfile.mkdtemp(prefix="audit_socompact_")
    try:
        base = load_table(spark, sf_dir, "documents")
        staged = base.unionByName(
            base.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        ).unionByName(
            base.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
        j0, t0 = _jobs(spark), time.perf_counter()
        staged.repartitionByRange(4, "doc_id").write.parquet(f"{d}/src")
        j1, t1 = _jobs(spark), time.perf_counter()
        q = ING.stream_dedup_docs(
            spark, f"{d}/src", f"{d}/table", f"{d}/ckpt",
            available_now=True, max_files_per_trigger=1,
        )
        q.awaitTermination()
        n_trig = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        j2, t2 = _jobs(spark), time.perf_counter()
        ING.compact_stream_output(
            spark, f"{d}/table/docs", ING.DOCS_SCHEMA
        )
        j3, t3 = _jobs(spark), time.perf_counter()
        ING.read_stream_output(
            spark, f"{d}/table/docs", ING.DOCS_SCHEMA
        ).groupBy("lang").agg(F.count("*").alias("n_docs")).write.format(
            "noop"
        ).mode("overwrite").save()
        j4, t4 = _jobs(spark), time.perf_counter()
        out["stream_output_compact"] = {
            "staging_jobs": j1 - j0, "staging_sec": round(t1 - t0, 3),
            "drain_jobs": j2 - j1, "drain_sec": round(t2 - t1, 3),
            "triggers_with_rows": n_trig,
            "jobs_per_trigger": round((j2 - j1) / max(1, n_trig), 2),
            "compact_jobs": j3 - j2, "compact_sec": round(t3 - t2, 3),
            "readback_jobs": j4 - j3, "readback_sec": round(t4 - t3, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    # ---- stream_manifest: 4-file staged drain through the additive
    # manifest merge
    d = tempfile.mkdtemp(prefix="audit_manifest_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        j0, t0 = _jobs(spark), time.perf_counter()
        docs.repartitionByRange(4, "doc_id").write.parquet(f"{d}/src")
        j1, t1 = _jobs(spark), time.perf_counter()
        q = ING.stream_manifest(
            spark, f"{d}/src", f"{d}/table", f"{d}/ckpt",
            available_now=True, max_files_per_trigger=1,
        )
        q.awaitTermination()
        n_trig = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        j2, t2 = _jobs(spark), time.perf_counter()
        spark.read.parquet(f"{d}/table/manifest").write.format("noop").mode(
            "overwrite"
        ).save()
        j3, t3 = _jobs(spark), time.perf_counter()
        out["stream_manifest"] = {
            "staging_jobs": j1 - j0, "staging_sec": round(t1 - t0, 3),
            "drain_jobs": j2 - j1, "drain_sec": round(t2 - t1, 3),
            "triggers_with_rows": n_trig,
            "jobs_per_trigger": round((j2 - j1) / max(1, n_trig), 2),
            "readback_jobs": j3 - j2, "readback_sec": round(t3 - t2, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
