"""Scale probes for the r12 operators.

1. corpus_stratified_weighted under planted source skew: one source
   holding ~90% of the corpus — the exact shape the skew_safe_topk
   routing exists for (a bare PARTITION BY source window would funnel
   the giant source's whole relation through one task). Measured at 1x
   and 10x rows: the real axis must stay ~linear, and the giant
   source's sample must still be exact (equals the solo global sampler
   on that source).

2. stream_decontaminate at 1x and 10x arrival volume (fixed eval set):
   stateless broadcast join, so per-drain time must scale ~linearly
   with arrivals and be independent of the number of PRIOR batches.

Prints one JSON line. Run: PYTHONPATH=/root/repo python
scripts/scale_stratified.py
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

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _skewed_docs(spark, n: int):
    """~90% of docs in source 'giant', the rest spread over 8 tails."""
    return (
        spark.range(1, n + 1)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document body "), F.col("id")).alias("text"),
            F.lit("en").alias("lang"),
            F.when(F.col("id") % 10 != 0, F.lit("giant"))
            .otherwise(F.concat(F.lit("tail"), (F.col("id") % 8)))
            .alias("source"),
            (F.col("id") % 997 + 16).cast("long").alias("n_chars"),
        )
        .localCheckpoint()
    )


def main() -> None:
    spark = get_spark(
        "scale-stratified", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    from tiny_md_hbase_spark.operators.text import (
        corpus_stratified_weighted,
        corpus_weighted_sample,
    )
    from tiny_md_hbase_spark.streaming.ingest import stream_decontaminate

    out: dict = {}
    base_n = 200_000

    # --- probe 1: stratified sampler under 90% single-source skew -----
    strat = {}
    for mult in (1, 10):
        docs = _skewed_docs(spark, base_n * mult)
        q = corpus_stratified_weighted(docs, k=10)
        q.write.format("noop").mode("overwrite").save()  # warm/compile
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        strat[f"{mult}x"] = {"rows": base_n * mult, "sec": dt}
        if mult == 10:
            # exactness under skew: the giant source's sample equals the
            # solo global sampler restricted to it
            got = [
                (r.doc_id, r.priority, r.est)
                for r in q.filter(F.col("source") == "giant").collect()
            ]
            solo = [
                (r.doc_id, r.priority, r.est)
                for r in corpus_weighted_sample(
                    docs.filter(F.col("source") == "giant"), k=10
                ).collect()
            ]
            strat["giant_source_exact"] = got == solo
        docs.unpersist()
    strat["ratio_10x"] = round(strat["10x"]["sec"] / strat["1x"]["sec"], 2)
    out["stratified_skew"] = strat

    # --- probe 2: stream_decontaminate arrival-volume linearity -------
    dec = {}
    eval_docs = spark.createDataFrame(
        [
            (50, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "eval", 57),
            (100, "one two three four five six seven eight nine ten", "en", "eval", 49),
        ],
        DOCS_SCHEMA,
    )
    for mult in (1, 10):
        n = 20_000 * mult
        d = tempfile.mkdtemp(prefix=f"sdecon_sc_{mult}_")
        try:
            docs = spark.range(1, n + 1).select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") % 100 == 0,
                    F.lit("alpha beta gamma delta epsilon zeta eta theta planted tail "),
                ).otherwise(F.lit("clean words "))
                .alias("prefix"),
            ).select(
                "doc_id",
                F.concat(F.col("prefix"), F.col("doc_id")).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("s").alias("source"),
                F.lit(64).cast("long").alias("n_chars"),
            )
            docs.repartitionByRange(4, "doc_id").write.parquet(f"{d}/src")
            t0 = time.perf_counter()
            q = stream_decontaminate(
                spark,
                f"{d}/src",
                f"{d}/t",
                f"{d}/ckpt",
                eval_docs=eval_docs,
                available_now=True,
                max_files_per_trigger=1,
            )
            q.awaitTermination(600)
            dt = round(time.perf_counter() - t0, 3)
            hits = spark.read.parquet(f"{d}/t/hits").count()
            dec[f"{mult}x"] = {"arrivals": n, "drain_sec": dt, "hits": hits}
        finally:
            shutil.rmtree(d, ignore_errors=True)
    dec["ratio_10x"] = round(dec["10x"]["drain_sec"] / dec["1x"]["drain_sec"], 2)
    dec["hits_ratio"] = round(dec["10x"]["hits"] / max(dec["1x"]["hits"], 1), 2)
    out["decontaminate_volume"] = dec

    print(json.dumps(out))


if __name__ == "__main__":
    main()
