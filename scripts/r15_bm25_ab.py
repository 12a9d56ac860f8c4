"""A/B the r14 size-adaptive posting salting against the old fixed
cluster-width salt ON THE PROBE SIDE — the r14 driver bench read
keyword_search_bm25_indexed_probe 19% slower and the verdict asked
whether the new file layout (fewer, larger posting files) is causal or
noise.

Both layouts are written in ONE session (same corpus, same bucket
modulus), then the two probes run INTERLEAVED for N reps (same noise
window, the BENCH.md protocol); per-variant minima decide. Prints one
JSON line.

Run: PYTHONPATH=/root/repo python scripts/r15_bm25_ab.py
     env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
          SPARK_GRAFT_TIME_REPS (default 6)
"""

from __future__ import annotations

import glob
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
from tiny_md_hbase_spark.sources import writer as WR  # noqa: E402


def _write_index(docs, path: str, salt_buckets: int | None) -> None:
    """write_inverted_index with a salt override (None = the shipping
    size-adaptive _salt_buckets)."""
    from tiny_md_hbase_spark.operators.text import tokens

    WR.build_postings(docs, 16, salt_buckets=salt_buckets).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)
    WR.write_meta_row(
        docs.sparkSession, f"{path}/_index_meta", [("num_buckets", 16, "int")]
    )
    docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("dl")
    ).write.mode("overwrite").parquet(f"{path}/_doc_lens")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_TIME_REPS", "6"))
    spark = get_spark("r15-bm25-ab", cpus=cpus)
    docs = load_table(spark, sf_dir, "documents")

    d = tempfile.mkdtemp(prefix="bm25ab_", dir="/dev/shm")
    try:
        new_path = f"{d}/ii_new"
        old_path = f"{d}/ii_old"
        _write_index(docs, new_path, None)  # shipping adaptive salt
        # the pre-r14 fixed salt: max(defaultParallelism, n_dirs) salt
        # values per bucket directory
        old_salt = max(spark.sparkContext.defaultParallelism, 16)
        _write_index(docs, old_path, old_salt)
        files = {
            tag: len(glob.glob(f"{p}/bucket=*/*.parquet"))
            for tag, p in (("new", new_path), ("old", old_path))
        }

        out: dict[str, dict[str, list[float]]] = {
            "bm25": {"new": [], "old": []},
            "kw": {"new": [], "old": []},
        }
        paths = {"new": new_path, "old": old_path}
        # untimed warm rep (plan compile + listing caches), then timed
        for rep in range(reps + 1):
            for tag in ("new", "old"):
                for name, fn in (
                    ("bm25", WR.keyword_search_bm25_indexed),
                    ("kw", WR.keyword_search_indexed),
                ):
                    t0 = time.perf_counter()
                    fn(spark, paths[tag]).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = round(time.perf_counter() - t0, 4)
                    if rep > 0:
                        out[name][tag].append(dt)
        res = {
            "files": files,
            "min": {
                name: {tag: min(v) for tag, v in d2.items()}
                for name, d2 in out.items()
            },
            "samples": out,
        }
        print(json.dumps(res))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
