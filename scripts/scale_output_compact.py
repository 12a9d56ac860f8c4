"""Scale probe for streaming OUTPUT compaction (VERDICT r12 #7).

A long-lived stream_dedup_docs ingest leaves one ``docs/batch=<id>``
directory per micro-batch — O(batches) directories every downstream read
must list and plan over, growing forever. compact_stream_output folds the
drained batches into one size-targeted snapshot. This probe drives N
batches through the sink body (dedup_docs_batch — the exact foreachBatch
code path) and measures, at N and at N/4:

  1. downstream read wall time (read_stream_output -> count) over the
     UNCOMPACTED tree vs after compact_stream_output — uncompacted grows
     with batch count, compacted must stay flat.
  2. directories + files the reader touches (the listing observable).
  3. relation equality: the compacted read returns the identical doc_id
     multiset (compaction is a pure layout change).

Prints one JSON line. Run: PYTHONPATH=/root/repo python
scripts/scale_output_compact.py [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiny_md_hbase_spark.session import get_spark  # noqa: E402
from tiny_md_hbase_spark.streaming import ingest as ING  # noqa: E402

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
DOCS_PER_BATCH = 40


def _batch_rows(b: int) -> list[tuple]:
    rows = [
        (
            b * DOCS_PER_BATCH + i,
            f"document body {b} {i} with distinct words {b * 7919 + i}",
            "en",
            "s",
            40,
        )
        for i in range(DOCS_PER_BATCH)
    ]
    if b:  # one cross-batch duplicate per batch keeps the dedup path hot
        rows.append((b * DOCS_PER_BATCH + 90, "document body 0 0 with distinct words 0", "en", "s", 40))
    return rows


def _read_stats(spark, path: str) -> dict:
    t0 = time.perf_counter()
    df = ING.read_stream_output(spark, path, DOCS_SCHEMA)
    n = df.count()
    dt = time.perf_counter() - t0
    n_dirs = sum(1 for d in os.listdir(path)) if os.path.exists(path) else 0
    n_files = len(df.inputFiles())
    return {"read_sec": round(dt, 3), "rows": n, "dirs": n_dirs, "files": n_files}


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = get_spark("scale-output-compact", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "output_compact_probe", "n_batches": n_batches}
    base = tempfile.mkdtemp(prefix="socprobe_")
    try:
        for scale, nb in (("quarter", n_batches // 4), ("full", n_batches)):
            t_path = f"{base}/{scale}"
            for b in range(nb):
                ING.dedup_docs_batch(
                    spark.createDataFrame(_batch_rows(b), DOCS_SCHEMA),
                    b,
                    t_path,
                    compact_every=10_000,  # state compaction off: isolate output
                )
            docs = f"{t_path}/docs"
            pre = _read_stats(spark, docs)
            pre_ids = sorted(
                r.doc_id
                for r in ING.read_stream_output(spark, docs, DOCS_SCHEMA).collect()
            )
            t0 = time.perf_counter()
            folded = ING.compact_stream_output(spark, docs, DOCS_SCHEMA)
            fold_sec = round(time.perf_counter() - t0, 3)
            post = _read_stats(spark, docs)
            post_ids = sorted(
                r.doc_id
                for r in ING.read_stream_output(spark, docs, DOCS_SCHEMA).collect()
            )
            out[scale] = {
                "batches": nb,
                "folded": folded,
                "fold_sec": fold_sec,
                "pre": pre,
                "post": post,
                "identical": pre_ids == post_ids,
            }
        q, f = out["quarter"], out["full"]
        out["uncompacted_read_ratio"] = round(
            f["pre"]["read_sec"] / max(q["pre"]["read_sec"], 1e-9), 2
        )
        out["compacted_read_ratio"] = round(
            f["post"]["read_sec"] / max(q["post"]["read_sec"], 1e-9), 2
        )
        out["post_dirs_flat"] = q["post"]["dirs"] == f["post"]["dirs"] == 2
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
