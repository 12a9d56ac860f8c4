"""Scale probe for the r12 streaming-state fixes (VERDICT r11 #4 + #6).

Drives 64+ micro-batches through the stream_dedup_near sink body
(dedup_near_batch — the exact foreachBatch code path, minus the
StreamExecution scaffolding so each batch is individually timeable) and
measures:

  1. per-batch wall time with compaction ON (compact_every=8) vs OFF —
     the r11 defect was O(total batch directories) listing/scan per
     batch, unbounded over stream lifetime; with snapshots the tail
     batches must not grow against the head.
  2. state directories + files handed to the reader per batch (the
     path-selection observable) — compacted stays bounded, uncompacted
     grows linearly.
  3. bucket pruning: for the LAST batch, bytes handed to the scan by
     the touched-bucket path selection vs total bands-state bytes.

Prints one JSON line. Run: PYTHONPATH=/root/repo python
scripts/scale_stream_compact.py [n_batches]
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


def _doc(i: int) -> tuple:
    # every 5th doc is a near-dup of a base family so pairs keep flowing;
    # the rest are distinct (state keeps growing)
    if i % 5 == 0:
        t = f"the quick brown fox jumps over the lazy dog variant {i % 3}"
    else:
        t = f"distinct document body number {i} with its own words {i * 7919}"
    return (i, t, "en", "s", len(t))


def _tree_stats(spath: str) -> tuple[int, int]:
    """(n directories, total bytes) of one state tree."""
    n_dirs = 0
    n_bytes = 0
    for root, dirs, files in os.walk(spath):
        n_dirs += len(dirs)
        n_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return n_dirs, n_bytes


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    docs_per_batch = 8
    spark = get_spark("scale-stream-compact", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    base = tempfile.mkdtemp(prefix="scale_compact_")
    out: dict = {"n_batches": n_batches, "docs_per_batch": docs_per_batch}
    try:
        for mode, every in (("compacted", 8), ("uncompacted", 10**9)):
            t_path = f"{base}/{mode}"
            times = []
            for b in range(n_batches):
                rows = [_doc(b * docs_per_batch + j) for j in range(docs_per_batch)]
                df = spark.createDataFrame(rows, DOCS_SCHEMA)
                t0 = time.perf_counter()
                ING.dedup_near_batch(df, b, t_path, compact_every=every)
                times.append(round(time.perf_counter() - t0, 3))
            head = sorted(times[2 : 2 + 8])  # skip the 2 warm-up batches
            tail = sorted(times[-8:])
            med = lambda xs: xs[len(xs) // 2]  # noqa: E731
            bands_dirs, bands_bytes = _tree_stats(f"{t_path}/bands")
            out[mode] = {
                "per_batch_head_median": med(head),
                "per_batch_tail_median": med(tail),
                "tail_over_head": round(med(tail) / med(head), 2),
                "bands_dirs": bands_dirs,
                "bands_bytes": bands_bytes,
                "times": times,
            }
        # bucket-pruning observable on the compacted tree: bytes handed to
        # the scan for ONE touched bucket vs the whole bands state
        t_path = f"{base}/compacted"
        snap, cutoff, live = ING._state_layout(spark, f"{t_path}/bands")
        some_dir = snap or next(iter(live.values()))
        bucket = int(
            next(
                d for d in os.listdir(some_dir) if d.startswith("bucket=")
            ).split("=")[1]
        )
        pruned = ING._read_state(
            spark,
            f"{t_path}/bands",
            exclude_batch=-1,
            schema=ING.BANDS_STATE_SCHEMA,
            cols=["doc_id", "band", "bhash"],
            bucket_in=[bucket],
        )
        pruned_files = [f.replace("file:", "") for f in pruned.inputFiles()]
        pruned_bytes = sum(os.path.getsize(f) for f in pruned_files)
        _, total_bytes = _tree_stats(f"{t_path}/bands")
        out["bucket_prune"] = {
            "probe_bucket": bucket,
            "pruned_files": len(pruned_files),
            "pruned_bytes": pruned_bytes,
            "total_bands_bytes": total_bytes,
            "bytes_fraction": round(pruned_bytes / total_bytes, 4),
            "all_files_in_probe_bucket": all(
                f"bucket={bucket}/" in f for f in pruned_files
            ),
        }
        # cross-mode result identity: compaction must not change the pairs
        p_c = spark.read.parquet(f"{base}/compacted/pairs")
        p_u = spark.read.parquet(f"{base}/uncompacted/pairs")
        out["pairs_identical"] = (
            sorted(map(tuple, p_c.select("doc_a", "doc_b").collect()))
            == sorted(map(tuple, p_u.select("doc_a", "doc_b").collect()))
        )
        out["n_pairs"] = p_c.count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
