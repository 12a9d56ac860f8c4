"""Scale probe for the r14 streaming text-index maintenance
(stream_index_maintain): the claim to verify is PER-BATCH COST FLAT VS
CORPUS SIZE — each micro-batch tokenizes and writes only its own
arrivals (O(batch)), while the batch-rebuild alternative re-indexes the
whole corpus per refresh (O(corpus), linear growth). Drives N batches
of fresh documents through the sink body with compaction every 8 and
measures:

  1. per-batch wall time head (first quarter) vs tail (last quarter) —
     must stay ~flat while the corpus grows N-fold;
  2. the rebuild alternative's cost at corpus sizes N/4 and N (one-shot
     write_positional_index over everything so far) — the growing curve
     the incremental path replaces;
  3. exactness at scale: keyword + BM25 + phrase over the maintained
     tree equal the same probes over a fresh one-shot build of the full
     drained corpus.

Prints one JSON line. Run: PYTHONPATH=/root/repo python
scripts/scale_index_maintain.py [n_batches]
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
from tiny_md_hbase_spark.sources.writer import (  # noqa: E402
    keyword_search_indexed,
    phrase_search_positional,
    write_inverted_index,
    write_positional_index,
)
from tiny_md_hbase_spark.streaming import ingest as ING  # noqa: E402

BATCH_ROWS = 100
WORDS = (
    "vector stream merge table value part data column row filter key "
    "query order join hash window group line batch"
).split()


def _rows(b: int) -> list[tuple]:
    out = []
    for j in range(BATCH_ROWS):
        i = b * BATCH_ROWS + j
        toks = [WORDS[(i * 7 + t * 13) % len(WORDS)] for t in range(30)]
        # plant the probe phrase sparsely so search returns rows
        if i % 37 == 0:
            toks[5:5] = ["vector", "stream", "merge"]
        t = " ".join(toks)
        out.append((i, t, "en", "s", len(t)))
    return out


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark(
        "scale-idx", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="sclidx_")
    out: dict = {"metric": "index_maintain_flat", "n_batches": n_batches,
                 "batch_rows": BATCH_ROWS}
    try:
        from tiny_md_hbase_spark.sources.writer import write_meta_row

        write_meta_row(
            spark, f"{d}/idx/_index_meta", [("num_buckets", 16, "int")]
        )
        times: list[float] = []
        for b in range(n_batches):
            df = spark.createDataFrame(_rows(b), ING.DOCS_SCHEMA)
            t0 = time.monotonic()
            ING.index_maintain_batch(df, b, f"{d}/idx", 16, compact_every=8)
            times.append(time.monotonic() - t0)
        q = n_batches // 4
        out["maintain"] = {
            "head_sec": round(sum(times[:q]) / q, 3),
            "tail_sec": round(sum(times[-q:]) / q, 3),
            "tail_over_head": round(
                (sum(times[-q:]) / q) / (sum(times[:q]) / q), 2
            ),
        }

        # the rebuild alternative at two corpus sizes — the O(corpus)
        # curve the incremental path replaces
        rebuild = {}
        for label, upto in (("quarter", n_batches // 4), ("full", n_batches)):
            allrows = [r for b in range(upto) for r in _rows(b)]
            corpus = spark.createDataFrame(allrows, ING.DOCS_SCHEMA)
            t0 = time.monotonic()
            write_positional_index(corpus, f"{d}/rebuild_{label}", 16)
            rebuild[label] = round(time.monotonic() - t0, 3)
        rebuild["growth"] = round(rebuild["full"] / rebuild["quarter"], 2)
        out["rebuild_sec"] = rebuild

        # exactness at scale vs a fresh build of the full corpus
        allrows = [r for b in range(n_batches) for r in _rows(b)]
        corpus = spark.createDataFrame(allrows, ING.DOCS_SCHEMA)
        write_inverted_index(corpus, f"{d}/fresh_inv", 16)
        kw_m = [
            (r.doc_id, r.score)
            for r in ING.keyword_search_maintained(spark, f"{d}/idx").collect()
        ]
        kw_f = [
            (r.doc_id, r.score)
            for r in keyword_search_indexed(spark, f"{d}/fresh_inv").collect()
        ]
        bm_m = [
            (r.doc_id, r.bm25)
            for r in ING.keyword_search_bm25_maintained(
                spark, f"{d}/idx"
            ).collect()
        ]
        from tiny_md_hbase_spark.operators.text import keyword_search_bm25

        bm_f = [
            (r.doc_id, r.bm25) for r in keyword_search_bm25(corpus).collect()
        ]
        ph = ("vector", "stream", "merge")
        ph_m = [
            (r.doc_id, r.n_hits)
            for r in ING.phrase_search_maintained(
                spark, f"{d}/idx", phrase=ph
            ).collect()
        ]
        ph_f = [
            (r.doc_id, r.n_hits)
            for r in phrase_search_positional(
                spark, f"{d}/rebuild_full", phrase=ph
            ).collect()
        ]
        out["equal"] = {
            "keyword": kw_m == kw_f and len(kw_m) > 0,
            "bm25": bm_m == bm_f and len(bm_m) > 0,
            "phrase": ph_m == ph_f and len(ph_m) > 0,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
