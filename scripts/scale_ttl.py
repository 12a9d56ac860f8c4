"""Scale probe for the r13 TTL dedup pair (dedup_ttl / stream_dedup_ttl).

The operator's reason to exist is a STATE BOUND: an exact seen-set over
an unbounded stream holds every fingerprint ever seen (O(stream length)
even snapshot-compacted), while the TTL form's state is O(content in
the horizon) — renewal rows expire physically at every fold. This probe
drives N micro-batches of FRESH content (the worst case for a seen-set:
nothing collapses) through both sink bodies with the same batch size
and compaction cadence and measures, at N/4 and N:

  1. state rows + bytes remaining on disk (post-fold) — TTL must stay
     ~flat at O(horizon/batch_gap x batch_size) while the seen-set
     grows linearly with N;
  2. per-batch wall time head vs tail — both stay flat (that's the
     r12 compaction fix); the TTL fold must not reintroduce growth;
  3. drained-docs equality against the batch dedup_ttl operator over
     everything that arrived (exactness at scale, not just at the
     4-batch oracle size).

Prints one JSON line. Run: PYTHONPATH=/root/repo python
scripts/scale_ttl.py [n_batches]
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
from tiny_md_hbase_spark.streaming import ingest as ING  # noqa: E402

BATCH_ROWS = 40
TICKS_PER_BATCH = 100
TTL = 250  # horizon covers ~2.5 batches of renewals


def _rows(b: int) -> list[tuple]:
    out = []
    for j in range(BATCH_ROWS):
        i = b * BATCH_ROWS + j
        t = f"fresh document body number {i} with its own words {i * 7919}"
        out.append((i, t, "en", "s", len(t), b * TICKS_PER_BATCH + j))
    return out


def _state_stats(spath: str) -> tuple[int, int]:
    n_files = 0
    n_bytes = 0
    for root, _dirs, files in os.walk(spath):
        pq = [f for f in files if f.endswith(".parquet")]
        n_files += len(pq)
        n_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in pq)
    return n_files, n_bytes


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("scale-ttl", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "ttl_state_bound", "n_batches": n_batches, "ttl": TTL}

    for mode in ("ttl", "seen"):
        d = tempfile.mkdtemp(prefix=f"sclttl_{mode}_")
        times: list[float] = []
        try:
            for b in range(n_batches):
                df = spark.createDataFrame(_rows(b), ING.DOCS_TTL_SCHEMA)
                t0 = time.monotonic()
                if mode == "ttl":
                    ING.dedup_ttl_batch(df, b, f"{d}/t", TTL, compact_every=8)
                else:
                    ING.dedup_docs_batch(
                        df.drop("arrival"), b, f"{d}/t", compact_every=8
                    )
                times.append(time.monotonic() - t0)
            q = n_batches // 4
            head = sum(times[:q]) / q
            tail = sum(times[-q:]) / q
            state = ING._read_state(
                spark,
                f"{d}/t/state" if mode == "ttl" else f"{d}/t/seen",
                n_batches,
                ING.TTL_STATE_SCHEMA if mode == "ttl" else ING.SEEN_STATE_SCHEMA,
                ["h", "last_arrival"] if mode == "ttl" else ["h"],
            )
            n_state = state.count() if state is not None else 0
            files, nbytes = _state_stats(
                f"{d}/t/state" if mode == "ttl" else f"{d}/t/seen"
            )
            out[mode] = {
                "state_rows": n_state,
                "state_files": files,
                "state_bytes": nbytes,
                "head_sec": round(head, 3),
                "tail_sec": round(tail, 3),
                "tail_over_head": round(tail / head, 2),
            }
            if mode == "ttl":
                # exactness: drained docs == batch operator over all arrivals
                from tiny_md_hbase_spark.operators import dedup as D

                allrows = [r for b in range(n_batches) for r in _rows(b)]
                staged = spark.createDataFrame(allrows, ING.DOCS_TTL_SCHEMA)
                want = sorted(
                    (r.doc_id, r.arrival)
                    for r in D.dedup_ttl(staged, TTL).collect()
                )
                got = sorted(
                    (r.doc_id, r.arrival)
                    for r in ING.read_stream_output(
                        spark, f"{d}/t/docs", ING.DOCS_TTL_SCHEMA
                    ).collect()
                )
                out["ttl"]["drain_equals_batch"] = got == want
        finally:
            shutil.rmtree(d, ignore_errors=True)

    out["state_rows_ratio_seen_over_ttl"] = round(
        out["seen"]["state_rows"] / max(1, out["ttl"]["state_rows"]), 2
    )
    out["skew"] = _skew_probe(spark)
    print(json.dumps(out))
    spark.stop()


def _skew_probe(spark) -> dict:
    """r14 hot-key probe: ONE content = 90% of all arrivals (the
    pathological key the r13 docstring punted upstream). The structural
    guard (tick-reduce + epoch-salt, dedup.dedup_ttl) must hold its
    bound — no window partition above ttl+1 rows post-reduce — and wall
    time must scale ~linearly 1x → 10x (a single-task funnel scales the
    hot key's time superlinearly with its row count). Exactness: the
    guarded operator equals the plain global-lag rule (the oracle's
    form) on the same skewed relation at both scales."""
    from pyspark.sql import Window

    from tiny_md_hbase_spark.operators import dedup as D

    def skewed(n: int):
        # 90% one literal string spread over ticks (renewal chains), 10% fresh
        hot = [
            (i, "the one hot boilerplate string", "en", "s", 30, i * 3)
            for i in range(int(n * 0.9))
        ]
        cold = [
            (10_000_000 + i, f"fresh body {i} w{i * 31}", "en", "s", 20,
             i * 30 + 1)
            for i in range(n - len(hot))
        ]
        return spark.createDataFrame(hot + cold, ING.DOCS_TTL_SCHEMA)

    res: dict = {"hot_share": 0.9, "ttl": TTL}
    for label, n in (("1x", 20_000), ("10x", 200_000)):
        df = skewed(n).localCheckpoint()  # isolate generation cost
        t0 = time.monotonic()
        got = D.dedup_ttl(df, TTL)
        n_admit = got.count()
        dt = time.monotonic() - t0
        # the plain global-lag rule (the DuckDB oracle's shape), run on
        # Spark over the same relation — equality proves the guard is a
        # re-plan, not a semantics change
        w = Window.partitionBy("h").orderBy("arrival", "doc_id")
        ref = (
            df.withColumn("h", D._content_fp("text"))
            .withColumn("_prev", F.lag("arrival").over(w))
            .filter(
                F.col("_prev").isNull()
                | (F.col("arrival") - F.col("_prev") > TTL)
            )
        )
        same = (
            sorted((r.doc_id, r.arrival) for r in got.collect())
            == sorted((r.doc_id, r.arrival) for r in ref.select(
                "doc_id", "arrival").collect())
        )
        # the funnel observable: max rows any (h, epoch) window
        # partition holds after the tick-reduce — the guard's hard bound
        epoch_len = TTL + 1
        reduced = (
            df.withColumn("h", D._content_fp("text"))
            .groupBy("h", F.col("arrival").alias("_arr"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        max_part = (
            reduced.groupBy(
                "h", D._ttl_floor_epoch("_arr", epoch_len).alias("_ep")
            )
            .agg(F.count(F.lit(1)).alias("rows"))
            .agg(F.max("rows"))
            .collect()[0][0]
        )
        res[label] = {
            "rows": n,
            "admitted": n_admit,
            "sec": round(dt, 3),
            "max_window_partition_rows": max_part,
            "bound_ttl_plus_1": epoch_len,
            "equals_plain_lag": same,
        }
    res["time_ratio_10x_over_1x"] = round(
        res["10x"]["sec"] / max(res["1x"]["sec"], 1e-9), 2
    )
    return res


if __name__ == "__main__":
    main()
