"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the noop sink — full evaluation of every
output column (a bare count() would let Catalyst prune the computed
columns and time nothing), zero driver collection, zero write IO.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tiny_md_hbase_spark.session import get_spark  # noqa: E402

# the BASELINE.md bench set (spatial parity) + the north-star pipeline set
BENCH_KEYS = [
    "range_count",
    "range_query",
    "point_get",
    "knn",
    "index_build",
    "zorder_encode",
    "full_scan",
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard",
    "embedding_knn",
    "text_stats",
    "token_count",
    "lang_id",
    "distance_join",
    "knn_join",
    "quality_score",
    "doc_fingerprint",
    "sessionize",
    "windowed_counts",
    "interval_join",
    "time_band_join",
    "grouped_histogram",
    "sales_rollup",
    "topk_per_group",
    "asof_join",
    "skew_join",
    "semi_join",
    "anti_join",
    "distinct_count",
    "set_except",
    "sales_cube",
    "pivot",
    "running_total",
    "rollup_hierarchy",
    "sql_pricing_summary",
    "table_profile",
    "chunk_documents",
    "decontaminate",
    "decontaminate_hashed",
    "table_profile_approx",
    "embedding_knn_ivf_portable",
    "dedup_embedding_lsh",
    "repetition_stats",
    "knn_3d",
    "text_stats_rollup",
    "dedup_clusters",
    "spatial_histogram",
    "embedding_knn_batch",
    "corpus_clean",
    "zorder3d_encode",
    "corpus_mix",
    "corpus_shuffle",
    "decontaminate_fuzzy",
    "corpus_budget",
    "pii_scrub",
    "winnow_fingerprint",
    "winnow_pairs",
    "corpus_prepare",
    "dedup_semantic",
    "tfidf_top_terms",
    "keyword_search",
    "keyword_search_indexed",
    "lm_bigram_score",
    "anomaly_zscore",
    "embedding_project",
    "embedding_knn_projected",
    "gopher_quality",
    "corpus_jsonl_roundtrip",
    "dedup_incremental",
    "corpus_split",
    "source_cap",
    "dedup_keep_best",
    "centroid_assign",
    "corpus_manifest",
    "sql_zcodec",
    "stream_manifest",
    "embedding_knn_clustered",
    "keyword_search_bm25",
    "line_dedup",
    "embedding_knn_quantized",
    "embedding_knn_quantized_stored",
    "keyword_search_bm25_indexed",
    "quality_gate",
    "embedding_profile",
    "stream_ingest_embeddings",
    "polygon_query",
    "gap_fill",
    "rolling_stats",
    "ohlc",
    "funnel",
    "retention",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    spark = get_spark("tiny-md-hbase-spark-bench", cpus=cpus)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warm the session (JVM/codegen/parquet footer caches + Python UDF
    # workers — a long-running cluster has both) outside timing
    qs["range_count"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(cpus).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # two passes per query, keep the min: the first execution of each plan
    # pays one-time janino/JIT compilation, and concurrent compile storms
    # make single-shot timings bimodal by multiples (a long-running
    # cluster, like the steady-state pass, has every kernel compiled).
    # one failing query must never zero out the whole benchmark run: record
    # the error per-key, keep timing everything else, still emit the JSON line
    results: dict[str, float] = {}
    timings: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    def run_once(key: str) -> float | None:
        t0 = time.perf_counter()
        try:
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            errors[key] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {key} FAILED: {errors[key]}", file=sys.stderr)
            return None
        return round(time.perf_counter() - t0, 3)

    for _pass in range(2):
        for key in BENCH_KEYS:
            if key in errors:
                continue
            dt = run_once(key)
            if dt is None:
                results.pop(key, None)
                continue
            timings.setdefault(key, []).append(dt)
            results[key] = min(results.get(key, dt), dt)

    # the host has degraded phases where identical code runs 2-8x slower
    # for a stretch; when even the min-of-two disagrees with itself by a
    # lot, take one tie-breaking third sample so a single bad window
    # doesn't get recorded as a regression
    for key, ts in timings.items():
        if key not in errors and max(ts) > 2.5 * min(ts):
            dt = run_once(key)
            if dt is not None:
                results[key] = min(results[key], dt)

    # layout-aware path: materialize the z-clustered table once (timed as
    # the write/cluster cost), then run the pruned-scan variants — the
    # 100 TB deployment shape, where the z-window skips row groups via
    # parquet stats instead of re-encoding per row
    import tempfile

    from tiny_md_hbase_spark.operators import spatial
    from tiny_md_hbase_spark.sources import points
    from tiny_md_hbase_spark.sources.writer import (
        load_points_zsorted,
        write_points_zsorted,
    )

    try:
        zdir = tempfile.mkdtemp(prefix="bench_zsorted_") + "/points"
        t0 = time.perf_counter()
        write_points_zsorted(points(spark, sf_dir), zdir, num_partitions=cpus)
        results["zsort_write"] = round(time.perf_counter() - t0, 3)

        zt = load_points_zsorted(spark, zdir)
        t0 = time.perf_counter()
        spatial.range_query(
            zt, (512, 1535), (1024, 3071), z_prefilter=True
        ).write.format("noop").mode("overwrite").save()
        results["range_query_zsorted"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        spatial.range_query(zt, (512, 1535), (1024, 3071), z_cover=16).write.format(
            "noop"
        ).mode("overwrite").save()
        results["range_query_zcover"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        spatial.knn_indexed(zt, 2048, 2048, 10, domain_max=4095).write.format(
            "noop"
        ).mode("overwrite").save()
        results["knn_indexed_zsorted"] = round(time.perf_counter() - t0, 3)
    except Exception as exc:  # noqa: BLE001
        errors["zsorted_layout"] = f"{type(exc).__name__}: {exc}"[:500]
        print(f"bench: zsorted layout FAILED: {errors['zsorted_layout']}", file=sys.stderr)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "cpus": cpus,
    }
    if errors:
        # a partial run must not read as a faster full run: null the
        # headline value so any consumer of "value" sees the breakage
        out["value"] = None
        out["partial_total_sec"] = total
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
