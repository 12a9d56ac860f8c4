"""Skew-planted scale probe for the gram-blocked pair operators.

Plants ONE boilerplate sentence (a shared legal-disclaimer-style tail,
longer than every gram window) into 10% of documents — the pathological
corpus shape the hot-gram df cap (dedup._cap_gram_df) exists for: every
window of the planted sentence becomes a hub gram with document
frequency = 10% of the corpus, so an uncapped gram-blocked self-join
fans out to ~n_hub_grams * C(0.1*N, 2) candidate pairs while the capped
join drops those grams before the pair join and keeps only the rare
(distinctive) windows.

For dedup_edit and doc_containment at 1x (sf0.1 documents, ~5 K rows)
and 10x (unioned with perturbed ids/suffixes, ~50 K rows), measures:

  - candidate-pair count with the cap OFF vs ON (the fan-out bound), and
  - wall time cap OFF vs ON (min of two passes),

with cap OFF skipped at 10x if the projected uncapped candidate count
exceeds a guard (the whole point is that it explodes; no need to burn
an hour proving it). Results print as a markdown table for BENCH.md.

Run: python scripts/scale_skew.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied warranties "
    "of merchantability and fitness for a particular purpose"
)  # 29 tokens -> 25 hub 5-grams / 22 hub 8-grams when planted verbatim


def build_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def planted(spark, sf_dir: str, copies: int):
    """sf documents, unioned `copies`x with perturbed ids and a per-copy
    distinctive suffix (same construction as BENCH.md's 10x tables), then
    the boilerplate tail appended to doc_id % 10 == 0 (10% of rows)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for c in range(copies):
        suffix = f" copyvar{c}" if c > 0 else ""
        d = docs.select(
            (F.col("doc_id") + F.lit(c * n_ids)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(suffix)).alias("text"),
            "source",
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" " + BOILERPLATE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    )
    return out.localCheckpoint()  # pin the input; time operators only


def candidate_count(docs, gram_len: int, max_gram_df):
    """Candidate pairs the gram-blocked self-join would verify —
    the fan-out metric the cap bounds."""
    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators.dedup import (
        _cap_gram_df,
        _gram_incidence,
    )

    base = docs.select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    from tiny_md_hbase_spark.operators.text import tokens

    toks = base.select("doc_id", tokens(F.col("text")).alias("toks"))
    grams = _cap_gram_df(_gram_incidence(toks, gram_len), max_gram_df)
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def timed(fn, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def planted_identical(spark, sf_dir: str, copies: int):
    """sf documents scaled `copies`x, with doc_id % 10 == 0 (10% of rows)
    REPLACED by one shared boilerplate text — a giant exact-dup family,
    the worst case for MinHash banding (every member collides in every
    band; uncollapsed fan-out is C(0.1*N, 2) candidate pairs)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for c in range(copies):
        suffix = f" copyvar{c}" if c > 0 else ""
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * n_ids)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(suffix)).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.lit(BOILERPLATE))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return out.localCheckpoint()


def minhash_candidates(docs, collapse: bool, cap):
    """Band-join candidate pairs on the exact tables dedup_minhash
    joins, with the two r10 guards individually switchable."""
    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators.dedup import (
        _cap_band_buckets,
        _collapse_exact,
        _xxhash_banded,
    )

    if collapse:
        # coalesce matches _collapse_exact's production fingerprint in
        # dedup_minhash (NULL ≡ ''): without it NULL-text rows hash to
        # the seed constant and the probe's collapse grouping diverges
        # from the operator it claims to measure
        members, docs = _collapse_exact(
            docs, F.xxhash64(F.coalesce(F.col("text"), F.lit("")))
        )
        if members is None:  # the clean-corpus fast path must not fire
            raise AssertionError("planted fixture must contain duplicates")
    _, banded = _xxhash_banded(docs, 32, 8, 3)
    banded = _cap_band_buckets(banded, ["band", "bhash"], cap)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )


def minhash_section(spark, args, run_noop) -> list[tuple]:
    """Giant-exact-dup-family fan-out for dedup_minhash: candidate
    counts with the r10 guards off (pre-r10 shape) vs on, and the full
    operator's wall time, at 1x and 10x."""
    from tiny_md_hbase_spark.operators.dedup import dedup_minhash

    rows = []
    for copies, label in ((1, "1x"), (10, "10x")):
        docs = planted_identical(spark, args.sf_dir, copies)
        n = docs.count()
        g = (n + 9) // 10
        projected = g * (g - 1) // 2
        print(f"== minhash {label}: {n} docs, family g={g}, "
              f"projected uncollapsed fan-out ~{projected:,}")
        if projected <= args.uncapped_guard:
            cand_old = minhash_candidates(docs, collapse=False, cap=None)
        else:
            cand_old = None  # the explosion the guards exist to prevent
        cand_new = minhash_candidates(docs, collapse=True, cap=256)
        t = timed(lambda: run_noop(dedup_minhash(docs)))
        rows.append((label, "dedup_minhash", n, g, cand_old, cand_new, t))
        print(f"   cand_old={cand_old} cand_new={cand_new:,} time={t:.2f}")
    print("\n| scale | docs | family g | candidates pre-r10 "
          "(no collapse/cap) | candidates r10 | dedup_minhash time |")
    print("|---|---|---|---|---|---|")
    for label, _, n, g, c_old, c_new, t in rows:
        c_old_s = f"{c_old:,}" if c_old is not None else "guard-skipped"
        print(f"| {label} | {n:,} | {g:,} | {c_old_s} | {c_new:,} | {t:.2f} s |")
    return rows


def planted_identical_vectors(spark, sf_dir: str, copies: int):
    """sf embeddings scaled `copies`x (vec_ids offset; one component
    perturbed per copy so non-planted cross-copy rows stay distinct),
    with vec_id % 10 == 0 (10% of rows) REPLACED by one shared vector —
    a giant exact-dup family, the worst case for sign-LSH bucketing
    (every member lands in the same bucket of every band; uncollapsed
    fan-out is C(0.1*N, 2) candidate pairs)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_ids = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for c in range(copies):
        v = F.col("embedding").cast("array<double>")
        if c > 0:
            # nudge component 0 by a copy-specific epsilon: distinct
            # bytes (no accidental exact dups across copies) but nearly
            # identical direction, like the text probes' suffix trick
            v = F.concat(
                F.array(F.element_at(v, 1) + F.lit(c * 1e-6)),
                F.slice(v, 2, 63),
            )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(c * n_ids)).alias("vec_id"),
                v.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    shared = F.array(*[F.lit(float((i * 37 % 19) - 9)) for i in range(64)])
    out = out.select(
        "vec_id",
        F.when(F.col("vec_id") % 10 == 0, shared)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )
    return out.localCheckpoint()


def embedding_lsh_candidates(vecs, collapse: bool, cap, planes=16, bands=4):
    """Bucket-join candidate pairs on the exact (band, band_bits)
    buckets dedup_embedding_lsh verifies, with the two guards
    individually switchable (mirrors minhash_candidates)."""
    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators.dedup import (
        _cap_band_buckets,
        _collapse_exact,
    )
    from tiny_md_hbase_spark.operators.similarity import lsh_signature

    rpb = planes // bands
    mask = (1 << rpb) - 1
    if collapse:
        members, vecs = _collapse_exact(
            vecs.select("vec_id", "embedding"),
            F.col("embedding").cast("array<double>"),
            id_col="vec_id",
        )
        if members is None:  # the clean-corpus fast path must not fire
            raise AssertionError("planted fixture must contain duplicates")
    e = vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), planes, 64))
    bucketed = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col("sig")
                        .bitwiseAND(F.lit(mask << (b * rpb)))
                        .alias("band_bits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.band_bits")
    bucketed = _cap_band_buckets(bucketed, ["band", "band_bits"], cap)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )


def embedding_lsh_section(spark, args, run_noop) -> list[tuple]:
    """Giant-identical-vector-family fan-out for dedup_embedding_lsh:
    candidate counts with the guards off vs on, and the full operator's
    wall time, at 1x and 10x — the embedding-side twin of
    minhash_section (the guards live at dedup.py _collapse_exact /
    _cap_band_buckets and are shared; this measures them firing on the
    sign-LSH bucket shape).

    Unlike MinHash band keys (64-bit hashes — buckets collide only on
    real similarity), a sign-LSH band key has 2^(planes/bands) values:
    at the fixture-pinned (16, 4) a band has 16 buckets, so bucket
    width — and hence the candidate count — is a CONSTANT FRACTION of
    the corpus at any scale. That is exactly the docstring's scaling
    rule ("at larger scale RAISE planes/bands to keep buckets under
    the cap"), so the 10x row is measured twice: at the pinned (16, 4)
    — quadratic by bucket density, the warning the docstring gives —
    and at the documented scale move (32, 4) = 8-bit band keys, where
    the guards + finer buckets keep the candidate stage near-linear."""
    from tiny_md_hbase_spark.operators.dedup import dedup_embedding_lsh

    rows = []
    for copies, label, planes in ((1, "1x", 16), (10, "10x", 16), (10, "10x", 32)):
        vecs = planted_identical_vectors(spark, args.sf_dir, copies)
        n = vecs.count()
        g = (n + 9) // 10
        projected = g * (g - 1) // 2
        plabel = f"{label} (planes={planes})"
        print(f"== embedding_lsh {plabel}: {n} vectors, family g={g}, "
              f"projected uncollapsed fan-out ~{projected:,}")
        if projected <= args.uncapped_guard:
            cand_old = embedding_lsh_candidates(
                vecs, collapse=False, cap=None, planes=planes
            )
        else:
            cand_old = None
        cand_new = embedding_lsh_candidates(
            vecs, collapse=True, cap=4096, planes=planes
        )
        t = timed(lambda: run_noop(dedup_embedding_lsh(vecs, planes=planes)))
        rows.append((plabel, "dedup_embedding_lsh", n, g, cand_old, cand_new, t))
        print(f"   cand_old={cand_old} cand_new={cand_new:,} time={t:.2f}")
    print("\n| scale | vectors | family g | candidates unguarded "
          "(no collapse/cap) | candidates guarded | dedup_embedding_lsh time |")
    print("|---|---|---|---|---|---|")
    for plabel, _, n, g, c_old, c_new, t in rows:
        c_old_s = f"{c_old:,}" if c_old is not None else "guard-skipped"
        print(f"| {plabel} | {n:,} | {g:,} | {c_old_s} | {c_new:,} | {t:.2f} s |")
    return rows


def stream_section(spark, args) -> list[tuple]:
    """Giant-exact-dup-family fan-out for stream_dedup_near: the pair
    EMISSION bound is the streaming-specific hazard — an uncapped drain
    of a g-member identical family appends C(g,2) verified pairs (the
    batch guards cut candidates; a stream also has to not EMIT them),
    while the keep-first enrollment cap bounds the family's output to
    ~W*g (each arrival pairs with at most W stored members). Measures
    drained pair counts uncapped (guard-skipped at 10x) vs capped
    (W=64) and the capped drain's wall time, production hash family."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.streaming.ingest import stream_dedup_near

    rows = []
    for copies, label in ((1, "1x"), (10, "10x")):
        docs = planted_identical(spark, args.sf_dir, copies)
        n = docs.count()
        g = (n + 9) // 10
        projected = g * (g - 1) // 2
        print(f"== stream {label}: {n} docs, family g={g}, "
              f"uncapped family emission C(g,2) = {projected:,}")
        docs5 = docs.select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("s").alias("source"), F.length("text").alias("n_chars"),
        )
        res = {}
        for cap in (None, 64):
            if cap is None and projected > args.uncapped_guard // 100:
                res["uncapped"] = None  # the emission the cap exists to bound
                continue
            d = tempfile.mkdtemp(prefix=f"skewstream_{label}_")
            try:
                docs5.repartitionByRange(4, "doc_id").write.parquet(f"{d}/src")
                t0 = time.perf_counter()
                q = stream_dedup_near(
                    spark, f"{d}/src", f"{d}/table", f"{d}/ckpt",
                    max_bucket_width=cap, hash_family="xxhash64",
                    available_now=True, max_files_per_trigger=1,
                )
                q.awaitTermination()
                dt = time.perf_counter() - t0
                n_pairs = spark.read.parquet(f"{d}/table/pairs").count()
                res["uncapped" if cap is None else "capped"] = (n_pairs, dt)
            finally:
                shutil.rmtree(d, ignore_errors=True)
        rows.append((label, n, g, res.get("uncapped"), res["capped"]))
        print(f"   uncapped={res.get('uncapped')} capped={res['capped']}")
    print("\n| scale | docs | family g | pairs uncapped (drain s) | "
          "pairs capped W=64 (drain s) |")
    print("|---|---|---|---|---|")
    for label, n, g, unc, capd in rows:
        unc_s = f"{unc[0]:,} ({unc[1]:.1f} s)" if unc else "guard-skipped"
        print(f"| {label} | {n:,} | {g:,} | {unc_s} | "
              f"{capd[0]:,} ({capd[1]:.1f} s) |")
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--uncapped-guard", type=int, default=200_000_000)
    ap.add_argument(
        "--section",
        choices=["grams", "minhash", "embedding", "stream", "all"],
        default="all",
    )
    args = ap.parse_args()

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from tiny_md_hbase_spark.operators.dedup import dedup_edit, doc_containment

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    if args.section in ("minhash", "all"):
        minhash_section(spark, args, run_noop)
    if args.section in ("embedding", "all"):
        embedding_lsh_section(spark, args, run_noop)
    if args.section in ("stream", "all"):
        stream_section(spark, args)
    if args.section in ("minhash", "embedding", "stream"):
        spark.stop()
        return 0

    rows = []
    for copies, label in ((1, "1x"), (10, "10x")):
        docs = planted(spark, args.sf_dir, copies)
        n = docs.count()
        n_hub = (n + 9) // 10
        # projected uncapped pairs if ONLY the boilerplate grams collided:
        # 25 hub 5-grams x C(n/10, 2) (dedup_edit's gram_len=5)
        projected = 25 * n_hub * (n_hub - 1) // 2
        print(f"== {label}: {n} docs, {n_hub} planted, "
              f"projected uncapped hub fan-out ~{projected:,}")

        # sweep caps: None = uncapped (guard-skipped when the projection
        # explodes); a cap ABOVE the planted df (no-op, measures the cap's
        # own overhead); a cap BELOW the planted df (hub grams dropped).
        caps = [None, 1000, 100] if projected <= args.uncapped_guard else [
            1000,
            100,
        ]
        for op_name, fn, gram_len in (
            ("dedup_edit", lambda d, c: dedup_edit(d, max_gram_df=c), 5),
            (
                "doc_containment",
                lambda d, c: doc_containment(d, max_gram_df=c),
                8,
            ),
        ):
            for cap in caps:
                cand = candidate_count(docs, gram_len, cap)
                t = timed(lambda: run_noop(fn(docs, cap)))
                rows.append((label, op_name, n, cap, cand, t))
                print(f"   {op_name} cap={cap}: cand={cand:,} time={t:.2f}")

    print("\n| scale | operator | docs | cap | candidate pairs | time |")
    print("|---|---|---|---|---|---|")
    for label, op, n, cap, cand, t in rows:
        cap_s = "uncapped" if cap is None else str(cap)
        print(f"| {label} | {op} | {n:,} | {cap_s} | {cand:,} | {t:.2f} s |")
    for label in ("1x", "10x"):
        if not any(r[0] == label and r[3] is None for r in rows):
            print(
                f"\n(uncapped at {label} skipped: projected hub fan-out "
                f"exceeds the {args.uncapped_guard:,}-pair guard — the "
                "explosion the cap exists to prevent)"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
