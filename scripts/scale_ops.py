"""10x scale probe for the most expensive NON-build registry keys.

scale_builds.py answers "does a layout build scale linearly?" and
scale_skew.py answers "do the LSH guards keep a skewed corpus linear?";
this script closes the remaining gap (r10 verdict #7): the five most
expensive non-build keys in BENCH_DETAIL had no measured 10x row.

Per key, the 10x fixture preserves the operator's OUTPUT CONTRACT so
the ratio measures scaling, not output blowup:

- quality_gate: 10 perturbed-id copies (per-doc scoring + histogram
  threshold — output stays one row per kept doc, 10x rows in ≈ 10x out)
- index_build: 10 perturbed-id point copies (the trie deepens where
  buckets overflow — work O(n log n), the documented coarse-to-fine
  recursion)
- ngram_jaccard / dedup_clusters: 10 TOKEN-TAGGED copies — every token
  is prefixed with a per-copy tag, so shingles NEVER match across
  copies and the 10x corpus is 10 content-disjoint shards with the 1x
  corpus's internal near-dup structure: output pairs scale exactly 10x.
  A plain id-perturbed union would make every doc a 10-member exact-dup
  family (45 cross pairs per doc — output blowup, not scaling), which is
  scale_skew.py's subject, not this probe's.
- pagerank: 10 node-offset copies of the purchase graph (offset keeps
  parity, components stay disjoint) — same 5 iterations over 10x edges.

Each timing is min of two passes; inputs are localCheckpoint-pinned
outside timing. Prints a markdown table for BENCH.md.

Run: python scripts/scale_ops.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from scale_builds import build_spark, timed, widen  # noqa: E402


def tagged_copies(docs, copies: int, tag_lang: bool = False):
    """Union `copies` copies with perturbed ids AND per-copy token tags:
    tag 'cN' prefixes every token, so no shingle matches across copies —
    the 10x corpus is `copies` content-disjoint shards, each with the
    original's internal near-dup structure. ``tag_lang`` additionally
    tags the lang column, so BLOCK-blocked operators see 10x MANY
    blocks of the original size instead of 10x-WIDER blocks — the
    scaling axis the exact all-pairs-within-block operators are
    contracted for (block width is quadratic by contract; the MinHash
    family is the scale path for wide blocks)."""
    from pyspark.sql import functions as F

    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for c in range(copies):
        tag = F.lit(f"c{c}")
        retok = F.array_join(
            F.transform(
                F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
                lambda t: F.concat(tag, t),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * n_ids)).alias("doc_id"),
                retok.alias("text"),
                (F.concat(tag, F.col("lang")) if tag_lang else F.col("lang")).alias("lang"),
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators import dedup as D
    from tiny_md_hbase_spark.operators import graph as G
    from tiny_md_hbase_spark.operators import index as IX
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table, points

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    rows: list[tuple[str, float, float, float, str]] = []

    def bench(name: str, fn1, fn10, note: str) -> None:
        t1, t10 = timed(fn1), timed(fn10)
        rows.append((name, t1, t10, t10 / t1, note))
        print(f"  {name}: 1x {t1:.2f}s 10x {t10:.2f}s ratio {t10 / t1:.2f}")

    docs1 = load_table(spark, args.sf_dir, "documents").localCheckpoint()
    docs10 = widen(docs1, 10, "doc_id").localCheckpoint()
    pts1 = points(spark, args.sf_dir).localCheckpoint()
    pts10 = widen(pts1, 10, "id").localCheckpoint()

    bench(
        "quality_gate",
        lambda: run_noop(TX.quality_gate(docs1)),
        lambda: run_noop(TX.quality_gate(docs10)),
        "histogram threshold; only the boundary class ranks",
    )
    bench(
        "index_build",
        lambda: run_noop(IX.index_build(pts1)),
        lambda: run_noop(IX.index_build(pts10)),
        "coarse-to-fine aggregation; per-tail recursion bounded",
    )
    docs10b = tagged_copies(
        load_table(spark, args.sf_dir, "documents"), 10, tag_lang=True
    ).localCheckpoint()
    # ngram_jaccard is the EXACT all-pairs-within-(lang, length-bucket)
    # variant — its docstring positions MinHash as the scale path, and
    # its cost is quadratic in BLOCK WIDTH by contract. Two 10x axes:
    # 10x MANY original-size blocks (the scaling axis a sharded corpus
    # actually has — must be linear) and the same blocks 10x wider (the
    # contract's quadratic axis — reported LAST, see below, to pin the
    # documented positioning without its ~160 s run heating the host
    # under the linear measurements).
    bench(
        "ngram_jaccard (10x block count)",
        lambda: run_noop(D.ngram_jaccard(docs1)),
        lambda: run_noop(D.ngram_jaccard(docs10b)),
        "10x original-size blocks: the sharded-corpus axis, linear",
    )
    # pair counts confirm the tagged construction: output must be ~10x
    p1 = D.ngram_jaccard(docs1).count()
    p10 = D.ngram_jaccard(docs10b).count()
    print(f"  ngram_jaccard pairs: 1x {p1} 10x {p10} (expect exactly 10x)")
    bench(
        "dedup_clusters",
        lambda: run_noop(D.dedup_clusters(docs1, D.ngram_jaccard(docs1))),
        lambda: run_noop(
            D.dedup_clusters(docs10b, D.ngram_jaccard(docs10b))
        ),
        "union-find under collect_limit over the 10x-disjoint pair graph",
    )

    e1 = G.purchase_edges(
        load_table(spark, args.sf_dir, "orders"),
        load_table(spark, args.sf_dir, "lineitem"),
    ).localCheckpoint()
    n_off = (e1.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0] + 2) // 2 * 2
    parts = [
        e1.select(
            (F.col("src") + F.lit(c * n_off)).alias("src"),
            (F.col("dst") + F.lit(c * n_off)).alias("dst"),
        )
        for c in range(10)
    ]
    e10 = parts[0]
    for p in parts[1:]:
        e10 = e10.unionByName(p)
    e10 = e10.localCheckpoint()
    bench(
        "pagerank",
        lambda: run_noop(G.pagerank(e1)),
        lambda: run_noop(G.pagerank(e10)),
        "5 exact-integer rounds; 10 node-offset disjoint graph copies",
    )

    # r13 (r12 verdict #6): the two most expensive registry keys — the
    # iterative graph forms — get their 10x rows. Disjoint 10x copies
    # mean the ROUND counts must stay fixed while per-round cost grows
    # linearly; the rounds are printed alongside so the growth axis is
    # visible, not inferred.
    def star_clusters(docs, log):
        pairs = D.ngram_jaccard(docs)
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        return G.connected_components_star(
            docs.select(F.col("doc_id").alias("node")), edges, round_log=log
        )

    star_rounds: dict[str, int] = {}

    def run_star(docs, tag):
        log: list = []
        run_noop(star_clusters(docs, log))
        star_rounds[tag] = len(log)

    bench(
        "dedup_clusters_star",
        lambda: run_star(docs1, "1x"),
        lambda: run_star(docs10b, "10x"),
        "O(log n) star-contraction rounds; disjoint 10x copies keep rounds fixed",
    )
    print(
        f"  dedup_clusters_star rounds: 1x {star_rounds['1x']} "
        f"10x {star_rounds['10x']} (disjoint copies: expect equal)"
    )
    rows[-1] = rows[-1][:4] + (
        rows[-1][4]
        + f" — rounds {star_rounds['1x']} vs {star_rounds['10x']}",
    )

    # rounds-vs-n on the operator's own worst case: PATH graphs, where
    # min-label needs O(n) rounds and star contraction must need O(log n)
    def path_rounds(n: int) -> int:
        nodes = spark.range(n).select(F.col("id").alias("node"))
        e = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        log: list = []
        run_noop(G.connected_components_star(nodes, e.localCheckpoint(), round_log=log))
        return len(log)

    pr_small, pr_big = path_rounds(1_000), path_rounds(10_000)
    print(
        f"  star contraction path-graph rounds: n=1000 -> {pr_small}, "
        f"n=10000 -> {pr_big} (O(log n): expect +~3-4, not +9000)"
    )
    rows.append(
        (
            "star rounds (path graph)",
            float(pr_small),
            float(pr_big),
            pr_big / pr_small,
            "ROUNDS at n=1k vs 10k — the O(log n) contract measured directly",
        )
    )

    ew1 = G.purchase_edges_weighted(
        load_table(spark, args.sf_dir, "orders"),
        load_table(spark, args.sf_dir, "lineitem"),
    ).localCheckpoint()
    partsw = [
        ew1.select(
            (F.col("src") + F.lit(c * n_off)).alias("src"),
            (F.col("dst") + F.lit(c * n_off)).alias("dst"),
            "w",
        )
        for c in range(10)
    ]
    ew10 = partsw[0]
    for p in partsw[1:]:
        ew10 = ew10.unionByName(p)
    ew10 = ew10.localCheckpoint()
    bench(
        "pagerank_weighted",
        lambda: run_noop(G.pagerank_weighted(ew1)),
        lambda: run_noop(G.pagerank_weighted(ew10)),
        "5 fixed exact-integer rounds; linear per-round cost over 10x edges",
    )

    # the contract's quadratic axis, measured LAST: ~160 s of all-pairs
    # verify heats the host and its pinned 10x checkpoint competes for
    # memory — running it earlier inflated the linear rows ~3x
    docs10t = tagged_copies(
        load_table(spark, args.sf_dir, "documents"), 10
    ).localCheckpoint()
    bench(
        "ngram_jaccard (10x block width)",
        lambda: run_noop(D.ngram_jaccard(docs1)),
        lambda: run_noop(D.ngram_jaccard(docs10t)),
        "all-pairs within block: quadratic in width BY CONTRACT (use minhash)",
    )

    print("\n| key | 1x sec | 10x sec | ratio | 10x construction / scale note |")
    print("|---|---|---|---|---|")
    for name, a, b, r, note in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.2f} | {note} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
