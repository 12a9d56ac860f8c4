"""Adaptive quad-trie bucket index (SURVEY.md §2.2 ``bucket_split``,
§2.1 ``index_inspect``/``floor_lookup``) built Spark-first.

The reference maintains the index online: each insert increments a bucket
counter and splits the bucket one z-bit at a time when the count exceeds a
threshold (``Index.maySplit``/``splitBucket``, ``Index.java:175-230``),
writing an (empty) sibling entry at every chain level and stopping at
prefix length 64 (``Index.java:201``). The final structure is a prefix
trie whose leaves each hold ≤ threshold points (unless at max depth) —
independent of insertion order.

Batch construction here:

1. ONE distributed shuffle: ``groupBy(zvalue)`` → per-cell counts. All
   further work happens on this (much smaller) cell table — at 100 TB the
   raw points are touched exactly once.
2. An iterative refinement loop over the cells. Instead of splitting one
   bit per round (≤ 62 rounds), each overfull bucket jumps directly to its
   *bisection depth* — one past the common prefix of its min/max z — and
   the reference's empty-sibling chain entries for the skipped levels are
   generated arithmetically (they are fully determined: sibling of the
   occupied child at each level, size 0). Every round therefore splits
   every overfull bucket into two non-empty children, so rounds are
   O(log(n/threshold)) instead of O(64), and each round's shuffle runs on
   a strictly shrinking active set.

The resulting index matches the reference's end state exactly, with exact
sizes (the reference's counters drift on id-overwrites, SURVEY.md §1.3).

Scale note: the loop state (cells in still-overfull buckets) is a
DataFrame throughout — nothing is collected to the driver — so the build
scales to an index too large for one node. The overfull-bucket descriptor
table joined each round is bounded by the number of *internal* trie nodes
at that level and is broadcast only if small (Spark/AQE decides;
``broadcast()`` is hinted because in practice it is tiny relative to the
cell table).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiny_md_hbase_spark.zorder import make_mask, prefix_render, zvalue

DEFAULT_THRESHOLD = 10  # Client.java:170, README:66-67
MAX_DEPTH = 64  # Index.java:201
ROOT_PL = 2  # bootstrap bucket [00*...*], Index.java:96-99

__all__ = [
    "cells",
    "index_build",
    "index_build_py",
    "index_inspect",
    "floor_lookup",
    "floor_lookup_batch",
]


def cells(points: DataFrame) -> DataFrame:
    """Per-z-cell point counts — the single pass over the raw data."""
    zcol = F.col("zvalue") if "zvalue" in points.columns else zvalue("x", "y")
    return points.select(zcol.alias("z")).groupBy("z").agg(
        F.count("*").alias("c")
    )


def _bucket_of(z: Column, pl: Column | int) -> Column:
    return z.bitwiseAND(make_mask(pl))


def index_build(
    points: DataFrame,
    threshold: int = DEFAULT_THRESHOLD,
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Build the bucket index ``(bucket_z, pl, size)`` to fixpoint.

    Returns the leaf trie: disjoint buckets covering the ``[00*]`` domain,
    every size ≤ threshold unless pl == max_depth, sizes exact.
    """
    spark = points.sparkSession
    cell_df = cells(points)

    # localCheckpoint each round truncates the lineage: without it round k
    # re-executes the whole join chain back to the parquet scan, turning an
    # O(rounds) loop into O(rounds^2) work and an analyzer-killing plan
    active = cell_df.select(
        "z", "c", F.lit(ROOT_PL).alias("pl"), _bucket_of(F.col("z"), ROOT_PL).alias("bucket_z")
    ).localCheckpoint()
    done: list[DataFrame] = []
    cached = []
    while True:
        counts = (
            active.groupBy("bucket_z", "pl")
            .agg(
                F.sum("c").alias("size"),
                F.min("z").alias("min_z"),
                F.max("z").alias("max_z"),
            )
            .cache()
        )
        cached.append(counts)
        is_leaf = (F.col("size") <= threshold) | (F.col("pl") >= max_depth)
        done.append(counts.filter(is_leaf).select("bucket_z", "pl", "size"))
        over = counts.filter(~is_leaf)
        if over.isEmpty():
            break

        # bisection depth: one past the common prefix of min/max z in the
        # bucket; min == max (unsplittable cell pile-up) jumps to max_depth
        xor = F.col("min_z").bitwiseXOR(F.col("max_z"))
        cp = F.when(xor == 0, F.lit(64)).otherwise(F.lit(64) - F.length(F.bin(xor)))
        over_ann = over.withColumn("cp", F.least(cp, F.lit(max_depth))).withColumn(
            "new_pl", F.least(F.col("cp") + 1, F.lit(max_depth))
        )

        # the reference's empty-sibling chain for the skipped levels: at
        # each level l in (pl, cp], the occupied child's sibling, size 0
        # (Index.java:217-227 writes both children on every split)
        lvl = F.col("lvl")
        on_path = _bucket_of(F.col("min_z"), lvl)
        sibling = on_path.bitwiseXOR(
            F.call_function("shiftleft", F.lit(1).cast("long"), F.lit(64) - lvl)
        )
        # (sequence(a, b) with b < a produces a DESCENDING sequence in
        # Spark — guard the no-skip case where cp == pl)
        chain_levels = F.when(
            F.col("cp") >= F.col("pl") + 1,
            F.sequence(F.col("pl") + 1, F.col("cp")),
        ).otherwise(F.array().cast("array<int>"))
        done.append(
            over_ann.select(F.explode(chain_levels).alias("lvl"), "min_z")
            .select(
                sibling.alias("bucket_z"),
                lvl.cast("int").alias("pl"),
                F.lit(0).cast("long").alias("size"),
            )
        )

        # refine: only cells in still-overfull buckets stay active
        reassign = over_ann.select("bucket_z", "pl", "new_pl")
        active = (
            active.join(F.broadcast(reassign), ["bucket_z", "pl"])
            .select(
                "z",
                "c",
                F.col("new_pl").alias("pl"),
                _bucket_of(F.col("z"), F.col("new_pl")).alias("bucket_z"),
            )
            .localCheckpoint()
        )

    index = reduce(DataFrame.unionByName, done).cache()
    # count() fully materializes the cache, so the per-round intermediates
    # below can be dropped without triggering lazy recomputation
    if index.count() == 0:
        # empty input: the reference still seeds the root bucket
        # (Index.java:96-99)
        index = spark.createDataFrame(
            [(0, ROOT_PL, 0)], "bucket_z long, pl int, size long"
        )
    for df in cached:
        df.unpersist()
    return index


def index_build_py(
    cell_counts: list[tuple[int, int]],
    threshold: int = DEFAULT_THRESHOLD,
    max_depth: int = MAX_DEPTH,
) -> list[tuple[int, int, int]]:
    """Pure-Python reference implementation (independent oracle for tests):
    one-bit-at-a-time recursion exactly as ``Index.splitBucket``
    (``Index.java:183-230``). Input: [(z, count)]; output sorted
    [(bucket_z, pl, size)]."""
    cells_sorted = sorted(cell_counts)
    out: list[tuple[int, int, int]] = []

    def rec(lo: int, hi: int, bucket_z: int, pl: int) -> None:
        size = sum(c for _, c in cells_sorted[lo:hi])
        if size <= threshold or pl >= max_depth:
            out.append((bucket_z, pl, size))
            return
        bit = 1 << (63 - pl)
        right_key = bucket_z | bit
        import bisect

        mid = bisect.bisect_left(cells_sorted, (right_key, 0), lo, hi)
        rec(lo, mid, bucket_z, pl + 1)
        rec(mid, hi, right_key, pl + 1)

    if not cells_sorted:
        return [(0, ROOT_PL, 0)]
    rec(0, len(cells_sorted), 0, ROOT_PL)
    return sorted(out)


def index_inspect(index: DataFrame) -> DataFrame:
    """Render the index as the CLI ``index`` verb does (``Client.java:204-216``):
    bucket name string + size, ordered by key."""
    return index.select(
        prefix_render("bucket_z", F.col("pl")).alias("bucket_name"),
        "size",
    ).orderBy("bucket_name")


def floor_lookup(index: DataFrame, probe_z: int) -> DataFrame:
    """Greatest bucket key ≤ probe — ``HTable.getRowOrBefore`` semantics
    (``Index.java:115-122``): the bucket owning a z-value."""
    return (
        index.filter(F.col("bucket_z") <= probe_z)
        .orderBy(F.col("bucket_z").desc())
        .limit(1)
    )


def floor_lookup_batch(index: DataFrame, probes: DataFrame) -> DataFrame:
    """As-of join: for each probe z, the owning bucket. Broadcast the index
    (it is the small side) and pick the max qualifying key per probe —
    no shuffle of the probe side beyond the final aggregation."""
    idx = index.select(
        F.col("bucket_z").alias("_bz"), F.col("pl").alias("_pl"), F.col("size").alias("_size")
    )
    joined = probes.join(F.broadcast(idx), F.col("z") >= F.col("_bz"), "left")
    return (
        joined.groupBy("z")
        .agg(
            F.max_by("_bz", "_bz").alias("bucket_z"),
            F.max_by("_pl", "_bz").alias("pl"),
            F.max_by("_size", "_bz").alias("size"),
        )
    )
