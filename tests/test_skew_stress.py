"""Skew-stress fixtures (VERDICT r05 stretch item): one source / one
score class holding 90% of the corpus mass — the documented worst case
for source_cap's sharded top-N and quality_gate's boundary-class window.
Values are checked against the naive single-window forms; plan contracts
assert the skew-safe shape survives on the skewed input (plans are
data-independent, but these pin the contract next to the fixture that
motivates it)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tiny_md_hbase_spark import plans as P
from tiny_md_hbase_spark.operators import text as T

N_DOCS = 2000
SKEW_FRAC = 0.9  # 90% of rows land in one source / one score class


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """documents-shaped fixture: ids 0..N; rows with id % 10 != 0 (90%)
    share source='megacrawl' AND identical text (one quality-score
    class); the 10% tail spreads over 5 sources with varied text."""
    hot_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(N_DOCS):
        if i % 10 != 0:
            rows.append((i, hot_text, "en", "megacrawl", 40 + i % 7))
        else:
            rows.append(
                (
                    i,
                    f"unique document {i} " + "word " * (i % 13),
                    "en",
                    f"site{i % 5}",
                    20 + i % 50,
                )
            )
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).localCheckpoint()


def test_source_cap_exact_on_dominant_source(skewed_docs):
    """The two-phase sharded top-N must return exactly the naive
    single-window survivors even when one source is 90% of the corpus."""
    cap = 10
    naive_w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    naive = {
        (r.doc_id, r.source, r.n_chars, r.rn)
        for r in skewed_docs.select(
            "doc_id", "source", "n_chars", F.row_number().over(naive_w).alias("rn")
        )
        .filter(F.col("rn") <= cap)
        .collect()
    }
    got = {
        (r.doc_id, r.source, r.n_chars, r.rank)
        for r in T.source_cap(skewed_docs, cap=cap).collect()
    }
    assert got == naive
    # the dominant source is capped like any other
    per_source = dict(
        (r.source, r["count"])
        for r in T.source_cap(skewed_docs, cap=cap)
        .groupBy("source")
        .count()
        .collect()
    )
    assert per_source["megacrawl"] == cap


def test_source_cap_local_window_keys_include_shard(skewed_docs):
    """Phase-1 window must partition on (source, shard) — a window keyed
    on source alone would put 90% of the fixture in ONE task."""
    q = T.source_cap(skewed_docs, cap=10, n_shards=8)
    plan = P.explain_str(q, "formatted")
    # two Window nodes: the sharded local pass and the bounded global pass
    assert plan.count("Window") >= 2
    # the local pass keys on the shard expression (xxhash64 of doc_id)
    assert "xxhash64" in plan


@pytest.mark.parametrize("frac", [0.3, 0.5, 0.95])
def test_quality_gate_boundary_class_holds_90pct_mass(skewed_docs, frac):
    """With 90% of documents in ONE score class the keep-fraction cut
    lands INSIDE that class (its per-class doc_id ranking is the
    documented worst-case window); selection must still equal the naive
    global row_number form exactly."""
    naive_w = Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    scored = (
        T.quality_score(skewed_docs)
        .select("doc_id", "quality")
        .filter(F.col("quality").isNotNull())
    )
    n = scored.count()
    import math

    k = math.ceil(float(n) * frac)
    naive = {
        r.doc_id
        for r in scored.select(
            "doc_id", F.row_number().over(naive_w).alias("rn")
        )
        .filter(F.col("rn") <= k)
        .collect()
    }
    got = sorted(r.doc_id for r in T.quality_gate(skewed_docs, frac).collect())
    assert len(got) == len(set(got)) == k
    assert set(got) == naive
    # the fixture really does concentrate mass in one class, and the cut
    # really does land inside it (otherwise this test proves nothing)
    hist = scored.groupBy("quality").count().collect()
    top_c = max(r["count"] for r in hist)
    assert top_c >= SKEW_FRAC * n * 0.95


# --- LSH giant-family guards (VERDICT r09 #1) -----------------------------
# A family of g identical (or near-identical) documents collides in every
# MinHash band: uncollapsed and uncapped, the band self-join materializes
# O(g²·bands) candidate rows. Two guards keep the candidate stage linear:
# _collapse_exact (identical texts enter banding as ONE representative;
# pairs are reconstructed exactly afterwards) and _cap_band_buckets (a
# residual bucket wider than the cap — a giant NEAR-dup family — is
# skipped, the documented recall tradeoff).

N_FAM = 120  # identical-text family size (pairs = C(120,2) = 7140)
N_NEAR = 300  # near-identical family size, > the default cap of 256


@pytest.fixture(scope="module")
def giant_family_docs(spark):
    """ids 0..N_FAM-1: IDENTICAL text (one exact-dup family); ids
    1000/1001: a near-dup pair (one token changed); ids 2000..2019:
    distinct filler."""
    fam_text = "license header the same boilerplate paragraph repeated in every file"
    rows = [(i, fam_text) for i in range(N_FAM)]
    near_a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "mu nu xi omicron pi rho sigma tau upsilon phi")
    rows.append((1000, near_a))  # 20 tokens; one changed -> J = 17/19
    rows.append((1001, near_a.rsplit(" ", 1)[0] + " chi"))
    rows += [(2000 + i, f"totally unrelated document number {i} with words {i * 7}")
             for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()


@pytest.fixture(scope="module")
def near_family_docs(spark):
    """ids 0..N_NEAR-1: texts DISTINCT as strings (trailing-whitespace
    variants) but identical token sequences — identical shingle sets,
    identical signatures, so all N_NEAR land in ONE bucket per band and
    the exact-text collapse does NOT merge them. Ids 1000/1001: a small
    near-dup pair that must survive the cap."""
    base = "shared legal disclaimer text that differs only by invisible whitespace"
    rows = [(i, base + " " * (i + 1)) for i in range(N_NEAR)]
    near_a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "mu nu xi omicron pi rho sigma tau upsilon phi")
    rows.append((1000, near_a))  # 20 tokens; one changed -> J = 17/19
    rows.append((1001, near_a.rsplit(" ", 1)[0] + " chi"))
    return spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()


def test_minhash_identical_family_collapsed_not_capped(giant_family_docs):
    """The exact-dup collapse must route a family LARGER than the bucket
    cap around the band join entirely: all C(g,2) pairs appear at
    jaccard 1.0 even under a cap far below g, because the family enters
    banding as one representative."""
    from tiny_md_hbase_spark.operators.dedup import dedup_minhash

    out = dedup_minhash(giant_family_docs, max_bucket_width=8).cache()
    fam = out.filter((F.col("doc_a") < N_FAM) & (F.col("doc_b") < N_FAM))
    assert fam.count() == N_FAM * (N_FAM - 1) // 2
    assert fam.filter(F.col("jaccard") != 1.0).count() == 0
    # the unrelated near-dup pair is still found alongside the family
    near = out.filter((F.col("doc_a") == 1000) & (F.col("doc_b") == 1001))
    assert near.count() == 1 and near.collect()[0].jaccard >= 0.8
    out.unpersist()


def test_minhash_candidate_stage_bounded_by_collapse(giant_family_docs):
    """Direct fan-out measurement on the exact tables the operator
    joins: uncollapsed banding of the identical family yields
    O(g²·bands) candidates; after _collapse_exact the same corpus
    yields only the representative pairs."""
    from pyspark.sql import functions as SF

    from tiny_md_hbase_spark.operators.dedup import (
        _collapse_exact,
        _xxhash_banded,
    )

    def n_cand(docs):
        _, banded = _xxhash_banded(docs, 32, 8, 3)
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(b, ["band", "bhash"])
            .filter(SF.col("a.doc_id") < SF.col("b.doc_id"))
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    uncollapsed = n_cand(giant_family_docs)
    _, reps = _collapse_exact(giant_family_docs, SF.xxhash64("text"))
    collapsed = n_cand(reps)
    assert uncollapsed >= N_FAM * (N_FAM - 1) // 2  # the quadratic blowup
    assert collapsed <= 5  # reps: 1 family rep + near pair + filler


def test_minhash_near_family_bucket_capped(near_family_docs):
    """A NEAR-identical family (distinct strings, identical shingle
    sets — the collapse cannot merge it) wider than max_bucket_width is
    skipped by the cap: no pairs from the family, while the small
    near-dup pair elsewhere is still found. Uncapped, the same corpus
    emits all C(g,2) family pairs — the fan-out the cap bounds."""
    from tiny_md_hbase_spark.operators.dedup import dedup_minhash

    capped = dedup_minhash(near_family_docs).cache()  # default cap 256 < 300
    fam = capped.filter((F.col("doc_a") < N_NEAR) & (F.col("doc_b") < N_NEAR))
    assert fam.count() == 0
    near = capped.filter((F.col("doc_a") == 1000) & (F.col("doc_b") == 1001))
    assert near.count() == 1
    capped.unpersist()

    uncapped = dedup_minhash(near_family_docs, max_bucket_width=None)
    fam_u = uncapped.filter((F.col("doc_a") < N_NEAR) & (F.col("doc_b") < N_NEAR))
    assert fam_u.count() == N_NEAR * (N_NEAR - 1) // 2


def test_minhash_portable_mirrors_collapse_and_cap(near_family_docs):
    """The portable (oracle) twin applies the same two guards: capped it
    drops the wide family, uncapped it emits all its pairs."""
    from tiny_md_hbase_spark.operators.dedup import dedup_minhash_portable

    capped = dedup_minhash_portable(near_family_docs)
    assert (
        capped.filter((F.col("doc_a") < N_NEAR) & (F.col("doc_b") < N_NEAR)).count()
        == 0
    )
    uncapped = dedup_minhash_portable(near_family_docs, max_bucket_width=None)
    assert (
        uncapped.filter(
            (F.col("doc_a") < N_NEAR) & (F.col("doc_b") < N_NEAR)
        ).count()
        == N_NEAR * (N_NEAR - 1) // 2
    )


def test_embedding_lsh_collapse_and_cap(spark):
    """dedup_embedding_lsh: identical vectors collapse past the cap
    (all pairs at cos 1.0); a near-identical DISTINCT family wider than
    the cap is skipped; uncapped it is fully paired."""
    from tiny_md_hbase_spark.operators.dedup import dedup_embedding_lsh

    dim, n_id, n_near = 64, 25, 30
    base = [((i * 37 + 11) % 97 - 48) / 7.0 for i in range(dim)]
    rows = [(i, [float(x) for x in base]) for i in range(n_id)]  # identical
    # near family: distinct tiny last-component perturbations (cos ~ 1,
    # sign pattern unchanged — projections are far from every hyperplane)
    rows += [
        (1000 + j, [float(x) for x in base[:-1]] + [base[-1] + 1e-9 * (j + 1)])
        for j in range(n_near)
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = dedup_embedding_lsh(embs, max_bucket_width=8).cache()
    fam = capped.filter((F.col("vec_a") < n_id) & (F.col("vec_b") < n_id))
    assert fam.count() == n_id * (n_id - 1) // 2
    assert fam.filter(F.col("cos_sim") != 1.0).count() == 0
    near = capped.filter((F.col("vec_a") >= 1000) & (F.col("vec_b") >= 1000))
    assert near.count() == 0  # 30 distinct near-dups > cap 8: skipped
    capped.unpersist()

    uncapped = dedup_embedding_lsh(embs, max_bucket_width=None)
    near_u = uncapped.filter((F.col("vec_a") >= 1000) & (F.col("vec_b") >= 1000))
    assert near_u.count() == n_near * (n_near - 1) // 2


def test_dedup_ttl_hot_key_bound_and_exactness(spark):
    """r14 TTL hot-key guard under the skew fixture's regime: ONE
    content supplies 90% of arrivals spread over renewal-chain ticks.
    The structural bound must hold (no (h, epoch) window partition
    above ttl+1 rows post tick-reduce) and the guarded operator must
    equal the plain global-lag rule — the committed in-suite form of
    scripts/scale_ttl.py's skew probe."""
    from tiny_md_hbase_spark.operators import dedup as D

    ttl = 50
    rows = []
    for i in range(N_DOCS):
        if i % 10 != 0:
            rows.append(
                (i, "one hot boilerplate string", "en", "s", 26, i * 3)
            )
        else:
            rows.append((i, f"fresh body {i}", "en", "s", 13, i * 3 + 1))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long, arrival long",
    ).localCheckpoint()
    got = sorted(
        (r.doc_id, r.arrival) for r in D.dedup_ttl(df, ttl).collect()
    )
    w = Window.partitionBy("h").orderBy("arrival", "doc_id")
    ref = (
        df.withColumn("h", D._content_fp("text"))
        .withColumn("_prev", F.lag("arrival").over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("arrival") - F.col("_prev") > ttl)
        )
    )
    assert got == sorted((r.doc_id, r.arrival) for r in ref.collect())
    reduced = (
        df.withColumn("h", D._content_fp("text"))
        .groupBy("h", F.col("arrival").alias("_arr"))
        .count()
    )
    mx = (
        reduced.groupBy("h", D._ttl_floor_epoch("_arr", ttl + 1).alias("_ep"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= ttl + 1


def test_quality_gate_by_source_dominant_class(skewed_docs):
    """Per-source gate under the skew fixture: megacrawl's cut lands
    inside its single dominant score class, every small source gets its
    own independent cut, and selection equals the naive per-source
    row_number form exactly."""
    import math

    frac = 0.4
    got = T.quality_gate_by_source(skewed_docs, frac)
    naive_w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    scored = (
        T.quality_score(skewed_docs)
        .select("doc_id", "quality")
        .filter(F.col("quality").isNotNull())
        .join(skewed_docs.select("doc_id", "source"), "doc_id")
    )
    counts = {
        r.source: r["count"]
        for r in scored.groupBy("source").count().collect()
    }
    naive = {
        r.doc_id
        for r in scored.select(
            "doc_id", "source",
            F.row_number().over(naive_w).alias("rn"),
        ).collect()
        if r.rn <= math.ceil(counts[r.source] * frac)
    }
    got_ids = sorted(r.doc_id for r in got.collect())
    assert got_ids == sorted(naive)
    # every source independently holds its own fraction
    per_source = {
        r.source: r["count"]
        for r in got.groupBy("source").count().collect()
    }
    for src, n in counts.items():
        assert per_source.get(src, 0) == math.ceil(n * frac), src
