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
