"""spatial_histogram and embedding_knn_batch tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import similarity as S
from tiny_md_hbase_spark.operators import spatial
from tiny_md_hbase_spark.sources import load_table, points


def test_spatial_histogram_totals_and_bounds(spark, sf_dir):
    pts = points(spark, sf_dir)
    hist = spatial.spatial_histogram(pts, cell_bits=4)
    rows = hist.collect()
    assert sum(r.n_points for r in rows) == pts.count()
    assert all(0 <= r.grid_x < 256 and 0 <= r.grid_y < 256 for r in rows)
    # a specific cell equals the explicit rectangle count
    gx, gy = rows[0].grid_x, rows[0].grid_y
    rect = spatial.range_count(
        pts, (gx * 16, gx * 16 + 15), (gy * 16, gy * 16 + 15)
    ).collect()[0].cnt
    assert rect == rows[0].n_points


def test_embedding_knn_batch_matches_single(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    batch = S.embedding_knn_batch(embs, queries, k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos_sim))
    assert set(by_q) == {1, 2}
    for qid in (1, 2):
        single = S.embedding_knn(embs, qid, 10).collect()
        got = [v for _, v, _ in sorted(by_q[qid])]
        assert got == [r.vec_id for r in single]
        # ranks are 1..k dense
        assert sorted(r for r, _, _ in by_q[qid]) == list(range(1, 11))
        # the query itself is rank 1 with sim 1.0
        assert sorted(by_q[qid])[0][1] == qid
        assert sorted(by_q[qid])[0][2] == pytest.approx(1.0)


def test_embedding_knn_batch_guards_corpus_sized_queries(spark, sf_dir):
    """The broadcast-query design is contracted to |Q| << corpus; a
    corpus-sized queries DF must raise a clear error naming the fix,
    not collect itself onto the driver. The guard's probe is
    limit(max+1), so the failure costs O(max_queries) rows however
    large the input is."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    with pytest.raises(ValueError, match="max_queries"):
        S.embedding_knn_batch(embs, queries, k=5, max_queries=100)
    # raising the cap explicitly re-enables the same input
    assert (
        S.embedding_knn_batch(embs, queries.limit(3), k=5, max_queries=100)
        .count()
        == 15
    )


def test_embedding_knn_batch_chunked_equals_single(spark, sf_dir):
    """chunk_queries=True past max_queries returns EXACTLY the
    single-pass result: each query's top-k is computed fully inside its
    own chunk's corpus scan, so the union over disjoint query_id chunks
    is the same relation (r10 verdict #8). The default (no opt-in)
    stays a loud refusal that now names chunk_queries."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    single = sorted(
        map(tuple, S.embedding_knn_batch(embs, queries, k=7).collect())
    )
    chunked = sorted(
        map(
            tuple,
            S.embedding_knn_batch(
                embs, queries, k=7, max_queries=3, chunk_queries=True
            ).collect(),
        )
    )
    assert chunked == single and len(single) == 70
    with pytest.raises(ValueError, match="chunk_queries"):
        S.embedding_knn_batch(embs, queries, k=7, max_queries=3)


def test_embedding_ops_reject_degenerate_vectors_loudly(spark, sf_dir):
    """A NULL (or wrong-length) embedding must fail FAST with a
    row-identifying message — without the validate_vectors guard it
    surfaces minutes into an Arrow kernel as numpy's opaque
    'inhomogeneous shape' ValueError (observed live on the r10 poisoned
    probe), or as a silently-NULL JVM fold. Zero vectors stay allowed
    where their semantics are pinned (dedup_embedding_lsh's exact-dup
    convention)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from tiny_md_hbase_spark.operators import dedup as D

    embs = load_table(spark, sf_dir, "embeddings")
    poisoned = embs.unionByName(
        spark.createDataFrame(
            [(900001, None, 0)], embs.schema
        )
    )
    ragged = embs.unionByName(
        spark.createDataFrame(
            [(900002, [1.0, 2.0], 0)],
            "vec_id long, embedding array<float>, label int",
        )
    )
    for bad, pat in ((poisoned, "900001.*NULL"), (ragged, "900002.*length 2")):
        with _pytest.raises(
            (SparkRuntimeException, Py4JJavaError), match=pat
        ):
            S.embedding_knn_lsh(bad, query_vec_id=1, k=5).collect()
    with _pytest.raises((SparkRuntimeException, Py4JJavaError), match="NULL"):
        D.dedup_embedding_lsh(poisoned).collect()
    with _pytest.raises((SparkRuntimeException, Py4JJavaError), match="NULL"):
        S.embedding_knn(poisoned, query_vec_id=1, k=5).collect()
    with _pytest.raises(ValueError, match="query_id=7.*NULL"):
        S.embedding_knn_batch(
            embs,
            spark.createDataFrame(
                [(7, None)], "query_id long, qv array<float>"
            ),
            k=3,
        )
