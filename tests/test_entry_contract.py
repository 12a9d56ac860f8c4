"""Driver-contract consistency guards (cheap, no query execution)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_rows_only_set_is_exactly_the_documented_one():
    q, o = entry.queries(), entry.oracle_sql()
    # r09: the rows-only set is EMPTY. The last three JVM-hash keys
    # (dedup_minhash, dedup_simhash, embedding_knn_ivf) were re-keyed
    # onto the portable hash families at second parameter points; the
    # Spark-internal xxhash64/k-means forms remain non-registry
    # production functions pinned by dedup_minhash_vs_exact,
    # dedup_simhash_band_exact, embedding_knn_ivf_kmeans_full and the
    # planted-pair / recall tests.
    assert sorted(set(q) - set(o)) == []


def test_entry_runs_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].cnt >= 0
