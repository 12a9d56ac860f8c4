"""Driver-contract consistency guards (cheap, no query execution)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_rows_only_set_is_exactly_the_documented_one():
    q, o = entry.queries(), entry.oracle_sql()
    # r08: multimodal_features/media_dedup/frame_sample left this set
    # (committed media.parquet fixture gives DuckDB the same bytes), and
    # table_lifecycle/compact_layout left it (post-operation observable
    # state — index buckets, row totals, z extents — is value-oracled;
    # layout spec rows are pinned invariants). The 3 remaining are JVM-
    # hash forms whose portable twins / equivalence oracles are green.
    assert sorted(set(q) - set(o)) == [
        "dedup_minhash",
        "dedup_simhash",
        "embedding_knn_ivf",
    ]


def test_entry_runs_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].cnt >= 0
