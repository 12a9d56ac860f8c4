"""Driver-contract consistency guards (cheap, no query execution)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_rows_only_set_is_exactly_the_documented_one():
    q, o = entry.queries(), entry.oracle_sql()
    # r08: multimodal_features/media_dedup/frame_sample left this set —
    # the committed media.parquet fixture gives DuckDB the same bytes,
    # so the kernels' observables are now value-oracled
    assert sorted(set(q) - set(o)) == [
        "compact_layout",
        "dedup_minhash",
        "dedup_simhash",
        "embedding_knn_ivf",
        "table_lifecycle",
    ]


def test_entry_runs_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].cnt >= 0
