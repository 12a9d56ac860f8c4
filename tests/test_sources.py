"""Interchange-format roundtrips: CSV/JSON at the pipeline edges must
preserve every row and type given an explicit schema."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from tiny_md_hbase_spark.sources import load_as, load_table, write_as

EVENTS_DDL = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_events_roundtrip(spark, sf_dir, fmt):
    tmp = tempfile.mkdtemp(prefix=f"src_{fmt}_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        write_as(ev, f"{tmp}/events", fmt)
        back = load_as(spark, f"{tmp}/events", fmt, EVENTS_DDL)
        assert back.schema.simpleString() == ev.schema.simpleString()
        a = sorted(map(tuple, ev.select("event_id", "ts", "user_id").collect()))
        b = sorted(map(tuple, back.select("event_id", "ts", "user_id").collect()))
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_unsupported_format_raises(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        write_as(ev, "/tmp/never", "avro")
    with pytest.raises(ValueError):
        load_as(spark, "/tmp/never", "orcish", EVENTS_DDL)


# --- JSONL corpus interchange ---------------------------------------------

def test_jsonl_corpus_roundtrip_lossless(spark, sf_dir):
    import tempfile

    from tiny_md_hbase_spark.sources import (
        load_table,
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="jsonl_") + "/corpus"
    write_jsonl_corpus(docs, d, n_shards=4)
    back = read_jsonl_corpus(spark, d).select(*docs.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    import glob

    assert len(glob.glob(f"{d}/part-*")) == 4


def test_jsonl_reader_failfast_on_malformed(spark, tmp_path):
    import pytest as _pytest

    from tiny_md_hbase_spark.sources import read_jsonl_corpus

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-00000.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
    )
    with _pytest.raises(Exception):
        read_jsonl_corpus(spark, str(p)).collect()
