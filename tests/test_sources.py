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


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet"])
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
