"""Write the committed media fixture: tests/fixtures/media.parquet.

The multimodal operators exercise opaque-binary plumbing, so their
DuckDB oracles need the SAME bytes visible to both engines. This script
materializes ``synth_media(96)`` (deterministic, seed-pinned) plus 12
planted byte-identical duplicates (media_id + 1000 for media_id % 8 == 0
— the ``media_dedup`` worklist) as ONE pyarrow parquet file, committed
to git so the oracle has no runtime ordering dependency on the Spark
side writing it first.

Regenerate (idempotent, byte-stable) with:
    PYTHONPATH=/root/repo python scripts/make_media_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from tiny_md_hbase_spark.operators.multimodal import _synth_media_rows

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "media.parquet",
)


def main() -> None:
    rows = _synth_media_rows(96)
    rows += [
        (mid + 1000, kind, payload, w, h, dur, fmt)
        for (mid, kind, payload, w, h, dur, fmt) in rows
        if mid % 8 == 0
    ]
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1], pa.string()),
            "payload": pa.array(cols[2], pa.binary()),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "duration_ms": pa.array(cols[5], pa.int32()),
            "format": pa.array(cols[6], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    # fixed creation metadata for byte-stable regeneration
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
