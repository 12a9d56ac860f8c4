"""Write the committed media fixtures: tests/fixtures/media.parquet and
tests/fixtures/media_wav.parquet.

The multimodal operators exercise opaque-binary plumbing, so their
DuckDB oracles need the SAME bytes visible to both engines. This script
materializes ``synth_media(96)`` (deterministic, seed-pinned) plus 12
planted byte-identical duplicates (media_id + 1000 for media_id % 8 == 0
— the ``media_dedup`` worklist) as ONE pyarrow parquet file, committed
to git so the oracle has no runtime ordering dependency on the Spark
side writing it first.

media_wav.parquet carries REAL RIFF/WAVE payloads for the wav_decode
key: 48 deterministic 16-bit PCM files over varying sample rates,
channel counts and sample lengths, a third of them with LIST metadata
chunks (some odd-length, exercising word-alignment padding) inserted
before the data chunk so the canonical 44-byte header assumption would
be WRONG for them. The fixture stores, beside the payload, the
generator-known ``data_off`` (byte offset of the PCM frames) and
``n_samples`` — oracle-side keys only: the Spark kernel must DISCOVER
the offset by walking the chunk list, and the oracle decoding at the
stored offset is exactly what verifies the parse.

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


WAV_OUT = os.path.join(os.path.dirname(OUT), "media_wav.parquet")
PPM_OUT = os.path.join(os.path.dirname(OUT), "media_ppm.parquet")
PPM_STREAM_OUT = os.path.join(os.path.dirname(OUT), "media_ppm_stream.parquet")


def _wav_rows(n: int = 48, seed: int = 1117) -> list[tuple]:
    """Deterministic WAV fixture rows: (media_id, payload, sample_rate,
    channels, data_off, n_samples). Sample values come from an iterated
    LCG (full int16 range, sign changes guaranteed); every third row
    gets LIST metadata chunks before data — odd bodies for rows % 6 == 2
    so the word-alignment pad byte is load-bearing."""
    import random

    from tiny_md_hbase_spark.operators.multimodal import make_wav

    rng = random.Random(seed)
    rates = [8000, 16000, 22050, 44100]
    rows = []
    for i in range(n):
        channels = 1 + (i % 3 == 1)  # every third row is stereo
        frames = 32 + rng.randrange(120)
        n_samples = frames * channels
        samples = []
        x = seed * 2654435761 + i
        for _ in range(n_samples):
            x = (x * 1103515245 + 12345) % (1 << 31)
            samples.append((x % 65536) - 32768)
        pre = None
        if i % 3 == 2:
            body = bytes(rng.randrange(256) for _ in range(13 if i % 6 == 2 else 16))
            pre = [(b"LIST", body)]
        payload = make_wav(samples, rates[i % 4], channels, pre)
        data_off = payload.index(b"data", 12) + 8
        rows.append((i, payload, rates[i % 4], channels, data_off, n_samples))
    # one zero-sample WAV (valid container, empty data chunk): pins the
    # kernel's 0-stat row AND the oracle's LEFT-join/coalesce — an inner
    # join on per-sample aggregates would silently drop this media_id
    empty = make_wav([], 16000, 1)
    rows.append((n, empty, 16000, 1, empty.index(b"data", 12) + 8, 0))
    return rows


def _rgb(rng, n_pixels: int) -> bytes:
    return bytes(rng.randrange(256) for _ in range(n_pixels * 3))


def _ppm_rows(n: int = 46, seed: int = 2311) -> list[tuple]:
    """Deterministic single-image PPM fixture rows: (media_id, payload,
    width, height, data_off). Every third row carries digit-bearing
    header comments between tokens and rows cycle through the netpbm
    whitespace set, so a decoder that assumes the canonical
    ``P6\\n<w> <h>\\n255\\n`` byte layout (or grabs the first digits it
    sees) computes a wrong raster offset. data_off is ORACLE-side only:
    the Spark kernel must DISCOVER it by tokenizing the header."""
    import random

    from tiny_md_hbase_spark.operators.multimodal import make_ppm

    rng = random.Random(seed)
    seps = [b"\n", b" ", b"\t", b"\r\n"]
    rows = []
    for i in range(n):
        w = 3 + rng.randrange(28)
        h = 2 + rng.randrange(23)
        comments = None
        comment_end = b"\n"
        if i % 3 == 2:
            # digits in comments are load-bearing: a naive digit grab
            # would read 9999 as the width
            comments = [b" width 9999", b"h=1234 trailer"][: 1 + (i % 2)]
            if i % 6 == 5:
                # CR-terminated comments are legal netpbm: a parser that
                # scans only for \n swallows the tokens after the comment
                comment_end = b"\r"
        payload = make_ppm(
            w, h, _rgb(rng, w * h), comments, seps[i % 4], comment_end
        )
        rows.append((i, payload, w, h, len(payload) - w * h * 3))
    # degenerates: 1x1 (smallest real raster), 0x5 and 5x0 (legal P6
    # headers, empty raster — pin the kernel's 0-stat row AND the
    # oracle's empty-aggregate coalesce)
    for mid, (w, h) in zip((n, n + 1, n + 2), ((1, 1), (0, 5), (5, 0))):
        payload = make_ppm(w, h, _rgb(rng, w * h))
        rows.append((mid, payload, w, h, len(payload) - w * h * 3))
    return rows


def _ppm_stream_rows(n: int = 8, seed: int = 3391) -> list[tuple]:
    """Deterministic concatenated-P6 stream fixture rows: (media_id,
    payload, n_frames, frame_offs, frame_lens, frame_ws, frame_hs).
    Frames vary in size within one stream (the walk must re-tokenize
    every header), alternating frames carry comments, one stream is a
    single frame, and one stream holds a zero-pixel frame mid-stream
    (the walk must continue past an empty raster). The frame offset /
    length / dims lists are ORACLE-side only."""
    import random

    from tiny_md_hbase_spark.operators.multimodal import make_ppm

    rng = random.Random(seed)
    seps = [b"\n", b" ", b"\t", b"\r\n"]
    rows = []
    for i in range(n):
        n_frames = 1 if i == 3 else 3 + rng.randrange(4)
        parts, offs, lens, ws_, hs = [], [], [], [], []
        pos = 0
        for f in range(n_frames):
            if i == 5 and f == 1:
                w, h = 0, 3  # zero-pixel frame mid-stream
            else:
                w, h = 2 + rng.randrange(8), 2 + rng.randrange(6)
            comments = [b"frame %d dims 777" % f] if f % 2 == 1 else None
            frame = make_ppm(w, h, _rgb(rng, w * h), comments, seps[f % 4])
            parts.append(frame)
            offs.append(pos)
            lens.append(len(frame))
            ws_.append(w)
            hs.append(h)
            pos += len(frame)
        rows.append((i, b"".join(parts), n_frames, offs, lens, ws_, hs))
    return rows


def write_ppm_fixtures() -> None:
    rows = _ppm_rows()
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "payload": pa.array(cols[1], pa.binary()),
            "width": pa.array(cols[2], pa.int32()),
            "height": pa.array(cols[3], pa.int32()),
            "data_off": pa.array(cols[4], pa.int32()),
        }
    )
    pq.write_table(table, PPM_OUT, compression="zstd")
    print(f"wrote {PPM_OUT}: {table.num_rows} rows")

    srows = _ppm_stream_rows()
    scols = list(zip(*srows))
    stable = pa.table(
        {
            "media_id": pa.array(scols[0], pa.int64()),
            "payload": pa.array(scols[1], pa.binary()),
            "n_frames": pa.array(scols[2], pa.int32()),
            "frame_offs": pa.array(scols[3], pa.list_(pa.int32())),
            "frame_lens": pa.array(scols[4], pa.list_(pa.int32())),
            "frame_ws": pa.array(scols[5], pa.list_(pa.int32())),
            "frame_hs": pa.array(scols[6], pa.list_(pa.int32())),
        }
    )
    pq.write_table(stable, PPM_STREAM_OUT, compression="zstd")
    print(f"wrote {PPM_STREAM_OUT}: {stable.num_rows} rows")


def write_wav_fixture() -> None:
    rows = _wav_rows()
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "payload": pa.array(cols[1], pa.binary()),
            "sample_rate": pa.array(cols[2], pa.int32()),
            "channels": pa.array(cols[3], pa.int32()),
            "data_off": pa.array(cols[4], pa.int32()),
            "n_samples": pa.array(cols[5], pa.int64()),
        }
    )
    pq.write_table(table, WAV_OUT, compression="zstd")
    print(f"wrote {WAV_OUT}: {table.num_rows} rows")


def main() -> None:
    write_wav_fixture()
    write_ppm_fixtures()
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
