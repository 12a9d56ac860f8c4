"""The REAL image codec path: binary PPM (P6) decode, byte-level
nearest-neighbor resize, and concatenated-stream frame demux — the
image/video twins of the WAV battery in test_write_streaming.py.

Every behavior the DuckDB oracles rely on is pinned here first:
header tokenization (comments may contain digits; whitespace varies),
the exact-integer resize grid, the canonical re-encode bytes, the
stream walk's discovered offsets, and the committed fixtures'
byte-identity with their generator.
"""

from __future__ import annotations

import os

import pytest

from tiny_md_hbase_spark.operators import multimodal as MM
from tiny_md_hbase_spark.operators.multimodal import (
    _parse_ppm,
    _parse_ppm_at,
    _resize_target,
    make_ppm,
)

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
_PPM_FIXTURE = os.path.join(_FIX, "media_ppm.parquet")
_PPM_STREAM_FIXTURE = os.path.join(_FIX, "media_ppm_stream.parquet")


def _raster(w: int, h: int, seed: int = 7) -> bytes:
    x = seed
    out = bytearray()
    for _ in range(w * h * 3):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(x % 256)
    return bytes(out)


def test_make_ppm_parse_roundtrip():
    """Encode → parse is the identity on (w, h, raster) across comment
    placements (digit-bearing!) and the whole netpbm whitespace set."""
    rgb = _raster(5, 4)
    for comments in (None, [b" width 9999"], [b"a", b"b 123", b"c"]):
        for ws in (b"\n", b" ", b"\t", b"\r\n", b"\x0c"):
            payload = make_ppm(5, 4, rgb, comments, ws)
            assert _parse_ppm(payload) == (5, 4, rgb)


def test_make_ppm_rejects_bad_raster_len():
    with pytest.raises(ValueError, match="raster is"):
        make_ppm(4, 4, b"\x00" * 10)


def test_parse_ppm_rejects_malformed():
    """Every structural failure raises with the reason — never a silent
    wrong raster offset."""
    good = make_ppm(3, 2, _raster(3, 2))
    cases = {
        "bad magic": b"P5" + good[2:],
        "truncated raster": good[:-4],
        "no digits": b"P6\n# only a comment\n",
        "unterminated comment": b"P6\n#never ends",
        "ends at maxval": b"P6\n3 2\n255",
    }
    for label, payload in cases.items():
        with pytest.raises(ValueError):
            _parse_ppm(payload)
    with pytest.raises(ValueError, match="maxval=255"):
        _parse_ppm(make_ppm(3, 2, _raster(3, 2)).replace(b"255", b"65535", 1))
    with pytest.raises(ValueError, match="trailing"):
        _parse_ppm(good + b"\x00")


def test_parse_ppm_comment_digits_not_dims():
    """A parser that grabbed the first digits it saw would read the
    comment's 9999 — tokenization must skip comments BETWEEN tokens."""
    payload = make_ppm(4, 3, _raster(4, 3), [b" width 9999", b"h=1234"])
    assert _parse_ppm(payload)[:2] == (4, 3)


def test_parse_ppm_cr_terminated_comment():
    """netpbm comments end at CR OR LF: a parser scanning only for \\n
    would swallow the tokens after a CR-terminated comment and silently
    mis-parse the dimensions (reading maxval as width)."""
    rgb = _raster(12, 7)
    payload = make_ppm(12, 7, rgb, [b" c"], b"\n", comment_end=b"\r")
    assert payload.startswith(b"P6\n# c\r12")  # CR, no LF, then width
    assert _parse_ppm(payload) == (12, 7, rgb)
    # and the hand-built spec example from the review
    manual = b"P6\n# c\r12 7\n255\n" + rgb
    assert _parse_ppm(manual) == (12, 7, rgb)


def test_make_ppm_rejects_bad_args():
    with pytest.raises(ValueError, match="at most 3"):
        make_ppm(1, 1, _raster(1, 1), [b"a", b"b", b"c", b"d"])
    with pytest.raises(ValueError, match="LF or CR"):
        make_ppm(1, 1, _raster(1, 1), [b"a"], comment_end=b";")


def test_resize_target_exact_integer_rules():
    # no upscale; aspect preserved via the longer side; never 0 for
    # a nonzero source side; zero-area sources go to 0x0
    assert _resize_target(8, 6, 12) == (8, 6)
    assert _resize_target(24, 12, 12) == (12, 6)
    assert _resize_target(100, 1, 12) == (12, 1)
    assert _resize_target(1, 100, 12) == (1, 12)
    assert _resize_target(0, 5, 12) == (0, 0)
    assert _resize_target(5, 0, 12) == (0, 0)


def test_ppm_decode_features_match_python(spark):
    """Kernel features equal a direct python decode of the fixture at
    its stored raster offset — including the commented / odd-whitespace
    headers whose offset is NOT the canonical len('P6\\nW H\\n255\\n')."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT media_id, payload, width, height, data_off "
        f"FROM read_parquet('{_PPM_FIXTURE}') ORDER BY media_id"
    ).fetchall()
    assert any(b"#" in bytes(r[1]) for r in rows)  # commented headers present
    assert any(r[2] * r[3] == 0 for r in rows)  # empty-raster degenerates
    expect = {}
    for mid, payload, w, h, off in rows:
        a = np.frombuffer(bytes(payload)[off:], dtype=np.uint8).astype(np.int64)
        assert a.size == w * h * 3
        expect[mid] = (
            w, h, w * h,
            int(a[0::3].sum()), int(a[1::3].sum()), int(a[2::3].sum()),
            int(a.min()) if a.size else 0,
            int(a.max()) if a.size else 0,
            int(a.reshape(h, w * 3)[0::2].sum()) if a.size else 0,
        )
    got = {
        r.media_id: (
            r.width, r.height, r.n_pixels, r.sum_r, r.sum_g, r.sum_b,
            r.min_byte, r.max_byte, r.even_row_luma,
        )
        for r in MM.ppm_decode(spark.read.parquet(_PPM_FIXTURE)).collect()
    }
    assert got == expect


def test_ppm_decode_names_bad_row(spark):
    rows = [
        (1, bytearray(make_ppm(2, 2, _raster(2, 2)))),
        (2, bytearray(b"P6\n2 2\n255\n\x00\x01")),  # truncated raster
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    with pytest.raises(Exception, match="media_id=2"):
        MM.ppm_decode(df).collect()


def test_ppm_resize_nearest_neighbor_exact(spark):
    """The resized payload equals a manual nearest-neighbor resample +
    canonical re-encode: 6x4 at max_side=2 targets 2x1 (tw = 6*2//6 = 2,
    th = max(1, 4*2//6) = 1); the grid sx = tx*6//2, sy = ty*4//1 picks
    source pixels (0,0) and (3,0)."""
    rgb = _raster(6, 4)
    rows = [(7, bytearray(make_ppm(6, 4, rgb, [b"noise 42"], b"\t")))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in MM.ppm_resize(df, max_side=2).collect()}
    r = out[7]
    assert (r.src_w, r.src_h, r.out_w, r.out_h) == (6, 4, 2, 1)
    # manual grid: tw=2, th=1 → sx in (0*6//2, 1*6//2) = (0, 3); sy = 0
    px = lambda x, y: rgb[(y * 6 + x) * 3 : (y * 6 + x) * 3 + 3]
    assert bytes(r.payload) == b"P6\n2 1\n255\n" + px(0, 0) + px(3, 0)


def test_ppm_resize_identity_and_degenerate(spark):
    """Sources at/below max_side re-encode canonically with the same
    raster; zero-area sources become the canonical 0x0 container."""
    rgb = _raster(3, 2)
    rows = [
        (1, bytearray(make_ppm(3, 2, rgb, [b"c"], b" "))),
        (2, bytearray(make_ppm(0, 5, b""))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in MM.ppm_resize(df, max_side=12).collect()}
    assert bytes(out[1].payload) == b"P6\n3 2\n255\n" + rgb
    assert (out[2].out_w, out[2].out_h) == (0, 0)
    assert bytes(out[2].payload) == b"P6\n0 0\n255\n"


def test_ppm_stream_frames_walk(spark):
    """The demux's discovered (offset, dims) agree with the fixture's
    generator-known lists; every=1 yields all frames, every=2 the even
    ones; the zero-pixel mid-stream frame doesn't derail the walk."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT media_id, payload, n_frames, frame_offs, frame_lens, "
        f"frame_ws, frame_hs FROM read_parquet('{_PPM_STREAM_FIXTURE}') "
        f"ORDER BY media_id"
    ).fetchall()
    assert any(0 in list(r[5]) for r in rows)  # zero-pixel frame present
    df = spark.read.parquet(_PPM_STREAM_FIXTURE)
    all_frames = {
        (r.media_id, r.frame_idx): (r.frame_w, r.frame_h, bytes(r.frame_payload))
        for r in MM.ppm_stream_frames(df, every=1).collect()
    }
    assert len(all_frames) == sum(r[2] for r in rows)
    for mid, payload, n, offs, lens, ws_, hs_ in rows:
        buf = bytes(payload)
        for i in range(n):
            got = all_frames[(mid, i)]
            assert got == (ws_[i], hs_[i], buf[offs[i] : offs[i] + lens[i]])
    sampled = {
        (r.media_id, r.frame_idx)
        for r in MM.ppm_stream_frames(df, every=2).collect()
    }
    assert sampled == {k for k in all_frames if k[1] % 2 == 0}


def test_ppm_stream_names_bad_frame(spark):
    """A corrupt SECOND frame errors with the media_id, the frame index
    and the byte position — the walk's error is position-identifying."""
    f0 = make_ppm(2, 2, _raster(2, 2))
    rows = [(9, bytearray(f0 + b"JUNK"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    with pytest.raises(Exception, match=r"media_id=9.*frame 1"):
        MM.ppm_stream_frames(df, every=1).collect()
    with pytest.raises(ValueError, match="every"):
        MM.ppm_stream_frames(df, every=0)


def test_ppm_fixtures_match_generator():
    """Both committed PPM fixtures are byte-identical to what the
    generator would write today — drift vs the oracles' stored
    offsets/dims fails here, not in the driver."""
    import sys

    import duckdb

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from make_media_fixture import _ppm_rows, _ppm_stream_rows

    gen = _ppm_rows()
    rows = duckdb.sql(
        f"SELECT media_id, payload, width, height, data_off "
        f"FROM read_parquet('{_PPM_FIXTURE}') ORDER BY media_id"
    ).fetchall()
    assert [(r[0], bytes(r[1]), r[2], r[3], r[4]) for r in rows] == [
        (m, p, w, h, o) for (m, p, w, h, o) in gen
    ]
    sgen = _ppm_stream_rows()
    srows = duckdb.sql(
        f"SELECT media_id, payload, n_frames, frame_offs, frame_lens, "
        f"frame_ws, frame_hs FROM read_parquet('{_PPM_STREAM_FIXTURE}') "
        f"ORDER BY media_id"
    ).fetchall()
    assert [
        (r[0], bytes(r[1]), r[2], list(r[3]), list(r[4]), list(r[5]), list(r[6]))
        for r in srows
    ] == [(m, p, n, o, ln, w, h) for (m, p, n, o, ln, w, h) in sgen]
