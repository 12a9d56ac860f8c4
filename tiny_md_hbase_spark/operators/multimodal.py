"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` kernels.

Design (the part that must be right at 100 TB):
- media rows carry ``payload: binary`` plus typed metadata columns —
  Spark never interprets the bytes except inside explicit decode kernels;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  generators: Arrow ships columnar batches into Python once per batch
  (not per row), and the kernel streams batches out, so peak memory is
  one batch of payloads regardless of partition size;
- partitioning happens BEFORE decode on cheap metadata (kind, byte size)
  so heavy rows spread evenly — never after, when rows are exploded
  frames/features.

External image/audio codec LIBRARIES are not available in this
environment, so the library-backed byte-interpreting steps are stubbed:
``codec="fake"`` (default) derives deterministic pseudo-features from
the payload bytes — the full Spark plumbing (schemas, Arrow batching,
partition strategy, UDF signatures) is real and tested;
``codec="pil"`` is IMPORT-GATED — it runs a real Pillow decode when the
library is importable and raises ``NotImplementedError`` only when it
genuinely is not; ``codec="ffmpeg"`` stays stubbed until that library
exists on the cluster. The REAL decode paths that need no
library at all are implemented honestly, in the same Arrow-batched
kernel shape, with integer / byte-exact outputs a DuckDB oracle
recomputes byte-for-byte from ``hex(payload)``:
- audio: :func:`wav_decode` parses RIFF/WAVE containers (chunk walk,
  fmt validation, word-alignment padding) and decodes 16-bit PCM;
- image: :func:`ppm_decode` tokenizes binary-PPM (P6) headers
  (whitespace/comment walk) and decodes the RGB raster;
  :func:`ppm_resize` nearest-neighbor-resamples and re-encodes the
  container byte-for-byte;
- video: :func:`ppm_stream_frames` demuxes concatenated-P6 frame
  streams (ffmpeg's image2pipe raw format), sampling every k-th frame.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas imported lazily inside kernels
    import pandas as pd

__all__ = [
    "MEDIA_SCHEMA",
    "WAV_FEATURE_SCHEMA",
    "PPM_FEATURE_SCHEMA",
    "PPM_RESIZE_SCHEMA",
    "PPM_FRAME_SCHEMA",
    "synth_media",
    "decode_features",
    "wav_decode",
    "make_wav",
    "make_ppm",
    "ppm_decode",
    "ppm_resize",
    "ppm_stream_frames",
    "frame_sample",
    "resize_meta",
    "media_dedup_exact",
    "write_media_partitioned",
    "load_media_partitioned",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)

_FEATURE_DIM = 8


def _spread(media: DataFrame, *extra_cols) -> DataFrame:
    """Metadata repartition BEFORE a CPU-bound decode kernel, at an
    EXPLICIT width: ``repartition(crc32(...))`` without a partition
    count lets AQE size the exchange for ~64 MB of shuffle bytes —
    right for I/O-bound plans, wrong for a Python kernel, where it
    squashed a 32-core decode onto 3 tasks (measured 19x at 10x volume
    in scripts/scale_codecs.py before this rule). Width = at least the
    cluster's core count, and never fewer tasks than the source has
    FILES (so huge file-backed inputs keep ~storage-split-sized tasks).
    inputFiles() resolves from the plan's file indexes without running
    anything — ``.rdd.getNumPartitions()`` here would force AQE to
    execute every upstream shuffle stage just to count partitions (and
    then run them again in the real query)."""
    npart = max(
        media.sparkSession.sparkContext.defaultParallelism,
        len(media.inputFiles()),
    )
    return media.repartition(
        npart, *extra_cols, F.crc32(F.col("media_id").cast("string"))
    )


def _synth_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic synthetic media rows (payload = seeded pseudo-random
    bytes) — shared by :func:`synth_media` and the committed parquet
    fixture (scripts/make_media_fixture.py) so the DuckDB oracles see the
    exact bytes Spark processes."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = 256 + rng.randrange(1024)
        payload = bytes(rng.randrange(256) for _ in range(size))
        rows.append(
            (
                i,
                kind,
                payload,
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 + i if kind != "image" else None,
                {"image": "png", "audio": "wav", "video": "mkv"}[kind],
            )
        )
    return rows


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for exercising the plumbing
    without codec libraries."""
    return spark.createDataFrame(_synth_media_rows(n, seed), MEDIA_SCHEMA)


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact duplicate groups over binary payloads — the multimodal twin
    of ``dedup_exact``: group on ``(kind, xxhash64(payload))`` and keep
    the lowest media_id.

    Scale shape: the payloads themselves never shuffle — the aggregation
    key is the 8-byte JVM hash plus the kind partition column (kind
    first, so on a kind-partitioned layout the shuffle respects the
    layout and a single-kind job prunes before hashing). Collision risk
    at 64-bit over per-kind corpus sizes is the standard ~n²/2^65
    birthday bound; a verify pass comparing payload bytes within groups
    is one extra self-join on the tiny duplicate set if a deployment
    needs certainty. Returns (kind, payload_hash, keep_id, n_copies,
    sum_bytes) for n_copies ≥ 1 — filter ``n_copies > 1`` for the
    dedup-deletion worklist."""
    return (
        media.select(
            "kind",
            F.xxhash64("payload").alias("payload_hash"),
            "media_id",
            F.length("payload").alias("n_bytes"),
        )
        .groupBy("kind", "payload_hash")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sum("n_bytes").alias("sum_bytes"),
        )
    )


def _fake_feature(payload: bytes) -> list[float]:
    # deterministic stand-in for a real embedding: byte-histogram moments
    out = []
    for b in range(_FEATURE_DIM):
        chunk = payload[b::_FEATURE_DIM]
        out.append((sum(chunk) / max(len(chunk), 1)) / 255.0)
    return out


def _pil_feature(payload: bytes) -> list[float]:
    # library-backed decode: grayscale the image and NEAREST-resample it
    # to a 1x_FEATURE_DIM strip — deterministic (no AA filter kernels),
    # so the same payload yields the same feature on every executor
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    strip = img.resize((_FEATURE_DIM, 1), resample=Image.NEAREST)
    return [px / 255.0 for px in strip.getdata()]


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors.

    Repartitions on metadata first so decode cost spreads evenly; the
    kernel is an Arrow-batched generator — one pandas batch in, one out.

    ``codec="pil"`` is gated on IMPORT AVAILABILITY, not hard-stubbed: on
    a cluster with Pillow installed it decodes real image payloads
    (:func:`_pil_feature` — grayscale + deterministic NEAREST resample to
    ``_FEATURE_DIM``); only when the import genuinely fails does it raise
    ``NotImplementedError``. The driver-side probe below fails fast with
    the honest message instead of dying per-task inside the kernel.
    """
    if codec == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "codec 'pil': Pillow is not importable in this environment "
                f"({e}); plumbing is exercised with codec='fake', and the "
                "library-free image decodes are real — see ppm_decode / "
                "ppm_resize (binary PPM). On a cluster with Pillow "
                "installed this same call decodes real images."
            ) from None
        feature_fn = _pil_feature
    elif codec == "fake":
        feature_fn = _fake_feature
    else:
        raise NotImplementedError(
            f"codec {codec!r}: no decoder for it here; plumbing is "
            "exercised with codec='fake' (codec='pil' lights up when "
            "Pillow is installed), and the library-free decodes are real "
            "— see wav_decode (16-bit PCM RIFF/WAVE), ppm_decode / "
            "ppm_resize (binary PPM), and ppm_stream_frames "
            "(concatenated-P6 demux)"
        )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(feature_fn),
                }
            )

    balanced = _spread(media, F.col("kind"))
    return balanced.mapInPandas(kernel, FEATURE_SCHEMA)


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sum_samples", T.LongType(), False),
        T.StructField("min_sample", T.IntegerType(), False),
        T.StructField("max_sample", T.IntegerType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def make_wav(
    samples: list[int] | bytes,
    sample_rate: int = 16_000,
    channels: int = 1,
    pre_data_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Serialize 16-bit PCM samples into a real RIFF/WAVE container —
    the encode half of :func:`wav_decode`, used by the committed fixture
    (scripts/make_media_fixture.py) and the tests. ``pre_data_chunks``
    inserts extra (id, body) chunks between ``fmt `` and ``data`` (LIST
    metadata, odd-length bodies for word-alignment coverage) so decode
    must genuinely walk the chunk list rather than assume the canonical
    44-byte header. ``samples`` may alternatively be raw little-endian
    int16 PCM ``bytes`` (the bulk-generation path scale_codecs.py uses —
    per-sample struct.pack would dominate its measurement)."""
    import struct

    body = b""
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for cid, cbody in pre_data_chunks or []:
        if len(cid) != 4:
            raise ValueError(f"chunk id must be 4 bytes, got {cid!r}")
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    if isinstance(samples, (bytes, bytearray)):
        if len(samples) % 2:
            raise ValueError("raw PCM bytes must be int16-aligned")
        data = bytes(samples)
    else:
        data = b"".join(struct.pack("<h", s) for s in samples)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _parse_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a RIFF/WAVE container: validate magic, walk the chunk list
    (word-aligned), validate the ``fmt `` chunk is 16-bit integer PCM,
    and return (sample_rate, channels, pcm_bytes). Raises ValueError
    with the structural reason on any malformed payload — the kernel
    wraps it with the offending media_id."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + csz > len(payload):
            raise ValueError(
                f"truncated {cid!r} chunk: declares {csz} bytes but only "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            if csz < 16:
                raise ValueError(f"fmt chunk too short ({csz} bytes)")
            audio_fmt, channels, rate, _brate, _balign, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_fmt != 1:
                raise ValueError(f"not integer PCM (wFormatTag={audio_fmt})")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}-bit")
            if channels < 1:
                raise ValueError("zero channels")
            fmt = (rate, channels)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # skip the word-alignment pad byte
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if len(data) % 2:
        raise ValueError(f"data chunk is {len(data)} bytes — not int16-aligned")
    return fmt[0], fmt[1], data


def wav_decode(media: DataFrame) -> DataFrame:
    """REAL audio decode — no external library: parse each payload as a
    RIFF/WAVE container (chunk walk with word-alignment padding, fmt
    validation) and decode the 16-bit little-endian PCM frames, emitting
    exact INTEGER features per media row: sample_rate, channels, flat
    interleaved sample count, sum / min / max of the signed samples, and
    sign-change zero crossings. Integer outputs make the whole decode
    byte-observable cross-engine: the DuckDB oracle recomputes every
    column from ``hex(payload)`` at the fixture's known data offset,
    while this kernel DISCOVERS the offset by parsing — fixture rows
    carry pre-``data`` LIST chunks precisely so a parser that assumed
    the canonical 44-byte header would mismatch the oracle.

    Same 100 TB shape as :func:`decode_features`: repartition on cheap
    metadata before the decode, Arrow-batched ``mapInPandas`` kernel,
    one batch of payloads in memory per task. Malformed payloads fail
    loudly with the media_id and the structural reason (the
    row-identifying-error discipline of ``validate_vectors``)."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "channels", "n_samples",
                "sum_samples", "min_sample", "max_sample", "zero_crossings",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, channels, data = _parse_wav(bytes(payload))
                except ValueError as e:
                    raise ValueError(
                        f"invalid WAV payload at media_id={mid}: {e}"
                    ) from None
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["n_samples"].append(len(s))
                out["sum_samples"].append(int(s.sum()) if len(s) else 0)
                out["min_sample"].append(int(s.min()) if len(s) else 0)
                out["max_sample"].append(int(s.max()) if len(s) else 0)
                out["zero_crossings"].append(
                    int(np.count_nonzero((s[:-1] < 0) != (s[1:] < 0)))
                )
            yield pd.DataFrame(out)

    balanced = _spread(media)
    return balanced.select("media_id", "payload").mapInPandas(
        kernel, WAV_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL image codec path: binary PPM (netpbm P6) — like wav_decode, no
# external library is needed to parse this honestly, so the image side
# of the codec gate gets a real decode, a real byte-level resize, and a
# real multi-image stream demux, all inside the same Arrow-batched
# kernel shape with integer / byte-exact outputs a DuckDB oracle can
# recompute from hex(payload).
# ---------------------------------------------------------------------------

PPM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_pixels", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("min_byte", T.IntegerType(), False),
        T.StructField("max_byte", T.IntegerType(), False),
        T.StructField("even_row_luma", T.LongType(), False),
    ]
)

PPM_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

PPM_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_w", T.IntegerType(), False),
        T.StructField("frame_h", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)

_PPM_WS = frozenset(b" \t\r\n\x0b\x0c")  # netpbm whitespace set


def make_ppm(
    width: int,
    height: int,
    rgb: bytes,
    comments: list[bytes] | None = None,
    ws: bytes = b"\n",
    comment_end: bytes = b"\n",
) -> bytes:
    """Serialize an RGB raster into a real binary PPM (netpbm P6)
    container — the encode half of :func:`ppm_decode`, used by the
    committed fixture (scripts/make_media_fixture.py) and the tests.

    ``comments`` are inserted BETWEEN header tokens (at most three —
    one per gap: after the magic, between width and height, between
    height and maxval), and ``ws`` picks the inter-token whitespace, so
    fixture payloads force a decoder to tokenize the header for real: a
    parser that assumed ``P6\\n<w> <h>\\n255\\n`` byte layout, or read
    the first digits it saw (comments may contain digits), would
    compute a wrong raster offset and mismatch the byte-level oracle."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"raster is {len(rgb)} bytes; {width}x{height} RGB needs "
            f"{width * height * 3}"
        )
    if comments is not None and len(comments) > 3:
        raise ValueError(
            f"at most 3 header comments (one per token gap), got {len(comments)}"
        )
    if comment_end not in (b"\n", b"\r"):
        raise ValueError("comments end at LF or CR per the netpbm spec")
    toks = [str(width).encode(), str(height).encode(), b"255"]
    out = b"P6"
    cm = list(comments or [])
    for i, tok in enumerate(toks):
        out += ws
        if i < len(cm):
            out += b"#" + cm[i] + comment_end
        out += tok
    return out + b"\n" + rgb


def _ppm_int(payload: bytes, pos: int, what: str) -> tuple[int, int]:
    """Read one decimal header token at/after ``pos``, skipping netpbm
    whitespace and ``#``-to-end-of-line comments. Returns (value, pos
    after the last digit)."""
    n = len(payload)
    while pos < n:
        c = payload[pos]
        if c in _PPM_WS:
            pos += 1
            continue
        if c == 0x23:  # '#'
            # netpbm comments end at CR **or** LF — scanning only for
            # \n would swallow the header tokens after a CR-terminated
            # comment and silently mis-parse the dimensions
            lf = payload.find(b"\n", pos)
            cr = payload.find(b"\r", pos)
            nl = min(x for x in (lf, cr) if x >= 0) if max(lf, cr) >= 0 else -1
            if nl < 0:
                raise ValueError(f"unterminated header comment before {what}")
            pos = nl + 1
            continue
        break
    start = pos
    while pos < n and 0x30 <= payload[pos] <= 0x39:
        pos += 1
    if pos == start:
        raise ValueError(f"expected {what} digits at byte {start}")
    return int(payload[start:pos]), pos


def _parse_ppm_at(payload: bytes, pos: int) -> tuple[int, int, int, int]:
    """Parse one P6 image starting at ``pos``: tokenize the header
    (whitespace/comment walk), validate 8-bit maxval, and return
    (width, height, raster_offset, end_offset). Raises ValueError with
    the structural reason on any malformed container — kernels wrap it
    with the offending media_id."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError(f"not a binary PPM (P6) at byte {pos}")
    w, pos = _ppm_int(payload, pos + 2, "width")
    h, pos = _ppm_int(payload, pos, "height")
    maxval, pos = _ppm_int(payload, pos, "maxval")
    if maxval != 255:
        raise ValueError(f"only maxval=255 (full-range 8-bit) supported, got {maxval}")
    if pos >= len(payload) or payload[pos] not in _PPM_WS:
        raise ValueError("missing single whitespace after maxval")
    pos += 1  # exactly ONE whitespace byte, per the P6 spec
    n_bytes = w * h * 3
    if pos + n_bytes > len(payload):
        raise ValueError(
            f"truncated raster: {w}x{h} needs {n_bytes} bytes, "
            f"{len(payload) - pos} remain"
        )
    return w, h, pos, pos + n_bytes


def _parse_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a single-image P6 payload; trailing bytes are an error
    (concatenated streams go through :func:`ppm_stream_frames`)."""
    w, h, off, end = _parse_ppm_at(payload, 0)
    if end != len(payload):
        raise ValueError(
            f"{len(payload) - end} trailing bytes after the raster "
            "(multi-image stream? use ppm_stream_frames)"
        )
    return w, h, payload[off:end]


def ppm_decode(media: DataFrame) -> DataFrame:
    """REAL image decode — no external library: tokenize each payload's
    P6 header (whitespace/comment walk, 8-bit maxval validation) and
    decode the RGB raster, emitting exact INTEGER features per image:
    dimensions, pixel count, per-channel byte sums, min/max byte, and
    ``even_row_luma`` (the byte sum over pixels in even rows) — that
    last one is wrong unless WIDTH was decoded correctly, so the oracle
    checks the 2-D layout, not just the flat raster. The DuckDB twin
    recomputes every column from ``hex(payload)`` at the fixture's
    generator-known raster offset while this kernel DISCOVERS the offset
    by parsing; fixture headers carry digit-bearing comments and varied
    whitespace precisely so a byte-layout assumption would mismatch.

    Same 100 TB shape as :func:`wav_decode`: repartition on cheap
    metadata before decode, Arrow-batched ``mapInPandas``, one batch of
    payloads per task, malformed rows fail loudly with the media_id."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        cols = (
            "media_id", "width", "height", "n_pixels", "sum_r", "sum_g",
            "sum_b", "min_byte", "max_byte", "even_row_luma",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, raster = _parse_ppm(bytes(payload))
                except ValueError as e:
                    raise ValueError(
                        f"invalid PPM payload at media_id={mid}: {e}"
                    ) from None
                a = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(a[0::3].sum()))
                out["sum_g"].append(int(a[1::3].sum()))
                out["sum_b"].append(int(a[2::3].sum()))
                out["min_byte"].append(int(a.min()) if a.size else 0)
                out["max_byte"].append(int(a.max()) if a.size else 0)
                out["even_row_luma"].append(
                    int(a.reshape(h, w * 3)[0::2].sum()) if a.size else 0
                )
            yield pd.DataFrame(out)

    balanced = _spread(media)
    return balanced.select("media_id", "payload").mapInPandas(
        kernel, PPM_FEATURE_SCHEMA
    )


def _resize_target(sw: int, sh: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving nearest-neighbor target in EXACT integer math
    (no float scale — both engines reproduce it bit-for-bit): shrink the
    longer side to ``max_side``, never upscale, never round a nonzero
    side to zero. Zero-area sources (0xN / Nx0 headers are legal P6)
    resize to 0x0."""
    if sw == 0 or sh == 0:
        return 0, 0
    m = max(sw, sh)
    if m <= max_side:
        return sw, sh
    return max(1, sw * max_side // m), max(1, sh * max_side // m)


def ppm_resize(media: DataFrame, max_side: int = 12) -> DataFrame:
    """REAL byte-level image resize (the kernel :func:`resize_meta` plans
    for): decode each P6 payload, nearest-neighbor-resample the RGB
    raster to the aspect-preserving target (exact integer source mapping
    ``sx = tx*sw // tw``), and re-encode a canonical ``P6\\n<w> <h>\\n255\\n``
    container. Output payload bytes are deterministic, so the DuckDB
    oracle rebuilds the ENTIRE resized file hex-for-hex from the source
    payload's hex — header included — and any off-by-one in the sampling
    grid or the re-encode mismatches.

    1 row in → 1 smaller row out: unlike frame sampling there is no
    explosion, so the metadata repartition before the kernel is the only
    exchange this plan needs."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "src_w", "src_h", "out_w", "out_h", "payload",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    sw, sh, raster = _parse_ppm(bytes(payload))
                except ValueError as e:
                    raise ValueError(
                        f"invalid PPM payload at media_id={mid}: {e}"
                    ) from None
                tw, th = _resize_target(sw, sh, max_side)
                if tw * th == 0:
                    body = b""
                else:
                    img = np.frombuffer(raster, dtype=np.uint8).reshape(sh, sw, 3)
                    sy = (np.arange(th, dtype=np.int64) * sh) // th
                    sx = (np.arange(tw, dtype=np.int64) * sw) // tw
                    body = img[sy][:, sx].tobytes()
                out["media_id"].append(int(mid))
                out["src_w"].append(sw)
                out["src_h"].append(sh)
                out["out_w"].append(tw)
                out["out_h"].append(th)
                out["payload"].append(b"P6\n%d %d\n255\n" % (tw, th) + body)
            yield pd.DataFrame(out)

    balanced = _spread(media)
    return balanced.select("media_id", "payload").mapInPandas(
        kernel, PPM_RESIZE_SCHEMA
    )


def ppm_stream_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL container demux — the honest form of :func:`frame_sample`:
    netpbm files may hold a SEQUENCE of concatenated images (the raw
    frame format ffmpeg's image2pipe produces), so each payload is
    walked image-by-image — every frame's header is tokenized for its
    own dimensions (frames may differ in size), the raster is skipped
    exactly, and every ``every``-th frame is emitted as its raw byte
    slice. The offsets are DISCOVERED by parsing; the fixture stores the
    generator-known per-frame offset/length lists oracle-side only, so
    the DuckDB twin slicing ``hex(payload)`` at the stored offsets
    verifies the walk byte-for-byte.

    Output explodes (1 row in → N frame rows out): downstream shuffles
    key on (media_id, frame_idx) — never repartition after this step."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "frame_idx", "frame_w", "frame_h", "frame_payload",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                pos = 0
                idx = 0
                while pos < len(buf):
                    try:
                        w, h, _off, end = _parse_ppm_at(buf, pos)
                    except ValueError as e:
                        raise ValueError(
                            f"invalid PPM stream at media_id={mid}, "
                            f"frame {idx} (byte {pos}): {e}"
                        ) from None
                    if idx % every == 0:
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(idx)
                        out["frame_w"].append(w)
                        out["frame_h"].append(h)
                        out["frame_payload"].append(buf[pos:end])
                    pos = end
                    idx += 1
            yield pd.DataFrame(out)

    balanced = _spread(media)
    return balanced.select("media_id", "payload").mapInPandas(
        kernel, PPM_FRAME_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 250, codec: str = "fake") -> DataFrame:
    """Sample frames from video payloads (1 row in → N frame rows out).

    The fake codec slices the payload deterministically; real demuxing
    of a library-free container exists — see :func:`ppm_stream_frames`
    (concatenated-P6 streams). Output explodes, so any downstream
    shuffle keys on (media_id, frame_idx) — never repartition after
    this step.
    """
    if codec != "fake":
        raise NotImplementedError(
            "library-backed container demuxing unavailable here; "
            "library-free P6 stream demux is real — see ppm_stream_frames"
        )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if dur is None or pd.isna(dur):
                    continue
                n_frames = max(int(dur) // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, FRAME_SCHEMA)


SIZE_BUCKETS = 4  # payload-size strata per kind


def write_media_partitioned(media: DataFrame, path: str, mode: str = "overwrite") -> None:
    """The 100 TB media layout: files partitioned by (kind, size_bucket).

    Partitioning happens on CHEAP metadata before any decode: ``kind``
    routes each modality to its own directory (a video-only frame-sample
    job lists/reads only ``kind=video/`` — partition pruning, no scan of
    images), and ``size_bucket`` (log2 stratum of payload length) keeps
    each file's rows similar-sized so one task never holds a partition of
    all-huge payloads. Within a file, rows sort by media_id for stable
    reads. The decode kernels then run on already-balanced inputs —
    exercising against files what the in-memory tests assert.

    The pre-write exchange salts (kind, size_bucket) with
    crc32(media_id) at cluster width: the directory key space is only
    ~kinds × buckets (~24) values, and hash-partitioning on it alone
    would cap a petabyte media write at ~24 tasks — the same ceiling
    the inverted-index writer had. Pruning is directory-level and
    unaffected."""
    out = media.withColumn(
        "size_bucket",
        F.least(
            F.floor(F.log2(F.length("payload").cast("double") + 1) / 2).cast("int"),
            F.lit(SIZE_BUCKETS - 1),
        ),
    )
    npart = max(media.sparkSession.sparkContext.defaultParallelism, 2)
    (
        out.repartition(
            npart, "kind", "size_bucket", F.crc32(F.col("media_id").cast("string"))
        )
        .sortWithinPartitions("media_id")
        .write.mode(mode)
        .partitionBy("kind", "size_bucket")
        .parquet(path)
    )


def load_media_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned media table back with the canonical column
    set (partition columns re-ordered to the MEDIA_SCHEMA layout)."""
    df = spark.read.parquet(path)
    return df.select(
        "media_id", "kind", "payload", "width", "height", "duration_ms", "format"
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Metadata-only resize planning (no byte interpretation needed):
    target dimensions preserving aspect ratio — pure Column math, stays
    JVM-side. The byte-level resample it plans for exists for real on
    the library-free path: see :func:`ppm_resize`."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return media.filter(F.col("width").isNotNull()).select(
        "media_id",
        "kind",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale).cast("int").alias("target_height"),
    )
