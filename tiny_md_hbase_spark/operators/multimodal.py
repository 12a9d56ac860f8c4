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

The actual image/audio codecs are NOT available in this environment, so
the byte-interpreting step is stubbed: ``codec="fake"`` (default) derives
deterministic pseudo-features from the payload bytes — the full Spark
plumbing (schemas, Arrow batching, partition strategy, UDF signatures) is
real and tested; ``codec="pil"``/``codec="ffmpeg"`` raise
``NotImplementedError`` until the libraries exist on the cluster.
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
    "synth_media",
    "decode_features",
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


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors.

    Repartitions on metadata first so decode cost spreads evenly; the
    kernel is an Arrow-batched generator — one pandas batch in, one out.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: image/audio libraries are not present in this "
            "environment; plumbing is exercised with codec='fake'"
        )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(_fake_feature),
                }
            )

    balanced = media.repartition(F.col("kind"), F.crc32(F.col("media_id").cast("string")))
    return balanced.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250, codec: str = "fake") -> DataFrame:
    """Sample frames from video payloads (1 row in → N frame rows out).

    The fake codec slices the payload deterministically; a real one would
    seek the container. Output explodes, so any downstream shuffle keys
    on (media_id, frame_idx) — never repartition after this step.
    """
    if codec != "fake":
        raise NotImplementedError("real container demuxing unavailable here")

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
    JVM-side; the byte-level resample would be another mapInPandas kernel
    behind the codec gate."""
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
