"""Write-path, streaming-ingest, and multimodal plumbing tests."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import index as IX
from tiny_md_hbase_spark.operators import multimodal as MM
from tiny_md_hbase_spark.operators import write as W
from tiny_md_hbase_spark.sources import load_table
from tiny_md_hbase_spark.streaming import ingest as ING


@pytest.fixture()
def tmp_table():
    d = tempfile.mkdtemp(prefix="tmh_table_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# --- batch write path -----------------------------------------------------

def test_table_lifecycle_and_insert(spark, tmp_table):
    path = f"{tmp_table}/t1"
    W.table_create(spark, path)
    idx0 = spark.read.parquet(f"{path}/index").collect()
    assert [(r.bucket_z, r.pl, r.size) for r in idx0] == [(0, IX.ROOT_PL, 0)]

    batch = spark.createDataFrame(
        [(i, i % 100, (i * 7) % 100) for i in range(50)], "id long, x int, y int"
    )
    W.insert_append(spark, path, batch)
    pts = spark.read.parquet(f"{path}/points")
    assert pts.count() == 50
    idx = spark.read.parquet(f"{path}/index")
    assert idx.agg(F.sum("size")).collect()[0][0] == 50

    # second append accumulates (multiset append semantics)
    W.insert_append(spark, path, batch)
    assert spark.read.parquet(f"{path}/points").count() == 100
    idx2 = spark.read.parquet(f"{path}/index")
    assert idx2.agg(F.sum("size")).collect()[0][0] == 100

    W.table_drop(path)
    import os

    assert not os.path.exists(path)


def test_generated_ids_fill_nulls(spark):
    df = spark.createDataFrame([(None, 1, 2), (7, 3, 4)], "id long, x int, y int")
    rows = W.with_generated_ids(df).collect()
    ids = {r.x: r.id for r in rows}
    assert ids[3] == 7 and ids[1] is not None


# --- streaming ingest -----------------------------------------------------

def test_stream_ingest_matches_batch(spark, sf_dir, tmp_table):
    src = f"{tmp_table}/src"
    table = f"{tmp_table}/table"
    ckpt = f"{tmp_table}/ckpt"
    # stage the events fixture as several arriving files so availableNow
    # produces multiple micro-batches (first = full index build, rest =
    # incremental refresh)
    events = load_table(spark, sf_dir, "events")
    events.repartition(6).write.parquet(src)

    q = ING.stream_ingest_points(
        spark, src, table, ckpt, available_now=True, max_files_per_trigger=2
    )
    assert q.awaitTermination(180)
    assert not q.isActive

    got = spark.read.parquet(f"{table}/points")
    expected = ING.events_as_points(events)
    assert got.count() == expected.count()
    assert got.select("id", "x", "y").exceptAll(expected).count() == 0
    # index refreshed incrementally across batches == full rebuild
    idx = spark.read.parquet(f"{table}/index")
    assert idx.agg(F.sum("size")).collect()[0][0] == expected.count()
    rows = idx.collect()
    for r in rows:
        assert r.size <= IX.DEFAULT_THRESHOLD or r.pl == IX.MAX_DEPTH
    full = sorted(
        (r.bucket_z, r.pl, r.size) for r in IX.index_build(got.select("id", "x", "y")).collect()
    )
    assert sorted((r.bucket_z, r.pl, r.size) for r in rows) == full


def test_media_dedup_exact_planted(spark):
    """Planted byte-identical payloads group together; distinct payloads
    never do; the payload bytes themselves stay out of the shuffle (the
    group key is kind + 8-byte hash)."""
    base = MM.synth_media(spark, 48)
    dups = base.filter(F.col("media_id") % 10 == 0).select(
        (F.col("media_id") + 500).alias("media_id"),
        "kind", "payload", "width", "height", "duration_ms", "format",
    )
    out = MM.media_dedup_exact(base.unionByName(dups))
    groups = {(r.kind, r.payload_hash): r for r in out.collect()}
    n_planted = dups.count()
    multi = [r for r in groups.values() if r.n_copies > 1]
    assert len(multi) == n_planted
    for r in multi:
        assert r.n_copies == 2 and r.keep_id < 500
    # singles: every non-duplicated payload is its own group
    assert sum(r.n_copies for r in groups.values()) == 48 + n_planted
    # deterministic under repartitioning
    again = {
        (r.kind, r.payload_hash): (r.keep_id, r.n_copies, r.sum_bytes)
        for r in MM.media_dedup_exact(
            base.unionByName(dups).repartition(7)
        ).collect()
    }
    assert again == {
        k: (r.keep_id, r.n_copies, r.sum_bytes) for k, r in groups.items()
    }


def test_pii_scrub_unchanged_on_stream(spark, tmp_table):
    """Row-local operators are batch/stream unified: the SAME pii_scrub
    plan runs on a streaming DataFrame with identical results — no
    stream-specific variant needed (stateless select, no watermark)."""
    from tiny_md_hbase_spark.operators import privacy as PV

    schema = "doc_id long, text string, lang string, source string, n_chars int"
    rows = [
        (1, "mail a@b.co now", "en", "s", 0),
        (2, "ip 10.1.2.3 here", "en", "s", 0),
        (3, "clean", "en", "s", 0),
    ]
    src = f"{tmp_table}/docs_src"
    spark.createDataFrame(rows, schema).write.parquet(src)
    q = (
        PV.pii_scrub(spark.readStream.schema(schema).parquet(src))
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_table}/pii_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.table("pii_stream").collect()}
    batch = {r.doc_id: r for r in PV.pii_scrub(spark.read.parquet(src)).collect()}
    assert {d: (r.clean_text, r.n_email, r.n_ip) for d, r in got.items()} == {
        d: (r.clean_text, r.n_email, r.n_ip) for d, r in batch.items()
    }
    assert got[1].n_email == 1 and got[2].n_ip == 1


def test_stream_ingest_refresh_is_incremental(spark, sf_dir, tmp_table, monkeypatch):
    """Drives >=3 incremental micro-batches and pins the COST CLASS, not
    just the result: every refresh after the first reports its
    incrementality stats, batches that overflow nothing never scan the
    points table, and the final index still equals a full rebuild.
    foreachBatch runs driver-side in this process, so wrapping the
    function the sink calls observes the real streaming path."""
    src = f"{tmp_table}/src"
    table = f"{tmp_table}/table"
    events = load_table(spark, sf_dir, "events")
    # 5 files -> batch 0 full-builds, batches 1..4 refresh incrementally
    events.repartition(5).write.parquet(src)

    calls: list[dict] = []
    real = W.refresh_index_incremental

    def recording(spark_, path_, batch_, threshold=IX.DEFAULT_THRESHOLD):
        stats = real(spark_, path_, batch_, threshold=threshold)
        calls.append(stats)
        return stats

    monkeypatch.setattr(ING, "refresh_index_incremental", recording)
    q = ING.stream_ingest_points(
        spark, src, table, f"{tmp_table}/ckpt", available_now=True,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(180)

    assert len(calls) >= 3, calls
    for stats in calls:
        # the contract: a no-overflow batch must not have scanned the table
        assert stats["table_scanned"] == (stats["overflowed"] > 0), calls
    got = spark.read.parquet(f"{table}/points").select("id", "x", "y")
    full = sorted((r.bucket_z, r.pl, r.size) for r in IX.index_build(got).collect())
    idx = sorted(
        (r.bucket_z, r.pl, r.size)
        for r in spark.read.parquet(f"{table}/index").collect()
    )
    assert idx == full


def test_stream_windowed_counts(spark, sf_dir, tmp_table):
    src = f"{tmp_table}/src2"
    events = load_table(spark, sf_dir, "events")
    events.write.parquet(src)

    agg = ING.stream_windowed_counts(spark, src, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts")
    # compare against the batch computation of the same window agg
    batch = (
        events.withColumn("ts", ING.ts_ts("ts"))
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select("event_type", "n_events")
    )
    assert got.count() == batch.count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == events.count()


def test_stream_asof_matches_batch(spark, sf_dir, tmp_table):
    from tiny_md_hbase_spark.operators import sessions as SES

    src = f"{tmp_table}/src3"
    events = load_table(spark, sf_dir, "events")
    events.write.parquet(src)

    q = (
        ING.stream_asof(spark, src)
        .writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("SELECT * FROM asof_stream")
    want = SES.asof_join(events).drop("side")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_asof_state_carries_across_batches(spark, tmp_table):
    """An error delivered in batch 1 must annotate clicks arriving in
    batch 2 (state outlives the micro-batch)."""
    src = f"{tmp_table}/src4"
    ckpt = f"{tmp_table}/ckpt4"
    out_dir = f"{tmp_table}/out4"
    us = 1_000_000
    schema = ING.EVENTS_SCHEMA

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        q = (
            ING.stream_asof(spark, src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    write_batch([(1, 10 * us * 1000, 1, "error", 0.0, "")])
    drain()
    write_batch([(2, 20 * us * 1000, 1, "click", 0.0, "")])
    out = {r.event_id: r for r in drain().collect()}
    assert out[2].prev_error_event_id == 1
    assert out[2].lag_us == 10 * us


# --- multimodal plumbing --------------------------------------------------

def test_decode_features_shapes(spark):
    media = MM.synth_media(spark, 30)
    feats = MM.decode_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
    # deterministic across runs
    again = {r.media_id: r.feature for r in MM.decode_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == pytest.approx(r.feature)


def test_decode_real_codec_is_gated(spark):
    """codec='pil' is IMPORT-gated: absent Pillow it raises the honest
    NotImplementedError; with Pillow present it must NOT raise (the
    decode itself is covered by test_decode_features_pil_codec).
    codec='ffmpeg' stays a hard stub either way."""
    media = MM.synth_media(spark, 3)
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            MM.decode_features(media, codec="pil")
    with pytest.raises(NotImplementedError):
        MM.decode_features(media, codec="ffmpeg")


def test_decode_features_pil_codec(spark):
    """Runs only where Pillow exists (skip-marked otherwise): real PNG
    payloads built by Pillow round-trip through the import-gated codec
    and match a driver-side recompute of the same grayscale+NEAREST
    feature."""
    Image = pytest.importorskip("PIL.Image")
    import io

    rows = []
    for i in range(6):
        img = Image.new("RGB", (16 + i, 12 + i))
        img.putdata(
            [((x * 7 + i) % 256, (x * 13) % 256, (x * 29 + i) % 256)
             for x in range((16 + i) * (12 + i))]
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((i, "image", buf.getvalue(), 16 + i, 12 + i, None, "png"))
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r.feature for r in
           MM.decode_features(media, codec="pil").collect()}
    assert len(got) == 6
    for i, _, payload, *_ in rows:
        want = MM._pil_feature(payload)
        assert got[i] == pytest.approx(want)
        assert len(want) == 8 and all(0.0 <= v <= 1.0 for v in want)


def test_frame_sample_explodes_video_only(spark):
    media = MM.synth_media(spark, 30)
    frames = MM.frame_sample(media, every_ms=250)
    rows = frames.collect()
    vids = {r.media_id for r in media.filter(F.col("kind") == "video").collect()}
    assert {r.media_id for r in rows} <= vids
    assert len(rows) > len(vids)  # multiple frames per video
    assert all(len(r.frame_payload) > 0 for r in rows)


def test_resize_meta(spark):
    media = MM.synth_media(spark, 12)
    out = MM.resize_meta(media, max_side=32).collect()
    for r in out:
        assert max(r.target_width, r.target_height) <= 32
        assert r.target_width >= 1 and r.target_height >= 1


def test_media_partitioned_write_round_trip(spark, tmp_table):
    """The payload-partitioned file layout: kind=... directories exist
    (a video-only job prunes to kind=video files), the round trip is
    lossless, and frame sampling over the file-backed table equals the
    in-memory result."""
    import os

    media = MM.synth_media(spark, 48)
    path = f"{tmp_table}/media"
    MM.write_media_partitioned(media, path)
    kinds = {d for d in os.listdir(path) if d.startswith("kind=")}
    assert kinds == {"kind=image", "kind=audio", "kind=video"}

    back = MM.load_media_partitioned(spark, path)
    assert back.count() == 48
    assert back.select("media_id", "kind", "payload").exceptAll(
        media.select("media_id", "kind", "payload")
    ).count() == 0

    from_files = {
        (r.media_id, r.frame_idx): r.frame_payload
        for r in MM.frame_sample(back, every_ms=250).collect()
    }
    in_mem = {
        (r.media_id, r.frame_idx): r.frame_payload
        for r in MM.frame_sample(media, every_ms=250).collect()
    }
    assert from_files == in_mem


# --- the REAL codec path: RIFF/WAVE 16-bit PCM -----------------------------

_WAV_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "media_wav.parquet"
)


def test_make_wav_parse_roundtrip():
    """Encode → parse is the identity on (rate, channels, samples),
    including with pre-data chunks (even and odd bodies — the odd one
    exercises the word-alignment pad byte)."""
    import numpy as np

    from tiny_md_hbase_spark.operators.multimodal import _parse_wav, make_wav

    samples = [0, 1, -1, 32767, -32768, 12345, -12345, 7]
    for pre in (None, [(b"LIST", b"\x01" * 16)], [(b"LIST", b"\x02" * 13)]):
        payload = make_wav(samples, 22050, 2, pre)
        rate, ch, data = _parse_wav(payload)
        assert (rate, ch) == (22050, 2)
        assert np.frombuffer(data, dtype="<i2").tolist() == samples


def test_parse_wav_rejects_malformed():
    """Every structural failure mode raises with the reason — never
    numpy garbage or a silent wrong decode."""
    import struct

    from tiny_md_hbase_spark.operators.multimodal import _parse_wav, make_wav

    good = make_wav([1, 2, 3], 8000, 1)
    cases = {
        "not a RIFF/WAVE": b"JUNK" + good[4:],
        "truncated": good[:-2],  # data chunk declares more than remains
        "missing fmt": good[:12] + good[12 + 8 + 24 :],  # drop the fmt chunk
        "missing data": good[: 12 + 8 + 16],  # fmt only
    }
    for label, payload in cases.items():
        with pytest.raises(ValueError):
            _parse_wav(payload)
    # non-PCM format tag
    bad_fmt = bytearray(good)
    struct.pack_into("<H", bad_fmt, 20, 3)  # wFormatTag = IEEE float
    with pytest.raises(ValueError, match="PCM"):
        _parse_wav(bytes(bad_fmt))
    # 8-bit depth
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, 34, 8)
    with pytest.raises(ValueError, match="16-bit"):
        _parse_wav(bytes(bad_bits))


def test_wav_decode_features_match_python(spark):
    """The kernel's integer features equal a direct python decode of the
    fixture payloads — including the LIST-chunk rows whose data offset
    is NOT the canonical 44 (the parse is load-bearing)."""
    import numpy as np

    import duckdb

    rows = duckdb.sql(
        f"SELECT media_id, payload, sample_rate, channels, data_off, "
        f"n_samples FROM read_parquet('{_WAV_FIXTURE}') ORDER BY media_id"
    ).fetchall()
    assert any(r[4] != 44 for r in rows)  # LIST-chunk rows present
    assert any(r[5] == 0 for r in rows)  # the zero-sample container row
    expect = {}
    for mid, payload, rate, ch, off, ns in rows:
        s = np.frombuffer(bytes(payload)[off : off + 2 * ns], dtype="<i2").astype(
            np.int64
        )
        expect[mid] = (
            rate,
            ch,
            len(s),
            int(s.sum()) if len(s) else 0,
            int(s.min()) if len(s) else 0,
            int(s.max()) if len(s) else 0,
            int(np.count_nonzero((s[:-1] < 0) != (s[1:] < 0))),
        )
    got = {
        r.media_id: (
            r.sample_rate,
            r.channels,
            r.n_samples,
            r.sum_samples,
            r.min_sample,
            r.max_sample,
            r.zero_crossings,
        )
        for r in MM.wav_decode(spark.read.parquet(_WAV_FIXTURE)).collect()
    }
    assert got == expect


def test_wav_decode_names_bad_row(spark):
    """A malformed payload in a batch fails with the offending media_id
    and the structural reason, not an opaque kernel error."""
    from tiny_md_hbase_spark.operators.multimodal import make_wav

    rows = [
        (1, bytearray(make_wav([5, -5, 9], 8000, 1))),
        (2, bytearray(b"NOTAWAVE" + b"\x00" * 64)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    with pytest.raises(Exception, match="media_id=2"):
        MM.wav_decode(df).collect()


def test_wav_fixture_matches_generator():
    """The committed media_wav.parquet is byte-identical to what the
    generator would write today — fixture drift (vs the oracle's
    assumptions about data_off/n_samples) fails here, not in the driver."""
    import sys

    import duckdb

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from make_media_fixture import _wav_rows

    gen = _wav_rows()
    rows = duckdb.sql(
        f"SELECT media_id, payload, sample_rate, channels, data_off, "
        f"n_samples FROM read_parquet('{_WAV_FIXTURE}') ORDER BY media_id"
    ).fetchall()
    assert len(rows) == len(gen) == 49
    for (gmid, gpayload, grate, gch, goff, gns), r in zip(gen, rows):
        assert (gmid, grate, gch, goff, gns) == (r[0], r[2], r[3], r[4], r[5])
        assert gpayload == bytes(r[1])


def test_stream_dedup_docs_keep_first_across_batches(spark):
    """Cross-batch dedup semantics pinned with two explicitly-ordered
    arrivals: batch 1's doc wins over a later lower-id duplicate (the
    seen-set drops it — keep-FIRST-ARRIVAL, not global keep-min), the
    in-batch keep is min doc_id, and every distinct content survives
    exactly once."""
    d = tempfile.mkdtemp(prefix="sdedup_t_")
    try:
        schema = "doc_id long, text string, lang string, source string, n_chars long"
        batch1 = spark.createDataFrame(
            [
                (10, "alpha content", "en", "s", 13),
                (11, "beta content", "en", "s", 12),
                (12, "beta content", "en", "s", 12),  # in-batch dup of 11
            ],
            schema,
        )
        batch2 = spark.createDataFrame(
            [
                (1, "alpha content", "en", "s", 13),  # seen: dropped despite lower id
                (13, "gamma content", "en", "s", 13),
            ],
            schema,
        )
        batch1.coalesce(1).write.parquet(f"{d}/src")
        time.sleep(1.1)  # distinct mtimes: file order == arrival order
        batch2.coalesce(1).write.mode("append").parquet(f"{d}/src")
        q = ING.stream_dedup_docs(
            spark,
            f"{d}/src",
            f"{d}/table",
            f"{d}/ckpt",
            available_now=True,
            max_files_per_trigger=1,
        )
        assert q.awaitTermination(300)
        got = sorted(
            r.doc_id for r in spark.read.parquet(f"{d}/table/docs").collect()
        )
        assert got == [10, 11, 13]
        # seen-set holds one fingerprint per distinct content
        assert spark.read.parquet(f"{d}/table/seen").distinct().count() == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_manifest_incremental_equals_batch(spark, sf_dir):
    """The incrementally-maintained manifest after draining multiple
    micro-batches must be bit-identical to corpus_manifest over the
    whole corpus — the additive-checksum merge is exact, not
    approximate. Also pins that >1 micro-batch actually ran (the merge
    path, not just the first-batch copy)."""
    from tiny_md_hbase_spark.operators.text import corpus_manifest

    d = tempfile.mkdtemp(prefix="smanifest_t_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        docs.repartitionByRange(4, "doc_id").write.parquet(f"{d}/src")
        q = ING.stream_manifest(
            spark,
            f"{d}/src",
            f"{d}/table",
            f"{d}/ckpt",
            available_now=True,
            max_files_per_trigger=1,
        )
        assert q.awaitTermination(300)
        assert len(q.recentProgress) >= 4  # one micro-batch per staged file
        stored = spark.read.parquet(f"{d}/table/manifest")
        got = {
            r.shard: tuple(r)
            for r in stored.drop("last_batch_id").collect()
        }
        want = {r.shard: tuple(r) for r in corpus_manifest(docs).collect()}
        assert got == want
        # replay idempotence: foreachBatch replays the last uncommitted
        # batch on restart — re-merging an already-stamped batch id must
        # be a refused no-op, or the audit table double-counts
        stamp = stored.agg(F.max("last_batch_id")).first()[0]
        replay = docs.limit(50)  # any content; the stamp must gate it
        assert (
            ING.merge_manifest_batch(replay, int(stamp), f"{d}/table/manifest", 16)
            is False
        )
        again = {
            r.shard: tuple(r)
            for r in spark.read.parquet(f"{d}/table/manifest")
            .drop("last_batch_id")
            .collect()
        }
        assert again == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_ingest_embeddings_equals_batch_layout(spark, sf_dir, tmp_path):
    """Drain the embeddings fixture through micro-batched clustered
    appends: cluster membership and full-probe search must equal a
    one-shot batch build of the same layout."""
    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.sources import load_table
    from tiny_md_hbase_spark.sources.writer import (
        embedding_knn_clustered,
        write_embeddings_clustered,
    )
    from tiny_md_hbase_spark.streaming.ingest import stream_ingest_embeddings

    d = str(tmp_path)
    emb = load_table(spark, sf_dir, "embeddings")
    emb.repartition(3).write.parquet(f"{d}/src")
    write_embeddings_clustered(emb.limit(0), f"{d}/inc")
    q = stream_ingest_embeddings(
        spark, f"{d}/src", f"{d}/inc", f"{d}/ckpt",
        available_now=True, max_files_per_trigger=1,
    )
    assert q.awaitTermination(300)
    write_embeddings_clustered(emb, f"{d}/full")
    inc = {(r.vec_id, r.ivf_cluster)
           for r in spark.read.parquet(f"{d}/inc").collect()}
    full = {(r.vec_id, r.ivf_cluster)
            for r in spark.read.parquet(f"{d}/full").collect()}
    assert inc == full and len(inc) == emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).first().embedding]
    got = [(r.vec_id, r.cos_sim)
           for r in embedding_knn_clustered(spark, f"{d}/inc", qv).collect()]
    want = [(r.vec_id, r.cos_sim)
            for r in embedding_knn_clustered(spark, f"{d}/full", qv).collect()]
    assert got == want


# --- pinned goldens for the media keys -------------------------------------
# media_dedup / frame_sample / multimodal_features are value-oracled in
# DuckDB since r08 (committed media.parquet fixture), but the goldens stay
# as a fast in-suite regression net: the EXACT driver-graded outputs (same
# entry functions the driver calls), canonicalized (sorted columns, sorted
# rows, binary as hex) and sha256-pinned. Any kernel, fixture, or schema
# drift breaks the hash.

def _golden_canon(df):
    import hashlib

    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        d = r.asDict()
        rows.append(
            tuple(
                d[c].hex() if isinstance(d[c], (bytes, bytearray)) else d[c]
                for c in cols
            )
        )
    rows.sort()
    return cols, len(rows), hashlib.sha256(repr(rows).encode()).hexdigest()


def test_media_dedup_entry_golden(spark):
    import __spark_entry__ as e

    cols, n, h = _golden_canon(e.queries()["media_dedup"](spark, "unused"))
    assert cols == ["keep_id", "kind", "n_copies", "sum_bytes"]
    assert n == 12
    assert h == "793b770efbdbe24c01ac23b5fb6e50e5d10c8e751bdff60527ca26ca3d312924"


def test_frame_sample_entry_golden(spark):
    import __spark_entry__ as e

    cols, n, h = _golden_canon(e.queries()["frame_sample"](spark, "unused"))
    assert cols == ["frame_idx", "frame_md5", "media_id", "n_bytes"]
    assert n == 144
    assert h == "a562f0bb7d82319943e80ef858287120c033401a2aaf94b67562313307efa299"


def test_multimodal_features_entry_golden(spark):
    import __spark_entry__ as e

    cols, n, h = _golden_canon(e.queries()["multimodal_features"](spark, "unused"))
    assert cols == ["f0_sum", "kind", "media_id", "n_bytes"]
    assert n == 108
    assert h == "53b7f5001b89478f5268402fb85fce7f74f7d05cf9f852a502af04f85e2095ff"


def test_media_fixture_matches_generator():
    """The committed media.parquet fixture must equal what
    scripts/make_media_fixture.py would regenerate: 96 synth rows + the
    12 planted duplicates (media_id+1000 for media_id % 8 == 0), byte
    for byte — the DuckDB oracles read this file, so silent fixture
    drift would invalidate three correctness verdicts."""
    import os

    import pyarrow.parquet as pq

    from tiny_md_hbase_spark.operators.multimodal import _synth_media_rows

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "media.parquet",
    )
    want = _synth_media_rows(96)
    want += [
        (mid + 1000, kind, payload, w, h, dur, fmt)
        for (mid, kind, payload, w, h, dur, fmt) in want
        if mid % 8 == 0
    ]
    got = [
        tuple(d[c] for c in ("media_id", "kind", "payload", "width",
                             "height", "duration_ms", "format"))
        for d in pq.read_table(path).to_pylist()
    ]
    assert got == want


def test_stream_scd2_entry_matches_batch(spark, sf_dir):
    """The graded streaming entry (sentinel close + NULL mapping) must
    equal the batch scd2_intervals output exactly."""
    import __spark_entry__ as entrymod
    from tiny_md_hbase_spark.operators import timeseries as TS

    got = entrymod.queries()["stream_scd2"](spark, sf_dir)
    want = TS.scd2_intervals(load_table(spark, sf_dir, "events"))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_scd2_state_carries_across_batches(spark, tmp_table):
    """An interval spanning two micro-batches must emit once, with the
    count including events from BOTH batches."""
    src = f"{tmp_table}/scd2src"
    ckpt = f"{tmp_table}/scd2ckpt"
    out_dir = f"{tmp_table}/scd2out"
    ns = 1_000_000_000
    schema = ING.EVENTS_SCHEMA

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        q = (
            ING.stream_scd2(spark, src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    write_batch([(1, 10 * ns, 1, "view", 0.0, ""), (2, 20 * ns, 1, "view", 0.0, "")])
    assert drain().count() == 0  # interval still open
    write_batch([(3, 30 * ns, 1, "view", 0.0, ""), (4, 40 * ns, 1, "click", 0.0, "")])
    out = drain().collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.state, r.valid_from, r.valid_to, r.n_events) == (
        1, "view", 10 * ns // 1000, 40 * ns // 1000, 3,
    )


def test_streaming_kernels_reject_null_event_time_loudly(spark, tmp_table):
    """The stateful event-time kernels (stream_asof / stream_sessionize /
    stream_scd2) order on ts: a NULL ts used to die as int(NaN) /
    astype(int64) deep inside a task retry loop with no row pointer.
    They now fail the micro-batch with a ValueError naming the
    offending event_ids. A NULL value, by contrast, is SKIPPED by the
    sessionize sum exactly as batch SUM skips NULLs — including the
    corner where every value in the session is NULL and the sum is
    NULL, not 0."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    us = 1_000_000
    schema = ING.EVENTS_SCHEMA

    def run(stream_fn, rows, sub):
        src = f"{tmp_table}/{sub}/src"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            stream_fn(spark, src)
            .writeStream.format("memory")
            .queryName(f"q_{sub}")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_table}/{sub}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    bad = [(7, None, 1, "click", 0.0, "")]
    for fn, sub in (
        (ING.stream_asof, "nullts_asof"),
        (ING.stream_sessionize, "nullts_sess"),
        (ING.stream_scd2, "nullts_scd2"),
    ):
        with pytest.raises(StreamingQueryException, match="event_ids \\[7\\]"):
            run(fn, bad, sub)

    # NULL value: session still forms, sum skips the NULL
    src = f"{tmp_table}/nullval/src"
    spark.createDataFrame(
        [(1, 10 * us * 1000, 1, "click", None, ""),
         (2, 11 * us * 1000, 1, "click", 2.5, "")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        ING.stream_sessionize(spark, src)
        .writeStream.format("parquet")
        .option("path", f"{tmp_table}/nullval/out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_table}/nullval/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    # both events are in the (still-open) session; nothing emitted yet is
    # fine — drain with a session-closing third event far in the future
    spark.createDataFrame(
        [(3, 10_000 * us * 1000, 1, "click", 0.0, "")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        ING.stream_sessionize(spark, src)
        .writeStream.format("parquet")
        .option("path", f"{tmp_table}/nullval/out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_table}/nullval/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    closed = spark.read.parquet(f"{tmp_table}/nullval/out").collect()
    assert len(closed) == 1
    assert closed[0].n_events == 2
    assert closed[0].sum_value_micros == 2_500_000  # NULL skipped, 2.5 kept


def test_stream_sessionize_all_null_value_session_sums_to_null(
    spark, tmp_table
):
    """A session whose EVERY value is NULL must emit sum NULL (None) —
    batch SUM over an all-NULL group is NULL, and the stream twin's
    contract is exact closed-session equality with the batch operator."""
    us = 1_000_000
    src = f"{tmp_table}/allnull/src"
    spark.createDataFrame(
        [(1, 10 * us * 1000, 1, "click", None, ""),
         (2, 11 * us * 1000, 1, "click", None, ""),
         (3, 10_000 * us * 1000, 1, "click", 1.0, "")],  # closes it
        ING.EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        ING.stream_sessionize(spark, src)
        .writeStream.format("parquet")
        .option("path", f"{tmp_table}/allnull/out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_table}/allnull/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    closed = spark.read.parquet(f"{tmp_table}/allnull/out").collect()
    assert len(closed) == 1
    assert closed[0].n_events == 2
    assert closed[0].sum_value_micros is None  # NULL, not 0


def test_stream_scd2_null_event_type_matches_batch(spark, tmp_table):
    """NULL event_type island parity with the batch chg rule (lag IS
    NULL OR state <> lag): a NULL-state row is ABSORBED into the
    previous island, and the row after it always STARTS a new island —
    the old et.ne(et.shift()) run-split put the NULL row in its own
    island, and str(None) poisoned the state store with 'None'."""
    from tiny_md_hbase_spark.operators import timeseries as TS

    us = 1_000_000
    rows = [
        (1, 10 * us * 1000, 1, "a", 0.0, ""),
        (2, 20 * us * 1000, 1, None, 0.0, ""),
        (3, 30 * us * 1000, 1, "a", 0.0, ""),
        (4, 40 * us * 1000, 1, "b", 0.0, ""),
    ]
    ev = spark.createDataFrame(rows, ING.EVENTS_SCHEMA)
    want = sorted(
        (r.state, r.valid_from, r.valid_to, r.n_events)
        for r in TS.scd2_intervals(ev).filter("valid_to IS NOT NULL").collect()
    )
    src = f"{tmp_table}/scd2null/src"
    ev.coalesce(1).write.mode("append").parquet(src)
    q = (
        ING.stream_scd2(spark, src)
        .writeStream.format("parquet")
        .option("path", f"{tmp_table}/scd2null/out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_table}/scd2null/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        (r.state, r.valid_from, r.valid_to, r.n_events)
        for r in spark.read.parquet(f"{tmp_table}/scd2null/out").collect()
    )
    assert got == want
    # the absorbed NULL row: island 1 is ('a', n=2), then a NEW 'a'
    # island (row after a NULL state always starts one), then 'b' opens
    assert got == [("a", 10 * us, 30 * us, 2), ("a", 30 * us, 40 * us, 1)]


# --- streaming NEAR-dup: route-on-arrival MinHash-LSH ----------------------

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _near_doc(i: int, text: str | None) -> tuple:
    return (i, text, "en", "s", len(text) if text is not None else 0)


def test_stream_dedup_near_matches_batch_sql(spark):
    """The WHOLE drained multi-batch pair set equals the batch-form
    DuckDB twin (dedup.stream_dedup_near_sql) on a corpus with exact
    dups, a near-dup pair, and unrelated docs — the cross-engine check
    the registry oracle runs at sf0.01, pinned here at unit scale with
    explicit batch boundaries."""
    import duckdb

    from tiny_md_hbase_spark.operators.dedup import stream_dedup_near_sql

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")  # one token differs -> jac > 0.8
    rows1 = [
        _near_doc(1, base),
        _near_doc(2, base),  # exact dup of 1
        _near_doc(5, "completely different words about spark streaming state"),
    ]
    rows2 = [
        _near_doc(3, near),  # near-dup of 1/2, arrives a batch later
        _near_doc(7, "yet another unrelated document body with fresh tokens"),
    ]
    d = tempfile.mkdtemp(prefix="sneart_")
    try:
        spark.createDataFrame(rows1, _DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{d}/src"
        )
        time.sleep(1.1)
        spark.createDataFrame(rows2, _DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/src")
        q = ING.stream_dedup_near(
            spark,
            f"{d}/src",
            f"{d}/table",
            f"{d}/ckpt",
            max_bucket_width=None,
            available_now=True,
            max_files_per_trigger=1,
        )
        assert q.awaitTermination(300)
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.read.parquet(f"{d}/table/pairs").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                    "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows1 + rows2
        )
        want = sorted(con.execute(stream_dedup_near_sql()).fetchall())
        assert got == want
        assert (1, 2, 1.0) in [(a, b, j) for a, b, j in got]  # the exact dup
        assert any(b == 3 for _, b, _j in got)  # the cross-batch near-dup
        # state is hashes, not text: the hs table has one row per arrival
        assert spark.read.parquet(f"{d}/table/hs").count() == 5
        # exactly-once layout: every state/output table is a batch=<id>
        # partition tree each batch OVERWRITES (idempotent replay)
        for t in ("pairs", "bands", "hs"):
            subdirs = [
                x for x in os.listdir(f"{d}/table/{t}") if x.startswith("batch=")
            ]
            assert len(subdirs) >= 2, (t, subdirs)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_near_cap_keep_first(spark):
    """Bucket-cap semantics pinned: with max_bucket_width=2 and four
    identical docs (1,2 in batch 1; 3 same batch; 4 a batch later),
    enrollment is keep-FIRST (docs 1,2) — later arrivals still PROBE
    the full bucket (pairs to 1 and 2 found) but never enroll, so
    (3,4) is not emitted. Equal to the row_number-capped SQL form."""
    import duckdb

    from tiny_md_hbase_spark.operators.dedup import stream_dedup_near_sql

    text = "same identical content repeated across many arriving documents here"
    rows1 = [_near_doc(1, text), _near_doc(2, text), _near_doc(3, text)]
    rows2 = [_near_doc(4, text)]
    d = tempfile.mkdtemp(prefix="sneartc_")
    try:
        spark.createDataFrame(rows1, _DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{d}/src"
        )
        time.sleep(1.1)
        spark.createDataFrame(rows2, _DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/src")
        q = ING.stream_dedup_near(
            spark,
            f"{d}/src",
            f"{d}/table",
            f"{d}/ckpt",
            max_bucket_width=2,
            available_now=True,
            max_files_per_trigger=1,
        )
        assert q.awaitTermination(300)
        got = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/table/pairs").collect()
        )
        assert got == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
        # enrollment stopped at width 2: the band state holds docs 1,2 only
        enrolled = {
            r.doc_id for r in spark.read.parquet(f"{d}/table/bands").collect()
        }
        assert enrolled == {1, 2}
        # sketches persist only for ENROLLED docs: a doc capped out of
        # every bucket can never be the stored side of a future pair
        assert {
            r.doc_id for r in spark.read.parquet(f"{d}/table/hs").collect()
        } == {1, 2}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                    "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows1 + rows2
        )
        want = sorted(
            (a, b)
            for a, b, _j in con.execute(
                stream_dedup_near_sql(max_bucket_width=2)
            ).fetchall()
        )
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_near_degenerate_text(spark):
    """NULL / empty / whitespace-only texts all sketch to the same
    [''-shingle] set (the corpus-wide NULL ≡ '' convention) and pair at
    1.0 with each other — and never with a real document."""
    rows = [
        _near_doc(1, None),
        _near_doc(2, ""),
        _near_doc(3, "   "),
        _near_doc(4, "a real document with plenty of ordinary text tokens"),
    ]
    d = tempfile.mkdtemp(prefix="sneartn_")
    try:
        spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{d}/src"
        )
        q = ING.stream_dedup_near(
            spark, f"{d}/src", f"{d}/table", f"{d}/ckpt", available_now=True
        )
        assert q.awaitTermination(300)
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.read.parquet(f"{d}/table/pairs").collect()
        )
        assert got == [(1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_near_production_family_agrees(spark):
    """The production hash family (xxhash64 — one JVM hash per shingle)
    drains the same pair set WITH the same jaccard values as the
    portable batch-form SQL: both families' jaccards are set-Jaccard
    over (distinct) hashed shingles, which equals string-set Jaccard
    under either injective-enough hash — so the values, not just the
    pair ids, must agree."""
    import duckdb

    from tiny_md_hbase_spark.operators.dedup import stream_dedup_near_sql

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        _near_doc(1, base),
        _near_doc(2, base),
        _near_doc(3, base.replace("today", "tonight")),
        _near_doc(5, "completely different words about spark streaming state"),
    ]
    d = tempfile.mkdtemp(prefix="sneartx_")
    try:
        spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{d}/src"
        )
        q = ING.stream_dedup_near(
            spark,
            f"{d}/src",
            f"{d}/table",
            f"{d}/ckpt",
            max_bucket_width=None,
            hash_family="xxhash64",
            available_now=True,
        )
        assert q.awaitTermination(300)
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.read.parquet(f"{d}/table/pairs").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                    "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
        want = sorted(con.execute(stream_dedup_near_sql()).fetchall())
        assert got == want
        with pytest.raises(ValueError, match="hash_family"):
            from tiny_md_hbase_spark.operators.dedup import _hashed_shingles
            _hashed_shingles(spark.createDataFrame(rows, _DOCS_SCHEMA), 3, "md5")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_near_param_marker_guards_state(spark):
    """Re-draining into an existing state directory with different LSH
    parameters raises loudly (mixing hash domains would silently miss
    pairs); the original parameters keep working."""
    rows = [_near_doc(1, "some ordinary document text tokens here")]
    d = tempfile.mkdtemp(prefix="sneartp_")
    try:
        spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{d}/src1"
        )
        q = ING.stream_dedup_near(
            spark, f"{d}/src1", f"{d}/table", f"{d}/ckpt1", available_now=True
        )
        assert q.awaitTermination(300)
        assert spark.read.parquet(f"{d}/table/_params").collect()[0].bands == 4

        spark.createDataFrame(
            [_near_doc(2, "more text")], _DOCS_SCHEMA
        ).coalesce(1).write.parquet(f"{d}/src2")
        q2 = ING.stream_dedup_near(
            spark, f"{d}/src2", f"{d}/table", f"{d}/ckpt2",
            hash_family="xxhash64", available_now=True,
        )
        with pytest.raises(Exception, match="hash_family|mixing hash domains"):
            q2.awaitTermination(300)
            raise AssertionError("drain with mismatched params must fail")
        # the original parameters still drain fine
        q3 = ING.stream_dedup_near(
            spark, f"{d}/src2", f"{d}/table", f"{d}/ckpt3", available_now=True
        )
        assert q3.awaitTermination(300)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_docs_batch_replay_idempotent(spark):
    """The exactly-once claim, exercised directly: re-running a batch
    (foreachBatch replay after a crash-before-checkpoint) rewrites
    IDENTICAL state — in particular the seen-set read must exclude the
    batch's own prior partition, or the anti-join would erase the
    batch's survivors (data loss, the inverse of the duplicate-append
    this layout replaced)."""
    d = tempfile.mkdtemp(prefix="sdedupr_")
    try:
        b0 = spark.createDataFrame(
            [_near_doc(10, "alpha content"), _near_doc(11, "beta content")],
            _DOCS_SCHEMA,
        )
        b1 = spark.createDataFrame(
            [_near_doc(1, "alpha content"), _near_doc(13, "gamma content")],
            _DOCS_SCHEMA,
        )
        ING.dedup_docs_batch(b0, 0, f"{d}/t")
        once = sorted(
            r.doc_id for r in spark.read.parquet(f"{d}/t/docs").collect()
        )
        ING.dedup_docs_batch(b0, 0, f"{d}/t")  # replay batch 0
        replayed = sorted(
            r.doc_id for r in spark.read.parquet(f"{d}/t/docs").collect()
        )
        assert replayed == once == [10, 11]  # NOT empty, NOT doubled
        ING.dedup_docs_batch(b1, 1, f"{d}/t")
        ING.dedup_docs_batch(b1, 1, f"{d}/t")  # replay batch 1 too
        final = sorted(
            r.doc_id for r in spark.read.parquet(f"{d}/t/docs").collect()
        )
        assert final == [10, 11, 13]  # doc 1's content was seen in batch 0
        assert spark.read.parquet(f"{d}/t/seen").count() == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_near_batch_replay_idempotent(spark):
    """Replaying a capped near-dup batch rewrites identical pairs AND
    identical enrollment: the state reads exclude the batch's own prior
    partitions, so the occupancy count doesn't double (which would
    evict enrolled docs) and the verify union doesn't duplicate
    sketches (which would duplicate pair rows)."""
    text = "same identical content repeated across many arriving documents here"
    b0 = spark.createDataFrame(
        [_near_doc(1, text), _near_doc(2, text), _near_doc(3, text)],
        _DOCS_SCHEMA,
    )
    b1 = spark.createDataFrame([_near_doc(4, text)], _DOCS_SCHEMA)
    d = tempfile.mkdtemp(prefix="sdednr_")
    try:
        kw = dict(max_bucket_width=2)
        ING.dedup_near_batch(b0, 0, f"{d}/t", **kw)
        once = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/t/pairs").collect()
        )
        ING.dedup_near_batch(b0, 0, f"{d}/t", **kw)  # replay batch 0
        replayed = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/t/pairs").collect()
        )
        assert replayed == once == [(1, 2), (1, 3), (2, 3)]
        enrolled = {
            r.doc_id for r in spark.read.parquet(f"{d}/t/bands").collect()
        }
        assert enrolled == {1, 2}  # replay didn't double-count occupancy
        ING.dedup_near_batch(b1, 1, f"{d}/t", **kw)
        ING.dedup_near_batch(b1, 1, f"{d}/t", **kw)  # replay batch 1
        final = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/t/pairs").collect()
        )
        assert final == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
        assert {
            r.doc_id for r in spark.read.parquet(f"{d}/t/hs").collect()
        } == {1, 2}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_near_restart_continues_state(spark):
    """A SECOND drain on the same checkpoint + table continues where
    the first stopped: already-processed files are not re-read (the
    pairs/bands/hs batch directories from run 1 are untouched), and
    newly arrived files pair against run 1's persisted state."""
    text = "the quick brown fox jumps over the lazy dog again and again today"
    d = tempfile.mkdtemp(prefix="sneartr_")
    try:
        spark.createDataFrame(
            [_near_doc(1, text)], _DOCS_SCHEMA
        ).coalesce(1).write.parquet(f"{d}/src")
        q = ING.stream_dedup_near(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt", available_now=True
        )
        assert q.awaitTermination(300)
        assert spark.read.parquet(f"{d}/t/pairs").count() == 0
        bands_run1 = spark.read.parquet(f"{d}/t/bands").count()

        # more files arrive; a NEW query on the SAME checkpoint drains
        # only them (batch ids continue, state accumulates)
        time.sleep(1.1)
        spark.createDataFrame(
            [_near_doc(2, text), _near_doc(3, text.replace("today", "tonight"))],
            _DOCS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(f"{d}/src")
        q2 = ING.stream_dedup_near(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt", available_now=True
        )
        assert q2.awaitTermination(300)
        got = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/t/pairs").collect()
        )
        # doc 2 paired against run 1's PERSISTED doc-1 state; doc 3 is a
        # near-dup of both
        assert got == [(1, 2), (1, 3), (2, 3)]
        # run 1's enrollment was continued, not recomputed: its batch=0
        # rows are still there and run 2 added its own batch dirs
        assert spark.read.parquet(f"{d}/t/bands").count() > bands_run1
        batches = {
            x for x in os.listdir(f"{d}/t/bands") if x.startswith("batch=")
        }
        assert "batch=0" in batches and len(batches) >= 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_sample_equals_batch_sampler(spark):
    """The drained k-bounded state re-tops to EXACTLY the batch DLT
    sample — same rows, same unrounded priority/est doubles — across
    multiple batches. Doc 2 (second-strongest priority, FIRST arrival
    file) persists through every subsequent state top, pinning that the
    latest-directory read carries early arrivals forward; the strongest
    doc (9) arrives last and must displace correctly."""
    from tiny_md_hbase_spark.operators.text import corpus_weighted_sample

    rows = [
        _near_doc(i, "x " * (10 + 7 * i)) for i in range(1, 10)
    ]  # varying n_chars -> varying weights
    d = tempfile.mkdtemp(prefix="ssamp_")
    try:
        all_docs = spark.createDataFrame(rows, _DOCS_SCHEMA)
        # three ordered arrival files
        for i, sl in enumerate((rows[:3], rows[3:6], rows[6:])):
            spark.createDataFrame(sl, _DOCS_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(f"{d}/src")
            time.sleep(1.1)
        q = ING.stream_sample(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt",
            k=3, available_now=True, max_files_per_trigger=1,
        )
        assert q.awaitTermination(300)
        got = [
            (r.doc_id, r.source, r.weight, r.priority, r.est)
            for r in ING.read_stream_sample(spark, f"{d}/t", k=3).collect()
        ]
        want = [
            (r.doc_id, r.source, r.weight, r.priority, r.est)
            for r in corpus_weighted_sample(all_docs, k=3).collect()
        ]
        assert got == want and len(got) == 3
        # state stayed k-bounded per directory
        for b in os.listdir(f"{d}/t/state"):
            assert spark.read.parquet(f"{d}/t/state/{b}").count() <= 4
        # k is pinned in the _params marker: a mismatched read refuses
        with pytest.raises(ValueError, match="k=3"):
            ING.read_stream_sample(spark, f"{d}/t", k=10)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sample_topk_batch_replay_idempotent(spark):
    """Replaying a sampler batch rewrites identical state: the state
    read excludes the batch's own prior partition, so the merge runs
    against the same pre-batch top."""
    from tiny_md_hbase_spark.operators.text import corpus_weighted_sample

    b0 = spark.createDataFrame(
        [_near_doc(i, "y " * (5 + 3 * i)) for i in range(1, 5)], _DOCS_SCHEMA
    )
    b1 = spark.createDataFrame(
        [_near_doc(i, "y " * (5 + 3 * i)) for i in range(5, 8)], _DOCS_SCHEMA
    )
    d = tempfile.mkdtemp(prefix="ssampr_")
    try:
        ING.sample_topk_batch(b0, 0, f"{d}/t", k=2)
        once = sorted(
            (r.doc_id, r.q)
            for r in spark.read.parquet(f"{d}/t/state/batch=0").collect()
        )
        ING.sample_topk_batch(b0, 0, f"{d}/t", k=2)  # replay
        again = sorted(
            (r.doc_id, r.q)
            for r in spark.read.parquet(f"{d}/t/state/batch=0").collect()
        )
        assert again == once and len(once) == 3  # k+1
        ING.sample_topk_batch(b1, 1, f"{d}/t", k=2)
        ING.sample_topk_batch(b1, 1, f"{d}/t", k=2)  # replay batch 1
        got = [
            (r.doc_id, r.priority)
            for r in ING.read_stream_sample(spark, f"{d}/t", k=2).collect()
        ]
        want = [
            (r.doc_id, r.priority)
            for r in corpus_weighted_sample(
                b0.unionByName(b1), k=2
            ).collect()
        ]
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_sample_empty_and_duplicate_rows(spark):
    """Contract edges: (a) a never-drained table reads back as the
    EMPTY relation (like the batch op on an empty corpus), not a
    PATH_NOT_FOUND crash; (b) re-delivered identical rows inside one
    batch are absorbed exactly — they must not burn top-(k+1) slots and
    evict a true member."""
    d = tempfile.mkdtemp(prefix="ssampe_")
    try:
        out = ING.read_stream_sample(spark, f"{d}/never_drained", k=5)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "source", "weight", "priority", "est",
        ]

        from tiny_md_hbase_spark.operators.text import corpus_weighted_sample

        rows = [_near_doc(i, "z " * (4 + 3 * i)) for i in range(1, 6)]
        # doc 5 (strong) re-delivered twice in the same batch
        dup_batch = spark.createDataFrame(rows + [rows[-1]], _DOCS_SCHEMA)
        ING.sample_topk_batch(dup_batch, 0, f"{d}/t", k=2)
        got = [
            (r.doc_id, r.priority)
            for r in ING.read_stream_sample(spark, f"{d}/t", k=2).collect()
        ]
        want = [
            (r.doc_id, r.priority)
            for r in corpus_weighted_sample(
                spark.createDataFrame(rows, _DOCS_SCHEMA), k=2
            ).collect()
        ]
        assert got == want  # the duplicate copy burned no slot
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- streaming state compaction + bucket pruning (r12) ---------------------

def test_dedup_near_state_compacts_and_matches(spark):
    """Snapshot compaction is invisible to results: a many-batch drive
    with compact_every=3 emits EXACTLY the pair set of an uncompacted
    run, while the bands/hs trees end with one snapshot plus a bounded
    set of live batch directories (per-batch listing O(snapshot +
    compact_every), not O(all batches ever — the state-growth defect
    this replaces)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    batches = [
        [_near_doc(1, base)],
        [_near_doc(2, base)],  # pairs with 1
        [_near_doc(3, "completely unrelated text about something else here")],
        [_near_doc(4, base.replace("today", "tonight"))],  # near-dup of 1,2
        [_near_doc(5, "another distinct document body with its own words")],
        [_near_doc(6, base)],  # pairs with 1,2,4
        [_near_doc(7, "yet more unrelated filler text to round out state")],
        [_near_doc(8, base.replace("quick", "rapid"))],
    ]
    d = tempfile.mkdtemp(prefix="scompact_")
    try:
        for ce, sub in ((3, "c"), (10_000, "u")):
            for i, rows in enumerate(batches):
                ING.dedup_near_batch(
                    spark.createDataFrame(rows, _DOCS_SCHEMA),
                    i,
                    f"{d}/{sub}",
                    compact_every=ce,
                )
        compacted = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.read.parquet(f"{d}/c/pairs").collect()
        )
        uncompacted = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.read.parquet(f"{d}/u/pairs").collect()
        )
        assert compacted == uncompacted and len(compacted) >= 3
        for state in ("bands", "hs"):
            names = os.listdir(f"{d}/c/{state}")
            snaps = [x for x in names if x.startswith("snapshot=")]
            live = [x for x in names if x.startswith("batch=")]
            assert len(snaps) == 1, names
            cutoff = int(snaps[0].split("=")[1])
            # every surviving batch dir is above the fold cutoff, and
            # fewer than compact_every + the running batch remain
            assert all(int(x.split("=")[1]) > cutoff for x in live)
            assert len(live) <= 4, names
            assert not [x for x in os.listdir(f"{d}/u/{state}") if "snapshot" in x]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_docs_seen_compacts_and_matches(spark):
    """The exact-dedup twin of the compaction test: keep-first-arrival
    survivors identical with and without compaction, and the seen tree
    folds into a snapshot."""
    texts = ["alpha", "beta", "alpha", "gamma", "beta", "delta", "alpha", "eps"]
    d = tempfile.mkdtemp(prefix="scompactd_")
    try:
        for ce, sub in ((2, "c"), (10_000, "u")):
            for i, t in enumerate(texts):
                ING.dedup_docs_batch(
                    spark.createDataFrame(
                        [_near_doc(100 + i, t + " content body")], _DOCS_SCHEMA
                    ),
                    i,
                    f"{d}/{sub}",
                    compact_every=ce,
                )
        for sub in ("c", "u"):
            got = sorted(
                r.doc_id for r in spark.read.parquet(f"{d}/{sub}/docs").collect()
            )
            assert got == [100, 101, 103, 105, 107]  # first arrival per content
        assert [
            x for x in os.listdir(f"{d}/c/seen") if x.startswith("snapshot=")
        ]
        assert spark.read.parquet(f"{d}/c/docs").count() == 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_state_layout_crash_windows_read_exactly_once(spark):
    """Every compaction crash window leaves a tree the selection rule
    reads exactly once: batch dirs at/below the committed snapshot
    cutoff are ignored (leftovers of an interrupted delete), an
    UNCOMMITTED snapshot (no _SUCCESS) is ignored, and the next
    compaction sweep removes the dead directories."""
    d = tempfile.mkdtemp(prefix="scrash_")
    spath = f"{d}/state"
    schema = "h long"
    try:
        def w(rows, sub):
            spark.createDataFrame([(r,) for r in rows], schema).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{spath}/{sub}")

        w([1, 2, 3], "snapshot=2")   # committed snapshot: folded batches 0-2
        w([1], "batch=1")            # leftover of an interrupted delete
        w([4], "batch=3")            # live
        w([5], "batch=4")            # live
        got = sorted(
            r.h
            for r in ING._read_state(
                spark, spath, exclude_batch=99, schema=schema, cols=["h"]
            ).collect()
        )
        assert got == [1, 2, 3, 4, 5]  # batch=1's copy of h=1 read ONCE

        # an uncommitted snapshot must be invisible
        w([7, 8, 9], "snapshot=4")
        os.remove(f"{spath}/snapshot=4/_SUCCESS")
        snap, cutoff, live = ING._state_layout(spark, spath)
        assert cutoff == 2 and snap.endswith("snapshot=2")
        assert sorted(live) == [3, 4]

        # the opportunistic sweep removes dead dirs without folding
        ING._maybe_compact(spark, spath, batch_id=5, every=10_000, schema=schema)
        assert "batch=1" not in os.listdir(spath)
        got2 = sorted(
            r.h
            for r in ING._read_state(
                spark, spath, exclude_batch=99, schema=schema, cols=["h"]
            ).collect()
        )
        assert got2 == [1, 2, 3, 4, 5]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_near_replay_idempotent_after_compaction(spark):
    """Replay of the RUNNING batch stays exactly-once when compaction
    fires during its first attempt: compaction folds only ids strictly
    below the running batch, so the own-batch exclusion still sees (and
    skips) the prior attempt's directory."""
    text = "same identical content repeated across many arriving documents here"
    d = tempfile.mkdtemp(prefix="sreplayc_")
    try:
        for i in range(4):
            ING.dedup_near_batch(
                spark.createDataFrame([_near_doc(i, text)], _DOCS_SCHEMA),
                i,
                f"{d}/t",
                compact_every=2,
            )
        once = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/t/pairs").collect()
        )
        # replay batch 3 (the compaction that ran during it already
        # folded 0..2 — its own dir must still be excluded, not folded)
        ING.dedup_near_batch(
            spark.createDataFrame([_near_doc(3, text)], _DOCS_SCHEMA),
            3,
            f"{d}/t",
            compact_every=2,
        )
        replayed = sorted(
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{d}/t/pairs").collect()
        )
        assert replayed == once == [
            (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bands_state_read_prunes_to_touched_buckets(spark):
    """The listing-level pruning claim, pinned on inputFiles: a bands
    state read for one touched bucket hands ONLY that bucket's
    directories to the reader (path selection — untouched buckets are
    never listed), so per-batch state bytes scale with touched buckets,
    not total state."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        _near_doc(i, f"{base} variant {i} with distinct shingle content {i}")
        for i in range(1, 30)
    ]
    d = tempfile.mkdtemp(prefix="sprune_")
    try:
        ING.dedup_near_batch(
            spark.createDataFrame(rows, _DOCS_SCHEMA), 0, f"{d}/t"
        )
        all_buckets = sorted(
            int(x.split("=")[1])
            for x in os.listdir(f"{d}/t/bands/batch=0")
            if x.startswith("bucket=")
        )
        assert len(all_buckets) >= 2  # the probe needs >1 bucket to prune
        probe = all_buckets[0]
        df = ING._read_state(
            spark,
            f"{d}/t/bands",
            exclude_batch=99,
            schema=ING.BANDS_STATE_SCHEMA,
            cols=["doc_id", "band", "bhash"],
            bucket_in=[probe],
        )
        files = df.inputFiles()
        assert files and all(f"bucket={probe}/" in f for f in files)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r13: state discovery on URI-scheme paths (Hadoop FileSystem API) ------
#
# Every sink family's state machinery must work when table_path carries a
# URI scheme — file:///… here exercises exactly the spark._jvm FileSystem
# call path that hdfs:// and s3a:// resolve through (only the FS impl
# differs), where the old driver-local os.listdir port raised.


def test_fs_helpers_uri_and_local_agree(spark):
    """fs_exists/fs_listdir/fs_rmtree/fs_du give identical answers for a
    bare local path and its file:// URI twin."""
    d = tempfile.mkdtemp(prefix="fsuri_")
    try:
        spark.range(5).coalesce(1).write.parquet(f"{d}/t/batch=0")
        uri = f"file://{d}/t"
        assert ING.fs_exists(spark, f"{d}/t") and ING.fs_exists(spark, uri)
        assert sorted(ING.fs_listdir(spark, uri)) == sorted(
            ING.fs_listdir(spark, f"{d}/t")
        )
        assert "batch=0" in ING.fs_listdir(spark, uri)
        assert ING.fs_du(spark, uri) == ING.fs_du(spark, f"{d}/t") > 0
        # missing paths: exists False, listdir [], du 0, rmtree no-op
        assert not ING.fs_exists(spark, f"{uri}/nope")
        assert ING.fs_listdir(spark, f"{uri}/nope") == []
        assert ING.fs_du(spark, f"{uri}/nope") == 0
        ING.fs_rmtree(spark, f"{uri}/nope")
        ING.fs_rmtree(spark, f"{uri}/batch=0")
        assert not os.path.exists(f"{d}/t/batch=0")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_docs_uri_table_path_compacts(spark):
    """stream_dedup_docs' batch body over a file:// table_path: cross-
    batch dedup, snapshot compaction (fs_rmtree of folded dirs), and
    replay idempotence all run through the FS API."""
    d = tempfile.mkdtemp(prefix="uridocs_")
    uri = f"file://{d}/t"
    try:
        batches = [
            [(1, "shared content one", "en", "s", 18), (2, "unique two", "en", "s", 10)],
            [(3, "shared content one", "en", "s", 18), (4, "unique four", "en", "s", 11)],
            [(5, "unique five", "en", "s", 11)],
        ]
        for i, rows in enumerate(batches):
            ING.dedup_docs_batch(
                spark.createDataFrame(rows, _DOCS_SCHEMA), i, uri, compact_every=2
            )
        ids = sorted(r.doc_id for r in spark.read.parquet(f"{uri}/docs").collect())
        assert ids == [1, 2, 4, 5]  # doc 3's content already seen
        # compaction folded batches 0-1 into a snapshot and deleted them
        seen_dirs = sorted(os.listdir(f"{d}/t/seen"))
        assert "snapshot=1" in seen_dirs and "batch=0" not in seen_dirs
        # replay the last batch: identical result (own-batch exclusion)
        ING.dedup_docs_batch(
            spark.createDataFrame(batches[2], _DOCS_SCHEMA), 2, uri, compact_every=2
        )
        again = sorted(r.doc_id for r in spark.read.parquet(f"{uri}/docs").collect())
        assert again == ids
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_near_uri_table_path(spark):
    """stream_dedup_near's batch body over a file:// table_path: the
    bucket-partitioned bands state (fs_exists path selection) finds the
    cross-batch pair."""
    text = "the same near duplicate content shared by both documents here now"
    d = tempfile.mkdtemp(prefix="urinear_")
    uri = f"file://{d}/t"
    try:
        ING.dedup_near_batch(
            spark.createDataFrame([_near_doc(1, text)], _DOCS_SCHEMA), 0, uri
        )
        ING.dedup_near_batch(
            spark.createDataFrame([_near_doc(2, text)], _DOCS_SCHEMA), 1, uri
        )
        pairs = [
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(f"{uri}/pairs").collect()
        ]
        assert pairs == [(1, 2)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sampler_uri_table_path(spark):
    """Both samplers (global + stratified) over a file:// table_path:
    _params marker, latest-dir state, pruning, and the drained read all
    run through the FS API and equal the batch operators."""
    from tiny_md_hbase_spark.operators.text import (
        corpus_stratified_weighted,
        corpus_weighted_sample,
    )

    rows = [
        (10 * s + i, f"w {s} {i} " * (2 + i), "en", f"s{s}", 5 + 3 * i + s)
        for s in range(2)
        for i in range(4)
    ]
    d = tempfile.mkdtemp(prefix="urisamp_")
    try:
        all_docs = spark.createDataFrame(rows, _DOCS_SCHEMA)
        uri_g, uri_s = f"file://{d}/g", f"file://{d}/s"
        for b, chunk in enumerate([rows[:5], rows[5:]]):
            bdf = spark.createDataFrame(chunk, _DOCS_SCHEMA)
            ING.sample_topk_batch(bdf, b, uri_g, k=3)
            ING.sample_stratified_batch(bdf, b, uri_s, k=2)
        got_g = [
            (r.doc_id, r.priority)
            for r in ING.read_stream_sample(spark, uri_g, k=3).collect()
        ]
        want_g = [
            (r.doc_id, r.priority)
            for r in corpus_weighted_sample(all_docs, k=3).collect()
        ]
        assert got_g == want_g
        got_s = [
            (r.source, r.doc_id, r.priority)
            for r in ING.read_stream_sample_stratified(spark, uri_s, k=2).collect()
        ]
        want_s = [
            (r.source, r.doc_id, r.priority)
            for r in corpus_stratified_weighted(all_docs, k=2).collect()
        ]
        assert got_s == want_s
        # pruning kept <= 2 state dirs, through fs_rmtree
        assert len(os.listdir(f"{d}/g/state")) <= 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_uri_table_path(spark):
    """merge_manifest_batch's existence check over a file:// path: the
    second batch MERGES (sees the first) instead of overwriting from
    scratch, and the replay stamp still guards."""
    d = tempfile.mkdtemp(prefix="urimani_")
    uri = f"file://{d}/t/manifest"
    try:
        b0 = spark.createDataFrame(
            [(1, "alpha words here", "en", "s", 16)], _DOCS_SCHEMA
        )
        b1 = spark.createDataFrame(
            [(2, "beta words there", "en", "s", 16)], _DOCS_SCHEMA
        )
        assert ING.merge_manifest_batch(b0, 0, uri, shards=4)
        assert ING.merge_manifest_batch(b1, 1, uri, shards=4)
        total = spark.read.parquet(uri).agg(F.sum("n_docs")).first()[0]
        assert total == 2  # second batch merged, not re-bootstrapped
        assert not ING.merge_manifest_batch(b1, 1, uri, shards=4)  # replay
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_sample_cross_batch_redelivery_absorbed(spark):
    """A row re-delivered in a LATER batch must not burn a second state
    slot (the r11 advisor finding): with k=2 and the strong doc
    re-delivered after its first arrival, the drained sample still
    equals the batch sampler over the DISTINCT corpus."""
    from tiny_md_hbase_spark.operators.text import corpus_weighted_sample

    rows = [_near_doc(i, "z " * (4 + 3 * i)) for i in range(1, 6)]
    d = tempfile.mkdtemp(prefix="ssampx_")
    try:
        ING.sample_topk_batch(
            spark.createDataFrame(rows, _DOCS_SCHEMA), 0, f"{d}/t", k=2
        )
        # batch 1 re-delivers the two strongest docs and adds a weak one
        ING.sample_topk_batch(
            spark.createDataFrame(
                [rows[-1], rows[-2], _near_doc(99, "z z")], _DOCS_SCHEMA
            ),
            1,
            f"{d}/t",
            k=2,
        )
        got = [
            (r.doc_id, r.priority)
            for r in ING.read_stream_sample(spark, f"{d}/t", k=2).collect()
        ]
        want = [
            (r.doc_id, r.priority)
            for r in corpus_weighted_sample(
                spark.createDataFrame(rows + [_near_doc(99, "z z")], _DOCS_SCHEMA),
                k=2,
            ).collect()
        ]
        assert got == want  # redelivered copies burned no slots
        # and the state itself holds no duplicate doc_id
        state = spark.read.parquet(f"{d}/t/state/batch=1")
        assert state.count() == state.select("doc_id").distinct().count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r12 new operators: stratified sampling + streaming decontamination ----

def test_corpus_stratified_weighted_per_source_semantics(spark, sf_dir):
    """Each source yields an INDEPENDENT DLT sample: per-source row
    count == min(k, source size), and a source's rows equal the global
    sampler run on that source alone (same priorities, same per-source
    tau) — the defining property of stratification."""
    from tiny_md_hbase_spark.operators.text import (
        corpus_stratified_weighted,
        corpus_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = corpus_stratified_weighted(docs, k=10)
    rows = got.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    sizes = {
        r.source: r.n
        for r in docs.filter(F.col("n_chars") > 0)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_src) == set(sizes)
    for src, srows in per_src.items():
        assert len(srows) == min(10, sizes[src])
        solo = corpus_weighted_sample(
            docs.filter(F.col("source") == src), k=10
        ).collect()
        assert [(r.doc_id, r.priority, r.est) for r in sorted(srows, key=lambda r: (-r.priority, r.doc_id))] == [
            (r.doc_id, r.priority, r.est) for r in solo
        ]


def test_stream_sample_stratified_equals_batch(spark):
    """Multi-batch drain == the batch operator over everything arrived,
    with redelivered rows absorbed across batches and the state bounded
    per source."""
    from tiny_md_hbase_spark.operators.text import corpus_stratified_weighted
    from tiny_md_hbase_spark.streaming.ingest import (
        read_stream_sample_stratified,
        sample_stratified_batch,
    )

    rows = [
        (100 * s + i, f"doc {s} {i} " * (3 + i), "en", f"s{s}", 10 + 7 * i + s)
        for s in range(3)
        for i in range(6)
    ]
    d = tempfile.mkdtemp(prefix="sstrat_")
    try:
        all_docs = spark.createDataFrame(rows, _DOCS_SCHEMA)
        b0 = spark.createDataFrame(rows[:7], _DOCS_SCHEMA)
        # batch 1 redelivers two of batch 0's rows and adds the rest
        b1 = spark.createDataFrame(rows[5:] + rows[:2], _DOCS_SCHEMA)
        sample_stratified_batch(b0, 0, f"{d}/t", k=3)
        sample_stratified_batch(b1, 1, f"{d}/t", k=3)
        got = [
            (r.source, r.doc_id, r.priority, r.est)
            for r in read_stream_sample_stratified(spark, f"{d}/t", k=3).collect()
        ]
        want = [
            (r.source, r.doc_id, r.priority, r.est)
            for r in corpus_stratified_weighted(all_docs, k=3).collect()
        ]
        assert got == want and len(got) == 9  # 3 sources x k=3
        # state bounded: latest dir holds <= n_sources x (k+1) rows
        state = spark.read.parquet(f"{d}/t/state/batch=1")
        assert state.count() <= 3 * 4
        # replay of batch 1 rewrites identical state
        sample_stratified_batch(b1, 1, f"{d}/t", k=3)
        again = [
            (r.source, r.doc_id, r.priority, r.est)
            for r in read_stream_sample_stratified(spark, f"{d}/t", k=3).collect()
        ]
        assert again == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_decontaminate_planted_hits_and_replay(spark):
    """Planted contamination is caught at arrival across batches (the
    eval table is computed once and hit by every later batch), clean
    docs produce no hits, and replaying a batch rewrites identical
    hits (stateless + per-batch overwrite = exactly-once)."""
    from tiny_md_hbase_spark.streaming.ingest import (
        decontaminate_batch_hits,
        stream_decontaminate,
    )

    contaminated = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = tempfile.mkdtemp(prefix="sdecont_")
    try:
        eval_docs = spark.createDataFrame(
            [(50, contaminated, "en", "eval", len(contaminated))], _DOCS_SCHEMA
        )
        # batch 0: one clean doc; batch 1: one contaminated (shares the
        # full 8-gram prefix) + one clean
        b0 = spark.createDataFrame(
            [(1, "totally unrelated words here about something else entirely now", "en", "s", 60)],
            _DOCS_SCHEMA,
        )
        b1 = spark.createDataFrame(
            [
                (2, "alpha beta gamma delta epsilon zeta eta theta extra tail", "en", "s", 57),
                (3, "another clean document with no overlap at all present here", "en", "s", 58),
            ],
            _DOCS_SCHEMA,
        )
        b0.coalesce(1).write.parquet(f"{d}/src")
        time.sleep(1.1)
        b1.coalesce(1).write.mode("append").parquet(f"{d}/src")
        q = stream_decontaminate(
            spark,
            f"{d}/src",
            f"{d}/t",
            f"{d}/ckpt",
            eval_docs=eval_docs,
            available_now=True,
            max_files_per_trigger=1,
        )
        assert q.awaitTermination(300)
        got = [
            (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
            for r in spark.read.parquet(f"{d}/t/hits").collect()
        ]
        assert got == [(2, 50, 1)]  # one shared 8-gram: the common prefix
        # replay the contaminated batch body directly: identical hits
        decontaminate_batch_hits(b1, 1, f"{d}/t", gram_n=8)
        again = [
            (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
            for r in spark.read.parquet(f"{d}/t/hits").collect()
        ]
        assert again == got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_decontaminate_redoes_partial_eval_grams(spark):
    """A crash mid-materialization leaves _eval_grams without _SUCCESS;
    restart must REDO it (mode=overwrite) instead of silently reusing
    the partial gram table and missing contamination — the r12 advisor
    finding. Staged here by writing a DECOY gram table and deleting its
    _SUCCESS: if the bootstrap skipped, the planted hit would be missed."""
    from tiny_md_hbase_spark.streaming.ingest import stream_decontaminate

    contaminated = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = tempfile.mkdtemp(prefix="sdecontp_")
    try:
        # partial (uncommitted) eval grams: WRONG content, no _SUCCESS
        spark.createDataFrame(
            [(999, "nomatch")], "eval_doc_id long, g string"
        ).coalesce(1).write.parquet(f"{d}/t/_eval_grams")
        os.remove(f"{d}/t/_eval_grams/_SUCCESS")

        eval_docs = spark.createDataFrame(
            [(50, contaminated, "en", "eval", len(contaminated))], _DOCS_SCHEMA
        )
        spark.createDataFrame(
            [(2, contaminated + " extra tail", "en", "s", 70)], _DOCS_SCHEMA
        ).coalesce(1).write.parquet(f"{d}/src")
        q = stream_decontaminate(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt", eval_docs=eval_docs
        )
        assert q.awaitTermination(300)
        got = [
            (r.train_doc_id, r.eval_doc_id)
            for r in spark.read.parquet(f"{d}/t/hits").collect()
        ]
        assert got == [(2, 50)]  # the decoy table was redone, hit found
        assert os.path.exists(f"{d}/t/_eval_grams/_SUCCESS")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_decontaminate_oversized_eval_falls_back_to_shuffle(spark):
    """The broadcast contract (r12 verdict #5): above
    eval_broadcast_max_bytes the per-batch join degrades to a shuffle
    join instead of OOMing the executors — same hits either way. Staged
    by forcing the threshold to 0 so the measured gram table is always
    'oversized'; the direct batch body pins that broadcast_eval=False
    produces the identical hit set."""
    from tiny_md_hbase_spark.streaming.ingest import (
        decontaminate_batch_hits,
        stream_decontaminate,
    )

    contaminated = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = tempfile.mkdtemp(prefix="sdeconts_")
    try:
        eval_docs = spark.createDataFrame(
            [(50, contaminated, "en", "eval", len(contaminated))], _DOCS_SCHEMA
        )
        b = spark.createDataFrame(
            [
                # shares exactly the first 8-gram with the eval doc
                (2, "alpha beta gamma delta epsilon zeta eta theta extra tail", "en", "s", 57),
                (3, "clean words entirely unrelated to anything held out here", "en", "s", 57),
            ],
            _DOCS_SCHEMA,
        )
        b.coalesce(1).write.parquet(f"{d}/src")
        q = stream_decontaminate(
            spark,
            f"{d}/src",
            f"{d}/t",
            f"{d}/ckpt",
            eval_docs=eval_docs,
            eval_broadcast_max_bytes=0,  # every real table is 'oversized'
        )
        assert q.awaitTermination(300)
        got = [
            (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
            for r in spark.read.parquet(f"{d}/t/hits").collect()
        ]
        assert got == [(2, 50, 1)]
        # the two join strategies agree row-for-row on the same batch
        decontaminate_batch_hits(b, 0, f"{d}/t", broadcast_eval=True)
        bc = sorted(
            (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
            for r in spark.read.parquet(f"{d}/t/hits").collect()
        )
        decontaminate_batch_hits(b, 0, f"{d}/t", broadcast_eval=False)
        sh = sorted(
            (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
            for r in spark.read.parquet(f"{d}/t/hits").collect()
        )
        assert bc == sh == [(2, 50, 1)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r13: streaming OUTPUT compaction ---------------------------------------

def _stage_docs_batches(spark, uri, n_batches=5):
    rows = lambda b: [  # noqa: E731
        (100 * b + i, f"doc body {b} {i} words", "en", "s", 20)
        for i in range(4)
    ] + ([(100 * b + 50, "doc body 0 0 words", "en", "s", 20)] if b else [])
    for b in range(n_batches):
        ING.dedup_docs_batch(
            spark.createDataFrame(rows(b), _DOCS_SCHEMA), b, uri, compact_every=3
        )


def test_output_compaction_preserves_drain(spark):
    """compact_stream_output folds drained docs/batch=<id> dirs into one
    size-targeted snapshot; read_stream_output returns the identical
    relation before and after, and the listing drops to snapshot+newest."""
    d = tempfile.mkdtemp(prefix="ocompact_")
    t = f"{d}/t"
    try:
        _stage_docs_batches(spark, t, n_batches=5)
        before = sorted(
            (r.doc_id, r.text)
            for r in ING.read_stream_output(
                spark, f"{t}/docs", ING.DOCS_SCHEMA
            ).collect()
        )
        folded = ING.compact_stream_output(spark, f"{t}/docs", ING.DOCS_SCHEMA)
        assert folded == 4  # batches 0-3; batch=4 kept for replay
        after = sorted(
            (r.doc_id, r.text)
            for r in ING.read_stream_output(
                spark, f"{t}/docs", ING.DOCS_SCHEMA
            ).collect()
        )
        assert after == before and len(after) == 20  # dup content dropped
        names = sorted(os.listdir(f"{t}/docs"))
        assert names == ["batch=4", "snapshot=3"]
        # re-run is a no-op: only the replay-window batch remains
        assert ING.compact_stream_output(spark, f"{t}/docs", ING.DOCS_SCHEMA) == 0
        # missing tree is a no-op too
        assert ING.compact_stream_output(spark, f"{t}/nope", ING.DOCS_SCHEMA) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_output_compaction_respects_replay_window(spark):
    """The newest batch survives compaction so a restarted stream's
    replay overwrite still lands on its own directory: replaying it
    after compaction leaves the drained relation unchanged."""
    d = tempfile.mkdtemp(prefix="ocompactr_")
    t = f"{d}/t"
    try:
        _stage_docs_batches(spark, t, n_batches=4)
        ING.compact_stream_output(spark, f"{t}/docs", ING.DOCS_SCHEMA)
        before = sorted(
            r.doc_id
            for r in ING.read_stream_output(
                spark, f"{t}/docs", ING.DOCS_SCHEMA
            ).collect()
        )
        # replay batch 3 (the one compaction must have left alone)
        rows = [
            (300 + i, f"doc body 3 {i} words", "en", "s", 20) for i in range(4)
        ] + [(350, "doc body 0 0 words", "en", "s", 20)]
        ING.dedup_docs_batch(
            spark.createDataFrame(rows, _DOCS_SCHEMA), 3, t, compact_every=3
        )
        after = sorted(
            r.doc_id
            for r in ING.read_stream_output(
                spark, f"{t}/docs", ING.DOCS_SCHEMA
            ).collect()
        )
        assert after == before
        # and a later batch + second compaction keep folding forward
        ING.dedup_docs_batch(
            spark.createDataFrame(
                [(900, "fresh ninehundred content", "en", "s", 25)], _DOCS_SCHEMA
            ),
            4,
            t,
            compact_every=3,
        )
        assert ING.compact_stream_output(spark, f"{t}/docs", ING.DOCS_SCHEMA) == 1
        final = ING.read_stream_output(spark, f"{t}/docs", ING.DOCS_SCHEMA)
        assert final.count() == len(before) + 1
        assert sorted(os.listdir(f"{t}/docs")) == ["batch=4", "snapshot=3"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_output_compaction_uri_and_file_sizing(spark):
    """Output compaction over a file:// URI path, with the file-count
    target honored: a tiny target_file_bytes forces >1 output file, the
    default collapses to 1."""
    d = tempfile.mkdtemp(prefix="ocompactu_")
    uri = f"file://{d}/t"
    try:
        _stage_docs_batches(spark, uri, n_batches=4)
        ING.compact_stream_output(
            spark, f"{uri}/docs", ING.DOCS_SCHEMA, target_file_bytes=1
        )
        snap_files = [
            f
            for f in os.listdir(f"{d}/t/docs/snapshot=2")
            if f.endswith(".parquet")
        ]
        assert len(snap_files) > 1  # sized by bytes/target, not one blob
        got = ING.read_stream_output(spark, f"{uri}/docs", ING.DOCS_SCHEMA)
        assert got.count() == 16  # 4 batches x 4 uniques
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r13: quota-driven stratified sampling ----------------------------------

def test_corpus_stratified_quota_composition(spark, sf_dir):
    """The quota-driven sampler == temperature spec + per-source solo
    sampling: each source's rows equal corpus_stratified_weighted run
    with k = that source's quota (same priorities, same tau), and the
    total row count is min(quota, n_s) summed — with quotas within
    source sizes, exactly the budget."""
    from tiny_md_hbase_spark.operators.text import (
        corpus_stratified_quota,
        corpus_stratified_weighted,
        corpus_temperature,
    )

    docs = load_table(spark, sf_dir, "documents")
    quotas = corpus_temperature(docs, budget=60, temperature=2.0)
    got = corpus_stratified_quota(docs, quotas=quotas)
    rows = got.collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for q in quotas.collect():
        srows = by_source.get(q.source, [])
        assert len(srows) == min(q.quota, q.n_docs)
        solo = corpus_stratified_weighted(
            docs.filter(F.col("source") == q.source), k=int(q.quota)
        ).collect()
        assert [(r.doc_id, r.priority, r.est) for r in srows] == [
            (r.doc_id, r.priority, r.est) for r in solo
        ]
    assert len(rows) == 60  # quotas sum to the budget and all fit


def test_corpus_stratified_quota_oversized_and_zero_quota(spark):
    """A quota >= the source keeps every doc with tau 0 (est == weight:
    the sample IS the source); a quota of 0 contributes nothing; a
    source absent from the spec contributes nothing."""
    from tiny_md_hbase_spark.operators.text import corpus_stratified_quota

    rows = [
        (i, f"doc {i} " * 3, "en", "tiny", 10 + i) for i in range(3)
    ] + [
        (100 + i, f"big {i} " * 4, "en", "big", 20 + i) for i in range(6)
    ] + [
        (200, "ghost words", "en", "ghost", 11)
    ]
    docs = spark.createDataFrame(rows, _DOCS_SCHEMA)
    got = corpus_stratified_quota(
        docs, quotas=spark.createDataFrame(
            [("tiny", 5), ("big", 0)], "source string, quota long"
        )
    ).collect()
    assert sorted(r.doc_id for r in got) == [0, 1, 2]  # all of tiny, only tiny
    assert all(r.est == float(r.weight) for r in got)  # tau 0: quota > size


def test_stream_sample_stratified_quota_equals_batch(spark):
    """The streaming twin under a quota spec: multi-batch drain ==
    corpus_stratified_quota over everything arrived; a read or drain
    under a different spec (or constant-k mode) fails loudly."""
    from tiny_md_hbase_spark.operators.text import corpus_stratified_quota
    from tiny_md_hbase_spark.streaming.ingest import (
        read_stream_sample_stratified,
        sample_stratified_batch,
    )

    rows = [
        (100 * s + i, f"doc {s} {i} " * (3 + i), "en", f"s{s}", 10 + 7 * i + s)
        for s in range(3)
        for i in range(6)
    ]
    quotas = {"s0": 2, "s1": 4, "s2": 9}  # s2's quota exceeds its size
    d = tempfile.mkdtemp(prefix="squota_")
    try:
        all_docs = spark.createDataFrame(rows, _DOCS_SCHEMA)
        b0 = spark.createDataFrame(rows[:7], _DOCS_SCHEMA)
        b1 = spark.createDataFrame(rows[5:] + rows[:2], _DOCS_SCHEMA)  # redelivery
        sample_stratified_batch(b0, 0, f"{d}/t", quotas=quotas)
        sample_stratified_batch(b1, 1, f"{d}/t", quotas=quotas)
        got = [
            (r.source, r.doc_id, r.priority, r.est)
            for r in read_stream_sample_stratified(
                spark, f"{d}/t", quotas=quotas
            ).collect()
        ]
        want = [
            (r.source, r.doc_id, r.priority, r.est)
            for r in corpus_stratified_quota(
                all_docs,
                quotas=spark.createDataFrame(
                    sorted(quotas.items()), "source string, quota long"
                ),
            ).collect()
        ]
        assert got == want and len(got) == 2 + 4 + 6  # s2 capped by size
        # state bound: Σ(k_s+1) rows
        state = spark.read.parquet(f"{d}/t/state/batch=1")
        assert state.count() <= (2 + 1) + (4 + 1) + (9 + 1)
        # replay rewrites identical state
        sample_stratified_batch(b1, 1, f"{d}/t", quotas=quotas)
        again = [
            (r.source, r.doc_id, r.priority, r.est)
            for r in read_stream_sample_stratified(
                spark, f"{d}/t", quotas=quotas
            ).collect()
        ]
        assert again == want
        # cross-mode and cross-spec reads fail loudly
        with pytest.raises(ValueError, match="k/quota spec"):
            read_stream_sample_stratified(spark, f"{d}/t", k=3)
        with pytest.raises(ValueError, match="k/quota spec"):
            read_stream_sample_stratified(
                spark, f"{d}/t", quotas={"s0": 2, "s1": 4, "s2": 8}
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_table_lifecycle_and_compaction_uri(spark):
    """Batch-side maintenance on a file:// table path: create, append,
    compact (out-of-place + FS-API swap), query, drop — the same
    Hadoop FileSystem call path hdfs:// and s3a:// resolve through."""
    from tiny_md_hbase_spark.sources.writer import compact_points_table

    d = tempfile.mkdtemp(prefix="urilife_")
    uri = f"file://{d}/t"
    try:
        W.table_create(spark, uri)
        pts = spark.createDataFrame(
            [(i, i % 64, (i * 7) % 64) for i in range(256)], "id long, x int, y int"
        )
        W.insert_append(spark, uri, pts)
        compact_points_table(spark, uri, num_partitions=4)
        got = spark.read.parquet(f"{uri}/points")
        assert got.count() == 256
        assert not os.path.exists(f"{d}/t/points_compacting")
        W.table_drop(uri, spark)
        assert not os.path.exists(f"{d}/t")
        with pytest.raises(ValueError, match="spark handle"):
            W.table_drop("file:///tmp/never", None)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r13: horizon-bounded (TTL) streaming dedup ----------------------------

_TTLD_SCHEMA = _DOCS_SCHEMA + ", arrival long"


def _ttl_doc(i: int, text: str, arrival: int) -> tuple:
    return (i, text, "en", "s", len(text), arrival)


def test_dedup_ttl_batch_cross_batch_and_replay(spark):
    """Cross-batch suppression, renewal, past-horizon re-admission, and
    replay idempotence — the batch body run directly (ttl=64):
    batch 0 admits A@0; batch 1's A@50 is suppressed (gap 50) but RENEWS
    the clock; batch 2's A@100 is suppressed only because of that
    renewal (gap from the admit would be 100 > 64); batch 3's A@200
    re-admits (gap 100 > 64). Replaying the LAST batch — the only batch
    Structured Streaming ever replays — leaves everything unchanged
    (own-batch exclusion: the replay sees the pre-batch state, and its
    renewal row is its own prior attempt's)."""
    d = tempfile.mkdtemp(prefix="ttlb_")
    try:
        batches = [
            [_ttl_doc(1, "content A", 0), _ttl_doc(2, "content B", 10)],
            [_ttl_doc(3, "content A", 50)],
            [_ttl_doc(4, "content A", 100), _ttl_doc(5, "content C", 110)],
            [_ttl_doc(6, "content A", 200)],
        ]
        for i, rows in enumerate(batches):
            ING.dedup_ttl_batch(
                spark.createDataFrame(rows, _TTLD_SCHEMA), i, f"{d}/t", 64,
                compact_every=2,
            )
        got = ING.read_stream_output(spark, f"{d}/t/docs", ING.DOCS_TTL_SCHEMA)
        admitted = sorted(r.doc_id for r in got.collect())
        assert admitted == [1, 2, 5, 6]
        # replay the last batch: identical drained relation
        ING.dedup_ttl_batch(
            spark.createDataFrame(batches[3], _TTLD_SCHEMA), 3, f"{d}/t", 64,
            compact_every=2,
        )
        again = ING.read_stream_output(spark, f"{d}/t/docs", ING.DOCS_TTL_SCHEMA)
        assert sorted(r.doc_id for r in again.collect()) == [1, 2, 5, 6]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_ttl_state_expires_at_compaction(spark):
    """The scale property the operator exists for: fingerprints whose
    last sighting fell out of the horizon are PHYSICALLY dropped when
    the state folds (the _maybe_compact fold hook), so working state is
    O(content in the horizon) for an unbounded stream — here 8 batches
    of fresh content (ttl=64, one batch per 100 ticks) end with a
    snapshot holding only the horizon's fingerprints, not all 8
    batches' worth."""
    d = tempfile.mkdtemp(prefix="ttle_")
    try:
        nb = 8
        for i in range(nb):
            rows = [
                _ttl_doc(100 * i + j, f"fresh {i}-{j}", 100 * i + j)
                for j in range(4)
            ]
            ING.dedup_ttl_batch(
                spark.createDataFrame(rows, _TTLD_SCHEMA), i, f"{d}/t", 64,
                compact_every=2,
            )
        layout = sorted(os.listdir(f"{d}/t/state"))
        assert any(p.startswith("snapshot=") for p in layout)
        state = ING._read_state(
            spark, f"{d}/t/state", nb, ING.TTL_STATE_SCHEMA, ["h", "last_arrival"]
        )
        rows = state.groupBy("h").agg(F.max("last_arrival").alias("la")).collect()
        # 32 distinct contents arrived; only those inside ~ttl of the
        # snapshot max plus the un-folded recent deltas may remain
        assert len(rows) < 32
        # and everything the drain admitted is still exactly once
        got = ING.read_stream_output(spark, f"{d}/t/docs", ING.DOCS_TTL_SCHEMA)
        assert got.count() == 32  # all fresh content admitted
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_ttl_drain_equals_batch_op(spark, sf_dir):
    """End-to-end drain through the real stream equals dedup.dedup_ttl
    over the same staged arrivals (the driver-oracle contract), with
    mtimes bumped so the file source delivers ranges in arrival order
    (the staging contract both the operator and the oracle equality
    assume)."""
    import glob

    from tiny_md_hbase_spark.operators import dedup as D

    d = tempfile.mkdtemp(prefix="sttl_")
    try:
        base = load_table(spark, sf_dir, "documents")
        staged = base.select(
            "doc_id", "text", "lang", "source", "n_chars",
            (F.col("doc_id") * 8).alias("arrival"),
        ).unionByName(
            base.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
                (F.col("doc_id") * 8 + 16).alias("arrival"),
            )
        )
        staged.repartitionByRange(4, "arrival").write.parquet(f"{d}/src")
        parts = sorted(glob.glob(f"{d}/src/part-*"))
        t0 = os.stat(parts[0]).st_mtime
        for i, p in enumerate(parts):
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        q = ING.stream_dedup_ttl(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt", ttl=64,
            available_now=True, max_files_per_trigger=1, compact_every=2,
        )
        q.awaitTermination(300)
        want = sorted(
            (r.doc_id, r.arrival) for r in D.dedup_ttl(staged, 64).collect()
        )
        got = ING.read_stream_output(spark, f"{d}/t/docs", ING.DOCS_TTL_SCHEMA)
        assert sorted((r.doc_id, r.arrival) for r in got.collect()) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_ttl_uri_table_path(spark):
    """The TTL sink's state machinery over a file:// table_path — the
    same spark._jvm FileSystem call path hdfs:// and s3a:// resolve
    through: cross-batch suppression, renewal, fold-with-expiry, and
    the drained read all run through the FS API."""
    d = tempfile.mkdtemp(prefix="urittl_")
    uri = f"file://{d}/t"
    try:
        batches = [
            [_ttl_doc(1, "uri content A", 0)],
            [_ttl_doc(2, "uri content A", 50)],
            [_ttl_doc(3, "uri content A", 100), _ttl_doc(4, "uri other", 100)],
        ]
        for i, rows in enumerate(batches):
            ING.dedup_ttl_batch(
                spark.createDataFrame(rows, _TTLD_SCHEMA), i, uri, 64,
                compact_every=2,
            )
        got = ING.read_stream_output(spark, f"{uri}/docs", ING.DOCS_TTL_SCHEMA)
        assert sorted(r.doc_id for r in got.collect()) == [1, 4]
        # the fold ran through fs_rmtree: folded batch dirs are gone
        assert "batch=0" not in os.listdir(f"{d}/t/state")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_ttl_rejects_out_of_horizon_late_batch(spark):
    """The in-order staging contract fails LOUDLY at the only boundary
    where violating it can silently corrupt results: a batch arriving
    more than ttl behind the state front may have had its suppression
    history expired, so the sink refuses it. Within-horizon redelivery
    (the at-least-once case) still absorbs silently at gap 0."""
    import pytest as _pytest

    d = tempfile.mkdtemp(prefix="ttlo_")
    try:
        ING.dedup_ttl_batch(
            spark.createDataFrame([_ttl_doc(1, "front A", 500)], _TTLD_SCHEMA),
            0, f"{d}/t", 64,
        )
        # within-horizon redelivery: absorbed, not refused
        ING.dedup_ttl_batch(
            spark.createDataFrame([_ttl_doc(1, "front A", 500)], _TTLD_SCHEMA),
            1, f"{d}/t", 64,
        )
        got = ING.read_stream_output(spark, f"{d}/t/docs", ING.DOCS_TTL_SCHEMA)
        assert [r.doc_id for r in got.collect()] == [1]
        # out-of-horizon late batch: refused with the staging hint
        with _pytest.raises(ValueError, match="behind the state front"):
            ING.dedup_ttl_batch(
                spark.createDataFrame(
                    [_ttl_doc(9, "very late", 100)], _TTLD_SCHEMA
                ),
                2, f"{d}/t", 64,
            )
        # WITHIN-horizon order violation: also refused (r14 — the guard
        # is strict in-order, batch min >= state front). An arrival in
        # (front - ttl, front) can re-admit content whose history was
        # expired at a fold or renewed past it, so 450 < 500 is refused
        # even though it is inside the ttl=64 horizon.
        with _pytest.raises(ValueError, match="behind the state front"):
            ING.dedup_ttl_batch(
                spark.createDataFrame(
                    [_ttl_doc(10, "slightly late", 450)], _TTLD_SCHEMA
                ),
                2, f"{d}/t", 64,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r14: streaming text-index maintenance ----------------------------------


def test_stream_index_maintain_equals_fresh_build(spark, sf_dir):
    """The incremental-maintenance contract: after draining a staged
    corpus through stream_index_maintain (one file per trigger,
    compact_every=2 so the posting tree folds mid-drain), the
    keyword, BM25, and phrase probes over the MAINTAINED index return
    exactly what the same probes over a FRESH one-shot
    write_positional_index build of the drained corpus return — and
    therefore what the scan forms return (their oracle contract)."""
    import glob

    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources.writer import (
        keyword_search_indexed,
        phrase_search_positional,
        write_inverted_index,
        write_positional_index,
    )

    d = tempfile.mkdtemp(prefix="sidx_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        docs.repartition(4).write.parquet(f"{d}/src")
        parts = sorted(glob.glob(f"{d}/src/part-*"))
        t0 = os.stat(parts[0]).st_mtime
        for i, p in enumerate(parts):
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        q = ING.stream_index_maintain(
            spark, f"{d}/src", f"{d}/idx", f"{d}/ckpt", num_buckets=16,
            available_now=True, max_files_per_trigger=1, compact_every=2,
        )
        q.awaitTermination(300)
        # the posting tree compacted mid-drain: a snapshot exists
        assert any(
            p.startswith("snapshot=")
            for p in os.listdir(f"{d}/idx/postings")
        )

        write_positional_index(docs, f"{d}/fresh_pos", num_buckets=16)
        write_inverted_index(docs, f"{d}/fresh_inv", num_buckets=16)

        got_kw = [
            (r.doc_id, r.score)
            for r in ING.keyword_search_maintained(spark, f"{d}/idx").collect()
        ]
        want_kw = [
            (r.doc_id, r.score)
            for r in keyword_search_indexed(spark, f"{d}/fresh_inv").collect()
        ]
        assert got_kw == want_kw and len(got_kw) > 0

        got_bm = [
            (r.doc_id, r.bm25)
            for r in ING.keyword_search_bm25_maintained(
                spark, f"{d}/idx"
            ).collect()
        ]
        want_bm = [
            (r.doc_id, r.bm25)
            for r in TX.keyword_search_bm25(docs).collect()
        ]
        assert got_bm == want_bm and len(got_bm) > 0

        # the default fixture phrase has no hit at sf0.001 — use one
        # that does, passed identically to both index forms
        ph = ("data", "stream", "vector")
        got_ph = [
            (r.doc_id, r.n_hits)
            for r in ING.phrase_search_maintained(
                spark, f"{d}/idx", phrase=ph
            ).collect()
        ]
        want_ph = [
            (r.doc_id, r.n_hits)
            for r in phrase_search_positional(
                spark, f"{d}/fresh_pos", phrase=ph
            ).collect()
        ]
        assert got_ph == want_ph and len(got_ph) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_index_maintain_batch_replay_and_modulus_guard(spark, sf_dir):
    """Replaying the newest batch (the only batch Structured Streaming
    replays) overwrites its own delta and leaves every probe identical;
    restarting the stream with a different bucket modulus than the
    stored _index_meta refuses loudly."""
    import pytest as _pytest

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="sidxr_")
    try:
        half = docs.filter(F.col("doc_id") % 2 == 0)
        rest = docs.filter(F.col("doc_id") % 2 == 1)
        from tiny_md_hbase_spark.sources.writer import write_meta_row

        write_meta_row(
            spark, f"{d}/idx/_index_meta", [("num_buckets", 16, "int")]
        )
        ING.index_maintain_batch(half, 0, f"{d}/idx", 16)
        ING.index_maintain_batch(rest, 1, f"{d}/idx", 16)
        before = [
            (r.doc_id, r.score)
            for r in ING.keyword_search_maintained(spark, f"{d}/idx").collect()
        ]
        ING.index_maintain_batch(rest, 1, f"{d}/idx", 16)  # replay
        after = [
            (r.doc_id, r.score)
            for r in ING.keyword_search_maintained(spark, f"{d}/idx").collect()
        ]
        assert after == before and len(before) > 0
        # modulus mismatch refused at stream start
        docs.limit(1).write.parquet(f"{d}/src2")
        with _pytest.raises(ValueError, match="num_buckets"):
            ING.stream_index_maintain(
                spark, f"{d}/src2", f"{d}/idx", f"{d}/ckpt2", num_buckets=8,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_maintained_index_graduates_to_static_layout(spark, sf_dir):
    """End of the incremental index lifecycle: after a drain, the
    maintained batch tree graduates into the one-shot static layout and
    the EXISTING static readers (keyword / BM25 / phrase over
    bucket-partition pruning) return exactly the maintained readers'
    rows."""
    from tiny_md_hbase_spark.sources.writer import (
        keyword_search_bm25_indexed,
        keyword_search_indexed,
        phrase_search_positional,
        write_meta_row,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="sidxg_")
    try:
        write_meta_row(
            spark, f"{d}/idx/_index_meta", [("num_buckets", 16, "int")]
        )
        ING.index_maintain_batch(
            docs.filter(F.col("doc_id") % 2 == 0), 0, f"{d}/idx", 16,
            compact_every=1,
        )
        ING.index_maintain_batch(
            docs.filter(F.col("doc_id") % 2 == 1), 1, f"{d}/idx", 16,
        )
        n = ING.compact_maintained_index(spark, f"{d}/idx", f"{d}/static")
        assert n > 0
        kw_s = [
            (r.doc_id, r.score)
            for r in keyword_search_indexed(spark, f"{d}/static").collect()
        ]
        kw_m = [
            (r.doc_id, r.score)
            for r in ING.keyword_search_maintained(spark, f"{d}/idx").collect()
        ]
        assert kw_s == kw_m and len(kw_s) > 0
        bm_s = [
            (r.doc_id, r.bm25)
            for r in keyword_search_bm25_indexed(spark, f"{d}/static").collect()
        ]
        bm_m = [
            (r.doc_id, r.bm25)
            for r in ING.keyword_search_bm25_maintained(
                spark, f"{d}/idx"
            ).collect()
        ]
        assert bm_s == bm_m and len(bm_s) > 0
        ph = ("data", "stream", "vector")
        ph_s = [
            (r.doc_id, r.n_hits)
            for r in phrase_search_positional(
                spark, f"{d}/static", phrase=ph
            ).collect()
        ]
        ph_m = [
            (r.doc_id, r.n_hits)
            for r in ING.phrase_search_maintained(
                spark, f"{d}/idx", phrase=ph
            ).collect()
        ]
        assert ph_s == ph_m and len(ph_s) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_ingest_documents_pk_zone_map_complete(spark, sf_dir):
    """Streaming corpus ingest into the pk layout: after a 4-batch
    drain the relation equals the source, every data file has a zone
    row (the map never produces false negatives), and targeted
    redaction works directly on the streamed table."""
    import glob

    from tiny_md_hbase_spark.sources.writer import redact_documents_pk

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="spk_")
    try:
        docs.repartitionByRange(4, "doc_id").write.parquet(f"{d}/src")
        parts = sorted(glob.glob(f"{d}/src/part-*"))
        t0 = os.stat(parts[0]).st_mtime
        for i, p in enumerate(parts):
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        q = ING.stream_ingest_documents_pk(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt", num_partitions=2,
            available_now=True, max_files_per_trigger=1,
        )
        q.awaitTermination(300)
        got = sorted(
            r.doc_id for r in spark.read.parquet(f"{d}/t/docs").collect()
        )
        want = sorted(r.doc_id for r in docs.collect())
        assert got == want
        data_files = {
            f for f in os.listdir(f"{d}/t/docs") if f.endswith(".parquet")
        }
        zoned = {
            r.file.rsplit("/", 1)[-1]
            for r in spark.read.parquet(f"{d}/t/zones").collect()
        }
        assert zoned == data_files
        ids = want[:2]
        res = redact_documents_pk(spark, f"{d}/t/docs", f"{d}/t/zones", ids)
        assert res["rows_removed"] == 2
        assert res["files_touched"] < res["files_total"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --- r14: event-time TTL dedup (watermarked) --------------------------------

_TTLE_SCHEMA = _DOCS_SCHEMA + ", event_ts long"


def _ev_doc(i: int, text: str, event_ts: int) -> tuple:
    return (i, text, "en", "s", len(text), event_ts)


def test_dedup_ttl_event_out_of_order_and_flush(spark):
    """Event-time TTL dedup over out-of-event-order arrivals: the gap
    rule runs on event_ts after watermark reordering, so a drain +
    flush equals dedup.dedup_ttl keyed on event_ts over everything that
    arrived (ttl=64, lateness=50). Batch 0 delivers events 100 and 60
    out of order (60 buffered or finalized per the watermark, either
    way ordered before 100 in the chain); same-content events at gaps
    ≤ ttl are suppressed with renewal; a gap > ttl re-admits."""
    from tiny_md_hbase_spark.operators import dedup as D

    d = tempfile.mkdtemp(prefix="ttlev_")
    try:
        batches = [
            # out of event order within the batch
            [_ev_doc(1, "ev content A", 100), _ev_doc(2, "ev content A", 60)],
            # arrives later, event between the two above (within lateness
            # of the running max 100: wm = 50, 90 >= 50 OK)
            [_ev_doc(3, "ev content A", 90), _ev_doc(4, "ev content B", 95)],
            # advances the watermark far enough to finalize everything
            # seen so far; 230 - 124 = 106 > 64 re-admits A
            [_ev_doc(5, "ev content A", 230), _ev_doc(6, "ev content A", 124)],
        ]
        for i, rows in enumerate(batches):
            ING.dedup_ttl_event_batch(
                spark.createDataFrame(rows, _TTLE_SCHEMA), i, f"{d}/t", 64,
                lateness=50, compact_every=2,
            )
        ING.flush_dedup_ttl_event(spark, f"{d}/t", 64)
        got = sorted(
            (r.doc_id, r.event_ts)
            for r in ING.read_stream_output(
                spark, f"{d}/t/docs", ING.DOCS_EVENT_SCHEMA
            ).collect()
        )
        staged = spark.createDataFrame(
            [r for b in batches for r in b], _TTLE_SCHEMA
        )
        want = sorted(
            (r.doc_id, r.event_ts)
            for r in D.dedup_ttl(staged, 64, arrival="event_ts").collect()
        )
        assert got == want
        # event order decided: A@60 (doc 2) admitted, A@90/100/124
        # suppressed by renewal chain, A@230 re-admitted (gap 106)
        assert got == [(2, 60), (4, 95), (5, 230)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_ttl_event_replay_and_late_refusal(spark):
    """Replaying the newest batch (the only one Structured Streaming
    replays) leaves docs, state, watermark, and pending identical; a
    row below the watermark (max event - lateness) is refused loudly
    with the bound named."""
    import pytest as _pytest

    d = tempfile.mkdtemp(prefix="ttlevr_")
    try:
        b0 = [_ev_doc(1, "ev A", 1000), _ev_doc(2, "ev B", 980)]
        b1 = [_ev_doc(3, "ev A", 1040)]
        ING.dedup_ttl_event_batch(
            spark.createDataFrame(b0, _TTLE_SCHEMA), 0, f"{d}/t", 64,
            lateness=50,
        )
        ING.dedup_ttl_event_batch(
            spark.createDataFrame(b1, _TTLE_SCHEMA), 1, f"{d}/t", 64,
            lateness=50,
        )
        snap = sorted(
            (r.doc_id, r.event_ts)
            for r in ING.read_stream_output(
                spark, f"{d}/t/docs", ING.DOCS_EVENT_SCHEMA
            ).collect()
        )
        # replay batch 1: identical output tree
        ING.dedup_ttl_event_batch(
            spark.createDataFrame(b1, _TTLE_SCHEMA), 1, f"{d}/t", 64,
            lateness=50,
        )
        again = sorted(
            (r.doc_id, r.event_ts)
            for r in ING.read_stream_output(
                spark, f"{d}/t/docs", ING.DOCS_EVENT_SCHEMA
            ).collect()
        )
        assert again == snap
        # watermark after b1: max event 1040 - 50 = 990; event 900 < 990
        with _pytest.raises(ValueError, match="below the watermark"):
            ING.dedup_ttl_event_batch(
                spark.createDataFrame(
                    [_ev_doc(9, "too late", 900)], _TTLE_SCHEMA
                ),
                2, f"{d}/t", 64, lateness=50,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_ttl_event_drain_equals_batch_op(spark, sf_dir):
    """End-to-end: staged files in arrival order carry out-of-event-order
    rows (bounded disorder); the real stream drains, the flush closes
    the pending tail, and the docs tree equals dedup.dedup_ttl on
    event_ts over everything staged — the driver-oracle contract."""
    import glob

    from tiny_md_hbase_spark.operators import dedup as D

    d = tempfile.mkdtemp(prefix="sttlev_")
    try:
        base = load_table(spark, sf_dir, "documents")
        staged = base.select(
            "doc_id", "text", "lang", "source", "n_chars",
            (F.col("doc_id") * 8).alias("arrival"),
            (F.col("doc_id") * 8 + (F.col("doc_id") % 7) * 3).alias("event_ts"),
        ).unionByName(
            base.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
                (F.col("doc_id") * 8 + 33).alias("arrival"),
                (F.col("doc_id") * 8 + 32).alias("event_ts"),
            )
        )
        staged.repartitionByRange(4, "arrival").write.parquet(f"{d}/src")
        parts = sorted(glob.glob(f"{d}/src/part-*"))
        t0 = os.stat(parts[0]).st_mtime
        for i, p in enumerate(parts):
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        q = ING.stream_dedup_ttl_event(
            spark, f"{d}/src", f"{d}/t", f"{d}/ckpt", ttl=64, lateness=64,
            available_now=True, max_files_per_trigger=1, compact_every=2,
        )
        q.awaitTermination(300)
        ING.flush_dedup_ttl_event(spark, f"{d}/t", 64)
        want = sorted(
            (r.doc_id, r.event_ts)
            for r in D.dedup_ttl(
                staged.drop("arrival"), 64, arrival="event_ts"
            ).collect()
        )
        got = ING.read_stream_output(
            spark, f"{d}/t/docs", ING.DOCS_EVENT_SCHEMA
        )
        assert sorted((r.doc_id, r.event_ts) for r in got.collect()) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_redact_maintained_index_tombstones(spark, sf_dir):
    """Right-to-be-forgotten spans the derived index: after tombstoning
    a document, every maintained probe (keyword, BM25 — including its
    N/avgdl stats — and phrase) equals the same probe over a FRESH
    index built from the corpus WITHOUT that document, and graduation
    applies the tombstones physically (the static layout never holds
    the redacted postings)."""
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources.writer import write_meta_row

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="sidxt_")
    try:
        write_meta_row(
            spark, f"{d}/idx/_index_meta", [("num_buckets", 16, "int")]
        )
        ING.index_maintain_batch(docs, 0, f"{d}/idx", 16)
        # pick a doc that currently appears in the BM25 top-k
        top = ING.keyword_search_bm25_maintained(spark, f"{d}/idx").collect()
        victim = top[0].doc_id
        assert ING.redact_maintained_index(spark, f"{d}/idx", [victim]) == 1
        redacted = docs.filter(F.col("doc_id") != victim)
        got_bm = [
            (r.doc_id, r.bm25)
            for r in ING.keyword_search_bm25_maintained(
                spark, f"{d}/idx"
            ).collect()
        ]
        want_bm = [
            (r.doc_id, r.bm25)
            for r in TX.keyword_search_bm25(redacted).collect()
        ]
        assert got_bm == want_bm and victim not in {i for i, _ in got_bm}
        got_kw = [
            (r.doc_id, r.score)
            for r in ING.keyword_search_maintained(spark, f"{d}/idx").collect()
        ]
        want_kw = [
            (r.doc_id, r.score)
            for r in TX.keyword_search(redacted).collect()
        ]
        assert got_kw == want_kw
        # graduation applies tombstones physically
        ING.compact_maintained_index(spark, f"{d}/idx", f"{d}/static")
        n_victim = (
            spark.read.parquet(f"{d}/static")
            .filter(F.col("doc_id") == victim)
            .count()
        )
        assert n_victim == 0
        lens_victim = (
            spark.read.parquet(f"{d}/static/_doc_lens")
            .filter(F.col("doc_id") == victim)
            .count()
        )
        assert lens_victim == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
