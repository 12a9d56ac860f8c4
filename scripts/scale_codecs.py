"""Throughput/scale probe for the REAL container codecs (wav_decode,
ppm_decode, ppm_resize, ppm_stream_frames).

The committed fixtures are deliberately tiny (byte-level DuckDB oracles
re-decode them from hex); this probe answers the 100 TB question the
fixtures can't: does the Arrow-batched kernel shape scale linearly in
PAYLOAD VOLUME, and what is the per-core decode throughput?

Containers are generated ON THE EXECUTORS (a mapInPandas generator per
row — shipping hundreds of MB of payload through the driver would
measure the driver, not the codec): deterministic rasters/PCM from
vectorized numpy, wrapped by the same make_ppm/make_wav encoders the
fixtures use. Inputs are localCheckpoint-pinned outside timing; each
timing is min of two noop-write passes at 1x and 10x row counts.

Run: python scripts/scale_codecs.py [--rows 200] (10x point = rows*10)
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from scale_builds import build_spark, timed  # noqa: E402

# one synthetic image/clip size class, ~150 KB per container — big
# enough that per-row python overhead is amortized and the number is a
# BYTES throughput, not a rows throughput
PPM_W, PPM_H = 256, 192           # 147,456-byte raster
WAV_FRAMES = 72_000               # 144,000-byte PCM (int16 mono)
FRAMES_PER_STREAM = 8             # 8 x (64x48) frames per video stream


def _gen_ppm(spark, n_rows: int):
    def kernel(batches):
        import numpy as np
        import pandas as pd

        from tiny_md_hbase_spark.operators.multimodal import make_ppm

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                raster = (
                    (np.arange(PPM_W * PPM_H * 3, dtype=np.int64) * (int(mid) + 7919))
                    % 251
                ).astype(np.uint8).tobytes()
                payloads.append(make_ppm(PPM_W, PPM_H, raster))
            yield pd.DataFrame({"media_id": pdf["id"], "payload": payloads})

    npart = spark.sparkContext.defaultParallelism
    return (
        spark.range(n_rows)
        .repartition(npart)
        .mapInPandas(kernel, "media_id long, payload binary")
        .localCheckpoint()
    )


def _gen_wav(spark, n_rows: int):
    def kernel(batches):
        import numpy as np
        import pandas as pd

        from tiny_md_hbase_spark.operators.multimodal import make_wav

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                pcm = (
                    (np.arange(WAV_FRAMES, dtype=np.int64) * (int(mid) * 7 + 13))
                    % 65536
                    - 32768
                ).astype("<i2").tobytes()
                # raw-PCM fast path of the SAME encoder the fixtures use
                payloads.append(make_wav(pcm, 16000, 1))
            yield pd.DataFrame({"media_id": pdf["id"], "payload": payloads})

    npart = spark.sparkContext.defaultParallelism
    return (
        spark.range(n_rows)
        .repartition(npart)
        .mapInPandas(kernel, "media_id long, payload binary")
        .localCheckpoint()
    )


def _gen_ppm_stream(spark, n_rows: int):
    def kernel(batches):
        import numpy as np
        import pandas as pd

        from tiny_md_hbase_spark.operators.multimodal import make_ppm

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                frames = []
                for f in range(FRAMES_PER_STREAM):
                    raster = (
                        (np.arange(64 * 48 * 3, dtype=np.int64) * (int(mid) + f + 1))
                        % 251
                    ).astype(np.uint8).tobytes()
                    frames.append(make_ppm(64, 48, raster))
                payloads.append(b"".join(frames))
            yield pd.DataFrame({"media_id": pdf["id"], "payload": payloads})

    npart = spark.sparkContext.defaultParallelism
    return (
        spark.range(n_rows)
        .repartition(npart)
        .mapInPandas(kernel, "media_id long, payload binary")
        .localCheckpoint()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200)
    args = ap.parse_args()

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators import multimodal as MM

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    cases = [
        ("wav_decode", _gen_wav, lambda df: MM.wav_decode(df)),
        ("ppm_decode", _gen_ppm, lambda df: MM.ppm_decode(df)),
        ("ppm_resize(max_side=64)", _gen_ppm, lambda df: MM.ppm_resize(df, 64)),
        (
            "ppm_stream_frames(every=2)",
            _gen_ppm_stream,
            lambda df: MM.ppm_stream_frames(df, every=2),
        ),
    ]
    rows = []
    for name, gen, op in cases:
        stats = {}
        for mult, label in ((1, "1x"), (10, "10x")):
            df = gen(spark, args.rows * mult)
            mb = (
                df.agg(F.sum(F.length("payload"))).collect()[0][0] / 1e6
            )
            t = timed(lambda: run_noop(op(df)))
            stats[label] = (mb, t)
            df.unpersist()
            print(f"   {name} {label}: {mb:.0f} MB in {t:.2f} s")
        (mb1, t1), (mb10, t10) = stats["1x"], stats["10x"]
        rows.append((name, mb1, t1, mb10, t10, t10 / t1, mb10 / t10))
    print("\n| codec op | 1x MB | 1x s | 10x MB | 10x s | time ratio | "
          "10x MB/s (32 cores) |")
    print("|---|---|---|---|---|---|---|")
    for name, mb1, t1, mb10, t10, ratio, tput in rows:
        print(f"| {name} | {mb1:.0f} | {t1:.2f} | {mb10:.0f} | {t10:.2f} | "
              f"{ratio:.2f} | {tput:.0f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
