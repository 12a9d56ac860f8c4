"""Isolation probe for the r11 embeddings_clustered_build flag (VERDICT
r11 What's-wrong #1 / Next-round #1+#7).

The driver's r11 artifact read embeddings_clustered_build at 6.375 s vs
its 2.425 record (2.63x) through a fresh-tempdir layout-section re-run
with healthy host probes, while the whole layout/embedding block sat
1.2-1.8x hot. Two hypotheses to separate:

  (a) BLAS/OMP thread oversubscription: 32 concurrent Python workers x
      N BLAS threads each in the numpy scoring kernels — would show as
      pinned (OPENBLAS_NUM_THREADS=1) beating unpinned on the KERNEL
      keys but not the pure-JVM build.
  (b) a host phase the CPU+fsync probe cannot see (e.g. tmpfs write
      pressure during partitionBy, JIT/compile churn) — would show as
      uniformly clean numbers here on an idle host, exonerating the
      code.

Usage: python scripts/isolate_layout.py [pinned|unpinned]  (default both,
forked one mode per child so the env is set BEFORE the JVM starts).
Prints one JSON line per mode with per-key samples.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PIN_VARS = ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS")
SAMPLES = int(os.environ.get("ISOLATE_SAMPLES", "5"))


def run_mode(mode: str) -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tiny_md_hbase_spark.session import get_spark
    from tiny_md_hbase_spark.sources import load_table
    from tiny_md_hbase_spark.sources import writer as WR

    from pyspark.sql import functions as F

    spark = get_spark(f"isolate-layout-{mode}", cpus=cpus)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
        .v
    ]

    # warm: one untimed build+probe pays codegen/JIT like bench.py's sweeps
    wdir = tempfile.mkdtemp(prefix="iso_warm_") + "/emb"
    WR.write_embeddings_clustered(emb, wdir)
    WR.embedding_knn_clustered(spark, wdir, qv, 10, n_probe=4).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, list[float]] = {"build": [], "probe": [], "knn_kernel": []}
    from tiny_md_hbase_spark.operators.similarity import embedding_knn

    for i in range(SAMPLES):
        cdir = tempfile.mkdtemp(prefix=f"iso_{mode}_{i}_") + "/emb"
        t0 = time.perf_counter()
        WR.write_embeddings_clustered(emb, cdir)
        out["build"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        WR.embedding_knn_clustered(spark, cdir, qv, 10, n_probe=4).write.format(
            "noop"
        ).mode("overwrite").save()
        out["probe"].append(round(time.perf_counter() - t0, 3))

        # the numpy-kernel representative (brute-force cosine top-k)
        t0 = time.perf_counter()
        embedding_knn(emb, query_vec_id=1, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        out["knn_kernel"].append(round(time.perf_counter() - t0, 3))

    env_seen = {v: os.environ.get(v) for v in PIN_VARS}
    spark.stop()
    return {"mode": mode, "samples": out, "env": env_seen, "cpus": cpus}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("pinned", "unpinned"):
        print(json.dumps(run_mode(sys.argv[1])))
        return
    # parent: fork one child per mode so PIN_VARS are set before JVM start
    for mode in ("unpinned", "pinned"):
        env = dict(os.environ)
        for v in PIN_VARS:
            env.pop(v, None)
            if mode == "pinned":
                env[v] = "1"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            env=env,
            check=True,
        )


if __name__ == "__main__":
    main()
