"""Targeted per-key timing for optimization work: same methodology as
bench.py (noop sink, tmpfs scratch, one untimed warm run per key, min of
N timed reps) but only for the keys named on the command line — fast
inner-loop measurement between full bench runs.

Usage: PYTHONPATH=/root/repo python scripts/time_keys.py key [key ...]
       env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
            (default 32), SPARK_GRAFT_TIME_REPS (default 3)

Prints one line per key: ``<key> min=<s> samples=[...]`` and a final
JSON line for scripting.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_DIR)


def _setup_scratch() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if base is None:
        return
    scratch = tempfile.mkdtemp(prefix="timekeys_scratch_", dir=base)
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    local = os.path.join(scratch, "spark_local")
    os.makedirs(local, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", local)
    tmp = os.path.join(scratch, "tmp")
    os.makedirs(tmp, exist_ok=True)
    tempfile.tempdir = tmp


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        print("usage: time_keys.py key [key ...]", file=sys.stderr)
        raise SystemExit(2)
    _setup_scratch()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_TIME_REPS", "3"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")

    import __spark_entry__ as entrymod
    from tiny_md_hbase_spark.session import get_spark

    spark = get_spark("time-keys", cpus=cpus)
    qs = entrymod.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        raise SystemExit(2)

    # session warm-up (JVM, parquet footers, python workers) — bench.py's
    qs["range_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    if any(k.startswith("stream_") for k in keys):
        from bench import _warm_streaming

        _warm_streaming(spark)

    out: dict[str, float] = {}
    for key in keys:
        spark.sparkContext.setJobDescription(f"time:{key}")
        samples: list[float] = []
        for rep in range(reps + 1):  # rep 0 = untimed warm (plan compile)
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            if rep > 0:
                samples.append(dt)
        out[key] = min(samples)
        print(f"{key} min={min(samples)} samples={samples}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
