"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode knobs mirror what the same code needs on a real cluster: AQE on
(runtime shuffle-partition coalescing + skew-join splitting), Arrow enabled
for the few Pandas-UDF paths, shuffle partitions sized to the parallelism
actually available rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _prod_configs() -> dict[str, str]:
    """100 TB-deployment codec settings, promoted from the r14 config
    sweep's prose recommendation into code (guide §2.3/§6): parquet
    zstd (smaller at-rest than snappy at similar read speed) and
    shuffle io zstd (better ratio than lz4 for the bytes that cross
    the network). EMPTY — Spark defaults — unless ``SPARK_GRAFT_PROD``
    is set truthy, so bench numbers stay comparable with the recorded
    per-key minima: at bench scale the suite is CPU-bound on tiny
    files and codec changes moved totals inside noise (measured r14);
    at cluster scale shuffle/scan bytes dominate and both belong on."""
    if os.environ.get("SPARK_GRAFT_PROD", "0") in ("", "0"):
        return {}
    return {
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.io.compression.codec": "zstd",
    }


def get_spark(app_name: str = "tiny_md_hbase_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.maxMetadataStringLength", "2000")
        # the driver fixtures store TIMESTAMP(NANOS), which the parquet
        # reader rejects natively; read as long (ns since epoch) and convert
        # explicitly where timestamp semantics are needed
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        # bucketed tables (sources.writer.write_bucketed) need a catalog;
        # keep its files and the derby metastore out of the repo
        .config("spark.sql.warehouse.dir", "/tmp/tiny_md_hbase_spark_warehouse")
        # the codegen'd kernels (minhash/simhash/shingle expressions) emit
        # large methods; the JVM's default 240 MB code cache fills after a
        # dozen such queries and the JIT silently stops compiling — every
        # later query then runs interpreted (measured 20x slowdowns)
        .config(
            "spark.driver.extraJavaOptions",
            # -DontCompileHugeMethods: whole-stage codegen regularly emits
            # methods over HotSpot's 8k-bytecode JIT refusal limit; without
            # this they run interpreted forever (observed 4-5x swings on the
            # pair-verify kernels depending on how large the fused method
            # happened to be)
            "-XX:ReservedCodeCacheSize=1g -XX:-DontCompileHugeMethods "
            "-Dderby.system.home=/tmp/tiny_md_hbase_spark_metastore",
        )
    )
    for key, val in _prod_configs().items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
