"""The session factory's env-gated production configs (guide §2.3/§6):
the 100 TB codec settings are code, not commentary — but the BENCH
defaults must stay byte-identical to what every recorded per-key
minimum was measured under (parquet snappy, shuffle io lz4)."""

from tiny_md_hbase_spark.session import _prod_configs


def test_bench_defaults_unchanged(spark, monkeypatch):
    # the shared test session is built WITHOUT the prod flag: it must
    # run on Spark's stock codecs — the conditions of every recorded
    # bench number
    monkeypatch.delenv("SPARK_GRAFT_PROD", raising=False)
    assert _prod_configs() == {}
    assert (
        spark.conf.get("spark.sql.parquet.compression.codec") == "snappy"
    )
    # a core (non-SQL) conf: absent from SparkConf means Spark's lz4
    # default is in force
    assert (
        spark.sparkContext.getConf().get("spark.io.compression.codec", "lz4")
        == "lz4"
    )


def test_prod_flag_promotes_zstd(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PROD", "1")
    confs = _prod_configs()
    assert confs["spark.sql.parquet.compression.codec"] == "zstd"
    assert confs["spark.io.compression.codec"] == "zstd"
    # "0" and empty both mean off — the gate is explicit opt-in
    monkeypatch.setenv("SPARK_GRAFT_PROD", "0")
    assert _prod_configs() == {}
    monkeypatch.setenv("SPARK_GRAFT_PROD", "")
    assert _prod_configs() == {}
