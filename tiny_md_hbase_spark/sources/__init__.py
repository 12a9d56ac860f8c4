from tiny_md_hbase_spark.sources.tables import (  # noqa: F401
    POINTS_SQL,
    load_as,
    load_table,
    load_tables,
    points,
    write_as,
)
