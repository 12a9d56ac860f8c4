from tiny_md_hbase_spark.sources.tables import (  # noqa: F401
    POINTS_SQL,
    load_as,
    load_table,
    load_tables,
    points,
    write_as,
)
from tiny_md_hbase_spark.sources.jsonl import (  # noqa: F401
    read_jsonl_corpus,
    write_jsonl_corpus,
)
