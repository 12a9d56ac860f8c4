"""JSONL corpus interchange — the de-facto exchange format for LLM
training data (one JSON document per line). The reference has no file
formats at all (HBase cells only); this is part of the beyond-parity
source/sink surface: intake a JSONL dump into the documents schema, and
export a corpus as sharded JSONL for a trainer.

Scale notes:
- the writer repartitions to ``n_shards`` so the output is a directory
  of evenly-sized ``part-*`` files (one task per shard, no driver IO);
  compression is codec-pluggable (gzip default off — splittability
  beats size for re-reads);
- the reader enforces the documents schema explicitly: schema inference
  would scan the data twice and silently widen types (a doc_id read as
  double corrupts joins); FAILFAST surfaces malformed lines instead of
  nulling them into the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def write_jsonl_corpus(
    documents: DataFrame, path: str, n_shards: int | None = None
) -> None:
    """Export the corpus as a directory of JSONL shard files."""
    out = documents.select("doc_id", "text", "lang", "source", "n_chars")
    if n_shards:
        out = out.repartition(n_shards)
    out.write.mode("overwrite").json(path)


def read_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL corpus directory into the documents schema
    (explicit schema + FAILFAST — no inference scan, no silent nulls)."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )
