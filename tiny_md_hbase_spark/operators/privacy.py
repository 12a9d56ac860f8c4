"""PII scrubbing for training corpora: detect and redact emails, IPv4
addresses, phone numbers, and long digit identifiers.

No reference counterpart (the reference is a spatial KV store, SURVEY.md
§2.5); this is a standard pre-training pipeline stage. Everything is
native Column expressions — ``regexp_count`` + chained ``regexp_replace``
run inside whole-stage codegen, no shuffle, no Python: the canonical
linear-scale shape (a pure row-local map over the corpus scan).

Cross-engine determinism: the patterns use only the regex subset shared
by Java's engine (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, word boundaries; no backreferences, no lookaround. The scrub
is SEQUENTIAL (email → ip → phone → id), each pattern counted on the
text as left by the previous replacement, so the two engines see
byte-identical intermediates (placeholders contain no digits, so later
numeric patterns can never match inside an earlier redaction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_scrub", "pii_scrub_sql"]

# order matters: email first (its local part may contain digits), then
# dotted IPv4 (so the bare-digit-run pattern cannot eat an octet run),
# then hyphenated phones, then bare long digit runs (ids, SSNs, cards)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("id", r"\b\d{9,}\b", "<ID>"),
]


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII in ``text_col``; returns (doc_id, clean_text,
    n_email, n_ip, n_phone, n_id).

    Scale shape: row-local regexp kernels fused into the scan stage by
    whole-stage codegen — zero exchanges, pushdown/pruning untouched. At
    100 TB this runs at scan speed; there is nothing to co-locate."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return documents.select(
        "doc_id", cur.alias("clean_text"), *counts
    )


def pii_scrub_sql(text_expr: str = "text", table: str = "documents") -> str:
    """DuckDB twin: same sequential count-then-replace chain. DuckDB's
    regexp_replace is single-match by default — the 'g' flag mirrors
    Spark's replace-all."""
    cur = text_expr
    count_exprs = []
    for name, pat, repl in PII_PATTERNS:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INTEGER) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return (
        f"SELECT doc_id, {cur} AS clean_text, "
        + ", ".join(count_exprs)
        + f" FROM {table}"
    )
