"""Cross-engine unicode primitive pins — the unit-level counterpart of
scripts/unicode_poison_check.py (whose full-ledger run is 193/193 on
CJK / combining-accent / emoji-ZWJ / astral / RTL / mixed-script
texts). The corpus conventions hold off the ASCII page because every
string primitive both engines (and the oracles) rely on is
CODEPOINT-based and they agree codepoint-for-codepoint; this test pins
each primitive against plain Python (the neutral reference: str is
codepoints) so a refactor that silently switches one engine to bytes,
UTF-16 units, or graphemes fails HERE, not as an opaque value-hash
mismatch in some downstream key.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from unicode_poison_check import POISON_ROWS  # noqa: E402

from tiny_md_hbase_spark.operators.text import tokens  # noqa: E402

TEXTS = [r[1] for r in POISON_ROWS]


def test_unicode_length_and_codepoints_cross_engine(spark):
    """length() counts CODEPOINTS in both engines (== python len), the
    char split yields python's list(text) (no surrogate halves, no
    grapheme clustering), and the first-char codepoint primitives
    (Spark ascii, DuckDB unicode) agree — these three underlie the
    portable char-fold hash, doc_fingerprint, and every manifest
    checksum."""
    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = df.select(
        "text",
        F.length("text").alias("n"),
        F.ascii("text").alias("first_cp"),
        F.transform(
            F.filter(F.split("text", ""), lambda c: c != ""),
            lambda c: F.ascii(c),
        ).alias("cps"),
    ).collect()
    by_text = {r.text: r for r in got}
    # round-trip through Spark is lossless (the planted CJK dup pair is
    # the one intentional repeat)
    assert len(by_text) == len(set(TEXTS))
    for t in TEXTS:
        r = by_text[t]
        assert r.n == len(t), (t, r.n)
        assert r.first_cp == ord(t[0]), t
        assert list(r.cps) == [ord(c) for c in t], t
        dn, dfirst, dcps = con.execute(
            "SELECT length(?), unicode(?), "
            "list_transform(list_filter(string_split(?, ''), c -> c != ''), "
            "c -> unicode(c))",
            [t, t, t],
        ).fetchone()
        assert dn == len(t), t
        assert dfirst == ord(t[0]), t
        assert list(dcps) == [ord(c) for c in t], t


def test_unicode_tokens_cross_engine(spark):
    """The shared whitespace tokenizer yields identical token lists on
    every planted script — CJK has no intra-token whitespace (one long
    token per run), ZWJ sequences stay one token, RTL order is storage
    order in both engines."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {r.text: list(r.toks) for r in df.select(
        "text", tokens(F.col("text")).alias("toks")
    ).collect()}
    for t in TEXTS:
        py_ws = t.split()  # python's str.split: any-whitespace runs
        assert got[t] == py_ws, (t, got[t])
        (dtoks,) = con.execute(
            f"SELECT {tokens_sql('?')}", [t]
        ).fetchone()
        assert list(dtoks) == py_ws, (t, dtoks)


def test_unicode_portable_char_hash_cross_engine(spark):
    """The portable polynomial char-fold (the oracle-checkable hash
    under MinHash, fingerprints and manifests) produces IDENTICAL
    values on multibyte text in both engines."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t in TEXTS], "s string")
    codes = F.transform(F.split("s", ""), lambda c: F.ascii(c).cast("long"))
    h = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )
    got = {r.s: r.h for r in df.select("s", h.alias("h")).collect()}
    for t in TEXTS:
        want = 0
        for c in t:
            want = (want * 31 + ord(c)) % FINGERPRINT_MOD
        assert got[t] == want, t
        (dh,) = con.execute(
            "SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(string_split(?, ''), "
            "c -> CAST(unicode(c) AS BIGINT))), "
            f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD})",
            [t],
        ).fetchone()
        assert dh == want, t


def test_unicode_poison_rows_shape():
    """The planted corpus really covers the scripts it claims: a
    combining-accent row (decomposed, NOT NFC), a ZWJ emoji sequence,
    astral-plane codepoints, an exact CJK duplicate pair corpus-side."""
    texts = {r[0]: r[1] for r in POISON_ROWS}
    assert "́" in texts[910004] and "é" not in texts[910004]
    assert "‍" in texts[910006]
    assert any(ord(c) > 0xFFFF for c in texts[910007])
    assert texts[-11] == texts[-13] and any(ord(c) > 127 for c in texts[-11])
    assert all(r[4] == len(r[1]) for r in POISON_ROWS)
