"""Non-ASCII robustness gate: rebuild an sf fixture with unicode
document texts planted (CJK, combining accents, emoji ZWJ sequences,
astral-plane surrogate pairs, RTL scripts, mixed-script lines), then
run the FULL oracle ledger (scripts/oracle_check.py) against it.

Why this exists: the clean fixtures are pure ASCII, so every
cross-engine string primitive the corpus conventions rely on —
Spark ``split(c, '')`` vs DuckDB ``string_split(g, '')`` (codepoints
or graphemes?), ``ascii()`` vs ``unicode()`` beyond ASCII,
``length()``/``substring()`` on multibyte text (UTF8String counts vs
UTF-8 chars), regex ``\\s`` classes over non-ASCII whitespace, hex of
UTF-8 bytes — is untested off the ASCII page. A 100 TB web corpus is
mostly NOT ASCII. This gate is the unicode twin of
``null_poison_check.py`` (whose first run found nine real
divergences); it plants the scripts a crawler actually yields and
demands the engines agree row-for-row.

The planted rows include an exact-duplicate CJK pair (negative ids,
corpus-side of the incremental split) so the dedup/fingerprint family
must hash multibyte content identically, and a decomposed-accents
twin of a precomposed-accents row — the engines must TOKENIZE them
identically but are NOT required to unicode-normalize (no NFC/NFD
folding is claimed anywhere; the rows just must not crash or diverge).

Usage:
    PYTHONPATH=/root/repo python scripts/unicode_poison_check.py \
        [src_sf_dir] [key ...]
"""

from __future__ import annotations

import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (__spark_entry__)
sys.path.insert(0, _HERE)  # scripts/ (oracle_check)


def _row(doc_id: int, text: str, lang: str, source: str = "web"):
    return (doc_id, text, lang, source, len(text))


POISON_ROWS = [
    # ids high and off the doc_id % 50 == 0 eval split (see
    # null_poison_check); negative ids land corpus-side of the
    # incremental/diff keys' id cut
    _row(910001, "这是一个中文文档 没有空格的长句子在这里 测试分词", "zh"),
    _row(910002, "日本語のテキストです 形態素解析なし 漢字かな混じり", "ja"),
    _row(910003, "café résumé naïve déjà vu über straße", "fr"),
    # decomposed combining accents (e + U+0301), NOT the precomposed é
    _row(910004, "cafe\u0301 re\u0301sume\u0301 nai\u0308ve", "fr"),
    _row(910006, "emoji test \U0001f600 \U0001f680 \U0001f469\u200d\U0001f469\u200d\U0001f467 end", "en"),
    # astral-plane mathematical alphanumerics: surrogate pairs in UTF-16
    _row(910007, "\U0001d54a\U0001d561\U0001d552\U0001d563\U0001d55c astral plane text", "en"),
    _row(910008, "نص عربي قصير للاختبار مع كلمات", "ar"),
    _row(910009, "mixed ascii 和 中文 words in one line", "en"),
    # exact-duplicate CJK pair, corpus-side: the fingerprint/dedup
    # family must hash multibyte content identically cross-engine
    _row(-11, "unicode 重复 duplicate 正文 body", "en"),
    _row(-13, "unicode 重复 duplicate 正文 body", "en"),
]


def build_poisoned(src_sf_dir: str) -> str:
    import duckdb

    out = f"/tmp/sfunicode_{os.path.basename(src_sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in os.listdir(src_sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(src_sf_dir, f), out)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE poison (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO poison VALUES (?, ?, ?, ?, ?)", POISON_ROWS)
    # BY NAME: see null_poison_check — a positional union could silently
    # misplant columns after a fixture-schema reorder
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src_sf_dir}/documents.parquet') "
        f"UNION ALL BY NAME SELECT * FROM poison) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    poisoned = build_poisoned(src)
    print(f"unicode-poisoned fixture: {poisoned} (+{len(POISON_ROWS)} docs)")
    sys.argv = [sys.argv[0], poisoned] + sys.argv[2:]
    import oracle_check

    return oracle_check.main()


if __name__ == "__main__":
    raise SystemExit(main())
