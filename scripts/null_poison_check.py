"""Degenerate-content robustness gate: rebuild an sf fixture with
NULL, empty, and whitespace-only document texts planted, then run the
FULL oracle ledger (scripts/oracle_check.py) against it.

Why this exists: the driver's correctness gate runs on clean fixtures
(no NULL/empty text anywhere), so a cross-engine divergence on
degenerate content is invisible until a fixture change plants one —
at which point it masquerades as a regression in whatever key it
flips. This gate surfaces those divergences on demand. The r10 run of
exactly this probe found nine: the zero-token shingle family
(DuckDB's array_to_string([], ' ') is NULL and list_distinct drops
NULLs, vs Spark's concat_ws ''), the empty-string char hash
(DuckDB unicode('') = -1 vs Spark ascii('') = 0 — shifting
doc_fingerprint and every manifest checksum derived from it), the
NULL-toks marker count flipping lang_id's argmax, and NULL-vs-''
membership splits in the fingerprint-ordered samplers
(corpus_sample / corpus_stratified / corpus_temperature_sample),
winnow_fingerprint, and chunk_documents. All are pinned green under
the corpus-wide convention: NULL text ≡ '' ≡ zero-token content.

Two conventions coexist, both enforced by this gate: content-identity
ops (fingerprints, dedup, chunking, winnowing) treat NULL ≡ '' ≡
zero-token content, while per-document STAT ops (token_count,
quality_score's ratios, text_stats) keep NULL-propagating semantics —
a NULL text yields NULL stats — because both engines agree on that
natively (Spark size(NULL) and DuckDB len(NULL) are both NULL) and a
curator wants "unknown", not "zero", for absent text. What this gate
forbids is the third state: the engines DISAGREEING on the same row.

Usage:
    PYTHONPATH=/root/repo python scripts/null_poison_check.py \
        [src_sf_dir] [key ...]

Defaults to /root/testdata/sf0.001 (the full 188-key ledger runs in a
few minutes at that scale). Builds the poisoned copy under
/tmp/sfpoison_<basename> and delegates to oracle_check.main().
"""

from __future__ import annotations

import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (__spark_entry__)
sys.path.insert(0, _HERE)  # scripts/ (oracle_check)

POISON_ROWS = [
    # (doc_id, text, lang, source, n_chars) — ids chosen high and off the
    # doc_id % 50 == 0 eval split so decontamination keys keep their
    # eval/train shape
    (900001, None, "en", "web", 0),
    (900002, None, "en", "web", 0),
    (900003, "", "en", "web", 0),
    (900004, "", "en", "books", 0),
    (900006, "   ", "en", "web", 3),
    (900007, "\t\n", "en", "web", 2),
    # NEGATIVE ids: the incremental/diff keys split the fixture into
    # corpus (doc_id below the cut) and new batch (above) — high ids
    # alone leave the corpus side degenerate-free, which is exactly how
    # the r10 dedup_incremental NULL-fingerprint divergence hid from
    # this gate's first version. Negative ids land corpus-side, are
    # guaranteed unused, and negative-id hash parity has its own test.
    (-3, None, "en", "web", 0),
    (-7, "", "en", "web", 0),
]


def build_poisoned(src_sf_dir: str) -> str:
    import duckdb

    out = f"/tmp/sfpoison_{os.path.basename(src_sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in os.listdir(src_sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(src_sf_dir, f), out)
    con = duckdb.connect()
    con.execute("CREATE TABLE poison (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO poison VALUES (?, ?, ?, ?, ?)", POISON_ROWS)
    # BY NAME: a positional UNION would silently misplant the poison
    # values (text into lang, ...) if a fixture regeneration ever
    # reordered the columns — the gate would then report green while
    # probing nothing
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src_sf_dir}/documents.parquet') "
        f"UNION ALL BY NAME SELECT * FROM poison) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    poisoned = build_poisoned(src)
    print(f"poisoned fixture: {poisoned} (+{len(POISON_ROWS)} degenerate docs)")
    sys.argv = [sys.argv[0], poisoned] + sys.argv[2:]
    import oracle_check

    return oracle_check.main()


if __name__ == "__main__":
    raise SystemExit(main())
