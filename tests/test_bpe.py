"""BPE tokenizer-training primitives: pair statistics + the iterative
merge loop, pinned against an independent pure-Python reference."""

from __future__ import annotations

from tiny_md_hbase_spark.operators import bpe as B
from tiny_md_hbase_spark.sources import load_table


def test_pair_counts_simple_corpus(spark):
    # "low" x2, "lower" x1 -> ('l','o')=3, ('o','w')=3, ('w','</w>')=2 ...
    df = spark.createDataFrame(
        [(1, "low low"), (2, "lower")], "doc_id long, text string"
    )
    got = {(r.left, r.right): r.cnt for r in B.bpe_pair_counts(df, 100).collect()}
    assert got[("l", "o")] == 3
    assert got[("o", "w")] == 3
    assert got[("w", B.END)] == 2
    assert got[("w", "e")] == 1
    assert got[("e", "r")] == 1
    assert got[("r", B.END)] == 1
    # END terminates each word: no cross-word pair exists
    assert (B.END, "l") not in got


def test_pair_counts_weighted_by_word_frequency_not_occurrence(spark):
    """The explode is over the VOCABULARY weighted by counts: a word
    repeated 5x contributes 5x its pairs."""
    df = spark.createDataFrame([(1, "ab " * 5)], "doc_id long, text string")
    got = {(r.left, r.right): r.cnt for r in B.bpe_pair_counts(df, 10).collect()}
    assert got[("a", "b")] == 5


def test_train_matches_python_reference_on_fixture(spark, sf_dir):
    # localCheckpoint pins the unordered limit: without it the two
    # independent actions below could sample different 120-row sets
    docs = load_table(spark, sf_dir, "documents").limit(120).localCheckpoint()
    wc = [(r.word, r.cnt) for r in B.word_counts(docs).collect()]
    assert B.bpe_train(docs, n_merges=10) == B.bpe_train_py(wc, n_merges=10)


def test_train_greedy_nonoverlapping_merge(spark):
    """'aaaa': merging (a,a) greedily left-to-right gives
    [aa, aa, </w>] — NOT three overlapping merges (which would leave
    [aa, a, a, </w>]-style states where round 2's pair counts differ).
    Round 2 then ties (aa,aa) with (aa,</w>) at count 1 and the
    (cnt desc, left, right) tie-break picks (aa, </w>) ('<' sorts
    before 'a'); round 3 proves the greedy state: (aa, aa</w>)."""
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    merges = B.bpe_train(df, n_merges=3)
    assert merges == [("a", "a"), ("aa", B.END), ("aa", "aa" + B.END)]


def test_token_count_matches_python_encoder(spark, sf_dir):
    """Train on a fixture slice, then count tokens under the trained
    merges — per-doc totals must equal summing the pure-Python encoder
    over each doc's words."""
    docs = load_table(spark, sf_dir, "documents").limit(60).localCheckpoint()
    merges = B.bpe_train(docs, n_merges=8)
    got = {r.doc_id: r.n_bpe_tokens
           for r in B.bpe_token_count(docs, merges).collect()}
    import re

    from tiny_md_hbase_spark.operators.text import _WS

    for row in docs.collect():
        # split with the PRODUCT's whitespace class, not str.split()
        # (Python's Unicode whitespace is a third, wider definition)
        words = [w for w in re.split(_WS, row.text or "") if w]
        want = sum(len(B.bpe_encode_py(w, merges)) for w in words)
        assert got[row.doc_id] == want


def test_token_count_empty_docs_zero(spark):
    df = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, "")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w")]
    got = {r.doc_id: r.n_bpe_tokens
           for r in B.bpe_token_count(df, merges).collect()}
    # "low" -> [low, </w>] = 2; "lower" -> [low, e, r, </w>] = 4
    assert got == {1: 6, 2: 0, 3: 0}


def test_pair_counts_cross_engine_on_vertical_tab(spark):
    """Regression: Java regex \\s includes \\x0B, RE2's does not — the
    shared explicit whitespace class (text.py _WS/_WS_SQL) must make
    both engines tokenize a vertical-tab document identically."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "low\x0Blow"), (2, "a\tb\nc d")], "doc_id long, text string"
    )
    got = sorted((r.left, r.right, r.cnt)
                 for r in B.bpe_pair_counts(df, 100).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        "SELECT 1 AS doc_id, 'low' || chr(11) || 'low' AS text "
        "UNION ALL SELECT 2, 'a' || chr(9) || 'b' || chr(10) || 'c d'"
    )
    want = sorted(tuple(r) for r in con.execute(B.bpe_pair_counts_sql(100)).fetchall())
    assert got == want


def test_train_stops_when_no_pairs_remain(spark):
    """Single-char words collapse after one merge with END; the loop
    must stop returning merges once every word is one symbol."""
    df = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    merges = B.bpe_train(df, n_merges=10)
    assert merges[0] == ("a", B.END)
    assert len(merges) == 1


def test_fixture_merges_pinned_to_sf0001_training():
    """FIXTURE_MERGES (the literal merge list the driver-graded
    bpe_token_count key and its DuckDB oracle both replay) must be
    EXACTLY what bpe_train learns on /root/testdata/sf0.001 — pinned to
    that path, not the env-overridable sf_dir, because the literals are
    baked into the static oracle SQL. A tokenization or tie-break drift
    shows up here, not as a silent oracle mismatch."""
    from tiny_md_hbase_spark.session import get_spark

    spark = get_spark("tiny-md-hbase-spark-tests", cpus=8)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert B.bpe_train(docs, n_merges=20) == B.FIXTURE_MERGES


def test_token_count_sql_replace_chain_equals_python_encoder():
    """Property check of the oracle's anchored-replace encoding (no
    Spark): for adversarial + seeded-random words, the doubled-separator
    replace chain in DuckDB must produce bpe_encode_py's pieces exactly
    — sequence, not just count. Covers repeated-symbol greediness
    (aaaa), merges whose output feeds later merges, and symbol-boundary
    anchoring (no mid-symbol or prefix/suffix false matches)."""
    import random

    import duckdb

    con = duckdb.connect()
    sep = B._SEP

    def esc(s: str) -> str:
        return s.replace("'", "''")

    enc = "s"
    for l, r in B.FIXTURE_MERGES:
        pat, rep = sep + l + sep + sep + r + sep, sep + l + r + sep
        enc = f"replace({enc}, '{esc(pat)}', '{esc(rep)}')"

    rng = random.Random(7)
    words = [
        "lower", "newest", "error", "tower", "arrow", "a", "an", "at",
        "ast", "rarer", "aaaa", "erer", "ererer", "stat", "paran", "wow",
    ] + [
        "".join(rng.choice("aberstonwluipg") for _ in range(rng.randrange(1, 12)))
        for _ in range(200)
    ]
    for w in words:
        base = sep * 2 + (sep * 2).join(list(w) + [B.END]) + sep * 2
        s = con.execute(
            f"SELECT {enc} FROM (SELECT '{esc(base)}' AS s)"
        ).fetchone()[0]
        pieces = [p for p in s.split(sep) if p]
        assert pieces == B.bpe_encode_py(w, B.FIXTURE_MERGES), w


def test_corpora_free_of_separator_byte():
    """The oracle's \x1f separator scheme requires the byte never occur
    inside a token; assert it over every documents fixture the driver
    or bench can read."""
    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('/root/testdata/sf{sf}/"
            "documents.parquet') WHERE text LIKE '%' || chr(31) || '%'"
        ).fetchone()[0]
        assert n == 0, f"sf{sf} contains \\x1f"
