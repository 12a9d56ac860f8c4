"""Byte-pair-encoding tokenizer-training primitives (beyond-reference,
SURVEY.md §2.5 gap-fill: the tokenizer-prep step of an LLM data
pipeline — classic Sennrich-style BPE over word frequencies).

Scale shape: BPE never iterates over the corpus. ONE corpus pass
aggregates whitespace words into a (word, count) vocabulary table —
everything after is vocab-bounded (|vocab| ~ 10^5-10^7 regardless of
corpus size; the 100 TB corpus and the 100 GB corpus train on the same
sized table). Each merge round is a map-side array rewrite + one
pair-count aggregation over that table, with only the single winning
pair (one row) ever hitting the driver.

No reference analog (the reference is a spatial store); cited here as
the public algorithm: Sennrich, Haddow, Birch — "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators.text import tokens

__all__ = [
    "word_counts",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_train_py",
    "bpe_token_count",
    "bpe_token_count_sql",
    "bpe_encode_py",
    "FIXTURE_MERGES",
]

END = "</w>"  # end-of-word marker, the classic BPE word terminator

# The 20 merges bpe_train learns on /root/testdata/sf0.001 documents,
# PINNED as literals so the trained-encode path (bpe_token_count) is a
# fixed deterministic function both engines can evaluate — the driver's
# oracle SQL is a static string, so the merge list must be data-free at
# query-build time. tests/test_bpe.py re-trains and asserts equality,
# so a tokenization or tie-break drift breaks the test, not the oracle.
FIXTURE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
]



def word_counts(documents: DataFrame) -> DataFrame:
    """The one corpus-sized pass: whitespace-word frequencies.
    (word, cnt) — map-side partial aggregation, one shuffle on the word."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    return (
        documents.select(F.explode(tokens(txt)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _syms_expr(word_col) -> F.Column:
    """The ONE symbolization expression (character array + END marker);
    shared by the training table and the encoder so a change to symbol
    derivation can never diverge between them."""
    return F.concat(
        F.filter(F.split(word_col, ""), lambda c: c != ""),
        F.array(F.lit(END)),
    )


def _symbolized(documents: DataFrame) -> DataFrame:
    """(syms, cnt): each distinct word as its character array + END
    marker, weighted by corpus frequency — the vocab-bounded training
    table every merge round rewrites."""
    return word_counts(documents).select(
        _syms_expr(F.col("word")).alias("syms"), "cnt"
    )


def _pair_table(s: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over a (syms, cnt) symbol table —
    the aggregation both :func:`bpe_pair_counts` and every
    :func:`bpe_train` round run; ONE definition so the standalone query
    and the training loop can never count pairs differently."""
    pair = s.select(
        F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias("i", "left"),
        F.col("syms"),
        F.col("cnt"),
    ).select(
        "left",
        F.element_at("syms", F.col("i") + 2).alias("right"),
        "cnt",
    )
    return (
        pair.groupBy("left", "right")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "left", "right")
    )


def bpe_pair_counts(documents: DataFrame, k: int = 50) -> DataFrame:
    """Adjacent-symbol pair frequencies at merge round 0 — the
    aggregation at the heart of BPE training, exposed as a standalone
    oracle-checkable query: top-``k`` (left, right, cnt) by
    (cnt desc, left, right).

    Pairs are drawn from each DISTINCT word's character sequence and
    weighted by the word's corpus count, so the explode is over the
    vocabulary, not the corpus; the final top-k is a
    TakeOrderedAndProject over the pair aggregate."""
    return _pair_table(_symbolized(documents)).limit(k)


def bpe_pair_counts_sql(k: int = 50) -> str:
    """DuckDB twin of :func:`bpe_pair_counts` (same END marker, same
    (cnt desc, left, right) total order)."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    toks = tokens_sql("coalesce(text, '')")
    return (
        f"WITH w AS (SELECT u.word, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM documents, unnest({toks}) AS u(word) GROUP BY u.word), "
        "s AS (SELECT list_append(list_filter(regexp_split_to_array(word, ''), "
        f"c -> c != ''), '{END}') AS syms, cnt FROM w), "
        "p AS (SELECT syms[u.i + 1] AS \"left\", syms[u.i + 2] AS \"right\", cnt "
        "FROM s, unnest(range(len(syms) - 1)) AS u(i)) "
        "SELECT \"left\", \"right\", CAST(sum(cnt) AS BIGINT) AS cnt FROM p "
        "GROUP BY \"left\", \"right\" "
        f"ORDER BY cnt DESC, \"left\", \"right\" LIMIT {k}"
    )


def bpe_train(documents: DataFrame, n_merges: int = 20) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over the corpus vocabulary.

    Round structure: pair-count aggregation over the vocab-bounded
    symbol table → the argmax pair (ONE row, tie-broken (cnt desc,
    left, right) for cross-run determinism) to the driver → map-side
    array rewrite replacing every non-overlapping left-to-right
    occurrence of the pair (the classic greedy scan, implemented as an
    ``aggregate`` fold so it stays a JVM expression) → next round. The
    symbol table is localCheckpointed each round to cut the growing
    lineage; nothing corpus-sized is ever touched after the first pass.
    Returns the merge list — with the same tie-break, equal to
    :func:`bpe_train_py` on the same word counts by construction."""
    s = _symbolized(documents).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = _pair_table(s).limit(1).collect()
        if not top:
            break
        l, r = top[0].left, top[0].right
        merges.append((l, r))
        # prior rounds' checkpoint blocks are reclaimed by the
        # ContextCleaner once the old DataFrame goes out of scope
        s = s.select(_merge_fold(l, r, "syms").alias("syms"), "cnt").localCheckpoint()
    return merges


def _merge_fold(l: str, r: str, col):
    """Greedy non-overlapping left-to-right application of ONE merge
    (l, r) -> l+r over a symbol array, as a JVM ``aggregate`` fold:
    carry (acc, pending) where pending is a possibly-merge-starting
    symbol; struct field 'p' uses '' as "nothing pending". Shared by
    the training loop and the encoder so both apply merges with
    byte-identical greediness."""
    joined = l + r
    return F.aggregate(
        col,
        F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit("").alias("p"),
        ),
        lambda st, x: F.when(
            (st["p"] == F.lit(l)) & (x == F.lit(r)),
            F.struct(
                F.concat(st["acc"], F.array(F.lit(joined))).alias("acc"),
                F.lit("").alias("p"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    st["p"] == F.lit(""), st["acc"]
                ).otherwise(F.concat(st["acc"], F.array(st["p"]))).alias("acc"),
                x.alias("p"),
            )
        ),
        lambda st: F.when(
            st["p"] == F.lit(""), st["acc"]
        ).otherwise(F.concat(st["acc"], F.array(st["p"]))),
    )


def bpe_token_count(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Per-document token count under a TRAINED BPE vocabulary —
    tokenizer-aware corpus accounting (token budgets, packing, cost
    estimates are all denominated in tokenizer tokens, not words).

    Scale shape: the merges apply over the DISTINCT-word table via
    :func:`bpe_encode_py` in a single ``mapInPandas`` pass (the encoder
    is the pinned reference for the JVM ``_merge_fold`` — tests assert
    the two agree piece-for-piece — and a 10^4-10^5-entry real merge
    list is just more list passes per word, never a deeper plan). The
    resulting (word -> n_pieces) mapping joins back onto the corpus
    word stream (AQE broadcasts it when the vocabulary is small; huge
    vocabularies fall back to an ordinary hash join on the word key);
    per-doc counts are one map-side-partial aggregation. The exploded
    word stream is materialized ONCE (localCheckpoint — it feeds the
    vocabulary distinct and the count join) and the only other input
    touch is a doc_id-pruned spine scan for empty/NULL docs, which
    count 0. Returns (doc_id, n_bpe_tokens)."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    # pre-aggregate to (doc_id, word, c) BEFORE materializing: the
    # checkpoint and the mapping join then carry one row per distinct
    # word per doc, not one per token occurrence — within-doc repetition
    # costs nothing downstream
    words = (
        documents.select("doc_id", F.explode(tokens(txt)).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    # piece counts via the pure-Python greedy encoder in ONE Arrow
    # batch pass over the distinct-word table: bpe_encode_py applies the same
    # non-overlapping left-to-right scan as _merge_fold (tests pin the
    # two piece-for-piece), but as |merges| tight list passes per word
    # instead of |merges| chained INTERPRETED Catalyst aggregate folds,
    # each of which allocated a struct + growing array per symbol per
    # merge. Only the ~bytes-sized `word` column crosses the Python
    # boundary, the table is vocabulary-bounded (never corpus-sized),
    # and the encoder is defined at module level so workers import it
    # instead of re-pickling per task.
    ms = [(str(l), str(r)) for l, r in merges]

    def _pieces(pdfs):
        for pdf in pdfs:
            pdf = pdf[["word"]].copy()
            pdf["n_pieces"] = [
                len(bpe_encode_py(w, ms)) for w in pdf["word"]
            ]
            yield pdf

    mapping = (
        words.select("word")
        .distinct()
        .mapInPandas(_pieces, "word string, n_pieces int")
    )
    counted = (
        words.join(mapping, "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("n_pieces"))
            .cast("long")
            .alias("n_bpe_tokens")
        )
    )
    return (
        documents.select("doc_id")
        .join(counted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bpe_tokens", F.lit(0).cast("long")).alias(
                "n_bpe_tokens"
            ),
        )
    )


_SEP = "\x1f"  # unit separator: absent from the corpora (tests assert it)


def bpe_token_count_sql(merges: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`bpe_token_count` under a FIXED merge list —
    the greedy non-overlapping left-to-right merge scan re-expressed as
    a chain of plain string ``replace`` calls, one per merge.

    Encoding trick: a word's symbol sequence is rendered with DOUBLED
    ``\\x1f`` separators at every boundary (``□□h□□i□□</w>□□``). The
    pattern for merge (l, r) is ``□l□□r□`` — it consumes the full inner
    boundary but only the inner half of each outer boundary, so (a) both
    symbol edges are anchored (no mid-symbol or prefix/suffix false
    matches), and (b) the replacement ``□lr□`` plus the leftover outer
    halves reconstitutes doubled boundaries, keeping the invariant for
    the next merge in the chain. SQL ``replace`` scans left-to-right
    non-overlapping — exactly the classic BPE greedy application, so
    this is piece-for-piece :func:`bpe_encode_py` (property-tested).
    ``n_pieces`` falls out as separator-count/2 - 1; no recursion, no
    UDFs — a cross-ENGINE and cross-FORM check of the `_merge_fold`
    aggregate the Spark side uses."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    def esc(s: str) -> str:
        return s.replace("'", "''")

    enc = "s"
    for l, r in merges:
        pat = _SEP + l + _SEP + _SEP + r + _SEP
        rep = _SEP + l + r + _SEP
        enc = f"replace({enc}, '{esc(pat)}', '{esc(rep)}')"

    toks = tokens_sql("coalesce(text, '')")
    sep2 = esc(_SEP + _SEP)
    return (
        "WITH w AS (SELECT doc_id, u.word AS word, "
        f"CAST(count(*) AS BIGINT) AS c FROM documents, unnest({toks}) "
        "AS u(word) GROUP BY doc_id, u.word), "
        "v AS (SELECT DISTINCT word FROM w), "
        f"base AS (SELECT word, '{sep2}' || array_to_string("
        "list_append(list_filter(regexp_split_to_array(word, ''), "
        f"c -> c != ''), '{esc(END)}'), '{sep2}') || '{sep2}' AS s FROM v), "
        f"enc AS (SELECT word, {enc} AS s FROM base), "
        "m AS (SELECT word, (length(s) - length(replace(s, "
        f"'{esc(_SEP)}', ''))) // 2 - 1 AS n_pieces FROM enc), "
        "counted AS (SELECT w.doc_id, CAST(sum(w.c * m.n_pieces) AS BIGINT) "
        "AS n FROM w JOIN m USING (word) GROUP BY w.doc_id) "
        "SELECT d.doc_id, CAST(coalesce(counted.n, 0) AS BIGINT) "
        "AS n_bpe_tokens FROM documents d LEFT JOIN counted USING (doc_id)"
    )


def _apply_merge_py(syms: list[str], l: str, r: str) -> list[str]:
    """The ONE Python greedy non-overlapping left-to-right scan, shared
    by the encoder and training references (mirrors ``_merge_fold``)."""
    joined = l + r
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_encode_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python encoder reference: merges applied in rank order."""
    syms = list(word) + [END]
    for l, r in merges:
        syms = _apply_merge_py(syms, l, r)
    return syms


def bpe_train_py(
    word_counts_rows: list[tuple[str, int]], n_merges: int = 20
) -> list[tuple[str, str]]:
    """Independent pure-Python BPE reference (same END marker, same
    greedy non-overlapping scan — via :func:`bpe_encode_py`'s single-merge
    application — same (cnt desc, left, right) tie-break): the test
    oracle for :func:`bpe_train`."""
    vocab: list[tuple[list[str], int]] = [
        (list(w) + [END], c) for w, c in word_counts_rows
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        vocab = [(_apply_merge_py(syms, *best), c) for syms, c in vocab]
    return merges
