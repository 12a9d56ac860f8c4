"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

No reference counterpart (the reference is a spatial KV store, SURVEY.md
§2.5); these are the beyond-parity operators the north star requires,
built entirely from native Column expressions — per-row string/array
kernels run inside whole-stage codegen, grouped stats use map-side partial
aggregation. No Python touches the hot path.

Cross-engine determinism notes (the DuckDB oracles must hash-match):
- every division is a single per-row double division (never a float
  aggregate whose accumulation order differs between engines);
- integer division uses explicit floor() — DuckDB *rounds* on
  CAST(double AS BIGINT) while Spark truncates;
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all default.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "lang_id",
    "quality_score",
    "text_stats",
    "doc_fingerprint",
    "corpus_sample",
    "corpus_stratified_weighted",
    "corpus_stratified_weighted_sql",
    "corpus_weighted_sample",
    "corpus_weighted_sample_sql",
    "dlt_priorities",
    "dlt_top_priorities",
    "dlt_finish",
    "corpus_temperature",
    "corpus_temperature_sql",
    "corpus_temperature_sample",
    "corpus_temperature_sample_sql",
    "corpus_mix",
    "corpus_mix_sql",
    "corpus_shuffle",
    "corpus_shuffle_sql",
    "corpus_budget",
    "corpus_budget_sql",
    "winnow_fingerprint",
    "winnow_fingerprint_sql",
    "winnow_pairs",
    "winnow_pairs_sql",
    "corpus_diff",
    "corpus_diff_sql",
    "corpus_prepare",
    "corpus_prepare_sql",
    "pack_tokens",
    "chunk_documents",
    "chunk_documents_sql",
    "repetition_stats",
    "repetition_stats_sql",
    "decontaminate",
    "decontaminate_bloom",
    "decontaminate_hashed",
    "decontaminate_sql",
    "tfidf_top_terms",
    "tfidf_top_terms_sql",
    "keyword_search",
    "keyword_search_sql",
    "keyword_search_bm25",
    "keyword_search_bm25_sql",
    "bm25_score",
    "quality_gate",
    "quality_gate_sql",
    "quality_gate_by_source",
    "quality_gate_by_source_sql",
    "quality_qbase_sql",
    "quality_ratios_sql",
    "quality_blend_sql",
    "line_dedup",
    "line_dedup_sql",
    "lm_bigram_score",
    "lm_bigram_score_sql",
    "collocations",
    "collocations_sql",
    "gopher_quality",
    "gopher_quality_sql",
    "GOPHER_STOPWORDS",
    "corpus_split",
    "corpus_split_sql",
    "source_cap",
    "source_cap_sql",
    "skew_safe_topk",
    "fingerprint_col",
    "corpus_manifest",
    "corpus_manifest_sql",
    "FINGERPRINT_MOD",
    "LANG_MARKERS",
]

FINGERPRINT_MOD = 1_000_000_007  # keeps acc*31+cp < 2^63: no overflow

# tiny deterministic stopword marker lists (public-knowledge function
# words); priority order breaks ties: en > de > fr > es
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that"],
    "de": ["der", "die", "und", "nicht", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "los", "de", "que", "una", "es", "por"],
}


# ONE whitespace class, spelled explicitly: Java regex \s (Spark) is
# [ \t\n\x0B\f\r] while RE2 \s (DuckDB) EXCLUDES \x0B — a document
# containing a vertical tab would tokenize differently per engine and
# fail every tokenizer-derived oracle. The explicit class is identical
# under both engines (both support \xhh escapes).
_WS = r"[ \t\n\r\f\x0B]+"
# the SAME string works verbatim as the DuckDB pattern: SQL string
# literals keep the backslashes, RE2 interprets the identical escapes —
# aliased, not re-spelled, so the two engines cannot drift
_WS_SQL = _WS


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empty strings dropped (leading/trailing space
    safe). Same expression shape as the SQL twin; the whitespace class
    is shared and explicit (see ``_WS``) so both engines split
    identically on every input."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, _WS), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({expr}, '{_WS_SQL}'), t -> t != '')"
    )


def shingles_sql(n: int = 3, distinct: bool = True) -> str:
    """DuckDB twin of :func:`dedup.shingles` over a ``toks`` list
    column: word ``n``-gram shingles; a document shorter than ``n``
    tokens contributes its whole token string as one shingle. The ONE
    shared formulation — the r10 degenerate-content fix (the ELSE
    branch must coalesce: DuckDB's ``array_to_string([], ' ')`` is
    NULL and ``list_distinct`` silently drops NULLs, vs Spark's
    concat_ws '') had to be applied to five copy-pasted copies of this
    expression; a convention change missing one copy silently diverges
    that operator cross-engine. ``distinct=False`` keeps gram order
    (the winnowing window form)."""
    grams = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(0, len(toks) - {n - 1}), "
        f"i -> array_to_string(toks[i+1:i+{n}], ' ')) "
        "ELSE [coalesce(array_to_string(toks, ' '), '')] END"
    )
    return f"list_distinct({grams})" if distinct else grams


def skew_safe_topk(
    df: DataFrame,
    part_cols: list[str],
    order: list[Column],
    k: int,
    shard: Column,
    rank_name: str = "rank",
) -> DataFrame:
    """Two-phase per-group top-k — the skew-safe replacement for a bare
    ``row_number() OVER (PARTITION BY group)``: a single-key window
    funnels a dominant group's ENTIRE relation through one task's sort,
    the classic 100 TB window killer (the shape the corpus_budget rework
    removed).

    Phase 1 ranks within (group, shard) — ``shard`` is any deterministic
    hash of a high-cardinality column — and keeps each shard's local
    top-k; phase 2 re-ranks the survivors per group. The second window's
    per-group input is bounded by the CONSTANT k × n_shards, independent
    of group size. Lossless: a row's rank within its shard never exceeds
    its group rank, so every true top-k row survives phase 1. The
    ``rank_name`` column carries the exact global rank."""
    from pyspark.sql import Window

    clashes = {"_shard", "_lrank", rank_name} & set(df.columns)
    if clashes:
        # withColumn would silently REPLACE these — data loss, not error
        raise ValueError(
            f"skew_safe_topk: input already has column(s) {sorted(clashes)}; "
            "rename them (or pass a different rank_name) first"
        )
    local_w = Window.partitionBy(*part_cols, "_shard").orderBy(*order)
    global_w = Window.partitionBy(*part_cols).orderBy(*order)
    return (
        df.withColumn("_shard", shard)
        .withColumn("_lrank", F.row_number().over(local_w))
        .filter(F.col("_lrank") <= k)
        .withColumn(rank_name, F.row_number().over(global_w))
        .filter(F.col(rank_name) <= k)
        .drop("_shard", "_lrank")
    )


def token_count(documents: DataFrame) -> DataFrame:
    """Per-document token counts: whitespace tokens + a BPE-ish estimate
    (chars/4, the usual subword rule of thumb)."""
    return documents.select(
        "doc_id",
        F.size(tokens("text")).alias("n_tokens"),
        F.floor(F.length("text") / 4).cast("long").alias("est_bpe_tokens"),
    )


def _marker_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: count function-word markers per language,
    argmax with fixed priority. A deterministic n-gram-free baseline, no
    model, no UDF.

    Shape: explode tokens once, then conditional-sum per language in one
    hash aggregation. The obvious per-row alternative — four
    ``size(filter(tokens, ...))`` projections — recomputes the split per
    language and runs interpreted (higher-order functions are
    CodegenFallback), measured ~4x slower cold; explode + when/isin stays
    inside whole-stage codegen with map-side partial aggregation, and the
    doc_id shuffle carries 4 ints per doc, not tokens."""
    para = documents.sparkSession.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < para // 2:
        documents = documents.repartition(para, "doc_id")
    low = F.lower("tok")
    df = (
        documents.select("doc_id", F.explode_outer(tokens("text")).alias("tok"))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(low.isin(*words), 1).otherwise(0))
                .cast("int")
                .alias(f"s_{lang}")
                for lang, words in LANG_MARKERS.items()
            ]
        )
    )
    s = {lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )
    return df.select("doc_id", pred.alias("lang_pred"))


def quality_score(
    documents: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document quality signals: length, token stats, alphabetic /
    whitespace ratios, stopword ratio, and a blended [0,1] score.
    Heuristics in the spirit of C4/Gopher filtering rules (public).

    ``extra_cols`` rides additional (cheap) input columns through the
    scoring projection so a caller that needs them alongside the score
    (e.g. the per-source gate) does not pay a second corpus scan plus a
    doc_id join to re-attach them."""
    toks = tokens("text")
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    spaces = F.length(F.regexp_replace("text", "[^ ]", ""))
    n_tokens = F.size(toks)
    stop_hits = _marker_hits(toks, sorted({w for ws in LANG_MARKERS.values() for w in ws}))
    # zero-guard every ratio: Spark 4 defaults to ANSI mode, where an
    # unguarded x/0 ABORTS the job on the first empty or whitespace-only
    # document instead of yielding NULL — the guard makes degenerate
    # docs score NULL on both engines (CASE short-circuits, so the
    # division never evaluates for them)
    df = documents.select(
        "doc_id",
        *extra_cols,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_chars > 0, alpha / n_chars).alias("alpha_ratio"),
        F.when(n_chars > 0, spaces / n_chars).alias("space_ratio"),
        F.when(n_tokens > 0, stop_hits / n_tokens).alias("stopword_ratio"),
        F.when(n_tokens > 0, n_chars / n_tokens).alias("mean_token_len"),
    )
    score = (
        F.least(F.col("alpha_ratio") / 0.7, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") / 0.06, F.lit(1.0)) * 0.3
        + F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 12), 0.3)
        .otherwise(0.0)
    )
    # top-level guard, not per-term: least() IGNORES nulls in both
    # engines, so a null ratio would silently contribute the 1.0 cap
    # instead of poisoning the blend
    quality = F.when(
        F.col("alpha_ratio").isNotNull()
        & F.col("stopword_ratio").isNotNull(),
        F.round(score, 6),
    )
    return df.withColumn("quality", quality)


def quality_ratios_sql() -> str:
    """Guarded ratio projections over a relation carrying
    (n_chars, n_tokens, alpha, stop_hits) — the SINGLE source of the
    quality ratios' SQL text (every oracle embedding the blend builds
    from this + :func:`quality_blend_sql`, so a formula change lands in
    one place). The CASE guards mirror the Spark side's ANSI-safe
    zero-denominator handling: degenerate docs get NULL ratios."""
    return (
        "CASE WHEN n_chars > 0 THEN CAST(alpha AS DOUBLE) / n_chars END "
        "AS alpha_ratio, "
        "CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens "
        "END AS stopword_ratio, "
        "CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens "
        "END AS mean_token_len"
    )


def quality_blend_sql(
    ar: str = "alpha_ratio",
    sr: str = "stopword_ratio",
    mtl: str = "mean_token_len",
) -> str:
    """The blended [0,1] quality score's SQL text (single source, see
    :func:`quality_ratios_sql`). NULL iff a ratio is NULL — guarded at
    the top level because least() ignores NULLs in both engines."""
    return (
        f"CASE WHEN {ar} IS NOT NULL AND {sr} IS NOT NULL THEN "
        f"round(least({ar} / 0.7, 1.0) * 0.4 "
        f"+ least({sr} / 0.06, 1.0) * 0.3 "
        f"+ CASE WHEN {mtl} >= 3 AND {mtl} <= 12 THEN 0.3 ELSE 0.0 END, "
        "6) END"
    )


def quality_qbase_sql(source: str = "documents") -> str:
    """The (doc_id, n_chars, n_tokens, alpha, stop_hits) base relation
    feeding :func:`quality_ratios_sql` (single source)."""
    all_stop = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    inlist = ", ".join(f"'{w}'" for w in all_stop)
    return (
        "SELECT doc_id, length(text) AS n_chars, "
        f"CAST(len({tokens_sql('text')}) AS INTEGER) AS n_tokens, "
        "length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha, "
        f"len(list_filter({tokens_sql('text')}, t -> lower(t) IN "
        f"({inlist}))) AS stop_hits FROM {source}"
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus stats (FIXTURES.md pinned query). avg is
    sum/count as ONE double division — exact integer aggregates keep the
    result bit-identical across engines and partitionings."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_chars",
            "min_chars",
            "max_chars",
            (F.col("sum_chars").cast("double") / F.col("n_docs")).alias("avg_chars"),
        )
    )


def fingerprint_col(text: Column | str = "text") -> Column:
    """The portable content-fingerprint expression: deterministic
    polynomial rolling hash over the codepoints, ``h = (h*31 + cp) mod
    1e9+7``. Shared by :func:`doc_fingerprint` and
    :func:`corpus_manifest`; the DuckDB twin is
    :func:`doc_fingerprint_sql`. Empty content (NULL or '') fingerprints
    to the seed 0 on BOTH engines — without the coalesce a NULL text
    folds to NULL here, and without the twin's empty-string CASE
    DuckDB's string_split('', '') yields [''] whose unicode('') is -1
    (Spark's ascii('') is 0), shifting every downstream hash by one."""
    col = F.col(text) if isinstance(text, str) else text
    codes = F.transform(
        F.split(F.coalesce(col, F.lit("")), ""),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic polynomial rolling hash over the document's
    codepoints: ``h = (h*31 + cp) mod 1e9+7``. A content fingerprint
    both engines compute identically (tested char-split + codepoint
    equivalence); the scale path for exact dedup keyed on a short int
    instead of shuffling full text."""
    return documents.select("doc_id", fingerprint_col().alias("fingerprint"))


def top_tokens(documents: DataFrame, k: int = 10) -> DataFrame:
    """Per-language top-k token frequencies — the vocabulary-building /
    corpus-inspection shape. Explode → count with map-side partials →
    skew-safe two-phase top-k; ties broken lexicographically so the
    result is a total order. At scale the explode's shuffle carries
    (lang, token) pairs already pre-aggregated per partition, and the
    ranking never sorts a whole language's VOCABULARY in one task (a
    web-scale language has 10^8+ distinct tokens): phase 1 ranks within
    (lang, token-hash shard), phase 2 over ≤ k × n_shards survivors."""
    counts = (
        documents.select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    return skew_safe_topk(
        counts,
        ["lang"],
        [F.col("n").desc(), F.col("token").asc()],
        k,
        F.pmod(F.xxhash64("token"), F.lit(8)),
    ).select("lang", "token", "n", "rank")


def corpus_clean(documents: DataFrame, quality_threshold: float = 0.5) -> DataFrame:
    """Composite cleaning pipeline — the operators composed the way a real
    training-data job runs them: quality-filter → exact-dedup (keep lowest
    doc_id) → per-language token budget. One logical plan: Catalyst fuses
    the quality filter into the scan side of the dedup aggregation, so the
    corpus is read once.

    Output: (lang, n_docs_kept, sum_tokens) — what a data curator reads
    off before launching a tokenization run."""
    q = quality_score(documents).filter(F.col("quality") >= quality_threshold)
    good = documents.join(q.select("doc_id"), "doc_id")
    kept = good.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.min_by("lang", "doc_id").alias("lang"),
    )
    kept_tok = kept.select(
        "lang", F.size(tokens("text")).alias("n_tokens")
    )
    return (
        kept_tok.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select("lang", "n_docs_kept", "sum_tokens")
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Repetition signals for quality filtering (the Gopher/C4-style
    rules): the most frequent token's share of the document and the
    distinct-token ratio. High top-token share or low distinct ratio
    flags boilerplate/spam. Explode → per-(doc, token) counts → one max
    aggregation per doc — both shuffles are map-side partially
    aggregated, and the second operates on the already-reduced
    (doc, token) table."""
    tok = documents.select("doc_id", F.explode(tokens("text")).alias("token"))
    per = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.max("c").alias("top_token_count"),
        F.count("*").alias("n_distinct_tokens"),
        F.sum("c").alias("n_tokens"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "top_token_count",
        (F.col("top_token_count") / F.col("n_tokens")).alias("top_token_ratio"),
        (F.col("n_distinct_tokens") / F.col("n_tokens")).alias("distinct_ratio"),
    )


def repetition_stats_sql() -> str:
    return (
        f"WITH tok AS (SELECT doc_id, unnest({tokens_sql('text')}) AS token "
        "FROM documents), "
        "per AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS n_distinct_tokens, "
        "CAST(max(c) AS BIGINT) AS top_token_count, "
        "CAST(max(c) AS DOUBLE) / sum(c) AS top_token_ratio, "
        "CAST(count(*) AS DOUBLE) / sum(c) AS distinct_ratio "
        "FROM per GROUP BY doc_id"
    )


CHUNK_TOKENS = 50
CHUNK_STRIDE = 40


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    standard pre-tokenization chunking step (stride < chunk_tokens gives
    the overlap that preserves cross-boundary context).

    Pure narrow transformation: tokens → ``sequence`` of window starts →
    explode → slice. No shuffle at all — each chunk row is derived from
    its own document partition-locally, so the operator scales linearly
    with corpus bytes and parallelizes to however many partitions the
    scan produced. Columns: (doc_id, chunk_seq, chunk_start, n_chunk_
    tokens, chunk_text)."""
    toks = tokens(F.coalesce(F.col("text"), F.lit("")))  # NULL ≡ ''
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    ex = documents.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("chunk_start")
    )
    piece = F.slice("toks", F.col("chunk_start") + 1, chunk_tokens)
    return ex.select(
        "doc_id",
        (F.col("chunk_start") / stride).cast("long").alias("chunk_seq"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> str:
    """DuckDB twin of :func:`chunk_documents` (list slicing is 1-based
    inclusive on both ends, hence the +1 / +chunk bounds). NULL ≡ ''
    at tokenization, and the empty chunk's text is '' as in Spark's
    array_join (DuckDB's array_to_string of an empty slice is NULL)."""
    toks_nn = tokens_sql("coalesce(text, '')")
    return (
        f"WITH t AS (SELECT doc_id, {toks_nn} AS toks FROM documents), "
        "ex AS (SELECT doc_id, toks, unnest(range(0, "
        f"greatest(len(toks), 1), {stride})) AS chunk_start FROM t) "
        f"SELECT doc_id, chunk_start // {stride} AS chunk_seq, "
        "CAST(chunk_start AS BIGINT) AS chunk_start, "
        f"CAST(len(toks[chunk_start + 1 : chunk_start + {chunk_tokens}]) AS BIGINT) "
        "AS n_chunk_tokens, "
        "coalesce(array_to_string("
        f"toks[chunk_start + 1 : chunk_start + {chunk_tokens}], ' '), '') "
        "AS chunk_text FROM ex"
    )


DECON_GRAM = 8
DECON_EVAL_MOD = 50  # doc_id % 50 == 0 plays the held-out benchmark set


def decontaminate(
    documents: DataFrame,
    gram_n: int = DECON_GRAM,
    eval_mod: int = DECON_EVAL_MOD,
) -> DataFrame:
    """Benchmark decontamination: find training documents sharing any
    ``gram_n``-token n-gram with a held-out eval set (here: ``doc_id %
    eval_mod == 0`` plays the benchmark; in production it's the actual
    eval corpora). The canonical pre-training hygiene pass.

    Explode both sides to their distinct n-grams and equi-join on the
    gram, then count shared grams per (train, eval) pair. The join
    shuffles (gram, doc_id) pairs — at 100 TB, hash the gram to 8 bytes
    first (``xxhash64``) so the shuffle moves fixed-width keys; the raw
    string join here keeps the operator exactly reproducible in the
    oracle. Eval side is tiny → broadcast, so the corpus never shuffles.
    """
    from tiny_md_hbase_spark.operators.dedup import shingles

    grams = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(shingles("text", gram_n)).alias("g")
    )
    train = grams(documents.filter(F.col("doc_id") % eval_mod != 0))
    eval_g = grams(documents.filter(F.col("doc_id") % eval_mod == 0)).select(
        F.col("doc_id").alias("eval_doc_id"), "g"
    )
    return (
        train.join(F.broadcast(eval_g), "g")
        .groupBy(F.col("doc_id").alias("train_doc_id"), "eval_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def decontaminate_hashed(
    documents: DataFrame,
    gram_n: int = DECON_GRAM,
    eval_mod: int = DECON_EVAL_MOD,
) -> DataFrame:
    """Production twin of :func:`decontaminate`: identical semantics, but
    the join key is ``xxhash64(gram)`` — an 8-byte fixed-width key instead
    of a ~50-byte n-gram string. At 100 TB the gram join's shuffle (and the
    broadcast hash table) moves/holds 64-bit ints instead of raw text, and
    whole-stage codegen hashes a long instead of re-hashing variable-length
    UTF-8 per probe. Collision odds are ~1e-8 even at 10^9 distinct grams
    (64-bit birthday bound), so the output is the raw-string result with
    probability ≈ 1 — which is why the raw :func:`decontaminate_sql` also
    serves as this operator's oracle. The hash is ``shingle_hashes``'
    token-hash form (each token hashed once, grams hashed as n-long
    tuples — no gram-string concat per offset); the collision class is
    the same and the output is hash-value-agnostic."""
    from tiny_md_hbase_spark.operators.dedup import shingle_hashes

    grams = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(shingle_hashes("text", gram_n)).alias("gh")
    )
    train = grams(documents.filter(F.col("doc_id") % eval_mod != 0))
    eval_g = grams(documents.filter(F.col("doc_id") % eval_mod == 0)).select(
        F.col("doc_id").alias("eval_doc_id"), "gh"
    )
    return (
        train.join(F.broadcast(eval_g), "gh")
        .groupBy(F.col("doc_id").alias("train_doc_id"), "eval_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


DECON_BLOOM_BITS_PER_GRAM = 10  # k=2 blocked bloom → ~4% FPP; exact verify after


def decontaminate_bloom(
    documents: DataFrame,
    gram_n: int = DECON_GRAM,
    eval_mod: int = DECON_EVAL_MOD,
    bits_per_gram: int = DECON_BLOOM_BITS_PER_GRAM,
) -> DataFrame:
    """Bloom-prefiltered decontamination — the LARGE-eval-side scale path
    of :func:`decontaminate`. The broadcast-join forms cap the eval side
    at executor memory (a broadcast hash table holds ~16+ bytes per
    entry); past that bound the join must shuffle BOTH sides — including
    the 100 TB corpus's exploded grams, almost none of which match. This
    operator drops the non-matching grams BEFORE that shuffle with a
    REGISTER-BLOCKED Bloom bitset (both probe bits of a key live in the
    same 64-bit word) whose footprint is ``bits_per_gram/8`` bytes per
    eval gram (~1.2 B/gram at the default) regardless of gram length:

    1. Each eval gram's single 64-bit token-hash ``gh`` supplies all
       three probe coordinates from disjoint bit fields — word
       ``w = (gh & (m-1)) >> 6``, bits ``gh & 63`` and
       ``(gh >>> 48) & 63`` — so the k=2 filter costs ZERO extra
       hashing, and the bitset is folded AS A DATAFRAME AGGREGATE —
       ``groupBy(w).agg(bit_or(mask))``, one row per gram, no explode —
       so it is built distributedly and only ``m/64`` (word, bits) rows
       exist, bounded by the FILTER size, never the eval set.
    2. Broadcast-join the corpus grams against that tiny word table
       ONCE (both bit tests ride the single equi-join as one
       ``bits & need = need`` conjunction, whole-stage codegen, zero
       Python) and keep the grams whose both bits are set — the only
       rows that reach the shuffle. One join instead of the classic
       k joins is exactly what the blocked layout buys; the price is a
       mildly higher FPP (~4% vs ~3% at 10 bits/gram), which only sizes
       the verify join's input, never the output.
    3. Exact verify: shuffle-join the surviving grams against the eval
       grams on the 8-byte hash and count per pair, so Bloom false
       positives are eliminated and the output EQUALS
       :func:`decontaminate` — which is why ``decontaminate_sql`` is
       this operator's oracle verbatim.

    ``m`` is the next power of two ≥ ``bits_per_gram × |eval grams|``
    (one metadata-sized ``count()`` over the checkpointed grams decides
    it), so the word index is a mask+shift and the bitset table is
    ~m/64 longs — e.g. 20 GB of eval text ≈ 2.7e9 grams → m = 2^35 bits
    = 4 GiB of bitset... split across a 512 MiB broadcast per 2^32 bits
    if ever needed; at every real eval-suite size (MMLU/GSM8K-scale,
    ≤ tens of MB of grams) the word table is a few thousand rows. The
    bit fields stay disjoint for any m < 2^48 bits (32 TiB)."""
    from tiny_md_hbase_spark.operators.dedup import shingle_hashes

    # token-hash shingles (no gram-string construction). Hash VALUES are
    # plan-internal: false positives die in the exact verify join, and
    # the verify key's collision class is unchanged.
    grams = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(shingle_hashes("text", gram_n)).alias("gh")
    )
    train = grams(documents.filter(F.col("doc_id") % eval_mod != 0))
    # the eval-gram relation feeds THREE consumers — the sizing count
    # below, the bitset aggregate, and the exact verify join — so it is
    # materialized once (localCheckpoint) instead of re-running the
    # tokenize→explode→hash pass per consumer (the count alone was a
    # second full eval pass before this)
    eval_g = (
        grams(documents.filter(F.col("doc_id") % eval_mod == 0))
        .select(F.col("doc_id").alias("eval_doc_id"), "gh")
        .localCheckpoint()
    )

    # sizing action over the materialized grams: the TOTAL gram count —
    # a shuffle-free sum of checkpointed partition sizes — not a
    # distinct-count (which costs a full exchange + hash aggregate just
    # to size the filter). Total ≥ distinct, so m only ever rounds up
    # (per-doc grams are already distinct via shingles(); cross-doc
    # duplication inflates m by at most the duplicate factor, i.e. one
    # power of two in practice), and m is plan-internal anyway: Bloom
    # false positives are removed by the exact verify join, so the
    # OUTPUT is identical for any m.
    n_grams = eval_g.count()
    m = 1 << max(10, (max(1, n_grams) * bits_per_gram - 1).bit_length())

    # blocked-bloom coordinates from disjoint fields of gh (m is a power
    # of two, so & (m-1) is the non-negative low-bits residue even for
    # negative hashes): home word + the two in-word bit masks OR-ed into
    # one probe mask. No second hash, no per-position explode.
    gh = F.col("gh")
    word = F.shiftright(gh.bitwiseAND(F.lit(m - 1)), 6)
    one = F.lit(1).cast("long")
    mask = F.call_function(
        "shiftleft", one, gh.bitwiseAND(F.lit(63)).cast("int")
    ).bitwiseOR(
        F.call_function(
            "shiftleft",
            one,
            F.shiftrightunsigned(gh, 48).bitwiseAND(F.lit(63)).cast("int"),
        )
    )

    bitset = (
        eval_g.select(word.alias("w"), mask.alias("mk"))
        .groupBy("w")
        .agg(F.bit_or("mk").alias("bits"))
    )

    survivors = (
        train.select("doc_id", "gh", word.alias("w"), mask.alias("need"))
        .join(F.broadcast(bitset), "w")
        .filter(F.col("bits").bitwiseAND(F.col("need")) == F.col("need"))
    )
    # exact verify on the 8-byte hash. The strategy is deliberately left
    # to Catalyst: below autoBroadcastJoinThreshold it broadcasts (tiny
    # evals cost nothing extra), above it it becomes the shuffle join
    # this operator exists for — and only Bloom survivors, a vanishing
    # fraction of the corpus grams, ever cross that shuffle.
    return (
        survivors.select("doc_id", "gh")
        .join(eval_g.select("eval_doc_id", "gh"), "gh")
        .groupBy(F.col("doc_id").alias("train_doc_id"), "eval_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def decontaminate_sql(gram_n: int = DECON_GRAM, eval_mod: int = DECON_EVAL_MOD) -> str:
    """DuckDB twin of :func:`decontaminate`."""
    sh = shingles_sql(gram_n)
    return (
        f"WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents), "
        f"g AS (SELECT doc_id, unnest({sh}) AS g FROM t), "
        f"train AS (SELECT * FROM g WHERE doc_id % {eval_mod} != 0), "
        f"ev AS (SELECT doc_id AS eval_doc_id, g FROM g WHERE doc_id % {eval_mod} = 0) "
        "SELECT train.doc_id AS train_doc_id, eval_doc_id, "
        "CAST(count(*) AS BIGINT) AS n_shared_grams "
        "FROM train JOIN ev USING (g) GROUP BY 1, 2"
    )


SAMPLE_MOD = 5  # keep fingerprint % 5 == 0 → ~20% of each stratum


def corpus_sample(documents: DataFrame, mod: int = SAMPLE_MOD, keep: int = 0) -> DataFrame:
    """Deterministic content-hash sampling: keep a document iff its
    rolling-hash fingerprint ≡ ``keep`` (mod ``mod``). Because the decision
    is a pure function of the text, the sample is stable under
    repartitioning, re-runs, and incremental appends — the property
    training-data pipelines need and ``df.sample()`` (per-partition RNG
    state) does not give. The hash is independent of ``lang``/``source``,
    so every stratum is sampled at the same ~1/mod rate (stratified by
    construction). Embarrassingly parallel: no shuffle, filter pushes to
    the scan."""
    fp = fingerprint_col()  # shared expr: NULL/'' content -> seed 0
    return (
        documents.select("doc_id", "lang", "source", "n_chars", fp.alias("fingerprint"))
        .filter(F.col("fingerprint") % mod == keep)
    )


PACK_BUDGET = 2048  # tokens per packed training sequence
PACK_BUCKETS = 8  # parallel packing streams per language


def pack_tokens(
    documents: DataFrame, budget: int = PACK_BUDGET, buckets: int = PACK_BUCKETS
) -> DataFrame:
    """Sequence packing manifest: assign documents to fixed token-budget
    chunks (the pre-tokenization packing step of an LLM training
    pipeline). Documents are packed in ``doc_id`` order within
    (lang, doc_id % buckets) streams; a document belongs to the chunk its
    cumulative prefix starts in (``floor(cum_before / budget)``), so a doc
    straddling the boundary spills into the open chunk — contiguous
    packing, no doc reordering, fully deterministic.

    Scale: the window sort is per (lang, bucket) stream — parallelism =
    strata × buckets (size ``buckets`` to the cluster, not to the data),
    ONE shuffle, and re-runs produce byte-identical manifests so packing
    can be resumed/audited. Returns one row per chunk: (lang, bucket,
    chunk_id, n_docs, sum_tokens)."""
    from pyspark.sql import Window

    d = documents.select(
        "doc_id",
        "lang",
        F.size(tokens("text")).alias("n_tokens"),
        (F.col("doc_id") % buckets).alias("bucket"),
    )
    w = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    chunked = d.select(
        "lang",
        "bucket",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget).alias(
            "chunk_id"
        ),
    )
    return chunked.groupBy("lang", "bucket", "chunk_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens")
    )


def pack_tokens_sql(budget: int = PACK_BUDGET, buckets: int = PACK_BUCKETS) -> str:
    """DuckDB twin of :func:`pack_tokens`."""
    n_tok = f"len({tokens_sql('text')})"
    return (
        f"WITH d AS (SELECT doc_id, lang, {n_tok} AS n_tokens, "
        f"doc_id % {buckets} AS bucket FROM documents), "
        "c AS (SELECT lang, bucket, n_tokens, "
        "CAST(floor((sum(n_tokens) OVER (PARTITION BY lang, bucket "
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        f"- n_tokens) / {budget}) AS BIGINT) AS chunk_id FROM d) "
        "SELECT lang, bucket, chunk_id, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens "
        "FROM c GROUP BY lang, bucket, chunk_id"
    )


def doc_fingerprint_sql() -> str:
    """DuckDB twin of :func:`doc_fingerprint`'s hash expression
    (list_reduce has no seed argument — prepend it). Empty content
    (NULL or '') is pinned to the seed 0 — see :func:`fingerprint_col`
    for why the unguarded split diverges on it."""
    return (
        "CASE WHEN coalesce(text, '') = '' THEN CAST(0 AS BIGINT) ELSE "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD}) END"
    )


def text_stats_rollup(documents: DataFrame) -> DataFrame:
    """Corpus statistics with subtotal rows: ROLLUP over (lang, source) —
    per (lang, source), per lang, and grand total in one aggregation
    (the reporting shape over a training corpus). NULL marks the
    rolled-up dimensions, exactly as ANSI GROUP BY ROLLUP."""
    return documents.rollup("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# --- data-mixture sampling and deterministic shuffle/sharding --------------
# The last two steps of a training-data pipeline after filtering/dedup:
# rebalance the per-language mixture, then lay the corpus out in shards in
# a reproducible pseudo-random order.

# target keep-rates in parts-per-million: downsample the over-represented
# language (en is ~44% of the fixture corpus), keep most of the rest
MIX_TARGETS_PPM: dict[str, int] = {
    "en": 350_000,
    "de": 800_000,
    "es": 600_000,
    "fr": 900_000,
    "zh": 500_000,
}
MIX_DEFAULT_PPM = 250_000
# 31-bit LCG step. Every site reduces doc_id mod M BEFORE the multiply:
# (d mod M) * A ≡ d * A (mod M), so results are identical, but the
# product stays < 2^62 for ANY 64-bit doc_id — the unreduced form
# overflows (and errors under ANSI mode, the session default) once ids
# pass ~8.4e9, a realistic id range at 100 TB.
_MIX_A, _MIX_C, _MIX_M = 1_103_515_245, 12_345, 2_147_483_648


def _mix_hash(col: Column) -> Column:
    return (F.pmod(col, F.lit(_MIX_M)) * F.lit(_MIX_A) + F.lit(_MIX_C)) % F.lit(
        _MIX_M
    )


def _mix_hash_sql(expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`_mix_hash` — the ((x % M + M) % M) idiom
    because DuckDB's ``%`` is sign-preserving where Spark's ``pmod``
    is not (negative doc_ids would otherwise diverge cross-engine)."""
    return (
        f"((({expr} % {_MIX_M} + {_MIX_M}) % {_MIX_M}) * {_MIX_A} + {_MIX_C})"
        f" % {_MIX_M}"
    )


def corpus_mix(
    documents: DataFrame,
    targets_ppm: dict[str, int] | None = None,
    default_ppm: int = MIX_DEFAULT_PPM,
) -> DataFrame:
    """Deterministic weighted mixture sampling: keep each document with
    its language's target probability, decided by a pure function of
    ``doc_id`` — the data-mixing step that turns a filtered corpus into
    the training distribution.

    ``df.sample()`` cannot do this job: per-partition RNG state makes the
    sample change under repartitioning, re-runs, and incremental appends.
    Here keep/drop is ``lcg(doc_id) % 1e6 < ppm[lang]`` — stable under
    any layout, so a 100 TB corpus resampled after appending one shard
    keeps exactly the documents it kept before. No shuffle: the decision
    is row-local and the filter folds into the scan (on a
    lang-partitioned layout the all-zero-rate languages prune entirely)."""
    t = targets_ppm or MIX_TARGETS_PPM
    rate = F.coalesce(
        F.create_map(
            *[x for k, v in sorted(t.items()) for x in (F.lit(k), F.lit(v))]
        )[F.col("lang")],
        F.lit(default_ppm),
    )
    return documents.select(
        "doc_id", "lang", "source", "n_chars",
        (_mix_hash(F.col("doc_id")) % F.lit(1_000_000)).alias("mix_key"),
    ).filter(F.col("mix_key") < rate)


def corpus_mix_sql(
    targets_ppm: dict[str, int] | None = None,
    default_ppm: int = MIX_DEFAULT_PPM,
) -> str:
    t = targets_ppm or MIX_TARGETS_PPM
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(t.items())
    )
    return (
        "WITH m AS (SELECT doc_id, lang, source, n_chars, "
        f"{_mix_hash_sql()} % 1000000 AS mix_key, "
        f"CASE {cases} ELSE {default_ppm} END AS ppm FROM documents) "
        "SELECT doc_id, lang, source, n_chars, mix_key FROM m "
        "WHERE mix_key < ppm"
    )


SHUFFLE_SHARDS = 16
# decorrelated from the mix LCG so mixing then sharding doesn't alias
_SHARD_MULT = 2_654_435_761  # Knuth multiplicative hash constant
# the well-mixed bits of h = (d * _SHARD_MULT) mod 2^31 are the HIGH
# ones (Fibonacci hashing); the low bits are a no-op — _SHARD_MULT ≡ 1
# (mod 16), so h % 16 = doc_id % 16, which re-correlates with any
# stride-minted id scheme. Shard ids therefore come from the TOP bits
# via the range mapping (h * n) div 2^31 — middle bits would still
# collapse for large power-of-2 strides (ids at stride 2^k zero h's
# low k bits, so any shard bits below position k are constant; the top
# bits vary for every k ≤ 27).


def _shard_hash(col: Column) -> Column:
    """Overflow-safe multiplicative hash (pre-reduced like _mix_hash)."""
    return (F.pmod(col, F.lit(_MIX_M)) * F.lit(_SHARD_MULT)) % F.lit(_MIX_M)


def _shard_hash_sql(expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`_shard_hash`. DuckDB's ``%`` is
    sign-preserving where Spark's ``pmod`` is not, so the reduction is
    the ((x % M + M) % M) idiom — without it any negative doc_id would
    hash differently across engines."""
    return f"((({expr} % {_MIX_M} + {_MIX_M}) % {_MIX_M}) * {_SHARD_MULT}) % {_MIX_M}"


def _shard_of(h: Column, n_shards: int) -> Column:
    """Shard id from the hash's top bits: ``(h * n) div 2^31`` (as a
    right shift — 2^31 is the modulus). h < 2^31 and n_shards is small,
    so the product stays far under 2^63."""
    return F.shiftright(h * F.lit(n_shards), 31)


def _shard_of_sql(h_expr: str, n_shards: int) -> str:
    return f"(({h_expr}) * {n_shards} // {_MIX_M})"


def corpus_shuffle(documents: DataFrame, n_shards: int = SHUFFLE_SHARDS) -> DataFrame:
    """Deterministic shuffle + sharding manifest: every document gets a
    pseudo-random ``shard`` and a dense ``pos`` within it — the
    write-training-shards step. Order is a pure function of ``doc_id``
    (multiplicative hash, doc_id tiebreak), so the shard layout is
    reproducible run-to-run and append-stable for existing documents.

    One shuffle (on ``shard``) then a per-shard sort — the same cost
    profile as the ``repartitionByRange + sortWithinPartitions`` write
    it feeds. At 100 TB pick ``n_shards`` so a shard fits an executor
    sort spill budget (shards are embarrassingly parallel; nothing is
    global except the hash function)."""
    from pyspark.sql import Window

    h = _shard_hash(F.col("doc_id"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        documents.select(
            "doc_id", "lang", h.alias("h"), _shard_of(h, n_shards).alias("shard")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "lang", "shard", "pos")
    )


def corpus_shuffle_sql(n_shards: int = SHUFFLE_SHARDS) -> str:
    shard = _shard_of_sql("h", n_shards)
    return (
        "WITH s AS (SELECT doc_id, lang, "
        f"{_shard_hash_sql()} AS h FROM documents) "
        f"SELECT doc_id, lang, {shard} AS shard, "
        f"CAST(row_number() OVER (PARTITION BY {shard} "
        "ORDER BY h, doc_id) AS BIGINT) AS pos FROM s"
    )


WINNOW_K = 3  # tokens per gram
WINNOW_W = 4  # grams per selection window


def winnow_fingerprint(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
    — the MOSS algorithm): the distinct minima of every ``w``-window of
    token-``k``-gram hashes. Guarantees any shared run of ``w + k - 1``
    tokens between two documents produces at least one shared
    fingerprint, while storing only ~2/(w+1) of the gram hashes — the
    robust local fingerprint for plagiarism/copy detection that
    :func:`doc_fingerprint` (one global hash, breaks on any edit) cannot
    provide.

    All exact integer arithmetic (the polynomial char hash both engines
    reproduce bit-for-bit), evaluated as ONE vectorized numpy kernel
    per partition (``mapInPandas``): tokenize, fold each token once
    into ``(h, 31^len mod M)`` (codepoint columns batched across every
    token in the Arrow batch), assemble gram hashes from k consecutive
    token hashes — congruent to the char fold of the exact gram string,
    since tokens contain no whitespace and every intermediate stays
    under 2^62 — take the w-window sliding minima, and dedup per doc,
    all inside the kernel. ZERO shuffle: the former formulation
    posexploded to a token table and paid a doc_id-keyed exchange +
    two window sorts + a dedup, with the per-token fold running as
    interpreted higher-order expressions; here the only data movement
    is (doc_id, text) into the Python worker and the (doc_id, fp)
    longs back. Returns (doc_id, fp) — feed into an equi-join on fp to
    find copied passages across a corpus, the same banding shape as
    the MinHash LSH join."""

    def _kernel(pdfs):
        import numpy as np
        import pandas as pd

        M = FINGERPRINT_MOD
        ws_re = re.compile(_WS)
        for pdf in pdfs:
            out_doc: list = []
            out_fp: list = []
            doc_ids = pdf["doc_id"].to_numpy()
            tok_lists = [
                [t for t in ws_re.split(s if isinstance(s, str) else "") if t]
                for s in pdf["text"]
            ]
            # -- short docs (< k tokens): whole joined text is the fp --
            long_rows: list[int] = []
            for r, toks in enumerate(tok_lists):
                if len(toks) < k:
                    h = 0
                    for cp in map(ord, " ".join(toks)):
                        h = (h * 31 + cp) % M
                    out_doc.append(doc_ids[r])
                    out_fp.append(h)
                else:
                    long_rows.append(r)
            if long_rows:
                # flatten every long doc's tokens into one codepoint
                # array; per-token (h, p) fold runs column-by-column
                # over a padded (n_tokens, max_len) view — max_len
                # vectorized steps total, exact int64 arithmetic
                # (values stay < 2^60 with the mod after every product)
                toks_flat = [t for r in long_rows for t in tok_lists[r]]
                n_per_doc = np.array(
                    [len(tok_lists[r]) for r in long_rows], dtype=np.int64
                )
                lens = np.array([len(t) for t in toks_flat], dtype=np.int64)
                cp = np.frombuffer(
                    "".join(toks_flat).encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                ends = np.cumsum(lens)
                starts = ends - lens
                h = np.zeros(len(toks_flat), dtype=np.int64)
                p = np.ones(len(toks_flat), dtype=np.int64)
                for col in range(int(lens.max(initial=0))):
                    sel = lens > col
                    idx = starts[sel] + col
                    h[sel] = (h[sel] * 31 + cp[idx]) % M
                    p[sel] = (p[sel] * 31) % M
                # gram hash at token offset i (within doc):
                # gh = h_i; then per j: gh = (gh*31+32)%M (the space),
                # gh = (gh*p_{i+j} + h_{i+j})%M — valid iff i+k-1 is
                # still inside the doc
                doc_end = np.repeat(np.cumsum(n_per_doc), n_per_doc)
                pos = np.arange(len(toks_flat), dtype=np.int64)
                gvalid = pos + (k - 1) < doc_end
                gh = h.copy()
                for j in range(1, k):
                    gh = (gh * 31 + 32) % M
                    nxt = np.roll(h, -j)
                    nxp = np.roll(p, -j)
                    # out-of-doc positions are dropped by gvalid below;
                    # roll wrap-around only ever lands there
                    gh = (gh * nxp + nxt) % M
                g = gh[gvalid]
                m_per_doc = n_per_doc - (k - 1)  # >= 1 (len >= k)
                gdoc = np.repeat(np.arange(len(long_rows)), m_per_doc)
                gend = np.repeat(np.cumsum(m_per_doc), m_per_doc)
                gpos = np.arange(len(g), dtype=np.int64)
                # sliding min over the w-window, truncated at doc tail
                wmin = g.copy()
                for j in range(1, w):
                    shifted = np.roll(g, -j)
                    ok = gpos + j < gend
                    wmin = np.minimum(wmin, np.where(ok, shifted, M))
                gi = gpos - (gend - np.repeat(m_per_doc, m_per_doc))
                keep = (gi <= np.repeat(m_per_doc - w, m_per_doc)) | (
                    (np.repeat(m_per_doc, m_per_doc) < w) & (gi == 0)
                )
                sel_doc = doc_ids[np.array(long_rows, dtype=np.int64)][
                    gdoc[keep]
                ]
                pairs = np.unique(
                    np.stack((sel_doc, wmin[keep]), axis=1), axis=0
                )
                out_doc.extend(pairs[:, 0].tolist())
                out_fp.extend(pairs[:, 1].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "fp": pd.Series(out_fp, dtype="int64"),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        _kernel, "doc_id long, fp long"
    )


def winnow_fingerprint_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    # the empty gram hashes to the seed 0, as in Spark (ascii('') = 0 →
    # fold is a no-op) — DuckDB's string_split('', '') is [''] and
    # unicode('') is -1, which would shift the zero-token fp to -1
    char_hash = (
        "CASE WHEN g = '' THEN CAST(0 AS BIGINT) ELSE "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD}) END"
    )
    return (
        f"WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents), "
        f"gr AS (SELECT doc_id, {shingles_sql(k, distinct=False)} "
        "AS grams FROM t), "
        f"h AS (SELECT doc_id, list_transform(grams, g -> {char_hash}) AS gh "
        "FROM gr), "
        f"win AS (SELECT doc_id, CASE WHEN len(gh) >= {w} THEN "
        f"list_distinct(list_transform(range(0, len(gh) - {w} + 1), "
        f"j -> list_min(gh[j+1:j+{w}]))) "
        "ELSE [list_min(gh)] END AS fps FROM h) "
        "SELECT doc_id, unnest(fps) AS fp FROM win"
    )


WINNOW_MAX_DF = 10  # fingerprints in more docs than this are stop-phrases


def winnow_pairs(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_df: int = WINNOW_MAX_DF,
) -> DataFrame:
    """Copied-passage detection: document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — the corpus-scale consumer of
    :func:`winnow_fingerprint` (MOSS's matching step).

    Scale shape: fingerprints whose document frequency exceeds
    ``max_df`` are boilerplate/stop-phrases and are dropped BEFORE the
    self-join — the standard guard that keeps the equi-join's per-key
    fan-out bounded (a fingerprint shared by f docs contributes f²/2
    pairs; capping f caps the blowup, exactly the hot-key discipline of
    the LSH band joins). The join then shuffles only (fp, doc_id) pairs
    and the per-pair count is a map-side-combinable aggregate. Returns
    (doc_a, doc_b, n_shared), doc_a < doc_b.

    The fingerprint table feeds the df aggregate and both self-join
    sides; its shuffle output is shared via ReusedExchange (identical
    subplans), so no materialization is needed — measured: checkpointing
    it does not move the operator's time."""
    fp = winnow_fingerprint(documents, k, w)
    df_ok = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    slim = fp.join(df_ok, "fp")
    pairs = (
        slim.alias("a")
        .join(slim.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs


def winnow_pairs_sql(
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_df: int = WINNOW_MAX_DF,
) -> str:
    base = winnow_fingerprint_sql(k, w)
    return (
        f"WITH fps AS ({base}), "
        f"ok AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df}), "
        "slim AS (SELECT f.doc_id, f.fp FROM fps f JOIN ok USING (fp)) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM slim a JOIN slim b ON a.fp = b.fp AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_shared}"
    )


TOKEN_BUDGET_PER_LANG = 2_000
BUDGET_SHARDS = 32


def corpus_prepare(
    documents: DataFrame,
    quality_threshold: float = 0.5,
    budget: int = TOKEN_BUDGET_PER_LANG,
) -> DataFrame:
    """The flagship end-to-end training-data pipeline, composed from the
    operators a real curation job chains: PII-scrub → quality filter →
    exact dedup (keep lowest doc_id) → deterministic mixture sampling →
    per-language token budget. Returns the SELECTED documents —
    (doc_id, lang, n_tokens, cum_tokens) — the manifest a tokenizer run
    consumes.

    Everything stays one logical plan until the budget stage: the scrub
    is row-local (fuses into the scan), the quality filter is a
    broadcast-able semi-join on doc_id, dedup is one hash aggregation on
    text, the mix decision is a pure function of doc_id, and the budget
    runs the sharded two-phase prefix sum of :func:`corpus_budget`. At
    100 TB the corpus is scanned once for scrub+quality+dedup (Catalyst
    fuses the row-local stages into the aggregation's scan side), once
    more for the budget's token projection — each stage's scale story is
    documented and plan-tested on its own operator.

    r14 measured NOTE: the executed plan shows 16 parquet scans (the
    nested join aliases re-plan the upstream), but checkpointing
    ``good`` to collapse them made the key 5x SLOWER (1.1 → 5.6 s at
    sf0.1): most of those scans are COLUMN-PRUNED key-only reads that
    never evaluate the regex scrub or touch text — only the dedup
    aggregation and the budget's token projection do — while the
    materialization forces one eager full-text scrub + row-format
    storage and forfeits pruning for every consumer. Scan count is not
    a cost proxy; what each scan READS is (ReadSchema, guide §6)."""
    cur: Column = F.col("text")
    from tiny_md_hbase_spark.operators.privacy import PII_PATTERNS

    for _, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    scrubbed = documents.select(
        "doc_id", cur.alias("text"), "lang", "source", "n_chars"
    )
    ok = (
        quality_score(scrubbed)
        .filter(F.col("quality") >= quality_threshold)
        .select("doc_id")
    )
    good = scrubbed.join(ok, "doc_id")
    keep_ids = good.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    survivors = good.join(keep_ids, "doc_id")
    mixed_ids = corpus_mix(survivors).select("doc_id")
    selected = survivors.join(mixed_ids, "doc_id")
    return corpus_budget(selected, budget=budget)


def corpus_prepare_sql(
    quality_threshold: float = 0.5, budget: int = TOKEN_BUDGET_PER_LANG
) -> str:
    """DuckDB twin: the same five stages as one CTE chain, each stage's
    text identical in structure to its standalone operator's oracle."""
    from tiny_md_hbase_spark.operators.privacy import PII_PATTERNS

    cur = "text"
    for _, pat, repl in PII_PATTERNS:
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    toks = tokens_sql("text")
    t = MIX_TARGETS_PPM
    mix_cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(t.items())
    )
    return (
        f"WITH scrubbed AS (SELECT doc_id, {cur} AS text, lang, source, n_chars "
        "FROM documents), "
        f"qbase AS ({quality_qbase_sql('scrubbed')}), "
        f"qr AS (SELECT doc_id, {quality_ratios_sql()} FROM qbase), "
        "ok AS (SELECT doc_id FROM qr WHERE "
        f"{quality_blend_sql()} >= {quality_threshold}), "
        "good AS (SELECT s.* FROM scrubbed s JOIN ok USING (doc_id)), "
        "keep AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY text), "
        "surv AS (SELECT g.* FROM good g JOIN keep USING (doc_id)), "
        "mixk AS (SELECT doc_id, "
        f"{_mix_hash_sql()} % 1000000 AS mix_key, "
        f"CASE {mix_cases} ELSE {MIX_DEFAULT_PPM} END AS ppm FROM surv), "
        "sel AS (SELECT s.* FROM surv s JOIN mixk USING (doc_id) "
        "WHERE mix_key < ppm), "
        "d AS (SELECT doc_id, lang, "
        f"CAST(COALESCE(len({toks}), 0) AS BIGINT) AS n_tokens, "
        f"{_shard_hash_sql()} AS h FROM sel), "
        "c AS (SELECT doc_id, lang, n_tokens, "
        "CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS cum_tokens FROM d) "
        "SELECT doc_id, lang, n_tokens, cum_tokens FROM c "
        f"WHERE cum_tokens - n_tokens < {budget}"
    )


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot diff between two corpus versions: every document that was
    added, removed, or whose text changed — the bookkeeping step of an
    incremental training-data pipeline (what do I re-tokenize / re-dedup
    after this crawl refresh?).

    Scale shape: one full-outer shuffle join on ``doc_id`` (on bucketed
    or doc_id-partitioned layouts the exchange disappears entirely), a
    row-local status expression, and a selective filter — unchanged
    documents, the overwhelming majority between adjacent snapshots,
    never leave the join stage. Text equality is compared directly (not
    via hash), so the result is exact and engine-portable. Returns
    (doc_id, lang, status) with status ∈ {added, removed, changed}."""
    o = old.select(
        "doc_id", F.col("lang").alias("o_lang"), F.col("text").alias("o_text")
    )
    n = new.select(
        "doc_id", F.col("lang").alias("n_lang"), F.col("text").alias("n_text")
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("o_text").isNull() & F.col("n_text").isNotNull(), "added")
        .when(F.col("n_text").isNull() & F.col("o_text").isNotNull(), "removed")
        .when(~F.col("o_text").eqNullSafe(F.col("n_text")), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            "doc_id",
            F.coalesce("n_lang", "o_lang").alias("lang"),
            status.alias("status"),
        )
        .filter(F.col("status") != "unchanged")
    )


def corpus_diff_sql(old_table: str, new_table: str) -> str:
    return (
        "SELECT doc_id, lang, status FROM ("
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
        "COALESCE(n.lang, o.lang) AS lang, "
        "CASE WHEN o.text IS NULL AND n.text IS NOT NULL THEN 'added' "
        "WHEN n.text IS NULL AND o.text IS NOT NULL THEN 'removed' "
        "WHEN o.text IS DISTINCT FROM n.text THEN 'changed' "
        "ELSE 'unchanged' END AS status "
        f"FROM {old_table} o FULL OUTER JOIN {new_table} n ON o.doc_id = n.doc_id"
        ") WHERE status != 'unchanged'"
    )


def corpus_budget(
    documents: DataFrame,
    budget: int = TOKEN_BUDGET_PER_LANG,
    n_shards: int = BUDGET_SHARDS,
) -> DataFrame:
    """Deterministic token-budget subset selection: per language, take
    documents in the :func:`corpus_shuffle` pseudo-random order until the
    running token total fills ``budget`` — "sample N tokens per domain",
    the step that turns mixture *rates* into an exact token allocation.

    Fill-until-full semantics: a document is kept iff the tokens before
    it (in hash order) are still under budget, so the boundary-crossing
    document is included and every language lands in
    ``[budget, budget + max_doc_tokens)``. All integer arithmetic over a
    deterministic total order (hash, doc_id) — identical in any engine,
    stable under re-runs and layout.

    Scale shape — two-phase prefix sum, never a whole language through
    one task. ``h`` is uniform in [0, ``_MIX_M``), so contiguous h-ranges
    make ``n_shards`` order-preserving shards per language (ties in h
    share a shard, so the (h, doc_id) total order is respected across
    shard boundaries). Phase 1 computes per-(lang, shard) token sums — a
    map-side-combined aggregate, langs × n_shards rows. Phase 2 turns
    those into exclusive per-shard offsets (a window over the tiny
    aggregate) and keeps only shards whose offset is still under budget:
    every row's exclusive prefix is ≥ its shard offset, so dropped
    shards provably contain no survivors. Phase 3 broadcast-joins the
    surviving offsets back and runs the cumulative window *within* each
    (lang, shard) — at 100 TB a dominant language costs one tiny extra
    aggregate scan, and only the first ~budget tokens' worth of shards
    are ever sorted. The single-window form this replaces sorted the
    entire language in one task before its filter could run.

    The slim (doc_id, lang, n_tokens, h, bshard) projection feeds both
    phases; ``cache()`` (lazy, MEMORY_AND_DISK, deduped by Spark's
    CacheManager across identical plans) makes the corpus scan +
    tokenizer run ONCE — without it each phase re-reads and re-tokenizes
    the full text, and at 100 TB the second scan costs more than
    materializing ~40 bytes/row ever could."""
    from pyspark.sql import Window

    width = -(-_MIX_M // n_shards)  # ceil: shard ids stay < n_shards
    d = (
        documents.select(
            "doc_id",
            "lang",
            # size(NULL) is -1 or NULL depending on spark.sql.legacy.sizeOfNull;
            # guard on the column itself so both configs yield 0 like the oracle
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(F.size(tokens("text")))
            .cast("long")
            .alias("n_tokens"),
            _shard_hash(F.col("doc_id")).alias("h"),
        )
        .withColumn("bshard", F.floor(F.col("h") / F.lit(width)).cast("int"))
        .cache()
    )

    parts = d.groupBy("lang", "bshard").agg(F.sum("n_tokens").alias("shard_tokens"))
    off_w = (
        Window.partitionBy("lang")
        .orderBy("bshard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parts.withColumn(
            "offset", F.coalesce(F.sum("shard_tokens").over(off_w), F.lit(0))
        )
        .filter(F.col("offset") < budget)
        .select(
            F.col("lang").alias("o_lang"),
            F.col("bshard").alias("o_bshard"),
            "offset",
        )
    )
    in_shard = (
        Window.partitionBy("lang", "bshard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(
            F.broadcast(offsets),
            F.col("lang").eqNullSafe(F.col("o_lang"))
            & (F.col("bshard") == F.col("o_bshard")),
        )
        .withColumn(
            "cum_tokens", F.col("offset") + F.sum("n_tokens").over(in_shard)
        )
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


def corpus_budget_sql(budget: int = TOKEN_BUDGET_PER_LANG) -> str:
    # The oracle keeps the one-window reference form: the sharded
    # two-phase prefix sum above is a pure execution-shape change and
    # must produce identical cum_tokens. COALESCE mirrors the Spark
    # side's null-text guard (Spark size(NULL) is -1, DuckDB len NULL).
    return (
        "WITH d AS (SELECT doc_id, lang, "
        f"CAST(COALESCE(len({tokens_sql('text')}), 0) AS BIGINT) AS n_tokens, "
        f"{_shard_hash_sql()} AS h FROM documents), "
        "c AS (SELECT doc_id, lang, n_tokens, "
        "CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS cum_tokens FROM d) "
        "SELECT doc_id, lang, n_tokens, cum_tokens FROM c "
        f"WHERE cum_tokens - n_tokens < {budget}"
    )


SEARCH_TERMS = ("vector", "stream", "merge")  # fixture query, conjunctive


def tfidf_top_terms(documents: DataFrame, k: int = 10) -> DataFrame:
    """Per-language distinctive terms by TF-IDF: term frequency aggregated
    per (lang, term), document frequency per term over the whole corpus,
    score = tf * ln(N / df) rounded to 6 decimals, top ``k`` per language
    by (score desc, term asc). Returns (lang, term, tf, df, tfidf).

    100 TB shape: one explode feeds two map-side partial aggregations
    (tf keyed on (lang, term), df on term after a per-doc distinct); the
    tf-df join and the ranking run over VOCABULARY-sized relations
    (terms, not documents), so the only corpus-sized work is the
    explode+aggregate scan — and even the vocabulary ranking is the
    :func:`skew_safe_topk` two-phase form, since a web-scale language's
    vocabulary (10^8+ distinct terms) is itself too big for one task's
    sort. The corpus row count enters the plan as a broadcast 1-row
    aggregate, not an eager driver-side count — the whole pipeline
    stays lazy.

    Cross-engine note: ranking uses the ROUNDED score on both engines —
    Java's Math.log and libm's ln may differ in the last ulp, and
    round-6 plus the term tiebreak makes the rank order identical."""
    # ONE corpus explode: aggregate to the (doc, lang, term) grain first
    # (vocab-per-doc-sized), materialize it, then derive tf AND df from
    # that grain — without the checkpoint, Catalyst duplicates the
    # unshared explode subtree and the corpus is scanned+tokenized twice
    dt_grain = (
        documents.select(
            "doc_id", "lang", F.explode(tokens("text")).alias("tok")
        )
        .select("doc_id", "lang", F.lower("tok").alias("term"))
        .groupBy("doc_id", "lang", "term")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    tf = dt_grain.groupBy("lang", "term").agg(F.sum("n").alias("tf"))
    df_ = dt_grain.groupBy("term").agg(F.count("*").alias("df"))
    n = documents.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    return skew_safe_topk(
        scored,
        ["lang"],
        [F.col("tfidf").desc(), F.col("term").asc()],
        k,
        F.pmod(F.xxhash64("term"), F.lit(8)),
        rank_name="rn",
    ).select("lang", "term", "tf", "df", "tfidf")


def tfidf_top_terms_sql(k: int = 10) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` — same rounded score, same
    (tfidf desc, term asc) rank order."""
    return (
        "WITH t AS (SELECT doc_id, lang, lower(u.tok) AS term "
        f"FROM documents, unnest({tokens_sql('text')}) AS u(tok)), "
        "tf AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY 1, 2), "
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1), "
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents), "
        "s AS (SELECT lang, tf.term, tf, df, "
        "round(tf * ln(n_docs / df), 6) AS tfidf "
        "FROM tf JOIN df USING (term) CROSS JOIN n) "
        "SELECT lang, term, tf, df, tfidf FROM ("
        "SELECT *, row_number() OVER (PARTITION BY lang "
        "ORDER BY tfidf DESC, term) AS rn FROM s) "
        f"WHERE rn <= {k}"
    )


def keyword_search(
    documents: DataFrame,
    terms: tuple[str, ...] = SEARCH_TERMS,
    k: int = 10,
) -> DataFrame:
    """Conjunctive keyword search: documents containing ALL query terms,
    ranked by total query-term occurrences (ties broken by doc_id).
    Returns the top ``k`` as (doc_id, score).

    100 TB shape: zero shuffle except the final top-k. Containment and
    scoring are per-row array kernels over the token list (codegen'd —
    ``array_intersect`` size equals the term count iff every distinct
    query term is present), so the plan is scan → filter → project →
    TakeOrderedAndProject; the conjunctive filter prunes before any
    per-term counting. An inverted index (explode → posting lists,
    cf. ``top_tokens``) is the right build for repeated ad-hoc queries;
    this is the single-query scan form."""
    # dedupe: containment is set semantics (array_intersect dedupes), so
    # a duplicated query term could otherwise never satisfy == len(qs);
    # the SQL twin and the indexed form dedupe identically
    qs = sorted({t.lower() for t in terms})
    if not qs:
        raise ValueError("keyword_search requires at least one term")
    toks = F.transform(tokens("text"), lambda t: F.lower(t))
    d = documents.select("doc_id", toks.alias("toks"))
    have_all = (
        F.size(F.array_intersect("toks", F.array(*[F.lit(q) for q in qs])))
        == len(qs)
    )
    score = F.size(F.filter("toks", lambda t: t.isin(*qs)))
    return (
        d.filter(have_all)
        .select("doc_id", score.cast("long").alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def keyword_search_sql(
    terms: tuple[str, ...] = SEARCH_TERMS, k: int = 10
) -> str:
    """DuckDB twin of :func:`keyword_search`."""
    qs = sorted({t.lower() for t in terms})
    inlist = ", ".join(f"'{q}'" for q in qs)
    return (
        "WITH d AS (SELECT doc_id, "
        f"list_transform({tokens_sql('text')}, t -> lower(t)) AS toks "
        "FROM documents) "
        "SELECT doc_id, "
        f"CAST(len(list_filter(toks, t -> t IN ({inlist}))) AS BIGINT) "
        "AS score FROM d "
        f"WHERE len(list_filter([{inlist}], q -> list_contains(toks, q))) "
        f"= {len(qs)} "
        f"ORDER BY score DESC, doc_id LIMIT {k}"
    )


PHRASE_TERMS = ("value", "table", "part")  # fixture phrase, exact-adjacency


def phrase_search(
    documents: DataFrame,
    phrase: tuple[str, ...] = PHRASE_TERMS,
    k: int = 10,
) -> DataFrame:
    """Exact PHRASE search — the retrieval capability conjunctive
    keyword/BM25 search cannot express: the query terms must occur
    ADJACENT and IN ORDER. This is the single-query scan form (the
    indexed twin is ``sources.writer.phrase_search_positional``):
    per row, count the token offsets where the n-token window equals
    the phrase — ``size(filter(sequence(1, len-n+1), i ->
    slice(toks, i, n) == phrase))`` — all codegen'd array kernels,
    zero shuffle except the final top-k (TakeOrderedAndProject).
    Returns (doc_id, n_hits) for documents containing the phrase,
    top-k by (n_hits desc, doc_id). Overlapping occurrences count
    (every start offset is tested independently)."""
    n = len(phrase)
    if n == 0:
        raise ValueError("phrase_search requires a non-empty phrase")
    wanted = [t.lower() for t in phrase]
    d = documents.select("doc_id", tokens("text").alias("toks"))
    # guard the sequence: Spark's sequence(1, 0) DESCENDS ([1, 0]); a
    # doc shorter than the phrase must contribute zero start offsets
    starts = F.when(
        F.size("toks") >= n,
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))

    # per-offset test: an unrolled short-circuiting AND of per-element
    # comparisons instead of materializing slice(toks, i, n) and an
    # array-equality per offset — no per-offset array allocation, and
    # most offsets exit on the first token. lower() runs on demand per
    # COMPARED element (~1 eval/offset with the short circuit) instead
    # of pre-lowering the whole token array into a second array per
    # document. Indexes are in bounds by the ``starts`` guard, so
    # element_at never trips ANSI bounds checking. Semantics unchanged:
    # slice-equality over non-null string arrays IS the conjunction of
    # element equalities.
    def _match(i: Column) -> Column:
        cond = F.lower(F.element_at(F.col("toks"), i)) == F.lit(wanted[0])
        for j in range(1, n):
            cond = cond & (
                F.lower(F.element_at(F.col("toks"), i + F.lit(j)))
                == F.lit(wanted[j])
            )
        return cond

    hits = F.size(F.filter(starts, _match))
    return (
        d.select("doc_id", hits.cast("long").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_search_sql(
    phrase: tuple[str, ...] = PHRASE_TERMS, k: int = 10
) -> str:
    """DuckDB twin of :func:`phrase_search` (1-based inclusive list
    slicing: ``toks[i : i+n-1]`` is the n-token window at offset i;
    ``range``'s exclusive stop empties itself on short docs)."""
    n = len(phrase)
    arr = ", ".join(f"'{t.lower()}'" for t in phrase)
    return (
        "WITH d AS (SELECT doc_id, "
        f"list_transform({tokens_sql('text')}, t -> lower(t)) AS toks "
        "FROM documents), "
        "h AS (SELECT doc_id, CAST(len(list_filter("
        f"range(1, len(toks) - {n} + 2), "
        f"i -> toks[i : i + {n - 1}] = [{arr}])) AS BIGINT) AS n_hits "
        "FROM d) "
        "SELECT doc_id, n_hits FROM h WHERE n_hits > 0 "
        f"ORDER BY n_hits DESC, doc_id LIMIT {k}"
    )


def bm25_score(tf_cols: list[Column], dl: Column, k1: float, b: float) -> Column:
    """The BM25 scoring expression tree — the SINGLE source both the
    scan form and the index-accelerated form build from, so their
    row-for-row equality (and the shared oracle) is structural, not
    copy-maintained. Expects the enclosing relation to carry 1-row
    broadcast columns ``nd``/``avgdl`` and per-term ``df_<i>`` aligned
    with ``tf_cols``'s order; literals/casts/associativity here define
    the cross-engine float contract mirrored by
    :func:`keyword_search_bm25_sql`."""
    contribs = []
    for i, tf in enumerate(tf_cols):
        df = F.col(f"df_{i}")
        idf = F.log(
            (F.col("nd") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * dl / F.col("avgdl")
        )
        contribs.append(idf * (tf * F.lit(k1 + 1.0)) / denom)
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return score


def keyword_search_bm25(
    documents: DataFrame,
    terms: tuple[str, ...] = SEARCH_TERMS,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Disjunctive keyword search ranked by Okapi BM25 (the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf form): documents containing
    ANY query term, scored ``sum_q idf(q) * tf*(k1+1) / (tf + k1*(1 - b
    + b*dl/avgdl))`` and returned as the top ``k`` (doc_id, bm25).

    100 TB shape: TWO corpus passes and nothing else — (1) a map-side
    partial aggregate computes the corpus statistics the formula needs
    (N, sum of document lengths, per-term document frequencies as
    summed containment flags — the term list is a small literal, so no
    explode and no posting lists); (2) the 1-row stats relation is
    broadcast (crossJoin) and scoring is a per-row codegen'd expression
    over the token array, ending in TakeOrderedAndProject. No job runs
    at plan-construction time — the stats stay a lazy aggregate under
    the broadcast exchange.

    Cross-engine determinism: every float enters through one exact
    integer cast or one division of exact integers (avgdl), the per-row
    expression tree is written with the same literals/associativity as
    the SQL twin, and the final score is round(6) so a last-ulp ``ln``
    difference cannot reorder the k-boundary (ties then break on
    doc_id)."""
    qs = sorted({t.lower() for t in terms})
    if not qs:
        raise ValueError("keyword_search_bm25 requires at least one term")
    toks = F.transform(tokens("text"), lambda t: F.lower(t))
    d = documents.select("doc_id", toks.alias("toks"))
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        (
            F.sum(F.size("toks")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", q), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("double")
            .alias(f"df_{i}")
            for i, q in enumerate(qs)
        ],
    )
    dl = F.size("toks").cast("double")
    # single-arg lambda: a second parameter would make F.filter
    # treat it as the (element, index) form
    tf_cols = [
        F.size(F.filter("toks", lambda t: t == F.lit(q))).cast("double")
        for q in qs
    ]
    score = bm25_score(tf_cols, dl, k1, b)
    have_any = (
        F.size(F.array_intersect("toks", F.array(*[F.lit(q) for q in qs])))
        >= 1
    )
    return (
        d.crossJoin(F.broadcast(stats))
        .filter(have_any)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def keyword_search_bm25_sql(
    terms: tuple[str, ...] = SEARCH_TERMS,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`keyword_search_bm25` — literals, cast
    points, and associativity mirror the Spark expression tree exactly
    so both engines fold the same doubles."""
    qs = sorted({t.lower() for t in terms})
    inlist = ", ".join(f"'{q}'" for q in qs)
    dfs = ", ".join(
        "CAST(sum(CASE WHEN list_contains(toks, '%s') THEN 1 ELSE 0 END)"
        " AS DOUBLE) AS df_%d" % (q, i)
        for i, q in enumerate(qs)
    )
    contribs = []
    for i, q in enumerate(qs):
        tf = f"CAST(len(list_filter(toks, t -> t = '{q}')) AS DOUBLE)"
        idf = f"ln((nd - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        denom = (
            f"({tf} + {k1!r} * ({1.0 - b!r} + {b!r} * "
            f"CAST(len(toks) AS DOUBLE) / avgdl))"
        )
        contribs.append(f"{idf} * ({tf} * {k1 + 1.0!r}) / {denom}")
    score = " + ".join(contribs)
    return (
        "WITH d AS (SELECT doc_id, "
        f"list_transform({tokens_sql('text')}, t -> lower(t)) AS toks "
        "FROM documents), "
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS nd, "
        "CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
        "AS avgdl, "
        f"{dfs} FROM d) "
        f"SELECT doc_id, round({score}, 6) AS bm25 FROM d, s "
        f"WHERE len(list_filter([{inlist}], q -> list_contains(toks, q))) "
        ">= 1 "
        f"ORDER BY bm25 DESC, doc_id LIMIT {k}"
    )


def quality_gate(documents: DataFrame, keep_frac: float = 0.3) -> DataFrame:
    """EXACT corpus-quantile quality filter: keep the top
    ``ceil(N * keep_frac)`` documents by (quality desc, doc_id asc) —
    the "train on the best 30%" gate, selected exactly, not by a
    sampled threshold.

    The naive form is one global sort (rank every document — the
    100 TB window killer). This instead exploits the score's BOUNDED
    cardinality (quality is round(6) on a [0,1] blend — at most ~10^6
    distinct values, in practice a few hundred): (1) a map-side
    histogram of per-score counts; (2) a cumulative window over the
    HISTOGRAM (metadata-sized, single task over score classes, not
    documents); (3) every document joins its score class (broadcast) —
    classes wholly above the cut are kept outright with zero sorting,
    and only the single boundary class ranks its members by doc_id to
    take the remaining ``k - above`` slots. The only per-document
    window is that one class; if a degenerate corpus puts most mass on
    one score, that window is the shape ``skew_safe_topk`` solves and
    can be swapped in.

    Cross-engine contract: ``k = ceil(double(N) * keep_frac)`` in
    DOUBLE arithmetic on both engines (a decimal-typed literal on one
    side would ceil to a different integer when N*frac lands near an
    integer); selection is equivalent to ``row_number() OVER (ORDER BY
    quality DESC, doc_id) <= k`` — the oracle's form."""
    from pyspark.sql import Window

    # the scored (doc_id, quality) proxy feeds THREE consumers — the
    # histogram build and the two selection branches below — and the
    # scoring lineage is the expensive part of this operator (two
    # corpus regexes + tokenize + stopword probe per document).
    # Materialize the 16-byte-per-row proxy ONCE (localCheckpoint) so
    # the plan pays one scoring scan instead of three; every later pass
    # reads the checkpointed proxy, never the text again (the
    # decide-on-small-rows shape — at 100 TB the proxy is ~16 B x N
    # docs vs three passes over the corpus text).
    scored = (
        quality_score(documents)
        .select("doc_id", "quality")
        .filter(F.col("quality").isNotNull())
        .localCheckpoint()
    )
    hist = scored.groupBy("quality").agg(F.count(F.lit(1)).alias("c"))
    # above AND k both come from windows over the HISTOGRAM, inside the
    # one broadcast relation: a separate k-aggregate (or a corpus count)
    # would re-evaluate the proxy once per consumer — this keeps the
    # whole plan at one scoring scan + three proxy reads, and the
    # shared broadcast is built once (ReusedExchange across the union)
    w_cum = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    hist = hist.select(
        "quality",
        "c",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("above"),
        F.ceil(F.sum("c").over(w_tot).cast("double") * F.lit(keep_frac))
        .cast("long")
        .alias("k"),
    )
    j = scored.join(F.broadcast(hist), "quality")
    full = j.filter(F.col("above") + F.col("c") <= F.col("k"))
    w_edge = Window.partitionBy("quality").orderBy("doc_id")
    edge = (
        j.filter(
            (F.col("above") < F.col("k"))
            & (F.col("above") + F.col("c") > F.col("k"))
        )
        .withColumn("rn", F.row_number().over(w_edge))
        .filter(F.col("rn") <= F.col("k") - F.col("above"))
    )
    return full.select("doc_id", "quality").unionByName(
        edge.select("doc_id", "quality")
    )


def _quality_scored_sql() -> str:
    """DuckDB relation (doc_id, quality) matching
    :func:`quality_score`'s blended score — built from the shared
    single-source builders."""
    return (
        f"SELECT doc_id, {quality_blend_sql()} AS quality FROM ("
        f"SELECT doc_id, {quality_ratios_sql()} FROM "
        f"({quality_qbase_sql()}))"
    )


def quality_gate_sql(keep_frac: float = 0.3) -> str:
    """DuckDB twin of :func:`quality_gate` — the straightforward
    row_number reference form the histogram selection must equal."""
    return (
        f"WITH s AS ({_quality_scored_sql()}), "
        "r AS (SELECT doc_id, quality, row_number() OVER "
        "(ORDER BY quality DESC, doc_id) AS rn FROM s "
        "WHERE quality IS NOT NULL), "
        # N counts scoreable (non-null-quality) docs only, like the
        # Spark histogram sum
        "k AS (SELECT CAST(ceil(CAST(count(*) AS DOUBLE) * "
        f"{keep_frac!r}) AS BIGINT) AS k FROM r) "
        "SELECT doc_id, quality FROM r, k WHERE rn <= k.k"
    )


def quality_gate_by_source(
    documents: DataFrame, keep_frac: float = 0.3
) -> DataFrame:
    """PER-SOURCE exact-quantile quality gate: every source keeps its
    own top ``ceil(n_source * keep_frac)`` documents by (quality desc,
    doc_id asc) — the diversity-preserving form of :func:`quality_gate`
    (a global cut lets one high-quality source crowd every other domain
    out of the mix; real curation gates within source and lets the
    mixture weights decide between sources).

    Same bounded-cardinality histogram trick, grouped: the per-score
    histogram keys on (source, quality) — still metadata-sized (sources
    × score classes); the cumulative and total windows partition by
    source (single task per source over its score CLASSES, not its
    documents); classes wholly above the per-source cut are kept with
    zero sorting and only each source's single boundary class ranks its
    members by doc_id. The ``source`` column rides the scoring
    projection itself (``quality_score(extra_cols=...)``), so the
    corpus is scanned exactly once.

    Cross-engine contract: per-source ``k = ceil(double(n_source) *
    keep_frac)``; selection equals ``row_number() OVER (PARTITION BY
    source ORDER BY quality DESC, doc_id) <= k`` — the oracle's form.
    Returns (doc_id, source, quality)."""
    from pyspark.sql import Window

    # source rides the scoring projection (extra_cols) instead of a
    # second corpus scan + doc_id shuffle join to re-attach it, and the
    # (doc_id, source, quality) proxy is materialized once for the same
    # three-consumer reason as quality_gate's (one scoring scan, not
    # three; no join exchange at all)
    scored = (
        quality_score(documents, extra_cols=("source",))
        .select("doc_id", "source", "quality")
        .filter(F.col("quality").isNotNull())
        .localCheckpoint()
    )
    hist = scored.groupBy("source", "quality").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    hist = hist.select(
        "source",
        "quality",
        "c",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("above"),
        F.ceil(F.sum("c").over(w_tot).cast("double") * F.lit(keep_frac))
        .cast("long")
        .alias("k"),
    )
    j = scored.join(F.broadcast(hist), ["source", "quality"])
    full = j.filter(F.col("above") + F.col("c") <= F.col("k"))
    w_edge = Window.partitionBy("source", "quality").orderBy("doc_id")
    edge = (
        j.filter(
            (F.col("above") < F.col("k"))
            & (F.col("above") + F.col("c") > F.col("k"))
        )
        .withColumn("rn", F.row_number().over(w_edge))
        .filter(F.col("rn") <= F.col("k") - F.col("above"))
    )
    return full.select("doc_id", "source", "quality").unionByName(
        edge.select("doc_id", "source", "quality")
    )


def quality_gate_by_source_sql(keep_frac: float = 0.3) -> str:
    """DuckDB twin of :func:`quality_gate_by_source` — the per-source
    row_number reference form the grouped histogram selection must
    equal."""
    return (
        f"WITH sc AS ({_quality_scored_sql()}), "
        "s AS (SELECT sc.doc_id, d.source, sc.quality FROM sc "
        "JOIN documents d ON sc.doc_id = d.doc_id "
        "WHERE sc.quality IS NOT NULL), "
        "r AS (SELECT doc_id, source, quality, row_number() OVER "
        "(PARTITION BY source ORDER BY quality DESC, doc_id) AS rn, "
        "count(*) OVER (PARTITION BY source) AS n FROM s) "
        "SELECT doc_id, source, quality FROM r "
        "WHERE rn <= CAST(ceil(CAST(n AS DOUBLE) * "
        f"{keep_frac!r}) AS BIGINT)"
    )


def line_dedup(documents: DataFrame, min_docs: int = 2) -> DataFrame:
    """Boilerplate line removal — the C4/RefinedWeb corpus-cleaning
    step: any LINE occurring in ``min_docs`` or more distinct documents
    (nav bars, cookie banners, license headers) is deleted from every
    document. Returns one row per input document:
    (doc_id, clean_text, n_lines, n_kept) — ``clean_text`` is the
    surviving lines re-joined in original order ('' when everything was
    boilerplate).

    100 TB shape: posexplode lines once; group by the line's md5 (the
    32-hex key shuffles instead of arbitrarily long line text; at
    production scale the same shape runs on ``xxhash64`` for 8-byte
    keys — md5 here because the oracle must compute the identical key)
    with a map-side partial count-distinct; the boilerplate set —
    typically tiny relative to the corpus — comes back as a left_anti
    join that AQE converts to broadcast at runtime when it is small,
    with the shuffled-hash fallback for adversarial corpora; one final
    groupBy(doc_id) reassembles (doc_id is the input's layout key, so
    with a line-preserving source layout this is the only full-width
    exchange). No Python anywhere.

    Determinism: per-doc line order is restored by sorting the
    collected (pos, line) structs — position is unique within a doc, so
    the rebuild never depends on shuffle arrival order."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    lines = documents.select(
        "doc_id", F.posexplode(F.split(txt, "\n")).alias("pos", "line")
    )
    boiler = (
        lines.groupBy(F.md5("line").alias("h"))
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    kept = lines.withColumn("h", F.md5("line")).join(boiler, "h", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    # n_lines from the already-exploded relation (split yields >= 1
    # element for every doc, so no doc is lost) — NOT a second scan of
    # the full text column
    n_lines = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    return (
        n_lines.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        )
    )


def line_dedup_sql(min_docs: int = 2) -> str:
    """DuckDB twin of :func:`line_dedup` (same md5 grouping key, same
    position-ordered rebuild)."""
    split = "string_split(coalesce(text, ''), chr(10))"
    return (
        f"WITH l AS (SELECT doc_id, u.i AS pos, {split}[u.i + 1] AS line "
        f"FROM documents, unnest(range(len({split}))) AS u(i)), "
        "b AS (SELECT md5(line) AS h FROM l GROUP BY md5(line) "
        f"HAVING count(DISTINCT doc_id) >= {min_docs}), "
        "k AS (SELECT doc_id, pos, line FROM l "
        "WHERE md5(line) NOT IN (SELECT h FROM b)), "
        "a AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) "
        "AS clean_text, CAST(count(*) AS BIGINT) AS n_kept "
        "FROM k GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text, "
        f"CAST(len({split.replace('text', 'd.text')}) AS BIGINT) AS n_lines, "
        "coalesce(a.n_kept, 0) AS n_kept "
        "FROM documents d LEFT JOIN a USING (doc_id)"
    )


def span_dedup(
    documents: DataFrame,
    span_len: int = 8,
    min_docs: int = 2,
    key: str = "md5",
) -> DataFrame:
    """Exact duplicated-SPAN removal — the substring-level sibling of
    :func:`line_dedup` (the ExactSubstr idea of Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): any run of ``span_len``
    consecutive tokens occurring in ``min_docs`` or more DISTINCT
    documents (templated passages, quoted licenses, syndicated
    paragraphs — duplication that line- and document-level dedup both
    miss because the surrounding text differs) is deleted from every
    document. A token is removed iff it is covered by at least one
    duplicated span window. Returns one row per input document:
    (doc_id, clean_text, n_tokens, n_kept) — surviving tokens re-joined
    in original order.

    100 TB shape: ONE tokenize pass; the span keys are md5 of the
    joined token window (a 32-hex shuffle key the oracle can compute) —
    ``key="xxhash64"`` (:func:`span_dedup_hashed`) is the production
    form: ``xxhash64`` over the token-array window (JVM-side element
    fold) so the shuffle carries 8-byte keys and the window string is
    never materialized, exactly line_dedup's md5-vs-xxhash64 note;
    identical output barring a 64-bit collision, so the md5 SQL twin IS
    its oracle (same adjudication as decontaminate_hashed). Duplicated
    spans come back as a left_semi
    join (broadcast under AQE when the dup set is small); coverage is a
    per-document ordered window over DENSE positions (``ROWS span_len-1
    PRECEDING`` == the span-cover predicate because every position is
    present), so the only data-sized exchanges are the span-key
    aggregation and the doc_id-keyed rebuild. Within-doc repetition
    alone never triggers removal (the count is DISTINCT doc_id) — that
    is :func:`repetition_stats`' job."""
    from pyspark.sql import Window

    txt = F.coalesce(F.col("text"), F.lit(""))
    # spread the raw rows first (single-file sources), then pin the
    # tokenized table: it feeds the span-key build, the position table,
    # AND the rebuild — without materialization every consumer re-runs
    # the tokenize pass (the same localCheckpoint pattern as the
    # minhash/ngram shingle tables). r15: the checkpoint RECORDS its
    # doc_id partitioning (_checkpoint_partitioned) — posexplode
    # preserves it, so the coverage join, the coverage window, the
    # rebuild aggregation and the final assembly joins below are ALL
    # exchange-free on the token-level relations; the only token-level
    # shuffle left is the fundamental span-key aggregation on h
    from tiny_md_hbase_spark.operators.graph import _checkpoint_partitioned

    toks = _checkpoint_partitioned(
        documents.select("doc_id", tokens(txt).alias("toks")), "doc_id"
    )
    pos = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    # span start positions: one span KEY per window-start; docs shorter
    # than span_len contribute none (the sequence guard — an unguarded
    # sequence(0, negative) would DESCEND and fabricate grams)
    if key == "md5":
        # oracle-computable form: the window string is materialized and
        # md5'd (a 32-hex shuffle key DuckDB can reproduce)
        keyed = toks.select(
            "doc_id",
            F.posexplode(
                F.when(
                    F.size("toks") >= span_len,
                    F.transform(
                        F.sequence(F.lit(0), F.size("toks") - span_len),
                        lambda i: F.md5(
                            F.array_join(F.slice("toks", i + 1, span_len), " ")
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "h"),
        )
    elif key == "xxhash64":
        # production form: each window key is xxhash64 over the token
        # ARRAY slice — Spark's HashExpression folds the elements with
        # seed chaining entirely JVM-side, so the shuffle carries
        # LongType keys and the joined window string is NEVER
        # materialized (at span_len 8 that is ~8x less shuffle payload
        # than the md5-of-joined-string form, and no per-window concat).
        # No wrapping arithmetic needed (ANSI mode forbids overflowing
        # multiply, which rules out a hand-rolled polynomial fold).
        keyed = toks.select(
            "doc_id",
            F.posexplode(
                F.when(
                    F.size("toks") >= span_len,
                    F.transform(
                        F.sequence(F.lit(0), F.size("toks") - span_len),
                        lambda i: F.xxhash64(F.slice("toks", i + 1, span_len)),
                    ),
                ).otherwise(F.array().cast("array<long>"))
            ).alias("pos", "h"),
        )
    else:
        raise ValueError(f"span_dedup key must be md5 or xxhash64, got {key!r}")
    dup = (
        keyed.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    starts = (
        keyed.join(dup, "h", "left_semi")
        .select("doc_id", "pos", F.lit(1).alias("is_start"))
    )
    w_cov = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(span_len - 1), 0)
    )
    flagged = pos.join(starts, ["doc_id", "pos"], "left").withColumn(
        "cov", F.max(F.coalesce("is_start", F.lit(0))).over(w_cov)
    )
    rebuilt = (
        flagged.filter(F.col("cov") == 0)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    # n_tokens is size(toks) — identical to counting the exploded rows
    # (posexplode emits exactly size(toks) rows, 0 for the empty array)
    # without a second token-level aggregation pass; anchoring the
    # assembly on toks (same doc_id rows as documents, and already
    # doc_id-partitioned) keeps the final left joins exchange-free
    return (
        toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        )
    )


def span_dedup_hashed(
    documents: DataFrame, span_len: int = 8, min_docs: int = 2
) -> DataFrame:
    """PRODUCTION form of :func:`span_dedup`: LongType span keys from
    xxhash64 over the token-array window — ~8x less shuffle payload
    than the md5-of-joined-window form and no per-window string concat;
    identical output barring a 64-bit key collision (~1e-8 at 10^9
    spans), so :func:`span_dedup_sql` (the md5 twin) is its oracle."""
    return span_dedup(documents, span_len=span_len, min_docs=min_docs, key="xxhash64")


def span_dedup_sql(span_len: int = 8, min_docs: int = 2) -> str:
    """DuckDB twin of :func:`span_dedup` (same md5 span keys, same dense
    ROWS-frame cover, same position-ordered rebuild)."""
    toks = tokens_sql("coalesce(text, '')")
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM documents), "
        "p AS (SELECT doc_id, u.i AS pos, toks[u.i + 1] AS tok "
        "FROM t, unnest(range(len(toks))) AS u(i)), "
        "g AS (SELECT doc_id, u.i AS pos, "
        f"array_to_string(toks[u.i + 1 : u.i + {span_len}], ' ') AS gram "
        f"FROM t, unnest(range(CASE WHEN len(toks) >= {span_len} "
        f"THEN len(toks) - {span_len} + 1 ELSE 0 END)) AS u(i)), "
        "d AS (SELECT md5(gram) AS h FROM g GROUP BY md5(gram) "
        f"HAVING count(DISTINCT doc_id) >= {min_docs}), "
        "s AS (SELECT doc_id, pos FROM g "
        "WHERE md5(gram) IN (SELECT h FROM d)), "
        "c AS (SELECT p.doc_id, p.pos, p.tok, "
        "max(CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END) OVER ("
        "PARTITION BY p.doc_id ORDER BY p.pos "
        f"ROWS BETWEEN {span_len - 1} PRECEDING AND CURRENT ROW) AS cov "
        "FROM p LEFT JOIN s ON p.doc_id = s.doc_id AND p.pos = s.pos), "
        "a AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) "
        "AS clean_text, CAST(count(*) AS BIGINT) AS n_kept "
        "FROM c WHERE cov = 0 GROUP BY doc_id), "
        "n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens "
        "FROM p GROUP BY doc_id) "
        "SELECT d0.doc_id, coalesce(a.clean_text, '') AS clean_text, "
        "coalesce(n.n_tokens, 0) AS n_tokens, "
        "coalesce(a.n_kept, 0) AS n_kept "
        "FROM documents d0 LEFT JOIN n USING (doc_id) "
        "LEFT JOIN a USING (doc_id)"
    )


def source_overlap(
    documents: DataFrame, gram_len: int = 8, k: int = 50
) -> DataFrame:
    """Cross-source contamination matrix: for each pair of corpus
    sources, how many DISTINCT ``gram_len``-token windows they share —
    the "how much does source A duplicate source B" audit that decides
    which sources a training mix can include together (licensed text
    syndicated into scrapes, mirrored sites, benchmark leakage between
    collections). Returns top-``k`` (source_a, source_b, n_shared)
    with source_a < source_b, ordered (n_shared desc, source_a,
    source_b) — a total order.

    Scale shape: the (gram-key, source) incidence list is DISTINCT
    before the pair join (the co_purchase idiom — each shared gram
    contributes exactly one row per source pair, so the count is a
    plain ``count(*)``), and per-gram pair fan-out is bounded by
    C(|sources|, 2) — source count is pipeline METADATA (tens to
    hundreds), so no hub cap is needed where co_purchase needs one.
    Gram keys are md5 strings so the DuckDB twin can compute them;
    production swaps xxhash64 exactly as span_dedup_hashed does."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    para = documents.sparkSession.sparkContext.defaultParallelism
    toks = documents.repartition(para, "doc_id").select(
        "source", tokens(txt).alias("toks")
    )
    grams = toks.select(
        "source",
        F.explode(
            F.when(
                F.size("toks") >= gram_len,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - gram_len),
                    lambda i: F.md5(
                        F.array_join(F.slice("toks", i + 1, gram_len), " ")
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("h"),
    )
    # materialize ONCE before the self-join (the co_purchase rule: the
    # planner does not reuse the tokenize→md5→distinct subtree across
    # the two aliases)
    inc = grams.distinct().localCheckpoint()
    a, b = inc.alias("a"), inc.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), "source_a", "source_b")
        .limit(k)
    )


def source_overlap_sql(gram_len: int = 8, k: int = 50) -> str:
    """DuckDB twin of :func:`source_overlap` (same md5 gram keys, same
    distinct-before-pair incidence, same total order)."""
    toks = tokens_sql("coalesce(text, '')")
    return (
        f"WITH t AS (SELECT source, {toks} AS toks FROM documents), "
        "g AS (SELECT DISTINCT source, "
        f"md5(array_to_string(toks[u.i + 1 : u.i + {gram_len}], ' ')) AS h "
        f"FROM t, unnest(range(CASE WHEN len(toks) >= {gram_len} "
        f"THEN len(toks) - {gram_len} + 1 ELSE 0 END)) AS u(i)) "
        "SELECT a.source AS source_a, b.source AS source_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM g a JOIN g b ON a.h = b.h AND a.source < b.source "
        "GROUP BY a.source, b.source "
        f"ORDER BY n_shared DESC, source_a, source_b LIMIT {k}"
    )


def lm_bigram_score(documents: DataFrame) -> DataFrame:
    """Corpus-trained bigram surprisal scoring — the perplexity-filter
    primitive (CCNet-style) without an external model: score each
    document by the average negative log relative-frequency of its
    bigrams under the corpus's own empirical bigram distribution
    (higher nll = rarer constructions = less typical of the corpus).
    Returns (doc_id, n_bigrams, nll); documents with < 2 tokens have no
    bigrams and are omitted.

    Deliberately a joint-frequency model, not an add-one conditional
    P(w2|w1): backoff-free Laplace smoothing hands near-uniform 1/V
    probability to bigrams whose CONTEXT is rare, which *rewards*
    never-seen-before junk on any corpus whose vocabulary is small
    relative to its context counts. Joint surprisal penalizes rare
    bigrams monotonically. Self-counts are included (a document's own
    bigrams are part of the corpus distribution); an out-of-fold
    variant would subtract the document's contribution.

    100 TB shape: ONE explode produces the positioned bigram relation
    (checkpointed — it feeds both the model aggregate and the probe
    side of the scoring join); the model is a vocabulary-bounded count
    aggregate; scoring joins bigram instances to the model on short
    string keys (an 8-byte hashed-key variant is the same join shape);
    the total count derives from the model (vocab-sized scan) and
    enters as a broadcast 1-row aggregate.

    Cross-engine determinism: a plain float SUM/AVG aggregates in
    partition order, which no oracle can reproduce — so each document's
    log-probs are collected, sorted by token position, and folded
    left-to-right (the module's list_sum/F.aggregate contract), with a
    single per-row division and one final round(6)."""
    from pyspark.sql.types import DoubleType

    lt = F.transform(tokens("text"), lambda t: F.lower(t))
    d = documents.select("doc_id", lt.alias("lt"))
    bg_structs = F.when(
        F.size("lt") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("lt") - 2),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(
                    " ", F.element_at("lt", i + 1), F.element_at("lt", i + 2)
                ).alias("bg"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,bg:string>>"))
    # ONE corpus explode: the positioned-bigram relation feeds the model
    # aggregate AND the probe side of the scoring join — checkpoint it
    # or Catalyst re-runs the tokenize+explode for each consumer; the
    # total count then derives from the (vocab-sized) model instead of
    # a third corpus scan
    b = (
        d.select("doc_id", F.explode(bg_structs).alias("s"))
        .select("doc_id", "s.pos", "s.bg")
        .localCheckpoint()
    )
    c12 = b.groupBy("bg").agg(F.count("*").alias("c12"))
    nb = c12.agg(F.sum("c12").cast("double").alias("nb"))
    lnp = F.log(F.col("c12") / F.col("nb"))
    scored = (
        b.join(c12, "bg")
        .crossJoin(F.broadcast(nb))
        .select("doc_id", "pos", lnp.cast(DoubleType()).alias("lnp"))
    )
    g = scored.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "lnp"))).alias("ps"),
        F.count("*").alias("n_bigrams"),
    )
    nll_sum = F.aggregate(
        F.transform("ps", lambda s: s.lnp), F.lit(0.0), lambda a, x: a + x
    )
    return g.select(
        "doc_id",
        "n_bigrams",
        F.round(-nll_sum / F.col("n_bigrams"), 6).alias("nll"),
    )


def lm_bigram_score_sql() -> str:
    """DuckDB twin of :func:`lm_bigram_score` — same positioned bigrams,
    same joint relative-frequency, same position-ordered sum."""
    return (
        "WITH d AS (SELECT doc_id, "
        f"list_transform({tokens_sql('text')}, t -> lower(t)) AS lt "
        "FROM documents), "
        "b AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos, "
        "lt[u.i + 1] || ' ' || lt[u.i + 2] AS bg "
        "FROM d, unnest(range(len(lt) - 1)) AS u(i) WHERE len(lt) >= 2), "
        "c12 AS (SELECT bg, count(*) AS c12 FROM b GROUP BY 1), "
        "nb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM b), "
        "s AS (SELECT doc_id, pos, ln(c12 / nb) AS lnp "
        "FROM b JOIN c12 USING (bg) CROSS JOIN nb), "
        "g AS (SELECT doc_id, count(*) AS n_bigrams, "
        "list(lnp ORDER BY pos) AS ps FROM s GROUP BY 1) "
        "SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, "
        "round(-list_sum(ps) / n_bigrams, 6) AS nll FROM g"
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


COLLOC_MIN_COUNT = 5
COLLOC_LIFT_SCALE = 1_000_000_000_000  # 1e12: integer lift resolution


def collocations(
    documents: DataFrame,
    k: int = 20,
    min_count: int = COLLOC_MIN_COUNT,
) -> DataFrame:
    """Top-k collocations (PMI-ranked adjacent token pairs) — the
    classic corpus-linguistics signal (fixed phrases, named entities,
    boilerplate constructions surface first) and the tokenizer-merge
    shortlist's statistical cousin (BPE's pair counts rank by raw
    frequency; PMI ranks by ASSOCIATION, surfacing pairs whose parts
    rarely occur apart). Returns (term_a, term_b, n_pair, lift_score),
    (lift_score desc, term_a, term_b) order, top-k among pairs with
    ``n_pair >= min_count`` (the standard low-count PMI guard —
    hapax pairs otherwise dominate any PMI ranking).

    Cross-engine determinism without logs: PMI = ln(p_ab/(p_a·p_b))
    ranks identically to the LIFT ratio c_ab/(c_a·c_b) on a fixed
    corpus (the normalizers are pair-independent constants and ln is
    monotone), so the score is the exact INTEGER
    ``c_ab·SCALE div (c_a·c_b)`` — DECIMAL(38,0) arithmetic on Spark,
    HUGEINT on DuckDB, truncating division on positive values in both —
    and no float (or libm ln) ever enters the ordering. Truncation
    ties break on the pair itself (a total order).

    100 TB shape: one corpus explode for pairs, one for unigrams
    (both map-side-partial count aggregates; the pair aggregate's
    ``HAVING >= min_count`` prunes the long tail before any join);
    the two unigram joins key on vocabulary-sized relations (AQE
    broadcasts them); the final top-k is TakeOrderedAndProject."""
    lt = F.transform(tokens("text"), lambda t: F.lower(t))
    d = documents.select(lt.alias("lt"))
    pair_structs = F.when(
        F.size("lt") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("lt") - 2),
            lambda i: F.struct(
                F.element_at("lt", i + 1).alias("a"),
                F.element_at("lt", i + 2).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pairs = d.select(F.explode(pair_structs).alias("p")).select("p.a", "p.b")
    uni = d.select(F.explode("lt").alias("w")).groupBy("w").agg(
        F.count("*").alias("cw")
    )
    big = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("cab"))
        .filter(F.col("cab") >= min_count)
    )
    j = (
        big.join(
            uni.select(F.col("w").alias("a"), F.col("cw").alias("ca")), "a"
        )
        .join(
            uni.select(F.col("w").alias("b"), F.col("cw").alias("cb")), "b"
        )
    )
    score = F.expr(
        f"CAST(cab AS DECIMAL(38,0)) * {COLLOC_LIFT_SCALE} div "
        "(CAST(ca AS DECIMAL(38,0)) * CAST(cb AS DECIMAL(38,0)))"
    )
    return (
        j.select(
            F.col("a").alias("term_a"),
            F.col("b").alias("term_b"),
            F.col("cab").cast("long").alias("n_pair"),
            score.cast("long").alias("lift_score"),
        )
        .orderBy(F.desc("lift_score"), "term_a", "term_b")
        .limit(k)
    )


def collocations_sql(
    k: int = 20, min_count: int = COLLOC_MIN_COUNT
) -> str:
    """DuckDB twin of :func:`collocations` — same adjacent pairs, same
    min-count guard, same HUGEINT truncating-division lift."""
    return (
        "WITH d AS (SELECT "
        f"list_transform({tokens_sql('text')}, t -> lower(t)) AS lt "
        "FROM documents), "
        "p AS (SELECT lt[u.i + 1] AS a, lt[u.i + 2] AS b "
        "FROM d, unnest(range(len(lt) - 1)) AS u(i) WHERE len(lt) >= 2), "
        "uni AS (SELECT w, count(*) AS cw FROM "
        "(SELECT unnest(lt) AS w FROM d) GROUP BY 1), "
        "big AS (SELECT a, b, count(*) AS cab FROM p GROUP BY 1, 2 "
        f"HAVING count(*) >= {min_count}), "
        "j AS (SELECT a, b, cab, ua.cw AS ca, ub.cw AS cb FROM big "
        "JOIN uni ua ON big.a = ua.w JOIN uni ub ON big.b = ub.w) "
        "SELECT a AS term_a, b AS term_b, CAST(cab AS BIGINT) AS n_pair, "
        f"CAST(CAST(cab AS HUGEINT) * {COLLOC_LIFT_SCALE} // "
        "(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)) AS BIGINT) "
        "AS lift_score "
        f"FROM j ORDER BY lift_score DESC, term_a, term_b LIMIT {k}"
    )


def gopher_quality(documents: DataFrame) -> DataFrame:
    """The Gopher repetition-free quality rules (Rae et al. 2021, §A1.1 —
    public), as one row-local codegen pass per document. Each rule is an
    explicit boolean column so a pipeline can report WHY a document was
    dropped, plus the conjunctive ``passes`` flag:

    - 50 <= word count <= 100 000,
    - 3 <= mean word length <= 10,
    - >= 80% of words contain an alphabetic character,
    - symbol-to-word ratio (#/ellipsis) <= 0.1,
    - >= 2 hits from the 8 canonical stopwords.

    Every ratio is one per-row double division (the module's
    determinism contract); outputs are rounded to 6. Zero-token
    documents fail the word-count rule and report NULL ratios — the
    denominator is NULLIF(n_words, 0) on BOTH engines, because the
    session runs ANSI mode where a bare /0 is an error, not a NULL
    (and SQL three-valued logic makes false AND NULL = false, so
    ``passes`` stays false, never NULL-drops a row)."""
    toks = tokens("text")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    n_symbols = (
        F.size(F.split("text", "#", -1))
        - 1
        + F.size(F.split("text", r"\.\.\.", -1))
        - 1
    )
    n_stop = _marker_hits(toks, list(GOPHER_STOPWORDS))
    d = documents.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_len.alias("sum_len"),
        n_alpha_words.alias("n_alpha_words"),
        n_symbols.alias("n_symbols"),
        n_stop.alias("n_stop"),
    )
    den = F.nullif(F.col("n_words"), F.lit(0))
    mean_len = F.col("sum_len") / den
    alpha_frac = F.col("n_alpha_words") / den
    sym_ratio = F.col("n_symbols") / den
    r_count = (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
    r_len = (mean_len >= 3) & (mean_len <= 10)
    r_alpha = alpha_frac >= 0.8
    r_sym = sym_ratio <= 0.1
    r_stop = F.col("n_stop") >= 2
    return d.select(
        "doc_id",
        "n_words",
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.col("n_stop").alias("n_stopword_hits"),
        r_count.alias("ok_word_count"),
        r_len.alias("ok_mean_len"),
        r_alpha.alias("ok_alpha_words"),
        r_sym.alias("ok_symbol_ratio"),
        r_stop.alias("ok_stopwords"),
        (r_count & r_len & r_alpha & r_sym & r_stop).alias("passes"),
    )


def gopher_quality_sql() -> str:
    """DuckDB twin of :func:`gopher_quality` — same token list, same
    single-division ratios, same rule thresholds."""
    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    t = tokens_sql("text")
    return (
        f"WITH d AS (SELECT doc_id, {t} AS toks, text FROM documents), "
        "m AS (SELECT doc_id, len(toks) AS n_words, "
        "CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) "
        "AS sum_len, "
        "len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) "
        "AS n_alpha_words, "
        "len(regexp_split_to_array(text, '#')) - 1 "
        "+ len(regexp_split_to_array(text, '\\.\\.\\.')) - 1 AS n_symbols, "
        f"len(list_filter(toks, t -> lower(t) IN ({stop}))) AS n_stop "
        "FROM d) "
        "SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, "
        "round(sum_len / NULLIF(n_words, 0), 6) AS mean_word_len, "
        "round(n_alpha_words / CAST(NULLIF(n_words, 0) AS DOUBLE), 6) "
        "AS alpha_word_frac, "
        "round(n_symbols / CAST(NULLIF(n_words, 0) AS DOUBLE), 6) "
        "AS symbol_ratio, "
        "CAST(n_stop AS INTEGER) AS n_stopword_hits, "
        "n_words >= 50 AND n_words <= 100000 AS ok_word_count, "
        "sum_len / NULLIF(n_words, 0) >= 3 "
        "AND sum_len / NULLIF(n_words, 0) <= 10 AS ok_mean_len, "
        "n_alpha_words / CAST(NULLIF(n_words, 0) AS DOUBLE) >= 0.8 "
        "AS ok_alpha_words, "
        "n_symbols / CAST(NULLIF(n_words, 0) AS DOUBLE) <= 0.1 "
        "AS ok_symbol_ratio, "
        "n_stop >= 2 AS ok_stopwords, "
        "(n_words >= 50 AND n_words <= 100000) "
        "AND (sum_len / NULLIF(n_words, 0) >= 3 "
        "AND sum_len / NULLIF(n_words, 0) <= 10) "
        "AND (n_alpha_words / CAST(NULLIF(n_words, 0) AS DOUBLE) >= 0.8) "
        "AND (n_symbols / CAST(NULLIF(n_words, 0) AS DOUBLE) <= 0.1) "
        "AND (n_stop >= 2) AS passes FROM m"
    )


SPLIT_PPM = (980_000, 10_000, 10_000)  # train / validation / test


def corpus_split(
    documents: DataFrame, ppm: tuple[int, int, int] = SPLIT_PPM
) -> DataFrame:
    """Deterministic train/validation/test assignment: each document's
    split is a pure function of ``doc_id`` (the :func:`corpus_mix` LCG
    reduced mod 1e6 against integer thresholds), so the partition is
    stable under repartitioning, re-runs, and incremental appends — a
    document NEVER migrates between splits when the corpus grows, the
    property ``randomSplit`` (per-partition RNG) cannot give. Returns
    (doc_id, lang, split). Row-local, zero shuffle; integer thresholds
    keep the cut bit-identical across engines (no float boundaries).

    Held-out hygiene note: hash-of-id splitting prevents LEAKAGE BY
    IDENTITY only; near-duplicate leakage across splits is what
    ``decontaminate``/``decontaminate_fuzzy`` are for, downstream."""
    t1, t2, _ = ppm
    key = _mix_hash(F.col("doc_id")) % F.lit(1_000_000)
    split = (
        F.when(key < t1, "train")
        .when(key < t1 + t2, "validation")
        .otherwise("test")
    )
    return documents.select("doc_id", "lang", split.alias("split"))


def corpus_split_sql(ppm: tuple[int, int, int] = SPLIT_PPM) -> str:
    """DuckDB twin of :func:`corpus_split` — same LCG, same integer
    thresholds."""
    t1, t2, _ = ppm
    key = f"{_mix_hash_sql()} % 1000000"
    return (
        "SELECT doc_id, lang, "
        f"CASE WHEN {key} < {t1} THEN 'train' "
        f"WHEN {key} < {t1 + t2} THEN 'validation' "
        "ELSE 'test' END AS split FROM documents"
    )


def source_cap(
    documents: DataFrame, cap: int = 10, n_shards: int = 8
) -> DataFrame:
    """Per-source frequency cap: keep at most ``cap`` documents from each
    source, preferring longer documents (``n_chars`` desc, doc_id asc
    tiebreak) — the domain-balancing step every web-scale corpus applies
    so one giant crawl host can't dominate the training mix.

    100 TB shape: the naive form is one ``row_number`` window over
    ``partitionBy(source)`` — a single task sorting ALL of a dominant
    source (the same funnel ``corpus_budget`` had before its rework).
    Instead, two phases of the classic skew-safe top-N:

    1. local: rank within (source, shard) where shard =
       ``doc_id * Knuth-hash % n_shards`` — a dominant source fans out
       over ``n_shards`` tasks, each keeping its local top ``cap``;
    2. global: re-rank the ≤ cap × n_shards survivors per source. The
       second window's per-source input is bounded by a CONSTANT
       (cap × n_shards rows), not by the source's corpus share, so no
       task ever sorts more than that regardless of skew.

    Every true global top-``cap`` row is its shard's local top-``cap``
    (rank within a subset never exceeds rank within the whole), so
    phase 1 provably drops no survivor (the shared :func:`skew_safe_topk`
    mechanics). The shard is ``xxhash64(doc_id) % n_shards`` — a
    multiplicative-constant shard would be a no-op mod a power-of-two
    (the constant is odd ≡ 1 mod 8/16), re-creating the funnel for
    stride-minted id schemes, and its unreduced multiply overflows
    BIGINT under ANSI mode for ids ≥ ~3.5e9. Output: (doc_id, source,
    n_chars, rank) with rank the true per-source rank — identical to
    the single-window oracle."""
    return skew_safe_topk(
        documents.select("doc_id", "source", "n_chars"),
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        cap,
        F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)),
    ).select("doc_id", "source", "n_chars", "rank")


def source_cap_sql(cap: int = 10) -> str:
    """DuckDB twin of :func:`source_cap` — the single-window reference
    form (the oracle need not be skew-safe; it must only pin the exact
    survivors and ranks the two-phase plan must reproduce)."""
    return (
        "SELECT doc_id, source, n_chars, CAST(rn AS INTEGER) AS rank FROM ("
        "SELECT doc_id, source, n_chars, row_number() OVER ("
        "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn "
        f"FROM documents) WHERE rn <= {cap}"
    )


def corpus_manifest(
    documents: DataFrame, n_shards: int = SHUFFLE_SHARDS
) -> DataFrame:
    """Per-shard integrity manifest — the dataset-card / audit artifact
    a training run records next to its shards: document count, token
    total, doc_id span, and an order-independent content checksum, one
    row per shard of the :func:`corpus_shuffle` layout.

    The checksum is the SUM of the portable per-document fingerprint
    (:func:`fingerprint_col`) mod 1e9+7 — order-independent (addition
    commutes, so it is stable under any partitioning / shard write
    order) and engine-portable, unlike xxhash64. The sum accumulates in
    DECIMAL(38,0), which holds ~10^29 documents' worth of 30-bit
    fingerprints without overflow; only the final mod narrows to BIGINT.

    100 TB shape: ONE map-side-partial aggregation keyed by shard — the
    scan computes (shard, n_tokens, fp) per row and reduces; nothing
    else moves. Re-run after any copy/restore and diff against the
    recorded manifest: a changed checksum pins corruption to a shard
    without re-reading text anywhere else."""
    h = _shard_hash(F.col("doc_id"))
    d = documents.select(
        _shard_of(h, n_shards).alias("shard"),
        F.col("doc_id"),
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(tokens("text")))
        .cast("long")
        .alias("n_tokens"),
        fingerprint_col().alias("fp"),
    )
    return (
        d.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.pmod(
                F.sum(F.col("fp").cast("decimal(38,0)")), F.lit(FINGERPRINT_MOD)
            )
            .cast("long")
            .alias("checksum"),
        )
        .select(
            "shard", "n_docs", "sum_tokens", "min_doc_id", "max_doc_id", "checksum"
        )
    )


def corpus_manifest_sql(n_shards: int = SHUFFLE_SHARDS) -> str:
    """DuckDB twin of :func:`corpus_manifest`: HUGEINT accumulation for
    the checksum sum, the same null-token guard as the Spark side."""
    return (
        "WITH s AS (SELECT doc_id, "
        f"{_shard_of_sql(_shard_hash_sql(), n_shards)} AS shard, "
        f"COALESCE(CAST(len({tokens_sql('text')}) AS BIGINT), 0) AS n_tokens, "
        f"{doc_fingerprint_sql()} AS fp FROM documents) "
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens, "
        "min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id, "
        f"CAST(sum(CAST(fp AS HUGEINT)) % {FINGERPRINT_MOD} AS BIGINT) "
        "AS checksum FROM s GROUP BY shard"
    )


def vocab_growth(documents: DataFrame, bucket_docs: int = 50) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct token types seen
    after each ``bucket_docs``-document prefix of the corpus (in doc_id
    order) — the saturation diagnostic that tells a training-mix
    whether more of a source still adds vocabulary or is re-treading
    (near-dup-heavy corpora flatten early; the curve SHAPE is the
    signal, which is why the classic Heaps exponent fit starts from
    exactly this table). Returns (bucket, start_doc_id, new_types,
    cum_types) ordered by bucket.

    One pass, no per-prefix rescan: a token's contribution to the
    curve is entirely determined by its FIRST-occurrence doc —
    distinct (token, doc_id) incidence → min(doc_id) per token
    (map-side partial) → bucket histogram → cumulative window over the
    BUCKET table (corpus-size/bucket_docs rows — metadata, not data).
    The naive form recounts distinct tokens once per prefix: O(n²/B)
    scans; this is O(n) + a bounded window."""
    from pyspark.sql import Window

    if bucket_docs <= 0:
        raise ValueError("bucket_docs must be positive")
    txt = F.coalesce(F.col("text"), F.lit(""))
    first = (
        documents.select("doc_id", F.explode(tokens(txt)).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    hist = first.groupBy(
        F.expr(f"first_doc div {bucket_docs}").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "bucket",
        (F.col("bucket") * bucket_docs).cast("long").alias("start_doc_id"),
        "new_types",
        F.sum("new_types").over(w).cast("long").alias("cum_types"),
    ).orderBy("bucket")


def vocab_growth_sql(bucket_docs: int = 50) -> str:
    """DuckDB twin of :func:`vocab_growth`."""
    toks = tokens_sql("coalesce(text, '')")
    return (
        f"WITH t AS (SELECT doc_id, unnest({toks}) AS tok FROM documents), "
        "f AS (SELECT tok, min(doc_id) AS first_doc FROM t GROUP BY tok), "
        f"h AS (SELECT first_doc // {bucket_docs} AS bucket, "
        "CAST(count(*) AS BIGINT) AS new_types FROM f GROUP BY 1) "
        f"SELECT bucket, CAST(bucket * {bucket_docs} AS BIGINT) "
        "AS start_doc_id, new_types, "
        "CAST(sum(new_types) OVER (ORDER BY bucket "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS cum_types "
        "FROM h ORDER BY bucket"
    )


def _hamilton_quotas(
    weighted: DataFrame, key_cols: list[str], budget: int, weight_col: str
) -> DataFrame:
    """THE largest-remainder (Hamilton) integer split, shared by
    :func:`corpus_stratified` (weights = raw stratum counts) and
    :func:`corpus_temperature` (weights = temperature-scaled integers):
    quota = floor(w·B / W) plus one for the B − Σfloor keys with the
    largest integer remainders (ties by key). All arithmetic is exact
    64-bit integers over the KEY-sized table (order-invariant sums —
    no float total can move a boundary), so both call sites and their
    SQL twins stay value-identical by construction. Returns
    key_cols + (quota)."""
    from pyspark.sql import Window

    tot = weighted.agg(F.sum(weight_col).alias("_tot"))
    w_rem = Window.orderBy(F.col("rem").desc(), *key_cols)
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            *key_cols,
            F.expr(f"{weight_col} * CAST({budget} AS BIGINT) div _tot")
            .cast("long").alias("q"),
            (F.col(weight_col) * F.lit(budget) % F.col("_tot"))
            .cast("long").alias("rem"),
        )
        .withColumn(
            "leftover",
            F.lit(budget) - F.sum("q").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("rk", F.row_number().over(w_rem))
        .select(
            *key_cols,
            (
                F.col("q")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
    )


def corpus_stratified(documents: DataFrame, budget: int = 100) -> DataFrame:
    """EXACT proportional stratified sample: select exactly ``budget``
    documents with per-(lang, source) allocations by the
    largest-remainder (Hamilton) method — quotas are
    ``floor(n_s·B / N)`` plus one for the ``B − Σfloor`` strata with
    the largest integer remainders (ties by stratum key). Within a
    stratum, the picks are the first ``quota`` documents under
    (content-fingerprint, doc_id) order — a pure function of the data,
    so the sample is stable under repartitioning, re-runs, and
    appends-elsewhere, which `df.sample()`'s per-partition RNG is not.
    `corpus_sample` keeps a ~1/mod RATE per stratum; this keeps an
    exact COUNT with the fairest integer split — the form a fixed
    training-token budget actually needs. Returns (doc_id, lang,
    source, fingerprint) ordered (lang, source, fingerprint, doc_id).

    Scale shape: stratum counts and quotas are map-side aggregates over
    METADATA-sized keys (the remainder ranking windows over the
    stratum table, not documents); the only per-document work is the
    fingerprint projection and ONE (lang, source)-partitioned
    row_number window — same single-shuffle shape as `sessionize`, with
    stratum skew the standard AQE case. No global sort, no driver
    state."""
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError("budget must be positive")
    d = documents.select(
        "doc_id", "lang", "source", fingerprint_col().alias("fingerprint")
    )
    counts = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    quotas = _hamilton_quotas(counts, ["lang", "source"], budget, "n_s")
    w_pick = Window.partitionBy("lang", "source").orderBy(
        "fingerprint", "doc_id"
    )
    return (
        d.join(F.broadcast(quotas), ["lang", "source"])
        .withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") <= F.col("quota"))
        .select("doc_id", "lang", "source", "fingerprint")
        .orderBy("lang", "source", "fingerprint", "doc_id")
    )


def corpus_stratified_sql(budget: int = 100) -> str:
    """DuckDB twin of :func:`corpus_stratified` — same Hamilton
    quotas, same (fingerprint, doc_id) pick order."""
    fp = doc_fingerprint_sql()
    return (
        f"WITH d AS (SELECT doc_id, lang, source, {fp} AS fingerprint "
        "FROM documents), "
        "c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_s "
        "FROM d GROUP BY lang, source), "
        "t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM c), "
        "q0 AS (SELECT lang, source, "
        f"(n_s * {budget}) // n_tot AS q, (n_s * {budget}) % n_tot AS rem, "
        f"{budget} - sum((n_s * {budget}) // n_tot) OVER () AS leftover "
        "FROM c CROSS JOIN t), "
        "q1 AS (SELECT lang, source, q + CASE WHEN "
        "row_number() OVER (ORDER BY rem DESC, lang, source) <= leftover "
        "THEN 1 ELSE 0 END AS quota FROM q0), "
        "p AS (SELECT d.doc_id, d.lang, d.source, d.fingerprint, q1.quota, "
        "row_number() OVER (PARTITION BY d.lang, d.source "
        "ORDER BY d.fingerprint, d.doc_id) AS pick "
        "FROM d JOIN q1 ON d.lang = q1.lang AND d.source = q1.source) "
        "SELECT doc_id, lang, source, fingerprint FROM p "
        "WHERE pick <= quota "
        "ORDER BY lang, source, fingerprint, doc_id"
    )


WSAMPLE_K = 500  # default sample size
_WS_P = 2_147_483_647  # Mersenne 2^31-1: the per-doc uniform's modulus
_WS_SCALE = 1 << 20  # temperature weights -> scaled integers (order-free sums)


def corpus_weighted_sample(documents: DataFrame, k: int = WSAMPLE_K) -> DataFrame:
    """Weight-proportional sample of ``k`` documents WITHOUT replacement
    by priority sampling (Duffield-Lund-Thorup, JACM 2007): each doc
    gets priority ``q_i = w_i / u_i`` with ``u_i`` uniform in (0, 1] and
    ``w_i`` its weight (``n_chars`` — swap in a quality score in a real
    pipeline); the sample is the top-``k`` priorities, and
    ``est_i = max(w_i, tau)`` with ``tau`` the (k+1)-th priority is the
    DLT unbiased weight estimator (sum(est) over the sample estimates
    sum(w) over the corpus — subset-sum estimation from a fixed-size
    sample, the property corpus-budget audits need).

    ``u_i`` is derived from ``doc_id`` by two exact-integer MINSTD-style
    modular steps (mod 2^31-1), so — like :func:`corpus_sample`'s
    content-hash rule — the sample is a pure function of the data:
    stable under repartitioning, re-runs, and engine choice. No float
    enters until the single division w·P/u, whose operands are exact in
    double (w·P < 2^53) and whose IEEE correctly-rounded quotient is
    bit-identical on any engine — which is what lets a DuckDB twin
    value-match a float-keyed top-k. Because the doubles are already
    bit-identical, ``priority``/``est`` are emitted UNROUNDED: a
    ``round(x, 6)`` would re-introduce the one cross-engine freedom we
    eliminated (Spark's exact BigDecimal HALF_UP vs DuckDB's
    double-path ROUND may differ by 1 ulp at the 6th decimal on
    adversarial values).

    Scale: priorities are a narrow projection (no shuffle);
    ``orderBy().limit(k+1)`` plans as TakeOrderedAndProject — each
    partition keeps its local top-(k+1) and only k+1 rows per partition
    ever move, so the cost is one scan + a k-sized merge, never a full
    sort. The final tau/rank window runs on k+1 rows (driver-bounded by
    construction). Returns (doc_id, source, weight, priority, est)
    with the exact unrounded doubles, ordered by priority desc."""
    return dlt_finish(dlt_top_priorities(documents, k), k)


def dlt_priorities(documents: DataFrame) -> DataFrame:
    """(doc_id, source, weight, q): the DLT priority projection —
    shared by the batch sampler and the streaming sampler so the two
    forms can never derive priorities differently (they must: the
    streaming drain's contract is exact equality with the batch op)."""
    p = F.lit(float(_WS_P))
    h1 = (F.col("doc_id") % _WS_P) * 48271 + 11
    u = ((h1 % _WS_P) * 69621 + 7919) % _WS_P + 1  # in [1, 2^31-1]
    pri = (F.col("n_chars").cast("double") * p) / u.cast("double")
    return documents.filter(F.col("n_chars") > 0).select(
        "doc_id", "source", F.col("n_chars").alias("weight"), pri.alias("q")
    )


def dlt_top_priorities(documents: DataFrame, k: int = WSAMPLE_K) -> DataFrame:
    """Top-(k+1) priorities (TakeOrderedAndProject — local top per
    partition, k+1 rows move)."""
    return (
        dlt_priorities(documents)
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(k + 1)
    )


def dlt_finish(top: DataFrame, k: int = WSAMPLE_K) -> DataFrame:
    """The tau/estimator tail over a ≤(k+1)-row top-priorities relation
    (driver-bounded by construction): tau = the (k+1)-th priority when
    present, est = max(weight, tau) — the DLT unbiased estimator."""
    from pyspark.sql import Window

    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    worder = Window.orderBy(F.desc("q"), F.asc("doc_id"))
    tau = F.when(
        F.count(F.lit(1)).over(wall) == k + 1, F.min("q").over(wall)
    ).otherwise(F.lit(0.0))
    return (
        top.select(
            "doc_id",
            "source",
            "weight",
            "q",
            F.row_number().over(worder).alias("rn"),
            tau.alias("tau"),
        )
        .filter(F.col("rn") <= k)
        .select(
            "doc_id",
            "source",
            "weight",
            F.col("q").alias("priority"),
            F.greatest(F.col("weight").cast("double"), F.col("tau")).alias(
                "est"
            ),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
    )


def corpus_weighted_sample_sql(k: int = WSAMPLE_K) -> str:
    """DuckDB twin of :func:`corpus_weighted_sample` — the identical
    exact-integer uniform and the identical correctly-rounded priority
    quotient, so the float top-k boundary agrees bit-for-bit; outputs
    stay unrounded (the operands are exact, so both engines hold the
    same doubles — ROUND would only add a 1-ulp divergence channel)."""
    u = (
        f"((((doc_id % {_WS_P}) * 48271 + 11) % {_WS_P}) * 69621 + 7919) "
        f"% {_WS_P} + 1"
    )
    return (
        "WITH p AS (SELECT doc_id, source, n_chars AS weight, "
        f"(CAST(n_chars AS DOUBLE) * {_WS_P}.0) / CAST({u} AS DOUBLE) AS q "
        "FROM documents WHERE n_chars > 0), "
        f"top AS (SELECT * FROM p ORDER BY q DESC, doc_id LIMIT {k + 1}), "
        "t AS (SELECT doc_id, source, weight, q, "
        "row_number() OVER (ORDER BY q DESC, doc_id) AS rn, "
        f"CASE WHEN count(*) OVER () = {k + 1} THEN min(q) OVER () "
        "ELSE 0.0 END AS tau FROM top) "
        "SELECT doc_id, source, weight, q AS priority, "
        "GREATEST(CAST(weight AS DOUBLE), tau) AS est "
        f"FROM t WHERE rn <= {k} ORDER BY priority DESC, doc_id"
    )


STRAT_WSAMPLE_K = 10  # default per-source sample size


def corpus_stratified_weighted(
    documents: DataFrame, k: int = STRAT_WSAMPLE_K
) -> DataFrame:
    """Per-source weight-proportional sampling WITHOUT replacement: an
    independent DLT priority sample of ``k`` documents from EACH source
    — the per-stratum form of :func:`corpus_weighted_sample`, the shape
    a multi-source pretraining budget actually needs (every source gets
    its own quota and its own unbiased weight estimator, so per-source
    token budgets can be audited from the sample alone; pairs with
    :func:`corpus_temperature` which decides the quotas).

    Identical priority algebra to the global sampler (the shared
    :func:`dlt_priorities` projection — exact-integer uniform, one
    correctly-rounded double division), but the top-(k+1) and the tau
    threshold are computed PER SOURCE: ``tau_s`` = the (k+1)-th priority
    of source ``s`` when the source holds that many docs, else 0, and
    ``est = max(weight, tau_s)`` estimates per-source weight totals.

    Scale shape: the per-source top-(k+1) goes through
    :func:`skew_safe_topk` (local rank within a doc_id-hash shard, then
    a re-rank whose per-source input is bounded by the constant
    (k+1) x n_shards) — a bare ``row_number() OVER (PARTITION BY
    source)`` would funnel a dominant source's entire relation through
    one task, the classic skew killer on real web corpora where one
    crawl dwarfs every other source. The tau window then runs on
    ≤ n_sources x (k+1) survivor rows — bounded by parameters, not
    data. Returns (doc_id, source, weight, priority, est); unrounded
    doubles for the same 1-ulp-freedom reason as the global sampler."""
    from pyspark.sql import Window

    top = skew_safe_topk(
        dlt_priorities(documents),
        ["source"],
        [F.desc("q"), F.asc("doc_id")],
        k + 1,
        F.pmod(F.xxhash64("doc_id"), F.lit(8)),
        rank_name="_rn",
    )
    wsrc = Window.partitionBy("source")
    tau = F.when(
        F.max("_rn").over(wsrc) == k + 1, F.min("q").over(wsrc)
    ).otherwise(F.lit(0.0))
    return (
        top.withColumn("_tau", tau)
        .filter(F.col("_rn") <= k)
        .select(
            "doc_id",
            "source",
            "weight",
            F.col("q").alias("priority"),
            F.greatest(F.col("weight").cast("double"), F.col("_tau")).alias(
                "est"
            ),
        )
        .orderBy("source", F.desc("priority"), F.asc("doc_id"))
    )


def corpus_stratified_weighted_sql(k: int = STRAT_WSAMPLE_K) -> str:
    """DuckDB twin of :func:`corpus_stratified_weighted`: the global
    sampler's exact-integer uniform with the top-(k+1)/tau/estimator
    chain re-scoped to PARTITION BY source windows."""
    u = (
        f"((((doc_id % {_WS_P}) * 48271 + 11) % {_WS_P}) * 69621 + 7919) "
        f"% {_WS_P} + 1"
    )
    return (
        "WITH p AS (SELECT doc_id, source, n_chars AS weight, "
        f"(CAST(n_chars AS DOUBLE) * {_WS_P}.0) / CAST({u} AS DOUBLE) AS q "
        "FROM documents WHERE n_chars > 0), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY source "
        "ORDER BY q DESC, doc_id) AS rn FROM p), "
        f"top AS (SELECT * FROM r WHERE rn <= {k + 1}), "
        "t AS (SELECT doc_id, source, weight, q, rn, "
        f"CASE WHEN max(rn) OVER (PARTITION BY source) = {k + 1} "
        "THEN min(q) OVER (PARTITION BY source) ELSE 0.0 END AS tau "
        "FROM top) "
        "SELECT doc_id, source, weight, q AS priority, "
        "GREATEST(CAST(weight AS DOUBLE), tau) AS est "
        f"FROM t WHERE rn <= {k} ORDER BY source, priority DESC, doc_id"
    )


def corpus_stratified_quota(
    documents: DataFrame,
    quotas: DataFrame | None = None,
    budget: int = 1000,
    temperature: float = 2.0,
) -> DataFrame:
    """Quota-driven per-source weight-proportional sampling: the
    composition a pretraining mix actually runs — a temperature
    schedule decides per-source budgets, the DLT sampler draws them —
    in ONE operator (r12 verdict #3: :func:`corpus_stratified_weighted`
    took a constant k for every source; here k_s comes from a quotas
    relation, rank-vs-k_s instead of rank-vs-literal, tau/estimator
    algebra unchanged per stratum: tau_s = the (k_s+1)-th priority of
    source s when present else 0, est = max(weight, tau_s)).

    ``quotas`` is any (source, quota) relation; None computes it with
    :func:`corpus_temperature` (budget, temperature) so spec and draw
    share one quota table and cannot disagree. A source whose quota
    meets or exceeds its size keeps every doc with tau 0 (the sample IS
    the source — exactly the flattened-tail case temperature scaling
    exists for); quota-0 sources contribute nothing; NULL sources are
    excluded as in :func:`corpus_temperature`.

    Scale shape: the quota table is source-sized and broadcast; the
    per-source top goes through :func:`skew_safe_topk` at the MAX quota
    (one bounded metadata collect) so a dominant source never funnels
    through one window task, then the per-source rank is compared to
    the joined k_s. The tau window runs on ≤ Σ(k_s+1) survivor rows —
    bounded by the mixture spec, not the data."""
    from pyspark.sql import Window

    if quotas is None:
        quotas = corpus_temperature(documents, budget, temperature)
    quotas = quotas.select("source", F.col("quota").cast("long").alias("quota"))
    # bounded metadata collect: ONE row — the phase-1 rank cap
    kmax = quotas.agg(F.max("quota")).first()[0]
    if kmax is None or kmax <= 0:
        return documents.sparkSession.createDataFrame(
            [],
            "doc_id long, source string, weight long, priority double, est double",
        )
    top = skew_safe_topk(
        dlt_priorities(documents).join(F.broadcast(quotas), "source"),
        ["source"],
        [F.desc("q"), F.asc("doc_id")],
        int(kmax) + 1,
        F.pmod(F.xxhash64("doc_id"), F.lit(8)),
        rank_name="_rn",
    ).filter(F.col("_rn") <= F.col("quota") + 1)
    wsrc = Window.partitionBy("source")
    tau = F.when(
        F.max("_rn").over(wsrc) == F.col("quota") + 1, F.min("q").over(wsrc)
    ).otherwise(F.lit(0.0))
    return (
        top.withColumn("_tau", tau)
        .filter(F.col("_rn") <= F.col("quota"))
        .select(
            "doc_id",
            "source",
            "weight",
            F.col("q").alias("priority"),
            F.greatest(F.col("weight").cast("double"), F.col("_tau")).alias(
                "est"
            ),
        )
        .orderBy("source", F.desc("priority"), F.asc("doc_id"))
    )


def corpus_stratified_quota_sql(
    budget: int = 1000, temperature: float = 2.0
) -> str:
    """DuckDB twin of :func:`corpus_stratified_quota` with computed
    quotas: the temperature-quota CTE chain feeding the stratified
    DLT chain in one statement — quotas + sampling computed together,
    rank and tau compared to the joined per-source quota."""
    u = (
        f"((((doc_id % {_WS_P}) * 48271 + 11) % {_WS_P}) * 69621 + 7919) "
        f"% {_WS_P} + 1"
    )
    inner = corpus_temperature_sql(budget, temperature)
    return (
        f"WITH tq AS ({inner}), "
        "p AS (SELECT doc_id, source, n_chars AS weight, "
        f"(CAST(n_chars AS DOUBLE) * {_WS_P}.0) / CAST({u} AS DOUBLE) AS q "
        "FROM documents WHERE n_chars > 0), "
        "j AS (SELECT p.doc_id, p.source, p.weight, p.q, tq.quota "
        "FROM p JOIN tq ON p.source = tq.source), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY source "
        "ORDER BY q DESC, doc_id) AS rn FROM j), "
        "top AS (SELECT * FROM r WHERE rn <= quota + 1), "
        "t AS (SELECT doc_id, source, weight, q, rn, quota, "
        "CASE WHEN max(rn) OVER (PARTITION BY source) = quota + 1 "
        "THEN min(q) OVER (PARTITION BY source) ELSE 0.0 END AS tau "
        "FROM top) "
        "SELECT doc_id, source, weight, q AS priority, "
        "GREATEST(CAST(weight AS DOUBLE), tau) AS est "
        "FROM t WHERE rn <= quota ORDER BY source, priority DESC, doc_id"
    )


def corpus_temperature(
    documents: DataFrame, budget: int = 1000, temperature: float = 2.0
) -> DataFrame:
    """Temperature-scaled source mixture: allocate a ``budget`` of
    documents across sources with sampling weight ``w_s = n_s^(1/T)`` —
    the standard multilingual/multi-source LLM recipe (T=1 is
    proportional, T→∞ uniform; T≈2-5 upsamples the tail so small
    sources aren't drowned, exactly the mixture-flattening rule of the
    multilingual-pretraining literature). Quotas are exact Hamilton
    (largest-remainder) integer splits of the weighted shares, so they
    sum to ``budget`` by construction — the mixture SPEC a sampler
    (e.g. :func:`corpus_stratified`'s pick stage) then executes.

    Cross-engine exactness: the float weight is converted ONCE to a
    scaled integer (``round(w · 2^20)``) and every share, floor, and
    remainder rank is computed in exact 64-bit integer arithmetic from
    there — integer sums are order-invariant, so the result cannot
    depend on Spark's partial-aggregate merge order the way a raw
    ``sum(double)`` could (an ULP of drift in w_tot would flip a
    Hamilton boundary). At the default T=2 the weight is ``sqrt(n_s)``
    — IEEE-correctly-rounded in every engine — so the scaled integers,
    and hence the quotas, are bit-identical cross-engine; for other T,
    ``pow`` is faithful-but-not-correctly-rounded, so a scaled weight
    could differ by one unit in adversarial cases (documented caveat —
    the default keeps the oracle contract exact). The 2^20 scale keeps
    ``w_int · budget`` far below 2^63 for any real corpus
    (w_int ≤ 2^20·sqrt(n); n = 10^12, budget = 10^9 → ~2^70 would
    overflow, so cap budget·sqrt(n) < 2^43·2^20 — every practical
    mixture spec is orders of magnitude inside this).

    Scale: ONE map-side-partial count per source, then all arithmetic
    and both windows run over the SOURCE-sized table (dozens of rows at
    any corpus scale) — metadata-sized like corpus_stratified's quota
    stage, no per-document work at all. Returns (source, n_docs,
    weight, quota, rate) ordered by source."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    # NULL sources are EXCLUDED up front (documented contract): Spark and
    # DuckDB both keep a NULL group in GROUP BY but both DROP it in the
    # sample's equi-join — allocating a quota that the join can never
    # fill would silently break the row-count == budget invariant
    counts = (
        documents.filter(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    if temperature == 2.0:
        w = F.sqrt(F.col("n_docs").cast("double"))
    else:
        w = F.pow(F.col("n_docs").cast("double"), F.lit(1.0 / temperature))
    weighted = counts.select(
        "source",
        "n_docs",
        w.alias("w"),
        F.round(w * F.lit(float(_WS_SCALE)), 0).cast("long").alias("w_int"),
    )
    quotas = _hamilton_quotas(weighted, ["source"], budget, "w_int")
    return (
        weighted.select("source", "n_docs", F.round("w", 9).alias("weight"))
        .join(quotas, "source")
        .withColumn(
            "rate",
            F.round(F.col("quota") / F.col("n_docs").cast("double"), 9),
        )
        .orderBy("source")
    )


def corpus_temperature_sql(budget: int = 1000, temperature: float = 2.0) -> str:
    """DuckDB twin of :func:`corpus_temperature` — the identical
    scaled-integer Hamilton arithmetic (weights to ``round(w·2^20)``
    once, then exact 64-bit shares/floors/remainder ranks; order-free
    integer sums, so neither engine's aggregation order can move a
    quota boundary)."""
    if temperature == 2.0:
        w = "sqrt(CAST(n_docs AS DOUBLE))"
    else:
        w = f"pow(CAST(n_docs AS DOUBLE), {1.0 / temperature!r})"
    return (
        "WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM documents WHERE source IS NOT NULL GROUP BY source), "
        f"wt AS (SELECT source, n_docs, {w} AS w, "
        f"CAST(round({w} * {_WS_SCALE}, 0) AS BIGINT) AS w_int FROM c), "
        "t AS (SELECT sum(w_int) AS tot_int FROM wt), "
        f"q AS (SELECT source, n_docs, w, "
        f"(w_int * CAST({budget} AS BIGINT)) // t.tot_int AS q, "
        f"(w_int * CAST({budget} AS BIGINT)) % t.tot_int AS rem "
        "FROM wt CROSS JOIN t), "
        "r AS (SELECT source, n_docs, w, q, rem, "
        f"{budget} - sum(q) OVER () AS leftover, "
        "row_number() OVER (ORDER BY rem DESC, source) AS rk FROM q) "
        "SELECT source, n_docs, ROUND(w, 9) AS weight, "
        "CAST(q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) "
        "AS quota, "
        "ROUND(CAST(q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS DOUBLE) "
        "/ CAST(n_docs AS DOUBLE), 9) AS rate "
        "FROM r ORDER BY source"
    )


def corpus_temperature_sample(
    documents: DataFrame, budget: int = 1000, temperature: float = 2.0
) -> DataFrame:
    """EXECUTE the :func:`corpus_temperature` mixture spec: emit exactly
    ``budget`` training slots with per-source counts equal to the
    temperature quotas. Within a source, docs are ranked by
    (content-fingerprint, doc_id) — the same pure-function-of-the-data
    rule as :func:`corpus_stratified` — and a quota LARGER than the
    source (rate > 1, the whole point of temperature flattening) cycles
    through the ranking again with ``epoch`` incremented: small sources
    REPEAT across epochs, which is precisely how multilingual recipes
    realize their upsampled mixtures (a quota ≤ n is epoch-0 only and
    degenerates to the stratified pick). Spec and execution share one
    quota computation, so they can never disagree.

    Scale shape: the quota table is source-sized and broadcast; the
    only per-document work is the fingerprint projection, ONE
    source-partitioned rank window, and a per-row
    ``explode(sequence())`` bounded by ceil(rate) — no shuffle beyond
    the window's. Returns (doc_id, source, fingerprint, epoch) ordered
    (source, epoch, fingerprint, doc_id); row count == budget."""
    from pyspark.sql import Window

    quotas = corpus_temperature(documents, budget, temperature).select(
        "source", "quota", "n_docs"
    )
    d = documents.select(
        "doc_id", "source", fingerprint_col().alias("fingerprint")
    )
    w_pick = Window.partitionBy("source").orderBy("fingerprint", "doc_id")
    ranked = d.join(F.broadcast(quotas), "source").withColumn(
        "rk", F.row_number().over(w_pick)
    )
    # rank r fills slots r, r+n, r+2n, … ≤ quota → repeats = (quota-r) div n + 1
    # (exact integer div, same as the twin's // — a double quotient could
    # round across an integer boundary above 2^53)
    reps = F.expr("(quota - rk) div n_docs")
    return (
        ranked.filter(F.col("rk") <= F.col("quota"))
        .select(
            "doc_id",
            "source",
            "fingerprint",
            F.explode(F.sequence(F.lit(0), reps.cast("int"))).alias("epoch"),
        )
        .orderBy("source", "epoch", "fingerprint", "doc_id")
    )


def corpus_temperature_sample_sql(
    budget: int = 1000, temperature: float = 2.0
) -> str:
    """DuckDB twin of :func:`corpus_temperature_sample` — the
    temperature-quota CTE chain, the identical fingerprint-ordered rank
    window, and the identical cyclic-epoch expansion."""
    inner = corpus_temperature_sql(budget, temperature)
    return (
        f"WITH q AS ({inner}), "
        f"d AS (SELECT doc_id, source, {doc_fingerprint_sql()} AS fingerprint "
        "FROM documents), "
        "p AS (SELECT d.doc_id, d.source, d.fingerprint, q.quota, q.n_docs, "
        "row_number() OVER (PARTITION BY d.source "
        "ORDER BY d.fingerprint, d.doc_id) AS rk "
        "FROM d JOIN q ON d.source = q.source) "
        "SELECT doc_id, source, fingerprint, CAST(u.e AS INTEGER) AS epoch "
        "FROM p, unnest(range((quota - rk) // n_docs + 1)) AS u(e) "
        "WHERE rk <= quota "
        "ORDER BY source, epoch, fingerprint, doc_id"
    )
