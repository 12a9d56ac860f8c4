"""Deduplication operators for training-data pipelines: exact, MinHash-LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

No reference counterpart (SURVEY.md §2.5); these are the beyond-parity
north-star operators. Design center is 100 TB:

- exact dedup groups on a 64-bit content hash, never shuffling full text;
- MinHash/SimHash reduce each document to a tiny signature once (one
  codegen'd pass over tokens), then candidate generation is an equi-join
  on (band, band-hash) / (band, band-bits) keys — the only shuffles move
  signatures, not documents;
- pairwise verifiers (n-gram Jaccard, cosine) run only inside blocks or
  candidate pairs, with exact size-ratio pruning to kill the quadratic
  blowup without changing results.

Everything below is native Column expressions (xxhash64, array ops,
aggregate/transform lambdas) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators.text import tokens

__all__ = [
    "dedup_exact",
    "dedup_exact_hashed",
    "shingles",
    "minhash_signature",
    "dedup_minhash",
    "simhash",
    "simhash_table",
    "dedup_simhash",
    "ngram_jaccard",
    "decontaminate_fuzzy",
    "decontaminate_fuzzy_sql",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_sql",
    "dedup_semantic",
    "dedup_semantic_sql",
    "dedup_incremental",
    "dedup_incremental_sql",
    "stream_dedup_near_sql",
    "dedup_keep_best",
    "dedup_edit",
    "dedup_edit_sql",
    "doc_containment",
    "doc_containment_sql",
]

# deterministic odd multipliers/offsets for the minhash permutation family
# h_i(x) = (a_i * x + b_i) mod 2^31-1 (Mersenne prime). The modulus is kept
# at 31 bits so a_i * x never overflows a signed 64-bit long JVM-side.
_MERSENNE31 = (1 << 31) - 1


def _collapse_exact(
    documents: DataFrame,
    fp: Column,
    id_col: str = "doc_id",
    precheck: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate collapse prepass for the LSH pair families:
    group rows on a content fingerprint ``fp``, elect ``min(id)`` per
    DUPLICATED group as representative, and return ``(members,
    rep_rows)`` where ``members`` is the (id, rep) map restricted to
    rows of duplicated groups — O(duplicate rows), usually tiny and
    broadcastable — and ``rep_rows`` is the input minus the non-rep
    duplicate members.

    Why this exists: a family of g IDENTICAL texts collides in every
    LSH band and costs O(g²·bands) candidate rows in the band self-join
    before verification ever runs. Collapsed, the family contributes
    ONE representative to the banding pipeline; its pairs are
    reconstructed exactly afterwards (:func:`_expand_pairs`) — identical
    inputs have similarity exactly 1.0 and cross-group similarity
    depends only on content, so the expansion is output-identical to
    the uncollapsed pipeline for every input whose similarity is
    defined. The one degenerate exception: identical ZERO-NORM vectors
    (cosine undefined) are reported as exact duplicates at score 1.0 by
    the collapse's byte-identity convention, where the uncollapsed
    cosine pipeline's NaN comparison emitted nothing — deliberate
    (byte-identical content IS a duplicate) and mirrored by the SQL
    twins' group expansion, so it is cross-engine consistent. The output stays
    quadratic in group size (inherent to the pairs contract); what the
    prepass removes is the quadratic blowup inside the shuffle-heavy
    candidate stage.

    Shape (r11): ONE map-side-combined groupBy on the fingerprint
    elects reps and filters to groups with count > 1; only those
    groups' rows are joined back and checkpointed, so the
    materialization and every re-expansion join is bounded by the
    DUPLICATE volume, not the corpus (the r10 form windowed and
    checkpointed the full corpus-sized map). NULL fingerprints group
    together exactly as the window did. On a duplicate-free corpus the
    dup set is empty and ``members`` comes back as ``None`` —
    :func:`_expand_pairs` passes the rep pairs through unchanged and
    ``rep_rows`` is the input itself (``precheck=False`` keeps the
    empty-members machinery for isolation runs and tests; the output
    is identical either way). The prepass is a separate eager action
    (the members checkpoint) from the pipeline that consumes it, so it
    assumes a DETERMINISTIC input plan: an input that grows duplicates
    between actions would band the fresh dups uncollapsed — they are
    still found (identical content is trivially a near-dup in every
    band, emitted by the normal verify) but without the quadratic
    fan-out protection; pin nondeterministic inputs with
    localCheckpoint before calling, as the fixtures do."""
    g = documents.select(F.col(id_col).alias("mid"), fp.alias("_fp"))
    dup_groups = (
        g.groupBy("_fp")
        .agg(F.min("mid").alias("rep"), F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .drop("_c")
    )
    members = (
        # null-safe equality: a NULL-fp dup group must join its member
        # rows back (an equi-join drops NULL keys; groupBy kept them)
        g.join(dup_groups, g["_fp"].eqNullSafe(dup_groups["_fp"]))
        .select("mid", "rep")
        .localCheckpoint()
    )  # three consumers: rep anti-filter, cross- and intra-expand
    if precheck and members.isEmpty():
        return None, documents
    rep_rows = documents.join(
        members.filter(F.col("mid") != F.col("rep")).select(
            F.col("mid").alias(id_col)
        ),
        id_col,
        "left_anti",
    )
    return members, rep_rows


def _expand_pairs(
    rep_pairs: DataFrame,
    members: DataFrame | None,
    a_col: str,
    b_col: str,
    score_col: str,
    exact_score: Column,
) -> DataFrame:
    """Re-expand representative pairs to member pairs after an
    exact-dup collapse (:func:`_collapse_exact`): every (rep_a, rep_b,
    score) becomes all member cross pairs at the SAME score (similarity
    is a function of content only), and every multi-member group emits
    its intra pairs at ``exact_score`` (identical content).

    ``members`` covers ONLY duplicated groups (r11 shape), so the cross
    expansion is a LEFT join per side with identity fallback: a rep
    with no members row is a singleton and stands for itself. The
    joins touch a duplicate-volume-bounded table — AQE broadcasts it
    from measured size. ``members=None`` (the duplicate-free fast
    path) is a pure identity expansion: the rep pairs ARE the member
    pairs and there are no intra pairs."""
    if members is None:
        return rep_pairs.select(a_col, b_col, score_col)
    ma = members.select(F.col("rep").alias(a_col), F.col("mid").alias("_ma"))
    mb = members.select(F.col("rep").alias(b_col), F.col("mid").alias("_mb"))
    cross = (
        rep_pairs.join(ma, a_col, "left")
        .join(mb, b_col, "left")
        .select(
            F.least(
                F.coalesce("_ma", a_col), F.coalesce("_mb", b_col)
            ).alias(a_col),
            F.greatest(
                F.coalesce("_ma", a_col), F.coalesce("_mb", b_col)
            ).alias(b_col),
            score_col,
        )
    )
    x = members.select(F.col("mid").alias("_xa"), "rep")
    y = members.select(F.col("mid").alias("_xb"), "rep")
    intra = (
        x.join(y, "rep")
        .filter(F.col("_xa") < F.col("_xb"))
        .select(
            F.col("_xa").alias(a_col),
            F.col("_xb").alias(b_col),
            exact_score.alias(score_col),
        )
    )
    return cross.unionByName(intra)


def _cap_band_buckets(
    banded: DataFrame, keys: list[str], max_bucket_width: int | None
) -> DataFrame:
    """Drop LSH band buckets wider than ``max_bucket_width`` rows before
    the candidate stage. A bucket of width g yields O(g²) candidate
    pairs in the band self-join; after the exact-dup collapse prepass a
    wide bucket means a giant NEAR-dup (not identical) family, whose
    pair set is quadratic by contract — past the cap the pairs form is
    the wrong tool (use the clustering ops, ``dedup_clusters`` /
    ``dedup_embedding_lsh`` + survivors) and the bucket is skipped.
    This is the documented recall tradeoff, mirrored bucket-for-bucket
    in the SQL twins (same count, same cap), so capped and uncapped
    runs alike stay under the value oracle. The width count shuffles on
    the same (band, key) hash partitioning the candidate join needs, so
    the cap adds no extra exchange. ``None`` disables the cap."""
    if max_bucket_width is None:
        return banded
    from pyspark.sql import Window

    w = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    return (
        banded.withColumn("_bw", w)
        .filter(F.col("_bw") <= max_bucket_width)
        .drop("_bw")
    )


def dedup_exact(documents: DataFrame, key: str = "text") -> DataFrame:
    """Exact dedup: one survivor (min doc_id) per distinct ``key``, with
    the duplicate count. Oracle-checkable; groups by the raw key."""
    return (
        documents.groupBy(key)
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def dedup_exact_hashed(documents: DataFrame, key: str = "text") -> DataFrame:
    """Scale path for exact dedup: group on xxhash64(key) so the shuffle
    moves 8-byte keys instead of documents. Collision probability at
    10^12 docs ~ 2.7e-5 (birthday, 64-bit); a residual equality check per
    hash group removes even that if required."""
    return (
        documents.groupBy(F.xxhash64(key).alias("key_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def bind_once(val: Column, body) -> Column:
    """A let-binding for Column expressions: evaluate ``val`` ONCE per row
    and hand the result to ``body`` as a bound lambda variable —
    ``element_at(transform(array(val), body), 1)``. Catalyst evaluates an
    expression subtree once per REFERENCE, and higher-order lambdas
    re-evaluate their captured subtrees once per element, so an O(T)
    subtree (tokenize) referenced inside an O(T)-element gram lambda costs
    O(T^2) per row. A lambda variable is bound to its computed value, and
    the optimizer cannot inline through it, so the subtree is computed
    once per row instead (measured 3.5x on string shingles, 50x on the
    token-hash form at 120-token docs). Values are bit-identical — this
    changes evaluation strategy, never semantics."""
    return F.element_at(F.transform(F.array(val), body), 1)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document; documents shorter than
    n tokens contribute their whole token string as one shingle. The
    token array is let-bound (:func:`bind_once`) so tokenize runs once
    per document, not once per gram offset."""

    def build(tk: Column) -> Column:
        return F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - n),
                lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", tk)))

    return F.array_distinct(bind_once(tokens(text), build))


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct 64-bit shingle hashes of a document WITHOUT building the
    gram strings: hash each token once (``xxhash64``), then hash each
    n-slice of the token-hash array — ``xxhash64(array<long>)`` chains
    the element hashes, so equal token sequences (⟺ equal gram strings;
    tokens contain no whitespace) get equal hashes and unequal ones
    collide with the same ~2^-64 odds the gram-string hash already
    carries. Compared to ``xxhash64(shingles(...))`` this skips the
    per-offset n-token ``concat_ws`` string allocation + variable-length
    re-hash of every character n times across overlapping grams, and the
    distinct runs on longs, not strings.

    ONLY for consumers whose OUTPUT is hash-agnostic (set sizes /
    join-match counts with an exact verify): ngram_jaccard and the
    hashed/Bloom decontaminate forms. MinHash/SimHash outputs embed the
    hash VALUES (signatures, band keys, fingerprints) and must keep
    their exact hash definitions.

    Short-doc rule mirrors :func:`shingles`: a document with fewer than
    ``n`` tokens contributes its whole token sequence as one shingle
    (the hash of the full token-hash array; ``[]`` included).

    The token-hash array is let-bound (:func:`bind_once`) so both the
    tokenize and the per-token hashing run once per document; each gram
    is then one ``slice`` of the bound array (an n-long copy) hashed as
    a single array argument. Referencing the unbound subtree inside the
    gram lambda instead re-evaluates tokenize+hash once per reference —
    O(n·T^2) per document, measured 50x slower at 120-token docs."""
    mk = F.xxhash64

    def build(th: Column) -> Column:
        return F.when(
            F.size(th) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(th) - n),
                lambda i: mk(F.slice(th, i + 1, n)),
            ),
        ).otherwise(F.array(mk(th)))

    return F.array_distinct(
        bind_once(F.transform(tokens(text), lambda t: F.xxhash64(t)), build)
    )


def minhash_signature(text: Column | str, num_hashes: int = 32, n: int = 3) -> Column:
    """MinHash signature: for each of ``num_hashes`` permutations, the
    minimum of ``(a_i * xxhash64(shingle) + b_i) mod M`` over the
    document's shingle set. One pass, all JVM-side."""
    sh = shingles(text, n)
    # let-bind the base-hash array (bind_once): the shingle+hash subtree
    # would otherwise be re-evaluated once PER PERMUTATION — num_hashes
    # full passes over the document instead of one
    return bind_once(
        F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31))),
        lambda base: F.array(
            *[
                F.array_min(
                    F.transform(
                        base,
                        lambda h, i=i: (
                            h * F.lit(2 * i + 1) + F.lit(7919 * (i + 1))
                        )
                        % F.lit(_MERSENNE31),
                    )
                )
                for i in range(num_hashes)
            ]
        ),
    )


def _xxhash_banded(
    documents: DataFrame, num_hashes: int, bands: int, n: int
) -> tuple[DataFrame, DataFrame]:
    """Production (xxhash64-based) MinHash front end: (hashed-shingle
    table, banded-signature table) — the JVM-hash twin of
    :func:`_portable_banded`, shared by :func:`dedup_minhash` and the
    skew-scale probe (scripts/scale_skew.py) so candidate-stage fan-out
    is measurable on the exact tables the operator joins."""
    rows_per_band = num_hashes // bands
    # spread the docs before the (expensive) shingle projection — a
    # single-file source would otherwise compute every shingle set on 1-2
    # cores. Then pin the shingle table with localCheckpoint: it feeds the
    # signature aggregation AND both sides of the verify join, and without
    # materialization every consumer re-runs the whole shingle pass
    docs = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    sh_df = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles("text", n), lambda s: F.xxhash64(s))
        ).alias("sh"),
    ).localCheckpoint()
    h = F.pmod(F.col("s"), F.lit(_MERSENNE31))
    sig_df = (
        sh_df.select("doc_id", F.explode("sh").alias("s"))
        .select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    (F.col("h") * F.lit(2 * i + 1) + F.lit(7919 * (i + 1)))
                    % F.lit(_MERSENNE31)
                ).alias(f"m{i}")
                for i in range(num_hashes)
            ]
        )
    )
    # band keys only — the LSH join shuffles (doc_id, band, bhash) rows,
    # never shingle sets or text
    banded = sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                f"m{j}"
                                for j in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bhash")
    return sh_df, banded


def dedup_minhash(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_width: int | None = 256,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection.

    exact-dup collapse → signature → split into ``bands`` bands of
    ``num_hashes/bands`` rows → equi-join on (band index, band hash) →
    verify candidate pairs with exact shingle Jaccard ≥ threshold →
    re-expand collapsed groups. Returns (doc_a, doc_b, jaccard) with
    doc_a < doc_b.

    The band join is the scale move: ~O(n) signature rows shuffle on
    short keys; only colliding pairs (expected: near-dups + few false
    positives) reach the exact verifier. Two guards keep the candidate
    stage linear at 100 TB: identical texts are collapsed to one
    representative BEFORE banding (:func:`_collapse_exact` — boilerplate
    families of g identical documents would otherwise emit O(g²·bands)
    candidates; their pairs are reconstructed exactly afterwards), and
    any residual band bucket wider than ``max_bucket_width`` — a giant
    NEAR-dup family — is skipped (:func:`_cap_band_buckets`, the
    documented recall tradeoff; the clustering ops are the right
    contract for such families, not all-pairs).

    The signature is computed as explode(shingles) → one hash column →
    ``num_hashes`` min-aggregates per doc_id, NOT as per-row
    ``transform``/``array_min`` array expressions: higher-order array
    functions are CodegenFallback (interpreted), so 32 of them per row
    was the dominant cost; min() over a codegen'd hash expression with
    map-side partial aggregation does the same math JVM-compiled, and
    the shuffle carries one 32-int row per (doc, partition).

    The checkpointed shingle table stores xxhash64(shingle) longs, not
    the shingle strings (~4× smaller through the checkpoint and both
    verify-join sides); Jaccard over the hashed sets equals Jaccard
    over the strings unless two distinct shingles collide at 64 bits
    (~2⁻⁶⁴ per pair — the same accepted risk as ``ngram_jaccard``'s
    hashed intersection and ``dedup_exact_hashed``).
    """
    # NULL ≡ '' here: a NULL text and an empty text are the same (empty)
    # content, so they collapse into ONE group — without the coalesce,
    # Spark's shingle path bands the NULL rep as [''] while a SQL twin's
    # NULL tokenization drops it, and the engines diverge on NULL-''
    # cross pairs (the only NULL-sensitive spot in the pipeline)
    members, rep_docs = _collapse_exact(
        documents, F.xxhash64(F.coalesce(F.col("text"), F.lit("")))
    )
    sh_df, banded = _xxhash_banded(rep_docs, num_hashes, bands, n)
    banded = _cap_band_buckets(banded, ["band", "bhash"], max_bucket_width)

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            ["band", "bhash"],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact verify: fetch shingles for the (few) candidates only
    pairs = (
        cand.join(sh_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    rep_pairs = pairs.filter(jac >= jaccard_threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    return _expand_pairs(
        rep_pairs, members, "doc_a", "doc_b", "jaccard", F.lit(1.0)
    )


def _portable_char_hash_sql() -> str:
    """The ONE DuckDB rendering of the portable per-character polynomial
    shingle hash (over a shingle string bound as ``g``). text.py's
    shingles_sql docstring records what happens when this fragment is
    copy-pasted instead: the r10 degenerate-content fix had to chase
    five copies — every portable-SQL builder must call this."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD})"
    )


def _portable_mins_sql(num_hashes: int) -> str:
    """The ONE DuckDB rendering of the min-hash permutation family
    (over a per-doc hash list bound as ``hs``): ``m0..m{k-1}`` select
    items."""
    return ", ".join(
        f"list_min(list_transform(hs, h -> (h * {2 * i + 1} + {7919 * (i + 1)}) "
        f"% {_MERSENNE31})) AS m{i}"
        for i in range(num_hashes)
    )


def _portable_band_rows_sql(num_hashes: int, bands: int) -> str:
    """The ONE DuckDB rendering of the band-key fold (reading a ``sig``
    CTE with ``m0..m{k-1}`` columns): UNION ALL of one SELECT per band."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    rows_per_band = num_hashes // bands
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, list_reduce(list_prepend(CAST(0 AS BIGINT), ["
        + ", ".join(f"m{j}" for j in range(b * rows_per_band, (b + 1) * rows_per_band))
        + f"]), (acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD}) AS bhash FROM sig"
        for b in range(bands)
    )


def _portable_banded(
    documents: DataFrame, num_hashes: int, bands: int, n: int
) -> tuple[DataFrame, DataFrame]:
    """Shared cross-engine MinHash front end: (shingle-set table,
    banded-signature table). Base hash is the polynomial rolling hash
    ``(acc*31 + codepoint) mod 1e9+7`` (exact integer arithmetic any
    engine reproduces bit-for-bit); band keys fold the band's min-hashes
    with the same polynomial. One materialized shingle pass
    (localCheckpoint) feeds both the signatures and the later exact
    verify joins."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    rows_per_band = num_hashes // bands
    fold = lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD  # noqa: E731
    docs = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    sh_df = docs.select("doc_id", shingles("text", n).alias("sh")).localCheckpoint()
    codes = F.transform(F.split("s", ""), lambda c: F.ascii(c).cast("long"))
    h = F.aggregate(codes, F.lit(0).cast("long"), fold)
    sig_df = (
        sh_df.select("doc_id", F.explode("sh").alias("s"))
        .select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    (F.col("h") * F.lit(2 * i + 1) + F.lit(7919 * (i + 1)))
                    % F.lit(_MERSENNE31)
                ).alias(f"m{i}")
                for i in range(num_hashes)
            ]
        )
    )
    banded = sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.aggregate(
                            F.array(
                                *[
                                    F.col(f"m{j}")
                                    for j in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ]
                            ),
                            F.lit(0).cast("long"),
                            fold,
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bhash")
    return sh_df, banded


def dedup_minhash_portable(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_width: int | None = 256,
) -> DataFrame:
    """MinHash+LSH with a cross-engine-computable hash — the fully
    oracle-checked twin of :func:`dedup_minhash`.

    Same pipeline (exact-dup collapse → shingle → k min-hashes → band
    keys → bucket-width cap → equi-join → exact Jaccard verify →
    group re-expansion), but the base hash is the polynomial rolling
    hash ``(acc*31 + codepoint) mod 1e9+7`` over the shingle's
    characters (exact integer arithmetic any engine reproduces
    bit-for-bit) instead of Spark's xxhash64, and the band key folds the
    band's min-hashes with the same polynomial instead of hashing them.
    This makes every intermediate — signatures, band keys, candidate
    set, final pairs — identical on Spark and DuckDB, so the WHOLE
    probabilistic pipeline is under the oracle, not just the exact
    verifier. The xxhash64 variant stays the production path (JVM-side
    hash of the shingle string, no per-character fold). The collapse
    prepass groups on the raw text (SQL-expressible and exact; the
    production form groups on xxhash64(text) so only 8-byte keys
    shuffle), and both the cap and the expansion are mirrored
    stage-for-stage in :func:`dedup_minhash_portable_sql`.
    """
    members, rep_docs = _collapse_exact(
        documents, F.coalesce(F.col("text"), F.lit(""))  # NULL ≡ '' (see dedup_minhash)
    )
    sh_df, banded = _portable_banded(rep_docs, num_hashes, bands, n)
    banded = _cap_band_buckets(banded, ["band", "bhash"], max_bucket_width)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bhash"])
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = cand.join(
        sh_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        "doc_a",
    ).join(
        sh_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    rep_pairs = pairs.filter(jac >= jaccard_threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    return _expand_pairs(
        rep_pairs, members, "doc_a", "doc_b", "jaccard", F.lit(1.0)
    )


def dedup_minhash_portable_sql(
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    max_bucket_width: int | None = 256,
) -> str:
    """DuckDB twin of :func:`dedup_minhash_portable` — same exact-dup
    collapse (min doc_id per identical text), same shingles, same
    polynomial hashes, same band fold, same bucket-width cap (QUALIFY
    over the identical count), same verify, same group re-expansion."""
    from tiny_md_hbase_spark.operators.text import tokens_sql
    from tiny_md_hbase_spark.operators.text import shingles_sql as _sh_sql

    toks_nn = tokens_sql("coalesce(text, '')")
    shingles_sql = _sh_sql(3)
    char_hash = _portable_char_hash_sql()
    mins = _portable_mins_sql(num_hashes)
    band_rows = _portable_band_rows_sql(num_hashes, bands)
    cap_cte = (
        "banded"
        if max_bucket_width is None
        else "(SELECT doc_id, band, bhash FROM banded QUALIFY "
        f"count(*) OVER (PARTITION BY band, bhash) <= {max_bucket_width})"
    )
    return (
        "WITH grp AS (SELECT doc_id, "
        "min(doc_id) OVER (PARTITION BY coalesce(text, '')) AS rep "
        "FROM documents), "
        # tokenize coalesce(text, '') so a NULL-text representative
        # still bands: zero-token docs (NULL, '', whitespace-only) all
        # shingle to [''] and must pair at 1.0 across collapse groups,
        # exactly as the Spark side's shingles(NULL) = [''] does
        f"t AS (SELECT d.doc_id, {toks_nn} AS toks FROM documents d "
        "JOIN grp ON d.doc_id = grp.doc_id AND grp.doc_id = grp.rep), "
        f"sh AS (SELECT doc_id, {shingles_sql} AS s FROM t), "
        f"hashed AS (SELECT doc_id, s, list_transform(s, g -> {char_hash}) AS hs "
        "FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM hashed), "
        f"banded AS ({band_rows}), "
        f"bandedc AS (SELECT * FROM {cap_cte}), "
        "cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bandedc a JOIN bandedc b ON a.band = b.band AND a.bhash = b.bhash "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "rp AS (SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM ("
        "  SELECT doc_a, doc_b,"
        "    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)"
        "      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jac"
        "  FROM cand JOIN sh sa ON sa.doc_id = doc_a "
        "  JOIN sh sb ON sb.doc_id = doc_b"
        f") WHERE jac >= {jaccard_threshold}) "
        "SELECT least(x.doc_id, y.doc_id) AS doc_a, "
        "greatest(x.doc_id, y.doc_id) AS doc_b, jaccard "
        "FROM rp JOIN grp x ON x.rep = rp.doc_a JOIN grp y ON y.rep = rp.doc_b "
        "UNION ALL "
        "SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "CAST(1.0 AS DOUBLE) AS jaccard "
        "FROM grp x JOIN grp y ON x.rep = y.rep AND x.doc_id < y.doc_id"
    )


def _hashed_shingles(
    documents: DataFrame, n: int = 3, hash_family: str = "portable"
) -> DataFrame:
    """(doc_id, hs): each document's DISTINCT shingle set as SORTED
    hashes — the 8-byte-per-shingle sketch the streaming near-dup keeps
    as state instead of text (at 100 TB the state is hashes, never
    re-readable text). Same tokenization (NULL ≡ ''), same shingles as
    :func:`_portable_banded`.

    ``hash_family='portable'`` uses the per-character polynomial fold
    any engine reproduces bit-for-bit (the oracle-checkable form);
    ``'xxhash64'`` is the production path — one JVM hash call per
    shingle instead of an interpreted fold over every character, the
    same split :func:`dedup_minhash` vs :func:`dedup_minhash_portable`
    make. Both reduce into the Mersenne-31 domain the permutation
    family expects."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    if hash_family == "portable":
        fold = lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD  # noqa: E731
        codes = F.transform(F.split("s", ""), lambda c: F.ascii(c).cast("long"))
        h = F.aggregate(codes, F.lit(0).cast("long"), fold)
    elif hash_family == "xxhash64":
        h = F.pmod(F.xxhash64("s"), F.lit(_MERSENNE31))
    else:
        raise ValueError(
            f"unknown hash_family {hash_family!r}: use 'portable' or 'xxhash64'"
        )
    # spread the shingle/hash projection BEFORE the heavy work: a
    # streaming micro-batch arrives with the file source's partitioning
    # (often ONE file -> one task would do all the hashing)
    docs = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            F.explode(
                shingles(F.coalesce(F.col("text"), F.lit("")), n)
            ).alias("s"),
        )
        .select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("h")).alias("hs"))
    )


def _banded_from_hs(
    hs_df: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, band, bhash) band keys derived from a (doc_id, hs)
    hashed-shingle table: k min-hash permutations as array_min over a
    map-side transform (min over the DISTINCT set equals min over the
    shingle bag — duplicates never change a minimum), band keys folding
    each band's mins with the shared polynomial. No explode, no
    shuffle: one projection per row."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    rows_per_band = num_hashes // bands
    fold = lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD  # noqa: E731

    def _perm(i: int):
        # a single-arg closure: a two-arg lambda would hit F.transform's
        # (element, index) calling convention and silently replace the
        # permutation number with the array index
        a, b = 2 * i + 1, 7919 * (i + 1)
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE31)

    mins = [
        F.array_min(F.transform("hs", _perm(i))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    sig = hs_df.select("doc_id", *mins)
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.aggregate(
                            F.array(
                                *[
                                    F.col(f"m{j}")
                                    for j in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ]
                            ),
                            F.lit(0).cast("long"),
                            fold,
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bhash")


def stream_dedup_near_sql(
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_width: int | None = 64,
) -> str:
    """DuckDB twin of ``streaming.ingest.stream_dedup_near``'s drained
    pair set: the same portable front end over the WHOLE corpus at
    once — hashed-shingle sets, min-hash bands, banded candidates,
    hashed-set Jaccard verify. Defaults mirror the streaming operator's
    (including the cap) so default-to-default cross-checks agree; the
    registry key passes ``max_bucket_width=None`` on BOTH sides. Under
    a ``max_bucket_width`` the stored
    side is the FIRST ``W`` doc_ids per bucket (row_number by doc_id —
    equal to the streaming keep-first cap exactly when arrival order is
    doc_id order, which the registry staging guarantees); the arriving
    side is never capped, mirroring the sink's stored x arriving join."""
    from tiny_md_hbase_spark.operators.text import tokens_sql
    from tiny_md_hbase_spark.operators.text import shingles_sql as _sh_sql

    toks_nn = tokens_sql("coalesce(text, '')")
    char_hash = _portable_char_hash_sql()
    mins = _portable_mins_sql(num_hashes)
    band_rows = _portable_band_rows_sql(num_hashes, bands)
    stored = (
        "banded"
        if max_bucket_width is None
        else "(SELECT doc_id, band, bhash FROM banded QUALIFY "
        "row_number() OVER (PARTITION BY band, bhash ORDER BY doc_id) "
        f"<= {max_bucket_width})"
    )
    return (
        f"WITH t AS (SELECT doc_id, {toks_nn} AS toks FROM documents), "
        f"sh AS (SELECT doc_id, {_sh_sql(n)} AS s FROM t), "
        "hset AS (SELECT doc_id, list_sort(list_distinct("
        f"list_transform(s, g -> {char_hash}))) AS hs FROM sh), "
        f"sig AS (SELECT doc_id, hs, {mins} FROM hset), "
        f"banded AS ({band_rows}), "
        f"stored AS (SELECT * FROM {stored}), "
        "cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM stored a JOIN banded b ON a.band = b.band AND a.bhash = b.bhash "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM ("
        "  SELECT doc_a, doc_b,"
        "    CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)"
        "      / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jac"
        "  FROM cand JOIN hset ha ON ha.doc_id = doc_a "
        "  JOIN hset hb ON hb.doc_id = doc_b"
        f") WHERE jac >= {jaccard_threshold}"
    )


def decontaminate_fuzzy(
    documents: DataFrame,
    eval_mod: int = 50,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy train/eval decontamination: training documents that are
    NEAR-duplicates of a held-out eval document (paraphrase-level
    leakage the exact shared-n-gram check, ``text.decontaminate``,
    misses when the contaminated copy was lightly edited).

    Same split convention as ``decontaminate``: ``doc_id % eval_mod ==
    0`` plays the held-out benchmark. Pipeline = the portable MinHash
    front end (:func:`_portable_banded`) on the WHOLE corpus, band keys
    split into eval/train sides, candidates from the banded equi-join,
    then the exact shingle-Jaccard verify at ``jaccard_threshold``
    (lower than the dedup default 0.8 — contamination screening wants
    paraphrase recall, and every candidate is exactly verified so the
    lower bar adds no false positives).

    Scale shape: the corpus never shuffles as text — signatures are a
    map-side pass over one materialized shingle table; the eval side of
    the band join is broadcast (eval benchmarks are small and fixed by
    construction, exactly as in ``decontaminate``); the verify join
    touches only colliding candidates."""
    sh_df, banded = _portable_banded(documents, num_hashes, bands, n)
    is_eval = F.col("doc_id") % eval_mod == 0
    tr_b = banded.filter(~is_eval)
    ev_b = banded.filter(is_eval).select(
        F.col("doc_id").alias("eval_doc_id"), "band", "bhash"
    )
    cand = (
        tr_b.join(F.broadcast(ev_b), ["band", "bhash"])
        .select(F.col("doc_id").alias("train_doc_id"), "eval_doc_id")
        .dropDuplicates(["train_doc_id", "eval_doc_id"])
    )
    pairs = cand.join(
        sh_df.select(F.col("doc_id").alias("train_doc_id"), F.col("sh").alias("sh_t")),
        "train_doc_id",
    ).join(
        F.broadcast(
            sh_df.filter(is_eval).select(
                F.col("doc_id").alias("eval_doc_id"), F.col("sh").alias("sh_e")
            )
        ),
        "eval_doc_id",
    )
    inter = F.size(F.array_intersect("sh_t", "sh_e"))
    union = F.size("sh_t") + F.size("sh_e") - inter
    jac = inter / union
    return pairs.filter(jac >= jaccard_threshold).select(
        "train_doc_id", "eval_doc_id", F.round(jac, 6).alias("jaccard")
    )


def decontaminate_fuzzy_sql(
    eval_mod: int = 50,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`decontaminate_fuzzy` — same shingles, same
    polynomial signature/band arithmetic, same split, same verify, so
    the whole probabilistic pipeline is under the oracle."""
    from tiny_md_hbase_spark.operators.text import tokens_sql
    from tiny_md_hbase_spark.operators.text import shingles_sql as _sh_sql

    shingles_sql = _sh_sql(3)
    char_hash = _portable_char_hash_sql()
    mins = _portable_mins_sql(num_hashes)
    band_rows = _portable_band_rows_sql(num_hashes, bands)
    return (
        f"WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents), "
        f"sh AS (SELECT doc_id, {shingles_sql} AS s FROM t), "
        f"hashed AS (SELECT doc_id, s, list_transform(s, g -> {char_hash}) AS hs "
        "FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM hashed), "
        f"banded AS ({band_rows}), "
        "cand AS (SELECT a.doc_id AS train_doc_id, b.doc_id AS eval_doc_id "
        "FROM banded a JOIN banded b ON a.band = b.band AND a.bhash = b.bhash "
        f"WHERE a.doc_id % {eval_mod} != 0 AND b.doc_id % {eval_mod} = 0 "
        "GROUP BY 1, 2) "
        "SELECT train_doc_id, eval_doc_id, round(jac, 6) AS jaccard FROM ("
        "  SELECT train_doc_id, eval_doc_id,"
        "    CAST(len(list_intersect(st.s, se.s)) AS DOUBLE)"
        "      / (len(st.s) + len(se.s) - len(list_intersect(st.s, se.s))) AS jac"
        "  FROM cand JOIN sh st ON st.doc_id = train_doc_id "
        "  JOIN sh se ON se.doc_id = eval_doc_id"
        f") WHERE jac >= {jaccard_threshold}"
    )


def simhash(text: Column | str, bits: int = 64, n: int = 1) -> Column:
    """SimHash: per bit position j, sum +1/-1 votes from each shingle
    hash's bit j; the fingerprint sets bit j iff the vote is ≥ 0.

    One ``aggregate`` pass with a ``bits``-wide array accumulator (a
    zip_with per element) — a single compact expression instead of
    ``bits`` separate aggregates, so it stays within codegen limits."""
    hashes = F.transform(shingles(text, n), lambda t: F.xxhash64(t))
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                positions,
                lambda j: F.when(
                    F.call_function("shiftright", h, j).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda a, v: a + v,
        ),
    )
    # fold the vote vector into the 64-bit fingerprint
    weighted = F.zip_with(
        votes,
        positions,
        lambda v, j: F.when(
            v >= 0, F.call_function("shiftleft", F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def simhash_table(documents: DataFrame, bits: int = 64, n: int = 1) -> DataFrame:
    """Per-document SimHash fingerprints as a table: explode shingle
    hashes, ``bits`` conditional-sum vote aggregates per doc (all
    codegen'd, map-side partial), then one projection folds the votes
    into the fingerprint. Same math as :func:`simhash`, which evaluates
    interpreted (``aggregate``/``zip_with`` are CodegenFallback) and is
    kept as the single-expression form; this is the bulk path.
    Columns: (doc_id, sh)."""
    from functools import reduce as _reduce

    ex = documents.select(
        "doc_id", F.explode(shingles("text", n)).alias("t")
    ).select("doc_id", F.xxhash64("t").alias("h"))
    votes = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = _reduce(
        lambda a, b: a.bitwiseOR(b),  # Column | Column is logical OR
        [
            # shiftleft, not a Python literal: 1 << 63 overflows signed long
            F.when(
                F.col(f"v{j}") >= 0, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
            for j in range(bits)
        ],
    )
    return votes.select("doc_id", fp.alias("sh"))


def dedup_simhash(
    documents: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """SimHash near-dup: 64-bit fingerprints, banding on 16-bit quarters
    (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 bands identical), then
    exact hamming verify via bit_count(xor). Returns (doc_a, doc_b,
    hamming)."""
    width = 64 // bands
    # repartition raw rows first (single-file source), materialize once:
    # both sides of the band self-join read the fingerprint table
    sh_df = simhash_table(
        documents.repartition(
            documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
    ).localCheckpoint()
    banded = sh_df.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sh", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.bkey")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.filter(hamming <= max_hamming)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )


_PORTABLE_HALF = 28  # each polynomial hash is mod 1e9+7 (< 2^30); bits
# above 27 are biased by the modulus, so each contributes its low 28
_PORTABLE_BITS = 2 * _PORTABLE_HALF  # two multipliers (31, 37) -> 56 bits


def dedup_simhash_portable(
    documents: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup with a cross-engine-computable hash — the fully
    oracle-checked twin of :func:`dedup_simhash` (same pigeonhole
    banding + exact hamming verify, word shingles).

    The shingle hash is a pair of polynomial rolling hashes
    ``(acc*m + cp) mod 1e9+7`` with multipliers 31 and 37, giving a
    56-bit fingerprint (28 unbiased bits from each; a single modular
    hash only has ~28 usable bits, which collapses precision on a small
    corpus). Every intermediate — fingerprints, band keys, candidates,
    hamming distances — is identical on Spark and DuckDB, so the whole
    pipeline sits under the oracle. The xxhash64 64-bit variant remains
    the production path.
    """
    from functools import reduce as _reduce

    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD

    bits = _PORTABLE_BITS
    half = _PORTABLE_HALF
    width = bits // bands
    docs = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    codes = F.transform(F.split("g", ""), lambda c: F.ascii(c).cast("long"))

    def _poly(mult: int):
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda a, x: (a * mult + x) % FINGERPRINT_MOD,
        )

    ex = docs.select("doc_id", F.explode(shingles("text", 1)).alias("g")).select(
        "doc_id", _poly(31).alias("h1"), _poly(37).alias("h2")
    )
    votes = ex.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h1" if j < half else "h2", j % half)
                    .bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = _reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.when(
                F.col(f"v{j}") >= 0, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
            for j in range(bits)
        ],
    )
    sh_df = votes.select("doc_id", fp.alias("sh")).localCheckpoint()
    banded = sh_df.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sh", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.bkey")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return cand.filter(hamming <= max_hamming).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


def dedup_simhash_portable_sql(max_hamming: int = 3, bands: int = 4) -> str:
    """DuckDB twin of :func:`dedup_simhash_portable`."""
    from tiny_md_hbase_spark.operators.text import FINGERPRINT_MOD, tokens_sql

    bits = _PORTABLE_BITS
    half = _PORTABLE_HALF
    width = bits // bands

    def _char_hash(mult: int) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))), "
            f"(acc, x) -> (acc * {mult} + x) % {FINGERPRINT_MOD})"
        )

    vote_cols = ", ".join(
        f"sum(CASE WHEN ({'h1' if j < half else 'h2'} >> {j % half}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp_expr = " + ".join(
        f"(CASE WHEN v{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, sh, {b} AS band, (sh >> {b * width}) & {(1 << width) - 1} "
        "AS bkey FROM fp"
        for b in range(bands)
    )
    return (
        f"WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents), "
        "sh1 AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 1 THEN toks "
        "ELSE [''] END) AS s FROM t), "
        f"ex AS (SELECT doc_id, unnest(s) AS g FROM sh1), "
        f"hashed AS (SELECT doc_id, {_char_hash(31)} AS h1, {_char_hash(37)} AS h2 "
        "FROM ex), "
        f"votes AS (SELECT doc_id, {vote_cols} FROM hashed GROUP BY doc_id), "
        f"fp AS (SELECT doc_id, {fp_expr} AS sh FROM votes), "
        f"banded AS ({band_rows}), "
        "cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming "
        "FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2, 3) "
        f"SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}"
    )


def _broadcast_threshold_bytes(spark) -> int:
    """Parse ``spark.sql.autoBroadcastJoinThreshold`` (accepts the plain
    byte count or a k/m/g suffix) — the same size gate Spark applies to
    its own broadcast decisions."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    raw = raw.strip().lower().removesuffix("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if raw and raw[-1] in units:
        return int(float(raw[:-1]) * units[raw[-1]])
    try:
        return int(raw)
    except ValueError:
        return 10 * (1 << 20)


def ngram_jaccard(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str = "lang",
    num_salts: int = 16,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within blocks.

    The SQL-oracle-checkable exact variant (MinHash above is the scale
    path). Pairs are blocked on ``block_col`` and pruned by the exact
    size-ratio bound |A|/|B| ≥ t ⇒ required for J(A,B) ≥ t — the pruning
    never changes results, only kills pairs that cannot qualify."""
    # intersect on 64-bit shingle hashes, not strings: the arrays carried
    # through the O(pairs) join shrink ~4x and the per-pair set intersection
    # compares longs instead of strings (measured ~5x on the pair stage).
    # Set cardinalities are unchanged barring a 64-bit collision *within
    # one document pair's shingle sets* (~1e-15 per pair) — the value the
    # string-based SQL oracle computes. The hashes come from
    # shingle_hashes (token-hash slices, no gram-string construction) —
    # a DIFFERENT 64-bit value than xxhash64(gram string) but the same
    # collision class, and this operator's output depends only on set
    # sizes, never the values.
    # the corpus usually arrives as ONE parquet file: repartition the raw
    # rows BEFORE the shingle projection (an exchange above the projection
    # would leave the whole expensive pass on one core — measured 5-10x on
    # this stage), then materialize with localCheckpoint so the broadcast
    # build and the stream side share a single 52-hash-per-doc computation
    # instead of each re-running the full shingle pass
    import math

    para = documents.sparkSession.sparkContext.defaultParallelism
    log_base = math.log(1.0 / threshold)
    sh_df = (
        documents.repartition(para, "doc_id")
        .select(
            F.col("doc_id"),
            F.col(block_col).alias("blk"),
            shingle_hashes("text", n).alias("sh"),
        )
        .withColumn("sz", F.size("sh"))
        # lossless length-bucket blocking: J(A,B) >= t implies |A|/|B| >= t,
        # and with bucket = floor(log_{1/t}(sz)) qualifying pairs differ by
        # at most one bucket — so enumerating (bucket, bucket±1) join keys
        # visits every qualifying pair exactly once while skipping
        # size-incompatible ones entirely (the ratio residual below stays
        # as the exact check)
        .withColumn(
            "lb",
            F.floor(F.log(F.col("sz").cast("double")) / F.lit(log_base)).cast("int"),
        )
        .localCheckpoint()
    )
    a = sh_df.withColumn(
        "lbp", F.explode(F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1))
    ).alias("a")
    # the join key (blk, length-bucket) has ~tens of distinct values, so a
    # sort-merge join would collapse to a few huge tasks (observed 4x
    # run-to-run flips when AQE chose it). Two execution shapes, same rows:
    #  - build side fits the broadcast budget -> broadcast it (parallelism
    #    = stream-side partitions, zero shuffle);
    #  - else (the 100 TB case: an unconditional whole-corpus broadcast
    #    would OOM the executors) -> shuffle-hash with a salted key: the
    #    stream side salts on doc_id, the build side replicates per salt,
    #    so each hot (blk, lb) key spreads over num_salts tasks.
    cond = (
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.lbp") == F.col("b.lb"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        # exact pruning: J <= min(|A|,|B|)/max(|A|,|B|)
        & (F.least(F.col("a.sz"), F.col("b.sz"))
           >= F.lit(threshold) * F.greatest(F.col("a.sz"), F.col("b.sz")))
    )
    # NOTE: constructing this DataFrame runs Spark jobs — the
    # localCheckpoint above materializes the shingle projection, and this
    # stats pass (a count+sum over the already-checkpointed partitions,
    # cheap by comparison) sizes the build side off the REAL shingle
    # counts rather than a file-size proxy that shingle expansion would
    # invalidate in either direction.
    stats = sh_df.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("sz"), F.lit(0)).alias("n_shingles"),
    ).first()
    est_bytes = stats.n_shingles * 8 + stats.n_docs * 64
    # 4x headroom: the broadcast HashedRelation carries UnsafeRow + hash
    # table overhead well beyond the raw 8 bytes/shingle, so near the
    # threshold the raw estimate would pick broadcast for a relation that
    # exceeds the budget once built. Overshooting the other way only
    # costs the salted shuffle-hash path, which is safe at any size.
    if est_bytes * 4 <= _broadcast_threshold_bytes(documents.sparkSession):
        b = F.broadcast(sh_df).alias("b")
    else:
        a = a.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_salts)).cast("int")
        ).alias("a")
        b = (
            sh_df.withColumn(
                "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
            )
            .hint("shuffle_hash")
            .alias("b")
        )
        cond = cond & (F.col("a._salt") == F.col("b._salt"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    pairs = (
        a.join(b, cond)
        # name the intersection so filter and output share ONE computation
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("inter"),
            (F.col("a.sz") + F.col("b.sz")).alias("sz_sum"),
        )
    )
    jac = F.col("inter") / (F.col("sz_sum") - F.col("inter"))
    return (
        pairs.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def dedup_clusters(
    documents: DataFrame, pairs: DataFrame, collect_limit: int = 1_000_000
) -> DataFrame:
    """Group near-duplicate pairs into clusters: every document gets
    ``cluster_id`` = the minimum doc_id reachable through the pair graph
    (singletons keep their own id). The keep-one-per-cluster policy is
    then ``filter(doc_id == cluster_id)``.

    The edge list is *pair metadata*, orders of magnitude smaller than the
    corpus (near-dup rate × docs). When it fits ``collect_limit`` rows, a
    driver-side union-find labels the non-singleton docs in one pass and
    a broadcast join applies the mapping — the same bounded-metadata move
    the index's coarse phase makes. Larger graphs fall back to
    distributed min-label propagation to fixpoint: each round joins the
    edge list against current labels and takes the neighborhood minimum —
    O(component diameter) rounds, no driver graph state.
    """
    spark = documents.sparkSession
    ids = documents.select("doc_id")
    # lazy checkpoint + ONE bounded collect decides the path AND (when
    # small enough) already holds the whole edge list — previously this
    # ran three driver actions (eager checkpoint, count, collect) over
    # the same relation. limit(collect_limit + 1) bounds the driver
    # transfer exactly as the old count()-gate did; the checkpoint's
    # remaining partitions are computed by the same job's backfill, so
    # the distributed fallback reuses the materialized pairs without
    # recomputing the (expensive) pair generation.
    #
    # r15: the gate collects the RAW pair rows — union-find treats
    # edges as undirected and is insensitive to duplicates, so the old
    # bidirectional union + distinct bought nothing on this path while
    # costing a full exchange + hash aggregation ahead of the collect
    # (guide §2.4: a distinct on data whose consumers don't need it)
    # and doubling the driver transfer. ``collect_limit`` therefore now
    # bounds PAIR rows (it bounded deduped directed edges ≈ 2x pairs
    # before); both paths compute the same unique fixpoint, so a graph
    # near the boundary returns identical output through either. The
    # distributed fallback builds its bidirectional view on top of the
    # already-materialized pair checkpoint — min-label propagation is
    # itself duplicate-tolerant (a min aggregation), so no distinct is
    # needed there either.
    p2 = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).localCheckpoint(eager=False)
    head = p2.limit(collect_limit + 1).collect()
    if len(head) <= collect_limit:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in head:
            a, b = int(r.a), int(r.b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # min label wins so the root IS the cluster_id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        mapping = [(x, find(x)) for x in parent]
        if not mapping:
            return ids.select("doc_id", F.col("doc_id").alias("cluster_id"))
        map_df = spark.createDataFrame(mapping, "doc_id long, cid long")
        return ids.join(F.broadcast(map_df), "doc_id", "left").select(
            "doc_id", F.coalesce("cid", F.col("doc_id")).alias("cluster_id")
        )

    # distributed path: the general min-label-propagation operator
    # (operators/graph.py connected_components — shared with the graph
    # analytics surface so the fixpoint loop exists exactly once);
    # propagation is directed, so both directions of each pair are
    # passed (built over the checkpointed pairs — the pair generation
    # never re-runs)
    from tiny_md_hbase_spark.operators.graph import connected_components

    edges = p2.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        p2.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    comp = connected_components(
        ids.select(F.col("doc_id").alias("node")), edges
    )
    return comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


def dedup_embedding(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocks: exact cosine over
    double-cast vectors, blocked to bound the pairwise term. Returns
    (vec_a, vec_b, cos_sim). The LSH route for unblocked data lives in
    operators/similarity.py."""
    from tiny_md_hbase_spark.operators.similarity import validate_vectors

    para = embeddings.sparkSession.sparkContext.defaultParallelism
    e = (
        validate_vectors(embeddings).repartition(para, "vec_id")
        .select(
            "vec_id",
            F.col(block_col).alias("blk"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn(
            "norm",
            F.sqrt(
                F.aggregate(
                    F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
                )
            ),
        )
        .localCheckpoint()
    )
    a = e.alias("a")
    b = F.broadcast(e).alias("b")  # label has ~10 values: never sort-merge
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


def dedup_embedding_lsh(
    embeddings: DataFrame,
    threshold: float = 0.35,
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    max_bucket_width: int | None = 4096,
) -> DataFrame:
    """Scale path for embedding near-dup: sign-LSH banded buckets,
    exact-cosine verified per bucket. This is the variant that must be
    the default at 100 TB — :func:`dedup_embedding` broadcasts the whole
    table and is positioned as the blocked verifier only.

    One pass computes a ``planes``-bit signature per vector
    (deterministic hyperplanes shared with the similarity module — no
    RNG, reproducible in SQL); the signature splits into ``bands``
    fixed-width band keys; each (band, band_bits) bucket then verifies
    its pairs with ONE float64 gram matmul inside an Arrow-batched
    ``applyInPandas`` kernel, and pairs colliding in several bands
    dedupe on (vec_a, vec_b). Recall is the LSH tradeoff: a true pair is
    found iff it collides in ≥1 band (tunable via planes/bands); every
    emitted pair is exactly verified, so precision is 1.

    Why per-bucket gram instead of the candidate equi-join + per-pair
    cosine: both enumerate the same sum(b_i^2) pairs, but the join form
    materializes every candidate as a shuffled row and then evaluates an
    interpreted higher-order fold per pair (CodegenFallback — measured
    ~4-6 s for 2 000 vectors / 465 K candidates at the pinned 4-bit
    bands), while the kernel shuffles each vector ``bands`` times and
    never materializes pairs outside the matmul. Candidate volume is
    quadratic in bucket density, the vector shuffle is linear — the
    bucket form is the one that survives dense buckets. The kernel's
    pairwise-summed dots differ from the oracle's left-to-right fold by
    ~1 ulp; only a cosine within ~1e-15 of the threshold (or of a
    round-6 boundary) could flip output, the documented boundary
    argument of the SQL twin.

    Scale guards (same pair as :func:`dedup_minhash`): identical
    vectors are collapsed to one representative before bucketing
    (:func:`_collapse_exact` on the raw double array — cosine of
    identical nonzero vectors is exactly 1.0, so the post-verify
    re-expansion is output-identical; identical ZERO vectors are
    reported as exact duplicates at 1.0 by the collapse's byte-identity
    convention — see :func:`_collapse_exact` — where the uncollapsed
    NaN-cosine path emitted nothing), and any bucket wider than
    ``max_bucket_width`` representatives is skipped
    (:func:`_cap_band_buckets` — the documented recall tradeoff; with
    fixed ``planes`` a bucket is a constant fraction of the corpus, so
    at larger scale RAISE ``planes``/``bands`` to keep buckets under
    the cap rather than raising the cap: the per-bucket gram verify is
    O(width²) compute even when tiled).
    """
    from tiny_md_hbase_spark.operators.similarity import (
        lsh_signature,
        validate_vectors,
    )

    rpb = planes // bands
    mask = (1 << rpb) - 1
    members, rep_vecs = _collapse_exact(
        validate_vectors(embeddings, dim).select("vec_id", "embedding"),
        F.col("embedding").cast("array<double>"),
        id_col="vec_id",
    )
    e = rep_vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), planes, dim))
    bucketed = e.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col("sig")
                        .bitwiseAND(F.lit(mask << (b * rpb)))
                        .alias("band_bits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "v", "bk.band", "bk.band_bits")

    def verify(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        vm = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        vn = vm / np.linalg.norm(vm, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        n = len(vn)
        # tile the gram: a dense bucket's full c x c matrix is O(c^2)
        # floats in ONE task (31 GB at c=62.5K) — each tile is
        # (tile x c), bounding peak memory at ~32 MB while keeping the
        # BLAS inner loop. Vectors themselves are O(c x dim), the
        # irreducible cost of holding the bucket.
        tile = max(1, (4 << 20) // n)
        out = []
        for r0 in range(1, n, tile):
            r1 = min(r0 + tile, n)
            block = vn[r0:r1] @ vn.T  # rows r0..r1 vs ALL columns
            ri, ci = np.nonzero(block >= threshold)
            keep = ci < (ri + r0)  # strictly-lower triangle: col < row
            ri, ci = ri[keep], ci[keep]
            if len(ri):
                out.append(
                    pd.DataFrame(
                        {
                            "vec_a": ids[ci],
                            "vec_b": ids[ri + r0],
                            "cos_sim": np.round(block[ri, ci], 6),
                        }
                    )
                )
        if not out:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        return pd.concat(out, ignore_index=True)

    bucketed = _cap_band_buckets(bucketed, ["band", "band_bits"], max_bucket_width)
    rep_pairs = (
        bucketed.groupBy("band", "band_bits")
        .applyInPandas(verify, "vec_a long, vec_b long, cos_sim double")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return _expand_pairs(
        rep_pairs, members, "vec_a", "vec_b", "cos_sim", F.lit(1.0)
    )


def dedup_embedding_lsh_sql(
    threshold: float = 0.35,
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    max_bucket_width: int | None = 4096,
) -> str:
    """DuckDB twin of :func:`dedup_embedding_lsh`: hyperplanes inline as
    literal arrays (same constants as the Spark expression), bands are the
    same masked bit-slices. Candidate sets agree in practice but not by
    construction: a sign bit comes from a float dot product (Spark's
    ``F.aggregate`` fold vs DuckDB's ``list_sum``), so a projection within
    one ulp of 0 could flip a band key between engines. The verified-pair
    output is robust to that — a flipped bit only perturbs *candidate*
    generation, and the exact cosine verify re-checks every candidate —
    unless the flip hides a pair entirely (never observed on the fixture
    vectors, whose projections are far from 0)."""
    from tiny_md_hbase_spark.operators.similarity import _lsh_coeffs

    from tiny_md_hbase_spark.operators.similarity import sql_dot as dot

    sig = " + ".join(
        f"(CASE WHEN {dot('v', '[' + ', '.join(repr(c) for c in plane) + ']')} >= 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p, plane in enumerate(_lsh_coeffs(planes, dim))
    )
    rpb = planes // bands
    mask = (1 << rpb) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, sig & {mask << (b * rpb)} AS band_bits FROM s"
        for b in range(bands)
    )
    cap_cte = (
        "bk"
        if max_bucket_width is None
        else "(SELECT vec_id, band, band_bits FROM bk QUALIFY "
        f"count(*) OVER (PARTITION BY band, band_bits) <= {max_bucket_width})"
    )
    return (
        "WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        "grp AS (SELECT vec_id, min(vec_id) OVER (PARTITION BY v) AS rep "
        "FROM e0), "
        "e AS (SELECT e0.vec_id, v FROM e0 "
        "JOIN grp ON e0.vec_id = grp.vec_id AND grp.vec_id = grp.rep), "
        f"s AS (SELECT vec_id, v, {sig} AS sig FROM e), "
        f"bk AS ({band_rows}), "
        f"bkc AS (SELECT * FROM {cap_cte}), "
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b "
        "FROM bkc a JOIN bkc b ON a.band = b.band AND a.band_bits = b.band_bits "
        "AND a.vec_id < b.vec_id), "
        "n AS (SELECT vec_id, v, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e), "
        f"rp AS (SELECT vec_a, vec_b, round({dot('va.v', 'vb.v')} / "
        "(va.norm * vb.norm), 6) AS cos_sim "
        "FROM cand JOIN n va ON cand.vec_a = va.vec_id "
        "JOIN n vb ON cand.vec_b = vb.vec_id "
        f"WHERE {dot('va.v', 'vb.v')} / (va.norm * vb.norm) >= {threshold}) "
        "SELECT least(x.vec_id, y.vec_id) AS vec_a, "
        "greatest(x.vec_id, y.vec_id) AS vec_b, cos_sim "
        "FROM rp JOIN grp x ON x.rep = rp.vec_a JOIN grp y ON y.rep = rp.vec_b "
        "UNION ALL "
        "SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, "
        "CAST(1.0 AS DOUBLE) AS cos_sim "
        "FROM grp x JOIN grp y ON x.rep = y.rep AND x.vec_id < y.vec_id"
    )


def dedup_semantic(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_clusters: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Semantic dedup (SemDeDup-style, Abbas et al. 2023): coarse-cluster
    every embedding on the deterministic unit-norm fixed centroids of
    ``similarity._unit_centroids``, then prune near-duplicates by exact
    pairwise cosine *within each cluster only*. A vector is dropped iff
    some lower-``vec_id`` vector in the SAME cluster has cosine >=
    ``threshold`` with it (greedy keep-first — deterministic and
    SQL-expressible; like SemDeDup, cross-cluster near-dups are the
    accepted recall tradeoff that buys the quadratic-term bound). Returns
    the survivors as (vec_id, label, ivf_cluster).

    100 TB shape: assignment is one codegen'd pass (no shuffle); the
    pairwise term runs inside each cluster via an Arrow-batched
    ``applyInPandas`` kernel — ONE shuffle on the cluster key, then one
    float64 BLAS gram matrix per cluster instead of sum(c_i^2)
    interpreted cosine folds (higher-order array expressions are
    CodegenFallback; the pure-join form measured 25 s on 2 000 vectors
    where the kernel is sub-second — same justification as
    ``embedding_knn_batch``). n_clusters is the knob that bounds
    per-cluster memory (c_i vectors + a c_i^2 triangle); raise it with
    corpus size.

    Cross-engine note: numpy's pairwise-summed dot differs from the
    oracle's left-to-right fold by ~1 ulp; only a cosine within ~1e-15
    of ``threshold`` could flip a survivor, the same boundary argument
    ``dedup_embedding_lsh_sql`` documents for its band bits."""
    from tiny_md_hbase_spark.operators.similarity import (
        _unit_centroids,
        validate_vectors,
    )

    cents = _unit_centroids(n_clusters, dim)
    e = validate_vectors(embeddings, dim).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("v"),
                F.array(*[F.lit(c) for c in cent]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d{ci}")
        for ci, cent in enumerate(cents)
    ]
    darr = F.array(*[F.col(f"d{ci}") for ci in range(n_clusters)])
    assigned = e.select("vec_id", "label", "v", *dists).select(
        "vec_id",
        "label",
        "v",
        (F.array_position(darr, F.array_min(darr)) - 1)
        .cast("int")
        .alias("ivf_cluster"),
    )

    def survivors(pdf):
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        vm = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        vn = vm / np.linalg.norm(vm, axis=1, keepdims=True)
        n = len(vn)
        # tiled gram (see dedup_embedding_lsh): peak memory O(tile*c_i),
        # never the O(c_i^2) a full gram would pin on a dense cluster
        tile = max(1, (4 << 20) // max(n, 1))
        dup = np.zeros(n, dtype=bool)
        for r0 in range(1, n, tile):
            r1 = min(r0 + tile, n)
            block = vn[r0:r1] @ vn.T
            for k in range(r1 - r0):
                # dup[row]: any earlier vec_id (col < row) past threshold
                row = r0 + k
                if (block[k, :row] >= threshold).any():
                    dup[row] = True
        return pdf.loc[~dup, ["vec_id", "label", "ivf_cluster"]]

    return assigned.groupBy("ivf_cluster").applyInPandas(
        survivors, "vec_id long, label int, ivf_cluster int"
    )


def dedup_semantic_sql(
    threshold: float = 0.35,
    n_clusters: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`dedup_semantic`: the same literal centroids
    inline (first-position argmin over identical left-to-right double
    sums — the ``embedding_knn_ivf_portable_sql`` assignment CTE), the
    same keep-first dup rule as a NOT EXISTS over the within-cluster
    self-join. Cosine thresholding compares the same IEEE double
    expression on both engines (single division, left-to-right fold),
    the contract the oracle-green ``dedup_embedding`` already relies
    on."""
    from tiny_md_hbase_spark.operators.similarity import (
        _unit_centroids,
        sql_d2 as d2,
        sql_dot,
        sql_lit as lit,
    )

    cents = _unit_centroids(n_clusters, dim)

    dl = "[" + ", ".join(d2("v", lit(c)) for c in cents) + "]"
    dot = sql_dot("x.v", "y.v")
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"a AS (SELECT vec_id, label, v, "
        f"CAST(list_position({dl}, list_min({dl})) - 1 AS INTEGER) "
        "AS ivf_cluster FROM e), "
        "n AS (SELECT vec_id, label, v, ivf_cluster, "
        "sqrt(list_sum(list_transform(v, t -> t * t))) AS norm FROM a) "
        "SELECT x.vec_id, x.label, x.ivf_cluster FROM n x "
        "WHERE NOT EXISTS (SELECT 1 FROM n y "
        "WHERE y.ivf_cluster = x.ivf_cluster AND y.vec_id < x.vec_id "
        f"AND {dot} / (x.norm * y.norm) >= {threshold})"
    )


def _content_fp(text: Column | str) -> Column:
    """The portable polynomial content fingerprint (``doc_fingerprint``'s
    expression, reused as a join key): h = (h*31 + codepoint) mod 1e9+7 —
    computable identically in DuckDB, unlike xxhash64. Delegates to
    ``text.fingerprint_col`` so the empty-content convention (NULL ≡ ''
    → seed 0) holds here too: an unshared copy once folded NULL text to
    a NULL join key, which a left_anti join never matches — a NULL-text
    doc slipped through as a fresh survivor on Spark while the SQL
    twin's fingerprint dropped it."""
    from tiny_md_hbase_spark.operators.text import fingerprint_col

    return fingerprint_col(text)


def dedup_incremental(corpus: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Incremental exact dedup — the only-new-work production shape: a
    NEW batch is deduped against an EXISTING corpus by joining 8-byte
    content fingerprints, so each ingest pays O(batch + |seen-set|) and
    never re-reads old text. Returns the new batch's survivors
    (keep_id, n_copies): documents whose content is already in the
    corpus are dropped entirely; within the batch, the lowest doc_id
    per content survives and n_copies counts its in-batch copies.

    At scale the ``seen`` side is a persisted fingerprint table
    (append survivors' fingerprints after each batch — exactly the
    incremental-index refresh pattern of streaming/ingest.py); here it
    derives from the corpus argument. The fingerprint is the portable
    polynomial hash (not xxhash64) so the whole operator sits under the
    DuckDB oracle; production can swap in xxhash64 for throughput, the
    join shape is identical (``dedup_exact_hashed`` precedent)."""
    seen = corpus.select(_content_fp("text").alias("h")).distinct()
    nd = new_docs.select("doc_id", _content_fp("text").alias("h"))
    fresh = nd.join(seen, "h", "left_anti")
    return (
        fresh.groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def dedup_incremental_sql(
    corpus_table: str = "documents", new_table: str = "new_docs"
) -> str:
    """DuckDB twin of :func:`dedup_incremental` — THE shared
    ``doc_fingerprint_sql`` expression (empty-content-pinned, so
    NULL/'' fingerprints agree with the Spark side and with every
    other fingerprint consumer), the same anti-join + keep-min."""
    from tiny_md_hbase_spark.operators.text import doc_fingerprint_sql

    fp = doc_fingerprint_sql()
    # no leading WITH: the entry prepends its own CTE chain (the
    # corpus_diff_sql composition pattern), so this emits subqueries
    return (
        "SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "count(*) AS n_copies FROM ("
        f"SELECT doc_id, {fp} AS h FROM {new_table}) nd "
        "WHERE h NOT IN ("
        f"SELECT DISTINCT {fp} AS h FROM {corpus_table}) "
        "GROUP BY h"
    )


DEDUP_TTL_HORIZON = 64  # arrival ticks a content stays "seen" after its last sighting


def _ttl_floor_epoch(arr: str | Column, epoch_len: int) -> Column:
    """Floor-division epoch of an arrival tick — ``pmod`` makes it a true
    floor (not truncation toward zero), so negative ticks still land in
    the epoch below zero and the seed-routing argument (only the
    immediately previous epoch can hold a within-``ttl`` predecessor when
    ``epoch_len = ttl + 1``) stays exact over the whole long domain.

    The quotient is computed in DECIMAL(38,0), never double: ``x / L``
    on longs promotes to double, whose 53-bit mantissa mis-bins ticks
    above 2^53 — at nanosecond-epoch magnitudes (~1.6e18) the rounding
    jumped epochs by the double's ulp (4 at 2.5e16), splitting
    within-horizon predecessors out of seed range and re-admitting
    duplicates. The subtraction makes the dividend an exact multiple of
    ``epoch_len``, so the decimal quotient is an exact integer at any
    scale and the final long cast is lossless."""
    a = F.col(arr) if isinstance(arr, str) else arr
    exact = (a - F.pmod(a, F.lit(epoch_len))).cast("decimal(38,0)")
    return (exact / F.lit(epoch_len)).cast("long")


def dedup_ttl(
    documents: DataFrame,
    ttl: int = DEDUP_TTL_HORIZON,
    arrival: str = "arrival",
) -> DataFrame:
    """Horizon-bounded (TTL) exact dedup — the UNBOUNDED-stream answer
    to :func:`dedup_exact`/``stream_dedup_docs``'s forever-growing
    seen-set: a document is admitted iff NO document with the same
    content fingerprint occurred within the previous ``ttl`` arrival
    ticks. Semantics are LAST-SEEN RENEWAL (the cache-TTL contract:
    every sighting — admitted or suppressed — renews the content's
    clock), so the rule is exactly "gap to the immediately previous
    same-content occurrence > ttl". Output: the admitted rows
    (doc_id, <arrival col>, lang, source, n_chars) — the tick column
    keeps the caller's name, so the event-time twin reads naturally.

    This is the production shape for perpetual ingest: an exact
    seen-set over an unbounded stream grows O(all content ever) —
    eventually unpayable even compacted — while the TTL form's working
    state is O(content in the horizon), the deliberate trade
    re-crawl pipelines make (a page re-seen after a year SHOULD be
    re-admitted; its content may matter again).

    Scale — the hot-key guard is STRUCTURAL, not an upstream caveat
    (the ``_cap_band_buckets`` precedent made real; a naive
    per-fingerprint window funnels a content with millions of sightings
    through ONE task):

    1. TICK-REDUCE: per (h, tick) only the min-``doc_id`` row can ever
       be admitted — any other same-tick row has gap 0 ≤ ttl to it —
       so the rows first collapse through a (h, tick)-keyed ``min_by``
       aggregate with MAP-SIDE partial combine: a same-tick flood of
       one literal string reduces inside each input task before any
       exchange.
    2. EPOCH-SALT: the lag chain then runs per (h, epoch) with
       ``epoch = tick div (ttl+1)``, seeded by the previous epoch's max
       tick. With epoch length ttl+1, a predecessor two or more epochs
       back is ALWAYS past the horizon (gap > ttl), so the one-epoch
       seed preserves the exact gap rule while bounding every window
       partition at ≤ ttl+1 post-reduce rows + 1 seed — no partition
       can exceed that no matter how skewed arrivals are.

    Two exchanges on 8-byte-keyed rows instead of one, bought for a
    hard per-task bound; both carry (h, long, small struct) rows only.
    The streaming twin (``streaming/ingest.py stream_dedup_ttl``)
    threads the same reduce+salt through its per-batch chain."""
    from pyspark.sql import Window

    epoch_len = int(ttl) + 1
    payload = F.struct("doc_id", "lang", "source", "n_chars").alias("_p")
    reduced = (
        documents.withColumn("h", _content_fp("text"))
        .select("h", F.col(arrival).cast("long").alias("_arr"), payload)
        .groupBy("h", "_arr")
        .agg(F.min_by("_p", F.col("_p.doc_id")).alias("_p"))
    )
    real = reduced.select(
        "h",
        "_arr",
        _ttl_floor_epoch("_arr", epoch_len).alias("_ep"),
        F.lit(0).alias("_seed"),
        "_p",
    )
    seeds = (
        real.groupBy("h", "_ep")
        .agg(F.max("_arr").alias("_arr"))
        .select(
            "h",
            "_arr",
            (F.col("_ep") + 1).alias("_ep"),
            F.lit(1).alias("_seed"),
            F.lit(None).cast(real.schema["_p"].dataType).alias("_p"),
        )
    )
    w = Window.partitionBy("h", "_ep").orderBy("_arr", F.desc("_seed"))
    return (
        real.unionByName(seeds)
        .withColumn("_prev", F.lag("_arr").over(w))
        .filter(
            (F.col("_seed") == 0)
            & (F.col("_prev").isNull() | (F.col("_arr") - F.col("_prev") > ttl))
        )
        .select(
            F.col("_p.doc_id").alias("doc_id"),
            F.col("_arr").alias(arrival),
            F.col("_p.lang").alias("lang"),
            F.col("_p.source").alias("source"),
            F.col("_p.n_chars").alias("n_chars"),
        )
    )


def dedup_ttl_sql(
    staged: str = "staged",
    ttl: int = DEDUP_TTL_HORIZON,
    tick: str = "arrival",
) -> str:
    """DuckDB twin of :func:`dedup_ttl` over a relation ``staged``
    (doc_id, text, lang, source, n_chars, <tick>) — the entry prepends
    the tick-staging CTE. Same fingerprint expression, the plain global
    lag window (the Spark side's tick-reduce + epoch-salt is an exact
    re-plan of this rule, which is the point of oracling it against the
    simple form), same renewal rule. ``tick`` names the clock column —
    ``arrival`` for the arrival-time key, ``event_ts`` for the
    event-time twin."""
    from tiny_md_hbase_spark.operators.text import doc_fingerprint_sql

    fp = doc_fingerprint_sql()
    return (
        f"SELECT doc_id, CAST({tick} AS BIGINT) AS {tick}, lang, source, "
        "n_chars FROM ("
        f"SELECT doc_id, {tick}, lang, source, n_chars, "
        f"lag({tick}) OVER (PARTITION BY h ORDER BY {tick}, doc_id) AS prev "
        f"FROM (SELECT doc_id, {tick}, lang, source, n_chars, {fp} AS h "
        f"FROM {staged})) "
        f"WHERE prev IS NULL OR {tick} - prev > {ttl}"
    )


def dedup_keep_best(documents: DataFrame, clusters: DataFrame) -> DataFrame:
    """Pick each near-dup cluster's SURVIVOR by merit, not by id: the
    longest member (``n_chars`` desc, doc_id asc tiebreak) wins. Real
    pipelines keep the most complete capture of a page, not whichever
    copy happened to get the smallest id — the min-id policy
    :func:`dedup_clusters` documents is the right *label*, this is the
    right *representative*.

    ``clusters`` is :func:`dedup_clusters` output ((doc_id, cluster_id),
    one row per document). Output: one row per cluster —
    (cluster_id, keep_id, keep_chars, n_members).

    100 TB shape: the cluster labels join back to the (doc_id, n_chars)
    projection — never the text — and the argmax is ``max_by`` over a
    (n_chars, -doc_id) struct: ONE exchange on cluster_id with map-side
    partial aggregation, no window sort, no skew funnel even if one
    cluster holds a million mirror copies (each task reduces its share
    to a single candidate struct before the shuffle)."""
    slim = documents.select("doc_id", "n_chars")
    j = clusters.join(slim, "doc_id")
    best = F.struct(
        F.col("n_chars").alias("nc"), (-F.col("doc_id")).alias("neg_id")
    )
    return (
        j.groupBy("cluster_id")
        .agg(
            F.max_by("doc_id", best).alias("keep_id"),
            F.max("n_chars").alias("keep_chars"),
            F.count("*").alias("n_members"),
        )
        .select("cluster_id", "keep_id", "keep_chars", "n_members")
    )


def _cap_gram_df(grams: DataFrame, max_gram_df: int | None) -> DataFrame:
    """Drop grams whose document frequency exceeds ``max_gram_df`` before
    any pair join — the hub-gram cap (co_purchase's ``max_degree`` idiom,
    graph.py). A gram appearing in ``d`` documents fans out to d·(d-1)/2
    candidate pairs in a gram-blocked self-join; one boilerplate gram in
    10⁶ docs of a crawl is 5·10¹¹ pairs. Capping df bounds the per-gram
    fan-out at max_gram_df²/2. The df aggregation and the semi-join both
    hash on ``h`` — the same partitioning the downstream pair join uses,
    so the cap adds one co-partitioned exchange, not a new shuffle shape."""
    if max_gram_df is None:
        return grams
    keep = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_gram_df)
        .select("h")
    )
    return grams.join(keep, "h").select("doc_id", "h")


def _gram_incidence(
    documents_toks: DataFrame, gram_len: int
) -> DataFrame:
    """Distinct (doc_id, md5-of-gram) incidence list from a (doc_id,
    toks) projection — shared candidate-generation front end of
    :func:`dedup_edit` / :func:`doc_containment`. Only 16-byte hashes
    flow into downstream shuffles, never window strings or text."""
    return documents_toks.select(
        "doc_id",
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
    ).distinct()


def dedup_edit(
    documents: DataFrame,
    gram_len: int = 5,
    max_dist: int = 30,
    k: int = 500,
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """Edit-distance near-duplicate pairs: candidate generation by
    shared ``gram_len``-token windows (blocked equi-join on md5 gram
    keys), then exact verification by Levenshtein distance ≤
    ``max_dist``. The edit-distance member of the dedup family:
    character-level (catches intra-token typo edits minhash token
    shingles miss), deterministic (no banding probability),
    complementary to :func:`dedup_minhash`'s Jaccard regime.

    Blocking recall: a pair within edit distance ``d`` shares an
    UNTOUCHED ``gram_len``-token window whenever the token count L
    satisfies the pigeonhole bound L ≥ (d+1)·gram_len — d edits can
    break at most d·gram_len of the L−gram_len+1 windows. With the
    defaults (d=30, gram_len=5) that is L ≥ 155 tokens; SHORTER pairs
    with edits spread more densely than one per ``gram_len`` tokens can
    share no window and be missed. The DuckDB twin applies the same
    blocking, so both engines agree on the same candidate universe.

    Returns (doc_a, doc_b, dist) with doc_a < doc_b, ordered
    (dist, doc_a, doc_b), top-``k`` — a total order.

    Scale shape (r14 re-plan — the drift root-cause fix): with a df cap
    in force, candidate generation is the GROUPED block form on the
    16-byte gram hashes — the df count (map-side partial, constant
    memory) + semi-join drops above-cap hub grams BEFORE any block
    list materializes, the survivors group into cap-bounded doc_id
    blocks, and each block's pairs expand with a bounded double
    explode; count, semi-join, and collect all hash on h, so the
    prefilter rides one partitioning. The previous self-join form
    planned the tokenize→md5
    incidence subtree TWICE (no ReusedExchange — verified in the plan)
    plus two more passes for the cap's count+semi-join; this computes
    it once and shuffles it once. Full texts are joined back ONLY for
    candidate pairs (two hash joins on doc_id; column pruning keeps
    tokenization out of those branches). Verification uses Spark's
    thresholded ``levenshtein(a, b, max)`` — the banded O(max·L) DP,
    not the O(L²) full matrix; the oracle side computes the full
    distance and applies the same ≤ filter, which is value-identical on
    every accepted pair. With ``max_gram_df=None`` block width is
    unbounded, so the pair expansion falls back to the blocked
    self-join (collect_list of an unbounded hub gram would be the exact
    single-task funnel the rest of the family refuses to build).

    Cap recall caveat (know what the cap can lose): a document
    replicated MORE than ``max_gram_df`` times has EVERY gram above the
    cap, so pairs among those copies are dropped even though
    verification would accept them — that regime is exact/near-exact
    duplication, which :func:`dedup_exact` / :func:`line_dedup` handle
    first in any sane pipeline (and at a fraction of the cost); run
    them before this operator, or set ``max_gram_df`` above the
    expected duplication (or ``None``) when edit-distance recall among
    ultra-replicated documents matters. For a near-duplicate of a
    DISTINCTIVE document (the regime this operator exists for) the
    pair's rare shared windows survive any cap above its true copy
    count. The oracle mirrors the cap so both engines see the
    identical candidate set."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    para = documents.sparkSession.sparkContext.defaultParallelism
    base = documents.repartition(para, "doc_id").select(
        "doc_id", txt.alias("text"), tokens(txt).alias("toks")
    )
    inc = _gram_incidence(base, gram_len)
    if max_gram_df is not None:
        # grouped candidate form, hub-safe: the df COUNT (map-side
        # partial, constant memory per gram) + semi-join prunes
        # above-cap hub grams BEFORE any list materializes — a plain
        # size() filter after collect_list would still funnel a
        # 10^7-doc boilerplate gram's whole block into one reduce
        # task's array first. The count, the semi-join, and the collect
        # all hash on h, so the prefilter rides the same partitioning;
        # blocks that survive are cap-bounded by construction and the
        # pair expansion is a bounded double explode.
        capped = _cap_gram_df(inc, max_gram_df)
        blocks = (
            capped.groupBy("h")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        cands = (
            blocks.select(F.explode("ids").alias("doc_a"), "ids")
            .select("doc_a", F.explode("ids").alias("doc_b"))
            .filter(F.col("doc_a") < F.col("doc_b"))
            .distinct()
        )
    else:
        # unbounded block width: self-join on the gram key (never
        # collect an unbounded hub gram into one row)
        a, b = inc.alias("a"), inc.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    ta = base.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    tb = base.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    return (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_ta", "_tb", max_dist).cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
        .orderBy("dist", "doc_a", "doc_b")
        .limit(k)
    )


def dedup_edit_sql(
    gram_len: int = 5,
    max_dist: int = 30,
    k: int = 500,
    max_gram_df: int | None = 1000,
) -> str:
    """DuckDB twin of :func:`dedup_edit` — same md5 gram blocking, same
    hub-gram df cap, full (unbanded) levenshtein with the same ≤ filter."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    toks = tokens_sql("coalesce(text, '')")
    cap = (
        ""
        if max_gram_df is None
        else (
            "g0 AS (SELECT doc_id, h FROM gall WHERE h IN "
            f"(SELECT h FROM gall GROUP BY h HAVING count(*) <= {max_gram_df})), "
        )
    )
    g_src = "gall" if max_gram_df is None else "g0"
    return (
        f"WITH t AS (SELECT doc_id, coalesce(text, '') AS text, "
        f"{toks} AS toks FROM documents), "
        "gall AS (SELECT DISTINCT doc_id, "
        f"md5(array_to_string(toks[u.i + 1 : u.i + {gram_len}], ' ')) AS h "
        f"FROM t, unnest(range(CASE WHEN len(toks) >= {gram_len} "
        f"THEN len(toks) - {gram_len} + 1 ELSE 0 END)) AS u(i)), "
        f"{cap}"
        "c AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM {g_src} a JOIN {g_src} b ON a.h = b.h AND a.doc_id < b.doc_id) "
        "SELECT c.doc_a, c.doc_b, "
        "CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist "
        "FROM c JOIN t ta ON c.doc_a = ta.doc_id "
        "JOIN t tb ON c.doc_b = tb.doc_id "
        f"WHERE levenshtein(ta.text, tb.text) <= {max_dist} "
        f"ORDER BY dist, doc_a, doc_b LIMIT {k}"
    )


def doc_containment(
    documents: DataFrame,
    gram_len: int = 8,
    num: int = 9,
    den: int = 10,
    k: int = 2000,
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """ASYMMETRIC containment detection: ordered pairs (doc_a, doc_b)
    where at least ``num/den`` of doc_a's distinct ``gram_len``-token
    windows also occur in doc_b — the "A is quoted/embedded inside B"
    relation. Jaccard (``ngram_jaccard``) is symmetric and collapses
    toward 0 when a small document sits inside a much larger one — the
    exact case (boilerplate inclusion, quotation, concatenated dumps)
    containment exists to catch; Broder's original resemblance paper
    defines both measures for this reason. Returns (doc_a, doc_b,
    n_shared, n_a) with the INTEGER threshold ``den·n_shared ≥
    num·n_a`` (no float ratio anywhere), ordered (doc_a, doc_b),
    top-``k``.

    Scale shape: the (gram-md5, doc) incidence is distinct before the
    pair equi-join (the co_purchase idiom — shared grams shuffle as
    hashes, never text); ``max_gram_df`` (:func:`_cap_gram_df`) drops
    hub grams before the pair join, bounding per-gram fan-out at
    max_gram_df²/2 — without it one boilerplate gram in 10⁶ docs is
    5·10¹¹ candidate pairs. The cap changes the MEASURE, not just the
    candidates: containment is then computed over doc_a's *informative*
    grams (n_a counts post-cap grams) — the stop-gram-removal semantic
    every production containment detector applies, mirrored exactly in
    the DuckDB twin so both engines agree at every scale. The flip
    side: a document whose grams ALL exceed the cap (replicated more
    than ``max_gram_df`` times, or pure boilerplate) drops out of the
    measure entirely — that regime belongs to :func:`dedup_exact` /
    :func:`line_dedup` upstream; raise the cap (or pass ``None``) when
    containment among ultra-replicated documents matters. Per-doc gram
    counts join back on doc_a as a PLAIN equi-join: ``n`` is O(|docs|)
    — a "small side" that is nothing of the sort at crawl scale — so
    the broadcast decision is left to AQE's runtime size estimate
    rather than forced (at fixture scale AQE broadcasts it; above the
    threshold it falls back to a shuffle join on doc_a, which the
    already-aggregated ``shared`` side co-partitions with)."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    para = documents.sparkSession.sparkContext.defaultParallelism
    grams = _cap_gram_df(
        _gram_incidence(
            documents.repartition(para, "doc_id").select(
                "doc_id", tokens(txt).alias("toks")
            ),
            gram_len,
        ),
        max_gram_df,
    )
    # materialize ONCE: grams (tokenize + md5 + explode + distinct +
    # cap — the expensive half) feeds THREE consumers (n_a, both sides
    # of the self-join) and the planner does not reuse the common
    # subtree across aliases (the co_purchase finding)
    grams = grams.localCheckpoint()
    n = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        shared.join(n.select(F.col("doc_id").alias("doc_a"), "n_a"), "doc_a")
        .filter(F.col("n_shared") * den >= F.col("n_a") * num)
        .select("doc_a", "doc_b", "n_shared", "n_a")
        .orderBy("doc_a", "doc_b")
        .limit(k)
    )


def doc_containment_sql(
    gram_len: int = 8,
    num: int = 9,
    den: int = 10,
    k: int = 2000,
    max_gram_df: int | None = 1000,
) -> str:
    """DuckDB twin of :func:`doc_containment` — same md5 gram
    incidence, same hub-gram df cap (n_a counts post-cap grams, as in
    the Spark side), same integer threshold."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    toks = tokens_sql("coalesce(text, '')")
    cap = (
        ""
        if max_gram_df is None
        else (
            "g AS (SELECT doc_id, h FROM gall WHERE h IN "
            f"(SELECT h FROM gall GROUP BY h HAVING count(*) <= {max_gram_df})), "
        )
    )
    g_src = "gall" if max_gram_df is None else "g"
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM documents), "
        "gall AS (SELECT DISTINCT doc_id, "
        f"md5(array_to_string(toks[u.i + 1 : u.i + {gram_len}], ' ')) AS h "
        f"FROM t, unnest(range(CASE WHEN len(toks) >= {gram_len} "
        f"THEN len(toks) - {gram_len} + 1 ELSE 0 END)) AS u(i)), "
        f"{cap}"
        "n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a "
        f"FROM {g_src} GROUP BY doc_id), "
        "s AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        f"FROM {g_src} a JOIN {g_src} b ON a.h = b.h AND a.doc_id <> b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT s.doc_a, s.doc_b, s.n_shared, n.n_a "
        "FROM s JOIN n ON s.doc_a = n.doc_id "
        f"WHERE s.n_shared * {den} >= n.n_a * {num} "
        f"ORDER BY s.doc_a, s.doc_b LIMIT {k}"
    )
