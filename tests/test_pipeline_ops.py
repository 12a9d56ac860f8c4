"""Beyond-parity operator tests: dedup family (with planted duplicates),
similarity search recall, text analysis determinism."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import dedup as D
from tiny_md_hbase_spark.operators import similarity as S
from tiny_md_hbase_spark.operators import text as T
from tiny_md_hbase_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """documents + planted exact and near duplicates of doc 0 and 1."""
    base = load_table(spark, sf_dir, "documents")
    rows = base.orderBy("doc_id").limit(2).collect()
    d0, d1 = rows[0], rows[1]
    near_text = d1.text.rsplit(" ", 1)[0] + " zzz"  # drop last word, add one
    extra = spark.createDataFrame(
        [
            (100001, d0.text, d0.lang, "planted", d0.n_chars),
            (100002, near_text, d1.lang, "planted", len(near_text)),
        ],
        base.schema,
    )
    return base.unionByName(extra).cache()


# --- exact dedup ----------------------------------------------------------

def test_dedup_exact_finds_planted(planted):
    groups = D.dedup_exact(planted).filter(F.col("n_copies") > 1).collect()
    assert len(groups) == 1
    assert groups[0].n_copies == 2


def test_dedup_exact_hashed_equivalent(planted):
    a = sorted((r.keep_id, r.n_copies) for r in D.dedup_exact(planted).collect())
    b = sorted((r.keep_id, r.n_copies) for r in D.dedup_exact_hashed(planted).collect())
    assert a == b


# --- minhash / simhash / jaccard -----------------------------------------

def test_minhash_finds_planted_pairs(planted):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in D.dedup_minhash(planted).collect()}
    d0 = planted.orderBy("doc_id").limit(1).collect()[0].doc_id
    assert (d0, 100001) in pairs and pairs[(d0, 100001)] == 1.0
    assert any(b == 100002 for (_, b) in pairs)  # near-dup caught too


def test_minhash_pairs_are_truly_similar(planted):
    # no false positives below the threshold after exact verification
    for r in D.dedup_minhash(planted).collect():
        assert r.jaccard >= 0.8


def test_minhash_null_and_empty_text_cross_engine(spark):
    """NULL text ≡ '' (empty content): NULL and empty docs collapse into
    ONE exact-dup group on both engines, so the probe that used to split
    7-vs-3 across Spark/DuckDB (NULL reps banding as [''] in Spark,
    dropping from banding in SQL) now agrees. A whitespace-only doc is
    ALSO zero-token content — a different collapse group that must pair
    with the empty family at 1.0 via banding (both reps shingle to
    ['']), which requires the twin to tokenize coalesce(text, '') so
    the NULL-text representative still bands."""
    import duckdb

    rows = [
        (0, None),
        (1, None),
        (2, ""),
        (3, ""),
        (4, "   "),
        (5, "alpha beta gamma delta"),
        (6, "alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # {0,1,2,3} collapse (NULL ≡ ''); {4} is its own group banding to
    # the same [''] shingle set -> C(5,2) zero-token pairs + the dup
    expect = sorted(
        [(a, b, 1.0) for a in range(5) for b in range(a + 1, 5)]
        + [(5, 6, 1.0)]
    )
    for fn in (D.dedup_minhash, D.dedup_minhash_portable):
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard) for r in fn(docs).collect()
        )
        assert got == expect, fn.__name__
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.sql(
        D.dedup_minhash_portable_sql() + " ORDER BY 1, 2"
    ).fetchall()))
    assert want == expect


def test_collapse_fast_path_and_output_continuity(spark):
    """The clean-corpus fast path (r10 verdict #5): when every
    fingerprint is unique, _collapse_exact returns members=None (window,
    checkpoint and re-expansion joins skipped) and the LSH output is
    unchanged — the near-dup pair a clean corpus contains is found at
    the same jaccard whether the fast or the slow path ran. Appending
    one exact dup flips to the slow path and only ADDS the exact pair."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    clean_rows = [
        (0, base + " mu"),
        (1, base + " zzz"),  # near-dup of 0: 9/11 shared 3-shingles = 0.818
        (2, "one two three four five six seven"),
    ]
    docs = spark.createDataFrame(clean_rows, "doc_id long, text string")
    m, rep = D._collapse_exact(
        docs, F.xxhash64(F.coalesce(F.col("text"), F.lit("")))
    )
    assert m is None and rep.count() == 3  # fast path: identity
    clean_pairs = sorted(
        (r.doc_a, r.doc_b, r.jaccard) for r in D.dedup_minhash(docs).collect()
    )
    assert [(a, b) for a, b, _ in clean_pairs] == [(0, 1)]

    duped = docs.unionByName(
        spark.createDataFrame(
            [(3, clean_rows[2][1])], "doc_id long, text string"
        )
    )
    m2, _ = D._collapse_exact(
        duped, F.xxhash64(F.coalesce(F.col("text"), F.lit("")))
    )
    assert m2 is not None  # slow path: a duplicate fingerprint exists
    duped_pairs = sorted(
        (r.doc_a, r.doc_b, r.jaccard) for r in D.dedup_minhash(duped).collect()
    )
    assert duped_pairs == sorted(clean_pairs + [(2, 3, 1.0)])


def test_collapse_null_fingerprints_group_together(spark):
    """NULL fingerprints form a dup group exactly as the r10 window
    form did (groupBy groups NULLs): two NULL-fp rows collapse onto the
    min id, while a SINGLE NULL row is unique content and takes the
    fast path. (Production call sites coalesce, so this pins the
    raw-fp form.)"""
    dup = spark.createDataFrame(
        [(0, "a"), (1, None), (2, None)], "doc_id long, text string"
    )
    m, rep = D._collapse_exact(dup, F.col("text"))
    assert m is not None
    assert sorted((r.mid, r.rep) for r in m.collect()) == [(1, 1), (2, 1)]
    assert sorted(r.doc_id for r in rep.collect()) == [0, 1]
    single = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "b")], "doc_id long, text string"
    )
    m2, _ = D._collapse_exact(single, F.col("text"))
    assert m2 is None  # one NULL row is unique content: fast path


def test_embedding_lsh_zero_vector_exact_dup_convention(spark):
    """Identical ZERO vectors: cosine is undefined, but byte-identical
    content is an exact duplicate — the collapse reports the pair at
    1.0 (documented convention, mirrored by the SQL twin's group
    expansion); a zero vector never pairs with a nonzero one."""
    vecs = [
        (0, [0.0] * 8),
        (1, [0.0] * 8),
        (2, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = sorted(
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in D.dedup_embedding_lsh(emb, dim=8).collect()
    )
    assert got == [(0, 1, 1.0), (2, 3, 1.0)]


def test_minhash_portable_finds_planted_pairs(planted):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.dedup_minhash_portable(planted).collect()
    }
    d0 = planted.orderBy("doc_id").limit(1).collect()[0].doc_id
    assert (d0, 100001) in pairs and pairs[(d0, 100001)] == 1.0
    for v in pairs.values():
        assert v >= 0.8


def test_simhash_portable_finds_exact_dup(planted):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.dedup_simhash_portable(planted).collect()
    }
    d0 = planted.orderBy("doc_id").limit(1).collect()[0].doc_id
    assert pairs.get((d0, 100001)) == 0
    for v in pairs.values():
        assert 0 <= v <= 3


def test_simhash_finds_exact_dup(planted):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.dedup_simhash(planted).collect()}
    d0 = planted.orderBy("doc_id").limit(1).collect()[0].doc_id
    assert pairs.get((d0, 100001)) == 0


def test_minhash_jvm_equals_portable_after_verify(planted):
    """Cross-check of the two MinHash variants: the production JVM-hash
    pipeline (xxhash64 — not oracle-able in DuckDB) and its oracle-green
    portable twin must emit the SAME verified pairs with the SAME exact
    Jaccard at the same threshold. Candidate sets may differ (different
    hash families band differently); the exact-Jaccard verifier must
    erase that difference on every pair either family surfaces."""
    jvm = {
        (r.doc_a, r.doc_b): r.jaccard for r in D.dedup_minhash(planted).collect()
    }
    portable = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.dedup_minhash_portable(planted).collect()
    }
    assert jvm and jvm == portable


def test_simhash_jvm_and_portable_agree_on_exact_dups(planted):
    """SimHash cross-check: hamming distances live in different spaces
    (64-bit xxhash64 vs 2x28-bit polynomial), so the near-dup sets —
    even the hamming==0 sets: unrelated docs can collide to one simhash,
    differently per family — may legitimately differ at the margin. The
    family-independent invariant: every exact TEXT duplicate pair is
    hamming 0 in BOTH families, and each family's output respects its
    own max_hamming bound."""
    d0 = planted.orderBy("doc_id").limit(1).collect()[0].doc_id
    exact_text_pairs = {(d0, 100001)}  # the planted verbatim copy
    jvm = {(r.doc_a, r.doc_b): r.hamming for r in D.dedup_simhash(planted).collect()}
    portable = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.dedup_simhash_portable(planted).collect()
    }
    for p in exact_text_pairs:
        assert jvm.get(p) == 0, (p, jvm.get(p))
        assert portable.get(p) == 0, (p, portable.get(p))
    assert all(0 <= h <= 3 for h in jvm.values())
    assert all(0 <= h <= 3 for h in portable.values())


def test_pii_scrub_planted(spark):
    from tiny_md_hbase_spark.operators import privacy as PV

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now", "en", "s", 0),
            (2, "server 192.168.100.7 and card 4111111111111111", "en", "s", 0),
            (3, "call +1 at 555-867-5309 ok", "en", "s", 0),
            (4, "nothing sensitive here", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = {r.doc_id: r for r in PV.pii_scrub(docs).collect()}
    assert rows[1].n_email == 1 and rows[1].clean_text == "mail <EMAIL> now"
    assert rows[2].n_ip == 1 and rows[2].n_id == 1
    assert rows[2].clean_text == "server <IP> and card <ID>"
    assert rows[3].n_phone == 1 and "<PHONE>" in rows[3].clean_text
    assert rows[4].clean_text == "nothing sensitive here"
    assert (
        rows[4].n_email == rows[4].n_ip == rows[4].n_phone == rows[4].n_id == 0
    )


def test_pii_scrub_sequential_no_double_count(spark):
    """An IPv4 must not also be counted as a long id (sequential scrub:
    the ip placeholder removes the digits before the id pattern runs),
    and digits inside a redacted email never resurface."""
    from tiny_md_hbase_spark.operators import privacy as PV

    docs = spark.createDataFrame(
        [(1, "x 10.200.300.400 y 123456789@example.com z", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    r = PV.pii_scrub(docs).collect()[0]
    assert r.n_email == 1 and r.n_ip == 1 and r.n_id == 0
    assert r.clean_text == "x <IP> y <EMAIL> z"


def test_winnow_shared_run_guarantee(spark):
    """Winnowing's core property: any shared token run of w + k - 1
    tokens yields at least one shared fingerprint, regardless of the
    surrounding text."""
    from tiny_md_hbase_spark.operators import text as TX

    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four five", "en", "s", 0),
            (2, f"totally different prefix {shared} and another suffix here", "en", "s", 0),
            (3, "no overlap with anything else at all whatsoever", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    fps: dict[int, set] = {}
    for r in TX.winnow_fingerprint(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], (fps[1], fps[2])
    assert not (fps[1] & fps[3])
    # density: winnowing keeps far fewer fingerprints than grams
    n_tokens = len(f"one two {shared} three four five".split())
    assert len(fps[1]) <= n_tokens - TX.WINNOW_K + 1


def test_winnow_pairs_planted_copy(spark):
    """A copied passage (>= w + k - 1 shared tokens in a run) pairs its
    two documents; unrelated docs never pair; a stop-phrase shared by
    MANY docs is df-pruned and creates no pairs on its own."""
    from tiny_md_hbase_spark.operators import text as TX

    passage = "the quick brown fox jumps over lazy dogs tonight"
    boiler = "standard footer text appears everywhere in corpus pages"
    rows = [
        (1, f"intro words {passage} closing remarks here", "en", "s", 0),
        (2, f"other beginning {passage} different ending words", "en", "s", 0),
        (3, "completely unrelated content about spark plans", "en", "s", 0),
    ]
    # 20 docs sharing only the boilerplate: df(=20) > max_df(=10) prunes it
    rows += [
        (100 + i, f"doc number {i} unique words {boiler}", "en", "s", 0)
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in TX.winnow_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    assert not any(a >= 100 and b >= 100 for a, b in pairs), pairs


def test_corpus_prepare_consistent_with_stages(spark, sf_dir):
    """The flagship pipeline must equal its stages run standalone:
    every selected doc passes the quality bar, survives exact dedup
    (lowest doc_id for its scrubbed text), passes the mix decision, and
    the per-language budgets obey fill-until-full."""
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = TX.corpus_prepare(docs).collect()
    assert out
    selected = {r.doc_id for r in out}
    # stage replication
    from tiny_md_hbase_spark.operators.privacy import PII_PATTERNS

    cur = F.col("text")
    for _, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    scrubbed = docs.select("doc_id", cur.alias("text"), "lang", "source", "n_chars")
    ok = {
        r.doc_id
        for r in TX.quality_score(scrubbed).filter(F.col("quality") >= 0.5).collect()
    }
    assert selected <= ok
    kept = {
        r.doc_id
        for r in scrubbed.filter(F.col("doc_id").isin(list(ok)))
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert selected <= kept
    # budget invariant per language
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        assert all(r.cum_tokens - r.n_tokens < TX.TOKEN_BUDGET_PER_LANG for r in rows)


def test_corpus_diff_statuses(spark):
    from tiny_md_hbase_spark.operators import text as TX

    schema = "doc_id long, text string, lang string, source string, n_chars int"
    old = spark.createDataFrame(
        [
            (1, "same text", "en", "s", 0),
            (2, "will change", "en", "s", 0),
            (3, "will vanish", "de", "s", 0),
            (4, None, "fr", "s", 0),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "same text", "en", "s", 0),
            (2, "has changed", "en", "s", 0),
            (4, None, "fr", "s", 0),  # NULL == NULL must read as unchanged
            (5, "brand new", "es", "s", 0),
        ],
        schema,
    )
    got = {r.doc_id: (r.lang, r.status) for r in TX.corpus_diff(old, new).collect()}
    assert got == {2: ("en", "changed"), 3: ("de", "removed"), 5: ("es", "added")}


def test_winnow_short_doc_single_fingerprint(spark):
    from tiny_md_hbase_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(1, "tiny doc", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = TX.winnow_fingerprint(docs).collect()
    assert len(rows) == 1  # < k tokens -> whole text is the one gram


def test_chunk_documents_tiles_every_token(spark, sf_dir):
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = TX.chunk_documents(docs)
    n_tok = docs.select(
        "doc_id", F.size(TX.tokens("text")).alias("n")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("covered"),
        F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("reach"),
        F.min("chunk_start").alias("first"),
    )
    j = per_doc.join(n_tok, "doc_id")
    # stride < chunk size => overlapping cover: starts at 0, reaches the
    # last token, and total chunk tokens >= document tokens
    assert j.filter(F.col("first") != 0).count() == 0
    assert j.filter(F.col("reach") < F.col("n")).count() == 0
    assert j.filter(F.col("covered") < F.col("n")).count() == 0


def test_decontaminate_finds_planted_overlap(spark, sf_dir):
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % TX.DECON_EVAL_MOD == 0).limit(1).collect()[0]
    leaked_text = " ".join(ev.text.split()[:12])  # 12 tokens => 5 shared 8-grams
    leak = spark.createDataFrame(
        [(900001, leaked_text, ev.lang, "leak", len(leaked_text))], docs.schema
    )
    hits = {
        (r.train_doc_id, r.eval_doc_id): r.n_shared_grams
        for r in TX.decontaminate(docs.unionByName(leak)).collect()
    }
    assert hits.get((900001, ev.doc_id)) == 5


def test_ngram_jaccard_planted(planted):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in D.ngram_jaccard(planted).collect()}
    d0 = planted.orderBy("doc_id").limit(1).collect()[0].doc_id
    assert pairs.get((d0, 100001)) == 1.0
    # near-dup: one word changed of ~n tokens -> jaccard just under 1
    near = [j for (a, b), j in pairs.items() if b == 100002]
    assert near and all(0.8 <= j < 1.0 for j in near)


# --- embeddings -----------------------------------------------------------

@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_embedding_knn_matches_numpy(embs):
    import numpy as np

    rows = embs.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[1]
    sims = sorted(
        ((round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6), -vid) for vid, v in vecs.items()),
        reverse=True,
    )[:10]
    expected = [(-vid, s) for s, vid in sims]
    got = [(r.vec_id, r.cos_sim) for r in S.embedding_knn(embs, 1, 10).collect()]
    assert got == expected


def test_embedding_knn_lsh_recall(embs):
    exact = {r.vec_id for r in S.embedding_knn(embs, 1, 10).collect()}
    approx_rows = S.embedding_knn_lsh(embs, 1, 10, probe_hamming=6).collect()
    approx = {r.vec_id for r in approx_rows}
    # the query itself must always be found (sim 1.0, hamming 0)
    assert 1 in approx
    # approximate: recall against the brute-force top-k depends on corpus
    # density (the sf0.01 fixture recalls fewer than sf0.001 at the same
    # probe radius), so demand meaningful-but-density-robust overlap ...
    assert len(exact & approx) >= 3
    # ... and verify the probe radius semantics directly: widening to all
    # 16 bits must recover the exact top-k (LSH prunes, never re-ranks)
    full = {
        r.vec_id for r in S.embedding_knn_lsh(embs, 1, 10, probe_hamming=16).collect()
    }
    assert full == exact


def test_embedding_knn_ivf_recall(embs):
    exact = {r.vec_id for r in S.embedding_knn(embs, 1, 10).collect()}
    got = S.embedding_knn_ivf(embs, 1, 10, n_clusters=8, n_probe=4).collect()
    approx = {r.vec_id for r in got}
    assert 1 in approx  # the query always probes its own cluster
    assert len(exact & approx) >= 5
    # deterministic across runs (no RNG anywhere)
    again = {r.vec_id for r in S.embedding_knn_ivf(embs, 1, 10, n_clusters=8, n_probe=4).collect()}
    assert approx == again


def test_ivf_build_partitions_corpus(embs):
    assigned, cents = S.ivf_build(embs, n_clusters=8, iters=2)
    n = assigned.count()
    assert n == embs.count()
    per = assigned.groupBy("ivf_cluster").count().collect()
    assert sum(r["count"] for r in per) == n
    assert {r.ivf_cluster for r in per} <= set(range(8))
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)


def test_dedup_semantic_drops_planted_copy(spark, embs):
    """SemDeDup keep-first rule: an exact copy planted under a higher
    vec_id lands in the same (deterministic) cluster as the original,
    cosine 1.0 >= threshold, so the copy is dropped and the original
    survives; every other vector's survival is unchanged."""
    r1 = embs.filter(F.col("vec_id") == 1).collect()[0]
    extra = spark.createDataFrame([(99002, r1.embedding, r1.label)], embs.schema)
    base_ids = {r.vec_id for r in D.dedup_semantic(embs).collect()}
    got = D.dedup_semantic(embs.unionByName(extra)).collect()
    ids = {r.vec_id for r in got}
    assert 99002 not in ids
    assert ids == base_ids  # the planted copy changes nothing else
    # deterministic across runs (fixed centroids, no RNG)
    again = {r.vec_id for r in D.dedup_semantic(embs.unionByName(extra)).collect()}
    assert again == ids


def test_dedup_semantic_unit_centroids_spread(embs):
    """The unit-norm centroid fix: raw [-1,1)^64 centroids collapse every
    unit-norm vector into one cell (the origin-nearest centroid wins all
    argmins); normalized centroids must yield >1 populated cluster and
    full coverage."""
    surv = D.dedup_semantic(embs, threshold=2.0).collect()  # no drops
    assert len(surv) == embs.count()
    assert len({r.ivf_cluster for r in surv}) > 1


def test_dedup_embedding_self_similarity(spark, embs):
    # plant an exact copy of vec 1 under a new id in the same label block
    r1 = embs.filter(F.col("vec_id") == 1).collect()[0]
    extra = spark.createDataFrame([(99001, r1.embedding, r1.label)], embs.schema)
    pairs = D.dedup_embedding(embs.unionByName(extra), threshold=0.95).collect()
    assert any(a == 1 and b == 99001 and s == 1.0 for a, b, s in
               ((r.vec_a, r.vec_b, r.cos_sim) for r in pairs))


# --- text ----------------------------------------------------------------

def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "  a bb  ccc ", "en", "s", 12), (2, "one", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: (r.n_tokens, r.est_bpe_tokens) for r in T.token_count(df).collect()}
    assert got[1] == (3, 3)
    assert got[2] == (1, 0)


def test_lang_id_deterministic(docs):
    a = sorted((r.doc_id, r.lang_pred) for r in T.lang_id(docs).collect())
    b = sorted((r.doc_id, r.lang_pred) for r in T.lang_id(docs).collect())
    assert a == b
    assert {p for _, p in a} <= {"en", "de", "fr", "es"}


def test_quality_score_bounds(docs):
    rows = T.quality_score(docs).collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert all(r.n_tokens > 0 for r in rows)


def test_text_stats_totals(docs):
    stats = T.text_stats(docs).collect()
    assert sum(r.n_docs for r in stats) == docs.count()
    for r in stats:
        assert r.avg_chars == pytest.approx(r.sum_chars / r.n_docs)
        assert r.min_chars <= r.avg_chars <= r.max_chars


def test_doc_fingerprint_matches_python(docs):
    sample = docs.limit(20).collect()
    got = {
        r.doc_id: r.fingerprint
        for r in T.doc_fingerprint(docs.limit(20)).collect()
    }
    for r in sample:
        h = 0
        for ch in r.text:
            h = (h * 31 + ord(ch)) % T.FINGERPRINT_MOD
        assert got[r.doc_id] == h

def test_degenerate_content_conventions_cross_engine(spark):
    """The corpus-wide degenerate-content convention, pinned on a tiny
    probe against DuckDB: NULL text ≡ '' ≡ zero-token content. The
    fingerprint of empty content is the seed 0 on both engines (DuckDB's
    unguarded split would give -1 for '' via unicode('') and NULL for
    NULL text), lang_id's marker sums are 0 (not NULL) so the argmax
    answers 'en' identically, and winnow emits the single fp 0 instead
    of dropping NULL docs. scripts/null_poison_check.py runs the whole
    ledger under this probe; this test keeps the three sharpest edges
    in the fast suite."""
    import duckdb

    rows = [
        (1, None, "en", "web", 0),
        (2, "", "en", "web", 0),
        (3, "  \t", "en", "web", 3),
        (4, "the quick brown fox and the dog", "en", "web", 31),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)

    fp_s = {r.doc_id: r.fingerprint for r in T.doc_fingerprint(docs).collect()}
    fp_d = dict(con.sql(
        f"SELECT doc_id, {T.doc_fingerprint_sql()} FROM documents"
    ).fetchall())
    assert fp_s == fp_d
    # fingerprint is over CODEPOINTS: NULL ≡ '' hash to the seed 0;
    # whitespace-only text has chars, so it hashes nonzero (while still
    # being zero-TOKEN content for the token-based ops below)
    assert fp_s[1] == fp_s[2] == 0 and fp_s[3] != 0 and fp_s[4] != 0

    langs = {r.doc_id: r.lang_pred for r in T.lang_id(docs).collect()}
    assert langs[1] == langs[2] == langs[3] == "en"

    win_s = sorted((r.doc_id, r.fp) for r in T.winnow_fingerprint(docs).collect())
    win_d = sorted(map(tuple, con.sql(T.winnow_fingerprint_sql()).fetchall()))
    assert win_s == win_d
    assert (1, 0) in win_s and (2, 0) in win_s and (3, 0) in win_s


def test_top_tokens_counts_and_rank(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b b c", "en", "s", 11),
            (2, "b b a", "en", "s", 5),
            (3, "x y", "de", "s", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = T.top_tokens(df, k=2).collect()
    got = {(r.lang, r.rank): (r.token, r.n) for r in rows}
    assert got[("en", 1)] == ("a", 4)  # a==b==4; tie broken lexicographically
    assert got[("en", 2)] == ("b", 4)
    assert got[("de", 1)] == ("x", 1)
    assert len(rows) == 4

def test_text_stats_rollup_subtotals(docs):
    rows = T.text_stats_rollup(docs).collect()
    total = [r for r in rows if r.lang is None and r.source is None]
    assert len(total) == 1 and total[0].n_docs == docs.count()
    per_lang = {r.lang: r.n_docs for r in rows if r.lang is not None and r.source is None}
    leaf = {}
    for r in rows:
        if r.lang is not None and r.source is not None:
            leaf[r.lang] = leaf.get(r.lang, 0) + r.n_docs
    assert per_lang == leaf


def test_corpus_sample_deterministic_and_content_keyed(docs):
    from tiny_md_hbase_spark.operators import text as TX

    a = sorted(r.doc_id for r in TX.corpus_sample(docs).collect())
    b = sorted(r.doc_id for r in TX.corpus_sample(docs.repartition(7)).collect())
    assert a == b  # stable under repartitioning (content-hash decision)
    full = {r.doc_id: r.fingerprint for r in TX.doc_fingerprint(docs).collect()}
    assert a == sorted(d for d, fp in full.items() if fp % TX.SAMPLE_MOD == 0)


def test_pack_tokens_conserves_and_bounds(docs):
    from pyspark.sql import functions as F

    from tiny_md_hbase_spark.operators import text as TX

    budget = 64
    packed = TX.pack_tokens(docs, budget=budget, buckets=2)
    total = TX.token_count(docs).agg(F.sum("n_tokens")).collect()[0][0]
    assert packed.agg(F.sum("sum_tokens")).collect()[0][0] == total
    assert packed.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    # tape invariant: docs lie on a per-stream token tape cut every
    # `budget` tokens; chunk k's first doc starts at a tape offset in
    # [k*budget, (k+1)*budget) — i.e. the tokens of all earlier chunks
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", "bucket")
        .orderBy("chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = packed.withColumn(
        "start_off", F.coalesce(F.sum("sum_tokens").over(w), F.lit(0))
    )
    bad = offs.filter(
        (F.col("start_off") < F.col("chunk_id") * budget)
        | (F.col("start_off") >= (F.col("chunk_id") + 1) * budget)
    )
    assert bad.count() == 0


def test_decontaminate_hashed_matches_raw(spark, sf_dir):
    """The xxhash64-keyed production variant must emit exactly the raw-
    string variant's result (collisions are ~1e-8; none in the fixture),
    including on a planted leak."""
    from tiny_md_hbase_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % TX.DECON_EVAL_MOD == 0).limit(1).collect()[0]
    leaked_text = " ".join(ev.text.split()[:12])
    leak = spark.createDataFrame(
        [(900001, leaked_text, ev.lang, "leak", len(leaked_text))], docs.schema
    )
    corpus = docs.unionByName(leak)
    raw = {
        (r.train_doc_id, r.eval_doc_id): r.n_shared_grams
        for r in TX.decontaminate(corpus).collect()
    }
    hashed = {
        (r.train_doc_id, r.eval_doc_id): r.n_shared_grams
        for r in TX.decontaminate_hashed(corpus).collect()
    }
    assert hashed == raw
    assert hashed.get((900001, ev.doc_id)) == 5


def test_decontaminate_bloom_matches_exact(spark, sf_dir):
    """The Bloom-prefiltered large-eval-side path must emit exactly the
    raw variant's result — the exact verify join eliminates every Bloom
    false positive — including on a planted leak."""
    from tiny_md_hbase_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % TX.DECON_EVAL_MOD == 0).limit(1).collect()[0]
    leaked_text = " ".join(ev.text.split()[:12])
    leak = spark.createDataFrame(
        [(900001, leaked_text, ev.lang, "leak", len(leaked_text))], docs.schema
    )
    corpus = docs.unionByName(leak)
    raw = {
        (r.train_doc_id, r.eval_doc_id): r.n_shared_grams
        for r in TX.decontaminate(corpus).collect()
    }
    bloom = {
        (r.train_doc_id, r.eval_doc_id): r.n_shared_grams
        for r in TX.decontaminate_bloom(corpus).collect()
    }
    assert bloom == raw
    assert bloom.get((900001, ev.doc_id)) == 5


def test_decontaminate_bloom_tiny_filter_still_exact(spark, sf_dir):
    """Force a saturated bitset (1 bit/gram → heavy false-positive rate):
    the prefilter passes junk through, the verify join still removes all
    of it. Pins that correctness never depends on the FPP tuning."""
    from tiny_md_hbase_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    raw = sorted(
        (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
        for r in TX.decontaminate(docs).collect()
    )
    bloom = sorted(
        (r.train_doc_id, r.eval_doc_id, r.n_shared_grams)
        for r in TX.decontaminate_bloom(docs, bits_per_gram=1).collect()
    )
    assert bloom == raw


def test_dedup_ttl_renewal_and_boundary(spark):
    """Last-seen-renewal semantics on a hand-built arrival sequence,
    ttl=64: (a) a steady same-content drip at sub-horizon gaps is
    suppressed FOREVER after the first admit (each sighting renews the
    clock — a fixed-window-from-admit rule would re-admit at t=100);
    (b) gap exactly == ttl is suppressed (strict >); (c) gap ttl+1 is
    re-admitted; (d) distinct content is never suppressed."""
    from tiny_md_hbase_spark.operators import dedup as D

    rows = [
        # drip: same content at 0, 50, 100 — renewal keeps suppressing
        (1, "drip content", "en", "s", 12, 0),
        (2, "drip content", "en", "s", 12, 50),
        (3, "drip content", "en", "s", 12, 100),
        # boundary: gap == ttl suppressed, ttl+1 admitted
        (4, "edge content", "en", "s", 12, 0),
        (5, "edge content", "en", "s", 12, 64),
        (6, "edge content", "en", "s", 12, 129),
        # distinct content at a colliding tick
        (7, "other content", "en", "s", 13, 50),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long, arrival long"
    )
    got = sorted(r.doc_id for r in D.dedup_ttl(df, 64).collect())
    assert got == [1, 4, 6, 7]


def test_dedup_ttl_epoch_salt_equals_plain_lag(spark):
    """The r14 hot-key guard (tick-reduce + epoch-salt) is an exact
    re-plan of the global lag rule — pinned on a sequence built to
    stress every seam: predecessors straddling an epoch boundary at gap
    == ttl and ttl+1, an EMPTY intermediate epoch (the seed-routing
    argument's 'two epochs back is always past the horizon' case),
    same-tick floods where only the min-doc_id row may be admitted,
    negative ticks (floor — not truncation — epochs), and a hot key
    spanning many epochs."""
    from pyspark.sql import Window

    from tiny_md_hbase_spark.operators import dedup as D

    ttl = 10  # epoch length 11
    rows = []
    did = 0

    def add(text, arrival, k=1):
        nonlocal did
        for _ in range(k):
            did += 1
            rows.append((did, text, "en", "s", len(text), arrival))

    # epoch-boundary gaps: 10->20 (gap 10 == ttl, suppressed, crosses
    # the 11-boundary), 21->32 (gap 11 > ttl, re-admitted)
    add("edge a", 10)
    add("edge a", 20)
    add("edge b", 21)
    add("edge b", 32)
    # empty intermediate epoch: 5 -> 40 (epochs 0 -> 3, gap 35 > ttl)
    add("far apart", 5)
    add("far apart", 40)
    # same-tick flood: 7 copies at one tick, later copies at the next
    add("flood", 50, k=7)
    add("flood", 55, k=3)
    add("flood", 66, k=2)  # gap 11 > ttl: re-admit exactly one
    # negative ticks across the zero boundary
    add("neg", -25)
    add("neg", -14)  # gap 11 > ttl: re-admit
    add("neg", -3)   # gap 11 == ttl+1? (-3)-(-14)=11 > 10: re-admit
    # hot key across many epochs at sub-horizon gaps: admitted once
    for t in range(100, 200, 5):
        add("hot", t)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long, arrival long"
    )
    got = sorted(
        (r.doc_id, r.arrival) for r in D.dedup_ttl(df, ttl).collect()
    )
    w = Window.partitionBy("h").orderBy("arrival", "doc_id")
    ref = (
        df.withColumn("h", D._content_fp("text"))
        .withColumn("_prev", F.lag("arrival").over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("arrival") - F.col("_prev") > ttl)
        )
    )
    want = sorted((r.doc_id, r.arrival) for r in ref.collect())
    assert got == want
    # and the structural bound holds: no (h, epoch) group exceeds ttl+1
    reduced = (
        df.withColumn("h", D._content_fp("text"))
        .groupBy("h", F.col("arrival").alias("_arr"))
        .count()
    )
    mx = (
        reduced.groupBy("h", D._ttl_floor_epoch("_arr", ttl + 1).alias("_ep"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= ttl + 1


def test_dedup_ttl_salt_randomized_equivalence(spark):
    """Randomized adversary for the tick-reduce + epoch-salt re-plan:
    seeded random arrival multisets (heavy tick collisions, clustered
    bursts, wide gaps) across several ttl values INCLUDING the ttl=0
    (every epoch one tick wide) and ttl=1 boundaries — the guarded
    operator must equal the plain global-lag rule on every draw."""
    import random

    from pyspark.sql import Window

    from tiny_md_hbase_spark.operators import dedup as D

    rng = random.Random(20260816)
    for case in range(4):
        ttl = [0, 1, 7, 40][case]
        rows = []
        did = 0
        for content in range(6):
            n = rng.randrange(3, 40)
            t = 0
            for _ in range(n):
                # bursts (same tick), crawl gaps, occasional big jumps
                t += rng.choice([0, 0, 1, 2, ttl, ttl + 1, 3 * ttl + 5])
                did += 1
                rows.append(
                    (did, f"content {content}", "en", "s", 9, t)
                )
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long, arrival long"
        )
        got = sorted(
            (r.doc_id, r.arrival) for r in D.dedup_ttl(df, ttl).collect()
        )
        w = Window.partitionBy("h").orderBy("arrival", "doc_id")
        ref = (
            df.withColumn("h", D._content_fp("text"))
            .withColumn("_prev", F.lag("arrival").over(w))
            .filter(
                F.col("_prev").isNull()
                | (F.col("arrival") - F.col("_prev") > ttl)
            )
        )
        want = sorted((r.doc_id, r.arrival) for r in ref.collect())
        assert got == want, f"ttl={ttl} diverged"


def test_embedding_knn_ivf_portable_pipeline(embs):
    """Fixed-centroid IVF twin: deterministic, bounded candidate set, and
    widening the probe to every cluster recovers the exact top-k (IVF
    prunes, never re-ranks)."""
    got = S.embedding_knn_ivf_portable(embs, 1, 10, n_clusters=16, n_probe=4).collect()
    assert len(got) == 10
    assert 1 in {r.vec_id for r in got}  # query probes its own cluster
    sims = [r.cos_sim for r in got]
    assert sims == sorted(sims, reverse=True)
    again = S.embedding_knn_ivf_portable(embs, 1, 10, n_clusters=16, n_probe=4).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [(r.vec_id, r.cos_sim) for r in again]
    exact = {r.vec_id for r in S.embedding_knn(embs, 1, 10).collect()}
    full = {
        r.vec_id
        for r in S.embedding_knn_ivf_portable(
            embs, 1, 10, n_clusters=16, n_probe=16
        ).collect()
    }
    assert full == exact


def test_dedup_embedding_lsh_precision_and_planted_recall(spark, embs):
    """Every emitted pair is exactly verified (precision 1 vs the
    unblocked brute-force pair set); an identical planted vector shares
    every band with its source, so it is always recalled."""
    lsh_pairs = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in D.dedup_embedding_lsh(embs, threshold=0.35).collect()
    }
    assert lsh_pairs  # non-vacuous on the fixture
    # precision: each pair really is >= threshold with the exact cosine
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in embs.collect()}
    for (a, b), cs in lsh_pairs.items():
        va, vb = vecs[a], vecs[b]
        exact = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(round(exact, 6) - cs) < 1e-6
        assert exact >= 0.35
    # planted exact duplicate: hamming(sig, sig) = 0 -> collides in all bands
    r1 = embs.filter(F.col("vec_id") == 1).collect()[0]
    extra = spark.createDataFrame([(99002, r1.embedding, r1.label)], embs.schema)
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in D.dedup_embedding_lsh(
            embs.unionByName(extra), threshold=0.95
        ).collect()
    }
    assert got.get((1, 99002)) == 1.0


# --- mixture sampling / deterministic shuffle ------------------------------

def test_corpus_mix_deterministic_and_rebalancing(spark, sf_dir):
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = TX.corpus_mix(docs)
    ids = sorted(r.doc_id for r in kept.collect())
    # layout-independent: same decision after an arbitrary repartition
    ids2 = sorted(r.doc_id for r in TX.corpus_mix(docs.repartition(7)).collect())
    assert ids == ids2
    # realized per-lang rates track the ppm targets (binomial tolerance)
    tot = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in tot.items():
        ppm = TX.MIX_TARGETS_PPM.get(lang, TX.MIX_DEFAULT_PPM)
        exp = n * ppm / 1_000_000
        sd = (n * (ppm / 1_000_000) * (1 - ppm / 1_000_000)) ** 0.5
        assert abs(got.get(lang, 0) - exp) <= 4 * sd + 1, (lang, got.get(lang), exp)


def test_corpus_shuffle_is_a_permutation(spark, sf_dir):
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = TX.corpus_shuffle(docs, n_shards=8)
    rows = out.collect()
    # every document exactly once
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in docs.select("doc_id").collect())
    # dense 1..n positions per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # deterministic under repartitioning
    again = {(r.doc_id, r.shard, r.pos) for r in TX.corpus_shuffle(docs.repartition(5), n_shards=8).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_embedding_knn_ivf_missing_query_raises(embs):
    from tiny_md_hbase_spark.operators import similarity as SIM

    with pytest.raises(ValueError, match="not found"):
        SIM.embedding_knn_ivf_portable(embs, query_vec_id=-987654)


def test_decontaminate_fuzzy_catches_paraphrased_leak(spark, sf_dir):
    from tiny_md_hbase_spark.operators import dedup as DD
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0).orderBy("doc_id").limit(1).collect()[0]
    toks = ev.text.split()
    toks[len(toks) // 2] = "PARAPHRASED"  # one word edited => near-dup, not exact
    leak = spark.createDataFrame(
        [(900007, " ".join(toks), ev.lang, "leak", len(ev.text))], docs.schema
    )
    hits = {
        (r.train_doc_id, r.eval_doc_id): r.jaccard
        for r in DD.decontaminate_fuzzy(docs.unionByName(leak)).collect()
    }
    j = hits.get((900007, ev.doc_id))
    assert j is not None and 0.5 <= j < 1.0, hits


def test_corpus_budget_fills_each_language(spark, sf_dir):
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 800
    out = TX.corpus_budget(docs, budget=budget).collect()
    totals = docs.select(
        "lang", F.size(TX.tokens("text")).alias("n")
    ).groupBy("lang").agg(F.sum("n").alias("tot")).collect()
    corpus_tot = {r.lang: r.tot for r in totals}
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        filled = max(r.cum_tokens for r in rows)
        max_doc = max(r.n_tokens for r in rows)
        if corpus_tot[lang] >= budget:
            # fill-until-full: reaches the budget, overshoots < one doc
            assert budget <= filled < budget + max_doc, (lang, filled)
        else:
            assert filled == corpus_tot[lang]
        # boundary doc included exactly once: all kept docs started under budget
        assert all(r.cum_tokens - r.n_tokens < budget for r in rows)
    # deterministic under repartitioning
    again = {(r.doc_id, r.cum_tokens) for r in TX.corpus_budget(docs.repartition(9), budget=budget).collect()}
    assert again == {(r.doc_id, r.cum_tokens) for r in out}
    # sharding is an execution detail: n_shards must not change the result
    one_shard = {
        (r.doc_id, r.cum_tokens)
        for r in TX.corpus_budget(docs, budget=budget, n_shards=1).collect()
    }
    assert one_shard == {(r.doc_id, r.cum_tokens) for r in out}


def test_corpus_budget_null_text_counts_zero(spark, sf_dir):
    """A NULL-text document contributes 0 tokens (not size()'s -1
    sentinel, which would corrupt every downstream running sum) and is
    still eligible for selection, matching the oracle's COALESCE."""
    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    nulled = spark.createDataFrame(
        [(990001, None, "en", "synthetic", 0)], docs.schema
    )
    out = TX.corpus_budget(docs.unionByName(nulled), budget=10**9).collect()
    row = next(r for r in out if r.doc_id == 990001)
    assert row.n_tokens == 0
    # running sums stay consistent: cum is non-decreasing in (h-order)
    # and never negative
    assert all(r.cum_tokens >= r.n_tokens >= 0 for r in out)


# --- tfidf / keyword search ----------------------------------------------

def test_tfidf_planted_unique_term_tops_its_language(spark, docs):
    """A corpus-unique term (df=1, max idf) repeated often in one doc must
    out-score every organic term in that document's language."""
    txt = " ".join(["qqzzyy"] * 40)
    extra = spark.createDataFrame(
        [(100010, txt, "en", "planted", len(txt))], docs.schema
    )
    out = T.tfidf_top_terms(docs.unionByName(extra)).collect()
    en = [r for r in out if r.lang == "en"]
    assert len(en) == 10
    top = max(en, key=lambda r: r.tfidf)
    assert top.term == "qqzzyy" and top.df == 1 and top.tf == 40


def test_tfidf_rank_and_rounding_contract(docs):
    out = T.tfidf_top_terms(docs, k=5).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        assert len(rows) == 5
        # scores non-increasing in the (tfidf desc, term asc) rank order
        ordered = sorted(rows, key=lambda r: (-r.tfidf, r.term))
        assert [r.tfidf for r in ordered] == sorted(
            (r.tfidf for r in rows), reverse=True
        )
        assert all(r.tfidf == round(r.tfidf, 6) for r in rows)


def test_keyword_search_conjunctive_and_ranked(spark, docs):
    """A planted doc repeating every query term dominates the ranking; a
    doc missing one term is excluded no matter how often the others
    appear."""
    hit = " ".join(["vector stream merge"] * 50)
    miss = " ".join(["vector stream"] * 500)  # no 'merge': conjunctive fail
    extra = spark.createDataFrame(
        [
            (100020, hit, "en", "planted", len(hit)),
            (100021, miss, "en", "planted", len(miss)),
        ],
        docs.schema,
    )
    got = T.keyword_search(docs.unionByName(extra)).collect()
    assert got[0].doc_id == 100020 and got[0].score == 150
    assert all(r.doc_id != 100021 for r in got)


# --- bigram LM scoring ----------------------------------------------------

def test_lm_bigram_score_flags_atypical_doc(spark, docs):
    """A document whose bigrams never occur elsewhere in the corpus must
    score a higher nll (less typical) than every organic document; a
    one-token document has no bigrams and is omitted."""
    weird = "xqj kvw plf ztn gmb xqj kvw dlp"
    extra = spark.createDataFrame(
        [
            (100030, weird, "en", "planted", len(weird)),
            (100031, "solo", "en", "planted", 4),
        ],
        docs.schema,
    )
    out = {r.doc_id: r for r in T.lm_bigram_score(docs.unionByName(extra)).collect()}
    assert 100031 not in out  # no bigrams
    organic_max = max(r.nll for i, r in out.items() if i < 100000)
    assert out[100030].nll > organic_max
    assert out[100030].n_bigrams == 7


def test_lm_bigram_score_deterministic_under_repartition(docs):
    """The per-doc fold is position-ordered, so the score must be
    bit-identical regardless of input partitioning — the property the
    oracle hash-compare rests on."""
    a = {r.doc_id: r.nll for r in T.lm_bigram_score(docs).collect()}
    b = {
        r.doc_id: r.nll
        for r in T.lm_bigram_score(docs.repartition(13)).collect()
    }
    assert a == b


# --- random projection ----------------------------------------------------

def test_embedding_project_shape_and_determinism(embs):
    out = S.embedding_project(embs).collect()
    assert len(out) == embs.count()
    assert all(len(r.proj) == 16 for r in out)
    again = S.embedding_project(embs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_embedding_project_preserves_distances(embs):
    """The JL guarantee (the property projected-space candidate
    generation rests on): pairwise squared distances are preserved up to
    a distortion that SHRINKS as out_dim grows. The broken
    linear-in-the-index matrix measured ~0.8 mean relative error flat in
    out_dim; the avalanche-mixed, variance-corrected matrix must land
    near the 1/sqrt(out_dim) JL regime and improve when dims double.
    (Top-k recall is deliberately NOT asserted: the fixture's similarity
    gaps are smaller than any 16-d JL distortion.)"""
    import numpy as np

    rows = embs.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(vecs)[:60]

    def mean_err(out_dim):
        proj = {
            r.vec_id: np.array(r.proj, dtype=np.float64)
            for r in S.embedding_project(embs, out_dim=out_dim).collect()
        }
        errs = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                do = np.sum((vecs[ids[i]] - vecs[ids[j]]) ** 2)
                dp = np.sum((proj[ids[i]] - proj[ids[j]]) ** 2)
                errs.append(abs(dp - do) / do)
        return float(np.mean(errs))

    e16, e32 = mean_err(16), mean_err(32)
    assert e16 < 0.4, e16
    assert e32 < e16, (e16, e32)


def test_embedding_knn_projected_prune_rerank_contract(embs):
    """The prune→re-rank contract: every returned cos_sim is the EXACT
    full-vector similarity (re-rank is exact, only candidate generation
    is approximate), the query finds itself at rank 1, and widening the
    overfetch to the corpus size recovers the exact top-k (the prune
    never re-scores, it only drops)."""
    got = S.embedding_knn_projected(embs, 1, 10).collect()
    assert got[0].vec_id == 1 and got[0].cos_sim == 1.0
    exact_sims = {
        r.vec_id: r.cos_sim
        for r in S.embedding_knn(embs, 1, embs.count()).collect()
    }
    for r in got:
        assert r.cos_sim == exact_sims[r.vec_id]
    full = [
        (r.vec_id, r.cos_sim)
        for r in S.embedding_knn_projected(
            embs, 1, 10, overfetch=embs.count() // 10 + 1
        ).collect()
    ]
    exact = [(r.vec_id, r.cos_sim) for r in S.embedding_knn(embs, 1, 10).collect()]
    assert full == exact


def test_gopher_quality_rules_fire_individually(spark):
    """Each Gopher rule must fail for exactly the construction that
    violates it: too-short doc, all-numeric words, symbol spam, missing
    stopwords — and a clean passage passes all five."""
    good = (
        "the quick brown fox jumps over that lazy dog and keeps running "
        "with steady pace to be sure of the route and have time left "
        "the road bends east of town and that old bridge holds firm "
        "with traffic light and heavy to be fair about the crossing "
        "have patience and the journey ends well that is the point"
    )
    docs = spark.createDataFrame(
        [
            (1, good, "en", "s", 0),
            (2, "too short to pass", "en", "s", 0),
            (3, " ".join(["12345"] * 60), "en", "s", 0),
            (4, good + " " + "#" * 1 + " #### ### ## # # # #", "en", "s", 0),
            (5, " ".join(["lorem", "ipsum", "dolor", "sitam"] * 15), "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r.doc_id: r for r in T.gopher_quality(docs).collect()}
    assert out[1].passes
    assert not out[2].ok_word_count and not out[2].passes
    assert not out[3].ok_alpha_words and not out[3].passes
    assert not out[4].ok_symbol_ratio and not out[4].passes
    assert not out[5].ok_stopwords and not out[5].passes


def test_gopher_quality_empty_and_null_docs_survive_ansi(spark):
    """The session runs ANSI mode, where a bare /0 errors: a zero-token
    document must fail ok_word_count with NULL ratios (NULLIF
    denominator), a NULL-text document reports all-NULL metrics, and
    neither crashes nor NULL-drops its row (false AND NULL = false)."""
    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r.doc_id: r for r in T.gopher_quality(docs).collect()}
    assert out[1].n_words == 0 and out[1].mean_word_len is None
    assert out[1].ok_word_count is False and out[1].passes is False
    assert out[2].n_words is None and out[2].passes is None


def test_keyword_search_duplicate_terms_deduped(spark, docs):
    """Containment is set semantics: a duplicated query term must behave
    exactly like the deduped query on BOTH access paths (pre-fix, the
    scan form could never satisfy its ==len(terms) check and returned
    nothing while the oracle and the indexed form matched docs)."""
    dup = T.keyword_search(docs, terms=("vector", "vector", "merge"))
    ded = T.keyword_search(docs, terms=("vector", "merge"))
    assert [tuple(r) for r in dup.collect()] == [tuple(r) for r in ded.collect()]
    assert dup.count() > 0
    assert T.keyword_search_sql(("vector", "vector", "merge")) == T.keyword_search_sql(
        ("vector", "merge")
    )


def test_dedup_incremental_drops_seen_and_merges_in_batch(spark, docs):
    """Only-new-work dedup: content already in the corpus is dropped
    entirely (regardless of its new doc_id); within the batch the
    lowest doc_id per content survives with the right copy count; and
    genuinely new content passes through untouched."""
    base = docs.limit(0)
    old_rows = docs.orderBy("doc_id").limit(3).collect()
    corpus = spark.createDataFrame(old_rows, docs.schema)
    newb = spark.createDataFrame(
        [
            (5001, old_rows[0].text, "en", "s", old_rows[0].n_chars),  # seen
            (5002, "entirely new content here", "en", "s", 24),
            (5003, "entirely new content here", "en", "s", 24),  # in-batch dup
            (5004, "another brand new doc", "en", "s", 21),
        ],
        docs.schema,
    )
    del base
    got = {r.keep_id: r.n_copies for r in D.dedup_incremental(corpus, newb).collect()}
    assert got == {5002: 2, 5004: 1}


def test_corpus_split_stable_under_append_and_repartition(spark, docs):
    """The property randomSplit cannot give: a document's split never
    changes when the corpus is repartitioned or grown — and the split
    covers every doc exactly once with all three classes present at
    a permissive ppm."""
    base = {r.doc_id: r.split for r in T.corpus_split(docs).collect()}
    assert len(base) == docs.count()
    extra = spark.createDataFrame(
        [(999_999, "new doc text", "en", "s", 12)], docs.schema
    )
    grown = {
        r.doc_id: r.split
        for r in T.corpus_split(docs.unionByName(extra).repartition(7)).collect()
    }
    assert all(grown[k] == v for k, v in base.items())
    wide = {r.split for r in T.corpus_split(docs, ppm=(600_000, 200_000, 200_000)).collect()}
    assert wide == {"train", "validation", "test"}


# --- keep-best survivor selection -----------------------------------------

def test_dedup_keep_best_picks_longest_then_lowest_id(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50)], "doc_id long, n_chars long"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster_id long"
    )
    out = {
        r.cluster_id: r
        for r in D.dedup_keep_best(docs, clusters).collect()
    }
    assert out[1].keep_id == 2  # longest wins; n_chars tie breaks to min id
    assert out[1].keep_chars == 300 and out[1].n_members == 3
    assert out[4].keep_id == 4 and out[4].n_members == 1


# --- per-source frequency cap ---------------------------------------------

def test_source_cap_matches_single_window(docs):
    from pyspark.sql import Window

    cap = 10
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    naive = {
        (r.doc_id, r.source, r.n_chars, r.rank)
        for r in docs.select("doc_id", "source", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .collect()
    }
    two_phase = {
        (r.doc_id, r.source, r.n_chars, r.rank)
        for r in T.source_cap(docs, cap=cap).collect()
    }
    assert two_phase == naive
    per_source = (
        T.source_cap(docs, cap=cap).groupBy("source").count().collect()
    )
    assert all(r["count"] <= cap for r in per_source)


# --- centroid assignment ---------------------------------------------------

def test_centroid_assign_seeds_map_to_themselves(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.centroid_assign(emb, n_clusters=8)
    assert out.count() == emb.count()
    seeds = [r.vec_id for r in emb.orderBy("vec_id").limit(8).collect()]
    assigned = {r.vec_id: r for r in out.filter(F.col("vec_id").isin(seeds)).collect()}
    for sid in seeds:
        assert assigned[sid].cluster_id == sid
        assert assigned[sid].dist2 == 0.0
    # every vector lands on a real seed
    assert {
        r.cluster_id for r in out.select("cluster_id").distinct().collect()
    } <= set(seeds)


# --- corpus manifest -------------------------------------------------------

def test_corpus_manifest_order_independent_and_detects_corruption(spark, docs):
    base = {r.shard: r for r in T.corpus_manifest(docs).collect()}
    # additive checksum + dense aggregation: any partitioning yields the
    # identical manifest
    re_part = {r.shard: r for r in T.corpus_manifest(docs.repartition(7)).collect()}
    assert {k: tuple(v) for k, v in base.items()} == {
        k: tuple(v) for k, v in re_part.items()
    }
    # flip one document's text: exactly that document's shard changes
    # checksum, every other shard row is untouched
    victim = docs.orderBy("doc_id").first()
    corrupted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim.doc_id, F.concat("text", F.lit("x")))
        .otherwise(F.col("text")),
    )
    after = {r.shard: r for r in T.corpus_manifest(corrupted).collect()}
    changed = [s for s in base if tuple(base[s]) != tuple(after[s])]
    assert len(changed) == 1
    assert base[changed[0]].n_docs == after[changed[0]].n_docs
    assert base[changed[0]].checksum != after[changed[0]].checksum


# --- shard-hash robustness -------------------------------------------------

def test_shard_hash_survives_huge_ids_and_breaks_strides(spark):
    """Two latent 100 TB defects pinned: (1) the multiplicative hash
    must pre-reduce doc_id mod M so huge ids don't overflow BIGINT
    under ANSI mode; (2) shard ids must come from the hash's HIGH bits
    — the low bits are a no-op (the constant ≡ 1 mod 16), so a
    stride-16 id scheme would otherwise collapse into one shard."""
    huge = spark.createDataFrame(
        [(10**13 + i, "en") for i in range(8)], "doc_id long, lang string"
    )
    out = T.corpus_shuffle(huge).collect()  # must not raise under ANSI
    assert len(out) == 8
    # stride 2^20: zeroes the hash's low 20 bits — any shard derivation
    # below the top bits collapses to one shard here
    strided = spark.createDataFrame(
        [((1 << 20) * i, f"doc {i}", "en") for i in range(256)],
        "doc_id long, text string, lang string",
    )
    shards = {r.shard for r in T.corpus_shuffle(strided).collect()}
    # all ids ≡ 0 mod 16: a low-bits shard would put every row in shard 0
    assert len(shards) > 8
    m = {r.shard for r in T.corpus_manifest(strided).collect()}
    assert len(m) > 8


def test_mix_and_shard_hash_cross_engine_parity_negative_ids(spark):
    """DuckDB's % is sign-preserving, Spark's pmod is not: the SQL twins
    must use the ((x % M + M) % M) idiom or any negative doc_id hashes
    differently across engines. Pinned over a sign-mixed id set."""
    import duckdb

    from tiny_md_hbase_spark.operators.text import (
        _mix_hash,
        _mix_hash_sql,
        _shard_hash,
        _shard_hash_sql,
    )

    ids = [-(10**12) - 7, -5, -1, 0, 1, 5, 10**13 + 3]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.m, r.s)
        for r in df.select(
            "doc_id",
            _mix_hash(F.col("doc_id")).alias("m"),
            _shard_hash(F.col("doc_id")).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT doc_id, {_mix_hash_sql()} AS m, "
            f"{_shard_hash_sql()} AS s FROM t"
        ).fetchall()
    }
    assert got == want


def test_skew_safe_topk_equals_naive_window_randomized(spark):
    """Property check of the shared two-phase helper against the naive
    single-window rank on seeded pseudo-random data — including heavy
    duplication in the order column (rank ties) and a dominant group.
    Driven as a seeded loop, not hypothesis @given (each Spark plan
    costs seconds; see test_analytics.py for the same pattern)."""
    import random

    from pyspark.sql import Window

    for seed in (7, 99):
        rng = random.Random(seed)
        rows = [
            (
                i,
                f"g{rng.choice([0] * 6 + [1, 2])}",  # group 0 dominates
                rng.randrange(5),  # few distinct values -> many ties
            )
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "id long, grp string, val long")
        order = [F.col("val").desc(), F.col("id").asc()]
        naive = {
            (r.id, r.grp, r.rank)
            for r in df.withColumn(
                "rank",
                F.row_number().over(Window.partitionBy("grp").orderBy(*order)),
            )
            .filter(F.col("rank") <= 7)
            .collect()
        }
        two_phase = {
            (r.id, r.grp, r.rank)
            for r in T.skew_safe_topk(
                df, ["grp"], order, 7, F.pmod(F.xxhash64("id"), F.lit(8))
            ).collect()
        }
        assert two_phase == naive, seed


# --- BM25 keyword search --------------------------------------------------

def test_bm25_is_disjunctive_and_idf_weighted(spark):
    """Rare-term docs outrank common-term docs; any-term membership."""
    rows = [
        (1, "rare alpha beta"),            # has the rare term
        (2, "common alpha beta"),          # has the common term only
        (3, "common gamma delta"),
        (4, "common epsilon zeta"),
        (5, "alpha beta gamma"),           # has neither query term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = T.keyword_search_bm25(df, terms=("rare", "common"), k=10).collect()
    ids = [r.doc_id for r in got]
    assert 5 not in ids  # no query term -> excluded
    assert set(ids) == {1, 2, 3, 4}
    # df(rare)=1 < df(common)=3 -> idf(rare) > idf(common); equal tf and
    # equal doc length mean the rare-term doc must rank first
    assert ids[0] == 1
    assert all(got[i].bm25 >= got[i + 1].bm25 for i in range(len(got) - 1))


def test_bm25_length_normalization(spark):
    """Same tf: the shorter document scores higher (b > 0)."""
    rows = [
        (1, "term " + "pad " * 40),
        (2, "term pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in
           T.keyword_search_bm25(df, terms=("term",), k=10).collect()}
    assert got[2] > got[1] > 0


def test_bm25_saturates_with_k1(spark):
    """tf growth adds score but with diminishing returns (< linear)."""
    rows = [
        (1, "q pad pad pad pad pad pad pad"),
        (2, "q q pad pad pad pad pad pad"),
        (3, "q q q q pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in
           T.keyword_search_bm25(df, terms=("q",), k=10).collect()}
    assert got[3] > got[2] > got[1]
    assert (got[3] - got[2]) < (got[2] - got[1])  # saturation


# --- line-level boilerplate removal ---------------------------------------

def test_line_dedup_removes_shared_lines_keeps_order(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"unique one\n{boiler}\nunique two"),
        (2, f"{boiler}\nother content"),
        (3, "entirely original text"),
        (4, boiler),  # nothing but boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.line_dedup(df, min_docs=2).collect()}
    assert len(got) == 4  # every input doc comes back
    assert got[1].clean_text == "unique one\nunique two"
    assert (got[1].n_lines, got[1].n_kept) == (3, 2)
    assert got[2].clean_text == "other content"
    assert got[3].clean_text == "entirely original text"
    assert got[4].clean_text == "" and got[4].n_kept == 0


def test_line_dedup_threshold(spark):
    """min_docs=3: a line in only 2 docs survives."""
    rows = [(1, "shared\na"), (2, "shared\nb"), (3, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text
           for r in T.line_dedup(df, min_docs=3).collect()}
    assert got[1] == "shared\na" and got[2] == "shared\nb"


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    """A line repeated many times INSIDE one doc is not boilerplate."""
    rows = [(1, "echo\necho\necho"), (2, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text
           for r in T.line_dedup(df, min_docs=2).collect()}
    assert got[1] == "echo\necho\necho"


# --- exact duplicated-span removal ----------------------------------------

def test_span_dedup_removes_shared_span_everywhere(spark):
    """A 4-token run shared by two docs is cut from BOTH; surrounding
    unique tokens survive in order, and untouched docs come back
    verbatim."""
    shared = "alpha beta gamma delta"
    rows = [
        (1, f"intro words {shared} outro words"),
        (2, f"{shared} completely different tail"),
        (3, "entirely original text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.span_dedup(df, span_len=4, min_docs=2).collect()}
    assert got[1].clean_text == "intro words outro words"
    assert (got[1].n_tokens, got[1].n_kept) == (8, 4)
    assert got[2].clean_text == "completely different tail"
    assert got[3].clean_text == "entirely original text here"
    assert got[3].n_kept == got[3].n_tokens == 4


def test_span_dedup_cover_extends_over_overlapping_windows(spark):
    """Two docs sharing a run LONGER than span_len: every token of the
    run is covered by some duplicated window, so the whole run goes —
    not just the first span_len tokens."""
    run = "a b c d e f"  # 6 tokens, span_len=4 -> starts at 0,1,2
    rows = [(1, f"x {run} y"), (2, f"p q {run}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text
           for r in T.span_dedup(df, span_len=4, min_docs=2).collect()}
    assert got[1] == "x y"
    assert got[2] == "p q"


def test_span_dedup_within_doc_repeat_not_removed(spark):
    """Distinct-doc counting: a span repeated inside ONE doc survives."""
    rows = [(1, "w x y z w x y z"), (2, "other stuff entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.clean_text
           for r in T.span_dedup(df, span_len=4, min_docs=2).collect()}
    assert got[1] == "w x y z w x y z"


def test_span_dedup_short_and_empty_docs(spark):
    """Docs shorter than span_len contribute no spans and survive
    whole; empty/NULL text yields ('', 0, 0)."""
    rows = [(1, "tiny doc"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.span_dedup(df, span_len=4, min_docs=2).collect()}
    assert got[1].clean_text == "tiny doc" and got[1].n_kept == 2
    assert got[2].clean_text == "" and got[2].n_tokens == 0
    assert got[3].clean_text == "" and got[3].n_tokens == 0


def test_span_dedup_matches_python_reference(spark, sf_dir):
    """Independent O(n^2)-naive Python oracle over a small slice of the
    real fixture (exact duplicate docs included): identical survivor
    sets."""
    sample = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(60)
        .collect()
    )
    L, MIN = 5, 2
    # split on the product's explicit _WS class, NOT str.split(): Python's
    # split covers all Unicode whitespace (\xa0, \u2028, ...), so a
    # fixture doc containing one would make this reference diverge from
    # the operator spuriously (same reason test_bpe.py splits via _WS)
    toks = {r.doc_id: re.split(T._WS, r.text or "") for r in sample}
    toks = {k: [t for t in v if t] for k, v in toks.items()}
    gram_docs: dict[tuple, set] = {}
    for d, tv in toks.items():
        for p in range(len(tv) - L + 1):
            gram_docs.setdefault(tuple(tv[p : p + L]), set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= MIN}
    expect = {}
    for d, tv in toks.items():
        cov = [False] * len(tv)
        for p in range(len(tv) - L + 1):
            if tuple(tv[p : p + L]) in dup:
                for q in range(p, p + L):
                    cov[q] = True
        expect[d] = " ".join(t for t, c in zip(tv, cov) if not c)
    df = spark.createDataFrame(
        [(r.doc_id, r.text) for r in sample], "doc_id long, text string"
    )
    got = {r.doc_id: r.clean_text
           for r in T.span_dedup(df, span_len=L, min_docs=MIN).collect()}
    assert got == expect


def test_span_dedup_equals_python_reference_randomized(spark):
    """Property check on seeded pseudo-random corpora drawn from a TINY
    vocabulary — small vocab + short spans force dense span collisions,
    overlapping covers, and boundary cases (doc length == span_len,
    length < span_len) far beyond what the fixture exhibits. Driven as
    a seeded loop, not hypothesis @given (each Spark plan costs
    seconds; see test_skew_safe_topk_equals_naive_window_randomized)."""
    import random

    L, MIN = 3, 2
    vocab = ["a", "b", "c", "d"]
    for seed in (11, 42):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12))))
            for i in range(80)
        ]
        toks = {d: t.split() for d, t in rows}
        gram_docs: dict[tuple, set] = {}
        for d, tv in toks.items():
            for p in range(len(tv) - L + 1):
                gram_docs.setdefault(tuple(tv[p : p + L]), set()).add(d)
        dup = {g for g, ds in gram_docs.items() if len(ds) >= MIN}
        expect = {}
        for d, tv in toks.items():
            cov = [False] * len(tv)
            for p in range(len(tv) - L + 1):
                if tuple(tv[p : p + L]) in dup:
                    for q in range(p, p + L):
                        cov[q] = True
            expect[d] = " ".join(t for t, c in zip(tv, cov) if not c)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.clean_text
               for r in T.span_dedup(df, span_len=L, min_docs=MIN).collect()}
        assert got == expect


def test_span_dedup_hashed_equals_md5_form(spark, sf_dir):
    """Cross-form equivalence: the production xxhash64-keyed span
    removal must produce row-for-row the md5-keyed form's output (the
    two differ only in span-key representation; divergence would mean a
    key collision or a windowing bug). Run on the real fixture (planted
    exact-duplicate groups → non-vacuous span hits) AND on a dense
    small-vocab corpus that forces overlapping covers."""
    import random

    docs = load_table(spark, sf_dir, "documents").limit(120).localCheckpoint()
    md5_rows = {tuple(r) for r in T.span_dedup(docs, span_len=5).collect()}
    hashed_rows = {tuple(r) for r in T.span_dedup_hashed(docs, span_len=5).collect()}
    assert md5_rows == hashed_rows and md5_rows
    rng = random.Random(3)
    dense = spark.createDataFrame(
        [
            (i, " ".join(rng.choice("abcd") for _ in range(rng.randrange(0, 12))))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    a = {tuple(r) for r in T.span_dedup(dense, span_len=3).collect()}
    b = {tuple(r) for r in T.span_dedup_hashed(dense, span_len=3).collect()}
    assert a == b


# --- int8 scalar-quantized ANN --------------------------------------------

def test_knn_quantized_recall_vs_exact(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in S.embedding_knn(embs, 1, 10).collect()]
    quant = [r.vec_id for r in S.embedding_knn_quantized(embs, 1, 10).collect()]
    # int8 keeps ~2 decimal digits of each coordinate: the query itself
    # must stay top-1 and recall@10 should be high on real fixtures
    assert quant[0] == exact[0] == 1
    assert len(set(exact) & set(quant)) >= 7


def test_knn_quantized_scores_are_exact_ints(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    rows = S.embedding_knn_quantized(embs, 1, 10).collect()
    dim = len(embs.first().embedding)
    assert all(isinstance(r.qscore, int) for r in rows)
    assert all(abs(r.qscore) <= 127 * 127 * dim for r in rows)
    # self-similarity bounds every other quantized dot product
    assert rows[0].qscore == max(r.qscore for r in rows)


# --- exact corpus-quantile quality gate -----------------------------------

def test_quality_gate_exact_count_and_top_ranked(docs):
    import math

    n = docs.count()
    got = T.quality_gate(docs, 0.3).collect()
    assert len(got) == math.ceil(n * 0.3)
    # every kept doc outranks every dropped doc under (quality, -doc_id)
    kept = {r.doc_id for r in got}
    ranked = sorted(
        ((r.quality, -r.doc_id, r.doc_id)
         for r in T.quality_score(docs).collect()),
        reverse=True,
    )
    want = {d for (_, _, d) in ranked[: len(got)]}
    assert kept == want


def test_quality_gate_tie_break_on_doc_id(spark):
    """All-equal scores: the boundary class IS the whole corpus; the
    gate must keep the smallest doc_ids."""
    rows = [(i, "alpha beta gamma delta five six") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in T.quality_gate(df, 0.5).collect())
    assert kept == [0, 1, 2, 3, 4]


def test_quality_gate_keeps_higher_scores_first(spark):
    """Two clearly separated score classes: the high class is kept
    outright, the low class supplies only the remainder."""
    hi = [(i, "the and of to in is that node graph edge") for i in range(4)]
    lo = [(100 + i, "#### #### ####") for i in range(6)]
    df = spark.createDataFrame(hi + lo, "doc_id long, text string")
    kept = sorted(r.doc_id for r in T.quality_gate(df, 0.5).collect())
    assert kept == [0, 1, 2, 3, 100]


# --- review-fix regressions: ANSI guards and argument contracts -----------

def test_quality_score_null_on_degenerate_docs(spark):
    """Empty / whitespace-only docs score NULL instead of aborting the
    job under Spark 4's default ANSI mode."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the and of to in is that words here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.quality for r in T.quality_score(df).collect()}
    assert got[1] is None and got[2] is None and got[3] is not None


def test_quality_gate_skips_degenerate_docs(spark):
    """The gate ranks only scoreable docs; k is a fraction of THOSE."""
    rows = [(1, ""), (2, "   ")] + [
        (10 + i, "the and of to in is that words here") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in T.quality_gate(df, 0.5).collect())
    assert kept == [10, 11]  # ceil(4 * 0.5) of the 4 scoreable docs


def test_bm25_rejects_empty_terms(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.keyword_search_bm25(df, terms=())
    with pytest.raises(ValueError):
        T.keyword_search(df, terms=())


def test_quantize_zero_corpus_scores_zero(spark):
    """All-zero embeddings quantize to 0 (no ANSI divide-by-zero)."""
    z = spark.createDataFrame(
        [(i, [0.0] * 8, "z") for i in range(5)],
        "vec_id long, embedding array<double>, label string",
    )
    rows = S.embedding_knn_quantized(z, 1, 3).collect()
    assert len(rows) == 3 and all(r.qscore == 0 for r in rows)


# --- per-dimension embedding profile --------------------------------------

def test_embedding_profile_shape_and_invariance(spark, sf_dir):
    """One row per dimension; decimal-exact sums make the statistics
    identical under any repartitioning (the float-agg determinism
    contract)."""
    embs = load_table(spark, sf_dir, "embeddings")
    a = sorted(tuple(r) for r in S.embedding_profile(embs).collect())
    assert len(a) == 64
    dims = [r[0] for r in a]
    assert dims == list(range(64))
    for (_, n, mean, std, mn, mx) in a:
        assert n == embs.count()
        assert mn <= mean <= mx and std >= 0
    b = sorted(
        tuple(r) for r in S.embedding_profile(embs.repartition(13)).collect()
    )
    assert a == b


# --- seeded property tests for the session's operators --------------------

def test_line_dedup_matches_python_reference(spark):
    """Random corpora from a small line pool vs an exact in-Python
    reference. Seeded loop, not @given — each Spark plan costs seconds."""
    import random

    pool = [f"line {i}" for i in range(12)]
    for seed in (11, 42):
        rng = random.Random(seed)
        docs = [
            (i, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 6))))
            for i in range(30)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        # reference: lines present in >= 2 distinct docs are boilerplate
        from collections import defaultdict

        docs_per_line = defaultdict(set)
        for did, text in docs:
            for ln in text.split("\n"):
                docs_per_line[ln].add(did)
        boiler = {ln for ln, ds in docs_per_line.items() if len(ds) >= 2}
        want = {}
        for did, text in docs:
            kept = [ln for ln in text.split("\n") if ln not in boiler]
            want[did] = (
                "\n".join(kept),
                len(text.split("\n")),
                len(kept),
            )
        got = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
            for r in T.line_dedup(df, min_docs=2).collect()
        }
        assert got == want, seed


def test_bm25_matches_python_reference(spark):
    """Random corpora vs an in-Python Okapi BM25 with the identical
    formula; scores compared at the round(6) contract."""
    import math
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "query", "rare"]
    for seed in (5, 77):
        rng = random.Random(seed)
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 12))))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        terms = ("query", "rare")
        got = {
            r.doc_id: r.bm25
            for r in T.keyword_search_bm25(df, terms=terms, k=100).collect()
        }
        # reference
        qs = sorted(set(terms))
        n = float(len(docs))
        toks = {d: t.split() for d, t in docs}
        avgdl = sum(len(t) for t in toks.values()) / n
        dfreq = {q: float(sum(q in t for t in toks.values())) for q in qs}
        want = {}
        for d, t in toks.items():
            if not any(q in t for q in qs):
                continue
            s = 0.0
            for q in qs:
                tf = float(t.count(q))
                idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
                s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
            want[d] = s
        assert set(got) == set(want), seed
        for d in want:
            assert abs(got[d] - want[d]) < 2e-6, (seed, d, got[d], want[d])


def test_quality_gate_matches_naive_ranking_random(spark, sf_dir):
    """Random doc subsets (heavy tie mass included) vs the naive
    full-ranking definition computed in the same session."""
    import math
    import random

    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "documents")
    for seed, frac in ((3, 0.25), (9, 0.6)):
        rng = random.Random(seed)
        ids = [r.doc_id for r in base.select("doc_id").collect()]
        pick = set(rng.sample(ids, 120))
        df = base.filter(F.col("doc_id").isin(pick))
        got = sorted(r.doc_id for r in T.quality_gate(df, frac).collect())
        scored = T.quality_score(df).filter(F.col("quality").isNotNull())
        k = math.ceil(scored.count() * frac)
        w = Window.orderBy(F.col("quality").desc(), "doc_id")
        want = sorted(
            r.doc_id
            for r in scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        )
        assert got == want, (seed, frac)


def test_source_overlap_planted_and_within_source_excluded(spark):
    """Planted 5-gram shared across src_a/src_b counts once per pair;
    a gram repeated WITHIN one source (two docs, same source) must not
    create a pair; short docs contribute nothing."""
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"{shared} one two", "src_a"),
        (2, f"zero {shared}", "src_b"),
        (3, f"{shared} again here", "src_a"),   # same source dup: no pair
        (4, "tiny", "src_c"),
        (5, "unrelated words entirely different content", "src_c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = [
        (r.source_a, r.source_b, r.n_shared)
        for r in T.source_overlap(df, gram_len=5).collect()
    ]
    assert got == [("src_a", "src_b", 1)]


def test_source_overlap_matches_python_reference(spark, sf_dir):
    """Independent Python recomputation on a fixture slice."""
    sample = (
        load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(100).collect()
    )
    L = 6
    by_src: dict[str, set] = {}
    for r in sample:
        toks = [t for t in re.split(T._WS, r.text or "") if t]
        for p in range(len(toks) - L + 1):
            by_src.setdefault(r.source, set()).add(tuple(toks[p : p + L]))
    want = {}
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = len(by_src[a] & by_src[b])
            if n:
                want[(a, b)] = n
    df = spark.createDataFrame(
        [(r.doc_id, r.text, r.source) for r in sample],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in T.source_overlap(df, gram_len=L, k=1000).collect()
    }
    assert got == want and want


# ---- edit-distance dedup -------------------------------------------------


def _lev(a: str, b: str) -> int:
    # classic DP reference, O(len(a)*len(b)) — fixture texts are small
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_dedup_edit_matches_python_reference(spark, sf_dir):
    """Full output pinned against a driver-side recomputation: 5-gram
    blocked candidates (same _WS tokenization) verified by a classic
    DP levenshtein."""
    import re

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    grams = {}
    texts = {}
    for r in rows:
        t = [x for x in re.split(T._WS, r.text or "") if x != ""]
        grams[r.doc_id] = {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}
        texts[r.doc_id] = r.text or ""
    ids = sorted(grams)
    want = sorted(
        (d, a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if grams[a] & grams[b]
        and (d := _lev(texts[a], texts[b])) <= 30
    )[:500]
    want = [(a, b, d) for d, a, b in want]
    got = [
        (r.doc_a, r.doc_b, r.dist) for r in D.dedup_edit(docs).collect()
    ]
    assert got == want
    assert got, "fixture should contain at least one near-dup pair"


def test_dedup_edit_rejects_blocked_but_distant_candidates(spark):
    """Sharing a 5-token window generates the candidate; the
    levenshtein gate must still reject distant texts, keep near ones,
    and report the exact distance."""
    common = "alpha beta gamma delta epsilon"
    far = common + " " + " ".join(f"tail{i}" for i in range(40))
    near = common + " zeta etaX"
    base = common + " zeta eta"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, "unrelated words only here")],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r.dist for r in D.dedup_edit(df).collect()}
    assert (1, 2) in got and got[(1, 2)] == _lev(base, near)
    assert all(3 not in pair and 4 not in pair for pair in got)


# ---- hybrid retrieval (RRF) ----------------------------------------------


def test_hybrid_search_rrf_matches_fusion_of_sub_rankings(spark, sf_dir):
    """The fused output must equal the integer RRF recurrence applied
    to the two (independently oracle-checked) sub-rankings."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm = T.keyword_search_bm25(docs, k=50).collect()
    kn = S.embedding_knn(emb, 1, 50).collect()
    scores: dict[int, int] = {}
    lists: dict[int, int] = {}
    for ranking, idcol in ((bm, "doc_id"), (kn, "vec_id")):
        for r, row in enumerate(ranking, 1):
            did = getattr(row, idcol)
            scores[did] = scores.get(did, 0) + 10**9 // (60 + r)
            lists[did] = lists.get(did, 0) + 1
    want = sorted(((-s, d) for d, s in scores.items()))[:10]
    want = [(d, -negs, lists[d]) for negs, d in want]
    got = [
        (r.doc_id, r.rrf_micro, r.n_lists)
        for r in S.hybrid_search_rrf(docs, emb).collect()
    ]
    assert got == want
    assert got, "fixture should produce hybrid hits"


def test_hybrid_search_rrf_rewards_presence_in_both_lists(spark):
    """Synthetic corpus where doc 1 is top of BOTH retrievers and doc
    2/3 each top exactly one: doc 1 must fuse strictly first, and
    n_lists must say who came from where."""
    docs = spark.createDataFrame(
        [
            (1, "vector stream merge vector stream merge"),
            (2, "vector vector vector stream stream merge merge"),
            (3, "nothing relevant here at all"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (3, [0.9, 0.1], 0),
            (2, [-1.0, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = S.hybrid_search_rrf(docs, emb, query_vec_id=1, n=2, k=10).collect()
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_lists == 2
    assert got[0].doc_id == 1  # in both lists => strictly top
    assert by_id[2].n_lists == 1 and by_id[3].n_lists == 1


# ---- vocabulary growth ---------------------------------------------------


def test_vocab_growth_matches_python_reference(spark, sf_dir):
    import re as _re

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        (r.doc_id, r.text or "") for r in docs.select("doc_id", "text").collect()
    )
    first: dict[str, int] = {}
    for did, text in rows:
        for tok in _re.split(T._WS, text):
            if tok and tok not in first:
                first[tok] = did
    from collections import Counter

    hist = Counter(d // 2 for d in first.values())
    want, cum = [], 0
    for b in sorted(hist):
        cum += hist[b]
        want.append((b, b * 2, hist[b], cum))
    got = [
        (r.bucket, r.start_doc_id, r.new_types, r.cum_types)
        for r in T.vocab_growth(docs, bucket_docs=2).collect()
    ]
    # sf0.001's 31-type vocab can saturate in bucket 0; the sf0.01
    # oracle run shows the multi-row curve — here we pin exact equality
    assert got == want and got


def test_vocab_growth_monotone_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = T.vocab_growth(docs, bucket_docs=2).collect()
    cums = [r.cum_types for r in out]
    assert cums == sorted(cums)
    total_types = (
        docs.select(F.explode(T.tokens(F.coalesce(F.col("text"), F.lit(""))))
                    .alias("t"))
        .distinct()
        .count()
    )
    assert cums[-1] == total_types
    assert sum(r.new_types for r in out) == total_types


# ---- exact stratified sampling -------------------------------------------


def test_corpus_stratified_exact_budget_and_hamilton_quotas(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = T.corpus_stratified(docs, budget=37).collect()
    assert len(out) == 37  # exact count, not a rate
    # quotas match a driver-side Hamilton allocation
    from collections import Counter

    strata = Counter(
        (r.lang, r.source)
        for r in docs.select("lang", "source").collect()
    )
    n_tot = sum(strata.values())
    base = {s: (n * 37) // n_tot for s, n in strata.items()}
    rems = {s: (n * 37) % n_tot for s, n in strata.items()}
    leftover = 37 - sum(base.values())
    for s in sorted(strata, key=lambda s: (-rems[s], s))[:leftover]:
        base[s] += 1
    got = Counter((r.lang, r.source) for r in out)
    assert dict(got) == {s: q for s, q in base.items() if q > 0}


def test_corpus_stratified_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in T.corpus_stratified(docs, budget=25).collect()]
    b = [
        tuple(r)
        for r in T.corpus_stratified(docs.repartition(13), budget=25).collect()
    ]
    assert a == b  # pick order is a pure function of the data


# ---- asymmetric containment ----------------------------------------------


def test_doc_containment_catches_embedded_doc_jaccard_misses(spark):
    """A short doc fully quoted inside a much larger one: containment
    fires at 9/10 while the pair's Jaccard is far below any dedup
    threshold — the asymmetric measure's whole reason to exist. The
    reverse direction (big inside small) must NOT fire."""
    quote = " ".join(f"q{i}" for i in range(20))
    big = quote + " " + " ".join(f"pad{i}" for i in range(400))
    df = spark.createDataFrame(
        [(1, quote), (2, big), (3, "wholly unrelated text here")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_shared, r.n_a)
        for r in D.doc_containment(df).collect()
    }
    assert (1, 2) in got
    n_shared, n_a = got[(1, 2)]
    assert n_shared == n_a == 13  # all 13 of the quote's 8-grams
    assert (2, 1) not in got  # asymmetric: big is not inside small
    assert all(3 not in p for p in got)


def test_gram_df_cap_bounds_boilerplate_fanout(spark):
    """A planted boilerplate window shared by EVERY doc must not reach
    the pair join once its df exceeds the cap: candidate fan-out stays
    bounded by the rare grams, and genuinely near-dup pairs (which share
    rare grams too) are still found. Without the cap the same corpus
    pairs quadratically."""
    boiler = " ".join(f"b{i}" for i in range(8))  # one shared 8-gram
    n = 40
    rows = [
        (i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(12)))
        for i in range(n)
    ]
    # docs 0/1: identical unique tails -> a true containment pair via
    # RARE grams (df=2), which must survive the cap
    rows[1] = (1, rows[0][1])
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.doc_containment(df, max_gram_df=2).collect()
    got = {(r.doc_a, r.doc_b) for r in capped}
    assert (0, 1) in got and (1, 0) in got
    # boilerplate-only collisions are gone: no pair involving docs >= 2
    assert all(a < 2 and b < 2 for a, b in got), got

    # uncapped, every doc pairs with every other through the boiler gram
    # (n_shared=1 vs n_a=13 -> below threshold, so containment OUTPUT is
    # identical — the cap bounds the intermediate, not the answer)
    uncapped = D.doc_containment(df, max_gram_df=None).collect()
    assert {(r.doc_a, r.doc_b) for r in uncapped} == got

    # same shape for dedup_edit: doc 0/1 identical (dist 0) found with a
    # cap that kills the boiler gram
    edits = D.dedup_edit(df, max_gram_df=2).collect()
    assert [(r.doc_a, r.doc_b, r.dist) for r in edits] == [(0, 1, 0)]


def test_doc_containment_matches_python_reference(spark, sf_dir):
    import re as _re

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    grams = {}
    for r in rows:
        t = [x for x in _re.split(T._WS, r.text or "") if x != ""]
        grams[r.doc_id] = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
    want = sorted(
        (a, b, len(grams[a] & grams[b]), len(grams[a]))
        for a in grams
        for b in grams
        if a != b
        and grams[a] & grams[b]
        and 10 * len(grams[a] & grams[b]) >= 9 * len(grams[a])
    )[:2000]
    got = [
        (r.doc_a, r.doc_b, r.n_shared, r.n_a)
        for r in D.doc_containment(docs).collect()
    ]
    assert got == want and got


# ---------------------------------------------------------------------------
# corpus_weighted_sample (DLT priority sampling)
# ---------------------------------------------------------------------------


def _ws_uniform(doc_id: int) -> int:
    p = 2_147_483_647
    return ((((doc_id % p) * 48271 + 11) % p) * 69621 + 7919) % p + 1


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "n_chars").filter("n_chars > 0").collect()
    p = 2_147_483_647.0
    pri = sorted(
        ((r.n_chars * p) / _ws_uniform(r.doc_id), -r.doc_id) for r in rows
    )[::-1]
    k = 50
    want_ids = [-d for _, d in pri[:k]]
    got = T.corpus_weighted_sample(docs, k=k).collect()
    assert [r.doc_id for r in got] == want_ids
    # DLT estimator: est = max(w, tau) with tau the (k+1)-th priority.
    # EXACT equality on the unrounded doubles: the Python reference runs
    # the same exact-int division, so all three engines (Python, Spark,
    # DuckDB) hold bit-identical values — no rounding tolerance needed.
    tau = pri[k][0] if len(pri) > k else 0.0
    for r in got:
        assert r.est == max(float(r.weight), tau)


def test_weighted_sample_deterministic_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = T.corpus_weighted_sample(docs, k=30).collect()
    b = T.corpus_weighted_sample(docs.repartition(13), k=30).collect()
    assert a == b


def test_weighted_sample_k_larger_than_corpus_keeps_all_with_zero_tau(spark):
    rows = [(i, f"s{i % 2}", 10 * (i + 1)) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = T.corpus_weighted_sample(docs, k=50).collect()
    assert len(got) == 5
    # tau = 0 when fewer than k+1 rows: est must equal the raw weight
    assert all(r.est == float(r.weight) for r in got)


def test_weighted_sample_favors_heavy_weights(spark):
    # one doc 10^6 times heavier than 999 light docs: it must be sampled
    rows = [(0, "s", 1_000_000)] + [(i, "s", 1) for i in range(1, 1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r.doc_id for r in T.corpus_weighted_sample(docs, k=10).collect()}
    assert 0 in got


def test_weighted_sample_plans_as_take_ordered(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        T.corpus_weighted_sample(docs, k=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# corpus_temperature (temperature-scaled source mixture)
# ---------------------------------------------------------------------------


def _skewed_docs(spark):
    rows = []
    did = 0
    for src, n in (("big", 900), ("mid", 90), ("tiny", 10)):
        for _ in range(n):
            rows.append((did, src))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_corpus_temperature_quotas_sum_to_budget(spark):
    out = T.corpus_temperature(_skewed_docs(spark), budget=137).collect()
    assert sum(r.quota for r in out) == 137


def test_corpus_temperature_upsamples_the_tail(spark):
    # at T=2 the sampling RATE must be strictly decreasing in source
    # size: the tail is upsampled relative to proportional
    out = {r.source: r for r in T.corpus_temperature(_skewed_docs(spark), budget=300).collect()}
    assert out["tiny"].rate > out["mid"].rate > out["big"].rate
    # and weights are sqrt(n)
    assert out["big"].weight == 30.0 and out["tiny"].weight == round(10 ** 0.5, 9)


def test_corpus_temperature_t1_is_proportional(spark):
    # T=1: pow(n, 1.0) == n exactly, so quotas are the Hamilton split of
    # raw counts — 900/90/10 of budget 1000 splits exactly proportionally
    out = {r.source: r.quota for r in T.corpus_temperature(_skewed_docs(spark), budget=1000, temperature=1.0).collect()}
    assert out == {"big": 900, "mid": 90, "tiny": 10}


def test_corpus_temperature_rejects_bad_params(spark):
    import pytest

    with pytest.raises(ValueError, match="budget"):
        T.corpus_temperature(_skewed_docs(spark), budget=0)
    with pytest.raises(ValueError, match="temperature"):
        T.corpus_temperature(_skewed_docs(spark), temperature=0.0)


def test_corpus_temperature_deterministic_under_repartition(spark):
    d = _skewed_docs(spark)
    a = T.corpus_temperature(d, budget=97).collect()
    b = T.corpus_temperature(d.repartition(7), budget=97).collect()
    assert a == b


def test_corpus_temperature_sample_executes_the_spec(spark):
    d = _skewed_docs(spark).withColumn(
        "text", F.concat(F.lit("doc text nr "), F.col("doc_id").cast("string"))
    )
    spec = {r.source: r.quota for r in T.corpus_temperature(d, budget=250).collect()}
    got = T.corpus_temperature_sample(d, budget=250).collect()
    assert len(got) == 250  # exactly the budget, repetition included
    from collections import Counter

    by_src = Counter(r.source for r in got)
    assert dict(by_src) == {k: v for k, v in spec.items() if v > 0}
    # the tiny source's quota (18) exceeds its 10 docs: epoch-1 rows
    # exist and repetition is cyclic (a doc repeats at most once more
    # than any other)
    tiny = [r for r in got if r.source == "tiny"]
    assert any(r.epoch == 1 for r in tiny)
    per_doc = Counter(r.doc_id for r in tiny)
    assert max(per_doc.values()) - min(per_doc.values()) <= 1
    # a quota <= n source stays epoch-0 only
    assert all(r.epoch == 0 for r in got if r.source == "big")


def test_phrase_search_semantics(spark):
    """Phrase semantics on hand-built docs: adjacency (conjunctive
    containment is NOT enough), order sensitivity, OVERLAPPING
    occurrences each counting, short-doc safety, and the repeated-term
    phrase."""
    from tiny_md_hbase_spark.operators import text as TX

    rows = [
        (1, "alpha beta gamma", "en", "s", 16),        # exact once
        (2, "alpha gamma beta", "en", "s", 16),        # terms present, wrong order
        (3, "alpha beta gamma alpha beta gamma", "en", "s", 33),  # twice
        (4, "alpha beta", "en", "s", 10),               # shorter than phrase
        (5, "x alpha beta gamma y", "en", "s", 20),    # embedded once
        (6, "", "en", "s", 0),                          # empty
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.doc_id: r.n_hits for r in TX.phrase_search(df, ("alpha", "beta", "gamma")).collect()}
    assert got == {3: 2, 1: 1, 5: 1}
    # overlapping occurrences: 'a a a' contains 'a a' twice
    ov = spark.createDataFrame(
        [(7, "a a a", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    o = {r.doc_id: r.n_hits for r in TX.phrase_search(ov, ("a", "a")).collect()}
    assert o == {7: 2}


def test_phrase_search_indexed_equals_scan(spark, sf_dir):
    """The positional-index probe returns exactly the scan form's rows
    (default phrase and a repeated-term phrase), and its plan prunes to
    the query terms' bucket partitions with the term pushed down."""
    import re
    import shutil
    import tempfile

    from tiny_md_hbase_spark.operators import text as TX
    from tiny_md_hbase_spark.plans.inspect import explain_str
    from tiny_md_hbase_spark.sources.writer import (
        phrase_search_positional,
        write_positional_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="pidx_t_")
    try:
        write_positional_index(docs, f"{d}/idx")
        for phrase in (None, ("table", "table")):
            want = [
                (r.doc_id, r.n_hits)
                for r in (
                    TX.phrase_search(docs)
                    if phrase is None
                    else TX.phrase_search(docs, phrase)
                ).collect()
            ]
            got = [
                (r.doc_id, r.n_hits)
                for r in phrase_search_positional(
                    spark, f"{d}/idx", phrase
                ).collect()
            ]
            assert got == want
        plan = explain_str(phrase_search_positional(spark, f"{d}/idx"))
        pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and all("bucket" in p and "IN" in p for p in pf), plan
        assert "In(term," in plan or "In(term ," in plan, plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_collocations_association_beats_frequency(spark):
    """A planted pair whose parts NEVER occur apart must out-rank a more
    frequent pair of independently common words (association vs raw
    frequency — BPE pair counts would rank them the other way);
    hapax pairs are excluded by the min-count guard; the score is an
    exact integer in both engines' semantics (truncating division on
    positive values)."""
    from tiny_md_hbase_spark.operators import text as TX

    filler = "the data the table the data the table the stream"
    rows = []
    for i in range(40):
        txt = filler
        if i % 4 == 0:
            txt += " hong kong"            # exclusive pair, 10 occurrences
        if i == 0:
            txt += " unique hapax"         # 1 occurrence: guarded away
        rows.append((i, txt, "en", "s", len(txt)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = TX.collocations(docs, k=10, min_count=2).collect()
    ranked = [(r.term_a, r.term_b) for r in out]
    assert ranked[0] == ("hong", "kong")
    assert ("unique", "hapax") not in ranked
    # 'the data' is far more frequent but its parts are everywhere: it
    # must rank below the exclusive pair
    top = {(r.term_a, r.term_b): r.lift_score for r in out}
    assert top[("hong", "kong")] > top.get(("the", "data"), 0)
    # deterministic across runs
    again = [(r.term_a, r.term_b, r.lift_score)
             for r in TX.collocations(docs, k=10, min_count=2).collect()]
    assert again == [(r.term_a, r.term_b, r.lift_score) for r in out]


def test_dedup_ttl_huge_ticks_exact_epochs(spark):
    """Regression for the 2^53 epoch mis-binning: at nanosecond-epoch
    tick magnitudes (~1.6e18) a double-division epoch jumped by the
    double's ulp, splitting a within-horizon predecessor out of seed
    range and re-admitting a duplicate. The decimal-exact floor must
    suppress it and agree with the plain lag rule at full long
    magnitudes (positive and negative)."""
    from pyspark.sql import Window

    from tiny_md_hbase_spark.operators import dedup as D

    ttl = 63
    base = 1_600_000_000_000_000_192  # > 2^53, near a double ulp seam
    rows = [
        (1, "huge tick content", "en", "s", 17, base),
        (2, "huge tick content", "en", "s", 17, base + 20),   # gap 20: suppress
        (3, "huge tick content", "en", "s", 17, base + 100),  # gap 80: admit
        (4, "neg huge", "en", "s", 8, -base),
        (5, "neg huge", "en", "s", 8, -base + 30),            # gap 30: suppress
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long, arrival long"
    )
    got = sorted(r.doc_id for r in D.dedup_ttl(df, ttl).collect())
    assert got == [1, 3, 4]
    w = Window.partitionBy("h").orderBy("arrival", "doc_id")
    ref = (
        df.withColumn("h", D._content_fp("text"))
        .withColumn("_prev", F.lag("arrival").over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("arrival") - F.col("_prev") > ttl)
        )
    )
    assert sorted(r.doc_id for r in ref.collect()) == got
    # the epoch column itself is exact at these magnitudes
    eps = (
        df.select(D._ttl_floor_epoch("arrival", ttl + 1).alias("e"), "arrival")
        .collect()
    )
    for r in eps:
        assert r.e == r.arrival // (ttl + 1), (r.arrival, r.e)


def test_shingle_hashes_partitions_like_string_shingles(spark):
    """The token-hash shingle form (shingle_hashes — the internal key of
    ngram_jaccard and the hashed/Bloom decontaminate twins) must induce
    the SAME equalities as the gram-string form: per-doc distinct counts
    match shingles(), and cross-doc hash-set intersections match the
    gram-string intersections, over the tricky shapes (empty/NULL text,
    short docs, duplicate grams, unicode, whitespace variants)."""
    texts = [
        "",
        None,
        "one",
        "one two",
        "one two three",
        "one two three four five six",
        "one two three one two three one two three",
        "  leading and   multiple   spaces\ttabs\nnewlines  ",
        "naïve café naïve café naïve café naïve",
        "a b a b a b a b a b",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (3, 8):
        rows = (
            df.select(
                "doc_id",
                D.shingles(F.coalesce(F.col("text"), F.lit("")), n).alias("s"),
                D.shingle_hashes(
                    F.coalesce(F.col("text"), F.lit("")), n
                ).alias("h"),
            )
            .orderBy("doc_id")
            .collect()
        )
        for r in rows:
            assert len(r.h) == len(set(r.h)) == len(r.s), (n, r.doc_id)
        # cross-doc: hash-set intersections == gram-string intersections
        for ra in rows:
            for rb in rows:
                want = len(set(ra.s) & set(rb.s))
                got = len(set(ra.h) & set(rb.h))
                assert got == want, (n, ra.doc_id, rb.doc_id, want, got)
