"""Embedding similarity search: exact cosine top-k (baseline) and
random-hyperplane LSH bucketing (the approximate scale path).

No reference counterpart (SURVEY.md §2.5) — north-star operators for
training-data pipelines. All vector math is native array expressions
(``zip_with`` dot products, ``aggregate`` sums) over double-cast vectors,
evaluated element-sequentially — deterministic and identical to the
DuckDB oracle's evaluation order. No UDFs.

Scale design:
- brute-force top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject:
  per-partition bounded heaps, driver merges k rows per partition. One
  scan, no shuffle of the data itself. Exact, embarrassingly parallel —
  the right baseline even at 10^9 vectors when k is small.
- LSH variant: assign each vector to a signature bucket once (one pass),
  then probe only the query's bucket (and optionally neighboring
  signatures). The bucket assignment is a plain column — it partitions,
  prunes, and joins like any key. Recall/probe tradeoff is tunable with
  ``planes``/``probe_hamming``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine",
    "embedding_knn",
    "lsh_signature",
    "embedding_knn_lsh",
    "embedding_knn_ivf",
    "embedding_knn_ivf_portable",
    "assign_fixed_clusters",
    "probe_order",
    "embedding_knn_ivf_portable_sql",
    "embedding_project",
    "embedding_project_sql",
    "embedding_project_rows",
    "embedding_project_rows_sql",
    "embedding_knn_projected",
    "embedding_knn_projected_sql",
    "centroid_assign",
    "centroid_assign_sql",
    "embedding_knn_quantized",
    "embedding_knn_quantized_sql",
    "embedding_profile",
    "embedding_profile_sql",
    "hybrid_search_rrf",
    "hybrid_search_rrf_sql",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def sql_lit(arr: list[float]) -> str:
    """A float list as a DuckDB array literal — repr() so both engines
    consume the exact same doubles (the cross-engine fold contract)."""
    return "[" + ", ".join(repr(c) for c in arr) + "]"


def sql_dot(a: str, b: str) -> str:
    """The DuckDB dot-product expression matching the Spark
    zip_with/aggregate fold: list_sum folds left-to-right over the
    element products. Every oracle twin in this repo must build its dot
    from THIS helper so a change to the fold/rounding contract lands in
    one place."""
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def sql_norm(v: str) -> str:
    """DuckDB twin of :func:`_norm` (sqrt of the self-dot fold)."""
    return f"sqrt(list_sum(list_transform({v}, x -> x * x)))"


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine`."""
    return f"{sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)})"


def sql_d2(a: str, b: str) -> str:
    """DuckDB squared-euclidean fold matching the Spark assignment
    expression."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def validate_vectors(
    df: DataFrame,
    dim: int | None = None,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Loud input validation for the embedding operators: replace
    ``col`` with a guarded projection that raises a clear,
    row-identifying error for a NULL (or, when ``dim`` is given,
    wrong-length) vector. Without the guard a NULL embedding surfaces
    minutes into an Arrow kernel as numpy's opaque "inhomogeneous
    shape" ValueError inside a task retry loop — at 100 TB that is a
    long job lost with no actionable row pointer. The guard is a
    codegen'd ``when`` evaluated at the scan projection: zero cost on
    valid rows, and it fails on the FIRST bad row with its id. SQL
    twins carry no guard — the oracle contract (FIXTURES.md) is valid
    input, and this guard is exactly what enforces that contract on
    the Spark side."""
    c = F.col(col)
    bad = c.isNull() if dim is None else (c.isNull() | (F.size(c) != dim))
    detail = F.when(c.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("length "), F.size(c).cast("string"))
    )
    want = "a non-NULL array" if dim is None else f"a non-NULL array of length {dim}"
    msg = F.concat(
        F.lit(f"invalid vector in column '{col}' at {id_col}="),
        F.col(id_col).cast("string"),
        F.lit(f": expected {want}, got "),
        detail,
    )
    return df.withColumn(col, F.when(bad, F.raise_error(msg)).otherwise(c))



def embedding_knn(
    embeddings: DataFrame, query_vec_id: int = 1, k: int = 10
) -> DataFrame:
    """Exact cosine top-k against the vector with ``vec_id=query_vec_id``
    (FIXTURES.md pinned parameters). The 1-row query side is broadcast;
    ordering is (rounded sim desc, vec_id) for a deterministic k-boundary
    across engines."""
    embeddings = validate_vectors(embeddings)
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    sim = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def _maxabs_scale(e: DataFrame) -> DataFrame:
    """1-row corpus max-abs scale over a relation with ``v:
    array<double>`` — the single source for the quantization scale, so
    the scan form and the materialized layout can never quantize under
    different aggregates."""
    return e.agg(
        F.max(F.array_max(F.transform("v", lambda x: F.abs(x)))).alias("mx")
    )


def _quantize(v: Column, mx: Column) -> Column:
    """Symmetric int8 scalar quantization of an array<double> column
    under the corpus-wide max-abs scale ``mx``: round(x * 127 / mx)
    clipped to [-127, 127], kept as BIGINT for exact integer dot
    products. The clip-then-cast runs on an integral double, so the
    result is exact in any engine. ``mx = 0`` (all-zero corpus)
    quantizes to 0 instead of dividing by zero — under Spark 4's
    default ANSI mode an unguarded x/0 would abort the job."""
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(
                F.lit(127.0),
                F.when(
                    mx != F.lit(0.0), F.round(x * F.lit(127.0) / mx, 0)
                ).otherwise(F.lit(0.0)),
            ),
        ).cast("long"),
    )


def embedding_knn_quantized(
    embeddings: DataFrame, query_vec_id: int = 1, k: int = 10
) -> DataFrame:
    """Top-k by int8 scalar-quantized dot product — the
    memory-compression ANN path (4-8× smaller vectors than float32,
    the standard first step before IVF/HNSW at 10^9+ vectors). Both the
    corpus and the query are quantized under ONE corpus-wide max-abs
    scale, so the score is a pure BIGINT dot product: exact in integer
    arithmetic, hence bit-identical across engines — the returned
    ``qscore`` needs no rounding contract at all.

    100 TB shape: pass 1 is a map-side partial max aggregate (the
    scale); the 1-row scale and the quantized query broadcast; pass 2
    is scan → per-row integer fold → TakeOrderedAndProject. At scale
    the quantized corpus would be MATERIALIZED once (int8 column, 4×
    less I/O) and re-used per query — this operator is the semantics of
    that layout plus its query; `write_embeddings_clustered` shows the
    layout-materialization pattern.

    Ordering: (qscore desc, vec_id) — integer keys, deterministic
    k-boundary with no float ties possible."""
    embeddings = validate_vectors(embeddings)
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    scale = _maxabs_scale(e)
    q = (
        e.filter(F.col("vec_id") == query_vec_id)
        .crossJoin(F.broadcast(scale))
        .select(_quantize(F.col("v"), F.col("mx")).alias("qq"))
    )
    qd = _quantize(F.col("v"), F.col("mx"))
    qscore = F.aggregate(
        F.zip_with(qd, F.col("qq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        e.crossJoin(F.broadcast(scale))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", qscore.alias("qscore"))
        .orderBy(F.col("qscore").desc(), "vec_id")
        .limit(k)
    )


def embedding_knn_quantized_sql(query_vec_id: int = 1, k: int = 10) -> str:
    """DuckDB twin of :func:`embedding_knn_quantized` — the same
    quantize expression (round half-away-from-zero on an identical
    double, clip, BIGINT cast) and an integer list fold, so the scores
    match exactly with no rounding epsilon."""
    quant = (
        "list_transform({v}, x -> CAST(greatest(-127.0, "
        "least(127.0, CASE WHEN mx <> 0 THEN round(x * 127.0 / mx, 0) "
        "ELSE 0.0 END)) AS BIGINT))"
    )
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        "m AS (SELECT max(list_aggregate(list_transform(v, x -> abs(x)), "
        "'max')) AS mx FROM e), "
        "q AS (SELECT " + quant.format(v="v") + " AS qq FROM e, m "
        f"WHERE vec_id = {query_vec_id}), "
        "scored AS (SELECT vec_id, label, "
        "list_sum(list_transform(list_zip("
        + quant.format(v="v")
        + ", qq), p -> p[1] * p[2])) AS qscore FROM e, m, q) "
        "SELECT vec_id, label, CAST(qscore AS BIGINT) AS qscore FROM scored "
        f"ORDER BY qscore DESC, vec_id LIMIT {k}"
    )


def _knn_batch_score(
    embeddings: DataFrame, qrows: list, k: int
) -> DataFrame:
    """One broadcast-query scoring pass of :func:`embedding_knn_batch`:
    validate the collected query rows, broadcast the (Q, D) matrix, score
    every Arrow batch of corpus vectors with one numpy matmul, emit each
    task's local top-k per query, and rank the survivors globally."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    qids = [int(r.query_id) for r in qrows]
    if len(qids) != len(set(qids)):
        dup = sorted({q for q in qids if qids.count(q) > 1})[:3]
        raise ValueError(
            f"duplicate query_ids in embedding_knn_batch: {dup} — the "
            f"rank window partitions on query_id, so two rows sharing an "
            f"id would merge into one garbled top-k (and chunked "
            f"pagination could split them across chunks); deduplicate "
            f"the query set first"
        )
    for r in qrows:  # driver-side rows: validate with the same loudness
        if r.qv is None:
            raise ValueError(
                f"invalid vector in column 'qv' at query_id={r.query_id}: "
                f"expected a non-NULL array, got NULL"
            )
    if qrows:  # ragged queries die as numpy shape errors in every task
        d0 = len(qrows[0].qv)
        for r in qrows:
            if len(r.qv) != d0:
                raise ValueError(
                    f"invalid vector in column 'qv' at query_id="
                    f"{r.query_id}: length {len(r.qv)} != length {d0} of "
                    f"query_id={qrows[0].query_id} — the query matrix "
                    f"must be rectangular"
                )
    qmat_list = [[float(x) for x in r.qv] for r in qrows]

    bc = spark.sparkContext.broadcast((qids, qmat_list))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        qids_l, qmat_l = bc.value
        qm = np.asarray(qmat_l, dtype=np.float64)  # (Q, D)
        qn = np.linalg.norm(qm, axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            # explicit rectangularity pre-check: validate_vectors
            # (NULL-only here — the op takes no dim param) can't catch a
            # length mismatch, and np.asarray's behavior on ragged input
            # is numpy-version-dependent; name the MINORITY rows (those
            # differing from the batch's modal length — the anomaly may
            # sit at row 0) instead of numpy's opaque shape error
            lens = pdf["v"].map(len)
            if lens.nunique() > 1:
                modal = int(lens.mode().iloc[0])
                bad = pdf.loc[lens != modal, "vec_id"].head(3).tolist()
                raise ValueError(
                    f"ragged corpus vectors in embedding_knn_batch: "
                    f"vec_ids {bad} have lengths differing from the "
                    f"batch's modal length {modal} — the embedding "
                    f"column must be fixed-dimension"
                )
            vm = np.asarray(pdf["v"].tolist(), dtype=np.float64)  # (B, D)
            vn = np.linalg.norm(vm, axis=1)
            sims = (vm @ qm.T) / np.outer(vn, qn)  # (B, Q)
            out = []
            for qi, qid in enumerate(qids_l):
                col = sims[:, qi]
                top = np.argsort(-col, kind="stable")[: min(k, len(col))]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": pdf["vec_id"].iloc[top].to_numpy(),
                            "label": pdf["label"].iloc[top].to_numpy(),
                            "cos_sim": np.round(col[top], 6),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    e = validate_vectors(embeddings).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    local_tops = e.mapInPandas(
        kernel, "query_id long, vec_id long, label int, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        local_tops.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "label", "cos_sim", "rank")
    )


def embedding_knn_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    max_queries: int = 10_000,
    chunk_queries: bool = False,
) -> DataFrame:
    """Exact cosine top-k for MANY query vectors at once — the shape real
    pipelines need (dedup a candidate set against a reference corpus,
    retrieval eval, hard-negative mining).

    Implementation: the query matrix is broadcast to every task and each
    Arrow batch of corpus vectors is scored against ALL queries with one
    numpy matmul (``mapInPandas``) — turning |Q| × |corpus| scalar dot
    products into BLAS calls. Each task emits only its local top-k per
    query (partition-level pruning, the map-side combine of top-k), and a
    single window ranks the ≤ k × partitions × |Q| survivors globally.
    Shuffle volume is O(|Q| · k · partitions), never O(|Q| · corpus).

    ``queries``: (query_id long, qv array<float|double>). Output:
    (query_id, vec_id, label, cos_sim, rank). Cosine is computed in
    float64; ``cos_sim`` is rounded to 6 decimals with (query_id,
    -cos_sim, vec_id) total ordering.

    Query sets past ``max_queries``: the default is a loud refusal (the
    broadcast design is correct only under |Q| << corpus, and a
    corpus-sized ``queries`` DF would OOM the driver). Opt-in
    ``chunk_queries=True`` instead iterates the query set in
    query_id-ordered chunks of ``max_queries``, each chunk collected,
    broadcast, and scored as above — driver memory stays bounded at one
    chunk, but EVERY chunk re-scans the full corpus, so the cost is
    ceil(|Q|/max_queries) corpus scans. That tradeoff is acceptable for
    10^5-query eval jobs; for corpus-vs-corpus scoring use the
    LSH/IVF-routed forms (dedup_embedding_lsh, embedding_knn_ivf). Each
    query's top-k is computed entirely within its own chunk's pass, so
    the union over disjoint chunks equals the single-pass result
    exactly (pinned by a test).
    """
    # limit(max+1) never moves more than max_queries+1 rows driver-side
    # regardless of the input's size.
    qrows = queries.select("query_id", "qv").limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        if not chunk_queries:
            raise ValueError(
                f"embedding_knn_batch broadcasts the query matrix to "
                f"every task: it is contracted to small query sets but "
                f"got more than max_queries={max_queries} rows. Pass "
                f"chunk_queries=True to iterate bounded broadcast chunks "
                f"(ceil(|Q|/max_queries) full corpus scans), raise "
                f"max_queries explicitly if the matrix genuinely fits "
                f"the driver and executors, or use the LSH/IVF-routed "
                f"forms for corpus-vs-corpus scoring "
                f"(dedup_embedding_lsh, embedding_knn_ivf)."
            )
        # checkpoint the ordered query set once so each offset/limit
        # page reads materialized rows instead of re-running the input
        # plan (and so the pagination is stable even for a
        # nondeterministic source)
        q_sorted = (
            queries.select("query_id", "qv")
            .orderBy("query_id")
            .localCheckpoint()
        )
        total = q_sorted.count()
        # chunk-global duplicate check: a duplicated query_id SPLIT at a
        # chunk boundary would pass each chunk's local validation yet
        # emit two k-row rank sequences for the same id in the union
        dup = (
            q_sorted.groupBy("query_id")
            .count()
            .filter(F.col("count") > 1)
            .limit(3)
            .collect()
        )
        if dup:
            raise ValueError(
                f"duplicate query_ids in embedding_knn_batch: "
                f"{sorted(int(r.query_id) for r in dup)} — chunked "
                f"pagination would split them across chunks and emit "
                f"doubled top-k rows; deduplicate the query set first"
            )
        parts = []
        for start in range(0, total, max_queries):
            page = q_sorted.offset(start).limit(max_queries).collect()
            parts.append(_knn_batch_score(embeddings, page, k))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    return _knn_batch_score(embeddings, qrows, k)


def ivf_build(
    embeddings: DataFrame,
    n_clusters: int = 16,
    iters: int = 4,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: deterministic Lloyd k-means over the corpus,
    returning (assigned corpus, centroids).

    Init is the ``n_clusters`` lowest vec_ids (deterministic, no RNG —
    reproducible across runs/engines); each iteration is one broadcast
    argmin-assign plus one groupBy with 64 per-dimension avg aggregates —
    two narrow passes, centroids never exceed n_clusters × dim floats on
    the driver (partitioner-metadata scale, like the index's coarse
    phase).

    The assigned ``ivf_cluster`` column is the point: it is an ordinary
    partitioning/pruning key. Write the table partitioned (or sorted) by
    it and a probe reads only the probed clusters' files — embarrassingly
    scalable ANN, the same layout trick the z-order index plays for space.
    """
    e = validate_vectors(embeddings).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).localCheckpoint()
    dim = len(e.first().v)
    centroids = [list(r.v) for r in e.orderBy("vec_id").limit(n_clusters).collect()]

    def assign(df, cents):
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
        with_d = df.select("vec_id", "label", "v", *dists)
        best = F.array_position(
            F.array(*[F.col(f"d{ci}") for ci in range(len(cents))]),
            F.array_min(F.array(*[F.col(f"d{ci}") for ci in range(len(cents))])),
        ) - 1
        return with_d.select(
            "vec_id", "label", "v", best.cast("int").alias("ivf_cluster")
        )

    assigned = None
    for _ in range(iters):
        assigned = assign(e, centroids)
        new_rows = (
            assigned.groupBy("ivf_cluster")
            .agg(*[F.avg(F.col("v")[d]).alias(f"m{d}") for d in range(dim)])
            .collect()
        )
        for r in new_rows:
            centroids[r.ivf_cluster] = [r[f"m{d}"] for d in range(dim)]
    return assign(e, centroids).localCheckpoint(), centroids


def embedding_knn_ivf(
    embeddings: DataFrame,
    query_vec_id: int = 1,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-probed approximate cosine top-k: score only vectors in the
    ``n_probe`` clusters nearest the query. On a cluster-partitioned
    table the probe prunes to n_probe/n_clusters of the files before a
    single dot product runs."""
    assigned, centroids = ivf_build(embeddings, n_clusters)
    q = assigned.filter(F.col("vec_id") == query_vec_id).first()
    if q is None:
        raise ValueError(
            f"query vector vec_id={query_vec_id} not found in embeddings"
        )
    import math

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = sorted(range(len(centroids)), key=lambda c: (d2(q.v, centroids[c]), c))[
        :n_probe
    ]
    cand = assigned.filter(F.col("ivf_cluster").isin(*probe))
    qv = F.array(*[F.lit(x) for x in q.v])
    sim = F.round(cosine(F.col("v"), qv), 6)
    return (
        cand.select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def _unit_centroids(n_clusters: int, dim: int) -> list[list[float]]:
    """Deterministic unit-norm coarse centroids — the centroid family
    EVERY fixed-centroid IVF path uses (assignment, probe ranking, the
    SQL twins, the cluster-partitioned layout, semantic dedup). The
    IVF analog of ``_lsh_coeffs``: a coarse quantizer only needs to
    partition the space consistently, and these floats inline as SQL
    literals so both engines stay bit-identical.

    Two generation pitfalls this design avoids, both MEASURED on the
    fixture with the r08-era generator (un-normalized affine residues
    ``a·(c·dim+d)+b mod m``):
    (1) raw residue vectors have norm ~sqrt(dim/3) (~4.6 at dim=64), so
    against unit-norm embeddings the one nearest the origin wins every
    argmin and the quantizer collapses to a single cell; (2) the affine
    index form ``a·(c·dim+d)+b mod m`` makes each
    centroid's components an ARITHMETIC PROGRESSION mod m (LCG lattice
    structure) — even unit-normalized, those near-coplanar directions
    left 14 of 16 cells empty. Here each component advances a genuine
    Park-Miller ITERATION (x ← 48271·x mod 2^31-1, per-centroid seed
    warmed 3 steps so nearby seeds decorrelate), then the vector is
    normalized: near-uniform directions, and the fixture spreads across
    every cell (16-way assignment counts 23..41 per cell).

    Generation complexity is free cross-engine: the SQL twins inline
    the OUTPUT floats as literals, so both engines consume the exact
    same values and assignment stays bit-identical — no engine ever
    re-runs this recurrence."""
    m = (1 << 31) - 1
    out = []
    for c in range(n_clusters):
        x = (c * 2654435761 + 905633) % m
        for _ in range(3):
            x = (48271 * x) % m
        comps = []
        for _ in range(dim):
            x = (48271 * x) % m
            comps.append(2.0 * x / m - 1.0)
        nrm = sum(v * v for v in comps) ** 0.5
        out.append([v / nrm for v in comps])
    return out


def probe_order(
    query_vec: list[float], cents: list[list[float]], n_probe: int | None = None
) -> list[int]:
    """Driver-side centroid ranking — the probe half of the portable IVF
    pipeline, shared by :func:`embedding_knn_ivf_portable` and the
    cluster-partitioned layout probe (sources/writer.py
    embedding_knn_clustered) so the two ANN paths carry ONE definition
    of the distance + (d2, index) tiebreak and can never desynchronize.
    ``n_probe=None`` ranks every centroid (the full-probe boundary)."""

    def d2(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    order = sorted(
        range(len(cents)), key=lambda c: (d2(query_vec, cents[c]), c)
    )
    return order[: n_probe if n_probe is not None else len(cents)]


def assign_fixed_clusters(
    embeddings: DataFrame, n_clusters: int = 16, dim: int = 64
) -> DataFrame:
    """Portable-centroid cluster assignment — the shared kernel of
    :func:`embedding_knn_ivf_portable` and the cluster-partitioned
    layout writer (sources/writer.py write_embeddings_clustered).
    Uses the UNIT-normalized centroid family (:func:`_unit_centroids`):
    the raw Park-Miller centroids degenerate to a single cell against
    unit-norm embeddings (see that docstring), which would silently
    void every probe-pruning claim downstream of this assignment.
    Returns (vec_id, label, v, ivf_cluster); row-local, zero shuffle."""
    cents = _unit_centroids(n_clusters, dim)
    embeddings = validate_vectors(embeddings, dim)
    e = embeddings.select(
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
    return e.select("vec_id", "label", "v", *dists).select(
        "vec_id",
        "label",
        "v",
        (F.array_position(darr, F.array_min(darr)) - 1)
        .cast("int")
        .alias("ivf_cluster"),
    )


def embedding_knn_ivf_portable(
    embeddings: DataFrame,
    query_vec_id: int = 1,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Whole-pipeline-oracle-able IVF top-k: identical structure to
    :func:`embedding_knn_ivf` (assign every vector to its nearest coarse
    centroid, probe the ``n_probe`` centroids nearest the query, score
    only those clusters) but with the deterministic literal centroids of
    :func:`_unit_centroids` instead of Lloyd-iterated ones — k-means'
    float-avg centroids are accumulation-order dependent and can't be
    reproduced bit-for-bit in another engine, fixed constants can. The
    production k-means variant keeps the recall-vs-brute test; this twin
    puts the assign→probe→prune→score pipeline under the DuckDB oracle.

    Scale shape is unchanged: ``ivf_cluster`` is an ordinary partitioning
    key, the probe prunes to n_probe/n_clusters of the data before any
    dot product runs, and the final top-k is TakeOrderedAndProject.

    Probe ranking MUST use the same centroid family as the assignment
    (:func:`_unit_centroids` — see :func:`assign_fixed_clusters`)."""
    cents = _unit_centroids(n_clusters, dim)
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = assign_fixed_clusters(embeddings, n_clusters, dim)
    # fetch only the query row's embedding — pulling it through `assigned`
    # would evaluate all n_clusters centroid-distance columns just to
    # discard them driver-side
    q = e.filter(F.col("vec_id") == query_vec_id).select("v").first()
    if q is None:
        raise ValueError(
            f"query vector vec_id={query_vec_id} not found in embeddings"
        )
    probe = probe_order(list(q.v), cents, n_probe)
    qv = F.array(*[F.lit(x) for x in q.v])
    sim = F.round(cosine(F.col("v"), qv), 6)
    return (
        assigned.filter(F.col("ivf_cluster").isin(*probe))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def embedding_knn_ivf_portable_sql(
    query_vec_id: int = 1,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`embedding_knn_ivf_portable`: centroids inline
    as literal arrays (the same :func:`_unit_centroids` floats the Spark
    side consumes); assignment is first-position argmin over the same
    left-to-right double sums, probe selection ranks the query's centroid
    distances with the same (distance, index) tiebreak."""
    cents = _unit_centroids(n_clusters, dim)

    lit, d2 = sql_lit, sql_d2

    dl = "[" + ", ".join(d2("v", lit(c)) for c in cents) + "]"
    qd = " UNION ALL ".join(
        f"SELECT {ci} AS c, {d2('qv', lit(cent))} AS d FROM q"
        for ci, cent in enumerate(cents)
    )
    dot = "list_sum(list_transform(list_zip(v, qv), p -> p[1] * p[2]))"
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"a AS (SELECT vec_id, label, v, "
        f"CAST(list_position({dl}, list_min({dl})) - 1 AS INTEGER) AS cl FROM e), "
        f"q AS (SELECT v AS qv FROM a WHERE vec_id = {query_vec_id}), "
        f"qd AS ({qd}), "
        f"probe AS (SELECT c FROM qd ORDER BY d, c LIMIT {n_probe}), "
        "n AS (SELECT vec_id, label, v, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS norm "
        "FROM a WHERE cl IN (SELECT c FROM probe)) "
        f"SELECT vec_id, label, round({dot} / "
        "(norm * sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cos_sim "
        "FROM n CROSS JOIN q "
        f"ORDER BY cos_sim DESC, vec_id LIMIT {k}"
    )


def lsh_signature(v: Column, planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(dot(v, r_i)).

    The hyperplanes are deterministic pseudo-random unit-free vectors
    generated from the :func:`_mix64` avalanche of each (plane,
    component) index, scaled to [-1, 1] — reproducible across runs and
    engines with no RNG state. Sign-LSH needs no normalization: the
    signature of v equals the signature of v/|v|."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(_lsh_coeffs(planes, dim)):
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, r: x * r,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return sig


def _mix64(x: int) -> int:
    """splitmix64 avalanche of an integer index — the generator behind
    every deterministic pseudo-random float family that needs DIVERSE
    directions (:func:`_lsh_coeffs`, :func:`_projection_matrix`).
    Affine index forms (``a·i + b mod m``) make each generated vector
    an arithmetic progression — near-coplanar directions; that
    collapsed the IVF quantizer (see :func:`_unit_centroids`) and made
    two of 16 LSH hyperplanes 0.999-cosine duplicates. An avalanche
    breaks the index linearity completely. Plain Python ints → literal
    floats; both engines consume identical constants, no RNG state."""
    m64 = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & m64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m64
    return (x ^ (x >> 31)) & m64


def _lsh_coeffs(planes: int, dim: int) -> list[list[float]]:
    """The deterministic hyperplane coefficients shared by the Spark
    expression and the SQL twin — splitmix64-avalanched per (plane,
    component) index, scaled to [-1, 1). The earlier affine residue
    family left the planes heavily correlated (mean pairwise |cos|
    0.37, one pair at 0.999 — a duplicated signature bit and extra
    false-positive candidates per band); avalanched planes measure
    mean |cos| 0.09 / max 0.31 on the same fixture with near-unique
    16-bit signatures (497 distinct over 500 docs vs 378). Sign
    buckets stay exactly reproducible cross-engine: the floats inline
    as SQL literals."""
    return [
        [
            2.0 * (_mix64(p * dim + d + 0x5151) / 2.0**64) - 1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def embedding_knn_lsh_sql(
    query_vec_id: int = 1,
    k: int = 10,
    planes: int = 16,
    probe_hamming: int = 6,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`embedding_knn_lsh`: the hyperplanes are
    pure integer-derived constants, so they inline as literal arrays and
    both engines compute identical signatures, candidate sets, and
    rounded similarities — the whole approximate pipeline is under the
    oracle (``repr`` of a Python float round-trips, and DuckDB parses
    decimal literals to the nearest double, i.e. the same bits)."""

    dot = sql_dot

    sig = " + ".join(
        f"(CASE WHEN {dot('v', '[' + ', '.join(repr(c) for c in plane) + ']')} >= 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p, plane in enumerate(_lsh_coeffs(planes, dim))
    )
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"s AS (SELECT vec_id, label, v, {sig} AS sig FROM e), "
        "n AS (SELECT vec_id, label, v, sig, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM s), "
        f"q AS (SELECT v AS qv, sig AS qsig, norm AS qnorm FROM n "
        f"WHERE vec_id = {query_vec_id}) "
        f"SELECT vec_id, label, round({dot('v', 'qv')} / (norm * qnorm), 6) "
        "AS cos_sim FROM n CROSS JOIN q "
        f"WHERE bit_count(xor(sig, qsig)) <= {probe_hamming} "
        f"ORDER BY cos_sim DESC, vec_id LIMIT {k}"
    )


def embedding_knn_lsh(
    embeddings: DataFrame,
    query_vec_id: int = 1,
    k: int = 10,
    planes: int = 16,
    probe_hamming: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors whose LSH signature is
    within ``probe_hamming`` bits of the query's signature (multi-probe).

    The signature comparison (``bit_count(xor) <= h``) prunes before any
    dot product is computed; on a signature-partitioned table the probe
    reads only matching partitions. Exactness is traded for scan volume —
    recall is tested against the brute-force baseline."""
    e = validate_vectors(embeddings, dim).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), planes, dim))
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("sig").alias("qsig")
    )
    cand = e.crossJoin(F.broadcast(q)).filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= probe_hamming
    )
    sim = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        cand.select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def _projection_matrix(out_dim: int, dim: int) -> list[list[float]]:
    """Deterministic Johnson-Lindenstrauss projection rows. This was
    the first family to abandon the old linear-in-the-index residues:
    affine entries form an arithmetic progression mod m, making every
    row nearly the same ramp — tolerable for sign buckets, fatal for
    norm preservation (measured ~0.8 mean relative distance error,
    independent of out_dim). r09 moved ``_lsh_coeffs`` and the IVF
    centroids onto avalanched generation too. Each
    entry here goes through the shared :func:`_mix64` avalanche of its
    (row, col) index, and the scale is sqrt(3/out_dim) — uniform[-1,1]
    entries have variance 1/3, so 1/sqrt(out_dim) alone would shrink
    every squared distance 3x. Plain Python ints → literal floats, both
    engines consume identical constants."""
    s = (3.0 / out_dim) ** 0.5
    return [
        [
            s * (2.0 * (_mix64(r * dim + d + 1) / 2.0**64) - 1.0)
            for d in range(dim)
        ]
        for r in range(out_dim)
    ]


def projection_coords_sql(rows: list[list[float]]) -> str:
    """The round-6 projected coordinates as one SQL select-list — shared
    verbatim by ``embedding_project_sql`` and
    ``embedding_knn_projected_sql`` so the two can never drift."""
    return ", ".join(
        f"round({sql_dot('v', sql_lit(row))}, 6)" for row in rows
    )


def embedding_project(
    embeddings: DataFrame, out_dim: int = 16, dim: int = 64
) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss)
    — the preprocessing step that makes 100 TB ANN affordable: project
    ``dim``-d embeddings onto ``out_dim`` deterministic pseudo-random
    directions, then run LSH banding / IVF / brute top-k in the small
    space (out_dim/dim of the dot-product and shuffle cost) and verify
    survivors against full vectors. Returns (vec_id, label, proj) with
    each coordinate rounded to 6 decimals.

    Pure row-local Column math (one left-to-right fold per output
    coordinate — no shuffle, no Python), same determinism contract as
    ``lsh_signature``: fixed literal matrix, no RNG state."""
    rows = _projection_matrix(out_dim, dim)
    embeddings = validate_vectors(embeddings, dim)
    v = F.col("embedding").cast("array<double>")
    coords = [
        F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(c) for c in row]),
                    lambda x, r: x * r,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        for row in rows
    ]
    return embeddings.select("vec_id", "label", F.array(*coords).alias("proj"))


def embedding_project_sql(out_dim: int = 16, dim: int = 64) -> str:
    """DuckDB twin of :func:`embedding_project` — identical matrix
    literals, identical left-to-right folds per coordinate."""
    rows = _projection_matrix(out_dim, dim)

    coords = projection_coords_sql(rows)
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings) "
        f"SELECT vec_id, label, [{coords}] AS proj FROM e"
    )


def embedding_project_rows(
    embeddings: DataFrame, out_dim: int = 16, dim: int = 64
) -> DataFrame:
    """:func:`embedding_project` with the projected vector unpivoted to
    one scalar row per coordinate: (vec_id, label, dim_idx, coord).

    This is the GRADED form of the projection — an ``array<double>``
    column is unhashable in pandas-side canonicalization (a list-valued
    cell breaks ``sort_values``), so the driver's oracle harness can
    only value-check scalar columns; ``posexplode`` converts the array
    to ``out_dim`` hashable rows at zero extra compute (the generator
    runs inside the same projected stage — still no shuffle). Pipeline
    consumers (:func:`embedding_knn_projected`) keep using the packed
    array form."""
    p = embedding_project(embeddings, out_dim=out_dim, dim=dim)
    return p.select(
        "vec_id", "label", F.posexplode("proj").alias("dim_idx", "coord")
    )


def embedding_project_rows_sql(out_dim: int = 16, dim: int = 64) -> str:
    """DuckDB twin of :func:`embedding_project_rows` — the same
    per-coordinate fold literals, unpivoted via a ``range(out_dim)``
    lateral (DuckDB has no WITH ORDINALITY; 1-based list indexing)."""
    rows = _projection_matrix(out_dim, dim)

    coords = projection_coords_sql(rows)
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"p AS (SELECT vec_id, label, [{coords}] AS proj FROM e) "
        "SELECT vec_id, label, CAST(t.i AS INT) AS dim_idx, "
        "proj[t.i + 1] AS coord "
        f"FROM p, range({out_dim}) t(i)"
    )


def embedding_knn_projected(
    embeddings: DataFrame,
    query_vec_id: int = 1,
    k: int = 10,
    out_dim: int = 16,
    dim: int = 64,
    overfetch: int = 4,
) -> DataFrame:
    """Approximate kNN through the JL projection: rank ALL vectors by
    cosine in the ``out_dim`` projected space (out_dim/dim of the
    dot-product cost), keep the top ``overfetch * k`` candidates, then
    re-rank only those by exact full-vector cosine. Output schema and
    ordering match :func:`embedding_knn`; recall < 1 is the JL
    distortion tradeoff, bounded by the overfetch factor.

    100 TB shape: the projected scan is the same
    TakeOrderedAndProject as brute kNN but folds 16 coordinates per row
    instead of 64; only ``overfetch*k`` full vectors are ever fetched
    (a vec_id IN semi-join against the stored table — row-group pruning
    territory). Fully deterministic: literal projection matrix, round-6
    projected scores with vec_id tiebreaks at the overfetch boundary."""
    proj = embedding_project(embeddings, out_dim=out_dim, dim=dim)
    qp = proj.filter(F.col("vec_id") == query_vec_id).select(
        F.col("proj").alias("qp")
    )
    psim = F.round(cosine(F.col("proj"), F.col("qp")), 6)
    cand = (
        proj.crossJoin(F.broadcast(qp))
        .select("vec_id", psim.alias("proj_sim"))
        .orderBy(F.col("proj_sim").desc(), "vec_id")
        .limit(overfetch * k)
    )
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    sim = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        e.join(cand.select("vec_id"), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def embedding_knn_projected_sql(
    query_vec_id: int = 1,
    k: int = 10,
    out_dim: int = 16,
    dim: int = 64,
    overfetch: int = 4,
) -> str:
    """DuckDB twin of :func:`embedding_knn_projected`: the projection CTE
    is :func:`embedding_project_sql`'s expression inline, candidate
    selection and re-rank use the same round-6 scores and vec_id
    tiebreaks."""
    rows = _projection_matrix(out_dim, dim)

    coords = projection_coords_sql(rows)
    cos = sql_cosine

    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"p AS (SELECT vec_id, [{coords}] AS proj FROM e), "
        f"qp AS (SELECT proj AS qproj FROM p WHERE vec_id = {query_vec_id}), "
        f"cand AS (SELECT vec_id, round({cos('proj', 'qproj')}, 6) AS proj_sim "
        "FROM p CROSS JOIN qp "
        f"ORDER BY proj_sim DESC, vec_id LIMIT {overfetch * k}), "
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}) "
        f"SELECT e.vec_id, e.label, round({cos('e.v', 'qv')}, 6) AS cos_sim "
        "FROM e CROSS JOIN q "
        "WHERE e.vec_id IN (SELECT vec_id FROM cand) "
        f"ORDER BY cos_sim DESC, e.vec_id LIMIT {k}"
    )


def centroid_assign(embeddings: DataFrame, n_clusters: int = 8) -> DataFrame:
    """Nearest-centroid assignment — the k-means / IVF assignment step as
    a standalone, exactly-oracle-checkable operator. Seed centroids are
    the ``n_clusters`` lowest vec_ids (deterministic, no RNG); each
    vector gets the seed's vec_id as its ``cluster_id`` plus the squared
    L2 distance to it.

    This is the kernel :func:`ivf_build` iterates (its ``assign``
    closure), exposed so the driver oracle can pin its exact semantics:
    distances accumulate element-sequentially in doubles — the same
    fold order DuckDB's ``list_sum(list_transform(...))`` uses — so the
    round-6 ``dist2`` is bit-identical across engines. Ties between
    centroids break to the lowest cluster_id via lexicographic struct
    ordering (``array_min`` over (d2, cid) structs).

    100 TB shape: ZERO shuffle — the centroids ride into every task as
    plan literals (k × dim doubles, partitioner-metadata scale) and the
    assignment is a per-row array kernel. For k beyond a few thousand
    you'd switch to a broadcast join against a centroid table instead of
    literals; the output column is the point either way — an ordinary
    partitioning / pruning key for cluster-local downstream work
    (SemDeDup-style per-cluster dedup, IVF probes, balanced sampling).
    """
    e = validate_vectors(embeddings).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        (r.vec_id, list(r.v)) for r in e.orderBy("vec_id").limit(n_clusters).collect()
    ]
    pairs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        F.array(*[F.lit(c) for c in cv]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cv in seeds
        ]
    )
    best = F.array_min(pairs)
    return e.select(
        "vec_id",
        "label",
        best["cid"].alias("cluster_id"),
        F.round(best["d2"], 6).alias("dist2"),
    )


def centroid_assign_sql(n_clusters: int = 8) -> str:
    """DuckDB twin of :func:`centroid_assign`: cross join to the seed
    CTE, squared-L2 via the shared :func:`sql_d2` fold (same element
    order, same doubles as the Spark ``zip_with`` kernel), argmin via
    ``row_number() OVER (... ORDER BY d2, cid)``."""
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id "
        f"LIMIT {n_clusters}), "
        "d AS (SELECT e.vec_id, e.label, c.cid, "
        f"{sql_d2('e.v', 'c.cv')} AS d2 "
        "FROM e CROSS JOIN c) "
        "SELECT vec_id, label, cid AS cluster_id, round(d2, 6) AS dist2 "
        "FROM (SELECT *, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d) WHERE rn = 1"
    )


def embedding_profile(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column —
    (dim, n_vecs, mean, std, min_val, max_val) — the data-quality
    monitor for an embedding pipeline (dead dimensions, drift between
    snapshots, normalization bugs all show up here first).

    100 TB shape: ``posexplode`` + ONE narrow ``groupBy(dim)`` with 4
    aggregates. The explode multiplies rows by ``dim``, but the rows are
    (int, double) pairs and map-side partial aggregation collapses them
    to ``dim`` groups per task before the exchange — the shuffle carries
    ~64 rows per task regardless of corpus size. The previous "no
    explode" form (one 257-column aggregate: 4 per dimension + count)
    was measured 7x SLOWER despite touching fewer rows: a HashAggregate
    with 257 aggregate expressions exceeds whole-stage codegen's field
    limit and runs interpreted, per element_at, per row — the narrow
    4-aggregate form stays codegen'd end to end. The corpus row count
    (one shuffle-free count) rides in as a literal so the output is
    byte-identical to the wide form, including rows whose array is NULL
    (counted in n_vecs, absent from every per-dim aggregate — exactly
    how the NULL-skipping wide-form sums treated them).

    Cross-engine determinism: a float SUM over a distributed corpus is
    partition-order-dependent — so each component is cast to
    DECIMAL(28,9) (and its square to DECIMAL(38,18)) BEFORE summing;
    decimal sums are exact and order-independent (and grouping-order
    independent, which is what licenses the explode re-shape), and a
    double is never exactly on a decimal rounding midpoint, so both
    engines round the cast identically. mean/std then derive via single
    divisions of exact values, identical on both sides."""
    e = embeddings.select(F.col("embedding").cast("array<double>").alias("v"))
    n = e.count()
    if n == 0:
        # empty-corpus contract of the wide-aggregate form: dim rows of
        # NULL statistics with n_vecs=0 (a groupBy over zero exploded
        # rows would emit nothing)
        return embeddings.sparkSession.createDataFrame(
            [(i, 0, None, None, None, None) for i in range(dim)],
            "dim int, n_vecs long, mean double, std double, "
            "min_val double, max_val double",
        )
    x = F.col("x")
    agg = (
        e.select(F.posexplode("v").alias("dim", "x"))
        .filter(F.col("dim") < dim)
        .groupBy("dim")
        .agg(
            F.sum(x.cast("decimal(28,9)")).alias("s"),
            F.sum((x * x).cast("decimal(38,18)")).alias("ss"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
    )
    nd = F.lit(n).cast("double")
    mean = F.col("s").cast("double") / nd
    var = F.col("ss").cast("double") / nd - mean * mean
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        F.lit(n).cast("long").alias("n_vecs"),
        F.round(mean, 9).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 9).alias("std"),
        F.col("mn").alias("min_val"),
        F.col("mx").alias("max_val"),
    )


def embedding_profile_sql(dim: int = 64) -> str:
    """DuckDB twin of :func:`embedding_profile` — same decimal-sum
    determinism contract, same division/round order."""
    aggs = ", ".join(
        f"sum(CAST(v[{i + 1}] AS DECIMAL(28,9))) AS s_{i}, "
        f"sum(CAST(v[{i + 1}] * v[{i + 1}] AS DECIMAL(38,18))) AS ss_{i}, "
        f"min(v[{i + 1}]) AS mn_{i}, max(v[{i + 1}]) AS mx_{i}"
        for i in range(dim)
    )
    arms = " UNION ALL ".join(
        f"SELECT {i} AS dim, CAST(n AS BIGINT) AS n_vecs, "
        f"round(CAST(s_{i} AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean, "
        f"round(sqrt(greatest(CAST(ss_{i} AS DOUBLE) / CAST(n AS DOUBLE) "
        f"- (CAST(s_{i} AS DOUBLE) / CAST(n AS DOUBLE)) "
        f"* (CAST(s_{i} AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)), 9) AS std, "
        f"mn_{i} AS min_val, mx_{i} AS max_val FROM w"
        for i in range(dim)
    )
    return (
        "WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"w AS (SELECT count(*) AS n, {aggs} FROM e) "
        f"{arms}"
    )


RRF_C = 60  # the standard reciprocal-rank-fusion constant (Cormack et al.)
RRF_SCALE = 10**9  # integer micro-units: contrib = SCALE div (C + rank)


def hybrid_search_rrf(
    documents: DataFrame,
    embeddings: DataFrame,
    terms: tuple[str, ...] | None = None,
    query_vec_id: int = 1,
    n: int = 50,
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: fuse the lexical
    (Okapi BM25 over the text) and dense (exact cosine over the
    embedding) rankings with ``score = Σ_lists SCALE div (c + rank)``
    — the RRF combiner (Cormack/Clarke/Büttcher, SIGIR'09) that every
    production RAG stack runs because it needs no score calibration
    between the two retrievers, only their ranks. ``vec_id`` is the
    corpus doc id, so the two lists fuse on a shared key.

    Returns (doc_id, rrf_micro, n_lists) top-``k`` under the total
    order (rrf_micro desc, doc_id); ``n_lists`` says whether a hit
    came from one or both retrievers. Integer division keeps the
    fused score exact, so cross-engine agreement needs no float
    contract beyond what the two sub-rankings (rounded scores, id
    tiebreaks) already guarantee.

    Scale shape: both retrievers end in top-``n`` (TakeOrderedAndProject
    / routed probes at scale); everything after operates on ≤ 2n rows
    of (id, rank) METADATA — the global row_number windows and the
    fuse aggregation are bounded by ``n``, never by corpus size."""
    from pyspark.sql import Window

    from tiny_md_hbase_spark.operators.text import (
        SEARCH_TERMS,
        keyword_search_bm25,
    )

    qs = SEARCH_TERMS if terms is None else terms
    bm = keyword_search_bm25(documents, terms=qs, k=n)
    kn = embedding_knn(embeddings, query_vec_id=query_vec_id, k=n)
    rb = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("r"),
    )
    re_ = kn.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), "vec_id"))
        .alias("r"),
    )
    contrib = F.expr(f"{RRF_SCALE} div ({c} + r)").cast("long")
    u = rb.select("doc_id", contrib.alias("contrib")).unionByName(
        re_.select("doc_id", contrib.alias("contrib"))
    )
    return (
        u.groupBy("doc_id")
        .agg(
            F.sum("contrib").cast("long").alias("rrf_micro"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(k)
    )


def hybrid_search_rrf_sql(
    terms: tuple[str, ...] | None = None,
    query_vec_id: int = 1,
    n: int = 50,
    k: int = 10,
    c: int = RRF_C,
) -> str:
    """DuckDB twin of :func:`hybrid_search_rrf` — the two sub-rankings
    are the existing oracle texts (BM25 twin verbatim as a subquery;
    the exact-cosine form mirrored from the embedding_knn oracle),
    fused with the same integer recurrence."""
    from tiny_md_hbase_spark.operators.text import (
        SEARCH_TERMS,
        keyword_search_bm25_sql,
    )

    qs = SEARCH_TERMS if terms is None else terms
    bm_sql = keyword_search_bm25_sql(terms=qs, k=n)
    dotsim = (
        "list_sum(list_transform(list_zip(v, qv), p -> p[1] * p[2])) "
        "/ (norm * qnorm)"
    )
    return (
        f"WITH rb AS (SELECT doc_id, row_number() OVER "
        f"(ORDER BY bm25 DESC, doc_id) AS r FROM ({bm_sql})), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        "nn AS (SELECT vec_id, v, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e), "
        "q AS (SELECT v AS qv, norm AS qnorm FROM nn "
        f"WHERE vec_id = {query_vec_id}), "
        f"kn AS (SELECT vec_id, round({dotsim}, 6) AS cos_sim "
        f"FROM nn CROSS JOIN q ORDER BY cos_sim DESC, vec_id LIMIT {n}), "
        "re AS (SELECT vec_id AS doc_id, row_number() OVER "
        "(ORDER BY cos_sim DESC, vec_id) AS r FROM kn), "
        f"u AS (SELECT doc_id, {RRF_SCALE} // ({c} + r) AS contrib FROM rb "
        f"UNION ALL SELECT doc_id, {RRF_SCALE} // ({c} + r) FROM re) "
        "SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_micro, "
        "CAST(count(*) AS BIGINT) AS n_lists "
        "FROM u GROUP BY doc_id "
        f"ORDER BY rrf_micro DESC, doc_id LIMIT {k}"
    )
