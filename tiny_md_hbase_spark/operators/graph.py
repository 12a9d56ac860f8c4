"""Iterative graph analytics (beyond-reference, SURVEY.md §2.5
gap-fill): PageRank over the customer↔supplier purchase graph in EXACT
integer arithmetic, so the whole fixed-iteration computation sits under
a chained-CTE DuckDB oracle (floating-point PageRank sums are
accumulation-order dependent and can never hash-match cross-engine —
the same reason the z-codec, corpus_budget, and the quantized ANN path
use integer semantics).

Semantics (micro-unit PageRank, damping 85/100, all ops integer):

    N         = |nodes|;  init = SCALE div N
    base      = (init * (100 - 85)) div 100          # teleport term
    contrib_i = rank_i div out_degree_i
    rank'_j   = base + (85 * sum_{i->j} contrib_i) div 100

Fixed ``n_iter`` rounds (the bounded-iteration shape a batch pipeline
schedules), deterministic for any engine that computes integer division
identically — floor-toward-zero on non-negatives, which BIGINT ``div``
(Spark) and ``//`` (DuckDB) both are.

Scale shape: the rank/degree tables are NODE-sized (graph metadata);
the one data-sized operation per round is the edges ⋈ contrib
equi-join + map-side-partial sum on dst — the canonical distributed
PageRank step. Each round ends in a localCheckpoint so the k-round
loop never builds a k-deep join lineage. Dangling nodes cannot exist:
edges are bidirectional (a purchase links both directions), so every
node has out-degree ≥ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "purchase_edges",
    "pagerank",
    "pagerank_py",
    "co_purchase",
    "connected_components",
    "connected_components_star",
    "purchase_edges_weighted",
    "pagerank_weighted",
    "pagerank_weighted_py",
    "doc_overlap_edges",
    "triangle_count",
    "triangle_count_py",
    "k_core",
    "pagerank_sql",
    "pagerank_weighted_sql",
    "triangle_count_sql",
    "k_core_sql",
    "shortest_path",
    "shortest_path_sql",
    "shortest_path_weighted",
    "shortest_path_weighted_sql",
]

SCALE = 10**12  # rank micro-units
DAMP = 85  # damping numerator (denominator 100)
TOP_K = 20


def _checkpoint_partitioned(df: DataFrame, *keys: str) -> DataFrame:
    """Materialize a loop-invariant relation hash-partitioned on its
    join key(s), PRESERVING the partitioning through the checkpoint so
    every round's equi-join consumes it without a fresh Exchange — the
    per-round edge-stream shuffle is the dominant cost of the iterative
    operators here, and it re-shuffles bytes that never change.

    AQE is disabled for the ONE materialization: under AQE the
    checkpoint captures the AdaptiveSparkPlanExec's partitioning as
    Unknown and the planner re-exchanges the relation every round
    (measured: 2 Exchange per round vs 1 with the partitioning kept).
    The partition count is pinned to ``spark.sql.shuffle.partitions``
    (scale-sized by the session factory) so the per-round shuffled side
    matches it and co-partitioning is recognized."""
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.repartition(n, *keys).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def _checkpoint_keep_partitioning(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=False)`` that RECORDS the plan's output
    partitioning in the checkpointed relation — the per-round twin of
    :func:`_checkpoint_partitioned` for relations that are ALREADY
    partitioned on the key the next round joins on (e.g. a label table
    produced by a co-partitioned join), so no repartition exchange is
    paid just to keep the partitioning visible.

    AQE must be off for the CALL (not the later materialization): the
    checkpoint captures the physical plan's partitioning at call time,
    and an AdaptiveSparkPlanExec reports Unknown until executed — the
    same reason :func:`_checkpoint_partitioned` toggles it. The toggle
    is session-global and therefore single-threaded-correct only; the
    engine's query builders run single-threaded by design (noted once
    here rather than per site)."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def _incidence(
    orders: DataFrame, lineitem: DataFrame, cluster_by_cust: bool = False
) -> DataFrame:
    """The ONE (customer, supplier) incidence build — distinct pairs via
    the orderkey equi-join — shared by :func:`purchase_edges` and
    :func:`co_purchase` so the incidence semantics can never diverge
    between the two graph views.

    ``cluster_by_cust`` inserts an explicit repartition on ``cust``
    BELOW the distinct: hashpartitioning(cust) already clusters
    (cust, supp), so the dedup aggregation rides that one exchange
    instead of adding its own — and, decisive for :func:`co_purchase`'s
    self-join, BOTH join aliases then hang off the byte-identical
    Exchange subtree, which is exactly the case Spark's ReuseExchange
    does handle (one orders⋈lineitem build instead of two planned
    copies) while also making the pair join co-partitioned (zero
    further exchanges, guide §2.4)."""
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
    )
    if cluster_by_cust:
        # EXPLICIT partition count: an un-sized repartition(col) is
        # AQE-coalesced to the data's byte size — correct for scan-bound
        # stages, wrong here because the downstream pair join fans each
        # incidence row out quadratically (measured: coalescing to 9
        # tasks at sf0.1 ran the 12.5M-row pair enumeration on 9 cores
        # and cost 39%). Pinning to spark.sql.shuffle.partitions (the
        # session factory's scale knob) keeps the CPU-bound stage at
        # cluster width at any scale.
        n = int(j.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        j = j.repartition(n, "cust")
    return j.distinct()


def purchase_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Bidirectional customer↔supplier purchase edges. Node ids are
    parity-disjoint (customer c → 2c, supplier s → 2s+1 — an injective
    map applied AFTER the shared distinct, so both graph views derive
    from one incidence build) and the reverse direction is a
    projection, not a second join."""
    e = _incidence(orders, lineitem).select(
        (F.col("cust") * 2).alias("cust"),
        (F.col("supp") * 2 + 1).alias("supp"),
    )
    return e.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).unionByName(
        e.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )


def purchase_edges_weighted(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Weighted bidirectional customer↔supplier edges: weight = the
    number of DISTINCT orders linking the pair (how often the
    relationship recurs, not how many line items one big order had).
    Same parity-disjoint node ids as :func:`purchase_edges`; the
    reverse direction is a projection, so the weight is symmetric by
    construction. One orderkey equi-join + one (cust, supp)-keyed
    count-distinct — the distinct runs on (cust, supp, orderkey)
    triples, map-side-partial like every aggregation here."""
    w = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_suppkey") * 2 + 1).alias("supp"),
            F.col("o_orderkey").alias("ok"),
        )
        .distinct()
        .groupBy("cust", "supp")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return w.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst"), "w"
    ).unionByName(
        w.select(F.col("supp").alias("src"), F.col("cust").alias("dst"), "w")
    )


def pagerank_weighted(
    edges: DataFrame, n_iter: int = 5, k: int = TOP_K
) -> DataFrame:
    """Weight-proportional exact-integer PageRank: node i spreads its
    rank over out-edges proportionally to integer edge weights —
    ``contrib_ij = (rank_i * w_ij) div W_i`` with ``W_i = Σ_j w_ij`` —
    instead of uniformly. Same micro-unit integer recurrence, damping,
    and (rank desc, kind, key) order as :func:`pagerank`, so the whole
    fixed-iteration computation stays bit-identical cross-engine and
    sits under a chained-CTE DuckDB oracle. With all weights equal it
    reduces exactly to :func:`pagerank` (tests pin that).

    Scale shape: identical to the unweighted form — the rank/weight-sum
    tables are node-sized, each round is one edges⋈ranks equi-join +
    map-side-partial sum on dst, lineage truncated per round. The only
    extra state is the per-edge weight column riding the checkpointed
    edge table. ``rank_i * w_ij`` stays far inside int64: SCALE=10^12
    micro-units times fixture weights (< 10^4) < 10^17."""
    # both loop-invariant relations are joined on src every round:
    # checkpoint them PARTITIONED on src so the per-round plan exchanges
    # only the node-sized rank table (see _checkpoint_partitioned)
    edges = _checkpoint_partitioned(edges.select("src", "dst", "w"), "src")
    wsum = _checkpoint_partitioned(
        edges.groupBy("src").agg(F.sum("w").cast("long").alias("wsum")),
        "src",
    )
    n = wsum.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "kind string, key long, rank long"
        )
    init = SCALE // n
    base = (init * (100 - DAMP)) // 100
    ranks = wsum.select(
        F.col("src").alias("node"), F.lit(init).cast("long").alias("rank")
    )
    for _ in range(n_iter):
        # shuffled-hash hints on the node-sized build sides — see
        # pagerank's loop comment
        contrib = (
            edges.join(wsum.hint("shuffle_hash"), "src")
            .join(
                ranks.hint("shuffle_hash"),
                edges["src"] == ranks["node"],
            )
            .select(
                "dst", F.expr("(rank * w) div wsum").alias("contrib")
            )
        )
        inc = contrib.groupBy("dst").agg(F.sum("contrib").alias("inc"))
        # co-partitioned assembly + partitioning-recording checkpoint —
        # the same one-exchange-per-round shape as pagerank (see its
        # loop comment); eager=False as before: lineage truncated per
        # round, materialization rides the caller's terminal action
        ranks = _checkpoint_keep_partitioning(
            wsum.select(F.col("src").alias("node"))
            .join(inc.hint("shuffle_hash"), F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({DAMP} * coalesce(inc, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node div 2").cast("long").alias("key"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), "kind", "key")
        .limit(k)
    )


def pagerank_weighted_sql(n_iter: int = 5, k: int = TOP_K) -> str:
    """DuckDB twin of :func:`pagerank_weighted` over
    :func:`purchase_edges_weighted`'s edge build: the same integer
    recurrence as ``n_iter`` chained CTEs."""
    ctes = [
        "ew0 AS (SELECT DISTINCT o.o_custkey * 2 AS cust, "
        "l.l_suppkey * 2 + 1 AS supp, o.o_orderkey AS ok "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)",
        "ew AS (SELECT cust, supp, CAST(count(*) AS BIGINT) AS w "
        "FROM ew0 GROUP BY cust, supp)",
        "e AS (SELECT cust AS src, supp AS dst, w FROM ew "
        "UNION ALL SELECT supp, cust, w FROM ew)",
        "d AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM e GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)",
        (
            f"r0 AS (SELECT d.src AS node, {SCALE} // nn.n AS rank "
            "FROM d, nn)"
        ),
    ]
    base = f"(({SCALE} // nn.n) * {100 - DAMP}) // 100"
    for i in range(n_iter):
        ctes.append(
            f"c{i} AS (SELECT e.dst, CAST(sum((r{i}.rank * e.w) // d.wsum) "
            f"AS BIGINT) AS inc "
            f"FROM e JOIN d ON e.src = d.src "
            f"JOIN r{i} ON e.src = r{i}.node GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT d.src AS node, "
            f"CAST({base} + ({DAMP} * COALESCE(c{i}.inc, 0)) // 100 AS BIGINT) "
            f"AS rank FROM d CROSS JOIN nn "
            f"LEFT JOIN c{i} ON d.src = c{i}.dst)"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END "
        "AS kind, node // 2 AS key, rank "
        f"FROM r{n_iter} ORDER BY rank DESC, kind, key LIMIT {k}"
    )


def pagerank(edges: DataFrame, n_iter: int = 5, k: int = TOP_K) -> DataFrame:
    """Top-``k`` nodes by exact-integer PageRank after ``n_iter``
    rounds: (kind, key, rank) ordered by (rank desc, kind, key) —
    node ids map back to their entity (even → customer, odd →
    supplier) so the result reads as a ranking, not as internal ids."""
    # pin the edge table before iterating: every round joins it, and an
    # unmaterialized edge lineage (purchase_edges is a join + distinct)
    # would re-execute its whole upstream 2x per round — the same move
    # every iterative graph engine makes (GraphX caches the edge RDD)
    edges = _checkpoint_partitioned(edges.select("src", "dst"), "src")
    deg = _checkpoint_partitioned(
        edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg")),
        "src",
    )
    n = deg.count()  # node count — graph metadata, not data
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "kind string, key long, rank long"
        )
    init = SCALE // n
    base = (init * (100 - DAMP)) // 100
    ranks = deg.select(F.col("src").alias("node"), F.lit(init).cast("long").alias("rank"))
    for _ in range(n_iter):
        # shuffled-hash hints: all loop relations are stats-less RDDs
        # (the planner would sort-merge and sort the edge stream every
        # round); the build sides are node-sized — bounded per task by
        # partition count (see connected_components).
        contrib = ranks.join(
            deg.hint("shuffle_hash"), ranks.node == deg.src
        ).select(
            F.col("node").alias("cnode"),
            F.expr("rank div deg").alias("contrib"),
        )
        inc = (
            edges.join(
                contrib.hint("shuffle_hash"), edges.src == F.col("cnode")
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        # assembly join: deg's src partitioning survives the node alias
        # and inc is dst-partitioned by its groupBy, so this is
        # co-partitioned (no exchange) with the hint picking the unsorted
        # shuffled-hash; the checkpoint RECORDS the node partitioning
        # (_checkpoint_keep_partitioning) so the next round's
        # ranks⋈deg join is also exchange-free — one shuffle per round
        # (the fundamental contrib groupBy), the r15 CC-loop shape.
        # eager=False as before: lineage truncated per round,
        # materialization rides the caller's terminal action.
        ranks = _checkpoint_keep_partitioning(
            deg.select(F.col("src").alias("node"))
            .join(inc.hint("shuffle_hash"), F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({DAMP} * coalesce(inc, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node div 2").cast("long").alias("key"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), "kind", "key")
        .limit(k)
    )


def pagerank_sql(n_iter: int = 5, k: int = TOP_K) -> str:
    """DuckDB twin: the same integer recurrence as ``n_iter`` chained
    CTEs over the same parity-disjoint node ids."""
    ctes = [
        "e0 AS (SELECT DISTINCT o.o_custkey * 2 AS cust, "
        "l.l_suppkey * 2 + 1 AS supp "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)",
        "e AS (SELECT cust AS src, supp AS dst FROM e0 "
        "UNION ALL SELECT supp, cust FROM e0)",
        "d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)",
        (
            f"r0 AS (SELECT d.src AS node, {SCALE} // nn.n AS rank "
            "FROM d, nn)"
        ),
    ]
    base = f"(({SCALE} // nn.n) * {100 - DAMP}) // 100"
    for i in range(n_iter):
        ctes.append(
            f"c{i} AS (SELECT r{i}.node, r{i}.rank // d.deg AS contrib "
            f"FROM r{i} JOIN d ON r{i}.node = d.src)"
        )
        ctes.append(
            f"i{i} AS (SELECT e.dst, CAST(sum(c{i}.contrib) AS BIGINT) AS inc "
            f"FROM e JOIN c{i} ON e.src = c{i}.node GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT d.src AS node, "
            f"CAST({base} + ({DAMP} * COALESCE(i{i}.inc, 0)) // 100 AS BIGINT) "
            f"AS rank FROM d CROSS JOIN nn "
            f"LEFT JOIN i{i} ON d.src = i{i}.dst)"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END "
        "AS kind, node // 2 AS key, rank "
        f"FROM r{n_iter} ORDER BY rank DESC, kind, key LIMIT {k}"
    )


def co_purchase(
    orders: DataFrame,
    lineitem: DataFrame,
    min_shared: int = 2,
    k: int = TOP_K,
    max_degree: int | None = None,
) -> DataFrame:
    """Market-basket co-occurrence: top-``k`` supplier pairs by the
    number of DISTINCT customers buying from both — the classic
    "customers who bought from X also bought from Y" aggregation,
    bipartite-projected onto the supplier side. Returns (supp_a,
    supp_b, n_shared) with supp_a < supp_b, ordered (n_shared desc,
    supp_a, supp_b).

    Scale shape: the (customer, supplier) incidence list is distinct
    BEFORE the pair join, so each shared customer contributes exactly
    one row per pair and the count is a plain ``count(*)`` — no
    count-distinct pass. The self-join is an equi-join on the customer
    key; per-customer fan-out is d_c·(d_c-1)/2 where d_c is the
    customer's distinct-supplier degree — the classic co-occurrence
    quadratic term, bounded here by the supplier count. At web scale
    the standard mitigation is ``max_degree``: customers above the
    degree cap are DROPPED before pairing (hub entities — a customer
    connected to everything — contribute no co-purchase signal while
    dominating the join; every production co-occurrence miner applies
    exactly this cap), which bounds the fan-out at max_degree²/2 per
    customer. ``None`` keeps every customer (the fixture default, and
    the form the oracle mirrors)."""
    # cluster_by_cust: the distinct rides ONE explicit cust exchange and
    # both self-join aliases share it as a ReusedExchange — this is the
    # r15 fix for the r14 finding that the planner never reuses the
    # incidence subtree across aliases when each side shuffles
    # separately (a localCheckpoint was measured ~20% SLOWER at bench
    # scale because it serializes materialize-then-join; the shared
    # exchange keeps everything in one job). The pair join is then
    # co-partitioned on cust — zero exchanges of its own — and the
    # shuffle_hash hint keeps the 587k-row sides unsorted (guide §3.1:
    # stats-less subtrees otherwise plan sort-merge and pay two sorts).
    inc = _incidence(orders, lineitem, cluster_by_cust=True)
    if max_degree is not None:
        deg = inc.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
        inc = inc.join(
            deg.filter(F.col("d") <= max_degree).select("cust"), "cust"
        )
    a, b = inc.alias("a"), inc.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.supp") < F.col("b.supp")),
        )
        .select(F.col("a.supp").alias("supp_a"), F.col("b.supp").alias("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy(F.col("n_shared").desc(), "supp_a", "supp_b")
        .limit(k)
    )


def co_purchase_sql(min_shared: int = 2, k: int = TOP_K) -> str:
    """DuckDB twin of :func:`co_purchase` (no degree cap — the entry's
    form)."""
    return (
        "WITH inc AS (SELECT DISTINCT o.o_custkey AS cust, "
        "l.l_suppkey AS supp "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey) "
        "SELECT a.supp AS supp_a, b.supp AS supp_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM inc a JOIN inc b ON a.cust = b.cust AND a.supp < b.supp "
        "GROUP BY a.supp, b.supp "
        f"HAVING count(*) >= {min_shared} "
        f"ORDER BY n_shared DESC, supp_a, supp_b LIMIT {k}"
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 64
) -> DataFrame:
    """Distributed connected components by min-label propagation to
    fixpoint — the Pregel-style algorithm GraphX's
    ``connectedComponents`` runs, as plain DataFrame ops.

    ``nodes`` is one column ``node`` (LongType); ``edges`` is
    (``src``, ``dst``) and is treated as DIRECTED — pass both
    directions for an undirected graph (callers that own the edge
    build, like :func:`tiny_md_hbase_spark.operators.dedup.
    dedup_clusters`, already do). Returns (node, comp) where ``comp``
    is the minimum node id reachable in the component — the unique
    fixpoint, so the output is deterministic for ANY convergent
    schedule and engine (which is what lets a recursive-CTE SQL twin
    value-match it).

    Scale shape: per round, ONE equi-join of the edge list against the
    node-sized label table + a map-side-partial min aggregation on dst
    — the same join-agg round as :func:`pagerank` — then a label-sized
    comparison join for the convergence count (bounded driver scalar,
    one per round, like bpe_train's argmax row). Labels and edges are
    localCheckpointed so the k-round loop never builds a k-deep
    lineage. Converges in O(component diameter) rounds: right for
    dedup-cluster / entity-resolution graphs (dense, tiny diameter);
    a pathological chain-of-millions graph wants the
    large-star/small-star contraction (Kiveris et al. 2014) instead,
    which trades ~2x work per round for O(log n) rounds. ``max_iter``
    is a runaway backstop, far above any realistic diameter here."""
    # labels partitioned on node, edges on src — the per-round equi-join
    # keys. Both sides of BOTH per-round joins are then co-partitioned
    # (src==node and node==dst at the same pinned partition count), so a
    # round's ONLY exchange is the fundamental neighbor-min groupBy(dst);
    # the label table is never re-shuffled and the edge stream never
    # moves at all (guide §2.4 — r14 removed the per-round edge
    # exchange, this removes the two label exchanges that remained).
    # checkpoint the ONE-column node table and alias comp above it: a
    # checkpoint of select(node, node AS comp) captures its partitioning
    # in terms of WHICHEVER alias the planner normalized to (observed:
    # hashpartitioning(comp)), and the per-round join on node then
    # re-exchanges — aliasing after the checkpoint keeps the recorded
    # partitioning on the join key itself
    labels = _checkpoint_partitioned(nodes.select("node"), "node").select(
        "node", F.col("node").alias("comp")
    )
    edges = _checkpoint_partitioned(edges.select("src", "dst"), "src")
    # convergence by EXACT monotone fingerprint: comp = least(comp, ...)
    # can only DECREASE, so sum(comp) strictly decreases whenever any
    # label changed and is unchanged exactly at the fixpoint. decimal
    # sum cannot overflow (≤1e18 per id × ≤1e19 rows < 1e38) and, being
    # strictly monotone, has no collision class — this is the old
    # changed==0 test without its per-round label⋈label comparison join.
    _sum = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("comp").cast("decimal(38,0)"))
    ).first()[0]
    prev_sum = _sum(labels)
    for _ in range(max_iter):
        # deliberate join strategy: every per-round relation here is a
        # stats-less checkpointed RDD, so the planner defaults to
        # sort-merge and pays two sorts per round. Build the NODE-sized
        # label table as a shuffled hash (per-task build = labels /
        # shuffle-partitions rows — bounded at any scale by partition
        # count); the edge stream is never sorted.
        nbr_min = (
            edges.join(
                labels.hint("shuffle_hash"), edges["src"] == labels["node"]
            )
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr"))
        )
        # nbr_min is dst-partitioned by its groupBy and labels is the
        # streamed side, so the join adds no exchange and its output
        # KEEPS the node partitioning — recorded through the lazy
        # checkpoint so the next round sees it
        new_labels = _checkpoint_keep_partitioning(
            labels.join(
                nbr_min.hint("shuffle_hash"),
                labels["node"] == nbr_min["dst"],
                "left",
            ).select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # ONE driver action per round: the fingerprint materializes the
        # checkpointed round in the same job
        new_sum = _sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds the backstop)"
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 48,
    round_log: list | None = None,
) -> DataFrame:
    """Connected components by ALTERNATING star contraction (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components
    in MapReduce and Beyond", SoCC 2014): the O(log n)-round
    alternative to :func:`connected_components`' O(diameter) min-label
    propagation. Same contract (``nodes`` one ``node`` column; edges
    directed — pass both directions for undirected), same unique
    fixpoint output (node, comp) with comp = the component minimum, so
    the two forms and the recursive-CTE SQL oracle all value-match.

    Per round, two operations over the (deduped, self-loop-free)
    symmetric edge view, each ONE groupBy-min + ONE equi-join:

    - large-star: every node u computes m_u = min(N(u) ∪ {u}) and
      re-points each STRICTLY LARGER neighbor at m_u — long chains
      fold toward minima from both ends at once;
    - small-star: u re-points each neighbor ≤ u AND ITSELF at m_u —
      collapsing the partial stars so the next large-star sees them as
      single hops.

    Convergence = the canonical (greater, smaller) edge multiset stops
    changing; the surviving edges then form stars rooted at component
    minima and the label read-off is one left join (singletons keep
    their own id). On a length-n path graph min-label needs ~n rounds
    while this needs ~log2(n) (tests pin the round counts); the price
    is ~2 joins per round instead of 1 — the classic trade for
    pathological diameters. Per-round localCheckpoint truncates
    lineage exactly as the other iterative operators here."""
    # canonical down-edges (big, small), deduped, self-loops dropped
    # eager=False everywhere in this loop: each checkpoint still
    # truncates lineage (every round plans against RDDs, never a
    # round-deep expression chain), but materialization is carried by
    # the ONE fingerprint action per round — previously each round ran
    # three driver jobs (large-star checkpoint, small-star checkpoint,
    # fingerprint agg); now the fingerprint's job computes the whole
    # round's chain. Identical relations, identical results.
    canon = (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # pinned for the post-condition below: joining the RAW ``edges``
    # argument there would re-execute its whole upstream lineage (for
    # dedup_clusters_star that is the full near-dup pair generation — a
    # second multi-second pass for a check the canonical set answers
    # identically: self-loops agree trivially and the check is
    # endpoint-symmetric)
    canon0 = canon

    # r15 note (measured, NOT adopted): hanging both consumers of the
    # symmetric view off one explicit repartition("a") — hoping the min
    # aggregation and the join probe would share a ReusedExchange — does
    # NOT help: the probe side's b>a/b<a filter is pushed BELOW its
    # exchange (so the two exchange subtrees differ and never reuse) and
    # the explicit repartition costs the mins branch its map-side
    # partial aggregation. The committed shape already exchanges only
    # the filtered half-stream on the probe side and partial-aggregated
    # mins on the build side (plans/r15/star_round_{before,after}.txt).
    def _sym(e: DataFrame) -> DataFrame:
        return e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            e.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )

    def _mins(sym: DataFrame) -> DataFrame:
        return sym.groupBy("a").agg(
            F.least(F.min("b"), F.col("a")).alias("m")
        ).select(F.col("a").alias("mu_node"), "m")

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )

    def _fp(e: DataFrame) -> tuple:
        # set fingerprint in ONE action: cardinality + order-free XOR of
        # per-row hashes (the relations are canonical SETS — _canon
        # applies distinct — so set equality is what's being probed).
        # XOR never overflows, unlike a sum under ANSI semantics. A
        # fingerprint collision declaring a non-converged round
        # "converged" is ~2^-64 AND would still be caught by the
        # endpoint-agreement post-condition below, so the probabilistic
        # test does not weaken the operator's exactness contract — it
        # just halves the per-round action count vs the former
        # count + one-sided anti-join pair.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("x"),
        ).collect()[0]
        return (row["n"], row["x"])

    fp_start = _fp(canon)
    for _ in range(max_iter):
        sym = _sym(canon)
        mins = _mins(sym)
        # large-star: (neighbor b > a) re-pointed at m(a). The mins side
        # is hinted shuffled-hash: all inputs are stats-less RDDs, so the
        # planner would pick sort-merge and sort the edge-sized sym
        # stream twice per round; the node-sized mins build is bounded
        # per task by partition count (the dedup.ngram_jaccard argument)
        # and sym is consumed unsorted.
        canon = _canon(
            sym.join(
                mins.hint("shuffle_hash"), sym["a"] == mins["mu_node"]
            )
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
        )
        # the mid-round fingerprint is only CONSUMED by the convergence
        # test, which also requires fp_new == fp_start — so it is
        # evaluated lazily below (the large canon is already
        # checkpointed; fingerprinting it later costs the same tiny
        # agg), saving one action per non-final round
        large = canon
        sym = _sym(canon)
        mins = _mins(sym)
        # small-star: (neighbor b < a) AND a itself re-pointed at m(a)
        new_canon = _canon(
            sym.join(
                mins.hint("shuffle_hash"), sym["a"] == mins["mu_node"]
            )
            .filter(F.col("b") < F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .unionByName(
                mins.select(F.col("mu_node").alias("u"), F.col("m").alias("v"))
            )
        )
        fp_new = _fp(new_canon)
        if round_log is not None:
            # scale-probe observable (scripts/scale_ops.py): surviving
            # canonical edge count after each full round — rounds-vs-n
            # is the operator's O(log n) contract
            round_log.append(fp_new[0])
        # converged only when the FULL ROUND is a no-op: both the
        # large-star and the small-star outputs equal the round-start
        # set. Comparing small's output to large's alone stops a round
        # early on partially-folded chains (e.g. a 4-path stabilizes at
        # {(1,0),(2,0),(3,1)} under small∘large while large still has
        # work) — the post-condition below would catch the under-merge,
        # but the loop must not manufacture that state. fp_new is
        # checked FIRST so the large-star fingerprint only runs on the
        # (at most one) candidate-convergence round.
        if fp_new == fp_start and _fp(large) == fp_start:
            canon = new_canon
            break
        canon, fp_start = new_canon, fp_new
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # stars rooted at minima: u -> v IS node -> component min.
    # eager=False: the post-condition count below is the first consumer
    # and materializes the checkpoint in its own job; the caller then
    # reads the cached partitions — one driver action saved per query
    # (r15 phase profile: the loop's cost at bench scale is almost
    # entirely per-action scheduling, the data is tiny)
    labels = canon.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    out = nodes.join(labels, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    ).localCheckpoint(eager=False)
    # post-condition (makes the operator self-verifying): every INPUT
    # edge's endpoints must agree on comp — checked over the pinned
    # canonical set canon0, which carries exactly the input edges minus
    # self-loops (trivially agreeing) and direction (the check is
    # endpoint-symmetric), without re-executing the raw edges lineage.
    # Over-merging is impossible by construction (every emitted edge
    # joins nodes already connected through the pivot's neighborhood),
    # so this one equi-join — the cost of a single extra round — rules
    # out the only failure mode a subtle early-termination bug could
    # cause (under-merging).
    l1 = out.select(F.col("node").alias("u"), F.col("comp").alias("_c1"))
    l2 = out.select(F.col("node").alias("v"), F.col("comp").alias("_c2"))
    bad = (
        canon0.join(l1, "u").join(l2, "v")
        .filter(F.col("_c1") != F.col("_c2"))
        .count()
    )
    if bad:
        raise RuntimeError(
            f"connected_components_star post-condition failed: {bad} input "
            "edges cross component labels (under-merge)"
        )
    return out


def pagerank_weighted_py(
    edge_list: list[tuple[int, int, int]], n_iter: int = 5
) -> dict[int, int]:
    """Independent pure-Python reference of the weighted integer
    recurrence ((rank·w) div W per edge, floored per edge before the
    sum) — the test oracle for :func:`pagerank_weighted`."""
    from collections import defaultdict

    wsum: dict[int, int] = defaultdict(int)
    for s, _, w in edge_list:
        wsum[s] += w
    n = len(wsum)
    init = SCALE // n
    base = (init * (100 - DAMP)) // 100
    rank = {v: init for v in wsum}
    for _ in range(n_iter):
        inc: dict[int, int] = defaultdict(int)
        for s, d, w in edge_list:
            inc[d] += (rank[s] * w) // wsum[s]
        rank = {v: base + (DAMP * inc.get(v, 0)) // 100 for v in wsum}
    return rank


def pagerank_py(
    edge_list: list[tuple[int, int]], n_iter: int = 5
) -> dict[int, int]:
    """Independent pure-Python reference of the integer recurrence —
    the test oracle for :func:`pagerank` (full rank map, not top-k)."""
    from collections import defaultdict

    deg: dict[int, int] = defaultdict(int)
    for s, _ in edge_list:
        deg[s] += 1
    n = len(deg)
    init = SCALE // n
    base = (init * (100 - DAMP)) // 100
    rank = {v: init for v in deg}
    for _ in range(n_iter):
        inc: dict[int, int] = defaultdict(int)
        for s, d in edge_list:
            inc[d] += rank[s] // deg[s]
        rank = {v: base + (DAMP * inc.get(v, 0)) // 100 for v in deg}
    return rank


def doc_overlap_edges(
    documents: DataFrame, gram_len: int = 8, min_shared: int = 3
) -> DataFrame:
    """Document near-duplicate graph: undirected (u, v) doc-id edges
    (u < v) between documents sharing ≥ ``min_shared`` DISTINCT
    ``gram_len``-token windows — the doc-level version of
    :func:`~tiny_md_hbase_spark.operators.text.source_overlap`'s
    contamination matrix, and the candidate graph every fuzzy-dedup
    pass reasons about.

    Scale shape: the (gram-md5, doc) incidence is DISTINCT before the
    pair self-join (co_purchase idiom — plain ``count(*)``, no
    count-distinct), and the per-gram fan-out is bounded by the gram's
    doc-frequency: unlike the TPC-H bipartite projections (which are
    complete graphs under uniform data), shared long n-grams are
    intrinsically rare outside true near-dups, so the edge set is
    sparse by construction. A production corpus adds the standard
    hub-gram cap (drop grams above a doc-frequency ceiling —
    boilerplate headers) exactly like co_purchase's ``max_degree``."""
    from tiny_md_hbase_spark.operators.text import tokens

    txt = F.coalesce(F.col("text"), F.lit(""))
    para = documents.sparkSession.sparkContext.defaultParallelism
    toks = documents.repartition(para, "doc_id").select(
        "doc_id", tokens(txt).alias("toks")
    )
    grams = toks.select(
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
    )
    # r15 (the co_purchase shared-exchange fix applied here too): the
    # distinct rides ONE explicit h exchange — hashpartitioning(h)
    # already clusters (doc_id, h) — and both self-join aliases share
    # that byte-identical Exchange subtree as a ReusedExchange, so the
    # tokenize+md5+explode gram build is computed ONCE and the pair
    # join is co-partitioned on h with no exchanges of its own.
    # (doc_containment/source_overlap, whose gram builds feed 2-3
    # DIFFERENTLY-SHAPED consumers, checkpoint instead — measured in
    # r14, each form kept where it won.) shuffle_hash keeps the
    # gram-keyed sides unsorted (guide §3.1).
    # explicit count for the same reason as _incidence's cluster knob:
    # the downstream pair join fans out per gram, so the exchange must
    # not be AQE-coalesced down to the (tiny) incidence byte size
    n = int(grams.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    inc = grams.repartition(n, "h").distinct()
    a, b = inc.alias("a"), inc.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("u", "v")
    )


def triangle_count(edges: DataFrame, k: int = 50) -> DataFrame:
    """Per-node triangle counts by DEGREE-ORIENTED wedge closure — the
    Suri–Vassilvitskii / Cohen MapReduce algorithm ("Counting triangles
    and the curse of the last reducer", WWW'11): orient every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, enumerate wedges only at each edge pair's common LOW-rank
    apex, and close them against the oriented edge set. Every triangle
    is produced exactly once (its unique rank-minimal vertex is the
    apex), and per-apex fan-out is bounded by the node's ORIENTED
    out-degree ≤ O(√|E|) — the hub that breaks naive wedge counting
    ("the last reducer") never enumerates its quadratic neighborhood.

    ``edges`` is any (u, v) pair set; self-loops are dropped and each
    undirected pair is normalized + deduped first. Returns
    (node, n_tri) for EVERY node incident to an edge (0 for
    triangle-free nodes), ordered (n_tri desc, node), top-``k``. The
    triangle SET is orientation-invariant, so the DuckDB twin uses the
    simpler id-ordering — value-identical output, which is exactly
    what lets the oracle hash-match this.

    Scale shape: two equi-joins (wedge build on the apex key, closure
    on the (src, dst) edge key) + one map-side-partial count — no
    cartesian, no driver-side state; the edge/degree tables are
    checkpointed so the three passes share one materialized lineage."""
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint()
    )
    # deliberate join strategies (guide §3.1, the r14 loop-join rule
    # applied here too): every relation below is a stats-less
    # checkpointed RDD, so the planner defaults to sort-merge and sorts
    # the edge/wedge streams once per join. Hint the NODE- or
    # edge-bounded side as the shuffled-hash build (per-task build
    # bounded by partition count); the larger stream is never sorted.
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lo_first = e.join(du.hint("shuffle_hash"), "u").join(
        dv.hint("shuffle_hash"), "v"
    )
    u_low = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        lo_first.select(
            F.when(u_low, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_low, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_low, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
        .localCheckpoint()
    )
    x, y = o.alias("x"), o.alias("y")
    rank_lt = (F.col("x.dd") < F.col("y.dd")) | (
        (F.col("x.dd") == F.col("y.dd")) & (F.col("x.dst") < F.col("y.dst"))
    )
    # wedge join: both sides are the oriented edge set — build on y
    # (o's partitions are bounded; the wedge stream x side fans out).
    # closure join: build on the EDGE-sized z, probe with the
    # wedge-sized stream (wedges ≥ edges by the out-degree fan-out)
    wedges = x.join(
        y.hint("shuffle_hash"), (F.col("x.src") == F.col("y.src")) & rank_lt
    ).select(
        F.col("x.src").alias("a"),
        F.col("x.dst").alias("b"),
        F.col("y.dst").alias("c"),
    )
    z = o.alias("z")
    tri = wedges.join(
        z.hint("shuffle_hash"),
        (F.col("b") == F.col("z.src")) & (F.col("c") == F.col("z.dst")),
    ).select("a", "b", "c")
    pern = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.select("node")
        .join(pern.hint("shuffle_hash"), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("n_tri"), F.lit(0).cast("long")).alias("n_tri"),
        )
        .orderBy(F.col("n_tri").desc(), "node")
        .limit(k)
    )


def triangle_count_py(edge_list: list[tuple[int, int]]) -> dict[int, int]:
    """Brute-force per-node triangle counts (adjacency-set
    intersection) — the independent test oracle for
    :func:`triangle_count`. Includes zero-count nodes."""
    from collections import defaultdict
    from itertools import combinations

    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = {v: 0 for v in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return out


def triangle_count_sql(
    gram_len: int = 8, min_shared: int = 3, k: int = 50
) -> str:
    """DuckDB twin of :func:`triangle_count` over
    :func:`doc_overlap_edges`: id-ordered triangle enumeration
    (e1.u<e1.v, e1.v<e2.v chains) — a different orientation than the
    Spark side's degree order, but the enumerated triangle SET is
    identical, which is the point."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    toks = tokens_sql("coalesce(text, '')")
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM documents), "
        "g AS (SELECT DISTINCT doc_id, "
        f"md5(array_to_string(toks[u.i + 1 : u.i + {gram_len}], ' ')) AS h "
        f"FROM t, unnest(range(CASE WHEN len(toks) >= {gram_len} "
        f"THEN len(toks) - {gram_len} + 1 ELSE 0 END)) AS u(i)), "
        "e AS (SELECT a.doc_id AS u, b.doc_id AS v "
        "FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id "
        f"GROUP BY a.doc_id, b.doc_id HAVING count(*) >= {min_shared}), "
        "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
        "FROM e e1 JOIN e e2 ON e1.v = e2.u "
        "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), "
        "nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e), "
        "pern AS (SELECT node, CAST(count(*) AS BIGINT) AS c FROM ("
        "SELECT a AS node FROM tri UNION ALL SELECT b FROM tri "
        "UNION ALL SELECT c FROM tri) GROUP BY node) "
        "SELECT n.node, CAST(COALESCE(p.c, 0) AS BIGINT) AS n_tri "
        "FROM nodes n LEFT JOIN pern p ON n.node = p.node "
        f"ORDER BY n_tri DESC, n.node LIMIT {k}"
    )


def k_core(
    edges: DataFrame, k: int = 2, max_iter: int = 8
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop every
    node whose CURRENT degree is below ``k`` until none remains — the
    maximal subgraph with minimum degree ≥ k, the standard
    graph-density filter (a 2-core strips pendant chains off the
    near-dup graph, leaving only cyclically-connected clusters).
    Returns core members as (node, deg) — degree WITHIN the core —
    ordered (deg desc, node); empty when the core is empty.

    Rounds are synchronous (all sub-``k`` nodes drop together), so the
    trajectory and the fixpoint are deterministic for any engine.
    Raises after ``max_iter`` non-converged rounds rather than return a
    non-core: the oracle replays exactly ``max_iter`` rounds, so the
    operator refuses to claim a fixpoint the oracle can't reproduce
    (components here are near-dup clusters — tiny diameters; peeling a
    chain of length L needs ~L/2 rounds).

    Scale shape: per round ONE map-side-partial degree aggregation +
    two anti-joins of the edge list against the (node-sized, broadcast)
    drop set; edges re-checkpoint per round so the loop never deepens
    lineage. The convergence probe is a bounded driver scalar per
    round (the pagerank/bpe_train pattern)."""
    und = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    e = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
        drop = deg.filter(F.col("d") < k).select(F.col("src").alias("bad"))
        if drop.count() == 0:
            return (
                deg.select(F.col("src").alias("node"), F.col("d").alias("deg"))
                .orderBy(F.col("d").desc(), "src")
            )
        e = (
            e.join(
                F.broadcast(drop), F.col("src") == F.col("bad"), "left_anti"
            )
            .join(F.broadcast(drop), F.col("dst") == F.col("bad"), "left_anti")
            .localCheckpoint()
        )
    if e.limit(1).count() == 0:  # peeled to nothing: converged, empty core
        return e.sparkSession.createDataFrame([], "node long, deg long")
    raise RuntimeError(
        f"k_core did not converge in {max_iter} rounds (k={k}) — raise "
        "max_iter (and regenerate the oracle with the same round count)"
    )


def k_core_sql(
    gram_len: int = 8, min_shared: int = 3, k: int = 2, max_iter: int = 8
) -> str:
    """DuckDB twin of :func:`k_core` over :func:`doc_overlap_edges`:
    exactly ``max_iter`` chained peel rounds (no-ops after the
    fixpoint), then the surviving degrees."""
    from tiny_md_hbase_spark.operators.text import tokens_sql

    toks = tokens_sql("coalesce(text, '')")
    # every round CTE is MATERIALIZED: e_{i+1} references e_i three
    # times (via d_i twice + directly); inlined CTEs would re-expand the
    # whole chain 3^rounds times — materialization keeps it linear
    ctes = [
        f"t AS MATERIALIZED (SELECT doc_id, {toks} AS toks FROM documents)",
        "g AS MATERIALIZED (SELECT DISTINCT doc_id, "
        f"md5(array_to_string(toks[u.i + 1 : u.i + {gram_len}], ' ')) AS h "
        f"FROM t, unnest(range(CASE WHEN len(toks) >= {gram_len} "
        f"THEN len(toks) - {gram_len} + 1 ELSE 0 END)) AS u(i))",
        "und AS MATERIALIZED (SELECT a.doc_id AS u, b.doc_id AS v "
        "FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id "
        f"GROUP BY a.doc_id, b.doc_id HAVING count(*) >= {min_shared})",
        "e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und "
        "UNION ALL SELECT v, u FROM und)",
    ]
    for i in range(max_iter):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT src, "
            f"CAST(count(*) AS BIGINT) AS d FROM e{i} GROUP BY src)"
        )
        ctes.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i} e "
            f"WHERE e.src NOT IN (SELECT src FROM d{i} WHERE d < {k}) "
            f"AND e.dst NOT IN (SELECT src FROM d{i} WHERE d < {k}))"
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT src AS node, CAST(count(*) AS BIGINT) AS deg "
        f"FROM e{max_iter} GROUP BY src ORDER BY deg DESC, node"
    )


def shortest_path(
    edges: DataFrame, source: int | None = None, max_hops: int = 3
) -> DataFrame:
    """Single-source BFS hop distances over a (src, dst) edge table:
    (node, dist) for every node reachable from ``source`` in at most
    ``max_hops`` hops (dist 0 = the source itself). ``source=None``
    picks the smallest even node id (= the lowest customer key in
    :func:`purchase_edges`' parity encoding) so the default is a pure
    function of the data.

    The reference has no graph traversal (its scans stop at z-range
    reads, `Index.java:144-230`); this is beyond-parity surface for the
    entity graphs a training-data pipeline builds (doc-overlap,
    co-purchase, citation).

    Scale: frontier-style Pregel BFS as plain DataFrame ops. Each round
    is ONE frontier⋈edges equi-join (shuffle keyed on node id — the
    frontier is the only data-sized table in motion and it only ever
    shrinks after the graph's expansion wave peaks) plus one
    node-keyed left-anti against the settled distance table, both
    hash-partitioned on the same key. The distance table is node-sized,
    never edge-sized; ``localCheckpoint`` pins each round's result so
    the plan does not re-expand the whole iteration chain (the same
    lineage-cut idiom as :func:`pagerank`). The per-round ``isEmpty``
    early-exit costs one bounded action on an already-checkpointed
    frame. ``max_hops`` bounds the rounds, so the job count is fixed at
    plan time — no data-dependent driver loops beyond it.
    """
    spark = edges.sparkSession
    # loop-invariant, joined on src every hop: checkpoint partitioned
    # (see _checkpoint_partitioned) so only the frontier is exchanged
    e = _checkpoint_partitioned(edges.select("src", "dst"), "src")
    if source is None:
        source = e.agg(
            F.min(F.when(F.col("src") % 2 == 0, F.col("src")))
        ).collect()[0][0]
        if source is None:
            # empty edge table / no even node: fail fast rather than
            # crash on int(None) — callers own picking a real source
            # on non-purchase_edges graphs
            raise ValueError(
                "shortest_path: no even source node in the edge table; "
                "pass source= explicitly"
            )
    dist = spark.createDataFrame(
        [(int(source), 0)], "node long, dist long"
    ).localCheckpoint()
    frontier = dist
    for hop in range(1, max_hops + 1):
        # shuffled-hash hints: the frontier and the settled-distance
        # table are the node-sized build sides (bounded per task by
        # partition count); without them the stats-less RDD inputs
        # default to sort-merge with per-round sorts of the edge stream
        # the anti-join's stream side carries the distinct's node
        # partitioning; recording it through a LAZY checkpoint
        # (_checkpoint_keep_partitioning) makes the next hop's
        # frontier⋈edges join co-partitioned (frontier never
        # re-exchanged) and folds the old eager materialization job
        # into the isEmpty probe below — per hop: 3 exchanges + 2
        # actions → 2 exchanges + 1 action
        nxt = _checkpoint_keep_partitioning(
            frontier.hint("shuffle_hash")
            .join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.hint("shuffle_hash"), "node", "left_anti")
            .select("node", F.lit(hop).cast("long").alias("dist"))
        )
        if nxt.isEmpty():
            break
        # dist is a union of ALREADY-checkpointed frontiers: lineage
        # depth = rounds (bounded by max_hops), so re-checkpointing the
        # accumulated table would pay one extra materialization per
        # round for nothing — only each round's frontier is pinned
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def shortest_path_sql(max_hops: int = 3) -> str:
    """DuckDB twin of :func:`shortest_path` over
    :func:`purchase_edges`' edge build: a recursive CTE whose UNION
    dedups (node, dist) pairs, min-aggregated to the hop distance.
    The anchor's scalar subquery mirrors the ``source=None`` default
    (smallest even node)."""
    return (
        "WITH RECURSIVE "
        "inc AS (SELECT DISTINCT o.o_custkey * 2 AS cust, "
        "l.l_suppkey * 2 + 1 AS supp "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey), "
        "e AS (SELECT cust AS src, supp AS dst FROM inc "
        "UNION ALL SELECT supp, cust FROM inc), "
        "bfs(node, dist) AS ("
        "SELECT (SELECT MIN(src) FROM e WHERE src % 2 = 0), 0 "
        "UNION "
        "SELECT e.dst, bfs.dist + 1 FROM bfs JOIN e ON e.src = bfs.node "
        f"WHERE bfs.dist < {max_hops}) "
        "SELECT CAST(node AS BIGINT) AS node, "
        "CAST(MIN(dist) AS BIGINT) AS dist FROM bfs GROUP BY node"
    )


def shortest_path_weighted(
    edges: DataFrame, source: int | None = None, max_hops: int = 3
) -> DataFrame:
    """Single-source MIN-COST paths over a weighted (src, dst, w) edge
    table, bounded at ``max_hops`` edges: ``max_hops`` rounds of
    Bellman-Ford relaxation, so row (node, min_cost) is the cheapest
    walk from ``source`` to ``node`` using at most ``max_hops`` edges
    (the standard invariant: dist_h(v) = min(dist_{h-1}(v),
    min_u dist_{h-1}(u) + w(u,v))). Integer weights keep every cost
    exact, so the recursive-CTE DuckDB twin — which enumerates ALL
    ≤max_hops-edge walks and min-aggregates — hash-matches. Hop-bounded
    by design: the fixed-round form a batch pipeline schedules, and the
    bound is what makes the oracle's walk enumeration finite.

    Scale: each round is ONE dist⋈edges equi-join (node-keyed shuffle;
    dist is node-sized, never edge-sized) + one min-aggregation, with
    per-round lineage cut — the same shape as :func:`pagerank`'s
    round, with the early-exit fingerprint idiom of
    :func:`connected_components_star` (count + order-free XOR hash,
    one action) stopping as soon as a round changes nothing. Unlike
    the hop-count loop, the exit is NOT trusted on the fingerprint
    alone: a (~2⁻⁶⁴) XOR-hash collision would otherwise silently end
    relaxation before the ``max_hops``-round contract is met, so a
    matching fingerprint is confirmed with an exact ``exceptAll``
    check on the node-sized dist table (one extra bounded action,
    paid only at the exit round) before breaking."""
    # loop-invariant, joined on src every relaxation round: checkpoint
    # partitioned (see _checkpoint_partitioned) so only the node-sized
    # dist table is exchanged per round
    e = _checkpoint_partitioned(edges.select("src", "dst", "w"), "src")
    if source is None:
        source = e.agg(
            F.min(F.when(F.col("src") % 2 == 0, F.col("src")))
        ).collect()[0][0]
        if source is None:
            raise ValueError(
                "shortest_path_weighted: no even source node in the edge "
                "table; pass source= explicitly"
            )
    spark = e.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0)], "node long, min_cost long"
    ).localCheckpoint()

    def _fp(d: DataFrame) -> tuple:
        row = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(node, min_cost))").alias("x"),
        ).collect()[0]
        return (row["n"], row["x"])

    fp = _fp(dist)
    for _ in range(max_hops):
        prev = dist
        # shuffled-hash hint: dist is the node-sized build side (see
        # shortest_path); the edge stream is never sorted
        relaxed = (
            dist.hint("shuffle_hash")
            .join(e, dist["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("min_cost") + F.col("w")).alias("min_cost"),
            )
        )
        # eager=False as before (the fingerprint action computes the
        # round); the checkpoint additionally RECORDS the min-agg's
        # node partitioning so the next round's dist⋈edges join is
        # co-partitioned — dist is never re-exchanged after round 1
        dist = _checkpoint_keep_partitioning(
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("min_cost").cast("long").alias("min_cost"))
        )
        nfp = _fp(dist)
        # fingerprint equality is the cheap filter, never the verdict:
        # confirm with an exact containment check before breaking. The
        # fingerprint carries the EXACT row count, so count-equal plus
        # new ⊆ prev (with multiplicities) ⇒ the tables are identical —
        # a 2^-64 XOR collision can delay the exit by zero rounds but
        # can never end relaxation early. Both tables are node-sized
        # (bounded) and the check runs only on a fingerprint match.
        if nfp == fp and dist.exceptAll(prev).limit(1).count() == 0:
            break
        fp = nfp
    return dist


def shortest_path_weighted_sql(max_hops: int = 3) -> str:
    """DuckDB twin of :func:`shortest_path_weighted` over
    :func:`purchase_edges_weighted`'s edge build: a recursive CTE
    enumerating every ≤``max_hops``-edge walk (UNION-dedup'd
    (node, cost, hops) triples — finite because hops is bounded and
    costs are exact integers), min-aggregated per node. Equal to
    ``max_hops`` Bellman-Ford rounds by the standard invariant."""
    return (
        "WITH RECURSIVE "
        "ew0 AS (SELECT DISTINCT o.o_custkey * 2 AS cust, "
        "l.l_suppkey * 2 + 1 AS supp, o.o_orderkey AS ok "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey), "
        "ew AS (SELECT cust, supp, CAST(count(*) AS BIGINT) AS w "
        "FROM ew0 GROUP BY cust, supp), "
        "e AS (SELECT cust AS src, supp AS dst, w FROM ew "
        "UNION ALL SELECT supp, cust, w FROM ew), "
        "walk(node, cost, hops) AS ("
        "SELECT (SELECT MIN(src) FROM e WHERE src % 2 = 0), "
        "CAST(0 AS BIGINT), 0 "
        "UNION "
        "SELECT e.dst, walk.cost + e.w, walk.hops + 1 "
        "FROM walk JOIN e ON e.src = walk.node "
        f"WHERE walk.hops < {max_hops}) "
        "SELECT CAST(node AS BIGINT) AS node, "
        "CAST(MIN(cost) AS BIGINT) AS min_cost FROM walk GROUP BY node"
    )
