"""Exact-integer PageRank: cross-checked against an independent Python
reference, determinism and graph-shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import graph as G
from tiny_md_hbase_spark.sources import load_table


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_matches_python_reference_small_graph(spark):
    # a 4-node graph with asymmetric degrees (parity-disjoint ids so the
    # kind mapping is exercised: 0,2 = customers; 1,3 = suppliers)
    pairs = [(0, 1), (1, 0), (0, 3), (3, 0), (2, 1), (1, 2), (2, 3), (3, 2), (0, 2), (2, 0)]
    ref = G.pagerank_py(pairs, n_iter=5)
    got = {
        (r.kind, r.key): r.rank
        for r in G.pagerank(_edges_df(spark, pairs), n_iter=5, k=10).collect()
    }
    want = {
        ("customer" if v % 2 == 0 else "supplier", v // 2): rk
        for v, rk in ref.items()
    }
    assert got == want


def test_pagerank_matches_python_reference_on_fixture(spark, sf_dir):
    edges = G.purchase_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    ref = G.pagerank_py([(r.src, r.dst) for r in edges.collect()], n_iter=5)
    top = sorted(
        (
            (-rk, "customer" if v % 2 == 0 else "supplier", v // 2)
            for v, rk in ref.items()
        )
    )[:20]
    want = [(k, key, -neg) for neg, k, key in top]
    got = [(r.kind, r.key, r.rank) for r in G.pagerank(edges, n_iter=5).collect()]
    assert got == want


def test_pagerank_deterministic_under_repartition(spark, sf_dir):
    edges = G.purchase_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    a = [tuple(r) for r in G.pagerank(edges, n_iter=3).collect()]
    b = [tuple(r) for r in G.pagerank(edges.repartition(17), n_iter=3).collect()]
    assert a == b  # integer arithmetic: no accumulation-order drift


def test_purchase_edges_bidirectional_no_dangling(spark, sf_dir):
    edges = G.purchase_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    srcs = {r.src for r in edges.select("src").distinct().collect()}
    dsts = {r.dst for r in edges.select("dst").distinct().collect()}
    assert srcs == dsts  # every node has both in- and out-edges
    # parity disjointness: edges only cross the bipartition
    bad = edges.filter((F.col("src") % 2) == (F.col("dst") % 2)).count()
    assert bad == 0


def _orders_lineitem(spark, rows):
    """(custkey, suppkey) incidence pairs as minimal orders+lineitem
    tables (one order per pair)."""
    orders = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(rows)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(rows)],
        "l_orderkey long, l_suppkey long",
    )
    return orders, lineitem


def test_co_purchase_counts_distinct_shared_customers(spark):
    # customers 1,2 both buy from suppliers 10 and 20 (1 twice: dup
    # incidence must not double-count); customer 3 only supplier 10
    rows = [(1, 10), (1, 20), (1, 10), (2, 10), (2, 20), (3, 10)]
    got = [
        tuple(r)
        for r in G.co_purchase(*_orders_lineitem(spark, rows), min_shared=1).collect()
    ]
    assert got == [(10, 20, 2)]


def test_co_purchase_min_shared_threshold(spark):
    rows = [(1, 10), (1, 20), (2, 10), (2, 30)]
    got = G.co_purchase(*_orders_lineitem(spark, rows), min_shared=2).collect()
    assert got == []  # each pair shares only one customer


def test_co_purchase_degree_cap_drops_hub_customers(spark):
    # customer 9 buys from everything (a hub) — with max_degree=2 it is
    # dropped and contributes no pairs
    rows = [(9, 10), (9, 20), (9, 30), (1, 10), (1, 20), (2, 10), (2, 20)]
    capped = [
        tuple(r)
        for r in G.co_purchase(
            *_orders_lineitem(spark, rows), min_shared=1, max_degree=2
        ).collect()
    ]
    assert capped == [(10, 20, 2)]
    uncapped = {
        (r.supp_a, r.supp_b): r.n_shared
        for r in G.co_purchase(*_orders_lineitem(spark, rows), min_shared=1).collect()
    }
    assert uncapped[(10, 20)] == 3 and (20, 30) in uncapped


def test_co_purchase_cap_bounds_fanout_on_hub_heavy_fixture(spark):
    """Hub-heavy shape: ONE customer touching EVERY supplier (the
    worst-case quadratic contributor — d·(d-1)/2 pairs from a single
    key). With the cap, total candidate pairs are bounded by
    n_capped_customers · C(max_degree, 2); the hub contributes zero.
    This is the scale story of graph.py:co_purchase made executable:
    50 suppliers → the hub alone would emit 1225 pairs, the capped run
    emits at most 3 per surviving customer."""
    n_supp = 50
    hub = [(999, s) for s in range(n_supp)]  # degree 50 — over any cap
    small = [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (3, 7)]
    rows = hub + small
    capped = G.co_purchase(
        *_orders_lineitem(spark, rows), min_shared=1, max_degree=3
    ).collect()
    # fan-out bound: customers 1 (deg 3), 2 (deg 2), 3 (deg 1) survive
    # -> at most 3·C(3,2) = 9 candidate pairs ever exist, far below the
    # hub's 1225; and no pair may touch a supplier only the hub buys
    assert 0 < len(capped) <= 9
    assert all(r.supp_a <= 7 and r.supp_b <= 7 for r in capped)
    got = {(r.supp_a, r.supp_b): r.n_shared for r in capped}
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 1}
    # uncapped control: the hub dominates — every supplier pair exists
    uncapped = G.co_purchase(
        *_orders_lineitem(spark, rows), min_shared=1, k=2000
    ).collect()
    assert len(uncapped) == n_supp * (n_supp - 1) // 2


def test_co_purchase_cap_filters_before_pair_join_plan_contract(spark):
    """Plan contract: the degree cap must drop hub customers BEFORE the
    pair self-join — a post-join filter would still pay the quadratic
    fan-out it exists to avoid. In the printed physical tree a node's
    inputs appear BELOW it, so the degree filter (`Filter (d#.. <= N)`)
    must appear AFTER the pair-join line (the only join carrying the
    supp < supp non-equi condition) — i.e. inside its input subtree."""
    from tiny_md_hbase_spark import plans as P

    rows = [(9, 10), (9, 20), (9, 30), (1, 10), (1, 20), (2, 10), (2, 20)]
    q = G.co_purchase(*_orders_lineitem(spark, rows), min_shared=1, max_degree=2)
    plan = P.explain_str(q, "simple")
    # the supp<supp pair join: SMJ prints ", Inner, (supp#", SHJ (the
    # r15 co-partitioned shape) ", Inner, BuildRight, (supp#" — locate
    # by the non-equi condition itself
    pair_join = plan.index(", (supp#")
    cap_filter = plan.index("Filter (d#")
    assert cap_filter > pair_join, "degree cap applied after the pair join"
    # and the uncapped form has no degree filter at all
    q0 = G.co_purchase(*_orders_lineitem(spark, rows), min_shared=1)
    assert "Filter (d#" not in P.explain_str(q0, "simple")


def test_co_purchase_matches_python_reference_on_fixture(spark, sf_dir):
    from collections import Counter

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    inc = {
        (r.cust, r.supp)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
        .collect()
    }
    by_cust: dict[int, list[int]] = {}
    for c, s in inc:
        by_cust.setdefault(c, []).append(s)
    counts: Counter = Counter()
    for supps in by_cust.values():
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                counts[(ss[i], ss[j])] += 1
    want = sorted(
        ((a, b, n) for (a, b), n in counts.items() if n >= 2),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:20]
    got = [tuple(r) for r in G.co_purchase(orders, li).collect()]
    assert got == want


def test_pagerank_mass_is_conserved_up_to_integer_truncation(spark):
    """Each round's total mass is bounded by the previous total (integer
    division only discards); with a regular graph it is exactly
    preserved minus deterministic truncation."""
    pairs = [(0, 1), (1, 0), (2, 1), (1, 2), (0, 3), (3, 0), (2, 3), (3, 2)]
    ref0 = G.pagerank_py(pairs, n_iter=0)
    ref5 = G.pagerank_py(pairs, n_iter=5)
    assert sum(ref5.values()) <= sum(ref0.values())
    assert min(ref5.values()) > 0


# --- connected components (distributed min-label propagation) --------------

def _cc(spark, edge_pairs, nodes):
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "node long")
    sym = edge_pairs + [(b, a) for a, b in edge_pairs]
    edges_df = spark.createDataFrame(sym or [(0, 0)], "src long, dst long")
    if not sym:
        edges_df = edges_df.filter("src < 0")  # empty edge list, typed
    return {
        r.node: r.comp
        for r in G.connected_components(nodes_df, edges_df).collect()
    }


def test_connected_components_chains_and_singletons(spark):
    """Two chains (diameter forces multi-round propagation: labels walk
    one hop per round) + an isolated node; comp = component minimum."""
    chain_a = [(i, i + 1) for i in range(0, 6)]        # 0..6
    chain_b = [(i, i + 1) for i in range(10, 14)]      # 10..14
    got = _cc(spark, chain_a + chain_b, nodes=list(range(0, 7)) + list(range(10, 15)) + [99])
    assert all(got[n] == 0 for n in range(0, 7))
    assert all(got[n] == 10 for n in range(10, 15))
    assert got[99] == 99


def test_connected_components_empty_edges_all_singletons(spark):
    got = _cc(spark, [], nodes=[1, 2, 3])
    assert got == {1: 1, 2: 2, 3: 3}


def test_connected_components_max_iter_backstop_raises(spark):
    import pytest

    chain = [(i, i + 1) for i in range(0, 8)]
    nodes_df = spark.createDataFrame([(n,) for n in range(9)], "node long")
    sym = chain + [(b, a) for a, b in chain]
    edges_df = spark.createDataFrame(sym, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        G.connected_components(nodes_df, edges_df, max_iter=2)


def test_dedup_clusters_distributed_equals_union_find(spark, sf_dir):
    """Cross-form: forcing the distributed min-label path
    (collect_limit=0) must reproduce the driver union-find labeling
    row-for-row — both converge to the component-minimum fixpoint."""
    from tiny_md_hbase_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard(docs).localCheckpoint()
    uf = {r.doc_id: r.cluster_id for r in D.dedup_clusters(docs, pairs).collect()}
    dist = {
        r.doc_id: r.cluster_id
        for r in D.dedup_clusters(docs, pairs, collect_limit=0).collect()
    }
    assert uf == dist
    assert any(k != v for k, v in uf.items())  # non-vacuous: real clusters


# --- star-contraction connected components --------------------------------

def _cc_star(spark, edge_pairs, nodes, max_iter=48):
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "node long")
    sym = edge_pairs + [(b, a) for a, b in edge_pairs]
    edges_df = spark.createDataFrame(sym or [(0, 0)], "src long, dst long")
    if not sym:
        edges_df = edges_df.filter("src < 0")
    return {
        r.node: r.comp
        for r in G.connected_components_star(
            nodes_df, edges_df, max_iter=max_iter
        ).collect()
    }


def test_cc_star_equals_min_label_on_random_graphs(spark):
    """Property: on seeded random graphs (varying density, with
    singletons) the star-contraction labels must equal min-label
    propagation's — both converge to the component-minimum fixpoint."""
    import random

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.choice([20, 45, 90]))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = list(range(n))
        assert _cc_star(spark, edges, nodes) == _cc(spark, edges, nodes), seed


def test_cc_star_chain_converges_in_log_rounds(spark):
    """The whole point of star contraction: a length-63 path graph
    (diameter 63) must converge well inside 12 alternating rounds,
    where min-label would need ~63 — and still label everything 0."""
    chain = [(i, i + 1) for i in range(63)]
    got = _cc_star(spark, chain, list(range(64)), max_iter=12)
    assert got == {i: 0 for i in range(64)}


def test_cc_star_singletons_and_empty(spark):
    assert _cc_star(spark, [], [5, 9]) == {5: 5, 9: 9}
    got = _cc_star(spark, [(3, 4)], [3, 4, 10])
    assert got == {3: 3, 4: 3, 10: 10}


# ---- weighted PageRank ---------------------------------------------------


def _wedges_df(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def test_pagerank_weighted_matches_python_reference_small_graph(spark):
    # asymmetric weights so the proportional split actually differs from
    # the uniform one (node 0 favors 3 over 1 by 4:1)
    triples = [
        (0, 1, 1), (1, 0, 1), (0, 3, 4), (3, 0, 4),
        (2, 1, 2), (1, 2, 2), (2, 3, 1), (3, 2, 1), (0, 2, 3), (2, 0, 3),
    ]
    ref = G.pagerank_weighted_py(triples, n_iter=5)
    got = {
        (r.kind, r.key): r.rank
        for r in G.pagerank_weighted(
            _wedges_df(spark, triples), n_iter=5, k=10
        ).collect()
    }
    want = {
        ("customer" if v % 2 == 0 else "supplier", v // 2): rk
        for v, rk in ref.items()
    }
    assert got == want


def test_pagerank_weighted_reduces_to_pagerank_on_equal_weights(spark, sf_dir):
    """With every weight forced to 1 the proportional split
    (rank·1) div deg equals the uniform rank div deg edge-by-edge, so
    the two operators must agree bit-for-bit."""
    edges = G.purchase_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    unit = edges.withColumn("w", F.lit(1).cast("long"))
    a = [tuple(r) for r in G.pagerank(edges, n_iter=3).collect()]
    b = [tuple(r) for r in G.pagerank_weighted(unit, n_iter=3).collect()]
    assert a == b


def test_pagerank_weighted_matches_python_reference_on_fixture(spark, sf_dir):
    edges = G.purchase_edges_weighted(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    ref = G.pagerank_weighted_py(
        [(r.src, r.dst, r.w) for r in edges.collect()], n_iter=5
    )
    top = sorted(
        (
            (-rk, "customer" if v % 2 == 0 else "supplier", v // 2)
            for v, rk in ref.items()
        )
    )[:20]
    want = [(k, key, -neg) for neg, k, key in top]
    got = [
        (r.kind, r.key, r.rank)
        for r in G.pagerank_weighted(edges, n_iter=5).collect()
    ]
    assert got == want


def test_purchase_edges_weighted_symmetric_distinct_order_counts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = G.purchase_edges_weighted(orders, lineitem).localCheckpoint()
    # weight symmetry: reversing (src, dst) yields the identical multiset
    fwd = {(r.src, r.dst): r.w for r in edges.collect()}
    assert all(fwd[(d, s)] == w for (s, d), w in fwd.items())
    # weight = DISTINCT orders, not line items: spot-check one pair
    # against a direct count
    some = next(iter(fwd.items()))
    (s, d), w = some
    cust, supp = (s, d) if s % 2 == 0 else (d, s)
    direct = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .filter(
            (F.col("o_custkey") == cust // 2)
            & (F.col("l_suppkey") == supp // 2)
        )
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert w == direct


# ---- triangle counting ---------------------------------------------------


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    """Degree-oriented wedge closure vs adjacency-set brute force on
    seeded random graphs — hubs, ties in degree, and zero-triangle
    nodes all present."""
    import random

    for seed in (2, 11, 29):
        rng = random.Random(seed)
        n = 40
        pairs = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(120)
                )
                if a != b
            }
        )
        ref = G.triangle_count_py(pairs)
        want = sorted(((-c, v) for v, c in ref.items()))[:50]
        want = [(v, -negc) for negc, v in want]
        got = [
            (r.node, r.n_tri)
            for r in G.triangle_count(
                spark.createDataFrame(pairs, "u long, v long"), k=50
            ).collect()
        ]
        assert got == want, seed


def test_triangle_count_orientation_handles_hub(spark):
    """A star K_{1,5} plus one closing edge: exactly one triangle; the
    hub must not inflate anything (4 zero-count leaves reported)."""
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    got = {
        (r.node, r.n_tri)
        for r in G.triangle_count(
            spark.createDataFrame(star, "u long, v long"), k=50
        ).collect()
    }
    assert got == {(0, 1), (1, 1), (2, 1), (3, 0), (4, 0), (5, 0)}


def test_triangle_count_dedupes_and_drops_self_loops(spark):
    messy = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (3, 3)]
    got = {
        (r.node, r.n_tri)
        for r in G.triangle_count(
            spark.createDataFrame(messy, "u long, v long"), k=50
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_doc_overlap_edges_matches_bruteforce(spark, sf_dir):
    """The edge build vs a driver-side recomputation from raw text
    (same _WS tokenization, same 8-gram windows, distinct-gram
    threshold)."""
    import re

    from tiny_md_hbase_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    grams: dict[int, set] = {}
    for r in rows:
        t = [x for x in re.split(T._WS, r.text or "") if x != ""]
        grams[r.doc_id] = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
    ids = sorted(grams)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if len(grams[a] & grams[b]) >= 3
    }
    got = {(r.u, r.v) for r in G.doc_overlap_edges(docs).collect()}
    assert got == want


# ---- k-core --------------------------------------------------------------


def _kcore_py(pairs, k=2):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    while True:
        drop = [v for v, s in adj.items() if len(s) < k]
        if not drop:
            return {v: len(s) for v, s in adj.items()}
        for v in drop:
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]


def test_k_core_matches_bruteforce_on_random_graphs(spark):
    import random

    for seed in (3, 17, 41):
        rng = random.Random(seed)
        n = 36
        pairs = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(80)
                )
                if a != b
            }
        )
        want = _kcore_py(pairs, k=3)
        got = {
            (r.node): r.deg
            for r in G.k_core(
                spark.createDataFrame(pairs, "u long, v long"), k=3,
                max_iter=36,
            ).collect()
        }
        assert got == want, seed


def test_k_core_peels_chain_keeps_cycle(spark):
    """A triangle with a pendant 4-chain: the chain peels away round
    by round, the triangle survives as the exact 2-core."""
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    got = {
        r.node: r.deg
        for r in G.k_core(
            spark.createDataFrame(pairs, "u long, v long"), k=2, max_iter=8
        ).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2}


def test_k_core_empty_and_nonconvergence_guard(spark):
    # a chain fully peels -> empty core (converged)
    chain = [(i, i + 1) for i in range(5)]
    assert (
        G.k_core(
            spark.createDataFrame(chain, "u long, v long"), k=2, max_iter=8
        ).count()
        == 0
    )
    # a long chain at max_iter=1 cannot converge -> must raise, not lie
    import pytest as _pytest

    long_chain = [(i, i + 1) for i in range(12)]
    with _pytest.raises(RuntimeError, match="did not converge"):
        G.k_core(
            spark.createDataFrame(long_chain, "u long, v long"),
            k=2,
            max_iter=1,
        )


def test_pagerank_weighted_py_reduces_to_uniform_on_unit_weights():
    """Pure-python algebraic identity under hypothesis (Spark plans use
    seeded loops per the project convention; the references are cheap):
    with all weights 1, (rank·1) div W equals rank div deg edge-by-edge,
    so the weighted recurrence IS the uniform one."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    edge = st.tuples(st.integers(0, 9), st.integers(0, 9))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=40))
    def run(pairs):
        # ensure every node has out-degree >= 1 by symmetrizing
        sym = list({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
        unit = [(a, b, 1) for a, b in sym]
        assert G.pagerank_weighted_py(unit, n_iter=4) == G.pagerank_py(
            sym, n_iter=4
        )

    run()


def test_triangle_nodes_lie_in_the_2core(spark, sf_dir):
    """Cross-operator invariant: every node of a triangle has degree
    ≥ 2 within the triangle itself, so any node with n_tri > 0 must
    survive 2-core peeling of the same graph."""
    edges = G.doc_overlap_edges(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint()
    tri_nodes = {
        r.node
        for r in G.triangle_count(edges, k=10**6).collect()
        if r.n_tri > 0
    }
    core_nodes = {r.node for r in G.k_core(edges, k=2).collect()}
    assert tri_nodes <= core_nodes


# ---------------------------------------------------------------------------
# shortest_path (single-source BFS hop distances)
# ---------------------------------------------------------------------------


def test_shortest_path_small_graph_hop_distances(spark):
    # chain 1-2-3-4 plus a branch 2-5; directed both ways
    und = [(1, 2), (2, 3), (3, 4), (2, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        (r.node, r.dist)
        for r in G.shortest_path(edges, source=1, max_hops=3).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (5, 2), (4, 3)}


def test_shortest_path_hop_bound_truncates(spark):
    und = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        (r.node, r.dist)
        for r in G.shortest_path(edges, source=1, max_hops=1).collect()
    }
    assert got == {(1, 0), (2, 1)}


def test_shortest_path_unreachable_component_excluded(spark):
    und = [(1, 2), (10, 11)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    nodes = {
        r.node for r in G.shortest_path(edges, source=1, max_hops=5).collect()
    }
    assert nodes == {1, 2}


def test_shortest_path_takes_min_over_multiple_paths(spark):
    # 1-2-4 (len 2) and 1-3-5-4 (len 3): node 4 must report dist 2
    und = [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    d = {
        r.node: r.dist
        for r in G.shortest_path(edges, source=1, max_hops=4).collect()
    }
    assert d[4] == 2


def test_shortest_path_default_source_is_min_even_node(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = G.purchase_edges(orders, lineitem)
    src = edges.agg(
        F.min(F.when(F.col("src") % 2 == 0, F.col("src")))
    ).collect()[0][0]
    out = G.shortest_path(edges)
    assert [r.node for r in out.filter("dist = 0").collect()] == [src]
    # bipartite parity: even hops land on customers (even ids), odd on
    # suppliers (odd ids) — the parity encoding makes this structural
    viol = out.filter("(node % 2) != (dist % 2)").count()
    assert viol == 0


def test_shortest_path_no_even_source_fails_fast(spark):
    import pytest

    edges = spark.createDataFrame([(1, 3), (3, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="no even source"):
        G.shortest_path(edges)


# ---------------------------------------------------------------------------
# shortest_path_weighted (hop-bounded Bellman-Ford)
# ---------------------------------------------------------------------------


def test_shortest_path_weighted_small_graph(spark):
    # 0 -> 2 direct cost 9; 0 -> 1 -> 2 cost 3+4=7 (2 hops beats direct);
    # 0 -> 1 -> 3 -> 2 cost 3+1+1=5 needs 3 hops
    edges = spark.createDataFrame(
        [(0, 2, 9), (0, 1, 3), (1, 2, 4), (1, 3, 1), (3, 2, 1)],
        "src long, dst long, w long",
    )
    got2 = {r.node: r.min_cost for r in G.shortest_path_weighted(edges, source=0, max_hops=2).collect()}
    assert got2[2] == 7 and got2[3] == 4 and got2[0] == 0
    got3 = {r.node: r.min_cost for r in G.shortest_path_weighted(edges, source=0, max_hops=3).collect()}
    assert got3[2] == 5


def test_shortest_path_weighted_matches_walk_bruteforce(spark):
    import itertools
    import random

    random.seed(17)
    for _ in range(6):
        edge_list = []
        for u, v in itertools.permutations(range(7), 2):
            if random.random() < 0.35:
                edge_list.append((u, v, random.randint(1, 9)))
        edge_list.append((0, 1, 5))  # ensure the source has an out-edge
        df = spark.createDataFrame(edge_list, "src long, dst long, w long")
        got = {
            r.node: r.min_cost
            for r in G.shortest_path_weighted(df, source=0, max_hops=3).collect()
        }
        # brute force: enumerate ALL walks of <= 3 edges
        best = {0: 0}
        cur = [(0, 0)]
        for _ in range(3):
            nxt = []
            for node, cost in cur:
                for u, v, w in edge_list:
                    if u == node:
                        c = cost + w
                        nxt.append((v, c))
                        if c < best.get(v, 1 << 60):
                            best[v] = c
            cur = nxt
        assert got == best


def test_shortest_path_weighted_early_exit_and_fail_fast(spark):
    import pytest

    # fixpoint before max_hops: a 2-node graph settles after 1 round
    edges = spark.createDataFrame([(0, 1, 2), (1, 0, 2)], "src long, dst long, w long")
    got = {r.node: r.min_cost for r in G.shortest_path_weighted(edges, source=0, max_hops=50).collect()}
    assert got == {0: 0, 1: 2}
    odd = spark.createDataFrame([(1, 3, 2)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="no even source"):
        G.shortest_path_weighted(odd)
