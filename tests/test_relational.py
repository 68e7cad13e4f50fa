"""Warehouse-join operators: the integer micro-unit revenue contract and an
independent Python recompute of both new aggregates.

The exact-BIGINT revenue basis (cents × residual-discount-percent) is only
valid because the synthetic prices/discounts/quantities are integral at
cents/percent granularity — pinned here so a testdata change fails loudly
instead of silently shifting oracle hashes.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

import __spark_entry__ as em
from tests.conftest import SF_SMOKE


def _duck_rows(sql: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con.execute(sql).fetchall()


def test_monetary_columns_are_integral_cents():
    bad = _duck_rows("""
        SELECT count(*) FROM lineitem
        WHERE abs(l_extendedprice*100 - round(l_extendedprice*100)) > 1e-6
           OR abs(l_discount*100 - round(l_discount*100)) > 1e-6
           OR abs(l_quantity - round(l_quantity)) > 1e-6
    """)[0][0]
    assert bad == 0


def test_local_supplier_volume_matches_python_fold(spark):
    rows = {r["n_name"]: (r["revenue_u"], r["n_lines"])
            for r in em.queries()["local_supplier_volume"](
                spark, SF_SMOKE).collect()}

    nat = dict(_duck_rows("""
        SELECT n_nationkey, n_name FROM nation
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"""))
    cust = dict(_duck_rows("SELECT c_custkey, c_nationkey FROM customer"))
    supp = dict(_duck_rows("SELECT s_suppkey, s_nationkey FROM supplier"))
    onat = dict(_duck_rows("""
        SELECT o_orderkey, c_nationkey FROM orders
        JOIN customer ON o_custkey = c_custkey"""))
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for ok, sk, price, disc in _duck_rows(
            "SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount "
            "FROM lineitem"):
        cn = onat.get(ok)
        if cn is None or cn not in nat or supp.get(sk) != cn:
            continue
        rev = round(price * 100) * (100 - round(disc * 100))
        want[nat[cn]][0] += rev
        want[nat[cn]][1] += 1
    assert rows == {k: tuple(v) for k, v in want.items()}
    assert len(rows) > 0


def test_brand_volume_matches_python_fold(spark):
    rows = {r["p_brand"]: (r["n_lines"], r["sum_qty"], r["revenue_u"])
            for r in em.queries()["brand_volume"](spark, SF_SMOKE).collect()}
    brand = dict(_duck_rows(
        "SELECT p_partkey, p_brand FROM part WHERE p_type = 'PROMO'"))
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for pk, qty, price, disc in _duck_rows(
            "SELECT l_partkey, l_quantity, l_extendedprice, l_discount "
            "FROM lineitem"):
        b = brand.get(pk)
        if b is None:
            continue
        want[b][0] += 1
        want[b][1] += int(qty)
        want[b][2] += round(price * 100) * (100 - round(disc * 100))
    assert rows == {k: tuple(v) for k, v in want.items()}
    assert len(rows) > 0


def test_small_qty_revenue_matches_python_fold(spark):
    rows = {r["p_brand"]: (r["n_small_lines"], r["small_revenue_u"])
            for r in em.queries()["small_qty_revenue"](
                spark, SF_SMOKE).collect()}
    branded_parts = {pk for pk, in _duck_rows(
        "SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'")}
    lines = [(pk, int(qty), round(price * 100) * (100 - round(disc * 100)))
             for pk, qty, price, disc in _duck_rows(
                 "SELECT l_partkey, l_quantity, l_extendedprice, l_discount "
                 "FROM lineitem")
             if pk in branded_parts]
    sums: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for pk, qty, _ in lines:
        sums[pk][0] += qty
        sums[pk][1] += 1
    n_small, rev = 0, 0
    for pk, qty, rev_u in lines:
        sum_qty, cnt = sums[pk]
        if 5 * qty * cnt < sum_qty:  # qty < 0.2 * avg, integer-exact
            n_small += 1
            rev += rev_u
    if n_small == 0:
        assert rows == {}
    else:
        assert rows == {"Brand#11": (n_small, rev)}


def test_pricing_summary_matches_python_fold(spark):
    """Q1-shape report vs an independent pure-Python fold over the raw
    parquet values (exact integer money units end to end)."""
    import duckdb
    from logstash_filter_geoip_spark.operators.relational import (
        _PRICING_CUTOFF, pricing_summary)

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {(r.l_returnflag, r.l_linestatus):
           (r.sum_qty, r.sum_base_cents, r.sum_disc_u, r.sum_charge_u,
            r.sum_disc_pct, r.n_lines)
           for r in pricing_summary(li).collect()}

    raw = duckdb.connect().execute(
        "SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_shipdate FROM "
        "'/root/testdata/sf0.001/lineitem.parquet'").fetchall()
    from collections import defaultdict
    from datetime import datetime
    cut = datetime.fromisoformat(_PRICING_CUTOFF)
    want = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for rf, ls, qty, price, disc, tax, ship in raw:
        if ship > cut:
            continue
        cents = round(price * 100)
        keep = 100 - round(disc * 100)
        taxp = 100 + round(tax * 100)
        w = want[(rf, ls)]
        w[0] += int(qty)
        w[1] += cents
        w[2] += cents * keep
        w[3] += cents * keep * taxp
        w[4] += round(disc * 100)
        w[5] += 1
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len(got) > 1


def test_salted_join_equals_plain_join(spark):
    """The salt is pure mechanics: result set identical to the plain join,
    for inner AND left, stable under repartitioning."""
    from logstash_filter_geoip_spark.operators.relational import salted_join
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    plain = sorted((r.event_id, r.n) for r in
                   ev.join(dim, "event_type").select("event_id", "n")
                     .collect())
    for how in ("inner", "left"):
        salted = salted_join(ev.repartition(13), dim, ["event_type"],
                             salt_col="event_id", n_salt=8, how=how)
        assert sorted((r.event_id, r.n) for r in
                      salted.select("event_id", "n").collect()) == plain
    # hot-key spread: one key's rows cover ALL salt values (the point)
    from logstash_filter_geoip_spark.functions.hashing import md5_hash60
    salts = (ev.where(F.col("event_type") == "click")
               .select(F.pmod(md5_hash60(F.col("event_id").cast("string")),
                              F.lit(8)).alias("s"))
               .distinct().count())
    assert salts == 8
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_salt"):
        salted_join(ev, dim, ["event_type"], "event_id", n_salt=1)
    with _pytest.raises(ValueError, match="missing"):
        salted_join(ev, dim, ["nope"], "event_id")


def test_salted_join_plan_replicates_right(spark):
    """Right side carries the salt explode (Generate); the join condition
    includes the salt key."""
    from pyspark.sql import functions as F
    from logstash_filter_geoip_spark.operators.relational import salted_join
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    plan = salted_join(ev, dim, ["event_type"], "event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    assert "__salt" in plan


def test_waiting_suppliers_matches_python_fold(spark):
    """Q21 shape: independent Python replay of the decorrelated
    EXISTS/NOT-EXISTS (per-(order, supplier) late flag, per-order counts,
    exactly-one-late blame) over the raw rows."""
    from datetime import timedelta

    rows = {(r.s_name, r.n_name): r.numwait
            for r in em.queries()["waiting_suppliers"](
                spark, SF_SMOKE).collect()}

    odate = dict(_duck_rows(
        "SELECT o_orderkey, o_orderdate FROM orders "
        "WHERE o_orderstatus = 'F'"))
    per_supp: dict[tuple, int] = {}
    for ok, sk, ship in _duck_rows(
            "SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem"):
        if ok not in odate:
            continue
        late = int(ship > odate[ok] + timedelta(days=90))
        k = (ok, sk)
        per_supp[k] = max(per_supp.get(k, 0), late)
    n_supp: dict[int, int] = defaultdict(int)
    n_late: dict[int, int] = defaultdict(int)
    for (ok, sk), al in per_supp.items():
        n_supp[ok] += 1
        n_late[ok] += al
    sname = {k: (nm, nat) for k, nm, nat in _duck_rows(
        "SELECT s_suppkey, s_name, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey")}
    want: dict[tuple, int] = defaultdict(int)
    for (ok, sk), al in per_supp.items():
        if al == 1 and n_supp[ok] > 1 and n_late[ok] == 1:
            want[sname[sk]] += 1
    assert rows == dict(want)
    assert rows, "late-blame selection must be non-empty at smoke scale"


def test_waiting_suppliers_plan_reuses_orderkey_partitioning(spark):
    """In the no-broadcast (100-TB) regime the per-(order, supplier) agg
    and the per-order window REUSE the first join's orderkey Exchange:
    exactly 5 Exchanges total (2 join-in, 2 suppkey join, 1 final agg),
    2 SortMergeJoins, and ONLY the bounded nation broadcast."""
    from logstash_filter_geoip_spark.operators.relational import \
        waiting_suppliers
    t = lambda n: spark.read.parquet(f"{SF_SMOKE}/{n}.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (waiting_suppliers(t("supplier"), t("nation"),
                                  t("orders"), t("lineitem"))
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("BroadcastHashJoin") == 1          # nation only
    assert plan.count("SortMergeJoin") == 2
    assert plan.count("Exchange hashpartitioning") == 5
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 1


def test_idle_rich_customers_matches_python_fold(spark):
    """Q22 shape: Python replay of the exact-cents above-average rule and
    the no-orders anti condition."""
    rows = {r.n_name: (r.n_cust, r.sum_bal_cents)
            for r in em.queries()["idle_rich_customers"](
                spark, SF_SMOKE).collect()}

    cust = [(k, nk, round(bal * 100)) for k, nk, bal in _duck_rows(
        "SELECT c_custkey, c_nationkey, c_acctbal FROM customer")]
    pos = [c for _, _, c in cust if c > 0]
    sum_pos, n_pos = sum(pos), len(pos)
    with_orders = {r[0] for r in _duck_rows(
        "SELECT DISTINCT o_custkey FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'")}
    nname = dict(_duck_rows("SELECT n_nationkey, n_name FROM nation"))
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for k, nk, c in cust:
        if c * n_pos > sum_pos and k not in with_orders:
            want[nname[nk]][0] += 1
            want[nname[nk]][1] += c
    assert rows == {n: tuple(v) for n, v in want.items()}
    assert rows, "idle-rich selection must be non-empty at smoke scale"


def test_idle_rich_plan_shape(spark):
    """The scalar stats row and nation are the ONLY broadcasts; the
    no-orders test is a shuffle anti join (orders is corpus-sized)."""
    from logstash_filter_geoip_spark.operators.relational import \
        idle_rich_customers
    t = lambda n: spark.read.parquet(f"{SF_SMOKE}/{n}.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (idle_rich_customers(t("customer"), t("orders"), t("nation"))
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("BroadcastExchange") == 2          # 1-row stats + nation
    assert "LeftAnti" in plan and plan.count("SortMergeJoin") == 1
    assert plan.count("BroadcastNestedLoopJoin") == 1    # the 1-row cross


def test_nation_trade_volume_matches_python_fold(spark):
    """Q7 shape: both directions recomputed independently in Python; only
    cross-nation pair-member lines contribute."""
    rows = {(r["supp_nation"], r["cust_nation"], r["ship_year"]):
            (r["revenue_u"], r["n_lines"])
            for r in em.queries()["nation_trade_volume"](
                spark, SF_SMOKE).collect()}
    pair = {"NATION_18", "NATION_19"}
    nat = dict(_duck_rows("SELECT n_nationkey, n_name FROM nation"))
    supp = {k: nat[v] for k, v in
            _duck_rows("SELECT s_suppkey, s_nationkey FROM supplier")}
    onat = {k: nat[v] for k, v in _duck_rows(
        "SELECT o_orderkey, c_nationkey FROM orders "
        "JOIN customer ON o_custkey = c_custkey")}
    want: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for ok, sk, y, price, disc in _duck_rows(
            "SELECT l_orderkey, l_suppkey, year(l_shipdate), "
            "l_extendedprice, l_discount FROM lineitem"):
        sn, cn = supp.get(sk), onat.get(ok)
        if sn not in pair or cn not in pair or sn == cn:
            continue
        rev = round(price * 100) * (100 - round(disc * 100))
        want[(sn, cn, int(y))][0] += rev
        want[(sn, cn, int(y))][1] += 1
    assert rows == {k: tuple(v) for k, v in want.items()}
    assert len({(a, b) for a, b, _ in rows}) == 2  # both directions present


def test_market_share_matches_python_fold_and_bounds(spark):
    """Q8 shape: target/total sums and the truncating ppm recomputed
    independently; share bounded in [0, 1e6] and target ≤ total."""
    rows = {r["order_year"]: (r["target_u"], r["total_u"],
                              r["mkt_share_ppm"])
            for r in em.queries()["market_share"](spark, SF_SMOKE).collect()}
    region_nat = {k for (k,) in _duck_rows(
        "SELECT n_nationkey FROM nation JOIN region "
        "ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'")}
    nat = dict(_duck_rows("SELECT n_nationkey, n_name FROM nation"))
    supp = {k: nat[v] for k, v in
            _duck_rows("SELECT s_suppkey, s_nationkey FROM supplier")}
    ords = {k: (v, int(y)) for k, v, y in _duck_rows(
        "SELECT o_orderkey, c_nationkey, year(o_orderdate) FROM orders "
        "JOIN customer ON o_custkey = c_custkey")}
    promo = {k for (k,) in _duck_rows(
        "SELECT p_partkey FROM part WHERE p_type = 'PROMO'")}
    want: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for ok, pk, sk, price, disc in _duck_rows(
            "SELECT l_orderkey, l_partkey, l_suppkey, "
            "l_extendedprice, l_discount FROM lineitem"):
        o = ords.get(ok)
        if o is None or o[0] not in region_nat or pk not in promo:
            continue
        rev = round(price * 100) * (100 - round(disc * 100))
        want[o[1]][1] += rev
        if supp.get(sk) == "NATION_3":
            want[o[1]][0] += rev
    expect = {y: (t, tot, t * 1_000_000 // tot)
              for y, (t, tot) in want.items()}
    assert rows == expect
    for t, tot, ppm in rows.values():
        assert 0 <= t <= tot and 0 <= ppm <= 1_000_000


def test_trade_and_share_plans_broadcast_only_bounded_dims(spark):
    """The only STATIC broadcasts are the explicit F.broadcast()-hinted
    ≤25-row nation/region slices — asserted with the size-based static
    threshold disabled, so a corpus-derived side sneaking into a
    broadcast build (the session-10 OOM class) fails here; no
    cartesian/nested-loop joins anywhere."""
    from logstash_filter_geoip_spark.plans import checks
    # Q7: nation slice ×2 (supplier leg + customer leg); Q8: region into
    # nation, the region-nation slice into customer, all-nations into
    # supplier
    expected_bhj = {"nation_trade_volume": 2, "market_share": 3}
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, n_bhj in expected_bhj.items():
            df = em.queries()[name](spark, SF_SMOKE)
            plan = checks.simple_plan(df)
            assert plan.count("BroadcastHashJoin") == n_bhj, \
                (name, plan[:4000])
            assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:3000])
            assert "CartesianProduct" not in plan, (name, plan[:3000])
            assert "EvalPython" not in plan, (name, plan[:3000])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_returned_customer_revenue_matches_python_fold(spark):
    """Q10 shape: top-20 returned-line revenue per customer recomputed
    independently, including the (revenue desc, custkey) cut order."""
    got = [(r["c_custkey"], r["c_name"], r["n_name"],
            r["revenue_u"], r["n_lines"])
           for r in em.queries()["returned_customer_revenue"](
               spark, SF_SMOKE).collect()]
    ocust = dict(_duck_rows(
        "SELECT o_orderkey, o_custkey FROM orders"))
    cust = {k: (nm, nk) for k, nm, nk in _duck_rows(
        "SELECT c_custkey, c_name, c_nationkey FROM customer")}
    nat = dict(_duck_rows("SELECT n_nationkey, n_name FROM nation"))
    want: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for ok, price, disc in _duck_rows(
            "SELECT l_orderkey, l_extendedprice, l_discount "
            "FROM lineitem WHERE l_returnflag = 'R'"):
        ck = ocust.get(ok)
        if ck is None or ck not in cust:
            continue
        want[ck][0] += round(price * 100) * (100 - round(disc * 100))
        want[ck][1] += 1
    top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    expect = [(ck, cust[ck][0], nat[cust[ck][1]], rev, n)
              for ck, (rev, n) in top]
    assert got == expect and len(got) == 20


def test_band_revenue_matches_python_fold_and_pushdown(spark):
    """Q19 shape: per-arm + total folds recomputed independently; the
    OR-of-bands predicate halves reach BOTH parquet scans (PushedFilters
    carries an Or on each side — the disjunction-pushdown story)."""
    from logstash_filter_geoip_spark.operators.relational import _Q19_ARMS
    from logstash_filter_geoip_spark.plans import checks
    df = em.queries()["band_revenue"](spark, SF_SMOKE)
    got = {r["arm"]: (r["revenue_u"], r["n_lines"]) for r in df.collect()}
    psize = dict(_duck_rows("SELECT p_partkey, p_size FROM part"))
    pbrand = dict(_duck_rows("SELECT p_partkey, p_brand FROM part"))
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for pk, qty, price, disc in _duck_rows(
            "SELECT l_partkey, l_quantity, l_extendedprice, l_discount "
            "FROM lineitem"):
        if pk not in psize:
            continue
        for i, (brand, lo, hi, size) in enumerate(_Q19_ARMS):
            if (lo <= qty <= hi and pbrand[pk] == brand
                    and psize[pk] <= size):
                rev = round(price * 100) * (100 - round(disc * 100))
                want[f"arm_{i}"][0] += rev
                want[f"arm_{i}"][1] += 1
                want["__all__"][0] += rev
                want["__all__"][1] += 1
                break
    assert got == {k: tuple(v) for k, v in want.items()}
    assert got["__all__"][1] > 0
    plan = checks.physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    or_lines = [ln for ln in pushed if "Or(" in ln]
    assert len(or_lines) >= 2, pushed


def test_customer_order_histogram_zero_bucket(spark):
    """The LEFT JOIN must keep zero-order customers: bucket counts sum to
    the full customer count, and the zero bucket equals the number of
    customers with no orders (independently recomputed)."""
    from logstash_filter_geoip_spark.operators.relational import \
        customer_order_histogram
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    hist = {r.c_count: r.custdist
            for r in customer_order_histogram(cust, orders).collect()}
    n_cust = cust.count()
    assert sum(hist.values()) == n_cust
    with_orders = orders.select("o_custkey").distinct().count()
    assert hist.get(0, 0) == n_cust - with_orders


def test_large_volume_threshold_boundary(spark):
    """The > threshold is strict: an order summing EXACTLY to min_qty is
    excluded; one unit more qualifies."""
    from logstash_filter_geoip_spark.operators.relational import \
        large_volume_customers
    cust = spark.createDataFrame([(1,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1)], "o_orderkey long, o_custkey long") \
        .withColumn("o_orderdate", F.lit("2024-01-01").cast("timestamp"))
    li = spark.createDataFrame(
        [(10, 150.0), (10, 150.0),          # exactly 300 -> excluded
         (11, 150.0), (11, 151.0)],         # 301 -> kept
        "l_orderkey long, l_quantity double")
    out = large_volume_customers(cust, orders, li, min_qty=300).collect()
    assert [(r.o_orderkey, r.total_qty) for r in out] == [(11, 301)]


def test_top_supplier_revenue_keeps_ties(spark):
    """Two suppliers with bit-identical max revenue BOTH surface — the
    exact-integer basis makes 'equals the max' well-defined."""
    from logstash_filter_geoip_spark.operators.relational import \
        top_supplier_revenue
    sup = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                "s_suppkey long, s_name string")
    li = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, 5.0, 0.0), (2, 5.0, 0.0), (3, 1.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double") \
        .withColumn("l_shipdate", F.lit("1996-02-01").cast("timestamp"))
    out = sorted((r.s_suppkey, r.total_revenue_u)
                 for r in top_supplier_revenue(sup, li).collect())
    assert out == [(1, 100000), (2, 100000)]


def test_important_parts_threshold_is_strict_and_global(spark):
    """Q11 shape: the cut is strict > against (tot * num) div den of the
    GLOBAL total — verified against a driver-side recompute. r6 plan
    contract: the total is a 1-row agg broadcast cross-joined back onto
    the persisted per-key aggregate (never a single-partition window over
    the data-sized relation, and never a join that re-derives the
    lineitem scan — the InMemoryRelation is the one derivation)."""
    import pytest

    from logstash_filter_geoip_spark.operators import relational
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = {r.l_partkey: r.revenue_u
           for r in relational.important_parts(li).collect()}
    per = {r.l_partkey: r.revenue_u
           for r in li.groupBy("l_partkey")
                      .agg(F.sum(relational._revenue_micro())
                           .alias("revenue_u")).collect()}
    num, den = relational._Q11_FRACTION
    thr = (sum(per.values()) * num) // den
    assert got == {k: v for k, v in per.items() if v > thr}
    from logstash_filter_geoip_spark.plans import checks
    p = checks.simple_plan(relational.important_parts(li))
    assert "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p and "InMemoryRelation" in p, p
    spark.catalog.clearCache()                  # release the persist
    with pytest.raises(ValueError):
        relational.important_parts(li, num=0)
    with pytest.raises(ValueError):
        relational.important_parts(li, num=5000, den=1)


def test_promo_share_pair_reconciles(spark):
    """Q14 shape: the conditional promo sum + total pair must reconcile
    with an independent per-type recompute; promo <= total everywhere."""
    from logstash_filter_geoip_spark.operators import relational
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = {r.month: (r.promo_revenue_u, r.total_revenue_u)
           for r in relational.promo_revenue_share(part, li).collect()}
    assert got and all(0 <= p <= t for p, t in got.values())
    joined = (li.join(part.select("p_partkey", "p_type"),
                      li.l_partkey == F.col("p_partkey"))
                .groupBy(F.date_trunc("month", "l_shipdate").alias("m"),
                         "p_type")
                .agg(F.sum(relational._revenue_micro()).alias("r")))
    per_type = {(r.m, r.p_type): r.r for r in joined.collect()}
    months = {m for m, _t in per_type}
    for m in months:
        promo = per_type.get((m, relational._PART_TYPE), 0)
        total = sum(v for (mm, _t), v in per_type.items() if mm == m)
        assert got[m] == (promo, total)


def test_global_threshold_shapes_avoid_single_partition_window(spark):
    """r6 scale-shape fix (VERDICT r5 #4): the Q15/Q11 group-vs-global
    decorrelations must compute the global max/total as a 1-row agg
    broadcast-joined back onto the PERSISTED per-key aggregate — never a
    single-partition WindowExec over a data-sized relation — with values
    unchanged (checked against an independent two-collect recompute)."""
    from logstash_filter_geoip_spark.operators import relational
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    sup = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")

    q15 = relational.top_supplier_revenue(sup, li)
    q11 = relational.important_parts(li)
    for df in (q15, q11):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "InMemoryTableScan" in plan, plan       # the persist barrier

    per = {r.l_partkey: r.revenue_u
           for r in li.groupBy("l_partkey")
                      .agg(F.sum(relational._revenue_micro())
                            .alias("revenue_u")).collect()}
    tot = sum(per.values())
    num, den = relational._Q11_FRACTION
    expect11 = {(k, v) for k, v in per.items() if v > (tot * num) // den}
    assert {(r.l_partkey, r.revenue_u) for r in q11.collect()} == expect11

    rev = {r.l_suppkey: r.total_revenue_u
           for r in li.where(
               (F.col("l_shipdate") >= F.lit(relational._Q15_START)
                .cast("timestamp"))
               & (F.col("l_shipdate") < F.lit(relational._Q15_END)
                  .cast("timestamp")))
             .groupBy("l_suppkey")
             .agg(F.sum(relational._revenue_micro())
                   .alias("total_revenue_u")).collect()}
    mx = max(rev.values())
    winners = {k for k, v in rev.items() if v == mx}
    assert {r.s_suppkey for r in q15.collect()} == winners
    spark.catalog.clearCache()                  # release the two persists
