"""Association-rule semantics (operators/basket.py): hand-computed crafted
matrix, 3-engine seeded fuzz (Spark == DuckDB == pure-Python integer
recompute), the max_basket exclusion contract, guards, and the plan shape.
Oracle parity at sf0.01 (basket_rules) is covered by test_oracle_parity."""

from __future__ import annotations

import pytest

from logstash_filter_geoip_spark.operators import basket
from logstash_filter_geoip_spark.plans import checks

PPM = basket.PPM


def _py_rules(rows, min_pair_n=1, max_basket=basket.MAX_BASKET):
    """Independent reference: dict folds, exact integer arithmetic."""
    from collections import Counter
    from itertools import combinations

    baskets = {}
    for b, i in rows:
        if b is None or i is None:
            continue
        baskets.setdefault(b, set()).add(i)
    kept = {b: s for b, s in baskets.items() if len(s) <= max_basket}
    n = len(kept)
    c = Counter(i for s in kept.values() for i in s)
    pair = Counter()
    for s in kept.values():
        for a, b2 in combinations(sorted(s), 2):
            pair[(a, b2)] += 1
    out = {}
    for (a, b2), pn in pair.items():
        if pn < min_pair_n:
            continue
        for ant, cons in ((a, b2), (b2, a)):
            out[(ant, cons)] = (pn, pn * PPM // n, pn * PPM // c[ant],
                                pn * n * PPM // (c[ant] * c[cons]))
    return out


def _collect(df):
    return {(r.antecedent, r.consequent):
            (r.pair_n, r.support_ppm, r.confidence_ppm, r.lift_ppm)
            for r in df.collect()}


CRAFTED = [(1, "x"), (1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"),
           (3, "x"), (4, "y"), (4, "z"),
           (5, "p"), (5, "q"), (5, "r"), (5, "s"),   # oversized at cap 3
           (None, "x"), (1, None)]


def test_rules_crafted_matrix(spark):
    """Hand-computed support/confidence/lift; duplicates collapse, NULLs
    drop, the 4-item basket is excluded entirely at max_basket=3."""
    df = spark.createDataFrame(CRAFTED, "b long, i string")
    got = _collect(basket.association_rules(df, "b", "i", max_basket=3))
    assert got == {
        ("x", "y"): (2, 500000, 666666, 888888),
        ("y", "x"): (2, 500000, 666666, 888888),
        ("x", "z"): (1, 250000, 333333, 666666),
        ("z", "x"): (1, 250000, 500000, 666666),
        ("y", "z"): (2, 500000, 666666, 1333333),
        ("z", "y"): (2, 500000, 1000000, 1333333),
    }
    assert got == _py_rules(CRAFTED, max_basket=3)


def test_rules_min_pair_n_prunes_both_directions(spark):
    df = spark.createDataFrame(CRAFTED, "b long, i string")
    got = _collect(basket.association_rules(df, "b", "i", min_pair_n=2,
                                            max_basket=3))
    assert set(got) == {("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")}


def test_rules_empty_and_guard(spark):
    df = spark.createDataFrame([], "b long, i string")
    assert basket.association_rules(df, "b", "i").count() == 0
    with pytest.raises(ValueError, match="max_basket"):
        basket.association_rules(df, "b", "i", max_basket=1)


def test_rules_three_engine_fuzz(spark):
    """Seeded random baskets: Spark == DuckDB oracle == pure-Python
    integer recompute, rule for rule (values, not just membership)."""
    import random

    import duckdb

    rng = random.Random(1502)
    rows = [(rng.randrange(60), rng.randrange(12)) for _ in range(700)]
    rows += [(None, 1), (3, None)]
    df = spark.createDataFrame(rows, "b long, i long")
    got = _collect(basket.association_rules(df, "b", "i", min_pair_n=2,
                                            max_basket=9))
    want = _py_rules(rows, min_pair_n=2, max_basket=9)
    assert got == want
    vals = ", ".join(
        f"({'NULL' if b is None else b}, {'NULL' if i is None else i})"
        for b, i in rows)
    sql = basket.rules_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(b, i)", min_pair_n=2,
        max_basket=9)
    duck = {(a, c): tuple(rest) for a, c, *rest in
            duckdb.connect().execute(sql).fetchall()}
    assert duck == want


def test_rules_plan_merge_joins_one_row_cross_only(spark):
    """Item counts and pair counts are corpus-derived -> merge-hinted SMJs;
    the ONLY broadcast is the 1-row totals crossJoin (the dq_summary
    convention); no Python nodes."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.selectExpr("l_orderkey as b", "l_partkey as i")
    plan = checks.simple_plan(
        basket.association_rules(df, "b", "i", cache=False))
    assert plan.count("SortMergeJoin") == 10, plan[:4000]
    assert "BroadcastHashJoin" not in plan, plan[:4000]
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan[:4000]
    assert "EvalPython" not in plan, plan[:4000]
    # cached variant: the multiply-referenced relations come from the
    # persisted barrier (explain repeats the cached subtree under each
    # InMemoryTableScan, so node COUNTS are only meaningful uncached)
    cplan = checks.simple_plan(basket.association_rules(df, "b", "i"))
    assert cplan.count("InMemoryTableScan") >= 7, cplan[:4000]
    assert "BroadcastHashJoin" not in cplan, cplan[:4000]
