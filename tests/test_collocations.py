"""Collocation mining (text_ops.collocations): lift ranking, min_count
guard, exact counts, Python reference equality, and the plan shape
(merge-hinted vocab joins, TakeOrderedAndProject top-k)."""

from __future__ import annotations

from collections import Counter

from logstash_filter_geoip_spark.operators.text_ops import collocations


def _py_lift(texts, min_count):
    uni, bg = Counter(), Counter()
    import re
    for t in texts:
        tk = re.findall("[a-z0-9]+", t.lower())
        uni.update(tk)
        bg.update(zip(tk, tk[1:]))
    n = sum(uni.values())
    m = sum(bg.values())
    out = {}
    for (a, b), c in bg.items():
        if c >= min_count:
            out[(a, b)] = (c, uni[a], uni[b],
                           float(c) * n * n / (float(m) * uni[a] * uni[b]))
    return out


def test_collocations_crafted(spark):
    """'san francisco' always co-occurs (high lift); 'the' pairs with
    everything (low lift); pairs under min_count vanish."""
    texts = (["san francisco is the bay"] * 6
             + ["the dog ran", "the cat sat", "the bay area"] * 4
             + ["rare pair here"])  # 'rare pair' appears once -> filtered
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.lift)
           for r in collocations(df, k=50, min_count=2).collect()}
    want = _py_lift(texts, 2)
    assert got == want  # bit-identical incl. the double lift
    assert ("rare", "pair") not in got
    assert got[("san", "francisco")][3] > got[("is", "the")][3]
    # exclusive pairs (words that appear ONLY together) hit the lift
    # ceiling N²/(M·c): ("dog","ran") with c=4 outranks ("san","francisco")
    # with c=6 — rarer exclusive pairs rank higher, the expected lift shape
    assert got[("dog", "ran")][3] > got[("san", "francisco")][3]


def test_collocations_top_k_and_order(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = collocations(docs, k=10, min_count=2).collect()
    assert len(rows) <= 10
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_collocations_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = collocations(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "Python" not in plan, plan[:3000]
    # vocab joins stay merge-hinted; only the 1-row totals broadcast
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
