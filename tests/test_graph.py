"""PageRank semantics (operators/graph.py): independent pure-Python
reference equality, weighted==parallel-edge equivalence, structural sanity
(hubs outrank leaves; mass bounded), guards, and the no-broadcast plan
contract. Oracle parity at sf0.01 (domain_pagerank) is covered by
test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import graph
from logstash_filter_geoip_spark.plans import checks


def _edges(spark, rows, schema="src string, dst string"):
    return spark.createDataFrame(rows, schema)


def _py_pagerank(edge_list, n_iter=graph.N_ITER, damping=graph.DAMPING):
    """Independent reference: same formula, same constants, plain dicts."""
    w = {}
    for s, d in edge_list:
        w[(s, d)] = w.get((s, d), 0) + 1
    out_w = {}
    for (s, _), c in w.items():
        out_w[s] = out_w.get(s, 0) + c
    nodes = sorted({s for s, _ in w} | {d for _, d in w})
    n = len(nodes)
    rank = {x: 1.0 / n for x in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = {x: 0.0 for x in nodes}
        for (s, d), c in w.items():
            contrib[d] += rank[s] * c / out_w[s]
        rank = {x: base + damping * contrib[x] for x in nodes}
    return rank


CRAFTED = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
           ("d", "c"), ("b", "d"), ("e", "e")]


def test_pagerank_matches_python_reference(spark):
    got = {r["node"]: r["pagerank"] for r in
           graph.pagerank(_edges(spark, CRAFTED)).collect()}
    want = _py_pagerank(CRAFTED)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_pagerank_weighted_equals_parallel_edges(spark):
    """An explicit weight column is exactly equivalent to repeating the
    edge that many times — the collapse-then-weight contract."""
    weighted = _edges(spark, [("a", "b", 2), ("b", "a", 1), ("a", "c", 1)],
                      "src string, dst string, n long")
    parallel = _edges(spark, [("a", "b"), ("a", "b"), ("b", "a"),
                              ("a", "c")])
    gw = {r["node"]: r["pagerank"] for r in
          graph.pagerank(weighted, weight="n").collect()}
    gp = {r["node"]: r["pagerank"] for r in
          graph.pagerank(parallel).collect()}
    assert gw == gp


def test_pagerank_structure_and_mass(spark):
    """Everything links to the hub -> the hub outranks every leaf; total
    mass stays in (0, 1] (dangling leak only ever removes mass)."""
    rows = [(f"leaf{i}", "hub") for i in range(6)] + [("hub", "leaf0")]
    got = {r["node"]: r["pagerank"] for r in
           graph.pagerank(_edges(spark, rows)).collect()}
    assert got["hub"] == max(got.values())
    assert all(got["hub"] > v for k, v in got.items() if k != "hub")
    assert 0 < sum(got.values()) <= 1.0 + 1e-9


def test_pagerank_empty_graph_raises(spark):
    with pytest.raises(ValueError, match="empty"):
        graph.pagerank(_edges(spark, [], "src string, dst string"))


def test_pagerank_repartition_stable(spark):
    e = _edges(spark, CRAFTED)
    a = {r["node"]: r["pagerank"] for r in graph.pagerank(e).collect()}
    b = {r["node"]: r["pagerank"] for r in
         graph.pagerank(e.repartition(13, "dst")).collect()}
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_pagerank_plan_never_broadcasts_graph_sides(spark):
    """Edges, out-weights, nodes, and ranks are all data-sized at web
    scale: with checkpoint=False and one iteration, the full declarative
    plan must contain ZERO BroadcastExchange (every join merge-hinted) —
    the session-10 static-estimate rule applied to graph state."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = docs.select((F.col("doc_id") % 50).cast("string").alias("src"),
                    (F.col("doc_id") % 97).cast("string").alias("dst"))
    plan = checks.simple_plan(graph.pagerank(e, n_iter=1, checkpoint=False))
    assert "BroadcastExchange" not in plan, plan[:4000]
    assert plan.count("SortMergeJoin") >= 2, plan[:4000]


def test_pagerank_fractional_weight_raises(spark):
    """Fractional weights would silently truncate to 0 under the long cast
    (zeroing edges AND out-weights -> NaN ranks) — the guard fails loudly
    instead; integral weights of any width stay accepted."""
    frac = _edges(spark, [("a", "b", 0.5)],
                  "src string, dst string, w double")
    with pytest.raises(ValueError, match="integral"):
        graph.pagerank(frac, weight="w")
    ok = _edges(spark, [("a", "b", 2), ("b", "a", 1)],
                "src string, dst string, w int")
    assert graph.pagerank(ok, weight="w").count() == 2
