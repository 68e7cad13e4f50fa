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


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _py_triangles(edge_list):
    """Independent reference: adjacency sets + itertools, no orientation."""
    import itertools
    adj = {}
    for s, d in edge_list:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {n: len(vs) for n, vs in adj.items()}
    tri = {n: 0 for n in adj}
    for n in adj:
        for u, v in itertools.combinations(sorted(adj[n]), 2):
            if v in adj[u]:
                tri[n] += 1
    return {n: (deg[n], tri[n]) for n in adj}


TRI_CRAFTED = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (4, 5),
               (2, 1), (5, 5), (None, 1), (2, None)]


def test_triangle_crafted_matrix(spark):
    """Two triangles {1,2,3} and {3,4,5}; reverse/parallel duplicates
    collapse, self-loops and NULL endpoints drop."""
    e = _edges(spark, TRI_CRAFTED, "src long, dst long")
    got = {r["node"]: (r["degree"], r["n_tri"])
           for r in graph.triangle_count(e).collect()}
    assert got == {1: (2, 1), 2: (2, 1), 3: (4, 2), 4: (2, 1), 5: (2, 1)}


def test_triangle_isolated_in_no_triangle_is_zero(spark):
    e = _edges(spark, [(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in graph.triangle_count(e).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_triangle_empty_graph_is_empty(spark):
    e = _edges(spark, [], "src long, dst long")
    assert graph.triangle_count(e).count() == 0


def test_triangle_three_engine_fuzz(spark):
    """Seeded random multigraph: Spark degree-oriented enumeration ==
    DuckDB independent 3-way-join oracle == pure-Python adjacency-set
    recompute, node for node."""
    import random

    import duckdb

    rng = random.Random(1501)
    rows = [(rng.randrange(40), rng.randrange(40)) for _ in range(600)]
    rows += [(7, None), (None, 3), (9, 9)]
    got = {r["node"]: (r["degree"], r["n_tri"]) for r in graph.triangle_count(
        _edges(spark, rows, "src long, dst long")).collect()}
    want = _py_triangles(rows)
    assert got == want
    vals = ", ".join(
        f"({'NULL' if s is None else s}, {'NULL' if d is None else d})"
        for s, d in rows)
    sql = graph.triangle_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(src, dst)")
    duck = {n: (deg, t) for n, deg, t in
            duckdb.connect().execute(sql).fetchall()}
    assert duck == want


def test_triangle_plan_no_broadcast_all_merge(spark):
    """Every side relation (degrees, oriented edges, closure edges,
    per-node counts) is corpus-derived: ZERO BroadcastExchange; the wedge
    self-join and the closure join are keyed SMJs; no Python nodes. With
    the default cache=True the multiply-referenced relations come from the
    persisted barrier (InMemoryTableScan), not re-derivation."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = docs.select((F.col("doc_id") % 50).alias("src"),
                    (F.col("doc_id") % 97).alias("dst"))
    plan = checks.simple_plan(graph.triangle_count(e, cache=False))
    assert "BroadcastExchange" not in plan, plan[:4000]
    assert plan.count("SortMergeJoin") == 6, plan[:4000]
    # the closure probe hashes the edge side instead of SORTING the
    # O(m^1.5) wedge relation (measured 51 s -> 23 s at sf0.1)
    assert plan.count("ShuffledHashJoin") == 1, plan[:4000]
    assert "EvalPython" not in plan, plan[:4000]
    cached = graph.triangle_count(e, cache=True)
    cplan = checks.simple_plan(cached)
    assert "BroadcastExchange" not in cplan, cplan[:4000]
    assert cplan.count("InMemoryTableScan") >= 6, cplan[:4000]


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------


def _py_kcore(edge_list, k):
    """Independent reference: simultaneous-peel rounds over adjacency sets."""
    adj = {}
    for s, d in edge_list:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    while True:
        weak = {n for n, vs in adj.items() if len(vs) < k}
        if not weak:
            return {n: len(vs) for n, vs in adj.items()}
        adj = {n: vs - weak for n, vs in adj.items() if n not in weak}


def test_kcore_clique_with_tail(spark):
    """4-clique + a pendant path: k=2 peels the path one node per round
    (the sequential cascade that makes peeling iterative), leaving the
    clique with within-core degree 3."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 9), (9, 10), (10, 11)]
    e = _edges(spark, clique + tail, "src long, dst long")
    got = {r.node: r.degree for r in graph.k_core(e, k=2).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert got == _py_kcore(clique + tail, 2)


def test_kcore_k1_keeps_every_edge_node_and_too_high_k_empties(spark):
    e = _edges(spark, [(1, 2), (2, 3)], "src long, dst long")
    assert {r.node for r in graph.k_core(e, k=1).collect()} == {1, 2, 3}
    assert graph.k_core(e, k=3).count() == 0
    with pytest.raises(ValueError, match="k_core"):
        graph.k_core(e, k=0)


def test_kcore_three_engine_fuzz(spark):
    """Seeded random multigraph: Spark fixpoint peel == DuckDB unrolled
    CTE chain == pure-Python peel, node for node with degrees."""
    import random

    import duckdb

    rng = random.Random(1504)
    rows = [(rng.randrange(40), rng.randrange(40)) for _ in range(500)]
    rows += [(None, 2), (5, None), (8, 8)]
    for k in (3, 8, 14):
        got = {r.node: r.degree for r in graph.k_core(
            _edges(spark, rows, "src long, dst long"), k=k).collect()}
        want = _py_kcore(rows, k)
        assert got == want, k
        vals = ", ".join(
            f"({'NULL' if s is None else s}, {'NULL' if d is None else d})"
            for s, d in rows)
        sql = graph.kcore_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) AS v(src, dst)", k, rounds=45)
        duck = dict(duckdb.connect().execute(sql).fetchall())
        assert duck == want, k


def test_kcore_driver_oracle_convergence_margin(spark):
    """The driver oracle is exact only if sf0.01 converges within the
    unroll depth: rounds-1 must already equal rounds (a no-op tail), so
    the depth carries real margin over the observed 5 peel rounds."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.01/lineitem.parquet')")
    a = con.execute(graph.kcore_oracle_sql(
        graph.PART_EDGES_SQL, graph.KCORE_K,
        rounds=graph.KCORE_ORACLE_ROUNDS)).fetchall()
    b = con.execute(graph.kcore_oracle_sql(
        graph.PART_EDGES_SQL, graph.KCORE_K,
        rounds=graph.KCORE_ORACLE_ROUNDS - 1)).fetchall()
    assert sorted(a) == sorted(b) and len(a) > 0


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def _py_lpa(edge_list, n_rounds):
    """Independent reference: synchronous rounds over adjacency sets,
    (count desc, label asc) arg-max."""
    from collections import Counter
    adj = {}
    for s, d in edge_list:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    lab = {n: n for n in adj}
    for _ in range(n_rounds):
        new = {}
        for n, vs in adj.items():
            c = Counter(lab[v] for v in vs)
            new[n] = min(l for l, k in c.items() if k == max(c.values()))
        lab = new
    return lab


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: after 3 synchronous
    rounds each clique converges to its minimum id, the bridge does not
    merge them (one weak vote against three strong ones)."""
    c1 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    c2 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    bridge = [(4, 10)]
    rows = c1 + c2 + bridge
    got = {r.node: r.label for r in graph.label_propagation(
        _edges(spark, rows, "src long, dst long")).collect()}
    assert got == _py_lpa(rows, graph.LPA_ROUNDS)
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}


def test_lpa_guard_and_round_count_matters(spark):
    e = _edges(spark, [(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="n_rounds"):
        graph.label_propagation(e, n_rounds=0)
    one = {r.node: r.label for r in
           graph.label_propagation(e, n_rounds=1).collect()}
    assert one == _py_lpa([(1, 2), (2, 3)], 1)


def test_lpa_three_engine_fuzz(spark):
    """Seeded random multigraph at two round counts: Spark == DuckDB
    unrolled CTE == pure-Python synchronous recompute, node for node."""
    import random

    import duckdb

    rng = random.Random(1505)
    rows = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    rows += [(None, 2), (5, None), (8, 8)]
    vals = ", ".join(
        f"({'NULL' if s is None else s}, {'NULL' if d is None else d})"
        for s, d in rows)
    for rounds in (1, 4):
        got = {r.node: r.label for r in graph.label_propagation(
            _edges(spark, rows, "src long, dst long"),
            n_rounds=rounds).collect()}
        want = _py_lpa(rows, rounds)
        assert got == want, rounds
        duck = dict(duckdb.connect().execute(graph.lpa_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) AS v(src, dst)",
            n_rounds=rounds)).fetchall())
        assert duck == want, rounds


# ---------------------------------------------------------------------------
# cooccurrence_edges (the derivation skew guard)
# ---------------------------------------------------------------------------


def test_cooccurrence_mega_basket_excluded(spark):
    """One adversarial mega-basket would explode into C(n, 2) pair rows
    on a single hot join key — it is excluded entirely; normal baskets
    keep their pairs; duplicate (basket, item) rows don't inflate the
    distinct-size cap."""
    rows = ([(1, 10), (1, 11), (1, 12), (2, 10), (2, 13), (2, 13)]
            + [(99, i) for i in range(40)])
    df = spark.createDataFrame(rows, "k long, i long")
    # pair INSTANCES, not distinct pairs — every consumer canonicalizes
    got = sorted({tuple(r) for r in graph.cooccurrence_edges(
        df, "k", "i", max_basket=8).collect()})
    assert got == [(10, 11), (10, 12), (10, 13), (11, 12)]
    with pytest.raises(ValueError, match="max_basket"):
        graph.cooccurrence_edges(df, "k", "i", max_basket=1)


def test_cooccurrence_cap_vacuous_on_gate_data(spark):
    """Every TPC-H-shaped order sits far under the cap: the guarded
    derivation equals the unguarded self-join on the gate corpus, so all
    three graph oracles' values are unchanged by the cap."""
    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
               .select("l_orderkey", "l_partkey"))
    guarded = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    a = li.selectExpr("l_orderkey AS k", "l_partkey AS src")
    b = li.selectExpr("l_orderkey AS k", "l_partkey AS dst")
    raw = (a.join(b, "k").where("src < dst").select("src", "dst"))
    assert (sorted(map(tuple, guarded.collect()))
            == sorted(map(tuple, raw.collect())))
