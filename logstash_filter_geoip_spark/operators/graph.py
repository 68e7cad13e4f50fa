"""Iterative graph analytics: weighted PageRank over an edge relation.

The web-pipeline companion to ``dedup.dedup_components`` (connected
components): where components answer "which docs are the same", PageRank
answers "which domains are authoritative" — the classic domain-quality
prior a crawl/curation pipeline feeds into sampling weights. The driver
query ranks the registered-domain transition graph derived from the
events URL stream.

Semantics (ONE definition, mirrored token-for-token in the oracle): the
simple damped iteration

    rank_{i+1}(n) = (1 - d)/N + d * SUM_{m->n} rank_i(m) * w(m,n) / out_w(m)

with N = |nodes|, out_w(m) = total outgoing edge weight of m, fixed
``n_iter`` iterations from the uniform 1/N start. Dangling nodes (no
out-edges) leak their mass — the textbook simple variant, identical in
both engines by construction; self-loops are kept. All scalar constants
are evaluated in IEEE double with the SAME operation order in both
engines ((1-d)/N, rank*w/out_w left-to-right), so per-element arithmetic
is bit-identical; only the per-node contribution SUM order differs
(1e-16-grade noise, far under the oracle's 6dp rounding).

Scale shape (100 TB): edges/nodes/ranks are all data-sized relations —
every join is a keyed shuffle join (merge-hinted per the session-10
static-estimate rule; nothing corpus-derived is ever broadcast), the
contribution aggregate is two-phase on dst, and each iteration's rank
relation is localCheckpoint'ed so the plan stays one-iteration deep (the
dedup_components loop discipline).

The oracle is the k-times UNROLLED CTE chain (pr0..prK) — fixed-iteration
loops need no recursion, and unrolling sidesteps the SQL restriction on
aggregates in recursive terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_ITER = 5
DAMPING = 0.85


def pagerank(edges: DataFrame, n_iter: int = N_ITER,
             damping: float = DAMPING, src: str = "src", dst: str = "dst",
             weight: str | None = None,
             checkpoint: bool = True) -> DataFrame:
    """(node, pagerank) after ``n_iter`` damped iterations over the edge
    relation; parallel edges collapse into summed weights (weight=None →
    each edge counts 1). Raises on an empty graph.

    ``checkpoint=False`` keeps the full declarative plan (used by the plan
    contract test); production leaves it True — an O(n_iter)-deep joined
    plan re-executes every prior iteration at each reference otherwise.
    """
    if weight is not None:
        wtype = dict(edges.dtypes).get(weight, "")
        if wtype in ("float", "double") or wtype.startswith("decimal"):
            raise ValueError(
                f"pagerank: weight column {weight!r} is {wtype} — weights "
                f"must be integral (a fractional weight would silently "
                f"truncate under the long cast: 0.5 -> 0 zeroes the edge "
                f"AND its out-weight, yielding NaN ranks). Scale "
                f"fractional weights to integer units first.")
    w = (F.col(weight) if weight is not None else F.lit(1))
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      w.cast("long").alias("w"))
              .groupBy("src", "dst").agg(F.sum("w").alias("w")))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    nodes = (e.select(F.col("src").alias("node"))
              .unionByName(e.select(F.col("dst").alias("node")))
              .distinct())
    ew = e.join(out_w.hint("merge"), "src")
    if checkpoint:
        ew = ew.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge relation (no nodes)")
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=True)
    for _ in range(n_iter):
        contrib = (ew.join(ranks.withColumnRenamed("node", "src")
                               .hint("merge"), "src")
                     .select("dst", (F.col("rank") * F.col("w")
                                     / F.col("out_w")).alias("c"))
                     .groupBy("dst").agg(F.sum("c").alias("contrib")))
        ranks = (nodes.join(contrib.withColumnRenamed("dst", "node")
                                   .hint("merge"), "node", "left")
                      .select("node",
                              (F.lit(base) + F.lit(damping)
                               * F.coalesce("contrib", F.lit(0.0)))
                              .alias("rank")))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("rank").alias("pagerank"))


def pagerank_oracle_sql(edges_sql: str, n_iter: int = N_ITER,
                        damping: float = DAMPING) -> str:
    """DuckDB mirror: the iteration UNROLLED into a pr0..prK CTE chain.
    ``edges_sql`` must select (src, dst, w). Every float constant carries
    an explicit DOUBLE cast (DuckDB types bare decimal literals DECIMAL,
    whose arithmetic diverges from the IEEE doubles Spark uses)."""
    d = f"CAST({damping!r} AS DOUBLE)"
    base = (f"(CAST(1 AS DOUBLE) - {d}) / (SELECT count(*) FROM nodes)")
    init = "CAST(1 AS DOUBLE) / (SELECT count(*) FROM nodes)"
    ctes = [f"""raw_edges AS ({edges_sql}),
agg_e AS (
  SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM raw_edges GROUP BY 1, 2
),
out_w AS (SELECT src, sum(w) AS out_w FROM agg_e GROUP BY src),
nodes AS (SELECT src AS node FROM agg_e UNION SELECT dst FROM agg_e),
pr0 AS (SELECT node, {init} AS rank FROM nodes)"""]
    for i in range(1, n_iter + 1):
        ctes.append(f"""pr{i} AS (
  SELECT n.node,
         {base} + {d} * coalesce(c.contrib, CAST(0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(p.rank * e.w / o.out_w) AS contrib
    FROM agg_e e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN out_w o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.dst = n.node
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank AS pagerank FROM pr{n_iter}\n")


# ---------------------------------------------------------------------------
# driver contract: registered-domain transition graph from the URL stream
# ---------------------------------------------------------------------------


def domain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (src, dst) domain transitions: per user, each event's
    registered domain links from the previous one (ts, event_id order);
    rows whose URL does not parse contribute no edge on either end."""
    from pyspark.sql import Window
    from logstash_filter_geoip_spark.operators import web
    urls = web.url_normalize(web._events_urls(spark, sf_dir))
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = urls.select(
        F.lag("registered_domain").over(win).alias("src"),
        F.col("registered_domain").alias("dst"))
    return seq.where(F.col("src").isNotNull() & F.col("dst").isNotNull())


def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank(domain_edges(spark, sf_dir))


def queries():
    return {"domain_pagerank": q_domain_pagerank}


def oracles() -> dict[str, str]:
    from logstash_filter_geoip_spark.operators import web
    regdom = web.registered_domain_sql(
        web.url_part_exprs("url", "duckdb")["host"])
    edges_sql = f"""
  SELECT src, dst, 1 AS w FROM (
    SELECT lag(dom) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS src,
           dom AS dst
    FROM (SELECT event_id, user_id, ts, {regdom} AS dom
          FROM (SELECT event_id, user_id, ts,
                       {web.URL_CASES_SQL} AS url FROM events) u) dm
  ) seq WHERE src IS NOT NULL AND dst IS NOT NULL"""
    return {"domain_pagerank": pagerank_oracle_sql(edges_sql)}
