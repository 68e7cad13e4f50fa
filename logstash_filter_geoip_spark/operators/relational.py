"""Large-to-large relational joins over the warehouse tables — the shuffle
side of the engine's join story.

Every hot-path join elsewhere in the repo is broadcast by design (the
dimension side is bounded: GeoLite2 dims, group stats, benchmark n-grams).
A 100-TB engine also needs the OTHER regime — two data-sized relations
joined on a shuffle key — so these operators exercise it explicitly in the
classic decision-support shapes (TPC-H Q3/Q4 simplified to the synthetic
tables' columns):

  * ``priority_semi_counts`` — orders LEFT SEMI lineitem: "orders with at
    least one returned lineitem, counted by priority". Semi-join semantics
    (no fan-out, no dedup needed) keyed on the join column both relations
    would be bucketed/partitioned by at scale; integer outputs only.
  * ``ship_priority_topk`` — the bounded customer dimension broadcasts
    into orders, the orders→lineitem leg shuffles on orderkey, revenue
    aggregates per order two-phase, and a TakeOrderedAndProject keeps the
    global top-k without a full sort.

Scale notes (100 TB): both plans shuffle ONLY on the natural join/group
key (l_orderkey/o_orderkey — co-partitionable, bucket-join-able at rest;
with storage bucketing on orderkey both Exchanges vanish), AQE re-plans
skewed partitions, and the per-order revenue sum is ≤ lines-per-order
values so the float is far inside the oracle's 6-decimal window (never a
corpus-sized float sum, which 6dp could not survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_SEGMENT = "BUILDING"
_CUTOFF = "2000-01-01"


def returned_order_priorities(orders: DataFrame,
                              lineitem: DataFrame) -> DataFrame:
    """Orders with ≥1 returned line (l_returnflag = 'R'), counted by
    o_orderpriority — EXISTS via LEFT SEMI, so no fan-out and no distinct."""
    returned = lineitem.where(F.col("l_returnflag") == "R") \
                       .select("l_orderkey")
    return (orders.join(returned,
                        orders.o_orderkey == returned.l_orderkey, "left_semi")
                  .groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("n_orders")))


def ship_priority(customer: DataFrame, orders: DataFrame,
                  lineitem: DataFrame, segment: str = _SEGMENT,
                  cutoff: str = _CUTOFF, k: int = 10) -> DataFrame:
    """Top-k revenue orders for one market segment with lines shipped
    after the cutoff (TPC-H Q3 shape; total order under (revenue desc,
    orderkey) so the selected set is unique)."""
    cust = customer.where(F.col("c_mktsegment") == segment) \
                   .select("c_custkey")
    ords = orders.join(F.broadcast(cust),
                       orders.o_custkey == cust.c_custkey) \
                 .select("o_orderkey", "o_orderdate", "o_orderpriority")
    lines = lineitem.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (lines.join(ords, lines.l_orderkey == ords.o_orderkey)
                 .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
                 .agg(F.sum(rev).alias("revenue"))
                 .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
                 .limit(k))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_priority_semi_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-to-large LEFT SEMI join (orders ⋉ returned lineitems) with a
    two-phase priority count — the shuffle-join regime, integer outputs."""
    return returned_order_priorities(_t(spark, sf_dir, "orders"),
                                     _t(spark, sf_dir, "lineitem"))


def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast customer filter, orderkey shuffle join,
    per-order revenue, global top-10 via TakeOrderedAndProject."""
    return ship_priority(_t(spark, sf_dir, "customer"),
                         _t(spark, sf_dir, "orders"),
                         _t(spark, sf_dir, "lineitem"))


def queries():
    return {
        "priority_semi_counts": q_priority_semi_counts,
        "ship_priority": q_ship_priority,
    }


def oracles() -> dict[str, str]:
    return {
        "priority_semi_counts": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
        "ship_priority": f"""
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate, o.o_orderpriority,
       sum(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{_SEGMENT}'
  AND l.l_shipdate > TIMESTAMP '{_CUTOFF} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    }
