"""Scale-stress the session-15 operators (COVERAGE.md convention): the
bought-together graph replicated ×4 (≈3.5M canonical edges / 80k nodes),
part-level association rules over the full 600k-row lineitem, the FK audit
over 2M events, one pass each on local[32], plus the sha2 control for
window calibration. Per CLAUDE.md, per-row/ per-node outputs drain through
aggregates so Catalyst cannot prune the computed columns."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import basket, dq, graph
from logstash_filter_geoip_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress15", master="local[32]",
                      shuffle_partitions=32)
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
               .select("l_orderkey", "l_partkey"))
    # x4 replication with DISJOINT order AND part domains: 4 independent
    # copies of the co-occurrence graph -> 4x nodes, 4x edges, identical
    # density (the honest scale-up: node count grows with data)
    big = (li.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(3))))
             .select((F.col("l_orderkey") * 4 + F.col("rep"))
                     .alias("l_orderkey"),
                     (F.col("l_partkey") * 4 + F.col("rep"))
                     .alias("l_partkey")))
    big.write.mode("overwrite").parquet("/tmp/stress15_li")
    big = spark.read.parquet("/tmp/stress15_li")

    timed("control_sha2_2.4M", lambda: big.select(
        F.sha2(F.concat_ws(":", "l_orderkey", "l_partkey"), 256).alias("h"))
        .agg(F.count_distinct("h")).collect()[0][0])

    a = big.select(F.col("l_orderkey").alias("k"),
                   F.col("l_partkey").alias("src"))
    b = big.select(F.col("l_orderkey").alias("k"),
                   F.col("l_partkey").alias("dst"))
    edges = (a.join(b, "k").where(F.col("src") < F.col("dst"))
              .select("src", "dst"))

    timed("triangle_count_3.5M_edges", lambda: graph.triangle_count(edges)
          .agg(F.count(F.lit(1)).alias("nodes"),
               F.sum("n_tri").alias("tri3")).collect()[0].asDict())

    timed("k_core_80_3.5M_edges", lambda: graph.k_core(edges, k=80)
          .agg(F.count(F.lit(1)).alias("nodes"),
               F.sum("degree").alias("deg")).collect()[0].asDict())

    timed("assoc_rules_partlevel_600k", lambda: basket.association_rules(
        li.selectExpr("l_orderkey AS b", "l_partkey AS i"), "b", "i",
        min_pair_n=2)
        .agg(F.count(F.lit(1)).alias("rules"),
             F.sum("lift_ppm").alias("lift_sum")).collect()[0].asDict())

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev2m = (ev.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
              .withColumn("user_id", F.col("user_id") * 20
                          + F.pmod(F.col("rep"), 20)).drop("rep"))
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    timed("fk_audit_2M_events", lambda: dq.fk_audit(
        [("ev_cust", ev2m, "user_id", cust, "c_custkey")])
        .collect()[0].asDict())

    spark.stop()


if __name__ == "__main__":
    main()
