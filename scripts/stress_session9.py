"""Scale-stress the session-9 operators (COVERAGE.md convention): replicate
sf0.1 documents to ~1M rows, measure one pass each on local[32], print one
line per reading plus the sha2 control for window calibration.

Two corpora:
  * realistic — every replica's tokens carry a replica suffix, so
    cross-replica duplication vanishes and the corpus keeps the base dup
    rate (~8% of spans); 1M docs.
  * worstcase — verbatim x20 replication (100k docs): ~100% of spans
    duplicated AND removable, stressing the coverage-explode path of the
    ExactSubstr audit at its theoretical maximum.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import (dedup, packing,
                                                   relational, retrieval,
                                                   text_ops)
from logstash_filter_geoip_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress9", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def replicate(n, suffixed):
        d = docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(n))))
        if suffixed:
            d = d.withColumn(
                "text", F.regexp_replace(
                    F.col("text"), F.lit("([a-z0-9]+)"),
                    F.concat(F.lit("$1x"), F.col("rep").cast("string"))))
        return (d.withColumn("doc_id",
                             F.col("doc_id") * n + F.col("rep") - 1)
                 .drop("rep"))

    realistic = replicate(200, True)   # 1M docs
    worst = replicate(20, False)       # 100k docs, all-dup

    # control: the embarrassingly-parallel codegen ceiling of this window
    timed("control_sha2_1M", lambda: realistic.select(
        F.sha2(F.col("text"), 256).alias("h")).agg(
            F.count_distinct("h")).collect()[0][0])

    timed("substring_spans_realistic_1M", lambda: dedup.substring_span_stats(
        realistic, width=8).agg(
            F.sum("n_removed_tokens"), F.sum("n_dup_spans")).collect()[0][0])
    timed("substring_spans_worstcase_100k", lambda:
          dedup.substring_span_stats(worst, width=8).agg(
              F.sum("n_removed_tokens"), F.sum("n_dup_spans")).collect()[0][0])

    timed("gopher_rules_1M", lambda: text_ops.gopher_rules(realistic).agg(
        F.sum("keep_gopher"), F.sum("n_stop_kinds")).collect()[0][1])

    timed("bm25_topk_1M", lambda: len(retrieval.bm25_topk(
        realistic, ["dupx7", "mergex3", "vectorx9"], k=25).collect()))
    timed("bm25_multi_1M", lambda: len(retrieval.bm25_multi_topk(
        realistic, retrieval._multi_queries_df(spark), k=5).collect()))
    post = retrieval.build_postings(realistic).persist()
    timed("build_postings_1M", lambda: post.count())
    timed("bm25_multi_prebuilt_1M", lambda: len(retrieval.bm25_multi_topk(
        realistic, spark.createDataFrame(
            [(1, "dupx7"), (2, "mergex3")], "query_id long, term string"),
        k=5, postings=post).collect()))
    post.unpersist()

    timed("global_shuffle_1M", lambda: packing.global_shuffle(
        realistic, n_shards=64).agg(F.max("pos")).collect()[0][0])

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("small_qty_revenue_600k_smj", lambda:
          relational.small_quantity_revenue(pt, li).collect())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.stop()


if __name__ == "__main__":
    main()
