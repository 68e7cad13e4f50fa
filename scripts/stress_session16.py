"""Scale-stress the session-16 operators (COVERAGE.md convention): the
embeddings table replicated ×100 with per-replica integer perturbation
(500k distinct 64-dim vectors — no artificial exact duplicates), documents
replicated ×20 with disjoint id domains and a per-replica token prefix
(100k docs whose cross-replica texts differ, so the containment candidate
universe scales honestly), one pass each on local[32], plus the sha2
control for window calibration. Per CLAUDE.md, per-row outputs drain
through aggregates so Catalyst cannot prune the computed columns."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import clustering, dedup, sampling
from logstash_filter_geoip_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress16", master="local[32]",
                      shuffle_partitions=32)

    # --- embeddings ×100: perturb one dim per replica so vectors are
    # distinct but the cluster structure (labels) is preserved
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    big_e = (emb.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                        F.lit(99))))
                .select((F.col("vec_id") + F.col("rep") * n)
                        .alias("vec_id"),
                        F.transform(
                            "embedding",
                            lambda x, i: x + F.when(
                                i == 0, F.col("rep") * 0.0001)
                            .otherwise(F.lit(0.0))).alias("embedding")))
    big_e.write.mode("overwrite").parquet("/tmp/stress16_emb")
    big_e = spark.read.parquet("/tmp/stress16_emb")

    timed("control_sha2_500k", lambda: big_e.select(
        F.sha2(F.col("vec_id").cast("string"), 256).alias("h"))
        .agg(F.count_distinct("h")).collect()[0][0])

    cents = []

    def train():
        cents.append(clustering.train_centroids(big_e))
        return f"k={len(cents[0])}"

    timed("kmeans_train_500k_x3rounds", train)
    timed("kmeans_assign_profile_500k", lambda: clustering.cluster_profile(
        big_e, cents[0]).agg(F.sum("n_members"), F.sum("inertia"))
        .collect()[0].asDict())

    # --- documents ×20: disjoint doc ids, and EVERY token prefixed with
    # the replica id so cross-replica shingle sets are DISJOINT — the
    # honest scale-up (20× distinct shingles at unchanged per-shingle
    # document frequency; a bare header prefix would leave replica bodies
    # shingle-identical and manufacture ~1M artificial near-dup pairs)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nd = docs.count()
    big_d = (docs.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                         F.lit(19))))
                 .select((F.col("doc_id") + F.col("rep") * nd)
                         .alias("doc_id"),
                         F.regexp_replace(
                             F.coalesce("text", F.lit("")),
                             F.lit("([a-z0-9]+)"),
                             F.concat(F.lit("r"),
                                      F.col("rep").cast("string"),
                                      F.lit("$1"))).alias("text"),
                         "lang", "source", "n_chars"))
    big_d.write.mode("overwrite").parquet("/tmp/stress16_docs")
    big_d = spark.read.parquet("/tmp/stress16_docs")

    timed("containment_pairs_100k_docs", lambda: dedup.containment_pairs(
        big_d).agg(F.count(F.lit(1)).alias("pairs"),
                   F.sum("n_shared").alias("sh")).collect()[0].asDict())

    timed("mixture_sample_100k_docs", lambda: sampling.mixture_sample(
        big_d, "lang", "doc_id", sampling.MIXTURE_TARGETS)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("sample_rank").alias("rk")).collect()[0].asDict())

    timed("control_sha2_500k", lambda: big_e.select(
        F.sha2(F.col("vec_id").cast("string"), 256).alias("h"))
        .agg(F.count_distinct("h")).collect()[0][0])
    spark.stop()


if __name__ == "__main__":
    main()
