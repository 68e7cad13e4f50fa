"""Scale-stress the session-17 operators (COVERAGE.md convention): the
events table replicated ×20 with per-replica id/user/day offsets (2M
events, 20× the day universe — seasonal cells scale honestly, and the
derived transcripts carry 20× conversations), documents ×20 with disjoint
id domains and per-replica token prefixes (the stress16 recipe — no
artificial cross-replica near-dups), embeddings ×100 with per-replica
perturbation (200k distinct vectors; triplets run at k=64, the documented
cluster-size knob: ~3k-member cells keep the n² Gram matrix ~70 MB). Per
CLAUDE.md, per-row outputs drain through aggregates so Catalyst cannot
prune the computed columns. One pass each on local[32] + the sha2 control
for window calibration."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logstash_filter_geoip_spark.operators import clustering, hygiene  # noqa: E402
from logstash_filter_geoip_spark.session import get_spark  # noqa: E402
from logstash_filter_geoip_spark.sources.transcripts import load_transcripts  # noqa: E402

SF = "/root/testdata/sf0.1"
TMP = "/tmp/stress17"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress17", master="local[32]",
                      shuffle_partitions=32)

    # --- events ×20: disjoint event/user ids, ts shifted a day per
    # replica (the seasonal day universe scales, hour-of-day preserved)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    big_ev = (ev.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                        F.lit(19))))
                .select((F.col("event_id") + F.col("rep") * n)
                        .alias("event_id"),
                        (F.col("ts") + F.make_interval(
                            days=F.col("rep"))).alias("ts"),
                        (F.col("user_id") + F.col("rep") * 1000)
                        .alias("user_id"),
                        "event_type", "value", "props"))
    big_ev.write.mode("overwrite").parquet(f"{TMP}/events.parquet")

    timed("control_sha2_2m", lambda: spark.read
          .parquet(f"{TMP}/events.parquet")
          .select(F.sha2(F.col("event_id").cast("string"), 256).alias("h"))
          .agg(F.count_distinct("h")).collect()[0][0])

    t = load_transcripts(spark, TMP)  # 2M turns, 20× conversations
    timed("retry_collapse_2m_turns", lambda: hygiene.retry_collapse(t)
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("ext_len").alias("ext")).collect()[0].asDict())
    timed("prompt_forks_2m_turns", lambda: hygiene.prompt_forks(t)
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("n_replies").alias("r")).collect()[0].asDict())

    be = spark.read.parquet(f"{TMP}/events.parquet")
    timed("seasonal_anomalies_2m_events", lambda: hygiene
          .seasonal_anomalies(be)
          .agg(F.count(F.lit(1)).alias("cells"),
               F.sum("n_events").alias("n")).collect()[0].asDict())
    timed("erasure_audit_2m_events", lambda: {
        r.user_id: r.n_erased
        for r in hygiene.erasure_audit(be).collect()})

    # --- documents ×20 (the stress16 disjoint-shingle recipe)
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
    big_d.write.mode("overwrite").parquet(f"{TMP}/docs.parquet")
    big_d = spark.read.parquet(f"{TMP}/docs.parquet")

    timed("split_leakage_100k_docs", lambda: hygiene.split_leakage(big_d)
          .agg(F.count(F.lit(1)).alias("pairs"),
               F.count_distinct("split_a", "split_b").alias("combos"))
          .collect()[0].asDict())

    # --- embeddings ×100 (the stress16 perturbation recipe), k=64
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ne = emb.count()
    big_e = (emb.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                        F.lit(99))))
                .select((F.col("vec_id") + F.col("rep") * ne)
                        .alias("vec_id"),
                        F.transform(
                            "embedding",
                            lambda x, i: x + F.when(
                                i == 0, F.col("rep") * 0.0001)
                            .otherwise(F.lit(0.0))).alias("embedding")))
    big_e.write.mode("overwrite").parquet(f"{TMP}/emb.parquet")
    big_e = spark.read.parquet(f"{TMP}/emb.parquet")

    timed("contrastive_triplets_200k_k64", lambda: clustering
          .contrastive_triplets(big_e, k=64)
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("pos_dist2").alias("pd"),
               F.sum("neg_dist2").alias("nd")).collect()[0].asDict())

    books = []

    def pq_tr():
        books.append(clustering.pq_train(big_e))
        return f"m={len(books[0])}"

    timed("pq_train_200k", pq_tr)
    timed("pq_encode_200k", lambda: clustering.pq_encode(big_e, books[0])
          .agg(*[F.sum(f"code_{s}")
                 for s in range(clustering.PQ_M)]).collect()[0].asDict())
    timed("pq_adc_200k_8q", lambda: clustering.pq_adc_topk(
        big_e, books[0], query_mod=10000, max_queries=8).count())

    timed("control_sha2_2m_end", lambda: spark.read
          .parquet(f"{TMP}/events.parquet")
          .select(F.sha2(F.col("event_id").cast("string"), 256).alias("h"))
          .agg(F.count_distinct("h")).collect()[0][0])
    spark.stop()


if __name__ == "__main__":
    main()
