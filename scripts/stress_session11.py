"""Scale-stress the session-11 operators (COVERAGE.md convention):
documents replicated to 1M rows / events to 2M on local[32], one pass
each, plus the sha2 control for window calibration. Forcing rule: per-row
operators are drained through aggregates over their computed columns
(bare count() lets Catalyst prune the expressions).

Replication notes: the "realistic" document replication appends a
replica-distinct suffix token so line_dedup's segment-df distribution and
fuzzy decon's candidate density stay corpus-like rather than collapsing
into one giant all-duplicate bucket; URL stress replicates events so the
12-arm derivation spreads over 2M rows (domain cardinality stays bounded
— the realistic web shape, distinct domains ≪ rows)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import aggregate, curation, web
from logstash_filter_geoip_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress11", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # x200 documents = 1M docs, replica-suffixed (the stress_session9 shape)
    big_docs = (docs.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(200))))
        .withColumn("doc_id", F.col("doc_id") * 200 + F.col("rep") - 1)
        .withColumn("text", F.concat_ws(" ", "text",
                                        F.concat(F.lit("rep"),
                                                 F.col("rep"))))
        .drop("rep"))
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big_ev = (ev.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn("event_id", F.col("event_id") * 20 + F.col("rep") - 1)
        .withColumn("user_id",
                    F.col("user_id") * 20 + F.pmod(F.col("rep"), 20))
        .drop("rep"))

    timed("control_sha2_1M_docs", lambda: big_docs.select(
        F.sha2(F.col("text"), 256).alias("h")).agg(
            F.count_distinct("h")).collect()[0][0])

    timed("line_dedup_1M_docs", lambda: curation.line_dedup(big_docs).agg(
        F.sum("n_segments"), F.sum("n_kept"),
        F.sum(F.length("text_dedup"))).collect()[0][1])
    bench = big_docs.where("doc_id % 1400 = 0")  # ~700 bench docs
    timed("decontaminate_fuzzy_1M_docs_700_bench",
          lambda: curation.decontaminate_fuzzy(big_docs, bench).count())

    urls = big_ev.select(
        "event_id", "user_id", F.expr(web.URL_CASES_SQL).alias("url"))
    for impl in ("arrow", "sql"):
        timed(f"url_normalize_2M_{impl}",
              lambda impl=impl: web.url_normalize(urls, impl=impl).agg(
                  F.count("url_norm"),
                  F.count_distinct("registered_domain")).collect()[0][0])
    timed("web_domain_counts_2M", lambda: web.domain_counts(urls).count())

    evd = big_ev.withColumn("day", F.date_trunc("day", F.col("ts")))
    timed("distinct_sketches_build_2M_60k_users", lambda:
          aggregate.distinct_sketches(
              evd, ("event_type",), "user_id", "day").count())
    timed("distinct_sketch_rollup_2M", lambda:
          aggregate.distinct_sketch_rollup(
              evd, ("event_type",), "user_id", "day").collect()[0][2])
    timed("exact_countDistinct_2M_comparison", lambda:
          evd.groupBy("event_type").agg(
              F.countDistinct("user_id")).count())

    timed("cms_build_2M_60k_keys", lambda:
          aggregate.cms_build(big_ev, "user_id").count())
    probe = (big_ev.where(F.col("user_id") < 500)
                   .select(F.col("user_id").alias("key")).distinct())
    timed("cms_build_plus_estimate_2M", lambda:
          aggregate.cms_estimate(
              aggregate.cms_build(big_ev, "user_id"), probe).count())

    from logstash_filter_geoip_spark.operators import dq
    timed("k_anonymity_2M", lambda: dq.k_anonymity(
        evd, ["event_type", "day"], 60).collect()[0][0])
    timed("k_anonymity_flags_2M", lambda: dq.k_anonymity_flags(
        evd, ["event_type", "day"], 60).agg(F.sum("at_risk")).collect()[0][0])

    # conversation-prep trio at 2M turns (transcripts replicated x20 with
    # distinct conv ids so per-conv state stays conversation-sized)
    from logstash_filter_geoip_spark.operators import conversation
    from logstash_filter_geoip_spark.sources.transcripts import (
        load_transcripts)
    t = load_transcripts(spark, SF)
    big_t = (t.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
              .withColumn("conv_id", F.concat_ws("-", "conv_id",
                                                 F.col("rep").cast("string")))
              .drop("rep"))
    timed("sft_pairs_2M_turns", lambda: conversation.sft_pairs(big_t)
          .agg(F.count(F.lit(1)), F.sum(F.length("response")))
          .collect()[0][0])
    timed("render_chat_2M_turns", lambda: conversation.render_chat(big_t)
          .agg(F.count(F.lit(1)), F.sum(F.length("chat_text")))
          .collect()[0][0])
    timed("loss_mask_2M_turns", lambda: conversation.loss_mask_spans(big_t)
          .agg(F.sum("tok_end")).collect()[0][0])

    spark.stop()


if __name__ == "__main__":
    main()
