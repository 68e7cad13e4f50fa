"""Scale-stress the session-12 operators (COVERAGE.md convention):
transcripts replicated to 2M turns / events to 2M rows on local[32], one
pass each, plus the sha2 control for window calibration. Forcing rule:
per-row operators are drained through aggregates over their computed
columns (bare count() lets Catalyst prune the expressions)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import aggregate, conversation, dq
from logstash_filter_geoip_spark.session import get_spark
from logstash_filter_geoip_spark.sources.transcripts import load_transcripts

SF = "/root/testdata/sf0.1"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress12", master="local[32]",
                      shuffle_partitions=32)
    t = load_transcripts(spark, SF)
    # x20 transcripts = 2M turns; replica-distinct conv ids keep the
    # per-conversation window distribution corpus-like
    big_t = (t.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn("conv_id", F.concat_ws("-", "conv_id",
                                           F.col("rep").cast("string")))
        .drop("rep")
        .withColumn("text_len", F.length("text")))
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big_ev = (ev.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn("event_id", F.col("event_id") * 20 + F.col("rep") - 1)
        .drop("rep")
        .withColumn("day", F.date_trunc("day", F.col("ts"))))

    timed("control_sha2_2M_turns", lambda: big_t.select(
        F.sha2(F.col("text"), 256).alias("h")).agg(
            F.count_distinct("h")).collect()[0][0])

    timed("qsketch_build_2M_turns", lambda: aggregate.qsketch_build(
        big_t, ("role",), "text_len").count())
    timed("qsketch_build_quantiles_2M_turns", lambda: len(
        aggregate.qsketch_quantiles(
            aggregate.qsketch_build(big_t, ("role",), "text_len"),
            ("role",)).collect()))
    # per-conversation keyed sketch: 2M turns -> ~1.56M key groups (the
    # many-small-sketches shape an ingest table would store)
    timed("qsketch_build_per_conv_2M_turns", lambda: aggregate.qsketch_build(
        big_t, ("conv_id",), "text_len").count())

    timed("transitions_2M_turns", lambda: conversation.transition_counts(
        big_t).agg(F.sum("n_transitions")).collect()[0][0])

    from logstash_filter_geoip_spark.operators import stats
    big_t_id = big_t.withColumn(
        "rid", F.concat_ws(":", "conv_id",
                           F.col("turn_idx").cast("string")))
    timed("bootstrap_ci_2M_turns_B200_xxhash64", lambda: sorted(
        map(tuple, stats.bootstrap_ci(
            big_t_id, ("role",), "text_len", "rid").collect()))[0][0])
    timed("bootstrap_ci_2M_turns_B200_md5", lambda: sorted(
        map(tuple, stats.bootstrap_ci(
            big_t_id, ("role",), "text_len", "rid",
            hash_basis="md5").collect()))[0][0])

    timed("l_diversity_2M_events", lambda: tuple(
        dq.l_diversity(big_ev, ["event_type", "day"], "user_id",
                       54).collect()[0]))
    timed("l_diversity_flags_2M_events", lambda: dq.l_diversity_flags(
        big_ev, ["event_type", "day"], "user_id", 54).agg(
            F.sum("low_diversity"), F.sum("sensitive_diversity"))
        .collect()[0][0])

    spark.stop()


if __name__ == "__main__":
    main()
