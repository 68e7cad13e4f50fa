"""Scale-stress the session-13 operators (COVERAGE.md convention):
transcripts replicated to 2M turns / events to 2M rows on local[32], one
pass each, plus the sha2 control for window calibration. Forcing rule:
per-row operators are drained through aggregates over their computed
columns (bare count() lets Catalyst prune the expressions)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import conversation, drift
from logstash_filter_geoip_spark.session import get_spark
from logstash_filter_geoip_spark.sources.transcripts import load_transcripts

SF = "/root/testdata/sf0.1"
SPLIT = "2024-01-16 00:00:00"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress13", master="local[32]",
                      shuffle_partitions=32)
    t = load_transcripts(spark, SF)
    big_t = (t.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn("conv_id", F.concat_ws("-", "conv_id",
                                           F.col("rep").cast("string")))
        .drop("rep"))
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big_ev = (ev.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .withColumn("event_id", F.col("event_id") * 20 + F.col("rep") - 1)
        .drop("rep"))

    timed("control_sha2_2M_turns", lambda: big_t.select(
        F.sha2(F.col("text"), 256).alias("h")).agg(
            F.count_distinct("h")).collect()[0][0])

    timed("categorical_drift_2M_events", lambda: tuple(
        drift.categorical_drift(big_ev, "event_type", "ts", SPLIT).agg(
            F.sum("drifted"), F.sum("n_base"), F.sum("n_curr"))
        .collect()[0]))
    timed("value_drift_2M_events", lambda: tuple(
        drift.value_drift(big_ev, "value", "ts", SPLIT,
                          0.0, 100.0, 20).agg(
            F.sum("drifted"), F.sum("ppm_base")).collect()[0]))
    timed("drift_summary_2M_events", lambda: tuple(
        drift.drift_summary(
            drift.value_drift(big_ev, "value", "ts", SPLIT,
                              0.0, 100.0, 20)).collect()[0]))

    timed("chat_format_checks_2M_turns", lambda: tuple(
        conversation.chat_format_checks(big_t).agg(
            F.sum("valid"), F.sum("n_repeat_speaker"),
            F.sum("n_orphan_tool"), F.count(F.lit(1))).collect()[0]))
    timed("canned_replies_2M_turns", lambda: tuple(
        conversation.canned_replies(big_t).agg(
            F.sum("canned"), F.sum("n_uses"), F.count(F.lit(1)))
        .collect()[0]))
    timed("canned_share_2M_turns", lambda: tuple(
        conversation.canned_share(big_t).agg(
            F.sum("canned_ppm"), F.sum("n_assistant"), F.count(F.lit(1)))
        .collect()[0]))
    timed("truncate_context_2M_turns", lambda: tuple(
        conversation.truncate_context(big_t, 24).agg(
            F.sum("n_tok"), F.count(F.lit(1))).collect()[0]))
    timed("tool_chains_2M_turns", lambda: tuple(
        conversation.tool_chains(big_t).agg(
            F.sum("n_convs"), F.count(F.lit(1))).collect()[0]))
    timed("error_runs_2M_turns", lambda: tuple(
        conversation.error_runs(big_t).agg(
            F.sum("n_error_turns"), F.max("max_error_run"),
            F.count(F.lit(1))).collect()[0]))


if __name__ == "__main__":
    main()
