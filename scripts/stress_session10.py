"""Scale-stress the session-10 operators (COVERAGE.md convention): events
replicated to 2M rows / documents to 1M on local[32], one pass each, plus
the sha2 control for window calibration. Forcing rule: per-row operators
are drained through aggregates over their computed columns (bare count()
lets Catalyst prune the expressions)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import (dq, entity, layout,
                                                   relational, temporal)
from logstash_filter_geoip_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.1f} s  ({out})", flush=True)


def main():
    spark = get_spark(app="stress10", master="local[32]",
                      shuffle_partitions=32)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # x20 events = 2M rows; user domain x20 so the profile dimension grows
    # with the data (2M rows / 3k users)
    big = (ev.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
             .withColumn("event_id",
                         F.col("event_id") * 20 + F.col("rep") - 1)
             .withColumn("user_id",
                         F.col("user_id") * 20 + F.pmod(F.col("rep"), 20))
             .drop("rep"))

    timed("control_sha2_2M", lambda: big.select(
        F.sha2(F.col("props"), 256).alias("h")).agg(
            F.count_distinct("h")).collect()[0][0])

    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def snap(pred):
        return (big.where(pred).groupBy("user_id")
                   .agg(F.count(F.lit(1)).alias("n_events"),
                        F.min("event_type").alias("first_type")))

    cur = (snap(F.col("ts") < cut)
           .withColumn("valid_from",
                       F.lit("2024-01-01 00:00:00").cast("timestamp"))
           .withColumn("valid_to", F.lit(None).cast("timestamp")))
    timed("scd2_merge_2M_60k_keys", lambda: temporal.scd2_merge(
        cur, snap(F.col("ts") >= cut), ["user_id"],
        ["n_events", "first_type"], "2024-01-16 00:00:00").count())
    timed("snapshot_diff_2M_60k_keys", lambda: dq.snapshot_diff(
        snap(F.col("ts") < cut), snap(F.col("ts") >= cut),
        ["user_id"], ["n_events", "first_type"]).count())
    timed("resample_fill_2M", lambda: temporal.resample_fill(
        big, ["user_id"], "ts", "event_type").agg(
            F.sum("n_events"), F.count(F.lit(1))).collect()[0][1])
    timed("latest_by_key_2M", lambda: temporal.latest_by_key(
        big, ["user_id"], "ts", tie_break=("event_id",)).count())
    timed("profile_columns_2M_exact", lambda: len(
        dq.profile_columns(big).collect()))
    timed("profile_columns_2M_hll", lambda: len(
        dq.profile_columns(big, approx=True).collect()))
    timed("table_checksum_2M", lambda: dq.table_checksum(
        big, ["event_id", "user_id", "event_type", "props"])
        .collect()[0][0])
    timed("key_skew_2M", lambda: len(
        dq.key_skew_stats(big, ["user_id"]).collect()))
    timed("value_histogram_2M", lambda: __import__(
        "logstash_filter_geoip_spark.operators.aggregate",
        fromlist=["aggregate"]).value_histogram(
            big, ("event_type",), "value", 0.0, 100.0, 20).count())
    timed("iqr_outliers_2M", lambda: __import__(
        "logstash_filter_geoip_spark.operators.aggregate",
        fromlist=["aggregate"]).iqr_outliers(
            big, ("event_type",), "value").count())
    timed("zorder_keys_2M", lambda: big.select(layout.zorder_key(
        F.pmod(F.col("user_id"), F.lit(65536)),
        F.datediff(F.col("ts").cast("date"),
                   F.lit("2024-01-01").cast("date"))).alias("z"))
        .agg(F.max("z")).collect()[0][0])

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        timed("zorder_layout_write_2M_16f", lambda: layout.zorder_layout(
            big, F.pmod(F.col("user_id"), F.lit(65536)),
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2024-01-01").cast("date")),
            n_files=16).write.mode("overwrite").parquet(f"{d}/z") or 16)

    # entity resolution at a 40k-name vocabulary (part x20 with suffixed
    # names so blocks stay realistic: ~64 base names x 20 variants)
    pt = spark.read.parquet(f"{SF}/part.parquet")
    vocab_big = (pt.withColumn("rep",
                               F.explode(F.sequence(F.lit(1), F.lit(20))))
                   .withColumn("p_name",
                               F.concat(F.col("p_name"), F.lit(" v"),
                                        F.col("rep").cast("string"))))
    timed("fuzzy_pairs_40k_vocab", lambda: entity.fuzzy_name_pairs(
        vocab_big, "p_name").count())
    timed("entity_resolution_40k_vocab", lambda: entity.resolve_entities(
        vocab_big, "p_name").count())

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("pricing_summary_600k_noBHJ", lambda: len(
        relational.pricing_summary(li).collect()))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.stop()


if __name__ == "__main__":
    main()
