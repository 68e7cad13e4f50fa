"""Streaming SCD2 dimension maintenance (streaming/incremental.scd2_stream):
cross-batch version history, replay idempotence, full-snapshot vs CDC
deletion semantics, and the latest-per-key batch collapse."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from logstash_filter_geoip_spark.streaming import incremental

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("in", "dim", "ckpt")}


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(path)


def _run(spark, p, **kw):
    q = incremental.scd2_stream(spark, p["in"], p["dim"], p["ckpt"],
                                SCHEMA, keys=("k",), attrs=("v",), **kw)
    q.awaitTermination()


def _dim(spark, p):
    return sorted((r.k, r.v, r.valid_from, r.valid_to)
                  for r in spark.read.parquet(p["dim"]).collect())


_T1, _T2 = _ts("2024-01-01 00:00:00"), _ts("2024-02-01 00:00:00")


def test_scd2_stream_versions_across_batches(spark, tmp_path):
    p = _paths(tmp_path)
    # batch 1 opens k1/k2; k1 carries TWO rows — the later ts wins the
    # within-batch collapse; as_of = the batch's max ts (_T1)
    _write_batch(spark, p["in"], [("k1", 1, _ts("2023-12-30 00:00:00")),
                                  ("k1", 2, _T1),
                                  ("k2", 20, _ts("2023-12-31 00:00:00"))])
    _run(spark, p)
    assert _dim(spark, p) == [("k1", 2, _T1, None), ("k2", 20, _T1, None)]

    # batch 2 (restart, same checkpoint): k1 changes, k2 absent (CDC mode:
    # survives), k3 appears
    _write_batch(spark, p["in"], [("k1", 3, _T2), ("k3", 30, _T2)])
    _run(spark, p)
    assert _dim(spark, p) == [
        ("k1", 2, _T1, _T2), ("k1", 3, _T2, None),
        ("k2", 20, _T1, None), ("k3", 30, _T2, None)]


def test_scd2_stream_replay_is_idempotent(spark, tmp_path):
    """Re-processing the same input with a WIPED checkpoint (the
    worst-case replay: every batch re-applied) converges to the same
    dimension — scd2_merge's no-op-update rule makes the maintenance
    exactly-once without a transactional sink."""
    import shutil
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [("k1", 1, _T1)])
    _run(spark, p)
    _write_batch(spark, p["in"], [("k1", 5, _T2)])
    _run(spark, p)
    before = _dim(spark, p)
    shutil.rmtree(p["ckpt"])          # force full replay
    _run(spark, p)
    assert _dim(spark, p) == before == [
        ("k1", 1, _T1, _T2), ("k1", 5, _T2, None)]


def test_scd2_stream_full_snapshot_deletes(spark, tmp_path):
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [("k1", 1, _T1), ("k2", 2, _T1)])
    _run(spark, p, full_snapshot=True)
    # second batch is a complete snapshot WITHOUT k2 -> k2 closes
    _write_batch(spark, p["in"], [("k1", 1, _T2)])
    _run(spark, p, full_snapshot=True)
    assert _dim(spark, p) == [
        ("k1", 1, _T1, None),          # unchanged: no new version
        ("k2", 2, _T1, _T2)]           # deleted: closed at batch time


def test_scd2_stream_matches_batch_merges(spark, tmp_path):
    """Drained stream == the same batches applied via scd2_merge directly
    (the enrich_batch no-drift rule for the SCD2 face)."""
    from logstash_filter_geoip_spark.operators.temporal import scd2_merge
    from pyspark.sql import functions as F

    p = _paths(tmp_path)
    b1 = [("a", 1, _T1), ("b", 2, _T1)]
    b2 = [("a", 9, _T2), ("c", 3, _T2)]
    _write_batch(spark, p["in"], b1)
    _run(spark, p)
    _write_batch(spark, p["in"], b2)
    _run(spark, p)

    empty = spark.createDataFrame(
        [], T.StructType(SCHEMA.fields[:2] + [
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType())]))
    snap1 = spark.createDataFrame(b1, SCHEMA).select("k", "v")
    snap2 = spark.createDataFrame(b2, SCHEMA).select("k", "v")
    want = scd2_merge(
        scd2_merge(empty, snap1, ["k"], ["v"], "2024-01-01 00:00:00",
                   full_snapshot=False),
        snap2, ["k"], ["v"], "2024-02-01 00:00:00", full_snapshot=False)
    assert _dim(spark, p) == sorted(
        (r.k, r.v, r.valid_from, r.valid_to) for r in want.collect())


def test_scd2_stream_remote_dim_path_raises(spark):
    df = spark.createDataFrame([("a", 1, _T1)], SCHEMA)
    with pytest.raises(NotImplementedError, match="local paths"):
        incremental._swap_write(spark, df, "s3a://bucket/dim")


# ---------------------------------------------------------------------------
# novel-template alerting at ingest
# ---------------------------------------------------------------------------

LOG_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def test_novel_template_stream(spark, tmp_path):
    """Only first-seen template SHAPES pass; later batches re-alert only on
    genuinely new shapes, surviving a restart."""
    p = {k: str(tmp_path / k) for k in ("in", "out", "ckpt", "state")}

    def write(rows):
        spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1) \
             .write.mode("append").parquet(p["in"])

    def run():
        q = incremental.novel_template_stream(
            spark, p["in"], p["out"], p["ckpt"], p["state"], LOG_SCHEMA)
        q.awaitTermination()

    def alerts():
        import os
        return sorted((r.event_id, r.template) for r in spark.read.parquet(
            os.path.join(p["out"], "data")).collect())

    # batch 1: two lines share a template (different ip/num), one distinct
    write([(1, "timeout from 10.0.0.1 after 30s"),
           (2, "timeout from 10.9.9.9 after 45s"),
           (3, "disk full on /dev/sda1")])
    run()
    a1 = alerts()
    assert [e for e, _ in a1] == [1, 3]       # min-id winner per template
    assert a1[0][1] == "timeout from <ip> after <num>s"

    # batch 2 (restart): a seen shape and a brand-new shape
    write([(10, "timeout from 172.16.0.4 after 9s"),
           (11, "oom killed pid 4242")])
    run()
    assert [e for e, _ in alerts()] == [1, 3, 11]
    # state is hashes only — no template/text column persisted
    assert spark.read.parquet(p["state"]).columns == ["content_h"]
