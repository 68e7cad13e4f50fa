"""Streaming drift maintenance: drained stream == batch operator on the
union of inputs (side counts add exactly; read face shares stage-2
arithmetic), batch-id fence replay safety, and the meta spec pin."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from logstash_filter_geoip_spark.operators import drift
from logstash_filter_geoip_spark.streaming import incremental

SPLIT = "2024-06-15 00:00:00"
_B = dt.datetime(2024, 6, 1)   # base side
_C = dt.datetime(2024, 6, 20)  # current side

_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ts", T.TimestampNTZType()),
])


def _paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("in", "state", "ckpt")}


def _write(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1) \
         .write.mode("append").parquet(path)


def _run(spark, p, **kw):
    q = incremental.drift_stream(spark, p["in"], p["state"], p["ckpt"],
                                 _SCHEMA, "ts", SPLIT, **kw)
    q.awaitTermination()


ROWS_1 = [("a", 10.0, _B)] * 4 + [("b", 20.0, _B)] * 2 + \
         [("a", 10.0, _C)] * 1
ROWS_2 = [("a", 200.0, _C)] * 3 + [("b", None, _C)] * 2 + \
         [(None, 30.0, _B)]


def test_drained_stream_matches_batch_categorical(spark, tmp_path):
    p = _paths(tmp_path)
    _write(spark, p["in"], ROWS_1)
    _run(spark, p, cat_col="event_type")
    _write(spark, p["in"], ROWS_2)
    _run(spark, p, cat_col="event_type")
    got = sorted((tuple(str(v) for v in r) for r in
                  incremental.drift_state_read(spark, p["state"])
                  .collect()))
    want = sorted((tuple(str(v) for v in r) for r in drift.categorical_drift(
        spark.createDataFrame(ROWS_1 + ROWS_2, _SCHEMA),
        "event_type", "ts", SPLIT).collect()))
    assert got == want
    # state is bounded: one row per category, counts only
    st = spark.read.parquet(os.path.join(p["state"], "counts"))
    assert sorted(st.columns) == ["event_type", "n_base", "n_curr"]
    assert st.count() == 3


def test_drained_stream_matches_batch_value(spark, tmp_path):
    p = _paths(tmp_path)
    kw = dict(value_col="value", lo=0.0, hi=100.0, n_buckets=10)
    _write(spark, p["in"], ROWS_1)
    _run(spark, p, **kw)
    _write(spark, p["in"], ROWS_2)
    _run(spark, p, **kw)
    got = sorted((tuple(str(v) for v in r) for r in
                  incremental.drift_state_read(spark, p["state"])
                  .collect()))
    want = sorted((tuple(str(v) for v in r) for r in drift.value_drift(
        spark.createDataFrame(ROWS_1 + ROWS_2, _SCHEMA),
        "value", "ts", SPLIT, 0.0, 100.0, 10).collect()))
    assert got == want
    # summary composes over the read face
    s = drift.drift_summary(
        incremental.drift_state_read(spark, p["state"])).collect()[0]
    assert s["tot_base"] == 7 and s["tot_curr"] == 6


def test_apply_batch_fences_replayed_ids(spark, tmp_path):
    p = _paths(tmp_path)
    counts = os.path.join(p["state"], "counts")
    spec = incremental._drift_spec("event_type", None, None, None, None,
                                   "ts", SPLIT)
    batch = spark.createDataFrame(ROWS_1, _SCHEMA)
    assert incremental.drift_apply_batch(spark, batch, 0, counts, spec)
    once = sorted(tuple(r) for r in spark.read.parquet(counts).collect())
    # replayed id: fenced, state intact
    assert not incremental.drift_apply_batch(spark, batch, 0, counts, spec)
    assert sorted(tuple(r) for r in
                  spark.read.parquet(counts).collect()) == once
    # next id folds in: counts double
    assert incremental.drift_apply_batch(spark, batch, 1, counts, spec)
    twice = {r[0]: (r[1], r[2])
             for r in spark.read.parquet(counts).collect()}
    for k, nb, nc in once:
        assert twice[k] == (2 * nb, 2 * nc)


def test_spec_pin_and_validation(spark, tmp_path):
    p = _paths(tmp_path)
    _write(spark, p["in"], ROWS_1)
    _run(spark, p, cat_col="event_type")
    # different split -> counters not addable -> raises
    with pytest.raises(ValueError, match="drift state"):
        incremental.drift_stream(spark, p["in"], p["state"],
                                 str(tmp_path / "ckpt2"), _SCHEMA, "ts",
                                 "2024-06-16 00:00:00",
                                 cat_col="event_type")
    with pytest.raises(ValueError, match="exactly one"):
        incremental._drift_spec("a", "b", None, None, None, "ts", SPLIT)
    with pytest.raises(ValueError, match="requires lo"):
        incremental._drift_spec(None, "value", None, None, None, "ts",
                                SPLIT)
    with pytest.raises(NotImplementedError, match="local"):
        incremental.drift_stream(spark, p["in"], "s3://b/state", p["ckpt"],
                                 _SCHEMA, "ts", SPLIT, cat_col="x")


def test_rolling_drained_stream_matches_batch(spark, tmp_path):
    p = _paths(tmp_path)

    def run(**kw):
        q = incremental.rolling_drift_stream(
            spark, p["in"], p["state"], p["ckpt"], _SCHEMA,
            "event_type", "ts", **kw)
        q.awaitTermination()

    _write(spark, p["in"], ROWS_1)
    run()
    _write(spark, p["in"], ROWS_2)
    run()
    got = sorted((tuple(str(v) for v in r) for r in
                  incremental.rolling_drift_state_read(spark, p["state"])
                  .collect()))
    want = sorted((tuple(str(v) for v in r) for r in drift.rolling_drift(
        spark.createDataFrame(ROWS_1 + ROWS_2, _SCHEMA),
        "event_type", "ts", "day").collect()))
    assert got == want
    # state is bounded: one row per (day, category)
    st = spark.read.parquet(os.path.join(p["state"], "counts"))
    assert sorted(st.columns) == ["bucket_ts", "event_type", "n"]
    # spec pin: a different bucket granularity raises
    with pytest.raises(ValueError, match="rolling-drift state"):
        incremental.rolling_drift_stream(
            spark, p["in"], p["state"], str(tmp_path / "ck2"), _SCHEMA,
            "event_type", "ts", bucket="hour")


def test_rolling_apply_batch_fence(spark, tmp_path):
    p = _paths(tmp_path)
    counts = os.path.join(p["state"], "counts")
    spec = {"kind": "rolling", "col": "event_type", "ts_col": "ts",
            "bucket": "day"}
    batch = spark.createDataFrame(ROWS_1, _SCHEMA)
    assert incremental.rolling_drift_apply_batch(spark, batch, 0, counts,
                                                 spec)
    once = sorted(tuple(str(v) for v in r)
                  for r in spark.read.parquet(counts).collect())
    assert not incremental.rolling_drift_apply_batch(spark, batch, 0,
                                                     counts, spec)
    assert sorted(tuple(str(v) for v in r)
                  for r in spark.read.parquet(counts).collect()) == once
