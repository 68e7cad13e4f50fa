"""Streaming dedup-at-ingest (streaming/incremental.py): first-seen
semantics across micro-batches and restarts, within-batch determinism,
hash-only state, and compaction."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from logstash_filter_geoip_spark.streaming import incremental

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(path)


def _run(spark, paths):
    q = incremental.dedup_stream(
        spark, paths["in"], paths["out"], paths["ckpt"], paths["state"],
        SCHEMA)
    q.awaitTermination()


def _paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("in", "out", "ckpt", "state")}


def _out_rows(spark, paths):
    return sorted((r["doc_id"], r["text"]) for r in
                  spark.read.parquet(os.path.join(paths["out"], "data"))
                       .collect())


def test_first_seen_across_batches_and_restart(spark, tmp_path):
    p = _paths(tmp_path)
    # batch 1: d0/d1 plus an in-batch duplicate of d0's text under a HIGHER
    # id — the min-id winner must be kept
    _write_batch(spark, p["in"], [(0, "alpha"), (7, "alpha"), (1, "beta")])
    _run(spark, p)
    assert _out_rows(spark, p) == [(0, "alpha"), (1, "beta")]

    # batch 2 (fresh query, same checkpoint/state = restart): repeats of
    # both seen texts plus one genuinely new doc
    _write_batch(spark, p["in"], [(10, "alpha"), (11, "beta"),
                                  (12, "gamma")])
    _run(spark, p)
    assert _out_rows(spark, p) == [(0, "alpha"), (1, "beta"),
                                   (12, "gamma")]

    # state holds hashes only — one per distinct content, no text column
    state = spark.read.parquet(p["state"])
    assert state.columns == ["content_h"]
    assert state.distinct().count() == 3


def test_state_compaction(spark, tmp_path):
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [(0, "alpha"), (1, "beta")])
    _run(spark, p)
    _write_batch(spark, p["in"], [(2, "gamma")])
    _run(spark, p)
    n = incremental.compact_state(spark, p["state"])
    assert n == 3
    # compaction must not change dedup behavior
    _write_batch(spark, p["in"], [(3, "alpha"), (4, "delta")])
    _run(spark, p)
    assert (0, "alpha") in _out_rows(spark, p)
    assert (3, "alpha") not in _out_rows(spark, p)
    assert (4, "delta") in _out_rows(spark, p)


def test_stream_matches_batch_dedup_on_content(spark, tmp_path):
    """Batch/stream dedup parity (CLAUDE.md invariant family): the stream's
    first-seen output carries exactly the batch exact-dedup content set,
    once each. (Representative IDS legitimately differ: stream keeps
    first-ARRIVAL, batch keeps min id — so parity is on content.)"""
    from logstash_filter_geoip_spark.operators.dedup import exact_dedup
    p = _paths(tmp_path)
    rows1 = [(i, f"t{i % 6}") for i in range(12)]
    rows2 = [(i, f"t{i % 9}") for i in range(12, 30)]
    _write_batch(spark, p["in"], rows1)
    _run(spark, p)
    _write_batch(spark, p["in"], rows2)
    _run(spark, p)
    out = spark.read.parquet(os.path.join(p["out"], "data"))
    batch = exact_dedup(
        spark.createDataFrame(rows1 + rows2, SCHEMA))
    stream_texts = sorted(r["text"] for r in out.collect())
    assert stream_texts == sorted(set(stream_texts))  # no content dup
    assert len(stream_texts) == batch.count()


def test_null_and_separator_safety(spark):
    """NUL-separated multi-column hashing: ("ab","c") != ("a","bc")."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("ab", "c"), ("a", "bc")], "x string, y string")
    hs = [r[0] for r in
          df.select(incremental._content_hash(("x", "y"))).collect()]
    assert hs[0] != hs[1]
