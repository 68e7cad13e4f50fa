"""Streaming NEAR-dup at ingest (streaming/incremental.py): MinHash-band
state probe + signature-agreement verify across micro-batches, restarts,
within-batch suppression, state shape, compaction, and single-batch parity
with the batch LSH operator's keep-list."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from logstash_filter_geoip_spark.operators import dedup as D
from logstash_filter_geoip_spark.streaming import incremental

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

# 40 distinct words; a near-dup appends one word (Jaccard ~ 38/39 = 0.974
# on 3-shingles — far above the 0.5 threshold, so the 64-hash estimate and
# every band can't realistically miss; the module docstring's
# near-threshold caveat doesn't apply)
BASE = " ".join(f"w{i}" for i in range(40))
OTHER = " ".join(f"a{i}" for i in range(40))
THIRD = " ".join(f"q{i}" for i in range(40))


def _near(i: int) -> str:
    return BASE + f" extra{i}"


def _paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("in", "out", "ckpt", "state")}


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("append").parquet(path)


def _run(spark, p):
    q = incremental.near_dedup_stream(
        spark, p["in"], p["out"], p["ckpt"], p["state"], SCHEMA)
    q.awaitTermination()


def _out_ids(spark, p):
    return sorted(r["doc_id"] for r in
                  spark.read.parquet(os.path.join(p["out"], "data"))
                       .collect())


def test_near_dedup_across_batches_and_restart(spark, tmp_path):
    p = _paths(tmp_path)
    # batch 1: base doc, a distinct doc, and a HIGHER-id near-dup of base
    # (one appended word) — the near-dup must be suppressed within-batch
    _write_batch(spark, p["in"], [(0, BASE), (1, OTHER), (7, _near(7))])
    _run(spark, p)
    assert _out_ids(spark, p) == [0, 1]

    # batch 2 (fresh query, same checkpoint/state = restart): a near-dup
    # of the ADMITTED base doc (caught by the state probe) plus a new doc
    _write_batch(spark, p["in"], [(10, _near(10)), (12, THIRD)])
    _run(spark, p)
    assert _out_ids(spark, p) == [0, 1, 12]

    # state: bands + sigs sub-tables, one sig per ADMITTED doc (never the
    # text), n_bands band rows per admitted doc
    sigs = spark.read.parquet(os.path.join(p["state"], "sigs"))
    bands = spark.read.parquet(os.path.join(p["state"], "bands"))
    assert sorted(sigs.columns) == ["doc_id", "signature"]
    assert sorted(bands.columns) == ["band", "band_hash", "doc_id"]
    assert sorted(r["doc_id"] for r in sigs.collect()) == [0, 1, 12]
    assert bands.count() == 3 * D.N_BANDS
    # suppressed docs' signatures never pollute the state
    assert 7 not in {r["doc_id"] for r in sigs.collect()}


def test_near_compact_and_continued_filtering(spark, tmp_path):
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [(0, BASE), (1, OTHER)])
    _run(spark, p)
    # simulate a replay double-append of the state (the at-least-once
    # contract): duplicate rows must not break the filter and must be
    # removed by compaction
    sigs_path = os.path.join(p["state"], "sigs")
    bands_path = os.path.join(p["state"], "bands")
    spark.read.parquet(sigs_path).write.mode("append").parquet(sigs_path)
    spark.read.parquet(bands_path).write.mode("append").parquet(bands_path)
    assert spark.read.parquet(sigs_path).count() == 4

    nb, ns = incremental.near_compact_state(spark, p["state"])
    assert (nb, ns) == (2 * D.N_BANDS, 2)

    # post-compaction the state still rejects near-dups of admitted docs
    _write_batch(spark, p["in"], [(20, _near(20)), (21, THIRD)])
    _run(spark, p)
    assert _out_ids(spark, p) == [0, 1, 21]


def test_single_batch_parity_with_batch_lsh_keep_list(spark):
    # star-shaped corpus (near-dups only of doc 0): the streaming
    # within-batch rule and the batch components keep-list agree exactly
    rows = [(0, BASE), (2, OTHER), (3, _near(3)), (4, THIRD), (5, _near(5))]
    df = spark.createDataFrame(rows, SCHEMA)

    pairs = D.minhash_lsh_pairs(df)
    batch_drop = {r["doc_id"] for r in
                  D.dedup_components(pairs).where("keep = 0").collect()}

    empty_bands = spark.createDataFrame([], incremental._near_bands_schema())
    empty_sigs = spark.createDataFrame([], incremental._near_sigs_schema())
    kept = incremental.near_dedup_batch_against_state(
        df, empty_bands, empty_sigs)
    stream_kept = sorted(r["doc_id"] for r in kept.collect())

    assert batch_drop == {3, 5}
    assert stream_kept == [0, 2, 4]


def test_shingle_free_rows_always_admitted(spark, tmp_path):
    # texts below the shingle width (and NULL) carry no signature: always
    # admitted, add no state — exactly like the batch LSH operator, which
    # can never emit a pair for them
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [(0, "tiny doc"), (1, "tiny doc"),
                                  (2, None), (3, BASE)])
    _run(spark, p)
    assert _out_ids(spark, p) == [0, 1, 2, 3]
    sigs = spark.read.parquet(os.path.join(p["state"], "sigs"))
    assert sorted(r["doc_id"] for r in sigs.collect()) == [3]


def test_shingle_free_only_stream_writes_no_state(spark, tmp_path):
    # a batch whose KEPT rows are all signature-free must not append empty
    # parquet jobs to the state every trigger — and compacting the
    # never-created state returns (0, 0) instead of raising
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [(0, "tiny doc"), (1, None)])
    _run(spark, p)
    assert _out_ids(spark, p) == [0, 1]
    assert not os.path.exists(os.path.join(p["state"], "sigs"))
    assert not os.path.exists(os.path.join(p["state"], "bands"))
    assert incremental.near_compact_state(spark, p["state"]) == (0, 0)


def test_meta_guard_rejects_parameter_change(spark, tmp_path):
    import pytest
    p = _paths(tmp_path)
    _write_batch(spark, p["in"], [(0, BASE)])
    _run(spark, p)
    # restarting with a different hash family would make every stored
    # band_hash unmatchable (silent re-admission) — the guard raises
    _write_batch(spark, p["in"], [(1, _near(1))])
    q = incremental.near_dedup_stream(
        spark, p["in"], p["out"], p["ckpt"], p["state"], SCHEMA,
        n_hashes=32, n_bands=8)
    with pytest.raises(Exception, match="near-dup state"):
        q.awaitTermination()


def test_string_id_stream_roundtrip(spark, tmp_path):
    # the state schema follows the input's id type — string ids must work
    # across batches (a fixed long state schema would crash batch 2's scan)
    schema = T.StructType([
        T.StructField("doc_uid", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    p = _paths(tmp_path)
    spark.createDataFrame([("a", BASE), ("b", OTHER)], schema) \
         .coalesce(1).write.mode("append").parquet(p["in"])
    q = incremental.near_dedup_stream(
        spark, p["in"], p["out"], p["ckpt"], p["state"], schema,
        id_col="doc_uid")
    q.awaitTermination()
    spark.createDataFrame([("c", _near(3)), ("d", THIRD)], schema) \
         .coalesce(1).write.mode("append").parquet(p["in"])
    q = incremental.near_dedup_stream(
        spark, p["in"], p["out"], p["ckpt"], p["state"], schema,
        id_col="doc_uid")
    q.awaitTermination()
    got = sorted(r["doc_uid"] for r in
                 spark.read.parquet(os.path.join(p["out"], "data"))
                      .collect())
    assert got == ["a", "b", "d"]  # "c" is a near-dup of admitted "a"
