"""Streaming dedup-at-ingest: keep only first-seen document content across
micro-batches, with the seen-set persisted as a hash-only parquet state
table.

This is the streaming counterpart of ``operators/dedup.py``'s exact dedup
(reference analogue: the filter's per-event enrich loop is stateless, but a
training-data ingest pipeline needs the arriving stream deduplicated
against everything already accepted). The 100-TB shape:

- state is CONTENT HASHES ONLY (md5 hex, 32 bytes/row) — never the text;
- each micro-batch first dedups within itself (window by hash, min id —
  deterministic), then LEFT ANTI joins the state table. Both are
  hash-partitioned shuffles; nothing data-sized is broadcast or collected;
- the state table is append-only per batch; ``compact_state`` rewrites it
  distinct. Compaction swaps the state directory in place, so run it only
  while NO dedup stream is writing (between ``availableNow`` drains, or
  after stopping a continuous query) — a concurrent micro-batch's state
  append landing mid-swap would be discarded and its content re-admitted
  later.

Delivery semantics are at-least-once per first-seen content: output is
appended before the state, so a crash between the two writes replays the
batch and may duplicate output rows (never lose them). Exactly-once needs a
transactional table format on both writes — out of scope here, boundary
documented.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException

STATE_SCHEMA = T.StructType([T.StructField("content_h", T.StringType())])


def _content_hash(key_cols: tuple[str, ...]):
    # NUL separator so ("ab","c") never collides with ("a","bc"); NULL is
    # encoded as \x01 and values prefixed \x02 so NULL never collides with
    # "" and a NULL in one position never collides with a value shifted
    # into another (concat_ws would otherwise silently SKIP null parts).
    # Encoding instead of propagating batch exact_dedup's md5(NULL)=NULL
    # keeps the anti-join effective: a NULL join key never equals anything,
    # so NULL-content rows would be re-admitted on every batch forever.
    # The induced partition of rows into groups is identical to the batch
    # operator's, which is what the parity invariant is on.
    parts = [
        F.when(F.col(c).isNull(), F.lit("\x01"))
         .otherwise(F.concat(F.lit("\x02"), F.col(c).cast("string")))
        for c in key_cols
    ]
    return F.md5(F.concat_ws("\x00", *parts))


def _recover_interrupted_compaction(state_path: str) -> None:
    """A crash inside ``compact_state``'s directory swap can leave the live
    state under ``<state>.old`` (swap half-done) or a stale ``.old``/
    ``.compact`` beside a healthy state. Roll forward/back so the seen-set
    is never silently lost and the next compaction never trips on leftovers.
    Local paths only — remote compaction is rejected up front."""
    if "://" in state_path:
        return
    import shutil
    old = state_path.rstrip("/") + ".old"
    tmp = state_path.rstrip("/") + ".compact"
    if os.path.exists(old):
        if not os.path.exists(state_path):
            # crashed between the two renames: .old IS the live state
            os.rename(old, state_path)
        else:
            # crashed after the swap, before cleanup: .old is a stale copy
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def _read_state(spark: SparkSession, state_path: str) -> DataFrame:
    _recover_interrupted_compaction(state_path)
    # local-FS fast path: avoids a noisy WARN + JVM stack in the logs on
    # the very first batch; the exception fallback covers remote stores
    if "://" not in state_path and not os.path.exists(state_path):
        return spark.createDataFrame([], STATE_SCHEMA)
    try:
        return spark.read.schema(STATE_SCHEMA).parquet(state_path)
    except AnalysisException:
        return spark.createDataFrame([], STATE_SCHEMA)


def dedup_batch_against_state(batch: DataFrame, seen: DataFrame,
                              key_cols: tuple[str, ...],
                              id_col: str) -> DataFrame:
    """First-seen rows of `batch`: within-batch winner per content hash
    (min id — deterministic under replay), minus anything in `seen`."""
    for reserved in ("content_h", "__rn"):
        if reserved in batch.columns:
            raise ValueError(
                f"input column {reserved!r} collides with a dedup-internal "
                f"column; rename it before dedup_batch_against_state")
    h = batch.withColumn("content_h", _content_hash(key_cols))
    win = Window.partitionBy("content_h").orderBy(id_col)
    first = (h.withColumn("__rn", F.row_number().over(win))
              .where(F.col("__rn") == 1).drop("__rn"))
    return first.join(seen, "content_h", "left_anti")


def dedup_stream(spark: SparkSession, input_path: str, output_path: str,
                 checkpoint_path: str, state_path: str,
                 schema: T.StructType, key_cols: tuple[str, ...] = ("text",),
                 id_col: str = "doc_id", available_now: bool = True):
    """File-source → foreachBatch(first-seen filter → append) with the
    seen-hash state in `state_path`. availableNow drains pending input and
    stops (test/CI mode); omit for a continuous deployment."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        seen = _read_state(spark, state_path)
        fresh = dedup_batch_against_state(batch, seen, key_cols, id_col)
        # two writes need the batch twice; keep it to ONE upstream compute
        fresh = fresh.persist()
        try:
            # all-duplicate batches are common under replay: skip both
            # writes so output/state file counts don't grow by empty parts
            if fresh.isEmpty():
                return
            (fresh.drop("content_h").write.mode("append")
                  .parquet(os.path.join(output_path, "data")))
            (fresh.select("content_h").write.mode("append")
                  .parquet(state_path))
        finally:
            fresh.unpersist()

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_state(spark: SparkSession, state_path: str) -> int:
    """Rewrite the seen-hash table distinct (drops replay double-appends
    and merges small files). Returns the compacted hash count.

    Must run while no dedup stream is appending to `state_path` (see
    module docstring). Local filesystems only: the swap relies on
    directory renames; on an object store use a transactional table
    format for the state instead."""
    if "://" in state_path:
        raise NotImplementedError(
            "compact_state swaps directories via os.rename and supports "
            "local paths only; for remote state use a transactional table "
            "format (e.g. append to a Delta/Iceberg table and OPTIMIZE)")
    _recover_interrupted_compaction(state_path)
    seen = _read_state(spark, state_path).distinct().persist()
    n = seen.count()
    tmp = state_path.rstrip("/") + ".compact"
    seen.write.mode("overwrite").parquet(tmp)
    seen.unpersist()
    import shutil
    old = state_path.rstrip("/") + ".old"
    # swap: any crash point here is rolled forward/back by
    # _recover_interrupted_compaction on the next read or compaction
    os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old)
    return n
