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
  distinct (run it on whatever cadence file-count growth demands).

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
    # NUL separator so ("ab","c") never collides with ("a","bc")
    return F.md5(F.concat_ws("\x00", *[F.col(c).cast("string")
                                       for c in key_cols]))


def _read_state(spark: SparkSession, state_path: str) -> DataFrame:
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
    and merges small files). Returns the compacted hash count."""
    seen = _read_state(spark, state_path).distinct().persist()
    n = seen.count()
    tmp = state_path.rstrip("/") + ".compact"
    seen.write.mode("overwrite").parquet(tmp)
    seen.unpersist()
    import shutil
    old = state_path.rstrip("/") + ".old"
    os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old)
    return n
