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

`near_dedup_stream` is the NEAR-dup counterpart: the state is the admitted
docs' MinHash signatures + LSH band hashes (operators/dedup.py's exact
band derivation, shared code), a new doc is rejected when a band collision
verifies above the Jaccard threshold via the signature-agreement estimate.
Same at-least-once contract, same compaction story (`near_compact_state`).
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


def _read_state_df(spark: SparkSession, state_path: str,
                   schema: T.StructType) -> DataFrame:
    _recover_interrupted_compaction(state_path)
    # local-FS fast path: avoids a noisy WARN + JVM stack in the logs on
    # the very first batch; the exception fallback covers remote stores
    if "://" not in state_path and not os.path.exists(state_path):
        return spark.createDataFrame([], schema)
    try:
        return spark.read.schema(schema).parquet(state_path)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def _read_state(spark: SparkSession, state_path: str) -> DataFrame:
    return _read_state_df(spark, state_path, STATE_SCHEMA)


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


def _compact_dir(spark: SparkSession, state_path: str,
                 schema: T.StructType | None) -> int:
    """distinct-rewrite one state directory with a crash-safe swap.
    schema=None reads whatever the directory holds (the near-dup state's
    id type is input-derived, not fixed). A directory that was never
    created (no state written yet) compacts to 0 without touching disk."""
    if "://" in state_path:
        raise NotImplementedError(
            "state compaction swaps directories via os.rename and supports "
            "local paths only; for remote state use a transactional table "
            "format (e.g. append to a Delta/Iceberg table and OPTIMIZE)")
    _recover_interrupted_compaction(state_path)
    if not os.path.exists(state_path):
        return 0
    if schema is None:
        seen = spark.read.parquet(state_path).distinct().persist()
    else:
        seen = _read_state_df(spark, state_path, schema).distinct().persist()
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


def compact_state(spark: SparkSession, state_path: str) -> int:
    """Rewrite the seen-hash table distinct (drops replay double-appends
    and merges small files). Returns the compacted hash count.

    Must run while no dedup stream is appending to `state_path` (see
    module docstring). Local filesystems only: the swap relies on
    directory renames; on an object store use a transactional table
    format for the state instead."""
    return _compact_dir(spark, state_path, STATE_SCHEMA)


# ---------------------------------------------------------------------------
# near-dup at ingest (MinHash bands + signature-agreement verify)
# ---------------------------------------------------------------------------

def _near_bands_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    # id type follows the INPUT's id column (string/long/... ids all work
    # through the probe joins) — a fixed LongType here would let a string-id
    # stream write state on batch 1 and crash every later batch at the
    # schema-enforced state scan
    return T.StructType([
        T.StructField("doc_id", id_type),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ])


def _near_sigs_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    return T.StructType([
        T.StructField("doc_id", id_type),
        T.StructField("signature", T.ArrayType(T.LongType())),
    ])


def _meta_guard(state_path: str, spec: dict, what: str,
                consequence: str) -> None:
    """The shared pin-or-raise core of every persisted-state guard: write
    `spec` to meta.json beside the state on first use; raise loudly when
    an existing pin differs (restarting with changed parameters would
    silently corrupt additive/probed state — each caller states the
    concrete consequence)."""
    import json
    os.makedirs(state_path, exist_ok=True)
    mp = os.path.join(state_path, "meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            saved = json.load(f)
        if saved != spec:
            raise ValueError(
                f"{what} state at {state_path!r} was written with "
                f"{saved}; this stream is configured with {spec} — "
                f"{consequence} Use the original parameters or a fresh "
                "state path.")
    else:
        with open(mp, "w") as f:
            json.dump(spec, f)


def _near_meta_guard(state_path: str, n_hashes: int, n_bands: int,
                     id_type: str) -> None:
    """Pin (n_hashes, n_bands, id type) beside the near-dup state: bands
    are only comparable under the EXACT hash family that wrote them —
    changed params would silently re-admit every near-dup. Local paths
    only (the compaction contract already pins this state to local FS)."""
    if "://" in state_path:
        return
    _meta_guard(state_path,
                {"n_hashes": n_hashes, "n_bands": n_bands,
                 "id_type": id_type},
                "near-dup",
                "band hashes would never match and every near-dup would "
                "be silently re-admitted.")


def _sig_agreement(a, b, n_hashes: int):
    """Fraction of agreeing MinHash positions — the standard unbiased
    estimator of Jaccard similarity. n_hashes compiled equality terms
    (the simhash bit-sum pattern), no HOF, no Python."""
    matches = None
    for i in range(n_hashes):
        term = F.when(F.get(a, i) == F.get(b, i), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return matches * F.lit(1.0) / F.lit(n_hashes)


def near_dedup_batch_against_state(batch: DataFrame, state_bands: DataFrame,
                                   state_sigs: DataFrame,
                                   n_hashes: int | None = None,
                                   n_bands: int | None = None,
                                   threshold: float | None = None,
                                   id_col: str = "doc_id",
                                   text_col: str = "text",
                                   return_sigs: bool = False):
    """Rows of `batch` that are NOT near-duplicates of anything already
    admitted (`state_*`) or of a lower-id row in the same batch.

    The probe is the batch LSH shape (operators/dedup.py) re-cut for
    ingest: band buckets generate candidates (equi-join on (band,
    band_hash) — shuffle-partitioned, nothing data-sized broadcast or
    collected), then candidates are verified with the signature-agreement
    Jaccard ESTIMATE instead of exact shingle Jaccard. That is the honest
    100-TB trade: state stores 8·n_hashes bytes per admitted doc (plus
    n_bands 16-byte band rows), never shingle sets — exact re-verification
    would need the full text of every doc ever admitted. At the default
    64 hashes the estimator's std-dev is ≤ 1/16 (√(J(1−J)/64)), so docs
    near the threshold can land either side of it; batch-vs-stream parity
    tests therefore use pairs far from the threshold.

    Within-batch rule: a row is dropped iff its estimate against ANY
    lower-id batch row (kept or not) or ANY state doc clears `threshold`.
    This is slightly more aggressive than connected-components keep-lists
    (a row can be suppressed by a row that was itself suppressed) but is
    deterministic under replay and needs no iteration inside the
    micro-batch. Rows whose text yields no shingles (shorter than the
    shingle width, NULL) carry no signature: they are always admitted and
    add no state — same as the batch LSH operator, which can never emit a
    pair for them; route those through the exact-hash `dedup_stream` if
    short-text dedup matters.

    `return_sigs=True` additionally returns the KEPT rows' signatures
    (materialized from the same single shingle+minhash pass, not
    recomputed) as `(kept, kept_sigs)` — the stream handler writes state
    from these so the dominant tokenize+64-min aggregate runs ONCE per
    micro-batch.
    """
    from logstash_filter_geoip_spark.operators import dedup as D
    n_hashes = D.N_MINHASH if n_hashes is None else n_hashes
    n_bands = D.N_BANDS if n_bands is None else n_bands
    threshold = D.JACCARD_THRESHOLD if threshold is None else threshold

    docs = batch.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("text"))
    # the signature/band relations are referenced by four joins below;
    # persist so the shingle+minhash aggregation runs once per batch, and
    # materialize the (tiny, id-only) dropped set before releasing them
    sigs_new = D.minhash_signatures(docs, n_hashes).persist()
    bands_new = D.band_rows(sigs_new, n_hashes, n_bands).persist()
    try:
        est = _sig_agreement(F.col("sig_a"), F.col("sig_b"), n_hashes)

        # (a) vs lower-id rows of the same batch
        cand_in = (bands_new.alias("x")
                   .join(bands_new.alias("y"),
                         (F.col("x.band") == F.col("y.band"))
                         & (F.col("x.band_hash") == F.col("y.band_hash"))
                         & (F.col("x.doc_id") < F.col("y.doc_id")))
                   .select(F.col("x.doc_id").alias("doc_lo"),
                           F.col("y.doc_id").alias("doc_hi"))
                   .distinct())
        dropped_in = (cand_in
                      .join(sigs_new.select(F.col("doc_id").alias("doc_lo"),
                                            F.col("signature").alias("sig_a")),
                            "doc_lo")
                      .join(sigs_new.select(F.col("doc_id").alias("doc_hi"),
                                            F.col("signature").alias("sig_b")),
                            "doc_hi")
                      .where(est >= F.lit(threshold))
                      .select(F.col("doc_hi").alias("doc_id")))

        # (b) vs the admitted state (plain shuffle joins: state is
        # data-sized, candidates are collision-sized — AQE picks the
        # physical strategy from real stats)
        cand_st = (bands_new.alias("x")
                   .join(state_bands.alias("s"),
                         (F.col("x.band") == F.col("s.band"))
                         & (F.col("x.band_hash") == F.col("s.band_hash")))
                   .select(F.col("x.doc_id").alias("doc_new"),
                           F.col("s.doc_id").alias("doc_old"))
                   .distinct())
        dropped_st = (cand_st
                      .join(sigs_new.select(F.col("doc_id").alias("doc_new"),
                                            F.col("signature").alias("sig_a")),
                            "doc_new")
                      .join(state_sigs.select(F.col("doc_id").alias("doc_old"),
                                              F.col("signature").alias("sig_b")),
                            "doc_old")
                      .where(est >= F.lit(threshold))
                      .select(F.col("doc_new").alias("doc_id")))

        dropped = (dropped_in.unionByName(dropped_st).distinct()
                   .localCheckpoint(eager=True))
        kept_sigs = None
        if return_sigs:
            # batch-sized, materialized while the cache is still warm so
            # releasing sigs_new can't force a recompute at write time
            kept_sigs = (sigs_new.join(dropped, "doc_id", "left_anti")
                         .localCheckpoint(eager=True))
    finally:
        bands_new.unpersist()
        sigs_new.unpersist()
    kept = batch.join(dropped.withColumnRenamed("doc_id", id_col),
                      id_col, "left_anti")
    return (kept, kept_sigs) if return_sigs else kept


def near_dedup_stream(spark: SparkSession, input_path: str, output_path: str,
                      checkpoint_path: str, state_path: str,
                      schema: T.StructType, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_hashes: int | None = None,
                      n_bands: int | None = None,
                      threshold: float | None = None,
                      available_now: bool = True):
    """File-source → foreachBatch(near-dup filter → append) with the
    admitted docs' MinHash state under `state_path` (two sub-tables:
    `bands/` for the LSH probe, `sigs/` for the verify). Same delivery
    contract as `dedup_stream`: output is appended before state, so a
    crash between the writes replays the batch — at-least-once per
    admitted doc, never a loss; state double-appends are harmless to the
    filter and removed by `near_compact_state`."""
    from logstash_filter_geoip_spark.operators import dedup as D
    nh = D.N_MINHASH if n_hashes is None else n_hashes
    nb = D.N_BANDS if n_bands is None else n_bands
    bands_path = os.path.join(state_path, "bands")
    sigs_path = os.path.join(state_path, "sigs")
    id_type = schema[id_col].dataType

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        _near_meta_guard(state_path, nh, nb, id_type.simpleString())
        state_bands = _read_state_df(spark, bands_path,
                                     _near_bands_schema(id_type))
        state_sigs = _read_state_df(spark, sigs_path,
                                    _near_sigs_schema(id_type))
        kept, ksigs = near_dedup_batch_against_state(
            batch, state_bands, state_sigs, n_hashes=nh, n_bands=nb,
            threshold=threshold, id_col=id_col, text_col=text_col,
            return_sigs=True)
        kept = kept.persist()
        try:
            if kept.isEmpty():
                return
            kept.write.mode("append").parquet(
                os.path.join(output_path, "data"))
            # a kept set of only shingle-free rows carries no signatures:
            # skip the state appends so file counts don't grow by empty
            # parts every trigger (the dedup_stream empty-batch rule)
            if not ksigs.isEmpty():
                ksigs.write.mode("append").parquet(sigs_path)
                D.band_rows(ksigs, nh, nb).write.mode("append") \
                 .parquet(bands_path)
        finally:
            kept.unpersist()

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_compact_state(spark: SparkSession, state_path: str) -> tuple[int, int]:
    """distinct-rewrite both near-dup state tables (replay double-appends,
    small files). Returns (band_rows, sig_rows) after compaction — (0, 0)
    when no state exists yet (e.g. only shingle-free rows admitted so far).
    Same no-concurrent-writer and local-FS contract as `compact_state`.
    schema=None: the state's id type is input-derived (meta.json records
    it), so compaction reads whatever the directories hold."""
    nb = _compact_dir(spark, os.path.join(state_path, "bands"), None)
    ns = _compact_dir(spark, os.path.join(state_path, "sigs"), None)
    return nb, ns


# ---------------------------------------------------------------------------
# SCD2 dimension maintenance at ingest (streaming face of temporal.scd2_merge)
# ---------------------------------------------------------------------------


def _dim_schema(batch: DataFrame, keys: tuple[str, ...],
                attrs: tuple[str, ...]) -> T.StructType:
    by_name = {f.name: f for f in batch.schema.fields}
    fields = [by_name[c] for c in [*keys, *attrs]]
    return T.StructType(fields + [
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ])


def _swap_write(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Replace a parquet directory we may also be READING in the same job:
    materialize to `<path>.compact`, then the same crash-safe rename swap
    as state compaction (rolled forward/back by
    _recover_interrupted_compaction on the next read). Local FS only —
    remote dimension state belongs in a transactional table format."""
    if "://" in path:
        raise NotImplementedError(
            "scd2_stream swaps the dimension directory via os.rename and "
            "supports local paths only; for remote state use a "
            "transactional table format (Delta/Iceberg MERGE)")
    import shutil
    tmp = path.rstrip("/") + ".compact"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        old = path.rstrip("/") + ".old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)


def scd2_apply_batch(current: DataFrame, batch: DataFrame,
                     keys: tuple[str, ...], attrs: tuple[str, ...],
                     ts_col: str, full_snapshot: bool) -> DataFrame | None:
    """One SCD2 maintenance step: collapse the batch to its LATEST row per
    key (ts desc, attrs as the deterministic tiebreak at equal instants),
    then temporal.scd2_merge at the batch's max event time. Returns None on
    an empty batch (no-op)."""
    from logstash_filter_geoip_spark.operators.temporal import scd2_merge

    top = batch.agg(F.max(ts_col)).collect()[0][0]
    if top is None:
        return None
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(a).desc() for a in attrs])
    latest = (batch.withColumn("__rn", F.row_number().over(w))
                   .where(F.col("__rn") == 1)
                   .select(*keys, *attrs))
    as_of = top.strftime("%Y-%m-%d %H:%M:%S.%f")
    return scd2_merge(current, latest, list(keys), list(attrs), as_of,
                      full_snapshot=full_snapshot)


def scd2_stream(spark: SparkSession, input_path: str, dim_path: str,
                checkpoint_path: str, schema: T.StructType,
                keys: tuple[str, ...], attrs: tuple[str, ...],
                ts_col: str = "ts", full_snapshot: bool = False,
                available_now: bool = True):
    """Maintain a type-2 versioned dimension from a stream of change rows:
    each micro-batch is collapsed to latest-per-key and folded into the
    parquet dimension at `dim_path` via temporal.scd2_merge (default
    ``full_snapshot=False`` — a CDC/upsert feed never deletes; pass True
    only when every batch is a complete snapshot).

    Replay safety comes from scd2_merge's idempotence, NOT from the write
    protocol: a checkpointed batch re-applied after a crash re-derives the
    same as_of (max event time of the same rows) and merges the same
    attrs, which is a no-op on the already-updated dimension — the swap
    write then rewrites an identical directory. Exactly-once without any
    transactional sink, because the operator itself is a converging merge.
    """
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        current = _read_state_df(spark, dim_path,
                                 _dim_schema(batch, keys, attrs))
        merged = scd2_apply_batch(current, batch, keys, attrs, ts_col,
                                  full_snapshot)
        if merged is None:
            return
        _swap_write(spark, merged, dim_path)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# novel-log-template detection at ingest (first-seen alerting)
# ---------------------------------------------------------------------------


def novel_template_stream(spark: SparkSession, input_path: str,
                          output_path: str, checkpoint_path: str,
                          state_path: str, schema: T.StructType,
                          text_col: str = "text", id_col: str = "event_id",
                          available_now: bool = True):
    """Emit only rows whose LOG TEMPLATE (semistructured.log_template —
    uuids/hex/ips/numbers normalized away) has never been seen before:
    the streaming "new error shape" alert. A template is message identity,
    so the first-seen machinery of dedup_stream applies verbatim — state
    is template hashes only (32 B per distinct template, i.e. tiny
    forever), within-batch winner is the min-id row, replay is
    at-least-once (the dedup_stream contract and compaction story,
    including `compact_state`)."""
    from logstash_filter_geoip_spark.operators.semistructured import \
        log_template

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        seen = _read_state(spark, state_path)
        t = batch.withColumn("__template", log_template(F.col(text_col)))
        fresh = dedup_batch_against_state(t, seen, ("__template",), id_col)
        fresh = fresh.persist()
        try:
            if fresh.isEmpty():
                return
            (fresh.withColumnRenamed("__template", "template")
                  .drop("content_h").write.mode("append")
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


# ---------------------------------------------------------------------------
# streaming count-min sketch maintenance (exactly-once via batch fencing)
# ---------------------------------------------------------------------------

_CMS_SCHEMA = T.StructType([
    T.StructField("depth", T.IntegerType()),
    T.StructField("bucket", T.IntegerType()),
    T.StructField("c", T.LongType()),
])


def _cms_meta_guard(state_path: str, w: int, d: int, salt: str,
                    hash_basis: str) -> None:
    """Pin (w, d, salt, hash_basis) beside the sketch state: counters are
    only addable under the EXACT bucket hash that wrote them — restarting
    with different parameters would silently fold incompatible counters
    (garbage minima), so a mismatch raises instead (the near-dup meta
    contract)."""
    _meta_guard(state_path,
                {"w": w, "d": d, "salt": salt, "hash_basis": hash_basis},
                "cms",
                "counters from different bucket hashes cannot be added.")


def _sketch_state_read(spark: SparkSession, sketch_path: str,
                       schema: T.StructType | None):
    """(sketch DataFrame or None, committed batch id) — the id travels
    INSIDE the swapped directory (`_commit.json`, underscore-prefixed so
    the parquet reader ignores it), so counters and the fence commit
    atomically in one rename. With ``schema=None`` a missing state reads
    as None (schema inferred from the first written state thereafter);
    shared by every additive-sketch stream (CMS, qsketch)."""
    import json
    _recover_interrupted_compaction(sketch_path)
    if not os.path.exists(sketch_path):
        empty = (spark.createDataFrame([], schema)
                 if schema is not None else None)
        return empty, -1
    committed = -1
    cp = os.path.join(sketch_path, "_commit.json")
    if os.path.exists(cp):
        with open(cp) as f:
            committed = json.load(f)["batch_id"]
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(sketch_path), committed


def _sketch_swap_commit(merged: DataFrame, sketch_path: str,
                        batch_id: int) -> None:
    """Write merged counters + `_commit.json` to a sibling dir, then
    rename-swap — counters and fence become visible in ONE atomic rename
    (the cms_apply_batch contract, shared by every additive sketch)."""
    import json
    import shutil
    tmp = sketch_path.rstrip("/") + ".compact"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_commit.json"), "w") as f:
        json.dump({"batch_id": batch_id}, f)
    if os.path.exists(sketch_path):
        old = sketch_path.rstrip("/") + ".old"
        os.rename(sketch_path, old)
        os.rename(tmp, sketch_path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, sketch_path)


def _cms_state_read(spark: SparkSession, sketch_path: str):
    return _sketch_state_read(spark, sketch_path, _CMS_SCHEMA)


def cms_apply_batch(spark: SparkSession, batch: DataFrame, batch_id: int,
                    sketch_path: str, key_col: str, w: int, d: int,
                    salt: str, hash_basis: str) -> bool:
    """One maintenance step; returns False when the batch was fenced.

    CMS merge is pure ADDITION — NOT idempotent — so exactly-once cannot
    lean on the operator like scd2_stream does. Instead the committed
    batch id rides inside the swapped state directory: a crash between
    the swap and Spark's checkpoint commit replays the SAME batch_id,
    the fence sees id <= committed, and the re-application is a no-op.
    (Corollary, pinned by test: wiping the CHECKPOINT while keeping the
    state double-counts — the fence is per-batch-id, so the checkpoint is
    part of this operator's state, unlike scd2_stream's.)"""
    from logstash_filter_geoip_spark.operators.aggregate import (cms_build,
                                                                 cms_merge)
    prev, committed = _cms_state_read(spark, sketch_path)
    if batch_id <= committed:
        return False
    fresh = cms_build(batch, key_col, w, d, salt, hash_basis)
    merged = cms_merge(prev.unionByName(fresh))
    _sketch_swap_commit(merged, sketch_path, batch_id)
    return True


def cms_stream(spark: SparkSession, input_path: str, state_path: str,
               checkpoint_path: str, schema: T.StructType, key_col: str,
               w: int | None = None, d: int | None = None,
               salt: str = "cms-v1", hash_basis: str = "xxhash64",
               available_now: bool = True):
    """Maintain a count-min frequency sketch from a stream: per micro-batch
    cms_build + counter addition into a swapped parquet state — constant
    state size (d×w counters) however much traffic flows, the streaming
    face of the heavy-hitter sketch. Parameters are meta-pinned; replay
    safety comes from the batch-id fence committed atomically WITH the
    counters (see cms_apply_batch). Local state paths only (the rename
    swap); remote state belongs in a transactional table."""
    from logstash_filter_geoip_spark.operators.aggregate import CMS_D, CMS_W
    w = CMS_W if w is None else w
    d = CMS_D if d is None else d
    if "://" in state_path:
        raise NotImplementedError(
            "cms_stream swaps the state directory via os.rename and "
            "supports local paths only")
    sketch_path = os.path.join(state_path, "sketch")
    _cms_meta_guard(state_path, w, d, salt, hash_basis)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        cms_apply_batch(spark, batch, batch_id, sketch_path, key_col,
                        w, d, salt, hash_basis)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming quantile-sketch maintenance (the qsketch's streaming face)
# ---------------------------------------------------------------------------


def _qsketch_meta_guard(state_path: str, keys: tuple[str, ...],
                        value_col: str, sub_bits: int) -> None:
    """Pin (keys, value_col, sub_bits) beside the state: bucket lower
    bounds are only addable under the EXACT bucketing that wrote them (a
    different sub_bits silently mixes incompatible bucket grids — wrong
    quantiles, no error), so a mismatch raises (the cms meta contract)."""
    _meta_guard(state_path,
                {"keys": list(keys), "value_col": value_col,
                 "sub_bits": sub_bits},
                "qsketch",
                "counters from different bucketings cannot be added.")


def qsketch_apply_batch(spark: SparkSession, batch: DataFrame,
                        batch_id: int, sketch_path: str,
                        keys: tuple[str, ...], value_col: str,
                        sub_bits: int) -> bool:
    """One quantile-sketch maintenance step; returns False when fenced.

    Exactly like cms_apply_batch: bucket counters are pure ADDITION (not
    idempotent), so the committed batch id rides inside the swapped state
    directory and a replayed batch_id is a no-op. The state schema is
    whatever qsketch_build emits for (keys, bucket, c) — inferred on
    read, so keyed sketches of any key type round-trip."""
    from logstash_filter_geoip_spark.operators.aggregate import (
        qsketch_build, qsketch_merge)
    prev, committed = _sketch_state_read(spark, sketch_path, schema=None)
    if batch_id <= committed:
        return False
    fresh = qsketch_build(batch, keys, value_col, sub_bits)
    merged = (fresh if prev is None
              else qsketch_merge(prev.unionByName(fresh), keys))
    _sketch_swap_commit(merged, sketch_path, batch_id)
    return True


def qsketch_stream(spark: SparkSession, input_path: str, state_path: str,
                   checkpoint_path: str, schema: T.StructType,
                   keys: tuple[str, ...], value_col: str,
                   sub_bits: int | None = None,
                   available_now: bool = True):
    """Maintain per-key quantile sketches from a stream: per micro-batch
    qsketch_build + counter addition into a swapped parquet state —
    ≤~2k bucket rows per key however much traffic flows, the streaming
    face of the rank sketch (latency percentiles over an event stream,
    answered any time from the stored state with qsketch_quantiles and NO
    event rescan). Parameters meta-pinned; replay safety = the batch-id
    fence committed atomically with the counters. Local state paths only
    (the rename swap); remote state belongs in a transactional table."""
    from logstash_filter_geoip_spark.operators.aggregate import \
        QSKETCH_SUB_BITS
    sub_bits = QSKETCH_SUB_BITS if sub_bits is None else sub_bits
    if "://" in state_path:
        raise NotImplementedError(
            "qsketch_stream swaps the state directory via os.rename and "
            "supports local paths only")
    sketch_path = os.path.join(state_path, "sketch")
    _qsketch_meta_guard(state_path, keys, value_col, sub_bits)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        qsketch_apply_batch(spark, batch, batch_id, sketch_path, keys,
                            value_col, sub_bits)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming distribution-drift maintenance (operators/drift.py's twin)
# ---------------------------------------------------------------------------


def _drift_meta_guard(state_path: str, spec: dict) -> None:
    """Pin the full bucket/split spec beside the state: side counts are
    only addable under the EXACT bucket rule and split timestamp that
    wrote them (a different split silently mixes windows; a different
    binning mixes bucket grids), so a mismatch raises (the cms meta
    contract)."""
    _meta_guard(state_path, spec, "drift",
                "side counts from different bucket/split rules cannot "
                "be added.")


def _drift_spec(cat_col: str | None, value_col: str | None,
                lo: float | None, hi: float | None,
                n_buckets: int | None, ts_col: str,
                split_ts: str) -> dict:
    if (cat_col is None) == (value_col is None):
        raise ValueError("exactly one of cat_col / value_col is required")
    if cat_col is not None:
        return {"kind": "categorical", "col": cat_col,
                "ts_col": ts_col, "split_ts": split_ts}
    if lo is None or hi is None or n_buckets is None:
        raise ValueError("value drift requires lo, hi, n_buckets")
    return {"kind": "value", "col": value_col, "lo": float(lo),
            "hi": float(hi), "n_buckets": int(n_buckets),
            "ts_col": ts_col, "split_ts": split_ts}


def _drift_bucket_name(spec: dict) -> str:
    return spec["col"] if spec["kind"] == "categorical" else "bucket_idx"


def _drift_bucket(spec: dict):
    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators.aggregate import \
        bucket_idx_expr
    if spec["kind"] == "categorical":
        return F.col(spec["col"]), spec["col"]
    return (bucket_idx_expr(spec["col"], spec["lo"], spec["hi"],
                            spec["n_buckets"]), "bucket_idx")


def drift_apply_batch(spark: SparkSession, batch: DataFrame,
                      batch_id: int, counts_path: str,
                      spec: dict) -> bool:
    """One drift-state maintenance step; returns False when fenced.

    Side counts are pure ADDITION (not idempotent) — the same
    exactly-once contract as cms/qsketch_apply_batch: the committed batch
    id rides inside the swapped state directory, so a replayed batch_id
    is a no-op; wiping the CHECKPOINT while keeping the state
    double-counts (the checkpoint is part of this operator's state)."""
    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators import drift
    prev, committed = _sketch_state_read(spark, counts_path, schema=None)
    if batch_id <= committed:
        return False
    bucket, name = _drift_bucket(spec)
    fresh = drift.side_counts(batch, bucket, name, spec["ts_col"],
                              spec["split_ts"])
    merged = (fresh if prev is None
              else prev.unionByName(fresh).groupBy(name)
                       .agg(F.sum("n_base").alias("n_base"),
                            F.sum("n_curr").alias("n_curr")))
    _sketch_swap_commit(merged, counts_path, batch_id)
    return True


def drift_state_read(spark: SparkSession, state_path: str,
                     lift: tuple[int, int] = (12, 10)):
    """The read face: ppm shares + lift flags over the persisted side
    counts — drift.with_shares, the IDENTICAL stage-2 arithmetic the
    batch operator runs, so a drained stream's drift relation is
    row-identical to the batch operator on the union of its inputs
    (equality test-pinned). Answerable any time without event rescans;
    compose with drift.drift_summary for the TVD rollup."""
    import json

    from logstash_filter_geoip_spark.operators import drift
    mp = os.path.join(state_path, "meta.json")
    with open(mp) as f:
        spec = json.load(f)
    name = _drift_bucket_name(spec)
    counts, _ = _sketch_state_read(
        spark, os.path.join(state_path, "counts"), schema=None)
    if counts is None:
        raise FileNotFoundError(f"no drift state at {state_path!r}")
    return drift.with_shares(counts, name, lift)


def drift_stream(spark: SparkSession, input_path: str, state_path: str,
                 checkpoint_path: str, schema: T.StructType, ts_col: str,
                 split_ts: str, cat_col: str | None = None,
                 value_col: str | None = None, lo: float | None = None,
                 hi: float | None = None, n_buckets: int | None = None,
                 available_now: bool = True):
    """Maintain distribution-drift side counts from a stream: per
    micro-batch drift.side_counts + counter addition into a swapped
    parquet state — ≤ |buckets| rows of state however much traffic
    flows, the streaming face of the feed monitor (categorical via
    cat_col, binned numeric via value_col+lo/hi/n_buckets). Spec is
    meta-pinned; replay safety = the batch-id fence committed atomically
    with the counters (see drift_apply_batch). Local state paths only
    (the rename swap); remote state belongs in a transactional table."""
    if "://" in state_path:
        raise NotImplementedError(
            "drift_stream swaps the state directory via os.rename and "
            "supports local paths only")
    spec = _drift_spec(cat_col, value_col, lo, hi, n_buckets, ts_col,
                       split_ts)
    counts_path = os.path.join(state_path, "counts")
    _drift_meta_guard(state_path, spec)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        drift_apply_batch(spark, batch, batch_id, counts_path, spec)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rolling_drift_apply_batch(spark: SparkSession, batch: DataFrame,
                              batch_id: int, counts_path: str,
                              spec: dict) -> bool:
    """One rolling-drift maintenance step; returns False when fenced.
    Per-(bucket_ts, category) counts are pure ADDITION — same fence
    contract as drift_apply_batch; state size = calendar buckets ×
    categories (one row per pair, however much traffic flows)."""
    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators import drift
    prev, committed = _sketch_state_read(spark, counts_path, schema=None)
    if batch_id <= committed:
        return False
    fresh = drift.rolling_counts_stage(batch, spec["col"], spec["ts_col"],
                                       spec["bucket"])
    merged = (fresh if prev is None
              else prev.unionByName(fresh)
                       .groupBy("bucket_ts", spec["col"])
                       .agg(F.sum("n").alias("n")))
    _sketch_swap_commit(merged, counts_path, batch_id)
    return True


def rolling_drift_state_read(spark: SparkSession, state_path: str,
                             lift: tuple[int, int] = (12, 10)):
    """Read face: drift.rolling_shares — the IDENTICAL stage-2 arithmetic
    as the batch operator, so a drained stream's rolling-drift relation
    is row-identical to rolling_drift on the union of its inputs."""
    import json

    from logstash_filter_geoip_spark.operators import drift
    with open(os.path.join(state_path, "meta.json")) as f:
        spec = json.load(f)
    counts, _ = _sketch_state_read(
        spark, os.path.join(state_path, "counts"), schema=None)
    if counts is None:
        raise FileNotFoundError(f"no rolling-drift state at {state_path!r}")
    return drift.rolling_shares(counts, spec["col"], lift)


def rolling_drift_stream(spark: SparkSession, input_path: str,
                         state_path: str, checkpoint_path: str,
                         schema: T.StructType, cat_col: str, ts_col: str,
                         bucket: str = "day",
                         available_now: bool = True):
    """Maintain day-over-day categorical drift from a stream: per
    micro-batch rolling_counts_stage + counter addition into the swapped
    parquet state. Spec meta-pinned (a different bucket granularity or
    category column cannot be added); exactly-once = the CMS batch-id
    fence. Local state paths only (the rename swap)."""
    if "://" in state_path:
        raise NotImplementedError(
            "rolling_drift_stream swaps the state directory via os.rename "
            "and supports local paths only")
    spec = {"kind": "rolling", "col": cat_col, "ts_col": ts_col,
            "bucket": bucket}
    counts_path = os.path.join(state_path, "counts")
    _meta_guard(state_path, spec, "rolling-drift",
                "counts from different bucket granularities or category "
                "columns cannot be added.")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        rolling_drift_apply_batch(spark, batch, batch_id, counts_path,
                                  spec)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming exact-k sample maintenance (the distributed reservoir at ingest)
# ---------------------------------------------------------------------------


def sample_apply_batch(spark: SparkSession, batch: DataFrame,
                       state_path: str, strata_col: str, key_col: str,
                       k: int, salt: str) -> None:
    """One maintenance step of the deterministic exact-k sample: union the
    persisted kept rows with the batch, exact-row dedup, re-select each
    stratum's k smallest salted hash keys (sampling._sample_rank_key — the
    SAME rule as the batch operator), swap-write the survivors.

    Exactly-once comes from CONVERGENCE, not a fence (the scd2_stream
    contract, unlike CMS addition): min-k is idempotent under re-unioning
    rows it already saw — any replayed row either is in the state or is
    dominated by k smaller keys that are. State is k rows per stratum,
    tiny forever; `key_col` must be a unique row id by contract (replayed
    rows are EXACT duplicates, so the full-row dedup is deterministic)."""
    from logstash_filter_geoip_spark.operators.sampling import \
        _sample_rank_key

    current = _read_state_df(spark, state_path, batch.schema)
    union = current.unionByName(batch).dropDuplicates()
    rk = _sample_rank_key(key_col, salt)
    w = Window.partitionBy(strata_col).orderBy(rk.asc(), F.col(key_col))
    kept = (union.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") <= k).drop("__rn"))
    _swap_write(spark, kept, state_path)


def sample_state_read(spark: SparkSession, state_path: str,
                      strata_col: str, key_col: str, k: int,
                      salt: str) -> DataFrame:
    """Read the maintained sample and re-derive ``sample_rank`` (stage 2 on
    read, the drift_state_read convention — the state stores rows only;
    rank is a pure function of the kept set). Row-identical to running
    sampling.sample_exact_k over everything ingested so far."""
    import json
    with open(os.path.join(state_path, "meta.json")) as f:
        saved = json.load(f)
    spec = {"kind": "exact_k_sample", "strata_col": strata_col,
            "key_col": key_col, "k": k, "salt": salt}
    if saved != spec:
        raise ValueError(
            f"sample state at {state_path!r} was maintained with {saved}; "
            f"read requested {spec} — a different spec is a different "
            "draw, not a reranking of this one.")
    from logstash_filter_geoip_spark.operators.sampling import \
        _sample_rank_key
    rows = spark.read.parquet(os.path.join(state_path, "rows"))
    rk = _sample_rank_key(key_col, salt)
    w = Window.partitionBy(strata_col).orderBy(rk.asc(), F.col(key_col))
    return rows.withColumn("sample_rank", F.row_number().over(w))


def sample_stream(spark: SparkSession, input_path: str, state_path: str,
                  checkpoint_path: str, schema: T.StructType,
                  strata_col: str, key_col: str, k: int,
                  salt: str = "ksample-v1", available_now: bool = True):
    """Maintain sampling.sample_exact_k incrementally at ingest: after any
    prefix of the stream, the state holds EXACTLY the rows the batch
    operator would select from everything ingested so far (the drained ==
    batch parity test pins it). The spec is meta-pinned — resuming with a
    different (strata, key, k, salt) raises instead of silently mixing
    two different draws. Local state paths only (the rename swap)."""
    if "://" in state_path:
        raise NotImplementedError(
            "sample_stream swaps the state directory via os.rename and "
            "supports local paths only")
    spec = {"kind": "exact_k_sample", "strata_col": strata_col,
            "key_col": key_col, "k": k, "salt": salt}
    rows_path = os.path.join(state_path, "rows")
    _meta_guard(state_path, spec, "exact-k sample",
                "rows selected under different specs are different draws "
                "and cannot be merged.")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        sample_apply_batch(spark, batch, rows_path, strata_col, key_col,
                           k, salt)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming inverted-index maintenance (retrieval's streaming face)
# ---------------------------------------------------------------------------


def _index_meta_guard(state_path: str, text_col: str, id_type: str) -> None:
    """Pin (tokenizer, text column, id type) beside the index: postings
    built under a different tokenizer/text column are a DIFFERENT index —
    merging them silently skews df/dl for every query, so mismatch raises
    (the near-dup meta contract)."""
    from logstash_filter_geoip_spark.operators.retrieval import WORD_RE
    _meta_guard(state_path,
                {"kind": "postings_index", "word_re": WORD_RE,
                 "text_col": text_col, "id_type": id_type},
                "postings index",
                "postings from different tokenizers/columns cannot be "
                "merged.")


def index_state_read(spark: SparkSession, index_path: str):
    """(postings, doclens, committed batch id) from the drained index
    state. ``postings`` is the (term, doc_id, dl, tf) relation
    :func:`retrieval.bm25_from_index` probes; ``doclens`` is (doc_id, dl)
    for EVERY admitted doc — zero-token and NULL-text docs ride a
    term-NULL row so N and sum_dl reproduce the batch scan exactly."""
    state, committed = _sketch_state_read(spark, index_path, None)
    if state is None:
        return None, None, committed
    return (state.where(F.col("term").isNotNull())
                 .select("term", "doc_id", "dl", "tf"),
            state.where(F.col("term").isNull()).select("doc_id", "dl"),
            committed)


def index_apply_batch(spark: SparkSession, batch: DataFrame, batch_id: int,
                      index_path: str, text_col: str = "text") -> bool:
    """One index-maintenance step; returns False when the batch was fenced.

    Appends are NOT idempotent (a replayed batch would double tf/df), so
    the CMS batch-id fence applies: the committed id rides inside the
    swapped state directory. Re-ingested doc_ids are FIRST-WINS — the
    batch anti-joins the already-admitted doc set (the dedup_stream
    admission semantic), so re-publishing a doc never corrupts df.

    State rows use ONE union schema: posting rows (term, doc_id, dl, tf)
    plus a term-NULL row per admitted doc carrying its dl (NULL for
    NULL-text docs — they count toward N but not sum_dl, mirroring the
    batch scan's F.sum semantics).
    """
    from logstash_filter_geoip_spark.operators.retrieval import (WORD_RE,
                                                                 build_postings)
    prev, committed = _sketch_state_read(spark, index_path, None)
    if batch_id <= committed:
        return False
    if prev is not None:
        seen = prev.where(F.col("term").isNull()).select("doc_id")
        batch = batch.join(seen, "doc_id", "left_anti")
    post = build_postings(batch, text_col).select(
        "term", "doc_id", F.col("dl").cast("int").alias("dl"),
        F.col("tf").cast("long").alias("tf"))
    dld = batch.select(
        F.lit(None).cast("string").alias("term"), "doc_id",
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit(WORD_RE), 0)).alias("dl"),
        F.lit(None).cast("long").alias("tf"))
    fresh = post.unionByName(dld)
    merged = prev.unionByName(fresh) if prev is not None else fresh
    _sketch_swap_commit(merged, index_path, batch_id)
    return True


def index_stream(spark: SparkSession, input_path: str, state_path: str,
                 checkpoint_path: str, schema: T.StructType,
                 text_col: str = "text", available_now: bool = True):
    """Maintain a BM25-probeable inverted index from a document stream:
    per micro-batch tokenize → postings append under the batch-id fence —
    after any drain, ``bm25_from_index(*index_state_read(...))`` returns
    row-for-row what the batch ``bm25_multi_topk`` computes over every
    document ingested so far (pinned by test). Tokenizer/text-column/id
    parameters are meta-pinned; local state paths only (the rename swap).

    Scale note: the swap rewrites the full postings relation per batch —
    at production scale the state belongs in a transactional table with
    appends (the dedup_stream boundary); the fence/meta/first-wins
    semantics carry over unchanged.
    """
    if "://" in state_path:
        raise NotImplementedError(
            "index_stream swaps the state directory via os.rename and "
            "supports local paths only")
    index_path = os.path.join(state_path, "index")
    id_type = str(schema["doc_id"].dataType)
    _index_meta_guard(state_path, text_col, id_type)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        index_apply_batch(spark, batch, batch_id, index_path, text_col)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming association-rule maintenance (operators/basket.py's twin)
# ---------------------------------------------------------------------------


def _rules_meta_guard(state_path: str, basket_col: str, item_col: str,
                      max_basket: int, item_type: str) -> None:
    """Pin (basket_col, item_col, max_basket, item_type) beside the state:
    counters are only addable under the EXACT universe rule that wrote
    them (a different max_basket silently mixes incompatible universes —
    wrong supports, no error), so a mismatch raises (the cms meta
    contract)."""
    _meta_guard(state_path,
                {"basket_col": basket_col, "item_col": item_col,
                 "max_basket": max_basket, "item_type": item_type},
                "rules",
                "counters from different basket universes cannot be added.")


def rules_apply_batch(spark: SparkSession, batch: DataFrame, batch_id: int,
                      sketch_path: str, basket_col: str, item_col: str,
                      max_basket: int) -> bool:
    """One rule-counter maintenance step; returns False when fenced.

    Counter addition is valid ONLY under the BASKET-ATOMIC contract:
    every basket arrives wholly within one micro-batch (order-shaped
    ingestion, where an order's lines land together). A basket split
    across batches is counted as two disjoint sub-baskets — its
    cross-batch pairs are silently lost; route such feeds through the
    batch operator over a completed snapshot instead. Addition is NOT
    idempotent, so exactly-once is the CMS batch-id fence committed
    atomically inside the swapped state directory."""
    from logstash_filter_geoip_spark.operators.basket import (
        merge_rule_counts, rule_counts)
    prev, committed = _sketch_state_read(spark, sketch_path, schema=None)
    if batch_id <= committed:
        return False
    # cache=False: the operator-internal persists have no unpersist handle
    # here, so a continuous stream would leak one CacheManager entry pair
    # PER MICRO-BATCH (the persist-then-unpersist discipline of every
    # apply-batch in this file); the swap evaluates the plan exactly once
    # and micro-batches are small, so subtree re-execution is the cheaper
    # side of the trade
    fresh = rule_counts(batch, basket_col, item_col, max_basket,
                        cache=False)
    merged = (fresh if prev is None
              else merge_rule_counts(prev.unionByName(fresh)))
    _sketch_swap_commit(merged, sketch_path, batch_id)
    return True


def rules_state_read(spark: SparkSession, state_path: str,
                     min_pair_n: int = 1):
    """The current rule relation from stored counters — the identical
    stage-2 arithmetic as the batch operator (basket.rules_from_counts),
    no basket rescans."""
    from logstash_filter_geoip_spark.operators.basket import \
        rules_from_counts
    counts, _ = _sketch_state_read(
        spark, os.path.join(state_path, "sketch"), schema=None)
    if counts is None:
        raise FileNotFoundError(f"no rules state under {state_path}")
    return rules_from_counts(counts, min_pair_n=min_pair_n)


def rules_stream(spark: SparkSession, input_path: str, state_path: str,
                 checkpoint_path: str, schema: T.StructType,
                 basket_col: str, item_col: str,
                 max_basket: int | None = None,
                 available_now: bool = True):
    """Maintain association-rule counters from a stream: per micro-batch
    basket.rule_counts + counter addition into a swapped parquet state —
    state is ≤ |items|² pair rows + |items| item rows + 1 total row
    however much traffic flows; support/confidence/lift answered any time
    from the stored counters (rules_state_read) with NO basket rescan.
    BASKET-ATOMIC input contract and the CMS exactly-once fence (see
    rules_apply_batch); parameters meta-pinned incl. the item type.
    Local state paths only (the rename swap)."""
    from logstash_filter_geoip_spark.operators.basket import MAX_BASKET
    max_basket = MAX_BASKET if max_basket is None else max_basket
    if "://" in state_path:
        raise NotImplementedError(
            "rules_stream swaps the state directory via os.rename and "
            "supports local paths only")
    sketch_path = os.path.join(state_path, "sketch")
    item_type = schema[item_col].dataType.simpleString()
    _rules_meta_guard(state_path, basket_col, item_col, max_basket,
                      item_type)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        rules_apply_batch(spark, batch, batch_id, sketch_path, basket_col,
                          item_col, max_basket)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming cluster-occupancy monitor (the integer k-means streaming face)
# ---------------------------------------------------------------------------


def _cluster_meta_guard(state_path: str, centroids: list[list[int]],
                        dim: int, emb_col: str) -> None:
    """Pin the FULL centroid matrix (k×dim BIGINTs — argument-bounded)
    beside the state: occupancy counters are only addable under the EXACT
    centroids that wrote them (changed centroids silently mix two
    different cluster geometries into one counter set), so a mismatch
    raises (the cms meta contract)."""
    _meta_guard(state_path,
                {"centroids": [[int(x) for x in c] for c in centroids],
                 "dim": dim, "emb_col": emb_col},
                "cluster",
                "occupancy counters from different centroid sets cannot "
                "be added.")


def cluster_apply_batch(spark: SparkSession, batch: DataFrame,
                        batch_id: int, sketch_path: str,
                        centroids: list[list[int]], dim: int,
                        emb_col: str) -> bool:
    """One occupancy-maintenance step; returns False when fenced.

    The per-batch profile is clustering.cluster_profile — the IDENTICAL
    assignment + rollup the batch operator runs (one definition, never
    forked) — and profiles are pure ADDITION across inputs (not
    idempotent), so exactly-once is the shared sketch batch-id fence
    committed atomically with the counters."""
    from logstash_filter_geoip_spark.operators.clustering import \
        cluster_profile
    prev, committed = _sketch_state_read(spark, sketch_path, schema=None)
    if batch_id <= committed:
        return False
    fresh = cluster_profile(batch, centroids, dim=dim, emb_col=emb_col)
    merged = (fresh if prev is None
              else prev.unionByName(fresh).groupBy("cid")
                       .agg(F.sum("n_members").alias("n_members"),
                            F.sum("inertia").alias("inertia")))
    _sketch_swap_commit(merged, sketch_path, batch_id)
    return True


def cluster_state_read(spark: SparkSession, state_path: str) -> DataFrame:
    """The read face: the (cid, n_members, inertia) occupancy profile —
    row-identical to batch clustering.cluster_profile over the union of
    every ingested input (equality test-pinned), answered any time from
    ≤ k rows of state with no vector rescan."""
    counts, _ = _sketch_state_read(
        spark, os.path.join(state_path, "sketch"), schema=None)
    if counts is None:
        raise FileNotFoundError(f"no cluster state at {state_path!r}")
    return counts


def cluster_stream(spark: SparkSession, input_path: str, state_path: str,
                   checkpoint_path: str, schema: T.StructType,
                   centroids: list[list[int]], dim: int | None = None,
                   emb_col: str = "embedding",
                   available_now: bool = True):
    """Maintain a cluster-occupancy profile from an embedding stream: per
    micro-batch fixed-centroid assignment (clustering.assign_fixed — pure
    codegen, no shuffle beyond the ≤k-group rollup) + counter addition
    into a swapped parquet state — ≤ k rows of state however much traffic
    flows, the corpus-composition monitor ("which topics is the feed
    drifting toward") answered without rescanning vectors. Centroids come
    from a batch clustering.train_centroids run and are meta-pinned in
    full; replay safety = the batch-id fence committed atomically with
    the counters. Local state paths only (the rename swap); remote state
    belongs in a transactional table."""
    from logstash_filter_geoip_spark.operators.clustering import DIM
    dim = DIM if dim is None else dim
    if "://" in state_path:
        raise NotImplementedError(
            "cluster_stream swaps the state directory via os.rename and "
            "supports local paths only")
    sketch_path = os.path.join(state_path, "sketch")
    _cluster_meta_guard(state_path, centroids, dim, emb_col)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        cluster_apply_batch(spark, batch, batch_id, sketch_path,
                            centroids, dim, emb_col)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# streaming seasonal-baseline maintenance (hygiene.seasonal_anomalies' twin)
# ---------------------------------------------------------------------------


def _seasonal_meta_guard(state_path: str, ts_col: str) -> None:
    """Pin the timestamp column beside the state: daily-hour cell counts
    are only addable under the SAME bucketing input (a different ts
    column silently mixes calendars), so a mismatch raises (the cms meta
    contract)."""
    _meta_guard(state_path, {"ts_col": ts_col}, "seasonal",
                "daily-hour counts from different ts columns cannot "
                "be added.")


def seasonal_apply_batch(spark: SparkSession, batch: DataFrame,
                         batch_id: int, counts_path: str,
                         ts_col: str) -> bool:
    """One seasonal-state maintenance step; returns False when fenced.

    Daily-hour cell counts are pure ADDITION (not idempotent) — the same
    exactly-once contract as cms/qsketch/drift_apply_batch: the committed
    batch id rides inside the swapped state directory, so a replayed
    batch_id is a no-op; the checkpoint is part of this operator's
    state."""
    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators import hygiene
    prev, committed = _sketch_state_read(spark, counts_path, schema=None)
    if batch_id <= committed:
        return False
    fresh = hygiene.seasonal_daily(batch, ts_col)
    merged = (fresh if prev is None
              else prev.unionByName(fresh)
                       .groupBy("event_type", "day", "hr")
                       .agg(F.sum("n_events").alias("n_events")))
    _sketch_swap_commit(merged, counts_path, batch_id)
    return True


def seasonal_stream(spark: SparkSession, input_path: str, state_path: str,
                    checkpoint_path: str, schema: T.StructType,
                    ts_col: str = "ts", available_now: bool = True):
    """Maintain hour-of-day seasonal baselines from a stream: per
    micro-batch hygiene.seasonal_daily + cell-count addition into a
    swapped parquet state — types × days × 24 rows however much traffic
    flows (the rolling_drift calendar-sized precedent). The ts column is
    meta-pinned; replay safety = the batch-id fence committed atomically
    with the counters. Local state paths only (the rename swap)."""
    if "://" in state_path:
        raise NotImplementedError(
            "seasonal_stream swaps the state directory via os.rename and "
            "supports local paths only")
    counts_path = os.path.join(state_path, "counts")
    _seasonal_meta_guard(state_path, ts_col)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        seasonal_apply_batch(spark, batch, batch_id, counts_path, ts_col)

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def seasonal_state_read(spark: SparkSession, state_path: str,
                        over_pct: int | None = None,
                        under_pct: int | None = None):
    """The read face: median baselines + anomaly flags over the persisted
    daily-hour counts — hygiene.seasonal_flags, the IDENTICAL stage-2
    windows the batch operator runs, so a drained stream's anomaly
    relation is row-identical to the batch operator on the union of its
    inputs (equality test-pinned). Answerable any time without event
    rescans."""
    from logstash_filter_geoip_spark.operators import hygiene
    counts, _ = _sketch_state_read(
        spark, os.path.join(state_path, "counts"), schema=None)
    if counts is None:
        raise FileNotFoundError(f"no seasonal state at {state_path!r}")
    kw = {}
    if over_pct is not None:
        kw["over_pct"] = over_pct
    if under_pct is not None:
        kw["under_pct"] = under_pct
    return hygiene.seasonal_flags(counts, **kw)
