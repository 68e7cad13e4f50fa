"""Structured Streaming variant of the pipeline (SURVEY.md §2.7).

The reference is a streaming pipeline element with no cross-event state —
the one time-varying input is the hot database swap (geoip.rb:156-171). The
Spark mapping:

  * `foreachBatch` runs the IDENTICAL batch transform per micro-batch, so
    batch and streaming can never drift semantically.
  * in the `run_stream` (foreachBatch) variant the dimension table is
    re-loaded via a provider callable at every batch — the hot-swap
    analogue (S4): push a new CIDR table, the next micro-batch joins
    against it; a None dim → unhealthy → every row tagged
    `_geoip_expired_database`. The two plan-level variants below
    (conv_state_tracker, windowed_stream_agg) resolve the provider ONCE at
    query start — their enrich join is part of a fixed streaming plan — so
    hot swap there means restarting the query from its checkpoint; use
    run_stream when mid-query swaps are required.
  * `checkpointLocation` gives exactly-once sink state across restarts; the
    windowed-aggregate variant adds `withWatermark` so late rows beyond the
    delay are dropped (documented sink contract).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import GeoIPConfig
from ..functions.parse import parse_transcripts
from ..operators.enrich import enrich
from ..sources.geolite2 import GOLDEN_ROWS_V6, vendored_dims

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _default_config() -> GeoIPConfig:
    """Streaming default mirrors the batch default (pipeline.py): unified
    family-agnostic source so batch and stream can never drift."""
    return GeoIPConfig(source="ip_any", target="geoip",
                       database="City", ecs_compatibility=True)


def _auto_dim_v6(spark: SparkSession, config: GeoIPConfig) -> DataFrame | None:
    """Auto-loaded v6 leg = the DEFAULT dim path (full vendored ingestion,
    golden fallback) — the same source the batch pipeline uses, so a
    provider that returns only a v4 dim cannot make batch and stream
    enrich against different v6 data."""
    if config.source == "ip_any" and config.database in GOLDEN_ROWS_V6:
        return vendored_dims(spark, config.database)[1]
    return None


def _provided_dims(dim_provider, spark: SparkSession, config: GeoIPConfig):
    """Normalize a dim_provider result to (dim, dim_v6).

    S4 hot-swap covers BOTH join legs (VERDICT r2 #6): a provider may return
    either a single v4 dim (back-compat — the v6 dim then auto-loads from
    the vendored goldens per batch, or is None when the v4 dim is None i.e.
    expired) or an explicit (dim, dim_v6) tuple, in which case BOTH legs
    swap per micro-batch and no auto-load happens (a None dim_v6 inside a
    tuple means "no v6 dim", honestly — v6 rows miss)."""
    d = dim_provider()
    if isinstance(d, tuple):
        dim, dim_v6 = d
        return dim, dim_v6, False
    return d, (None if d is None else _auto_dim_v6(spark, config)), True


def enrich_batch(batch: DataFrame, dim: DataFrame | None,
                 config: GeoIPConfig,
                 dim_v6: DataFrame | None = None,
                 auto_v6: bool = True,
                 event_time_col: str | None = None) -> DataFrame:
    """The shared per-micro-batch transform (same code as the batch path).

    A None dim models the expired/absent database (S4 `:expire`): enrich()
    with healthy=False never touches the dim argument and tags every row
    `_geoip_expired_database`. With auto_v6 (default) a missing dim_v6 falls
    back to the DEFAULT v6 dim (full vendored ingestion — the same pair the
    batch path uses); callers that resolve both dims through a provider
    (hot swap) pass auto_v6=False so an explicit None stays None.

    `event_time_col` switches to VERSIONED-database enrichment: the
    provider supplies an append-only `temporal.dim_history` and each row
    joins to the snapshot valid at its OWN event time — so late arrivals
    and checkpoint replays reproduce the original enrichment even after a
    database update (the drift-free alternative to the wall-clock swap).
    """
    parsed = parse_transcripts(batch)
    if dim is None:
        cfg = GeoIPConfig(source=config.source, target=config.target,
                          fields=config.fields, database=config.database,
                          ecs_compatibility=config.ecs_compatibility,
                          tag_on_failure=list(config.tag_on_failure),
                          healthy=False)
        return enrich(parsed, None, cfg)
    if dim_v6 is None and auto_v6:
        dim_v6 = _auto_dim_v6(batch.sparkSession, config)
    return enrich(parsed, dim, config, dim_v6=dim_v6,
                  event_time_col=event_time_col)


def run_stream(spark: SparkSession, input_path: str, output_path: str,
               checkpoint_path: str,
               dim_provider: Callable[[], DataFrame | None],
               config: GeoIPConfig | None = None,
               available_now: bool = True,
               event_time_col: str | None = None):
    """File-source → foreachBatch(enrich → partitioned sink) with checkpoint.

    `dim_provider` is called once per micro-batch (hot DB swap, S4).
    With available_now=True the query drains all pending input and stops —
    the test/CI mode; a real deployment omits it and runs continuously.

    With `event_time_col`, the provider returns an APPEND-ONLY versioned
    history (temporal.dim_history) instead of the current file: database
    updates append a snapshot rather than replacing the dim, making
    enrichment a pure function of (row, event time) — late arrivals and
    full checkpoint replays reproduce the original output bit-for-bit
    (pinned by test), which the wall-clock swap cannot guarantee.
    """
    config = config or _default_config()
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        dim, dim_v6, _ = _provided_dims(dim_provider, spark, config)
        out = enrich_batch(batch, dim, config, dim_v6=dim_v6, auto_v6=False,
                           event_time_col=event_time_col)
        (out.write.mode("append")
            .partitionBy("role")
            .parquet(os.path.join(output_path, "sinks")))

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q


CONV_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_failures", T.LongType()),
    T.StructField("last_country", T.StringType()),
    # event time of the row that SET last_country (not the overall max ts:
    # comparing against the overall max let a batch whose newest row had a
    # NULL country regress last_country to an older out-of-order row)
    T.StructField("country_ts", T.TimestampType()),
])

CONV_STATE_OUTPUT = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_failures", T.LongType()),
    T.StructField("last_country", T.StringType()),
])


def conv_state_tracker(spark: SparkSession, input_path: str,
                       output_path: str, checkpoint_path: str,
                       dim_provider,
                       config: GeoIPConfig | None = None):
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-conversation enrichment state — turn count, failure count, and the
    country of the latest-seen turn — maintained across micro-batches AND
    across restarts via the checkpoint.

    This is the stateful-streaming capability the reference cannot express
    (it holds no cross-event state, SURVEY §2.7); at 10^12 turns the state
    store shards by conv_id, so state size is O(active conversations), not
    O(turns). Arrow-batched per group; no per-row Python.

    dim_provider is resolved ONCE at query start (the enrich join is part
    of the fixed streaming plan); for per-micro-batch hot swap use
    run_stream, or restart this query from its checkpoint after a swap.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    config = config or _default_config()
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))
    dim, dim_v6, _ = _provided_dims(dim_provider, spark, config)
    enriched = enrich_batch(stream, dim, config, dim_v6=dim_v6, auto_v6=False)
    slim = enriched.select(
        "conv_id", "turn_idx", "ts",
        F.col(f"{config.target}.geo.country_iso_code").alias("country"),
        F.array_contains("tags", "_geoip_lookup_failure").alias("failed"))

    def update(key, pdf_iter, state: GroupState):
        n, fails, last_country, country_ts = (
            state.get if state.exists else (0, 0, None, None))
        for pdf in pdf_iter:
            n += len(pdf)
            fails += int(pdf["failed"].sum())
            # last_country = country of the latest-seen turn that HAS a
            # country; the comparison key is that row's own ts, so a newer
            # null-country row can never drag the state back to an older
            # out-of-order row's country
            tail = pdf[pdf["country"].notna()].sort_values(["ts", "turn_idx"])
            if len(tail):
                ts_c = tail["ts"].iloc[-1]
                if country_ts is None or ts_c >= country_ts:
                    last_country = tail["country"].iloc[-1]
                    country_ts = ts_c
        state.update((n, fails, last_country, country_ts))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n],
                            "n_failures": [fails],
                            "last_country": [last_country]})

    updates = slim.groupBy("conv_id").applyInPandasWithState(
        update, CONV_STATE_OUTPUT, CONV_STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(output_path)

    return (updates.writeStream.outputMode("update").foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


VELOCITY_STATE_SCHEMA = T.StructType([
    # the last LOCATED point of the conversation — the lag() reference
    T.StructField("turn_idx", T.LongType()),
    T.StructField("ts_ns", T.LongType()),
    T.StructField("lat_mdeg", T.LongType()),
    T.StructField("lon_mdeg", T.LongType()),
])

VELOCITY_OUTPUT = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("prev_turn_idx", T.IntegerType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("dt_s", T.LongType()),
    T.StructField("dist2_mdeg2", T.LongType()),
    T.StructField("is_violation", T.IntegerType()),
])


def geo_velocity_stream(spark: SparkSession, input_path: str,
                        output_path: str, checkpoint_path: str,
                        dim_provider,
                        config: GeoIPConfig | None = None,
                        vmax_mdeg_per_hr: int | None = None,
                        max_gap_s: int | None = None):
    """Streaming impossible-travel screen (applyInPandasWithState): the
    stateful twin of ``operators/geo.geo_velocity``. State per conversation
    is ONE row — the last located point (turn_idx, ts_ns, lat_mdeg,
    lon_mdeg) — so a pair that straddles a micro-batch (or restart)
    boundary is still emitted, and state is O(active conversations), never
    O(turns): the streaming-correct shape for an unbounded screen.

    No-drift contract: the millidegree rounding is the SAME Column
    expression as the batch operator (geo._mdeg, applied BEFORE the
    stateful group so both engines round identically), and the pair
    arithmetic is geo.velocity_pairs_pd — the vectorized int64 mirror of
    the batch Column expression. A drained in-order stream therefore equals
    the batch operator row-for-row, including pairs across batch/restart
    boundaries (pinned in tests/test_geo_stream.py). Ordering contract:
    each conversation's turns must arrive in ``turn_idx`` order ACROSS
    micro-batches (within one batch they are sorted); an earlier turn
    arriving after a later one pairs against the newer reference point —
    the same drift any lag()-based stream has.

    dim_provider resolves ONCE at query start (fixed streaming plan — the
    conv_state_tracker rule); restart from checkpoint after a swap.
    """
    import pandas as pd

    from ..operators import geo

    vmax = geo.VMAX_MDEG_PER_HR if vmax_mdeg_per_hr is None else vmax_mdeg_per_hr
    gap = geo.MAX_GAP_S if max_gap_s is None else max_gap_s
    geo._check_params(vmax, gap)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    config = config or _default_config()
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))
    dim, dim_v6, _ = _provided_dims(dim_provider, spark, config)
    enriched = enrich_batch(stream, dim, config, dim_v6=dim_v6, auto_v6=False)
    lat = F.col(f"{config.target}.geo.location.lat")
    lon = F.col(f"{config.target}.geo.location.lon")
    # located rows only (misses never break pairing — they are filtered
    # BEFORE the stateful group, the batch operator's drop-then-lag rule);
    # mdeg rounding + epoch-ns extraction stay Column-side so the rounding
    # is bit-identical to batch (TRANSCRIPT_SCHEMA pins ts as TIMESTAMP,
    # so unix_micros is legal here; dt is a difference — tz cancels)
    pts_cols = ["turn_idx", "ts_ns", "lat_mdeg", "lon_mdeg"]
    located = (enriched
               .where(lat.isNotNull() & lon.isNotNull())
               .select("conv_id", "turn_idx",
                       (F.unix_micros("ts") * F.lit(1000)).alias("ts_ns"),
                       geo._mdeg(lat).alias("lat_mdeg"),
                       geo._mdeg(lon).alias("lon_mdeg")))

    def update(key, pdf_iter, state: GroupState):
        frames = [pdf[pts_cols] for pdf in pdf_iter]
        pts = (pd.concat(frames, ignore_index=True)
               if len(frames) != 1 else frames[0])
        pts = (pts.astype("int64")
               .sort_values("turn_idx", kind="mergesort",
                            ignore_index=True))
        if state.exists:
            prev = pd.DataFrame([state.get], columns=pts_cols)
            pts = pd.concat([prev, pts], ignore_index=True)
        pairs = geo.velocity_pairs_pd(pts, vmax, gap)
        last = pts.iloc[-1]
        state.update((int(last["turn_idx"]), int(last["ts_ns"]),
                      int(last["lat_mdeg"]), int(last["lon_mdeg"])))
        if len(pairs):
            yield pd.DataFrame({
                "conv_id": key[0],
                "prev_turn_idx": pairs["prev_turn_idx"].astype("int32"),
                "turn_idx": pairs["turn_idx"].astype("int32"),
                "dt_s": pairs["dt_s"].astype("int64"),
                "dist2_mdeg2": pairs["dist2_mdeg2"].astype("int64"),
                "is_violation": pairs["is_violation"].astype("int32"),
            })

    out = located.groupBy("conv_id").applyInPandasWithState(
        update, VELOCITY_OUTPUT, VELOCITY_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(output_path)

    return (out.writeStream.outputMode("append").foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


RETRY_STATE_SCHEMA = T.StructType([
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
])

RETRY_OUTPUT = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("cur_len", T.IntegerType()),
    T.StructField("ext_len", T.IntegerType()),
])


def retry_collapse_stream(spark: SparkSession, input_path: str,
                          output_path: str, checkpoint_path: str):
    """Streaming retry-artifact collapse (applyInPandasWithState): the
    stateful twin of ``operators/hygiene.retry_collapse``. State per
    conversation is ONE row — the last turn (turn_idx, role, text) — so a
    superseded pair straddling a micro-batch (or restart) boundary is
    still emitted, and state is O(active conversations) × one turn's
    text, never O(turns).

    No-drift contract: the pair rule is hygiene.superseded_pairs_pd —
    the pandas mirror the batch operator's Column expression is
    equality-pinned against (drained in-order stream == batch, incl. a
    cross-restart pair, tests/test_hygiene.py). Ordering contract: each
    conversation's turns must arrive in turn_idx order ACROSS
    micro-batches (within one batch they are sorted) — the same lag-drift
    caveat as geo_velocity_stream."""
    import pandas as pd

    from ..operators import hygiene
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))
    cols = ["turn_idx", "role", "text"]
    turns = stream.select("conv_id", *cols)

    def update(key, pdf_iter, state: GroupState):
        frames = [pdf[cols] for pdf in pdf_iter]
        pts = (pd.concat(frames, ignore_index=True)
               if len(frames) != 1 else frames[0])
        pts = pts.sort_values("turn_idx", kind="mergesort",
                              ignore_index=True)
        if state.exists:
            pts = pd.concat([pd.DataFrame([state.get], columns=cols),
                             pts], ignore_index=True)
        pairs = hygiene.superseded_pairs_pd(pts)
        last = pts.iloc[-1]
        state.update((int(last["turn_idx"]),
                      last["role"] if isinstance(last["role"], str)
                      else None,
                      last["text"] if isinstance(last["text"], str)
                      else None))
        if len(pairs):
            yield pd.DataFrame({
                "conv_id": key[0],
                "turn_idx": pairs["turn_idx"].astype("int32"),
                "role": pairs["role"],
                "cur_len": pairs["cur_len"].astype("int32"),
                "ext_len": pairs["ext_len"].astype("int32"),
            })

    out = turns.groupBy("conv_id").applyInPandasWithState(
        update, RETRY_OUTPUT, RETRY_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(output_path)

    return (out.writeStream.outputMode("append").foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


def windowed_stream_agg(spark: SparkSession, input_path: str,
                        output_path: str, checkpoint_path: str,
                        dim_provider: Callable[[], DataFrame | None],
                        config: GeoIPConfig | None = None,
                        watermark: str = "1 hour",
                        window: str = "1 hour"):
    """Streaming windowed aggregate with watermark: turns + failures per geo
    bucket per event-time window. Late rows beyond `watermark` are dropped —
    that is the documented completeness contract of this sink.
    dim_provider is resolved ONCE at query start (see module docstring);
    use run_stream for per-micro-batch hot swap."""
    config = config or _default_config()
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path))
    dim, dim_v6, _ = _provided_dims(dim_provider, spark, config)
    enriched = enrich_batch(stream.withWatermark("ts", watermark), dim, config,
                            dim_v6=dim_v6, auto_v6=False)
    aggregated = (
        enriched.groupBy(
            F.window("ts", window).alias("w"),
            F.col(f"{config.target}.geo.country_iso_code").alias("country_iso_code"))
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(F.when(F.array_contains("tags", "_geoip_lookup_failure"), 1)
                    .otherwise(0)).alias("n_failures"))
        .select(F.col("w.start").alias("window_start"), "country_iso_code",
                "n_turns", "n_failures")
    )
    return (aggregated.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", output_path)
            .start())


def attribution_join(src: DataFrame, max_lag: str = "30 minutes",
                     watermark: str | None = None) -> DataFrame:
    """Error-to-tool attribution: every parsed error turn joined to the
    tool-bearing turns of the SAME conversation in the preceding
    ``max_lag`` (inclusive on both ends) — all candidate attributions; the
    consumer picks a policy (latest-wins, weighting) downstream.

    ONE definition for batch and streaming (the same no-drift rule as
    enrich_batch): with ``watermark`` set and a streaming ``src`` this is a
    stream-stream event-time interval self-join — Spark keeps join state
    only for rows inside watermark + lag, so state is O(recent traffic),
    not O(stream); without it, the identical batch plan (the driver query's
    oracle checks that one, which by construction checks this one).

    Skew guard: joining on conv_id alone buffers EVERY same-conversation
    (error × tool) pair before the range filter — quadratic in the hot
    conversation (measured 304 s at 2M turns). Both legs therefore also
    carry a lag-width event-time bucket (``F.window(ts, max_lag).start``,
    pure timestamp arithmetic — ntz-safe, no unix epoch) as a second
    equi-key: a matching tool turn lies in the error's own bucket or the
    previous one, so the error side probes exactly those two and each
    (conv, bucket) cell pairs only lag-local rows (8.2 s for the same 2M,
    identical output). A (tool, error) pair survives on exactly one probe
    — no dedup needed.
    """
    parsed = parse_transcripts(src)
    bucket = lambda c: F.window(F.col(c), max_lag)["start"]  # noqa: E731
    lag = F.expr(f"INTERVAL {max_lag}")
    errors = (parsed.where(F.col("error_code").isNotNull())
              .select(F.col("conv_id").alias("e_conv"),
                      F.col("ts").alias("err_ts"),
                      F.col("turn_idx").alias("err_turn"), "error_code",
                      F.explode(F.array(bucket("ts"), bucket("ts") - lag))
                       .alias("probe_bucket")))
    tools = src.where(F.col("tool").isNotNull()).select(
        F.col("conv_id").alias("t_conv"), F.col("ts").alias("tool_ts"),
        F.col("turn_idx").alias("tool_turn"), "tool",
        bucket("ts").alias("tool_bucket"))
    if watermark is not None:
        errors = errors.withWatermark("err_ts", watermark)
        tools = tools.withWatermark("tool_ts", watermark)
    cond = ((F.col("e_conv") == F.col("t_conv"))
            & (F.col("probe_bucket") == F.col("tool_bucket"))
            & (F.col("tool_ts") <= F.col("err_ts"))
            & (F.col("err_ts") <= F.col("tool_ts") + lag))
    return (errors.join(tools, cond, "inner")
                  .select(F.col("e_conv").alias("conv_id"), "error_code",
                          "err_turn", "err_ts", "tool", "tool_turn",
                          "tool_ts"))


def error_attribution_stream(spark: SparkSession, input_path: str,
                             output_path: str, checkpoint_path: str,
                             max_lag: str = "30 minutes",
                             watermark: str = "1 hour"):
    """Streaming twin of the attribution join: a stream-stream inner
    interval join (two event-time-filtered legs of the same source) under
    watermarks, append mode. A match is emitted once both sides have
    arrived; join state for a row is dropped once the other side's
    watermark passes its end of the interval."""
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))
    out = attribution_join(stream, max_lag=max_lag, watermark=watermark)
    return (out.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", output_path)
            .start())


def session_stream_agg(spark: SparkSession, input_path: str,
                       output_path: str, checkpoint_path: str,
                       keys: tuple[str, ...] = ("conv_id",),
                       gap: str = "30 minutes",
                       watermark: str = "1 hour"):
    """Streaming sessionization: the native `session_window` aggregate under
    a watermark — the streaming twin of operators/sessions.session_window_agg
    (same merge-on-touch boundary rule, so a drained stream's emitted
    sessions match the batch operator row-for-row; pinned by test). A
    session is EMITTED once the watermark passes its close (append mode);
    state per open session is O(1) (start, end, count), the
    streaming-correct shape for unbounded keys. Late rows beyond `watermark`
    are dropped — the same completeness contract as windowed_stream_agg.
    """
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
              .withWatermark("ts", watermark))
    sessions = (
        stream.groupBy(*keys, F.session_window("ts", gap).alias("sw"))
              .agg(F.count(F.lit(1)).alias("n_events"))
              .select(*keys,
                      F.col("sw.start").alias("session_start"),
                      F.col("sw.end").alias("session_end"),
                      "n_events"))
    return (sessions.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", output_path)
            .start())


def dq_stream_gate(spark: SparkSession, input_path: str, output_path: str,
                   checkpoint_path: str, schema: T.StructType,
                   checks: dict, available_now: bool = True):
    """Streaming data-quality ingest gate: file-source → foreachBatch(
    dq_quarantine → passed/quarantine split + per-batch violation metrics).

    The batch/stream no-drift rule (the enrich_batch contract): each
    micro-batch runs the IDENTICAL ``dq_quarantine`` the batch path (and
    its oracle) runs, so a drained stream's data+quarantine outputs equal
    the batch split row-for-row (pinned by test). One dq evaluation per
    batch: the per-check metrics (check, n_violations, n_rows, batch_id)
    are derived from the already-computed violation labels by exploding
    them — no second pass over the input — and append to ``metrics/``,
    the audit trail that spots upstream drift at 100 TB without ever
    rescanning the corpus.
    """
    from ..operators.dq import dq_quarantine

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4)
              .parquet(input_path))

    def handle(batch: DataFrame, batch_id: int) -> None:
        labeled = dq_quarantine(batch, checks).persist()
        try:
            # empty batches are common under replay: skip all three writes
            # so output/metrics file counts don't grow by empty parts
            if labeled.isEmpty():
                return
            (labeled.where("passed").drop("violations", "passed")
                    .write.mode("append")
                    .parquet(os.path.join(output_path, "data")))
            (labeled.where("NOT passed").drop("passed")
                    .write.mode("append")
                    .parquet(os.path.join(output_path, "quarantine")))
            n_rows = labeled.count()
            (labeled.select(F.explode("violations").alias("check"))
                    .groupBy("check")
                    .agg(F.count(F.lit(1)).alias("n_violations"))
                    .select("check", "n_violations",
                            F.lit(n_rows).alias("n_rows"),
                            F.lit(batch_id).alias("batch_id"))
                    .write.mode("append")
                    .parquet(os.path.join(output_path, "metrics")))
        finally:
            labeled.unpersist()

    writer = (stream.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
