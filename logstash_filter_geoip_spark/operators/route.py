"""Route stage: salted repartition + role/tool-keyed sinks (S5 generalized).

The reference's event sink is implicit (the mutated event flows to whatever
Logstash outputs are configured, geoip.rb:117-121). Our set-oriented form
fans the enriched DataFrame out to per-(role, tool) sinks, the north_rule
routing contract.

Scale design:
  * ONE pass over the fact table: a single `partitionBy(role, tool)` write —
    never N filtered re-scans. (If sinks needed different schemas we would
    `persist()` once and write N projections; same single upstream compute.)
  * salted repartition before the write: partition on
    (role, tool, pmod(hash(conv_id, turn_idx), n_salt)) so one hot conv_id
    (or one dominant role) cannot pin a single writer task / produce one
    giant file. n_salt bounds files-per-sink.
  * sink format is a parameter: 'parquet' here; on a real cluster pass
    'iceberg' + table identifiers (the write code is format-agnostic).
  * manifest + metrics (lineage.py) make re-runs idempotent: same input
    fingerprint + completed status → the write is skipped entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import (input_fingerprint, partition_metrics, read_manifest,
                       write_manifest, METRICS_DIR)

SINK_KEYS = ("role", "tool")
DEFAULT_N_SALT = 32


def salt_column(n_salt: int = DEFAULT_N_SALT):
    """Deterministic per-turn salt (north_rule conv_id hot-key defuse)."""
    return F.pmod(F.hash("conv_id", "turn_idx"), F.lit(n_salt))


def route(df: DataFrame, base_path: str,
          sink_keys: tuple[str, ...] = SINK_KEYS,
          n_salt: int = DEFAULT_N_SALT,
          fmt: str = "parquet",
          resume: bool = True) -> dict:
    """Write `df` fanned out by sink_keys under base_path; return the manifest.

    Idempotent: if a manifest with the same input fingerprint and status
    'complete' exists, the write is skipped (resume semantics).
    """
    # One upstream compute, four consumers (fingerprint, sink write, metrics,
    # per-sink counts): persist so parse+enrich runs ONCE, not 4×. At real
    # cluster scale swap this for `df.observe(...)` accumulators folded into
    # the single write pass; for sandbox sizes MEMORY_AND_DISK is correct.
    from pyspark import StorageLevel
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        fp = input_fingerprint(cached, ["conv_id", "turn_idx"])
        prev = read_manifest(base_path) if resume else None
        if prev and prev.get("status") == "complete" \
                and prev.get("fingerprint") == fp:
            return prev

        salted = cached.withColumn("__salt", salt_column(n_salt)) \
                       .repartition(*[F.col(k) for k in sink_keys], F.col("__salt"))

        (salted.drop("__salt")
               .write.format(fmt)
               .mode("overwrite")
               .partitionBy(*sink_keys)
               .save(os.path.join(base_path, "sinks")))

        metrics = partition_metrics(cached)
        metrics.write.format(fmt).mode("overwrite") \
               .save(os.path.join(base_path, METRICS_DIR))

        sink_counts = {
            "|".join(str(r[k]) for k in sink_keys): r["n_rows"]
            for r in cached.groupBy(*sink_keys)
                           .agg(F.count(F.lit(1)).alias("n_rows")).collect()
        }
    finally:
        cached.unpersist()
    manifest = {
        "status": "complete",
        "fingerprint": fp,
        "sink_keys": list(sink_keys),
        "sink_counts": sink_counts,
        "total_rows": sum(sink_counts.values()),
        "format": fmt,
    }
    return write_manifest(base_path, manifest)


def read_sink(spark: SparkSession, base_path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(os.path.join(base_path, "sinks"))


def verify_routing(spark: SparkSession, df: DataFrame, base_path: str,
                   sink_keys: tuple[str, ...] = SINK_KEYS) -> dict:
    """The north_rule parity check: sum of per-sink rows == input rows, and
    per-sink counts recomputed from routed rows == manifest counts."""
    manifest = read_manifest(base_path)
    routed = read_sink(spark, base_path)
    recomputed = {
        "|".join(str(r[k]) for k in sink_keys): r["n"]
        for r in routed.groupBy(*sink_keys).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    input_rows = df.count()
    ok = (manifest is not None
          and recomputed == manifest["sink_counts"]
          and sum(recomputed.values()) == input_rows)
    return {"ok": ok, "input_rows": input_rows,
            "manifest_counts": manifest["sink_counts"] if manifest else None,
            "recomputed_counts": recomputed}
