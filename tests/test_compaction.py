"""Sink small-file compaction (route.compaction_plan / compact_sink):
content preservation (full row-set equality), in-place atomic swap,
idempotence (a compacted tree plans nothing), the text-mode json path,
metrics-table refresh, and validation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators.route import (compact_sink,
                                                         compaction_plan,
                                                         read_sink, route,
                                                         verify_routing)
from logstash_filter_geoip_spark.pipeline import enriched_transcripts

SF = "/root/testdata/sf0.001"


def _routed(spark, tmp_path, fmt="parquet"):
    e = enriched_transcripts(spark, SF).drop("geoip")
    base = str(tmp_path / f"routed_{fmt}")
    # force many small files per sink: at test scale AQE's partition
    # coalescing would fold the salted shuffle back to one file per sink
    # (the very behaviour that makes compaction unnecessary on a healthy
    # write), so disable it for the write only — compaction exists for
    # trees accumulated by many INDEPENDENT incremental writes
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        route(e, base, n_salt=8, fmt=fmt)
    finally:
        spark.conf.set(key, prev)
    return e, base


def _data_files(base):
    out = []
    for dirpath, _d, files in os.walk(os.path.join(base, "sinks")):
        out += [os.path.join(dirpath, f) for f in files
                if not f.startswith(("_", "."))]
    return out


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    e, base = _routed(spark, tmp_path)
    before_rows = sorted(map(tuple, read_sink(spark, base).collect()))
    n_before = len(_data_files(base))
    plan = compaction_plan(base)
    assert plan and all(p["n_files"] > p["n_after"] for p in plan)
    audit = compact_sink(spark, base)
    assert audit["fmt"] == "parquet" and audit["compacted"]
    n_after = len(_data_files(base))
    assert n_after < n_before
    # byte budget respected: every partition is at its planned count
    assert compaction_plan(base) == []          # idempotent: nothing left
    after_rows = sorted(map(tuple, read_sink(spark, base).collect()))
    assert after_rows == before_rows            # full row-set equality
    # manifest stays valid and the refreshed metrics still reconcile
    v = verify_routing(spark, e, base)
    assert v["ok"], v
    met = spark.read.parquet(os.path.join(base, "_metrics"))
    assert met.agg(F.sum("n_rows")).collect()[0][0] == len(before_rows)


def test_compact_json_text_mode_round_trips(spark, tmp_path):
    e, base = _routed(spark, tmp_path, fmt="json")
    before = sorted(tuple(str(v) for v in r)
                    for r in read_sink(spark, base).collect())
    audit = compact_sink(spark, base)
    assert audit["fmt"] == "json" and audit["compacted"]
    after = sorted(tuple(str(v) for v in r)
                   for r in read_sink(spark, base).collect())
    assert after == before
    assert compaction_plan(base) == []


def test_compaction_plan_validation_and_noop(spark, tmp_path):
    _e, base = _routed(spark, tmp_path)
    with pytest.raises(ValueError):
        compaction_plan(base, target_bytes=0)
    # a huge target still plans >= 1 file per partition, never zero
    plan = compaction_plan(base, target_bytes=1 << 40)
    assert all(p["n_after"] == 1 for p in plan)
    # a tiny target means the files are already under budget: no plan
    assert compaction_plan(base, target_bytes=1) == []
