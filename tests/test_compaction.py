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


def test_interrupted_compaction_recovery(spark, tmp_path):
    """r6 ADVICE fix: temp/backup dirs are dot-prefixed (invisible to
    partition discovery) and leftovers from a crash are swept — rollback
    when the swap was mid-flight, cleanup when it had completed."""
    import shutil

    from logstash_filter_geoip_spark.operators.route import (
        recover_interrupted_compaction)
    e, base = _routed(spark, tmp_path)
    before_rows = sorted(map(tuple, read_sink(spark, base).collect()))
    leaves = sorted({os.path.dirname(f) for f in _data_files(base)})
    assert len(leaves) >= 3
    # crash state 1: rewrite finished, swap not started → stale .compact-
    l1p, l1n = os.path.split(leaves[0])
    shutil.copytree(leaves[0], os.path.join(l1p, f".compact-{l1n}"))
    # crash state 2: mid-swap (original renamed away, tmp not yet renamed)
    l2p, l2n = os.path.split(leaves[1])
    shutil.copytree(leaves[1], os.path.join(l2p, f".compact-{l2n}"))
    os.rename(leaves[1], os.path.join(l2p, f".old-{l2n}"))
    # crash state 3: swap done, backup not yet removed
    l3p, l3n = os.path.split(leaves[2])
    shutil.copytree(leaves[2], os.path.join(l3p, f".old-{l3n}"))

    # hidden siblings are invisible to partition discovery (minus the
    # mid-swap leaf whose original is currently renamed away)
    with pytest.raises(RuntimeError):           # refuse to plan over debris
        compaction_plan(base)
    actions = recover_interrupted_compaction(base)
    kinds = sorted(a["action"] for a in actions)
    assert kinds == ["dropped_backup", "dropped_tmp", "dropped_tmp",
                     "restored"]
    after_rows = sorted(map(tuple, read_sink(spark, base).collect()))
    assert after_rows == before_rows            # tree fully restored
    # and a normal compaction now proceeds
    audit = compact_sink(spark, base)
    assert audit["compacted"]
    assert sorted(map(tuple, read_sink(spark, base).collect())) == before_rows
