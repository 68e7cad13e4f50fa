"""Incremental rollup maintenance: dynamic partition overwrite replaces
ONLY the recomputed day partitions, reruns are idempotent, and untouched
days' files are bit-identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators.aggregate import (daily_rollup,
                                                             upsert_daily_rollup)
from tests.conftest import SF_SMOKE


def _events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _snapshot(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def _table(spark, path):
    return sorted(tuple(str(v) for v in r)
                  for r in spark.read.parquet(path)
                  .select("day", "event_type", "n_events", "n_users")
                  .collect())


def test_upsert_replaces_only_affected_partitions(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "rollup")
    upsert_daily_rollup(ev, path)
    want_full = sorted(tuple(str(v) for v in r)
                       for r in daily_rollup(ev).collect())
    assert _table(spark, path) == want_full
    before = _snapshot(path)
    assert before

    # "corrected" data arrives for one day: recompute that day only
    days = sorted({r["day"] for r in
                   ev.select(F.to_date("ts").alias("day"))
                     .distinct().collect()})
    target = days[1]
    corrected = ev.unionByName(
        ev.where(F.to_date("ts") == F.lit(str(target))).limit(7))
    upsert_daily_rollup(
        corrected.where(F.to_date("ts") == F.lit(str(target))),
        path, days=[target])

    after = _snapshot(path)
    changed_dirs = {os.path.dirname(p) for p in
                    set(after) ^ set(before) | {p for p in after
                                                if p in before
                                                and after[p] != before[p]}}
    assert changed_dirs  # the target day's partition was rewritten
    assert all(f"day={target}" in d for d in changed_dirs)

    # table content == full recompute over the corrected input
    want = sorted(tuple(str(v) for v in r)
                  for r in daily_rollup(corrected).collect())
    assert _table(spark, path) == want

    # idempotence: rerunning the same upsert converges (content stable)
    upsert_daily_rollup(
        corrected.where(F.to_date("ts") == F.lit(str(target))),
        path, days=[target])
    assert _table(spark, path) == want
