"""Bloom-filter join pruning: pure-Python value locks (md5 basis), the
no-false-negative guarantee, prune-join equivalence, DuckDB bit-equality,
param guards, and the plan contract (k BroadcastHashJoins of the
parameter-bounded filter; the probe side is never shuffled)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import bloomjoin as B
from logstash_filter_geoip_spark.plans import checks

KEYS = ["alpha", "beta", "gamma", "delta", None, "epsilon"]
PROBES = KEYS + ["zeta", "eta", "theta", "iota", "kappa", None]
N_WORDS, K = 8, 4  # tiny ON PURPOSE: dense filter → false positives likely


def test_build_matches_python_reference(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], "key string")
    got = {r["word"]: r["bits"]
           for r in B.bloom_build(df, "key", n_words=N_WORDS, k=K,
                                  hash_basis="md5").collect()}
    assert got == B.bloom_py(KEYS, n_words=N_WORDS, k=K)


def test_probe_matches_python_reference(spark):
    build = spark.createDataFrame([(k,) for k in KEYS], "key string")
    bloom = B.bloom_build(build, "key", n_words=N_WORDS, k=K,
                          hash_basis="md5")
    probe = spark.createDataFrame([(k,) for k in PROBES], "key string")
    got = {r["key"]: r["bloom_hit"]
           for r in B.bloom_might_contain(probe, bloom, "key",
                                          n_words=N_WORDS, k=K,
                                          hash_basis="md5").collect()}
    words = B.bloom_py(KEYS, n_words=N_WORDS, k=K)
    want = {k: B.bloom_probe_py(words, k, n_words=N_WORDS, k=K)
            for k in PROBES}
    assert got == want
    # no false negatives: every built key probes 1 (NULL is never a member)
    assert all(got[k] == 1 for k in KEYS if k is not None)
    assert got[None] == 0


def test_no_false_negatives_both_bases(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    build = ev.where(F.col("event_type") == "error")
    for basis in ("xxhash64", "md5"):
        bloom = B.bloom_build(build, "event_id", hash_basis=basis)
        flagged = B.bloom_might_contain(ev, bloom, "event_id",
                                        hash_basis=basis)
        missed = flagged.where((F.col("event_type") == "error")
                               & (F.col("bloom_hit") == 0)).count()
        assert missed == 0, basis


def test_prune_join_equivalence(spark):
    """The semantics contract: pruning the probe side never changes an
    inner join's result — false positives drop in the join, false
    negatives don't exist."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    build = (ev.where(F.col("event_type") == "error")
               .select(F.col("event_id").alias("k")).distinct())
    bloom = B.bloom_build(build, "k", n_words=64, k=3)
    plain = ev.join(build, ev.event_id == build.k, "inner")
    pruned_side = B.bloom_prune(ev, bloom, "event_id", n_words=64, k=3)
    pruned = pruned_side.join(build, pruned_side.event_id == build.k,
                              "inner")
    assert (sorted(map(tuple, plain.collect()))
            == sorted(map(tuple, pruned.collect())))
    # and the prune actually removed rows (the filter is not saturated)
    assert pruned_side.count() < ev.count()


def test_duckdb_bit_equality_crafted(spark):
    build = spark.createDataFrame([(k,) for k in KEYS], "key string")
    bloom = B.bloom_build(build, "key", n_words=N_WORDS, k=K,
                          hash_basis="md5")
    probe = spark.createDataFrame([(k,) for k in PROBES], "key string")
    key_fn = lambda t: (t[0] is None, t[0] or "", t[1])
    got = sorted(((r["key"], r["bloom_hit"]) for r in B.bloom_might_contain(
        probe, bloom, "key", n_words=N_WORDS, k=K,
        hash_basis="md5").collect()), key=key_fn)
    con = duckdb.connect()
    con.register("bkeys", pd.DataFrame({"key": KEYS}))
    con.register("pkeys", pd.DataFrame({"key": PROBES}))
    sql = B.bloom_oracle_ctes(
        "SELECT key FROM bkeys", "key", "SELECT key FROM pkeys", "key",
        n_words=N_WORDS, k=K, probe_cols="key", lead="WITH"
    ) + "\nSELECT key, bloom_hit FROM b_probed"
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()),
                  key=key_fn)
    assert got == want


def test_union_is_member_of_union(spark):
    a = spark.createDataFrame([("a1",), ("a2",)], "key string")
    b = spark.createDataFrame([("b1",), ("b2",)], "key string")
    fa = B.bloom_build(a, "key", n_words=N_WORDS, k=K, hash_basis="md5")
    fb = B.bloom_build(b, "key", n_words=N_WORDS, k=K, hash_basis="md5")
    merged = {r["word"]: r["bits"]
              for r in B.bloom_union(fa.unionByName(fb)).collect()}
    direct = B.bloom_py(["a1", "a2", "b1", "b2"], n_words=N_WORDS, k=K)
    assert merged == direct


def test_param_guards():
    with pytest.raises(ValueError, match=">= 1"):
        B.bloom_py([], n_words=0)
    with pytest.raises(ValueError, match="broadcast bound"):
        B._check_params((1 << 22) + 1, 5)
    with pytest.raises(ValueError, match="hash_basis"):
        B._bit_index("k", 0, 8, "s", "sha1")
    with pytest.raises(ValueError, match="lead"):
        B.bloom_oracle_ctes("SELECT 1 AS k", "k", "SELECT 1 AS k", "k",
                            lead="AND")


def test_plan_k_broadcast_joins_no_shuffle(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    bloom = B.bloom_build(ev.where(F.col("event_type") == "error"),
                          "event_id", hash_basis="md5")
    probed = B.bloom_might_contain(ev, bloom, "event_id",
                                   hash_basis="md5")
    plan = checks.simple_plan(probed)
    assert plan.count("BroadcastHashJoin") == B.BLOOM_K, plan[:3000]
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoop" not in plan
    assert "Python" not in plan, plan[:3000]
    # the probe side is never shuffled: every Exchange in the plan feeds a
    # broadcast of the filter relation, none hash-partitions the probe
    assert "hashpartitioning(event_id" not in plan, plan[:3000]
