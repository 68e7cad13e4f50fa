"""global_shuffle: permutation properties (totality, determinism,
repartition invariance, salt sensitivity, shard balance) plus an exact
pure-Python replay of the permutation."""

from __future__ import annotations

import pytest

from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
from logstash_filter_geoip_spark.operators.packing import global_shuffle

N_DOCS = 200


def _df(spark, partitions=4):
    return spark.range(N_DOCS).toDF("doc_id").repartition(partitions)


def _rows(spark, **kw):
    return {r["doc_id"]: (r["shard"], r["pos"], r["sort_key"])
            for r in global_shuffle(_df(spark), **kw).collect()}


def test_matches_python_permutation(spark):
    got = _rows(spark, n_shards=8, salt="shuffle-v1")
    keys = {d: md5_hash60_py(f"shuffle:shuffle-v1:{d}")
            for d in range(N_DOCS)}
    by_shard: dict[int, list] = {}
    for d, k in keys.items():
        by_shard.setdefault(k % 8, []).append((k, d))
    want = {}
    for s, members in by_shard.items():
        for pos, (k, d) in enumerate(sorted(members), start=1):
            want[d] = (s, pos, k)
    assert got == want


def test_total_and_positions_sequential(spark):
    got = _rows(spark)
    assert len(got) == N_DOCS  # every doc lands exactly once
    by_shard: dict[int, list] = {}
    for s, p, _ in got.values():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s


def test_repartition_invariant_and_deterministic(spark):
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in global_shuffle(_df(spark, 1)).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in global_shuffle(_df(spark, 13)).collect()}
    assert a == b


def test_salt_changes_permutation_and_shards_balanced(spark):
    a = _rows(spark, salt="epoch-0")
    b = _rows(spark, salt="epoch-1")
    assert a != b
    shard_sizes = {}
    for s, _, _ in a.values():
        shard_sizes[s] = shard_sizes.get(s, 0) + 1
    assert len(shard_sizes) == 8
    assert max(shard_sizes.values()) <= 3 * min(shard_sizes.values())


def test_bad_shards_raises(spark):
    with pytest.raises(ValueError):
        global_shuffle(_df(spark), n_shards=0)
