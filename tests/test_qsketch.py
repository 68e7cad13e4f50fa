"""Mergeable log2-bucketed quantile sketch (operators/aggregate.py):

* the bucket function is bit-identical across Spark, DuckDB, and Python
  on fuzzed 64-bit-ranged inputs (the property that makes the sketch
  fully oracle-checkable at any cardinality);
* merge(build(A) ∪ build(B)) == build(A ∪ B) — the incremental-ingest
  identity (counters add, like CMS);
* the quantile estimate is the true quantile's bucket lower bound:
  exact below 2^(sub_bits+1), within 2^-sub_bits relative above;
* negative input raises (the HdrHistogram non-negative contract);
* plan shape: build is ONE two-phase hash aggregate (a single Exchange),
  and the quantile fold runs over the sketch relation only.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import aggregate as agg


def _py_bucket(x: int, sub_bits: int = agg.QSKETCH_SUB_BITS) -> int:
    m = x.bit_length() if x else 1
    s = max(m - (sub_bits + 1), 0)
    return (x >> s) << s


def _fuzz_values() -> list[int]:
    rng = random.Random(20260819)
    vals = [0, 1, 2, 3, 63, 64, 65, 2**62 - 1, 2**62]
    for bits in range(1, 63):
        vals.extend(rng.randrange(0, 2**bits) for _ in range(6))
    return vals


def test_bucket_three_engine_identity(spark):
    vals = _fuzz_values()
    sdf = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.b for r in sdf.select(
        "x", agg._qbucket(F.col("x"), agg.QSKETCH_SUB_BITS).alias("b")
    ).collect()}
    expr = agg._qbucket_sql("x", agg.QSKETCH_SUB_BITS)
    duck = dict(duckdb.execute(
        f"SELECT x, {expr} AS b FROM (SELECT unnest($vals) AS x)",
        {"vals": vals}).fetchall())
    for v in vals:
        assert got[v] == _py_bucket(v) == duck[v], v


def test_bucket_error_bound():
    # lower bound within 2^-sub_bits relative (and exact in the small regime)
    thr = 2 ** (agg.QSKETCH_SUB_BITS + 1)
    for v in _fuzz_values():
        b = _py_bucket(v)
        assert b <= v
        if v < thr:
            assert b == v
        else:
            assert v - b < v * 2.0 ** -agg.QSKETCH_SUB_BITS


@pytest.fixture(scope="module")
def skewed(spark):
    # lognormal-ish positive longs with two key groups and a heavy tail
    rng = random.Random(7)
    rows = [(("a", "b")[i % 2], int(2 ** (rng.random() * 20)))
            for i in range(4000)]
    return spark.createDataFrame(rows, "k string, v long").persist()


def test_merge_equals_direct(skewed, spark):
    h1 = skewed.where(F.col("v") % 3 == 0)
    h2 = skewed.where(F.col("v") % 3 != 0)
    merged = agg.qsketch_merge(
        agg.qsketch_build(h1, ("k",), "v")
           .unionByName(agg.qsketch_build(h2, ("k",), "v")), ("k",))
    direct = agg.qsketch_build(skewed, ("k",), "v")
    a = sorted(map(tuple, agg.qsketch_quantiles(merged, ("k",)).collect()))
    b = sorted(map(tuple, agg.qsketch_quantiles(direct, ("k",)).collect()))
    assert a == b
    # and the sketch relations themselves agree row-for-row
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_quantile_vs_exact(skewed):
    rows = skewed.collect()
    est = {r.k: r for r in agg.qsketch_quantiles(
        agg.qsketch_build(skewed, ("k",), "v"), ("k",)).collect()}
    for k in ("a", "b"):
        vs = sorted(r.v for r in rows if r.k == k)
        assert est[k].n_values == len(vs)
        for name, num, den in agg.QSKETCH_QS:
            rank = -((-num * len(vs)) // den)  # ceil
            true = vs[rank - 1]
            got = est[k][name]
            # estimate is the true quantile's bucket lower bound
            assert got == _py_bucket(true)


def test_negative_raises(spark):
    df = spark.createDataFrame([(1,), (-5,)], "v long")
    with pytest.raises(Exception, match="non-negative"):
        agg.qsketch_build(df, (), "v").collect()


def test_null_skipped(spark):
    df = spark.createDataFrame([(1,), (None,), (1,)], "v long")
    sk = agg.qsketch_build(df, (), "v")
    [(b, c)] = [tuple(r) for r in sk.collect()]
    assert (b, c) == (1, 2)


def test_build_plan_single_exchange(skewed):
    plan = agg.qsketch_build(skewed, ("k",), "v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # two-phase agg: partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
