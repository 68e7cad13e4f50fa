"""Deterministic Poisson-bootstrap CI (operators/stats.py):

* Spark == DuckDB == an independent pure-Python bootstrap, BIT-identically
  (including the double-valued CI bounds): integer hash thresholds →
  exact BIGINT sums → one shared final division → order-only rank
  selection;
* the Poisson(1) weight distribution behaves (mean ≈ 1, P(0) ≈ 1/e);
* CI sanity: lo ≤ point mean ≤ hi on well-behaved groups, and the
  interval tightens as the group grows (root-n);
* degenerate input: NULL values skipped, empty input yields no rows;
* plan: explode → ONE two-phase aggregate (shuffle carries keys × B) →
  windows over the tiny relation; no Python, no Join, exactly two
  hashpartitioning exchanges (agg on (keys, rep); window re-key on keys).
"""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import duckdb

from logstash_filter_geoip_spark.operators import stats


def _py_bootstrap(rows, B, salt="boot-v1"):
    ths = stats.poisson_thresholds()

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def wgt(h):
        for k, t in enumerate(ths):
            if h < t:
                return k
        return len(ths)

    g = defaultdict(list)
    for k, i, v in rows:
        g[k].append((i, v))
    out = []
    for k, rs in sorted(g.items()):
        means = []
        for rep in range(B):
            s = n = 0
            for i, v in rs:
                w = wgt(h60(f"boot:{salt}:{rep}:{i}"))
                s += w * v
                n += w
            if n:
                means.append(s / n)
        means.sort()
        b = len(means)
        lo = means[-(-1 * b // 40) - 1]
        hi = means[-(-39 * b // 40) - 1]
        out.append((k, len(rs), sum(v for _, v in rs) / len(rs), lo, hi))
    return out


def test_three_engine_bit_identity(spark):
    rng = random.Random(42)
    rows = [("a" if i % 3 else "b", i, rng.randrange(0, 100))
            for i in range(600)]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    got = sorted(tuple(r) for r in stats.bootstrap_ci(
        df, ("k",), "v", "id", n_replicates=50,
        hash_basis="md5").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, id BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    duck = sorted(tuple(r) for r in con.sql(stats.bootstrap_ci_oracle_sql(
        "t", ("k",), "v", "CAST(id AS VARCHAR)",
        n_replicates=50)).fetchall())
    py = [tuple(x) for x in _py_bootstrap(rows, 50)]
    assert got == duck == py  # BIT-identical, doubles included


def test_poisson_weights_behave():
    import math
    ths = stats.poisson_thresholds()
    # threshold gaps reproduce the Poisson(1) pmf to float precision
    probs = [ths[0] / 2.0**60] + [
        (b - a) / 2.0**60 for a, b in zip(ths, ths[1:])]
    for k, p in enumerate(probs):
        assert abs(p - math.exp(-1) / math.factorial(k)) < 1e-12
    # the mean weight over a large hash sample is ~1
    rng = random.Random(7)
    n = 20000
    tot = 0
    for _ in range(n):
        h = rng.randrange(0, 1 << 60)
        tot += sum(1 for t in ths if t <= h)
    assert abs(tot / n - 1.0) < 0.03


def test_ci_brackets_mean_and_tightens(spark):
    rows = [("small", i, (i * 7) % 100) for i in range(200)] + \
           [("large", i, (i * 7) % 100) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    out = {r["k"]: r for r in stats.bootstrap_ci(
        df, ("k",), "v", "id", n_replicates=100).collect()}
    for k in ("small", "large"):
        r = out[k]
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    width = {k: out[k]["ci_hi"] - out[k]["ci_lo"]
             for k in ("small", "large")}
    assert width["large"] < width["small"]  # root-n shrinkage


def test_nulls_skipped_empty_yields_nothing(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None), ("a", 3, 20)],
        "k string, id long, v long")
    [r] = stats.bootstrap_ci(df, ("k",), "v", "id",
                             n_replicates=20).collect()
    assert r["n_rows"] == 2 and r["mean"] == 15.0
    empty = spark.createDataFrame([], "k string, id long, v long")
    assert stats.bootstrap_ci(empty, ("k",), "v", "id",
                              n_replicates=20).count() == 0


def test_plan_shape(spark):
    df = spark.range(1000).selectExpr("cast(id % 3 as string) k", "id",
                                      "id % 50 v")
    plan = stats.bootstrap_ci(df, ("k",), "v", "id", n_replicates=20) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Join" not in plan, plan[:3000]
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]


# ---------------------------------------------------------------------------
# two-sample A/B bootstrap
# ---------------------------------------------------------------------------


def test_ab_engine_identity_and_significance(spark):
    """A planted +20 shift between groups: Spark == DuckDB bit-identically
    and the CI excludes zero (significant=1); a no-shift pair of groups
    built from the SAME value sequence is not significant."""
    rng = random.Random(9)
    base = [rng.randrange(0, 60) for _ in range(400)]
    rows = ([("A", i, v + 20) for i, v in enumerate(base)]
            + [("B", 1000 + i, v) for i, v in enumerate(base)]
            + [("C", 5000 + i, 999) for i in range(50)])  # ignored group
    df = spark.createDataFrame(rows, "g string, id long, v long")
    [got] = stats.bootstrap_ab(df, "g", "A", "B", "v", "id",
                               n_replicates=60,
                               hash_basis="md5").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, id BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    [duck] = con.sql(stats.bootstrap_ab_oracle_sql(
        "t", "g", "A", "B", "v", "CAST(id AS VARCHAR)",
        n_replicates=60)).fetchall()
    assert tuple(got) == tuple(duck)  # bit-identical, doubles included
    assert got["n_a"] == got["n_b"] == 400
    assert got["significant"] == 1 and got["ci_lo"] > 0
    assert abs(got["diff"] - 20.0) < 3

    null_rows = ([("A", i, v) for i, v in enumerate(base)]
                 + [("B", 1000 + i, v) for i, v in enumerate(base)])
    ndf = spark.createDataFrame(null_rows, "g string, id long, v long")
    [ng] = stats.bootstrap_ab(ndf, "g", "A", "B", "v", "id",
                              n_replicates=60).collect()
    assert ng["significant"] == 0
    assert ng["ci_lo"] <= 0 <= ng["ci_hi"]


def test_ab_plan_shape(spark):
    df = spark.range(2000).selectExpr(
        "case when id % 2 = 0 then 'A' else 'B' end g", "id", "id % 50 v")
    plan = stats.bootstrap_ab(df, "g", "A", "B", "v", "id",
                              n_replicates=20) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Join" not in plan, plan[:3000]
    # one (rep)-keyed aggregate exchange; the rest are SinglePartition
    # windows/folds over <= B rows
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
