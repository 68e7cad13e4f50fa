"""Sessionization + analytic-aggregate tests: boundary semantics, parity
between the window-function and native session_window paths, the
approx-quantile value-lock against the exact path, rollup GROUPING
disambiguation, pivot bucket rules, and the one-shuffle plan contract."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import aggregate as agg
from logstash_filter_geoip_spark.operators.sessions import (
    session_stats, session_window_agg, sessionize)
from tests.conftest import SF_SMOKE


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def crafted(spark):
    # gap = 60s; u1: touch-at-exactly-60s stays, 61s splits; u2: tie rows
    rows = [
        ("u1", _ts("2024-01-01 00:00:00")),
        ("u1", _ts("2024-01-01 00:01:00")),   # gap == 60 → SAME session
        ("u1", _ts("2024-01-01 00:02:01")),   # gap 61 > 60 → new session
        ("u2", _ts("2024-01-01 00:00:00")),
        ("u2", _ts("2024-01-01 00:00:00")),   # tie: gap 0 → same session
        ("u2", _ts("2024-01-01 10:00:00")),
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp")


def test_sessionize_boundaries(spark, crafted):
    out = sessionize(crafted, ["user_id"], "ts", gap_s=60)
    got = sorted((r["user_id"], str(r["ts"]), r["session_idx"])
                 for r in out.collect())
    assert got == [
        ("u1", "2024-01-01 00:00:00", 1),
        ("u1", "2024-01-01 00:01:00", 1),   # merge-on-touch
        ("u1", "2024-01-01 00:02:01", 2),
        ("u2", "2024-01-01 00:00:00", 1),
        ("u2", "2024-01-01 00:00:00", 1),
        ("u2", "2024-01-01 10:00:00", 2),
    ]
    with pytest.raises(ValueError, match="key"):
        sessionize(crafted, [], "ts")
    with pytest.raises(ValueError, match="gap_s"):
        sessionize(crafted, ["user_id"], "ts", gap_s=0)


def test_session_stats_values(spark, crafted):
    out = session_stats(crafted, ["user_id"], "ts", gap_s=60)
    got = {(r["user_id"], r["session_idx"]):
           (r["n_events"], str(r["session_start"]), str(r["session_end"]),
            r["duration_s"]) for r in out.collect()}
    assert got[("u1", 1)] == (2, "2024-01-01 00:00:00",
                              "2024-01-01 00:01:00", 60)
    assert got[("u1", 2)] == (1, "2024-01-01 00:02:01",
                              "2024-01-01 00:02:01", 0)
    assert got[("u2", 1)][0] == 2 and got[("u2", 1)][3] == 0


def test_native_session_window_parity(spark, crafted):
    """Same boundary rule: native session_window sessions == the
    window-function sessions (start equal, native end == stats end + gap,
    same event counts), on crafted data AND the real events table."""
    gap = 60
    for df in (crafted,
               spark.read.parquet(f"{SF_SMOKE}/events.parquet")
                    .select("user_id", "ts")):
        a = session_stats(df, ["user_id"], "ts", gap_s=gap)
        b = session_window_agg(df, ["user_id"], "ts", gap=f"{gap} seconds")
        lhs = sorted((str(r["user_id"]), str(r["session_start"]),
                      r["n_events"]) for r in a.collect())
        rhs = sorted((str(r["user_id"]), str(r["session_start"]),
                      r["n_events"]) for r in b.collect())
        assert lhs == rhs
        ends_a = sorted(
            str(r["session_end"]) for r in
            a.select((F.col("session_end")
                      + F.expr(f"INTERVAL {gap} SECOND"))
                     .alias("session_end")).collect())
        ends_b = sorted(str(r["session_end"]) for r in b.collect())
        assert ends_a == ends_b


def test_session_stats_single_shuffle(spark, crafted):
    """The groupBy after sessionize groups on a SUPERSET of the window
    partition key, so the window's hash partitioning satisfies the
    aggregate's distribution — exactly one Exchange in the whole plan."""
    plan = session_stats(crafted, ["user_id"], "ts", gap_s=60) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_approx_quantiles_lock_to_exact(spark):
    """The approx_percentile scale path stays within the documented rank
    error of the exact (oracle-checked) path on the real events table."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {r["event_type"]: (r["q50"], r["q90"], r["q99"])
             for r in agg.quantile_stats(
                 ev, ("event_type",), "value").collect()}
    approx = {r["event_type"]: (r["q50"], r["q90"], r["q99"])
              for r in agg.quantile_stats(
                  ev, ("event_type",), "value", exact=False,
                  accuracy=10000).collect()}
    by_group: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        by_group.setdefault(r["event_type"], []).append(r["value"])
    for et, qs_exact in exact.items():
        vals = sorted(by_group[et])
        n = len(vals)
        for q, e, a in zip((0.5, 0.9, 0.99), qs_exact, approx[et]):
            # rank-error envelope per GROUP (the sketch's bound is on
            # quantile rank, not value): approx must land between the
            # values at ranks q ± 0.01 of the group's own distribution
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n) + 1)]
            assert lo <= a <= hi, (et, q, e, a)
    with pytest.raises(ValueError, match="quantile"):
        agg.quantile_stats(ev, ("event_type",), "value", qs=())
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        agg.quantile_stats(ev, ("event_type",), "value", qs=(1.5,))


def test_quantile_column_names(spark):
    """Float-safe labels (0.29 must NOT truncate to q28), fractional
    percents get distinct names, and colliding names raise."""
    from logstash_filter_geoip_spark.operators.aggregate import (
        _quantile_name)
    assert _quantile_name(0.5) == "q50"
    assert _quantile_name(0.29) == "q29"
    assert _quantile_name(0.05) == "q05"
    assert _quantile_name(0.999) == "q99_9"
    assert _quantile_name(0.055) == "q5_5"
    df = spark.createDataFrame([("a", 1.0)], "k string, value double")
    out = agg.quantile_stats(df, ("k",), "value", qs=(0.29, 0.999))
    assert out.columns == ["k", "q29", "q99_9", "n_values"]
    with pytest.raises(ValueError, match="colliding"):
        agg.quantile_stats(df, ("k",), "value", qs=(0.5, 0.5))


def test_cohort_retention_semantics(spark):
    """Crafted cohorts: u1 active weeks 0 and 2 (skipping 1), u2 only week
    0, u3 a later cohort — offsets are relative to EACH user's first week,
    multiple events in one week count once, and day-unit offsets work."""
    rows = [
        ("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-02 10:00:00"),  # wk0 ×2
        ("u1", "2024-01-15 10:00:00"),                                 # wk2
        ("u2", "2024-01-03 10:00:00"),                                 # wk0
        ("u3", "2024-01-08 10:00:00"),                                 # cohort wk1
    ]
    df = spark.createDataFrame(rows, "user_id string, t string") \
              .selectExpr("user_id", "CAST(t AS timestamp) AS ts")
    got = {(str(r["cohort"]), r["period_offset"]): r["n_active"]
           for r in agg.cohort_retention(df, "user_id").collect()}
    assert got == {
        ("2024-01-01 00:00:00", 0): 2,   # u1 + u2, deduped within the week
        ("2024-01-01 00:00:00", 2): 1,   # u1 skips week 1
        ("2024-01-08 00:00:00", 0): 1,   # u3's own cohort
    }
    daily = agg.cohort_retention(df, "user_id", unit="day")
    d = {(str(r["cohort"]), r["period_offset"]): r["n_active"]
         for r in daily.collect()}
    assert d[("2024-01-01 00:00:00", 1)] == 1   # u1's second day
    with pytest.raises(ValueError, match="unit"):
        agg.cohort_retention(df, "user_id", unit="fortnight")


def test_rollup_grouping_disambiguates_null(spark):
    """A NULL data value and a subtotal row share column NULLs but differ
    in the GROUPING flag — the ANSI disambiguation rule."""
    df = spark.createDataFrame(
        [("US", "Milton", "c1"), ("US", None, "c2"), (None, None, "c3")],
        "country string, city string, conv_id string")
    out = agg.rollup_counts(df, ("country", "city"), distinct_col="conv_id")
    rows = {(r["country"], r["city"], r["g_country"], r["g_city"]):
            (r["n_rows"], r["n_distinct"]) for r in out.collect()}
    # data-NULL city under US (grouping flags 0,0) vs US subtotal (0,1)
    assert rows[("US", None, 0, 0)] == (1, 1)
    assert rows[("US", None, 0, 1)] == (2, 2)
    # data-NULL country detail row vs grand total
    assert rows[(None, None, 0, 0)] == (1, 1)
    assert rows[(None, None, 1, 1)] == (3, 3)
    with pytest.raises(ValueError, match="dimension"):
        agg.rollup_counts(df, ())


def test_pivot_counts_rules(spark):
    df = spark.createDataFrame(
        [("user", "search"), ("user", None), ("assistant", "bash")],
        "role string, tool string")
    out = agg.pivot_counts(df, "role", "tool", ("search", "bash", "geoip"))
    rows = {r["role"]: (r["search"], r["bash"], r["geoip"])
            for r in out.collect()}
    # NULL tool counted in no bucket, but the role row exists;
    # a pivot value absent from the data yields 0, not NULL
    assert rows == {"user": (1, 0, 0), "assistant": (0, 1, 0)}
    with pytest.raises(ValueError, match="explicit"):
        agg.pivot_counts(df, "role", "tool", ())


def test_value_histogram_boundaries(spark):
    """Crafted boundary matrix: v == lo lands in bucket 0, v just under hi
    in the last bucket, v == hi in the overflow sentinel, v < lo in the
    underflow sentinel, NULL in the NULL bucket; totals preserved."""
    from logstash_filter_geoip_spark.operators.aggregate import (
        histogram_oracle_sql, value_histogram)
    rows = [("a", 0.0), ("a", 4.999999), ("a", 5.0), ("a", 9.999999),
            ("a", 10.0), ("a", 37.5), ("a", -0.001), ("a", None),
            ("b", 2.5)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = value_histogram(df, ("g",), "value", lo=0.0, hi=10.0, n_buckets=2)
    got = {(r.g, r.bucket_idx): (r.n, r.bucket_lo) for r in out.collect()}
    assert got == {
        ("a", 0): (2, 0.0),      # 0.0, 4.999999
        ("a", 1): (2, 5.0),      # 5.0, 9.999999
        ("a", 2): (2, None),     # overflow: 10.0, 37.5
        ("a", -1): (1, None),    # underflow
        ("a", None): (1, None),  # NULL value
        ("b", 0): (1, 0.0),
    }
    assert sum(n for n, _ in got.values()) == len(rows)
    # the DuckDB mirror buckets the same boundary doubles identically
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"('{g}', {v if v is not None else 'NULL'})"
                          for g, v in rows) + ") x(g, value)")
    duck = {(r[0], r[1]): (r[3], r[2]) for r in con.execute(
        histogram_oracle_sql("t", ("g",), "value", 0.0, 10.0, 2)).fetchall()}
    assert duck == got


def test_value_histogram_guards(spark):
    from logstash_filter_geoip_spark.operators.aggregate import \
        value_histogram
    df = spark.createDataFrame([("a", 1.0)], "g string, value double")
    with pytest.raises(ValueError, match="n_buckets"):
        value_histogram(df, ("g",), "value", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        value_histogram(df, ("g",), "value", 1.0, 1.0, 4)


def test_value_histogram_two_phase_single_exchange(spark):
    """Mergeable sketch claim: one hash aggregate pair around ONE Exchange,
    no Join, no Window."""
    from logstash_filter_geoip_spark.operators.aggregate import \
        value_histogram
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = value_histogram(ev, ("event_type",), "value", 0.0, 100.0, 20) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan


def test_iqr_outliers_matches_python_quantiles(spark):
    """Tukey fences recomputed with Python statistics.quantiles
    (method='inclusive' == type-7 == Spark percentile == DuckDB
    quantile_cont) select the identical row set."""
    import statistics
    from logstash_filter_geoip_spark.operators.aggregate import iqr_outliers
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r.event_id for r in
           iqr_outliers(ev, ("event_type",), "value").collect()}
    rows = ev.select("event_id", "event_type", "value").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    fences = {}
    for t, vals in by_type.items():
        q1, _, q3 = statistics.quantiles(vals, n=4, method="inclusive")
        fences[t] = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
    want = {r.event_id for r in rows
            if r.value < fences[r.event_type][0]
            or r.value > fences[r.event_type][1]}
    assert got == want and got


def test_iqr_robust_where_zscore_is_masked(spark):
    """The robustness claim: one huge outlier inflates sigma enough to
    hide a smaller one from the 3-sigma screen, while the quartiles don't
    move — IQR flags both."""
    from logstash_filter_geoip_spark.operators.aggregate import (
        iqr_outliers, zscore_outliers)
    vals = [9.0, 9.5, 10.0, 10.5, 11.0] * 6 + [40.0, 2000.0]
    df = spark.createDataFrame([("g", i, v) for i, v in enumerate(vals)],
                               "g string, i long, v double")
    z = {r.i for r in zscore_outliers(df, ("g",), "v").collect()}
    iqr = {r.i for r in iqr_outliers(df, ("g",), "v").collect()}
    assert z == {31}            # sigma inflated by 2000 -> 40 slips through
    assert iqr == {30, 31}      # quartiles unmoved -> both flagged


def test_equidepth_histogram_crafted(spark):
    """1..8 with n_buckets=4: type-7 boundaries [2.75, 4.5, 6.25] →
    strictly-greater assignment gives depths (3, 2, 2, 1)... computed
    against Python statistics.quantiles rather than hand-waved; NULL rows
    land in the NULL bucket with n=0."""
    import statistics
    from logstash_filter_geoip_spark.operators.aggregate import \
        equidepth_histogram
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    rows = [("g", v) for v in vals] + [("g", None)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {r.bucket_idx: (r.n, r.min_val, r.max_val)
           for r in equidepth_histogram(df, ("g",), "value", 4).collect()}
    b = statistics.quantiles(vals, n=4, method="inclusive")
    want = {}
    for v in vals:
        i = sum(v > x for x in b)
        n, mn, mx = want.get(i, (0, v, v))
        want[i] = (n + 1, min(mn, v), max(mx, v))
    want[None] = (0, None, None)
    assert out == want
    assert sum(n for n, _, _ in out.values()) == len(vals)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_buckets"):
        equidepth_histogram(df, ("g",), "value", 1)


def test_equidepth_histogram_balanced_on_distinct_values(spark):
    """On ties-free data the depths differ by at most 1 per bucket."""
    from logstash_filter_geoip_spark.operators.aggregate import \
        equidepth_histogram
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = equidepth_histogram(ev, ("event_type",), "value", 8).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r.n)
    for t, ns in by_type.items():
        assert len(ns) == 8, t
        assert max(ns) - min(ns) <= max(2, 0.1 * max(ns)), (t, ns)


# ---------------------------------------------------------------------------
# incremental distinct-count maintenance (mergeable HLL sketches)
# ---------------------------------------------------------------------------


def test_distinct_sketch_merge_equals_direct_and_exact(spark):
    """Union of stored per-day sketches == one direct sketch over all the
    data (lossless merge), and at this cardinality both == the exact
    distinct count (the sparse-regime property the driver oracle relies
    on). Also repartition-stable — sketches are order-independent."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    evd = ev.withColumn("day", F.date_trunc("day", F.col("ts")))
    daily = agg.distinct_sketches(evd, ("event_type",), "user_id", "day")
    merged = {r["event_type"]: r["distinct_est"] for r in
              agg.merge_distinct_sketches(daily, ("event_type",)).collect()}
    direct = {r["event_type"]: (r["est"], r["exact"]) for r in
              ev.groupBy("event_type").agg(
                  F.hll_sketch_estimate(
                      F.hll_sketch_agg("user_id", F.lit(12))).alias("est"),
                  F.countDistinct("user_id").alias("exact")).collect()}
    assert set(merged) == set(direct)
    for k, est in merged.items():
        assert est == direct[k][0] == direct[k][1], k
    re_merged = {r["event_type"]: r["distinct_est"] for r in
                 agg.merge_distinct_sketches(
                     agg.distinct_sketches(
                         evd.repartition(17, "user_id"),
                         ("event_type",), "user_id", "day"),
                     ("event_type",)).collect()}
    assert re_merged == merged


def test_distinct_sketch_incremental_converges(spark):
    """The maintenance contract: (sketches over days < cut) UNION (sketch
    of the new day) merges to EXACTLY the full-recompute estimate — no
    drift from incremental ingestion, ever."""
    ev = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
          .withColumn("day", F.date_trunc("day", F.col("ts"))))
    cut = "2024-01-20 00:00:00"
    old = agg.distinct_sketches(ev.where(F.col("ts") < cut),
                                ("event_type",), "user_id", "day")
    new = agg.distinct_sketches(ev.where(F.col("ts") >= cut),
                                ("event_type",), "user_id", "day")
    incr = {r["event_type"]: (r["n_buckets"], r["distinct_est"]) for r in
            agg.merge_distinct_sketches(old.unionByName(new),
                                        ("event_type",)).collect()}
    full = {r["event_type"]: (r["n_buckets"], r["distinct_est"]) for r in
            agg.merge_distinct_sketches(
                agg.distinct_sketches(ev, ("event_type",), "user_id", "day"),
                ("event_type",)).collect()}
    assert incr == full


def test_distinct_sketch_error_bound_at_scale(spark):
    """Beyond the exact regime the estimate must stay inside the published
    HLL bound: rel err ≤ 4 × 1.04/sqrt(2^lgk) (≈6.5% at lgk=12) on 200k
    true distincts — the regime the 100-TB path actually runs in."""
    big = spark.range(200_000).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("uid"),
        (F.col("id") % 7).alias("day"))
    est = {r["g"]: r["distinct_est"] for r in
           agg.distinct_sketch_rollup(big, ("g",), "uid", "day").collect()}
    for g, e in est.items():
        true = 20_000
        assert abs(e - true) / true <= 4 * 1.04 / (2 ** 12) ** 0.5, (g, e)


def test_distinct_sketch_plan_two_phase(spark):
    """Both stages are mergeable hash aggregates: the build is a two-phase
    agg over the events scan; the merge is a two-phase agg over sketch
    rows. No Join, no Python, no Window anywhere."""
    from logstash_filter_geoip_spark.plans import checks
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("day", F.date_trunc("day", F.col("ts"))))
    p = checks.simple_plan(
        agg.distinct_sketch_rollup(ev, ("event_type",), "user_id", "day"))
    assert "Join" not in p and "Python" not in p and "Window" not in p
    assert p.count("HashAggregate") == 4, p[:3000]  # partial+final × 2


def test_distinct_sketch_state_survives_parquet(spark, tmp_path):
    """The whole point of the sketch state is that it is STORABLE: write
    the per-day sketch rows to parquet (binary column), read them back,
    merge — identical estimates to the never-persisted path."""
    ev = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
          .withColumn("day", F.date_trunc("day", F.col("ts"))))
    daily = agg.distinct_sketches(ev, ("event_type",), "user_id", "day")
    path = str(tmp_path / "sketch_state")
    daily.write.parquet(path)
    reread = spark.read.parquet(path)
    a = {r["event_type"]: (r["n_buckets"], r["distinct_est"]) for r in
         agg.merge_distinct_sketches(reread, ("event_type",)).collect()}
    b = {r["event_type"]: (r["n_buckets"], r["distinct_est"]) for r in
         agg.merge_distinct_sketches(daily, ("event_type",)).collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_overcounts_only_and_is_tight_here(spark):
    """est(k) >= true(k) for every key (collisions only ever ADD), and the
    CMS error bound est <= true + ceil(e/w * N) holds; at 150 keys vs
    w=1024 the estimates should in fact be exact for most keys."""
    import math
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    sketch = agg.cms_build(ev, "user_id")
    keys = ev.select(F.col("user_id").alias("key")).distinct()
    est = {r["key"]: r["est"] for r in
           agg.cms_estimate(sketch, keys).collect()}
    true = {r["user_id"]: r["n"] for r in
            ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    n_total = sum(true.values())
    bound = math.ceil(math.e / agg.CMS_W * n_total)
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] <= t + bound, (k, est[k], t, bound)
    assert sum(1 for k in true if est[k] == true[k]) >= 0.9 * len(true)


def test_cms_merge_is_exact_addition(spark):
    """Counters add: the merge of two half-sketches is ROW-IDENTICAL to
    the sketch of the whole input — incremental ingest converges exactly."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    a = agg.cms_build(ev.where("event_id % 2 = 0"), "user_id")
    b = agg.cms_build(ev.where("event_id % 2 = 1"), "user_id")
    merged = sorted(tuple(r) for r in
                    agg.cms_merge(a.unionByName(b)).collect())
    whole = sorted(tuple(r) for r in agg.cms_build(ev, "user_id").collect())
    assert merged == whole


def test_cms_bucket_matches_python_hash(spark):
    """The md5 bucket assignment (the DRIVER/oracle basis) is locked
    against the pure-Python fold (the third engine); the xxhash64
    production default is covered by the property tests above, whose
    overcount/merge/bound guarantees are hash-agnostic. An unknown basis
    raises."""
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash_basis"):
        agg._cms_bucket("user_id", 0, agg.CMS_W, "s", hash_basis="nope")
    from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
    df = spark.createDataFrame([(8,), (46,), (7,)], "user_id long")
    rows = (df.select("user_id",
                      *[agg._cms_bucket("user_id", i, agg.CMS_W, "cms-v1",
                                        hash_basis="md5")
                        .alias(f"b{i}") for i in range(agg.CMS_D)])
              .collect())
    for r in rows:
        for i in range(agg.CMS_D):
            want = md5_hash60_py(f"cms:cms-v1:{i}:{r['user_id']}") % agg.CMS_W
            assert r[f"b{i}"] == want, (r["user_id"], i)


def test_cms_null_keys_skipped_and_plan(spark):
    """NULL keys never enter the sketch; the build is one two-phase
    aggregate below a Generate (no Join/Window), and the estimate's only
    broadcast is the BOUNDED d×w sketch side."""
    from logstash_filter_geoip_spark.plans import checks
    df = spark.createDataFrame([(1,), (None,), (1,)], "k long")
    sk = agg.cms_build(df, "k")
    assert sk.agg(F.max("c")).collect()[0][0] == 2  # the NULL row is gone
    p = checks.simple_plan(sk)
    assert "Join" not in p and "Window" not in p, p[:3000]
    assert p.count("HashAggregate") == 2, p[:3000]
    keys = df.where("k IS NOT NULL").select(F.col("k").alias("key"))
    pe = checks.simple_plan(agg.cms_estimate(sk, keys))
    assert "BroadcastHashJoin" in pe and "SortMergeJoin" not in pe, pe[:3000]
