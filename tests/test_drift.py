"""Distribution-drift operators: planted-drift values, NULL semantics,
empty-side guards, DuckDB parity on synthetic rows, and the no-join plan
pin. (The driver queries themselves are oracle-checked by
test_oracle_parity.)"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from logstash_filter_geoip_spark.operators import drift

T = dt.datetime
SPLIT = "2024-06-15 00:00:00"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "cat string, value double, ts timestamp_ntz")


def _base(d):  # before the split
    return T(2024, 6, d)


def _curr(d):  # after the split
    return T(2024, 6, 15 + d)


def test_categorical_drift_planted(spark):
    # base: 8 a, 2 b;  curr: 5 a, 5 b  -> b's share 200000 -> 500000 ppm
    rows = ([("a", 1.0, _base(1))] * 8 + [("b", 1.0, _base(2))] * 2
            + [("a", 1.0, _curr(1))] * 5 + [("b", 1.0, _curr(2))] * 5)
    out = drift.categorical_drift(_df(spark, rows), "cat", "ts", SPLIT,
                                  lift=(12, 10))
    got = {r["cat"]: r.asDict() for r in out.collect()}
    assert got["a"]["n_base"] == 8 and got["a"]["n_curr"] == 5
    assert got["a"]["ppm_base"] == 800_000
    assert got["a"]["ppm_curr"] == 500_000
    assert got["a"]["drifted"] == 1  # 800000*10 > 500000*12
    assert got["b"]["ppm_base"] == 200_000
    assert got["b"]["ppm_curr"] == 500_000
    assert got["b"]["drifted"] == 1
    # within-lift category is not flagged
    rows2 = ([("a", 1.0, _base(1))] * 10 + [("a", 1.0, _curr(1))] * 11)
    out2 = drift.categorical_drift(_df(spark, rows2), "cat", "ts", SPLIT)
    r = out2.collect()[0]
    assert (r["ppm_base"], r["ppm_curr"], r["drifted"]) == (
        1_000_000, 1_000_000, 0)


def test_null_ts_and_null_category(spark):
    rows = [("a", 1.0, _base(1)), ("a", 1.0, None),  # NULL ts: neither side
            (None, 1.0, _curr(1))]                   # NULL cat: own bucket
    out = drift.categorical_drift(_df(spark, rows), "cat", "ts", SPLIT)
    got = {r["cat"]: r.asDict() for r in out.collect()}
    assert got["a"]["n_base"] == 1 and got["a"]["n_curr"] == 0
    assert got[None]["n_base"] == 0 and got[None]["n_curr"] == 1
    assert got["a"]["ppm_curr"] == 0 and got["a"]["drifted"] == 1


def test_empty_side_is_null_not_error(spark):
    rows = [("a", 1.0, _base(1)), ("b", 1.0, _base(2))]  # no current rows
    out = drift.categorical_drift(_df(spark, rows), "cat", "ts", SPLIT)
    for r in out.collect():
        assert r["ppm_curr"] is None and r["drifted"] is None
    s = drift.drift_summary(out).collect()[0]
    assert s["tot_curr"] == 0 and s["n_drifted"] == 0
    assert s["tvd_ppm"] is None


def test_value_drift_sentinels_and_summary(spark):
    rows = [("x", -5.0, _base(1)), ("x", 250.0, _base(1)),  # -1 and n
            ("x", 50.0, _base(1)), ("x", None, _base(1)),   # NULL bucket
            ("x", 50.0, _curr(1)), ("x", 51.0, _curr(1))]
    out = drift.value_drift(_df(spark, rows), "value", "ts", SPLIT,
                            lo=0.0, hi=100.0, n_buckets=10)
    got = {r["bucket_idx"]: r.asDict() for r in out.collect()}
    assert set(got) == {-1, 10, 5, None}
    assert got[-1]["n_base"] == 1 and got[-1]["n_curr"] == 0
    assert got[10]["n_base"] == 1
    assert got[5]["n_base"] == 1 and got[5]["n_curr"] == 2
    assert got[None]["n_base"] == 1
    # shares: base 4 rows -> 250000 each; curr 2 rows -> bucket5 1000000
    assert got[5]["ppm_base"] == 250_000 and got[5]["ppm_curr"] == 1_000_000
    s = drift.drift_summary(out).collect()[0]
    assert s["tot_base"] == 4 and s["tot_curr"] == 2
    # |250000-0|*2 + |250000-1000000| + |250000-0| = 1500000 -> tvd 750000
    assert s["tvd_ppm"] == 750_000
    assert s["n_drifted"] == 4


def test_duckdb_parity_on_synthetic_rows(spark, tmp_path):
    rows = ([("a", 12.0, _base(1))] * 7 + [("b", -3.0, _base(2))] * 3
            + [("a", 98.5, _curr(1))] * 2 + [("c", 150.0, _curr(2))] * 8
            + [("a", None, None), (None, 7.0, _curr(3))])
    df = _df(spark, rows)
    p = str(tmp_path / "ev.parquet")
    df.selectExpr("cat AS event_type", "value", "ts").coalesce(1) \
      .write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")

    for op, sql in [
        (drift.categorical_drift(df.withColumnRenamed("cat", "event_type"),
                                 "event_type", "ts", SPLIT),
         drift.categorical_drift_oracle_sql("events", "event_type", "ts",
                                            SPLIT)),
        (drift.value_drift(df.withColumnRenamed("cat", "event_type"),
                           "value", "ts", SPLIT, 0.0, 100.0, 10),
         drift.value_drift_oracle_sql("events", "value", "ts", SPLIT,
                                      0.0, 100.0, 10)),
    ]:
        s = sorted(tuple(str(v) for v in r) for r in op.collect())
        d = sorted(tuple(str(v) for v in r) for r in con.execute(sql).fetchall())
        assert s == d
        summ = sorted(tuple(str(v) for v in r)
                      for r in drift.drift_summary(op).collect())
        dsum = sorted(tuple(str(v) for v in r) for r in con.execute(
            drift.drift_summary_oracle_sql(sql)).fetchall())
        assert summ == dsum


def test_lift_validation():
    with pytest.raises(ValueError):
        drift._check_lift((10, 10))
    with pytest.raises(ValueError):
        drift._check_lift((12, 0))
    with pytest.raises(ValueError):
        drift._check_lift((1.2, 1.0))


def test_plan_no_join_no_python(spark):
    rows = [("a", 1.0, _base(1)), ("b", 2.0, _curr(1))]
    out = drift.drift_summary(
        drift.value_drift(_df(spark, rows), "value", "ts", SPLIT,
                          0.0, 100.0, 10))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan        # totals via window, never a join-back
    assert "EvalPython" not in plan  # no Python in the path


def test_fractional_bounds_bucket_parity(spark):
    """DECIMAL-folding regression: DuckDB folds bare (2.3 - 1.1) exactly
    in DECIMAL while Spark computes 1.1999999999999997 in double — the
    shared bucket SQL must CAST every bound to DOUBLE so both engines
    bucket non-exactly-representable bounds identically."""
    from logstash_filter_geoip_spark.operators.aggregate import (
        bucket_idx_expr, bucket_idx_sql)
    cases = [(1.1, 2.3, 9, [1.5, 1.1, 2.29]),
             (0.01, 0.07, 5, [0.034, 0.046, 0.058])]
    con = duckdb.connect()
    for lo, hi, n, vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = {r["v"]: r["b"] for r in df.select(
            "v", bucket_idx_expr("v", lo, hi, n).alias("b")).collect()}
        sql = bucket_idx_sql("v", lo, hi, n)
        want = {v: con.execute(
            f"SELECT {sql} FROM (SELECT CAST({v} AS DOUBLE) AS v)"
        ).fetchone()[0] for v in vals}
        assert got == want, (lo, hi, n, got, want)


def test_rolling_drift_day_over_day(spark):
    d1, d2, d4 = T(2024, 6, 1, 5), T(2024, 6, 2, 7), T(2024, 6, 4, 9)
    rows = ([("a", 1.0, d1)] * 5 + [("b", 1.0, d1)] * 5      # day1: 50/50
            + [("a", 1.0, d2)] * 8 + [("b", 1.0, d2)] * 2    # day2: 80/20
            + [("a", 1.0, d4)] * 8 + [("b", 1.0, d4)] * 2)   # day4 == day2
    out = drift.rolling_drift(_df(spark, rows), "cat", "ts", "day")
    got = {(r["bucket_ts"].day, r["cat"]): r.asDict() for r in out.collect()}
    assert got[(1, "a")]["prev_ppm"] is None     # first bucket: NULL flag
    assert got[(1, "a")]["drifted"] is None
    assert got[(2, "a")]["share_ppm"] == 800_000
    assert got[(2, "a")]["prev_ppm"] == 500_000
    assert got[(2, "a")]["drifted"] == 1         # 8e5*10 > 5e5*12
    assert got[(2, "b")]["drifted"] == 1
    # gap rule: day 4 compares to day 2 (the last bucket the cat appeared)
    assert got[(4, "a")]["prev_ppm"] == 800_000
    assert got[(4, "a")]["drifted"] == 0


def test_drift_three_engine_fuzz(spark, tmp_path):
    """Seeded random batch through all three engines: Spark == DuckDB ==
    a pure-Python recompute of the integer ppm/flag arithmetic (cats incl
    NULL, values incl NULL/boundary/out-of-range, ts incl NULL and the
    exact split instant)."""
    import math
    import random
    rnd = random.Random(1313)
    split_dt = T(2024, 6, 15)
    cats = ["a", "b", "c", "d", None]
    rows = []
    for _ in range(600):
        cat = rnd.choice(cats)
        v = rnd.choice([None, rnd.uniform(-10, 110), 0.0, 100.0, 99.999999])
        ts = rnd.choice([None, split_dt,
                         T(2024, 6, rnd.randint(1, 28), rnd.randint(0, 23))])
        rows.append((cat, v, ts))
    df = _df(spark, rows)

    # --- categorical: python recompute (lift 12/10) ---
    nb, nc = {}, {}
    for cat, _, ts in rows:
        if ts is None:
            continue
        side = nb if ts < split_dt else nc
        side[cat] = side.get(cat, 0) + 1
    tb, tc = sum(nb.values()), sum(nc.values())

    def share(n, tot):
        return None if tot == 0 else n * 1_000_000 // tot

    def flag(pb, pc):
        if pb is None or pc is None:
            return None
        return int(pc * 10 > pb * 12 or pb * 10 > pc * 12)

    expected = {}
    for cat in {c for c, _, _ in rows}:
        b_, c_ = nb.get(cat, 0), nc.get(cat, 0)
        pb, pc = share(b_, tb), share(c_, tc)
        expected[cat] = (b_, c_, pb, pc, flag(pb, pc))
    got = {r["cat"]: (r["n_base"], r["n_curr"], r["ppm_base"],
                      r["ppm_curr"], r["drifted"])
           for r in drift.categorical_drift(df, "cat", "ts",
                                            SPLIT).collect()}
    assert got == expected

    # --- value buckets: python recompute of the shared double rule ---
    lo, hi, n = 0.0, 100.0, 20

    def bucket(v):
        if v is None:
            return None
        if v < lo:
            return -1
        if v >= hi:
            return n
        return int(math.floor(((v - lo) * n) / (hi - lo)))

    vb, vc = {}, {}
    for _, v, ts in rows:
        if ts is None:
            continue
        side = vb if ts < split_dt else vc
        k = bucket(v)
        side[k] = side.get(k, 0) + 1
    tvb, tvc = sum(vb.values()), sum(vc.values())
    vexp = {}
    for k in {bucket(v) for _, v, _ in rows}:
        b_, c_ = vb.get(k, 0), vc.get(k, 0)
        pb, pc = share(b_, tvb), share(c_, tvc)
        vexp[k] = (b_, c_, pb, pc, flag(pb, pc))
    vgot = {r["bucket_idx"]: (r["n_base"], r["n_curr"], r["ppm_base"],
                              r["ppm_curr"], r["drifted"])
            for r in drift.value_drift(df, "value", "ts", SPLIT,
                                       lo, hi, n).collect()}
    assert vgot == vexp

    # --- DuckDB third engine over the identical parquet rows ---
    p = str(tmp_path / "fz.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW fz AS SELECT * FROM read_parquet('{p}/*.parquet')")
    for op, sql in [
        (drift.categorical_drift(df, "cat", "ts", SPLIT),
         drift.categorical_drift_oracle_sql("fz", "cat", "ts", SPLIT)),
        (drift.value_drift(df, "value", "ts", SPLIT, lo, hi, n),
         drift.value_drift_oracle_sql("fz", "value", "ts", SPLIT,
                                      lo, hi, n)),
        (drift.rolling_drift(df, "cat", "ts", "day"),
         drift.rolling_drift_oracle_sql("fz", "cat", "ts", "day")),
    ]:
        s = sorted(tuple(str(x) for x in r) for r in op.collect())
        d = sorted(tuple(str(x) for x in r)
                   for r in con.execute(sql).fetchall())
        assert s == d
