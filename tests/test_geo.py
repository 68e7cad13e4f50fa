"""geo_velocity (impossible-travel screen): crafted-matrix semantics,
DuckDB equality on the same rows, an independent Python recompute, the
BIGINT overflow guards, and the plan contracts (one Exchange standalone;
exchange REUSE behind the enriched pipeline — the role_transitions rule)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logstash_filter_geoip_spark.operators import geo
from logstash_filter_geoip_spark.plans import checks

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("city_name", T.StringType()),
])

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=minutes)


MILTON = (47.2513, -122.3149)
MADRIDISH = (40.0, -4.0)

ROWS = [
    # conv A: same-place pair, a miss row that must NOT break pairing,
    # a fast continental hop (flag), an out-of-order ts (excluded),
    # and a beyond-max-gap pair (excluded)
    ("A", 1, _t(0), *MILTON, "Milton"),
    ("A", 2, _t(30), *MILTON, "Milton"),          # dist 0 → no flag
    ("A", 3, _t(60), None, None, None),           # enrich miss — dropped
    ("A", 4, _t(90), *MADRIDISH, None),           # ~8500 km in 1h → flag
    ("A", 5, _t(60), *MADRIDISH, None),           # ts < prev ts → excluded
    ("A", 6, _t(90 + 49 * 60), *MILTON, "Milton"),  # dt > 24h → excluded
    # conv B: antimeridian — the SHORT way around is slow (no flag); the
    # unwrapped 359.8° delta would have flagged
    ("B", 1, _t(0), 10.0, 179.9, None),
    ("B", 2, _t(10), 10.0, -179.9, None),
    # conv C: dt = 0 twins — distance > 0 flags, distance 0 doesn't
    ("C", 1, _t(0), *MILTON, "Milton"),
    ("C", 2, _t(0), *MADRIDISH, None),
    ("C", 3, _t(5), *MILTON, "Milton"),
    ("C", 4, _t(5), *MILTON, "Milton"),
]


def _py_mdeg(x: float) -> int:
    # round-half-away-from-zero of x*1000, like both engines
    import math
    v = x * 1000.0
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _py_velocity(rows, vmax=geo.VMAX_MDEG_PER_HR, max_gap=geo.MAX_GAP_S):
    """Independent recompute (plain Python, no Spark/DuckDB)."""
    out = []
    by_conv: dict = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1])):
        conv, idx, ts, lat, lon, city = r
        if lat is None or lon is None:
            continue
        prev = by_conv.get(conv)
        by_conv[conv] = (idx, ts, _py_mdeg(lat), _py_mdeg(lon), city)
        if prev is None:
            continue
        pidx, pts, plat, plon, pcity = prev
        if ts < pts:
            continue
        dt_s = int((ts - pts).total_seconds())
        if dt_s > max_gap:
            continue
        dlat = _py_mdeg(lat) - plat
        adlon = abs(_py_mdeg(lon) - plon)
        wdlon = min(adlon, 360_000 - adlon)
        dist2 = dlat * dlat + wdlon * wdlon
        flag = int(dist2 * 12_960_000 > vmax * vmax * dt_s * dt_s)
        out.append((conv, pidx, idx, dt_s, dist2, flag, pcity, city))
    return sorted(out)


def _spark_velocity(spark, rows=ROWS):
    df = spark.createDataFrame(rows, SCHEMA)
    return geo.geo_velocity(df, carry=("city_name",))


def test_crafted_matrix(spark):
    got = sorted(tuple(r) for r in _spark_velocity(spark).collect())
    want = _py_velocity(ROWS)
    assert got == want
    by_key = {(c, p, i): f for c, p, i, _, _, f, _, _ in got}
    # the miss row did not break pairing: 2 → 4 is a pair, and it flags
    assert by_key[("A", 2, 4)] == 1
    assert by_key[("A", 1, 2)] == 0          # same place
    assert ("A", 4, 5) not in by_key          # ts went backwards
    assert ("A", 5, 6) not in by_key and ("A", 4, 6) not in by_key  # >24h
    assert by_key[("B", 1, 2)] == 0           # wrapped dlon: short way slow
    assert by_key[("C", 1, 2)] == 1           # dt=0, distance>0
    assert by_key[("C", 3, 4)] == 0           # dt=0, distance 0


def test_duckdb_equality_crafted(spark):
    got = sorted(tuple(r) for r in _spark_velocity(spark).collect())
    pdf = pd.DataFrame(ROWS, columns=[f.name for f in SCHEMA.fields])
    con = duckdb.connect()
    con.register("crafted", pdf)
    sql = ("WITH v_hits AS (SELECT conv_id, turn_idx, ts, lat, lon, "
           "city_name FROM crafted WHERE lat IS NOT NULL AND "
           "lon IS NOT NULL)"
           + geo.velocity_oracle_cte("v_hits", carry=("city_name",)))
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_param_guards():
    with pytest.raises(ValueError, match="positive"):
        geo.velocity_oracle_cte("h", vmax_mdeg_per_hr=0)
    with pytest.raises(ValueError, match="positive"):
        geo.velocity_oracle_cte("h", max_gap_s=-1)
    with pytest.raises(ValueError, match="overflow"):
        geo.velocity_oracle_cte("h", vmax_mdeg_per_hr=10**7,
                                max_gap_s=10**6)


def test_vmax_boundary_is_strict(spark):
    """Exactly-at-threshold speed is NOT a violation (strict >): 1000 mdeg
    in exactly 1h at vmax=1000 — cross-multiplied equality."""
    rows = [("A", 1, _t(0), 0.0, 0.0, None),
            ("A", 2, _t(60), 1.0, 0.0, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = geo.geo_velocity(df, vmax_mdeg_per_hr=1000).collect()
    assert len(out) == 1 and out[0]["is_violation"] == 0
    out2 = geo.geo_velocity(df, vmax_mdeg_per_hr=999).collect()
    assert out2[0]["is_violation"] == 1


def test_plan_one_exchange_no_join_no_python(spark):
    plan = checks.simple_plan(_spark_velocity(spark))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "Join" not in plan and "Python" not in plan, plan[:3000]


def test_driver_query_plan(spark):
    """Behind the full enriched pipeline the velocity window costs exactly
    ONE extra conv_id exchange over the derivation's (measured, Spark
    4.1.2: ArrowEvalPython — the enrich ipv6_to_key barrier — reports
    unknown output partitioning, so the role_transitions exchange-reuse
    rule CANNOT apply downstream of unified enrich; the re-shuffle carries
    only the located rows in a 6-column projection). If a Spark upgrade
    makes EvalPythonExec partitioning-preserving this pin drops to 1 —
    lower it, don't work around it."""
    import __spark_entry__ as entrymod
    df = entrymod.q_geo_velocity(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(conv_id") == 2, plan[:3000]
    assert "BroadcastNestedLoop" not in plan, plan[:3000]
