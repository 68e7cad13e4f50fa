"""Trend operators: Python recompute of CUBE grouping sets, the power-of-2
decay, and the exact slope pair — on crafted events including NULL ts and
NULL event_type (sf0.01 has neither) with a DuckDB replay pinning the NULL
semantics cross-engine; plan pins for the Expand/one-Exchange shapes."""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime

import duckdb
import pytest

from logstash_filter_geoip_spark.operators.trending import (
    DECAY_HORIZON_DAYS, cube_rollup, decayed_counts, oracles, trend_slopes)

ROWS = [
    (1, datetime(2024, 1, 1, 5), "click", 1.25),
    (2, datetime(2024, 1, 1, 9), "click", 2.50),
    (3, datetime(2024, 1, 2, 1), "view", 0.75),
    (4, datetime(2024, 1, 2, 2), "click", 4.00),
    (5, datetime(2024, 1, 4, 3), "view", 1.00),
    (6, None, "view", 8.00),           # NULL ts: real NULL day group
    (7, datetime(2024, 1, 4, 9), None, 3.00),   # NULL type: real NULL group
    (8, datetime(2023, 11, 1, 0), "stale", 9.00),  # beyond decay horizon
]
SCHEMA = ("event_id long, ts timestamp_ntz, event_type string, "
          "value double")


def _ev(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _duck(sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
                "event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", ROWS)
    return con.execute(sql).fetchall()


def test_cube_rollup_matches_python_and_duckdb(spark):
    got = {(r.event_type, r.day, r.gid): (r.n_events, r.sum_cents)
           for r in cube_rollup(_ev(spark)).collect()}

    want: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for _, ts, et, v in ROWS:
        day = ts.replace(hour=0, minute=0) if ts is not None else None
        cents = round(v * 100)
        for keep_t, keep_d, gid in ((True, True, 0), (True, False, 1),
                                    (False, True, 2), (False, False, 3)):
            k = (et if keep_t else None, day if keep_d else None, gid)
            want[k][0] += 1
            want[k][1] += cents
    assert got == {k: tuple(v) for k, v in want.items()}
    # real NULLs and rolled-up NULLs coexist, disambiguated by gid
    assert ("view", None, 0) in got           # genuine NULL day (row 6)
    assert (None, datetime(2024, 1, 4), 0) in got  # genuine NULL type (7)
    assert (None, None, 3) in got             # the grand total

    duck = {(t, d, g): (n, c) for t, d, g, n, c in _duck(
        oracles()["cube_rollup"])}
    assert duck == got


def test_cube_rollup_plan_one_exchange_with_expand(spark):
    plan = (cube_rollup(_ev(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" in plan
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decayed_counts_matches_python_and_duckdb(spark):
    got = {r.event_type: (r.n_recent, r.score_num)
           for r in decayed_counts(_ev(spark)).collect()}

    H = DECAY_HORIZON_DAYS
    days = [(et, (ts.date() - date(1970, 1, 1)).days)
            for _, ts, et, _ in ROWS if ts is not None]
    mx = max(d for _, d in days)
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for et, d in days:
        if mx - d <= H:
            want[et][0] += 1
            want[et][1] += 1 << (H - (mx - d))
    assert got == {k: tuple(v) for k, v in want.items()}
    assert "stale" not in got          # beyond the horizon

    duck = {t: (n, s) for t, n, s in _duck(oracles()["decayed_counts"])}
    assert duck == got

    with pytest.raises(ValueError, match="horizon_days"):
        decayed_counts(_ev(spark), horizon_days=61)


def test_trend_slopes_matches_python_and_duckdb(spark):
    got = {r.event_type: (r.n_days, r.slope_num, r.slope_den)
           for r in trend_slopes(_ev(spark)).collect()}

    daily: dict[tuple, int] = defaultdict(int)
    for _, ts, et, _ in ROWS:
        if ts is not None:
            daily[(et, (ts.date() - date(1970, 1, 1)).days)] += 1
    per: dict[str, list[tuple]] = defaultdict(list)
    for (et, d), y in daily.items():
        per[et].append((d, y))
    want = {}
    for et, pts in per.items():
        if len(pts) < 2:
            continue
        n = len(pts)
        sx = sum(d for d, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(d * y for d, y in pts)
        sxx = sum(d * d for d, _ in pts)
        want[et] = (n, n * sxy - sx * sy, n * sxx - sx * sx)
    assert got == want
    # click: days (d0: 2, d1: 1) → slope -1 exactly (num/den = -2/2)
    n, num, den = got["click"]
    assert n == 2 and num * 1 == -1 * den
    assert None not in got             # NULL type single-day → excluded

    duck = {t: (n, a, b) for t, n, a, b in _duck(oracles()["trend_slopes"])}
    assert duck == got


# ---------------------------------------------------------------------------
# debounced_transitions (session 17)
# ---------------------------------------------------------------------------


def test_flap_suppression_semantics(spark):
    import datetime as dt

    import pytest

    from logstash_filter_geoip_spark.operators.trending import (
        debounced_transitions)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # entity u1: ok ok | HIGH(1-row flap, swallowed) | ok ok | high high
    #   → emits: ok (first), high (real transition). The flap must NOT
    #   reset the emitted state: ok → ok after the flap emits nothing.
    seq1 = ["ok", "ok", "high", "ok", "ok", "high", "high"]
    rows += [(1, i, t0 + dt.timedelta(minutes=i), s)
             for i, s in enumerate(seq1)]
    # entity u2: NULL NULL | ok — NULL is a real state (first run emits,
    #   NULL→ok is a transition but the ok run is 1 row → swallowed)
    seq2 = [None, None, "ok"]
    rows += [(2, i, t0 + dt.timedelta(minutes=i), s)
             for i, s in enumerate(seq2)]
    # entity u3: NULL ts rows drop entirely
    rows += [(3, 0, None, "ok"), (3, 1, None, "ok")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, state string")
    got = [(r.user_id, r.state, r.prev_state, r.run_len)
           for r in debounced_transitions(df, ["user_id"], "state")
           .orderBy("user_id", "run_start").collect()]
    assert got == [(1, "ok", None, 2), (1, "high", "ok", 2),
                   (2, None, None, 2)]
    # min_run=1: every run emits (plain transition stream incl. the flap)
    plain = [(r.user_id, r.state) for r in
             debounced_transitions(df.where("user_id = 1"), ["user_id"],
                                   "state", min_run=1)
             .orderBy("run_start").collect()]
    assert plain == [(1, "ok"), (1, "high"), (1, "ok"), (1, "high")]
    with pytest.raises(ValueError):
        debounced_transitions(df, ["user_id"], "state", min_run=0)


def test_flap_plan_single_entity_exchange(spark):
    from logstash_filter_geoip_spark.operators.trending import (
        _flap_states, debounced_transitions)
    from logstash_filter_geoip_spark.plans import checks
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = checks.simple_plan(debounced_transitions(_flap_states(ev),
                                                 ["user_id"], "state"))
    # windows + run aggregate + qualifying-run window all ride user_id
    # partitionings; no join anywhere
    assert "Join" not in p and "EvalPython" not in p, p
    assert p.count("Exchange") <= 2, p
