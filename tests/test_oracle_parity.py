"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 in Spark AND its oracle_sql() in DuckDB, compare row counts and
order-insensitive values (columns sorted by name, rows sorted), plus the
r5-verdict hash-fidelity check: both results are ALSO viewed through the
pandas dtype lens the driver hashes through (DuckDB ``.df()``; Spark rows
via pandas inference), so an engine-type divergence that stringifies
differently there — e.g. an un-CAST DuckDB window SUM surfacing HUGEINT →
float64 "1.0" against Spark's BIGINT "1" — fails locally before the driver
sees it."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _pd_kind(dtype) -> str:
    """Coarse numeric kind of a pandas dtype: 'i' (integer), 'f' (float),
    '' (anything else — strings, objects, datetimes, bools)."""
    k = getattr(dtype, "kind", "")
    return k if k in ("i", "u", "f") else ""


def numeric_kind_mismatches(spark_rows, spark_cols, duck_pd) -> list[str]:
    """Columns where one engine renders integer and the other float under
    the driver's pandas hash lens (the sessionize_stats HUGEINT class).
    The Spark side mimics the driver's arrow/toPandas coercion by letting
    pandas infer dtypes from the collected Python values (ints+None →
    float64, exactly like arrow's nullable-long conversion)."""
    spark_pd = pd.DataFrame(spark_rows or None, columns=spark_cols)
    bad = []
    for c in spark_cols:
        if c not in duck_pd.columns:
            continue
        a = _pd_kind(spark_pd[c].dtype) if len(spark_pd) else ""
        b = _pd_kind(duck_pd[c].dtype) if len(duck_pd) else ""
        a, b = ("i" if a == "u" else a), ("i" if b == "u" else b)
        if a and b and a != b:
            bad.append(f"{c}: spark renders {a}, oracle renders {b}")
    return bad


def test_kind_checker_catches_uncast_window_sum():
    """The r5-verdict done-criterion: a deliberately un-CAST window SUM
    (HUGEINT → float64 through .df()) must fail the replica."""
    con = duckdb.connect()
    duck_pd = con.execute(
        "SELECT sum(x) OVER () AS s FROM (SELECT 1::BIGINT AS x)").df()
    assert numeric_kind_mismatches([(1,)], ["s"], duck_pd) \
        == ["s: spark renders i, oracle renders f"]
    duck_pd2 = con.execute(
        "SELECT CAST(sum(x) OVER () AS BIGINT) AS s "
        "FROM (SELECT 1::BIGINT AS x)").df()
    assert numeric_kind_mismatches([(1,)], ["s"], duck_pd2) == []


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    if name not in ORACLES:
        # rows-only contract: runs and returns a stable schema
        assert isinstance(spark_rows, list)
        assert len(spark_cols) > 0
        return
    con = _duck(SF_ORACLE)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}")
    s, d = _norm(spark_rows, spark_cols), _norm(duck_rows, duck_cols)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:5]
    assert s == d, f"{name}: first mismatches {[(s[i], d[i]) for i in mism]}"
    # driver hash-lens fidelity: re-run the oracle through .df() and flag
    # integer-vs-float render divergences (HUGEINT/DECIMAL leaks)
    kinds = numeric_kind_mismatches(
        spark_rows, spark_cols, con.execute(ORACLES[name]).df())
    assert not kinds, f"{name}: driver-lens type divergence {kinds}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["window_start", "country_iso_code", "n_turns", "n_failures"]
