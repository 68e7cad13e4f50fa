"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 in Spark AND its oracle_sql() in DuckDB, compare row counts and
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math

import duckdb
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


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["window_start", "country_iso_code", "n_turns", "n_failures"]
