"""JSON props extraction (operators/semistructured.py): NULL semantics on
malformed/missing/NULL/non-numeric input, strict-grammar alignment with
DuckDB's json_valid, the documented margin divergences, key-histogram
behavior, and deep-path extraction."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F, types as T

from logstash_filter_geoip_spark.operators import semistructured as S

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("props", T.StringType()),
])

ROWS = [
    (0, '{"k": 69}'),            # well-formed, numeric
    (1, '{"k": "nope"}'),        # well-formed, non-numeric value
    (2, '{"j": 1}'),             # well-formed, path missing
    (3, 'not json at all'),      # malformed
    (4, None),                   # NULL payload
    (5, '{"k": 7, "j": 2}'),     # two keys
    (6, "{'k': 5}"),             # single quotes — lenient Jackson would
                                 # accept; the strict gate rejects (DuckDB
                                 # parity)
    (7, '{k: 3}'),               # unquoted key — both engines reject
    (8, '{"k": 011}'),           # leading zero — both engines reject
]


def _duck_k(rows, dtype="BIGINT"):
    con = duckdb.connect()
    out = {}
    for i, p in rows:
        v = con.execute(f"""
            SELECT TRY_CAST(CASE WHEN ? IS NOT NULL AND json_valid(?)
                                 THEN json_extract_string(?, '$.k') END
                            AS {dtype})""", [p, p, p]).fetchone()[0]
        out[i] = v
    return out


def _spark_k(spark, rows, dtype="bigint"):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["event_id"]: r["k"] for r in
            df.select("event_id",
                      S.json_field(F.col("props"), "$.k", dtype)
                       .alias("k")).collect()}


def test_json_field_null_semantics_match_duckdb(spark):
    got = _spark_k(spark, ROWS)
    assert got == {0: 69, 1: None, 2: None, 3: None, 4: None, 5: 7,
                   6: None, 7: None, 8: None}
    assert _duck_k(ROWS) == got


def test_documented_margin_divergences(spark):
    # the module docstring's known grammar margins — pinned so any silent
    # behavior change (Spark upgrade, DuckDB upgrade) is caught here, not
    # by a confusing driver-gate failure
    margins = [(100, '{"k": 26} trailing'),   # Jackson stops at the first
                                              # complete value; DuckDB rejects
               (101, '{"k": 1,}')]            # trailing comma: yajl accepts;
                                              # strict Jackson rejects
    assert _spark_k(spark, margins) == {100: 26, 101: None}
    assert _duck_k(margins) == {100: None, 101: 1}

    # bare NaN: DuckDB accepts the literal; strict Jackson rejects — for
    # NUMERIC extraction both converge to NULL (TRY_CAST('NaN') is NULL),
    # string extraction diverges
    nan = [(102, '{"k": NaN}')]
    assert _spark_k(spark, nan) == {102: None}
    assert _duck_k(nan) == {102: None}
    assert _spark_k(spark, nan, "string") == {102: None}
    assert _duck_k(nan, "VARCHAR") == {102: "NaN"}


def test_deep_path_uses_gated_get_json_object(spark):
    rows = [(0, '{"a": {"b": 4}}'), (1, "{'a': {'b': 4}}"), (2, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["event_id"]: r["v"] for r in
           df.select("event_id",
                     S.json_field(F.col("props"), "$.a.b", "bigint")
                      .alias("v")).collect()}
    # the strict gate applies to DEEP paths too: row 1's single-quoted
    # payload is rejected even though get_json_object alone would read it
    assert got == {0: 4, 1: None, 2: None}


def test_json_key_hist_skips_unparseable_rows(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    keys = F.map_keys(S.json_keys_map(F.col("props")))
    hist = {r["key"]: r["n"] for r in
            df.select(F.explode(keys).alias("key"))
              .groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    # malformed (3, 6, 7, 8) and NULL (4) rows contribute nothing
    assert hist == {"k": 3, "j": 2}


def test_log_template_rules(spark):
    """Rule ordering: uuid/hex/ip collapse BEFORE the bare-number rule eats
    their digits; DuckDB mirror identical on the same crafted lines."""
    import duckdb
    from pyspark.sql import functions as F
    from logstash_filter_geoip_spark.operators.semistructured import (
        log_template, log_template_counts, template_sql)
    lines = [
        "Request 550e8400-e29b-41d4-a716-446655440000 from 10.1.2.3 took 42ms",
        "REQUEST 550e8400-e29b-41d4-a716-446655440001 from 10.9.9.9 took 7ms",
        "ptr 0xdeadbeef retry 3",
        "plain text with no variables",
        "version 1.2.3.4.5 is not an ip boundary case",
    ]
    df = spark.createDataFrame([(s,) for s in lines], "text string")
    got = [r.t for r in df.select(log_template(F.col("text")).alias("t"))
           .collect()]
    assert got[0] == got[1] == \
        "request <uuid> from <ip> took <num>ms"
    assert got[2] == "ptr <hex> retry <num>"
    assert got[3] == "plain text with no variables"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in lines])
    duck = [r[0] for r in
            con.execute(f"SELECT {template_sql('text')} FROM t").fetchall()]
    assert duck == got
    # the first two lines share one template; min_count prunes singletons
    counts = {r.template: r.n_events
              for r in log_template_counts(df, "text", min_count=2)
                       .collect()}
    assert counts == {"request <uuid> from <ip> took <num>ms": 2}
