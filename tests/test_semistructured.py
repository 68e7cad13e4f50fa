"""JSON props extraction (operators/semistructured.py): NULL semantics on
malformed/missing/NULL/non-numeric input, key-histogram behavior, and the
engine-shared guard in the oracle SQL."""

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
]


def test_json_field_null_semantics(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["event_id"]: r["k"] for r in
           df.select("event_id",
                     S.json_field(F.col("props"), "$.k", "bigint")
                      .alias("k")).collect()}
    assert got == {0: 69, 1: None, 2: None, 3: None, 4: None, 5: 7}

    # the oracle's guard reproduces the same NULLs in DuckDB
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, " + ("NULL" if p is None else f"'{p}'") + ")"
        for i, p in ROWS)
    duck = {r[0]: r[1] for r in con.execute(f"""
        SELECT event_id,
               TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                             THEN json_extract_string(props, '$.k') END
                        AS BIGINT) AS k
        FROM (VALUES {vals}) AS t(event_id, props)""").fetchall()}
    assert duck == got


def test_json_key_hist_skips_unparseable_rows(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    keys = F.map_keys(S.json_keys_map(F.col("props")))
    hist = {r["key"]: r["n"] for r in
            df.select(F.explode(keys).alias("key"))
              .groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    # malformed (3) and NULL (4) rows contribute nothing
    assert hist == {"k": 3, "j": 2}
