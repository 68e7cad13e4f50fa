"""Semi-structured JSON extraction over event properties.

The reference filter consumes event fields that EARLIER pipeline stages
(the logstash json codec/filter chain) parsed out of raw payloads — an
engine replacing that pipeline needs the parse step itself (the same
boundary functions/grok.py draws for unstructured text; this module is the
structured-payload counterpart). Spark-first: ``get_json_object`` and
``from_json`` are compiled JVM expressions (Jackson inside the codegen
span) — never Python — and both return NULL on malformed input instead of
raising, which is the right 100-TB posture (a poison payload must not kill
a stage; count it, don't crash on it).

Engine-shared semantics (each pinned by the oracle and tests):
  * malformed JSON → NULL extraction (Spark: by construction; DuckDB:
    ``CASE WHEN json_valid(...)`` guard — its extractors raise otherwise);
  * missing path → NULL; NULL input → NULL;
  * a non-numeric value under a numeric extraction → NULL via ``try_cast``
    (ANSI cast would throw mid-scan);
  * key histogram: malformed/NULL rows contribute no keys (explode over a
    NULL map emits no rows; DuckDB unnest over NULL likewise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def json_field(col: Column, path: str, dtype: str = "string") -> Column:
    """One JSON-path extraction as a typed column; NULL on malformed JSON,
    missing path, or a value that won't cast. Compiled expression — safe in
    hot scans."""
    s = F.get_json_object(col, path)
    return s if dtype == "string" else s.try_cast(dtype)


def json_keys_map(col: Column) -> Column:
    """All top-level string-able fields as map<string,string>; NULL for
    malformed/NULL input (from_json's permissive mode)."""
    return F.from_json(col, "map<string,string>")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction of props.k + exact per-event-type stats, one scan:
    the JSON parse runs inside the same codegen span as the aggregate's
    map side (integer sums only — no float summation-order noise)."""
    ev = _events(spark, sf_dir)
    k = json_field(F.col("props"), "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.count("k").alias("n_with_k"),
                   F.coalesce(F.sum("k"), F.lit(0)).alias("sum_k"),
                   F.min("k").alias("min_k"),
                   F.max("k").alias("max_k")))


def q_json_key_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema discovery over semi-structured payloads: per top-level key,
    how many events carry it — map parse + explode of the key set, two-phase
    count. At 100 TB this is how you find out what's actually IN `props`
    before declaring a schema."""
    ev = _events(spark, sf_dir)
    keys = F.map_keys(json_keys_map(F.col("props")))
    return (ev.select(F.explode(keys).alias("key"))
              .groupBy("key")
              .agg(F.count(F.lit(1)).alias("n_events")))


def queries():
    return {
        "json_props_stats": q_json_props_stats,
        "json_key_hist": q_json_key_hist,
    }


def oracles() -> dict[str, str]:
    # json_valid guard: DuckDB's extractors RAISE on malformed JSON where
    # Spark's return NULL — the guard pins the shared NULL semantics.
    return {
        "json_props_stats": """
WITH k AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM k GROUP BY event_type
""",
        "json_key_hist": """
SELECT key, count(*) AS n_events
FROM (
  SELECT unnest(json_keys(props)) AS key
  FROM events
  WHERE props IS NOT NULL AND json_valid(props)
)
GROUP BY key
""",
    }
