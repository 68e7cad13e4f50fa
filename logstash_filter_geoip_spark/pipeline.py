"""End-to-end parse → enrich → route → aggregate composition.

This is the engine's public API; __spark_entry__.py and bench.py call
through here. The whole flow is one declarative DataFrame DAG — Catalyst
sees scan→project→broadcast-join→project→aggregate and compiles it into two
whole-stage-codegen spans separated only by the aggregate shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import GeoIPConfig
from .functions.parse import parse_transcripts
from .operators import aggregate as agg
from .operators.enrich import enrich
from .sources.geolite2 import load_dim, validate_dim
from .sources.transcripts import load_transcripts


def enriched_transcripts(spark: SparkSession, sf_dir: str,
                         config: GeoIPConfig | None = None,
                         dim: DataFrame | None = None) -> DataFrame:
    """transcripts → parse → enrich (the first half of the pipeline)."""
    config = config or GeoIPConfig(source="ip_str", target="geoip",
                                   database="City", ecs_compatibility=True)
    t = load_transcripts(spark, sf_dir)
    parsed = parse_transcripts(t)
    if dim is None:
        dim = load_dim(spark, config.database)
        validate_dim(dim)
    return enrich(parsed, dim, config)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 flagship: turns per country per hour + failure counts (SURVEY §7.2)."""
    e = enriched_transcripts(spark, sf_dir)
    return agg.turns_per_geo_window(
        e, country_col="geoip.geo.country_iso_code"
    ).orderBy("window_start", "country_iso_code")
