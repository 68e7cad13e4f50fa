"""F9 target-merge semantics + the IPv6 enrich path."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from logstash_filter_geoip_spark.config import GeoIPConfig
from logstash_filter_geoip_spark.operators.enrich import enrich
from logstash_filter_geoip_spark.operators.enrich_v6 import (
    enrich_ipv6_country, load_v6_country_dim, v6_probe_set)
from logstash_filter_geoip_spark.sources.geolite2 import load_dim


def _pre_target_df(spark):
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ip_str", T.StringType()),
        T.StructField("geoip", T.StructType([
            T.StructField("custom_note", T.StringType()),
            T.StructField("ip", T.StringType()),
        ])),
    ])
    rows = [
        ("hit", 0, "216.160.83.58", Row(custom_note="keep-me", ip="pre-ip")),
        ("miss", 0, "0.0.0.0", Row(custom_note="keep-me", ip="pre-ip")),
        ("absent", 0, None, Row(custom_note="keep-me", ip="pre-ip")),
    ]
    return spark.createDataFrame(rows, schema)


def test_target_merge_semantics(spark):
    # parity: GeoIPFilter.java:214-232 + CHANGELOG #98 — merge under target,
    # pre-existing content preserved
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="City",
                      ecs_compatibility=True)
    out = {r["conv_id"]: r for r in
           enrich(_pre_target_df(spark), load_dim(spark, "City"), cfg).collect()}

    hit = out["hit"]["geoip"]
    assert hit["custom_note"] == "keep-me"        # pre-existing survives
    assert hit["ip"] == "216.160.83.58"           # enrich overwrites on hit
    assert hit["geo"]["city_name"] == "Milton"    # new nested fields added

    miss = out["miss"]["geoip"]
    assert miss["custom_note"] == "keep-me"       # miss never clobbers
    assert miss["ip"] == "pre-ip"                 # null enrich → keep existing
    assert miss["geo"]["city_name"] is None

    absent = out["absent"]["geoip"]
    assert absent["custom_note"] == "keep-me"     # absent source → untouched
    assert absent["ip"] == "pre-ip"


def test_enrich_ipv6_country(spark):
    dim = load_v6_country_dim(spark)
    rows = {r["probe_id"]: r for r in
            enrich_ipv6_country(v6_probe_set(spark), dim).collect()}

    # golden: 2a02:d5c0:: → ES / Spain / Europe (GeoIPFilterTest.java:99-117)
    g = rows["p1"]
    assert (g["country_iso_code"], g["country_name"], g["continent_name"]) == \
        ("ES", "Spain", "Europe")
    assert g["ip"] == "2a02:d5c0:0:0:0:0:0:0"
    assert g["tags"] == []

    assert rows["p2"]["country_iso_code"] == "ES"       # inside the /29
    assert rows["p4"]["country_iso_code"] == "US"       # filler /32 hit
    for miss in ("p3", "p5", "p6"):
        assert rows[miss]["geoip_hit"] is False
        assert rows[miss]["tags"] == ["_geoip_lookup_failure"]
        assert rows[miss]["country_iso_code"] is None


def test_v6_row_count_preserved(spark):
    dim = load_v6_country_dim(spark)
    assert enrich_ipv6_country(v6_probe_set(spark), dim).count() == 6
