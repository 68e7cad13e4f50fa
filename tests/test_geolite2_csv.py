"""GeoLite2-CSV ingestion: the published CSV layout loads into our dim
schema, malformed CIDRs quarantine, and a CSV-loaded dim enriches to the
same goldens as the built-in tables."""

from __future__ import annotations

import os

from logstash_filter_geoip_spark.config import GeoIPConfig
from logstash_filter_geoip_spark.operators.enrich import enrich
from logstash_filter_geoip_spark.sources.geolite2 import split_malformed
from logstash_filter_geoip_spark.sources.geolite2_csv import (load_asn_csv,
                                                              load_city_csv)

DATA = os.path.join(os.path.dirname(__file__), "..",
                    "logstash_filter_geoip_spark", "data")


def test_city_csv_roundtrip_golden(spark):
    dim = load_city_csv(spark,
                        os.path.join(DATA, "sample_city_blocks.csv"),
                        os.path.join(DATA, "sample_city_locations.csv"))
    good, quarantined = split_malformed(dim)
    assert quarantined.count() == 1  # the garbage CIDR row
    assert good.count() == 3

    probe = spark.createDataFrame([("c", 0, "216.160.83.58")],
                                  ["conv_id", "turn_idx", "ip_str"])
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="City")
    g = enrich(probe, good, cfg).collect()[0]["geoip"]
    assert g["geo"]["city_name"] == "Milton"
    assert g["geo"]["region_iso_code"] == "US-WA"
    assert g["mmdb"]["dma_code"] == 819
    assert g["geo"]["location"]["lat"] == 47.2513


def test_asn_csv_roundtrip_golden(spark):
    dim = load_asn_csv(spark, os.path.join(DATA, "sample_asn_blocks.csv"))
    assert split_malformed(dim)[1].count() == 0
    probe = spark.createDataFrame([("c", 0, "12.81.92.1")],
                                  ["conv_id", "turn_idx", "ip_str"])
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="ASN")
    g = enrich(probe, dim, cfg).collect()[0]["geoip"]
    assert g["as"]["number"] == 7018
    assert g["as"]["organization"]["name"] == "AT&T Services"
