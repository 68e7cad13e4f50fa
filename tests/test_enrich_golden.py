"""Golden-value enrich tests: every assertion row from the reference's
GeoIPFilterTest.java (57-254) re-checked through our engine, in both ECS and
legacy naming — the parity demanded by BASELINE.json north_star."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.config import GeoIPConfig
from logstash_filter_geoip_spark.operators.enrich import enrich
from logstash_filter_geoip_spark.sources.geolite2 import load_dim


def _one(spark, ip, database, ecs, fields=None):
    df = spark.createDataFrame([("c1", 0, ip)], ["conv_id", "turn_idx", "ip_str"])
    cfg = GeoIPConfig(source="ip_str", target="geoip", database=database,
                      ecs_compatibility=ecs, fields=fields)
    out = enrich(df, load_dim(spark, database), cfg)
    rows = out.collect()
    assert len(rows) == 1  # J2: no dup, no drop
    return rows[0]


@pytest.mark.parametrize("ecs", [True, False])
def test_city_milton(spark, ecs):
    # GeoIPFilterTest.java:57-81: 216.160.83.58
    r = _one(spark, "216.160.83.58", "City", ecs)
    g = r["geoip"]
    assert r["tags"] == []
    if ecs:
        geo = g["geo"]
        assert g["ip"] == "216.160.83.58"
        assert geo["city_name"] == "Milton"
        assert geo["continent_code"] == "NA"
        assert geo["country_name"] == "United States"
        assert geo["country_iso_code"] == "US"
        assert geo["postal_code"] == "98354"
        assert g["mmdb"]["dma_code"] == 819
        assert geo["region_name"] == "Washington"
        assert geo["region_iso_code"] == "US-WA"
        assert geo["timezone"] == "America/Los_Angeles"
        assert geo["location"]["lat"] == 47.2513
        assert geo["location"]["lon"] == -122.3149
        assert "country_code3" not in g.asDict()  # skipped in ECS
    else:
        assert g["ip"] == "216.160.83.58"
        assert g["city_name"] == "Milton"
        assert g["country_code2"] == "US"
        assert g["country_code3"] == "US"  # 2-letter ISO, GeoIPFilter.java:289-294
        assert g["region_code"] == "WA"   # legacy swap, GeoIPFilter.java:135-146
        assert "region_iso_code" not in g.asDict()
        assert g["dma_code"] == 819
        assert g["location"]["lat"] == 47.2513
        assert g["latitude"] == 47.2513 and g["longitude"] == -122.3149


@pytest.mark.parametrize("ecs", [True, False])
def test_asn_att(spark, ecs):
    # GeoIPFilterTest.java:143-163: 12.81.92.1 with NETWORK requested
    r = _one(spark, "12.81.92.1", "ASN", ecs,
             fields=["IP", "AUTONOMOUS_SYSTEM_NUMBER",
                     "AUTONOMOUS_SYSTEM_ORGANIZATION", "NETWORK"])
    g = r["geoip"]
    if ecs:
        assert g["ip"] == "12.81.92.1"
        assert g["as"]["number"] == 7018
        assert g["as"]["organization"]["name"] == "AT&T Services"
        assert g["ip_traits"]["network"] == "12.81.92.0/22"
    else:
        assert (g["ip"], g["asn"], g["as_org"], g["network"]) == \
            ("12.81.92.1", 7018, "AT&T Services", "12.81.92.0/22")


@pytest.mark.parametrize("ecs", [True, False])
def test_isp_telstra(spark, ecs):
    # GeoIPFilterTest.java:119-141: 1.128.0.1
    r = _one(spark, "1.128.0.1", "ISP", ecs)
    g = r["geoip"]
    if ecs:
        assert g["as"]["number"] == 1221
        assert g["as"]["organization"]["name"] == "Telstra Pty Ltd"
        assert g["mmdb"]["isp"] == "Telstra Internet"
        assert g["mmdb"]["organization"] == "Telstra Internet"
    else:
        assert (g["asn"], g["as_org"], g["isp"], g["organization"]) == \
            (1221, "Telstra Pty Ltd", "Telstra Internet", "Telstra Internet")


@pytest.mark.parametrize("ecs", [True, False])
def test_domain(spark, ecs):
    # GeoIPFilterTest.java:165-176: 1.2.0.1 → maxmind.com
    r = _one(spark, "1.2.0.1", "Domain", ecs)
    assert r["geoip"]["domain"] == "maxmind.com"


@pytest.mark.parametrize("ecs", [True, False])
def test_enterprise(spark, ecs):
    # GeoIPFilterTest.java:178-226: 74.209.24.1
    r = _one(spark, "74.209.24.1", "Enterprise", ecs,
             fields=["IP", "COUNTRY_CODE2", "COUNTRY_NAME", "CONTINENT_NAME",
                     "REGION_ISO_CODE", "REGION_NAME", "CITY_NAME", "TIMEZONE",
                     "LOCATION", "AUTONOMOUS_SYSTEM_NUMBER",
                     "AUTONOMOUS_SYSTEM_ORGANIZATION", "NETWORK",
                     "HOSTING_PROVIDER", "TOR_EXIT_NODE", "ANONYMOUS_VPN",
                     "ANONYMOUS", "PUBLIC_PROXY", "RESIDENTIAL_PROXY"])
    g = r["geoip"]
    if ecs:
        geo = g["geo"]
        assert g["ip"] == "74.209.24.1"
        assert geo["country_iso_code"] == "US"
        assert geo["country_name"] == "United States"
        assert geo["continent_name"] == "North America"
        assert geo["region_iso_code"] == "US-NY"
        assert geo["region_name"] == "New York"
        assert geo["city_name"] == "Chatham"
        assert geo["timezone"] == "America/New_York"
        assert geo["location"]["lat"] == 42.3478
        assert geo["location"]["lon"] == -73.5549
        assert g["as"]["number"] == 14671
        assert g["as"]["organization"]["name"] == "FairPoint Communications"
        t = g["ip_traits"]
        assert t["network"] == "74.209.16.0/20"
        assert all(t[k] is False for k in
                   ("hosting_provider", "tor_exit_node", "anonymous_vpn",
                    "anonymous", "public_proxy", "residential_proxy"))
    else:
        assert g["city_name"] == "Chatham" and g["asn"] == 14671
        assert g["network"] == "74.209.16.0/20"
        assert g["location"]["lat"] == 42.3478


@pytest.mark.parametrize("ecs", [True, False])
def test_anonymous_ip(spark, ecs):
    # GeoIPFilterTest.java:228-254: 81.2.69.1 → six true traits
    r = _one(spark, "81.2.69.1", "Anonymous-IP", ecs)
    g = r["geoip"]
    t = g["ip_traits"] if ecs else g
    assert all(t[k] is True for k in
               ("hosting_provider", "tor_exit_node", "anonymous_vpn",
                "anonymous", "public_proxy", "residential_proxy"))


def test_fields_projection(spark):
    # P7: only requested fields appear (geoip_ecs_spec.rb:89-141)
    r = _one(spark, "8.8.8.8", "City", True,
             fields=["CITY_NAME", "TIMEZONE"])
    g = r["geoip"].asDict(recursive=True)
    assert set(g.keys()) == {"geo"}
    assert set(g["geo"].keys()) == {"city_name", "timezone"}
    assert g["geo"]["timezone"] == "America/Chicago"


def test_row_count_preserved_and_unique(spark):
    """J1/J2 invariants: disjoint expanded ranges → exactly one output row
    per input row, hits match exactly one dim row."""
    from logstash_filter_geoip_spark.pipeline import enriched_transcripts
    e = enriched_transcripts(spark, "/root/testdata/sf0.001")
    assert e.count() == 1000
    dup = (e.groupBy("conv_id", "turn_idx").count()
            .where(F.col("count") > 1).count())
    assert dup == 0
