"""J3: enrich_via_distinct (the LRU-cache analogue) must be semantically
identical to the direct broadcast-join enrich — the lookup is a pure
function of the IP (geoip.rb:77-91)."""

from __future__ import annotations

from logstash_filter_geoip_spark.config import GeoIPConfig
from logstash_filter_geoip_spark.functions.parse import parse_transcripts
from logstash_filter_geoip_spark.operators.enrich import enrich, enrich_via_distinct
from logstash_filter_geoip_spark.sources.geolite2 import load_dim
from logstash_filter_geoip_spark.sources.transcripts import load_transcripts

SF = "/root/testdata/sf0.001"


def test_distinct_path_equals_direct(spark):
    parsed = parse_transcripts(load_transcripts(spark, SF))
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="City")
    dim = load_dim(spark, "City")

    cols = ["conv_id", "turn_idx", "tags", "geoip", "geoip_hit"]
    direct = enrich(parsed, dim, cfg).select(cols)
    via = enrich_via_distinct(parsed, dim, cfg).select(cols)

    assert via.count() == direct.count() == 1000
    assert direct.exceptAll(via).count() == 0
    assert via.exceptAll(direct).count() == 0
