"""Format-agnostic transcripts sources: jsonl and csv round-trip through the
same pipeline as parquet."""

from __future__ import annotations

from logstash_filter_geoip_spark.config import GeoIPConfig
from logstash_filter_geoip_spark.functions.parse import parse_transcripts
from logstash_filter_geoip_spark.operators.enrich import enrich
from logstash_filter_geoip_spark.sources.geolite2 import load_dim
from logstash_filter_geoip_spark.sources.transcripts import (load_transcripts,
                                                             read_transcripts)

SF = "/root/testdata/sf0.001"


def _roundtrip(spark, tmp_path, fmt):
    t = load_transcripts(spark, SF)
    path = str(tmp_path / f"t_{fmt}")
    w = t.write.format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    w.save(path)
    back = read_transcripts(spark, path, fmt)
    assert back.count() == 1000
    assert [f.name for f in back.schema.fields] == \
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="City")
    e = enrich(parse_transcripts(back), load_dim(spark, "City"), cfg)
    hits = e.where("geoip.geo.city_name = 'Milton'").count()
    assert hits > 0
    return e


def test_jsonl_source(spark, tmp_path):
    _roundtrip(spark, tmp_path, "json")


def test_csv_source(spark, tmp_path):
    _roundtrip(spark, tmp_path, "csv")


def test_multimodal_decode_is_narrow(spark):
    """Decode must add NO shuffle: payload bytes never cross the network
    (scan splits are already byte-balanced)."""
    from logstash_filter_geoip_spark.operators.multimodal import (decode_media,
                                                                  synth_media)
    from logstash_filter_geoip_spark.plans.checks import physical_plan
    out = decode_media(synth_media(spark, "/root/testdata/sf0.001"))
    plan = physical_plan(out)
    assert "Exchange" not in plan, plan[:2000]
    assert out.count() == 500
