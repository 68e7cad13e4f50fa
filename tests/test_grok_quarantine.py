"""Grok compiler + dim quarantine + conversation features unit tests."""

from __future__ import annotations

import pytest

from logstash_filter_geoip_spark.functions.grok import (GrokError, compile_grok,
                                                        grok_extract)
from logstash_filter_geoip_spark.sources.geolite2 import load_dim, split_malformed


def test_compile_grok_basic():
    regex, fields = compile_grok("at %{IPV4:ip} code %{ERRORCODE:err}")
    assert fields == ["ip", "err"]
    assert regex.startswith("at\\ (") or regex.startswith("at (")
    import re
    m = re.search(regex, "at 1.2.3.4 code E500")
    assert m and m.group(1) == "1.2.3.4" and m.group(2) == "E500"


def test_compile_grok_unnamed_and_literal_escape():
    regex, fields = compile_grok("[%{LOGLEVEL}] %{WORD:w}")
    assert fields == ["w"]
    import re
    m = re.search(regex, "[ERROR] boom")
    assert m and m.group(1) == "boom"
    assert re.search(regex, "xERRORx boom") is None  # brackets escaped


def test_compile_grok_errors():
    with pytest.raises(GrokError, match="unknown grok pattern"):
        compile_grok("%{NOPE:x}")
    with pytest.raises(GrokError, match="duplicate grok field"):
        compile_grok("%{WORD:x} %{WORD:x}")


def test_grok_extract_df(spark):
    df = spark.createDataFrame(
        [("client at 216.160.83.58 reported E403 via search",),
         ("nothing here",)], ["text"])
    out = grok_extract(
        df, "at %{IPV4:ip} reported %{ERRORCODE:err} via %{TOOLNAME:tn}"
    ).collect()
    assert (out[0]["ip"], out[0]["err"], out[0]["tn"]) == \
        ("216.160.83.58", "E403", "search")
    assert out[1]["ip"] is None and out[1]["err"] is None


def test_split_malformed_quarantine(spark):
    dim = load_dim(spark, "ASN")
    schema = dim.schema
    bad_rows = [("bad/24", 100, 50, 1, "x"),       # start > end
                ("bad2/24", None, 5, 2, "y"),      # null start
                ("bad3/24", -5, 5, 3, "z"),        # negative
                ("bad4/24", 0, 2**40, 4, "w")]     # beyond uint32
    mixed = dim.unionByName(spark.createDataFrame(bad_rows, schema))
    good, quarantined = split_malformed(mixed)
    assert quarantined.count() == 4
    assert good.count() == dim.count()
    # the pipeline proceeds on the good subset — never throws (M3)
    from logstash_filter_geoip_spark.config import GeoIPConfig
    from logstash_filter_geoip_spark.operators.enrich import enrich
    probe = spark.createDataFrame([("c", 0, "8.8.8.8")],
                                  ["conv_id", "turn_idx", "ip_str"])
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="ASN")
    row = enrich(probe, good, cfg).collect()[0]
    assert row["geoip"]["as"]["number"] == 15169
