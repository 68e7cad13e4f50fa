"""J3: enrich_via_distinct (the LRU-cache analogue) must be semantically
identical to the direct broadcast-join enrich — the lookup is a pure
function of the IP (geoip.rb:77-91)."""

from __future__ import annotations

from logstash_filter_geoip_spark.config import GeoIPConfig
from logstash_filter_geoip_spark.functions.parse import parse_transcripts
from logstash_filter_geoip_spark.operators.enrich import enrich, enrich_via_distinct
from logstash_filter_geoip_spark.sources.geolite2 import load_dim, load_dim_v6
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


def test_distinct_path_equals_direct_unified_v6(spark):
    """ADVICE r2: the distinct path must carry the v6 dim through — with the
    family-agnostic ip_any source (the pipeline default) v6 rows enrich
    identically to enrich(); before the dim_v6 passthrough every v6 row was
    a silent guaranteed miss on this path."""
    from pyspark.sql import functions as F
    parsed = parse_transcripts(load_transcripts(spark, SF))
    cfg = GeoIPConfig(source="ip_any", target="geoip", database="City")
    dim, dim_v6 = load_dim(spark, "City"), load_dim_v6(spark, "City")

    cols = ["conv_id", "turn_idx", "tags", "geoip", "geoip_hit"]
    direct = enrich(parsed, dim, cfg, dim_v6=dim_v6).select(cols)
    via = enrich_via_distinct(parsed, dim, cfg, dim_v6=dim_v6).select(cols)

    assert via.count() == direct.count() == 1000
    assert direct.exceptAll(via).count() == 0
    assert via.exceptAll(direct).count() == 0
    # the corpus v6 City literal actually HITS through the distinct path
    v6_hits = (via.where(F.col("geoip.ip") == "2607:f0d0:1002:51:0:0:0:4")
                  .where(F.col("geoip_hit")).count())
    assert v6_hits > 0


def test_distinct_path_merges_pre_existing_target(spark):
    """ADVICE r1: a pre-existing target struct must not raise
    AMBIGUOUS_REFERENCE and must merge with F9 semantics, identically to the
    direct enrich() path."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

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
    df = spark.createDataFrame(rows, schema)
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="City")
    dim = load_dim(spark, "City")

    direct = {r["conv_id"]: r for r in enrich(df, dim, cfg).collect()}
    via = {r["conv_id"]: r for r in enrich_via_distinct(df, dim, cfg).collect()}
    for k in ("hit", "miss", "absent"):
        assert via[k]["geoip"] == direct[k]["geoip"], k
        assert via[k]["tags"] == direct[k]["tags"], k
    assert via["hit"]["geoip"]["custom_note"] == "keep-me"
    assert via["hit"]["geoip"]["ip"] == "216.160.83.58"
    assert via["miss"]["geoip"]["ip"] == "pre-ip"
    assert via["absent"]["geoip"]["ip"] == "pre-ip"


def test_distinct_path_unhealthy_delegates(spark):
    """Review r5: unhealthy config must not crash (the inner enrich used to
    omit geoip_hit/ip_u32) and must emit the EXPIRED tag, identical to the
    direct path."""
    parsed = parse_transcripts(load_transcripts(spark, SF))
    cfg = GeoIPConfig(source="ip_str", target="geoip", database="City",
                      healthy=False)
    dim = load_dim(spark, "City")
    cols = ["conv_id", "turn_idx", "tags", "geoip", "geoip_hit"]
    direct = enrich(parsed, dim, cfg).select(cols)
    via = enrich_via_distinct(parsed, dim, cfg).select(cols)
    assert via.count() == direct.count() == 1000
    assert direct.exceptAll(via).count() == 0
    assert via.exceptAll(direct).count() == 0


def test_chained_enrich_no_duplicate_columns(spark):
    """Review r5: the standard City-then-ASN stack must replace the
    diagnostic columns, not duplicate them — on BOTH enrich paths."""
    from collections import Counter
    parsed = parse_transcripts(load_transcripts(spark, SF))
    city = GeoIPConfig(source="ip_str", target="geoip", database="City")
    asn = GeoIPConfig(source="ip_str", target="asn_info", database="ASN")
    e1 = enrich(parsed, load_dim(spark, "City"), city)
    for second in (enrich, enrich_via_distinct):
        e2 = second(e1, load_dim(spark, "ASN"), asn)
        dupes = [c for c, k in Counter(e2.columns).items() if k > 1]
        assert not dupes, (second.__name__, dupes)
        # both targets populated for a row that hits both DBs
        r = e2.where("ip_str = '216.160.83.58'").limit(1).collect()
        if r:
            assert r[0]["geoip"] is not None and r[0]["asn_info"] is not None
        e2.write.format("noop").mode("overwrite").save()  # writable schema
