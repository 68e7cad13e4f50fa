from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions import ipkeys


def test_cidr_to_range():
    assert ipkeys.cidr_to_range("12.81.92.0/22") == \
        (12 * 2**24 + 81 * 2**16 + 92 * 256, 12 * 2**24 + 81 * 2**16 + 95 * 256 + 255)
    assert ipkeys.cidr_to_range("0.0.0.0/0") == (0, 2**32 - 1)
    s, e = ipkeys.cidr_to_range("216.160.83.56/29")
    assert e - s == 7


def test_ipv4_uint32_roundtrip(spark):
    df = spark.createDataFrame(
        [("216.160.83.58",), ("0.0.0.0",), ("255.255.255.255",),
         ("999.1.2.3",), (None,), ("1.2.3",), ("a.b.c.d",),
         ("1.2.3.4.5",)], ["ip"])
    out = df.select(
        ipkeys.ipv4_to_uint32(F.col("ip")).alias("u"),
        ipkeys.uint32_to_ipv4(ipkeys.ipv4_to_uint32(F.col("ip"))).alias("rt"),
    ).collect()
    assert out[0]["u"] == 216 * 2**24 + 160 * 2**16 + 83 * 256 + 58
    assert out[0]["rt"] == "216.160.83.58"
    assert out[1]["u"] == 0 and out[2]["u"] == 2**32 - 1
    assert out[3]["u"] is None  # invalid octet → parse failure (P4)
    assert out[4]["u"] is None
    # malformed shapes never throw, they null out (P4/P5 robustness)
    assert out[5]["u"] is None and out[6]["u"] is None and out[7]["u"] is None


def test_bucket_replication(spark):
    from logstash_filter_geoip_spark.sources.geolite2 import load_dim
    dim = load_dim(spark, "ASN")
    exploded = ipkeys.explode_buckets(dim)
    counts = {r["network"]: r["n"] for r in exploded.groupBy("network")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["1.128.0.0/11"] == 32  # a /11 covers 2^(16-11)=32 /16 buckets
    assert counts["8.8.8.0/24"] == 1
    assert counts["12.81.92.0/22"] == 1


def test_ipv6_key_and_canonical(spark):
    df = spark.createDataFrame(
        [("2607:f0d0:1002:51::4",), ("::1",), ("garbage",)], ["ip"])
    rows = df.select(
        ipkeys.ipv6_to_key(F.col("ip")).alias("k"),
        ipkeys.ipv6_canonical(F.col("ip")).alias("c"),
    ).collect()
    # canonical exploded form parity: spec/filters/geoip_ecs_spec.rb:144-159
    assert rows[0]["c"] == "2607:f0d0:1002:51:0:0:0:4"
    assert rows[1]["c"] == "0:0:0:0:0:0:0:1"
    assert rows[2]["c"] is None and rows[2]["k"]["ip_hi"] is None
    # ordering: signed (hi, lo) pairs sort like unsigned 128-bit ints
    k0, k1 = rows[0]["k"], rows[1]["k"]
    assert (k1["ip_hi"], k1["ip_lo"]) < (k0["ip_hi"], k0["ip_lo"])


def test_ipv6_key_cols_matches_udf(spark):
    """The codegen (hi, lo) derivation must agree with the ipaddress-backed
    pandas UDF on every supported textual form, including batches that mix
    valid and invalid values (the float64-coercion regression trap)."""
    import ipaddress
    import random

    from pyspark.sql import functions as F
    from logstash_filter_geoip_spark.functions.ipkeys import (ipv6_key_cols,
                                                              ipv6_to_key)

    rng = random.Random(42)
    def rand_addr():
        groups = [format(rng.randrange(0x10000), "x") for _ in range(8)]
        if rng.random() < 0.5:  # compress a random run
            i = rng.randrange(1, 7)
            j = rng.randrange(i + 1, 8)
            return ":".join(groups[:i]) + "::" + ":".join(groups[j:])
        return ":".join(groups)

    cases = ([rand_addr() for _ in range(200)]
             + ["::", "::1", "2a02:d5c0::", "2607:f0d0:1002:51::4",
                "2a02:d5c0:4:5::f", "fe80::1", "0:0:0:0:0:0:0:0",
                "1:::2", "not-an-ip:", ":1:2:3:4:5:6:7", "1:2", "",
                "12345::", "g::1", None, "8.8.8.8"])
    df = spark.createDataFrame([(c,) for c in cases], ["ip"])
    hi, lo = ipv6_key_cols(F.col("ip"))
    out = df.select("ip", hi.alias("chi"), lo.alias("clo"),
                    ipv6_to_key(F.col("ip")).alias("k")).collect()
    for r in out:
        want_hi, want_lo = (r["k"]["ip_hi"], r["k"]["ip_lo"]) if r["k"] else (None, None)
        assert (r["chi"], r["clo"]) == (want_hi, want_lo), r["ip"]
        if r["ip"] is not None:
            try:
                n = int(ipaddress.IPv6Address(r["ip"]))
                assert r["chi"] == ((n >> 64) & (2**64 - 1)) - 2**63, r["ip"]
            except ValueError:
                assert r["chi"] is None, r["ip"]


def test_rewrite_embedded_quad(spark):
    """VERDICT r3 #5: any v6 literal with a trailing dotted quad rewrites to
    pure colon-hex (Java's getByName accepts every embedded-quad form,
    GeoIPFilter.java:172); invalid quads pass through unchanged and then
    fail colon-hex validation — the same observable as Java's parse
    failure."""
    cases = [
        ("::ffff:1.2.3.4", "::ffff:102:304"),
        ("64:ff9b::192.0.2.33", "64:ff9b::C000:221"),        # NAT64
        ("::1.2.3.4", "::102:304"),                          # v4-compatible
        ("1:2:3:4:5:6:7.8.9.10", "1:2:3:4:5:6:708:90A"),     # uncompressed
        ("0:0::ffff:216.160.83.58", "0:0::ffff:D8A0:533A"),
        ("::ffff:0.0.0.0", "::ffff:0:0"),
        ("::ffff:999.1.1.1", "::ffff:999.1.1.1"),   # octet >255: untouched
        ("::ffff:01.2.3.4", "::ffff:01.2.3.4"),     # leading zero: untouched
        ("::ffff:1.2.3", "::ffff:1.2.3"),           # 3 octets: untouched
        ("1.2.3.4", "1.2.3.4"),                     # no colon prefix
        ("2a02:d5c0::1", "2a02:d5c0::1"),           # dot-free passthrough
        ("garbage", "garbage"),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["ip"])
    got = [r["o"] for r in
           df.select(ipkeys.rewrite_embedded_quad(F.col("ip")).alias("o")).collect()]
    assert got == [c[1] for c in cases]


def test_ipv4_mapped_u32(spark):
    """Key-level mapped detection (ADVICE r3): EVERY spelling whose parsed
    bytes are ::ffff:a.b.c.d yields the quad's uint32 — including
    zero-compression variants and the pure-hex form — mirroring Java's
    convertFromIPv4MappedAddress on the bytes; v4-compatible and near-miss
    prefixes stay null (remain Inet6Address in Java)."""
    u_1234 = 1 * 2**24 + 2 * 2**16 + 3 * 256 + 4
    cases = [
        ("::ffff:1.2.3.4", u_1234),
        ("::FFFF:1.2.3.4", u_1234),
        ("0:0:0:0:0:ffff:1.2.3.4", u_1234),
        ("0::ffff:1.2.3.4", u_1234),            # ADVICE spellings
        ("::0:ffff:1.2.3.4", u_1234),
        ("0:0::ffff:1.2.3.4", u_1234),
        ("::ffff:102:304", u_1234),             # pure-hex mapped form
        ("::ffff:255.255.255.255", 2**32 - 1),
        ("::1.2.3.4", None),                    # v4-compatible, NOT mapped
        ("::fffe:1.2.3.4", None),
        ("64:ff9b::1.2.3.4", None),             # NAT64 → v6 leg
        ("::ffff:999.1.1.1", None),             # invalid octet → parse fail
        ("2a02:d5c0::1", None),
        ("garbage", None),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["ip"])
    hi, lo = ipkeys.ipv6_key_cols(F.col("ip"))
    out = df.select(
        ipkeys.ipv4_mapped_u32(hi, lo).alias("u"),
        ipkeys.uint32_to_ipv4(ipkeys.ipv4_mapped_u32(hi, lo)).alias("q"),
    ).collect()
    assert [r["u"] for r in out] == [c[1] for c in cases]
    assert out[0]["q"] == "1.2.3.4"  # canonical Inet4Address.getHostAddress
