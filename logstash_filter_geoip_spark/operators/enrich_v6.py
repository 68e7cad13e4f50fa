"""IPv6 enrich path: 128-bit keys as (hi, lo) signed-64 pairs with a
bucketed broadcast range join — the v6 counterpart of operators/enrich.py.

The reference accepts IPv4 AND IPv6 (InetAddress.getByName,
GeoIPFilter.java:172); its IPv6 golden is the Country lookup
2a02:d5c0:: → ES / Spain / Europe (GeoIPFilterTest.java:99-117). 128-bit
keys don't fit LongType (SURVEY.md §7.4.3), so keys are (ip_hi, ip_lo) with
the sign bit flipped — signed lexicographic order == unsigned 128-bit order.

Join shape mirrors the v4 path: equi-key on the top 16 bits of the unsigned
hi word (dim rows replicated per covered bucket) + lexicographic range
residual → BroadcastHashJoin. Key derivation is the one place Python is
allowed (Arrow-vectorized ipv6_to_key pandas UDF, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import GeoIPConfig
from ..functions.ipkeys import cidr_v6_to_range, ipv6_canonical, ipv6_to_key

_SIGN_BIT = -(1 << 63)  # long with only the sign bit set

V6_COUNTRY_SCHEMA = T.StructType([
    T.StructField("network", T.StringType()),
    T.StructField("start_hi", T.LongType()),
    T.StructField("start_lo", T.LongType()),
    T.StructField("end_hi", T.LongType()),
    T.StructField("end_lo", T.LongType()),
    T.StructField("country_iso_code", T.StringType()),
    T.StructField("country_name", T.StringType()),
    T.StructField("continent_name", T.StringType()),
])

# GeoIPFilterTest.java:99-117 golden + filler ranges
GOLDEN_COUNTRY_V6_ROWS = [
    ("2a02:d5c0::/29", "ES", "Spain", "Europe"),
    ("2001:4860::/32", "US", "United States", "North America"),
    ("2400:cb00::/32", "AU", "Australia", "Oceania"),
]


def load_v6_country_dim(spark: SparkSession) -> DataFrame:
    rows = []
    for net, iso, name, cont in GOLDEN_COUNTRY_V6_ROWS:
        s_hi, s_lo, e_hi, e_lo = cidr_v6_to_range(net)
        rows.append((net, s_hi, s_lo, e_hi, e_lo, iso, name, cont))
    return spark.createDataFrame(rows, V6_COUNTRY_SCHEMA)


def _bucket_hi(hi: Column) -> Column:
    """Top 16 bits of the unsigned hi word from the sign-flipped long."""
    return F.shiftrightunsigned(hi.bitwiseXOR(F.lit(_SIGN_BIT)), 48)


def _explode_v6_buckets(dim: DataFrame) -> DataFrame:
    return dim.withColumn(
        "prefix_bucket",
        F.explode(F.sequence(_bucket_hi(F.col("start_hi")),
                             _bucket_hi(F.col("end_hi")))))


def enrich_ipv6_country(df: DataFrame, dim: DataFrame,
                        config: GeoIPConfig | None = None,
                        source: str = "ip6_str",
                        tags_col: str = "tags") -> DataFrame:
    """Left-join v6 addresses in `source` against the v6 Country dim.

    Output: df + canonical `ip`, flat country columns, `geoip_hit`, tags.
    Canonicalization parity: exploded form (geoip_ecs_spec.rb:144-159).
    """
    config = config or GeoIPConfig(source=source, target="geoip",
                                   database="Country")
    ip = F.col(source)
    keyed = df.withColumn("__k", ipv6_to_key(ip)) \
              .withColumn("__hi", F.col("__k.ip_hi")) \
              .withColumn("__lo", F.col("__k.ip_lo")) \
              .withColumn("__bucket", _bucket_hi(F.col("__k.ip_hi")))

    dim_b = _explode_v6_buckets(dim).select(
        "prefix_bucket",
        *[F.col(c).alias(f"__d_{c}") for c in dim.columns])

    hi, lo = F.col("__hi"), F.col("__lo")
    ge_start = (hi > F.col("__d_start_hi")) | (
        (hi == F.col("__d_start_hi")) & (lo >= F.col("__d_start_lo")))
    le_end = (hi < F.col("__d_end_hi")) | (
        (hi == F.col("__d_end_hi")) & (lo <= F.col("__d_end_lo")))
    cond = (F.col("__bucket") == F.col("prefix_bucket")) & ge_start & le_end

    joined = keyed.join(F.broadcast(dim_b), cond, "left")
    hit = F.col("__d_start_hi").isNotNull()

    existing = (F.col(tags_col) if tags_col in df.columns
                else F.array().cast(T.ArrayType(T.StringType())))
    fail_tags = F.array(*[F.lit(t) for t in config.tag_on_failure])
    tags = F.when(~F.coalesce(hit, F.lit(False)),
                  F.array_union(F.coalesce(existing, F.array().cast(
                      T.ArrayType(T.StringType()))), fail_tags)
                  ).otherwise(F.coalesce(existing, F.array().cast(
                      T.ArrayType(T.StringType()))))

    keep = [c for c in df.columns if c != tags_col]
    return joined.select(
        *keep,
        F.when(hit, ipv6_canonical(ip)).alias("ip"),
        F.when(hit, F.col("__d_country_iso_code")).alias("country_iso_code"),
        F.when(hit, F.col("__d_country_name")).alias("country_name"),
        F.when(hit, F.col("__d_continent_name")).alias("continent_name"),
        hit.alias("geoip_hit"),
        tags.alias(tags_col),
    )


def v6_probe_set(spark: SparkSession) -> DataFrame:
    """Deterministic IPv6 probe rows: goldens, canonicalization case, misses."""
    rows = [
        ("p1", "2a02:d5c0:0:0:0:0:0:0"),      # golden hit (Spain)
        ("p2", "2a02:d5c7:ffff::1"),          # inside /29 (d5c0-d5c7) → hit
        ("p3", "2607:f0d0:1002:51::4"),       # canonicalization case, miss
        ("p4", "2001:4860:4860::8888"),       # hit (filler /32)
        ("p5", "::1"),                        # loopback miss
        ("p6", "not-an-ip"),                  # parse failure
    ]
    return spark.createDataFrame(rows, ["probe_id", "ip6_str"])


def _transcripts_v6(spark, sf_dir):
    from ..functions.parse import parse_transcripts
    from ..sources.transcripts import load_transcripts
    parsed = parse_transcripts(load_transcripts(spark, sf_dir))
    return enrich_ipv6_country(parsed, load_v6_country_dim(spark),
                               source="ip6_str").select(
        "conv_id", "turn_idx", "ip", "country_iso_code", "country_name",
        "continent_name", "geoip_hit")


def queries():
    return {
        # rows-only: DuckDB has no 128-bit IPv6 key primitive to mirror
        "enrich_country_v6": _transcripts_v6,
    }
