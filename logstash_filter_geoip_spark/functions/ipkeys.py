"""IP key encoding: dotted-quad <-> uint32 Column expressions, CIDR range
expansion, /16 bucket replication, and the IPv6 128-bit (hi, lo) pandas UDF.

Design (SURVEY.md §2.3 J1, §7.5): the reference's longest-prefix-match mmdb
trie walk (GeoIPFilter.java:173-197) becomes a broadcast *bucketed* range
join. CIDRs expand to disjoint inclusive [net_start, net_end] uint32 ranges;
each dimension row is replicated once per /16 bucket it covers, so the probe
side joins on an equi-key (ip_u32 >> 16) and Catalyst plans a
BroadcastHashJoin instead of a BroadcastNestedLoopJoin. All hot-path
expressions are built-in Column functions (whole-stage codegen); the only
Python is Arrow-vectorized (IPv6 normalization).
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_BITS = 16
BUCKET_SIZE = 1 << BUCKET_BITS  # 65536


def ipv4_to_uint32(ip: Column) -> Column:
    """Dotted-quad string -> uint32 as LongType; null for invalid octets.

    Pure Column arithmetic (no UDF). Assumes `ip` matches the IPv4 regex
    (digits and dots only) — octet range is validated here, so '999.0.0.1'
    yields null (the reference's InetAddress parse failure,
    GeoIPFilter.java:172,198-199).
    """
    parts = F.split(ip, r"\.")
    # F.get (not getItem): under ANSI, getItem throws on short arrays —
    # '1.2.3' must yield null, not an exception (found by property test).
    # try_cast: ANSI cast throws on non-numeric segments ('a.b.c.d').
    octets = [F.get(parts, i).try_cast("long") for i in range(4)]
    valid = (F.size(parts) == 4)
    for o in octets:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    value = (octets[0] * F.lit(16777216) + octets[1] * F.lit(65536)
             + octets[2] * F.lit(256) + octets[3])
    return F.when(ip.isNotNull() & valid, value)


def uint32_to_ipv4(u: Column) -> Column:
    """uint32 -> canonical dotted-quad string (F5 normalization,
    GeoIPFilter.java:296 — `ipAddress.getHostAddress()`)."""
    return F.concat_ws(
        ".",
        (u / F.lit(16777216)).cast("long") % 256,
        (u / F.lit(65536)).cast("long") % 256,
        (u / F.lit(256)).cast("long") % 256,
        u % 256,
    )


def bucket_of(ip_u32: Column) -> Column:
    """Fixed-prefix bucket for the equi-join key: ip_u32 >> 16."""
    return F.shiftrightunsigned(ip_u32.cast("long"), BUCKET_BITS)


def cidr_to_range(network: str) -> tuple[int, int]:
    """'12.81.92.0/22' -> inclusive (net_start, net_end) uint32 bounds.

    Driver-side dimension prep (runs once over thousands-of-rows dim data,
    never on the fact table)."""
    net = ipaddress.ip_network(network, strict=False)
    if net.version != 4:
        raise ValueError(f"ipv4 CIDR expected, got {network}")
    return int(net.network_address), int(net.broadcast_address)


def _u64_to_signed(v: int) -> int:
    """Unsigned 64-bit → signed long with flipped sign bit, so signed
    ordering matches unsigned (same transform as ipv6_to_key)."""
    return (v & 0xFFFFFFFFFFFFFFFF) - (1 << 63)


def cidr_v6_to_range(network: str) -> tuple[int, int, int, int]:
    """IPv6 CIDR -> (start_hi, start_lo, end_hi, end_lo) signed-64 pairs,
    lexicographically comparable against ipv6_to_key output."""
    net = ipaddress.ip_network(network, strict=False)
    if net.version != 6:
        raise ValueError(f"ipv6 CIDR expected, got {network}")
    s, e = int(net.network_address), int(net.broadcast_address)
    return (_u64_to_signed(s >> 64), _u64_to_signed(s),
            _u64_to_signed(e >> 64), _u64_to_signed(e))


def explode_buckets(dim, net_start: str = "net_start", net_end: str = "net_end"):
    """Replicate each dimension row once per /16 bucket its range covers.

    A /8 covers 256 buckets; a /24 covers 1. Ranges are disjoint (mmdb trie
    property after expansion), so a probe-side IP matches at most one row.
    """
    return dim.withColumn(
        "prefix_bucket",
        F.explode(F.sequence(
            F.shiftrightunsigned(F.col(net_start), BUCKET_BITS),
            F.shiftrightunsigned(F.col(net_end), BUCKET_BITS),
        )),
    )


@F.pandas_udf(T.StructType([
    T.StructField("ip_hi", T.LongType()),
    T.StructField("ip_lo", T.LongType()),
]))
def ipv6_to_key(ip: pd.Series) -> pd.DataFrame:
    """IPv6 string -> (hi, lo) signed-64 pair for lexicographic range compare.

    THE enrich hot-path key derivation (r5 — see operators/enrich.py for
    the measurement that put the Arrow barrier here). `ipaddress` accepts
    exactly Java InetAddress's textual grammar: '::' compression, embedded
    dotted quads ('::ffff:1.2.3.4', NAT64, uncompressed), mapped spellings
    — and rejects the same malformed forms (leading-zero octets included).
    128-bit keys don't fit LongType (SURVEY.md §7.4.3); we split into two
    longs with the sign bit flipped so that signed (hi, lo) ordering matches
    unsigned 128-bit ordering. Arrow-vectorized; never called per-row from
    the driver. Invalid addresses map to (null, null).
    """
    his, los = [], []
    for v in ip:
        try:
            n = int(ipaddress.IPv6Address(v))
            his.append(((n >> 64) & 0xFFFFFFFFFFFFFFFF) - (1 << 63))
            los.append((n & 0xFFFFFFFFFFFFFFFF) - (1 << 63))
        except (ipaddress.AddressValueError, ValueError, TypeError):
            his.append(None)
            los.append(None)
    # nullable Int64, NEVER the default dtype: a batch mixing ints and None
    # would coerce to float64 and silently round 64-bit keys to 53-bit
    # mantissa precision (observed: low 16 bits of every key zeroed on
    # full-table batches while filtered all-valid batches stayed exact)
    return pd.DataFrame({"ip_hi": pd.array(his, dtype="Int64"),
                         "ip_lo": pd.array(los, dtype="Int64")})


def ipv6_key_lpm_udf(bc):
    """Factory: Arrow UDF that parses an IPv6 literal into the (hi, lo)
    signed-64 key AND resolves its longest-prefix-match dimension row index
    in the same vectorized pass — the v6 ``index`` lookup mode of
    ``operators.enrich.enrich`` (the scale path for DENSE dims).

    Why: the bucketed range join's probe cost is linear in rows-per-bucket.
    The vendored test .mmdb dims already put 200 (City) to 1,914 (ISP) rows
    in one hi-word /16 bucket — every probe in that hextet evaluates that
    many (hi, lo) residuals inside the BroadcastHashJoin; a full production
    GeoLite2 (millions of networks) makes the hot-bucket scan the dominant
    enrich cost. Here the match is a binary search (np.searchsorted,
    O(log n)) over the broadcast sorted range arrays, inside the
    ArrowEvalPython barrier the plan already pays for key parsing — the
    join then probes on the exact row index (tiny non-replicated build
    side, zero residual). This is the honest Spark form of the reference's
    RAM-resident mmdb binary tree (GeoIPFilter.java:173-197: every worker
    walks an in-memory trie).

    ``bc`` is a SparkContext.broadcast of dict(start_hi, start_lo, end_hi,
    end_lo) int64 numpy arrays sorted lexicographically by (start_hi,
    start_lo) — the sign-flipped encoding (ipv6_to_key's) makes signed
    int64 order == unsigned 128-bit order, so numpy comparisons are exact.
    Ranges must be DISJOINT (the mmdb trie property; validate_dim enforces
    well-formedness) — LPM then reduces to "last start <= probe, probe <=
    its end". The back-walk over equal-``hi`` starts is vectorized and
    bounded by the largest same-hi group (ranges narrower than /64 sharing
    a hi word — rare in real files). Invalid literals and non-matches
    yield NULL dim_idx (a NULL equi-key never matches in the hash join).
    """
    import numpy as np

    @F.pandas_udf(T.StructType([
        T.StructField("ip_hi", T.LongType()),
        T.StructField("ip_lo", T.LongType()),
        T.StructField("dim_idx", T.LongType()),
    ]))
    def ipv6_key_lpm(ip: pd.Series) -> pd.DataFrame:
        n = len(ip)
        hi = np.zeros(n, np.int64)
        lo = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, v in enumerate(ip):
            try:
                x = int(ipaddress.IPv6Address(v))
                hi[i] = ((x >> 64) & 0xFFFFFFFFFFFFFFFF) - (1 << 63)
                lo[i] = (x & 0xFFFFFFFFFFFFFFFF) - (1 << 63)
                ok[i] = True
            except (ipaddress.AddressValueError, ValueError, TypeError):
                pass
        d = bc.value
        s_hi, s_lo = d["start_hi"], d["start_lo"]
        e_hi, e_lo = d["end_hi"], d["end_lo"]
        match = np.zeros(n, bool)
        pos = np.full(n, -1, np.int64)
        if len(s_hi) and ok.any():
            # candidate = last range whose (start_hi, start_lo) <= (hi, lo):
            # searchsorted on hi lands after the equal-hi block; walk back
            # while the candidate's start_lo exceeds the probe's lo. The
            # (pos >= 0) conjunct masks the wrapped s_hi[-1] read so pos
            # never decrements past -1.
            pos = np.searchsorted(s_hi, hi, side="right") - 1
            pos[~ok] = -1
            while True:
                m = (pos >= 0) & (s_hi[pos] == hi) & (s_lo[pos] > lo)
                if not m.any():
                    break
                pos = np.where(m, pos - 1, pos)
            valid = (pos >= 0) & ok
            pv = np.clip(pos, 0, None)
            match = valid & ((hi < e_hi[pv])
                             | ((hi == e_hi[pv]) & (lo <= e_lo[pv])))
        # nullable Int64 via explicit mask — NEVER the default dtype (a
        # batch mixing ints and None coerces to float64 and rounds 64-bit
        # keys to 53-bit mantissas; the ipv6_to_key lesson)
        miss = ~ok
        return pd.DataFrame({
            "ip_hi": pd.arrays.IntegerArray(hi, mask=miss.copy()),
            "ip_lo": pd.arrays.IntegerArray(lo, mask=miss.copy()),
            "dim_idx": pd.arrays.IntegerArray(pos, mask=~match),
        })

    return ipv6_key_lpm


_SIGN_BIT = -(1 << 63)  # long with only the sign bit set

# one compiled regex validates the whole literal: either 8 plain hex groups
# or a single '::' with valid group runs on each side (the '::' branch's
# group-count bound is enforced arithmetically below)
_V6_RE = ("^(([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){7})"
          "|(([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4})*)?"
          "::([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4})*)?))$")


def ipv6_parts(ip: Column) -> Column:
    """IPv6 string -> validated array of 8 hextet strings (null if invalid) —
    PURE scalar Column expressions, every one whole-stage-codegen-capable:
    one rlike validation, then '::' expansion via repeat/substring/concat
    string surgery and a single split. Deliberately NO higher-order
    functions (forall/array_repeat are CodegenFallback — an interpreted
    Project in the middle of the enrich span) and no per-element regex.

    MATERIALIZE this into its own column (withColumn) before deriving keys:
    downstream key derivation references the array 8×, and materializing
    prevents Catalyst's projection collapse from re-inlining the whole tree
    per reference (measured 4-10× on the flagship suite — same pathology as
    the shingle tokenizer note in operators/dedup.py).
    """
    shape_ok = ip.rlike(_V6_RE)
    has_dc = ip.contains("::")
    left = F.split_part(ip, F.lit("::"), F.lit(1))
    right = F.split_part(ip, F.lit("::"), F.lit(2))
    n_l = F.when(left == "", F.lit(0)).otherwise(F.size(F.split(left, ":")))
    n_r = F.when(right == "", F.lit(0)).otherwise(F.size(F.split(right, ":")))
    n_fill = F.lit(8) - n_l - n_r
    fill = F.repeat(F.lit(":0"), n_fill)          # ":0" × missing groups
    head = F.when(left == "", F.substring(fill, 2, 32)) \
            .otherwise(F.concat(left, fill))
    expanded = F.when(right == "", head).otherwise(
        F.concat(head, F.lit(":"), right))
    full = F.when(has_dc, F.when(n_fill >= 1, expanded)).otherwise(ip)
    return F.when(ip.isNotNull() & shape_ok, F.split(full, ":"))


def ipv6_key_from_parts(parts: Column) -> tuple[Column, Column]:
    """(hi, lo) signed-64 key columns from a MATERIALIZED ipv6_parts column.

    Overflow-safe under ANSI: each 64-bit word is assembled as
    (h0 - 0x8000)*2^48 + h1*2^32 + h2*2^16 + h3, which lands directly in
    the sign-flipped domain (signed order == unsigned 128-bit order) without
    ever computing an unsigned value > Long.MAX.
    """
    def hextet(i: int) -> Column:
        # conv(hex, 16, 10) returns a decimal string; values <= 0xFFFF
        return F.conv(F.get(parts, i), 16, 10).try_cast("long")

    def word(base: int) -> Column:
        return ((hextet(base) - F.lit(0x8000)) * F.lit(1 << 48)
                + hextet(base + 1) * F.lit(1 << 32)
                + hextet(base + 2) * F.lit(1 << 16)
                + hextet(base + 3))

    return word(0), word(4)


def ipv6_key_cols(ip: Column) -> tuple[Column, Column]:
    """Pure-Column composition of the v6 key — kept for tests and for
    contexts where an Arrow node is unavailable; fuzz-locked vs `ipaddress`
    in tests/test_properties.py (semantics == ipv6_to_key for every form:
    '::' compression, embedded dotted quads, mapped spellings).

    NOT the enrich hot path since r5: when the key is referenced by a join
    condition + mapped check + canonical build, projection collapse
    re-inlines this whole tree per reference and codegen CSE skips CASE
    WHEN arms — measured 45 executor-CPU-s/M rows vs 1.2 for the
    ipv6_to_key pandas UDF barrier (see operators/enrich.py). Use the UDF
    when the key feeds multiple consumers; use this for single-consumer
    derivations or oracle mirroring."""
    return ipv6_key_from_parts(ipv6_parts(rewrite_embedded_quad(ip)))


# A v6 literal ending in an embedded dotted quad: colon-hex prefix whose last
# character is ':' followed by exactly four 0-255 octets with no leading
# zeros (Java's textToNumericFormatV6/V4 rejects leading-zero octets, as does
# Python's `ipaddress`). Covers IPv4-mapped ('::ffff:a.b.c.d' in ANY
# zero-compression spelling), NAT64 ('64:ff9b::a.b.c.d'), v4-compatible
# ('::a.b.c.d'), and the uncompressed 6-group form — all of which Java's
# InetAddress.getByName accepts (GeoIPFilter.java:172).
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_EMBEDDED_QUAD_RE = (r"^[0-9A-Fa-f:]*:"
                     rf"({_OCTET}(?:\.{_OCTET}){{3}})$")


def rewrite_embedded_quad(ip: Column) -> Column:
    """Rewrite a trailing embedded dotted quad into its two hextets so the
    literal becomes pure colon-hex and flows through ipv6_parts unchanged:
    '64:ff9b::1.2.3.4' -> '64:ff9b::102:304'. Values without a (valid)
    trailing quad pass through untouched — an out-of-range or leading-zero
    octet leaves the original string, which then fails the colon-hex
    validation and yields a miss (the same observable as Java's
    getByName UnknownHostException). Pure Column expressions; cheap
    contains('.') gate so dot-free v6 literals never run the regex.

    MATERIALIZE the result into its own column before feeding ipv6_parts
    (same projection-collapse rule as ipv6_parts itself — the parser
    references its input many times)."""
    quad = F.when(ip.contains(".") & ip.rlike(_EMBEDDED_QUAD_RE),
                  F.regexp_extract(ip, _EMBEDDED_QUAD_RE, 1))
    parts = F.split(quad, r"\.")
    o = [F.get(parts, i).try_cast("long") for i in range(4)]
    prefix = F.substr(ip, F.lit(1), F.length(ip) - F.length(quad))
    rewritten = F.concat(
        prefix,
        F.hex(o[0] * F.lit(256) + o[1]), F.lit(":"),
        F.hex(o[2] * F.lit(256) + o[3]))
    return F.when(quad.isNotNull(), rewritten).otherwise(ip)


def ipv4_mapped_u32(hi: Column, lo: Column) -> Column:
    """uint32 of an IPv4-mapped address from its signed-64 (hi, lo) key;
    null for any non-mapped key. Mapped means bytes ::ffff:a.b.c.d — Java's
    InetAddress applies convertFromIPv4MappedAddress on the PARSED bytes, so
    every textual spelling ('::ffff:1.2.3.4', '0:0::ffff:1.2.3.4', the hex
    form '::ffff:102:304', …) coerces to Inet4Address and must take the v4
    trie (GeoIPFilter.java:172). Detecting on the key instead of the string
    inherits that spelling-universality for free."""
    lo_u = lo.bitwiseXOR(F.lit(_SIGN_BIT))  # unsigned bit pattern
    mapped = (hi == F.lit(_SIGN_BIT)) & \
        (F.shiftrightunsigned(lo_u, 32) == F.lit(0xFFFF))
    return F.when(mapped, lo_u.bitwiseAND(F.lit(0xFFFFFFFF)))


def v6_bucket_of(hi: Column) -> Column:
    """Equi-join bucket for the v6 range join: top 16 bits of the UNSIGNED
    hi word, recovered from the sign-flipped long (XOR restores the original
    bit pattern; shiftrightunsigned then reads it as unsigned)."""
    return F.shiftrightunsigned(hi.bitwiseXOR(F.lit(_SIGN_BIT)), 48)


def ipv6_canonical_from_key(hi: Column, lo: Column) -> Column:
    """Canonical (exploded, no zero-compression) IPv6 string from the
    (hi, lo) signed-64 key — parity with Java getHostAddress
    (spec/filters/geoip_ecs_spec.rb:144-159), e.g. '2607:f0d0:1002:51::4' →
    '2607:f0d0:1002:51:0:0:0:4'. Pure Column expressions (conv/concat_ws),
    whole-stage codegen — no Python in the enrich hot path."""
    def groups(word: Column) -> list[Column]:
        u = word.bitwiseXOR(F.lit(_SIGN_BIT))
        # hex() not conv(): conv's shared converter buffer produced
        # cross-row corruption under whole-stage codegen in wide projections
        # (observed on Spark 4.1: group values bled between rows)
        return [
            F.lower(F.hex(
                F.shiftrightunsigned(u, 48 - 16 * i).bitwiseAND(F.lit(0xFFFF))))
            for i in range(4)
        ]
    return F.concat_ws(":", *groups(hi), *groups(lo))


@F.pandas_udf(T.StringType())
def ipv6_canonical(ip: pd.Series) -> pd.Series:
    """Canonical (exploded) IPv6 form: '2607:f0d0:1002:51::4' ->
    '2607:f0d0:1002:51:0:0:0:4' — parity with Java getHostAddress
    (spec/filters/geoip_ecs_spec.rb:144-159)."""
    def canon(v):
        try:
            a = ipaddress.IPv6Address(v)
            # Java's getHostAddress prints each group without zero-compression
            return ":".join(format((int(a) >> (112 - 16 * i)) & 0xFFFF, "x")
                            for i in range(8))
        except (ipaddress.AddressValueError, ValueError, TypeError):
            return None
    return ip.map(canon)
