"""Value locks for the three formerly rows-only queries (VERDICT r3 #3):
dedup_simhash, dedup_simhash_pairs, text_fingerprint.

Strategy: recompute the expected values INDEPENDENTLY — token hashes come
from Spark's own xxhash64/crc32 evaluated on literal tokens (the primitives),
but the ±1 bit-sum fold, the sign-bit assembly, the band split, the popcount
threshold, and the polynomial rolling fold are all re-implemented in plain
Python here. A bug in any of the Column-expression constructions
(operators/dedup.py simhash/simhash_near_dup, operators/text_ops.py
fingerprints) now fails an equality assert instead of passing silently.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
from logstash_filter_geoip_spark.operators import dedup, text_ops

U64 = (1 << 64) - 1


def _tokens(text: str) -> list[str]:
    return re.findall(dedup.WORD_RE, text.lower())


def _xxhash64(spark, values: list[str]) -> list[int]:
    """Spark's xxhash64 of each literal string (the shared primitive; the
    fold logic under test never touches this path)."""
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]


def _expected_simhash(spark, text: str) -> int:
    """Python reimplementation of the 64-bit ±1 SimHash fold (signed)."""
    hashes = _xxhash64(spark, _tokens(text))
    fp = 0
    for b in range(64):
        s = sum(1 if ((h & U64) >> b) & 1 else -1 for h in hashes)
        if s > 0:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & U64).count("1")


def _bands(fp: int, n_bands: int = 4) -> list[int]:
    bits = 64 // n_bands
    return [((fp & U64) >> (i * bits)) & ((1 << bits) - 1)
            for i in range(n_bands)]


DOCS = [
    ("dup1", "the quick brown fox jumps over the lazy dog near the old river bank"),
    ("dup2", "the quick brown fox jumps over the lazy dog near the old river bank"),
    # dup1 plus ONE extra trailing token — a near-dup by construction
    ("edit", "the quick brown fox jumps over the lazy dog near the old river bank today"),
    ("diff", "completely unrelated text about database query optimization and "
             "distributed shuffle partitioning strategies in columnar engines"),
]


def test_simhash_values_match_python_fold(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash64"]
           for r in dedup.simhash(df).collect()}
    want = {doc_id: _expected_simhash(spark, text) for doc_id, text in DOCS}
    assert got == want
    # identical texts ⇒ identical fingerprints (and thus Hamming 0)
    assert got["dup1"] == got["dup2"]
    assert _hamming(want["dup1"], want["diff"]) > 3  # genuinely far apart


def test_simhash_pairs_match_python_banding(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    fps = {doc_id: _expected_simhash(spark, text) for doc_id, text in DOCS}

    # unthresholded run: every banded candidate's popcount must equal the
    # Python Hamming distance
    all_pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
                 for r in dedup.simhash_near_dup(df, max_hamming=64).collect()}
    for (a, b), ham in all_pairs.items():
        assert ham == _hamming(fps[a], fps[b]), (a, b)
    # identical docs: Hamming 0, band trivially shared → pair REQUIRED
    assert all_pairs[("dup1", "dup2")] == 0

    # default-threshold run: membership must equal the Python prediction
    # (shares ≥1 of 4 16-bit bands AND Hamming ≤ 3) for every ordered pair
    got = {(r["doc_a"], r["doc_b"])
           for r in dedup.simhash_near_dup(df).collect()}
    ids = [d for d, _ in DOCS]
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shares_band = any(x == y for x, y in
                              zip(_bands(fps[a]), _bands(fps[b])))
            expect = shares_band and _hamming(fps[a], fps[b]) <= 3
            assert ((a, b) in got) == expect, (a, b)
    # and the planted duplicate is in the default output
    assert ("dup1", "dup2") in got


def test_simhash_md5_basis_matches_pure_python(spark):
    """The md5 hash basis (the driver-query variant, r5): a FULLY independent
    pure-Python reimplementation — hashlib.md5-derived 60-bit token hashes,
    ±1 fold, sign bits — must equal simhash(hash_basis='md5') exactly. No
    Spark primitive is shared (unlike the xxhash64 lock above), so this also
    triangulates the DuckDB oracle from a third engine."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash60"]
           for r in dedup.simhash(df, hash_basis="md5").collect()}

    def py_simhash60(text: str) -> int:
        hashes = [md5_hash60_py(t) for t in _tokens(text)]
        fp = 0
        for b in range(60):
            if sum(1 if (h >> b) & 1 else -1 for h in hashes) > 0:
                fp |= 1 << b
        return fp

    want = {doc_id: py_simhash60(text) for doc_id, text in DOCS}
    assert got == want
    assert got["dup1"] == got["dup2"]

    # pairs: banded membership (4 × 15-bit bands) + popcount, pure Python
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_dup(
                 df, max_hamming=60, hash_basis="md5").collect()}
    ids = [d for d, _ in DOCS]
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shares = any(((want[a] >> (k * 15)) & 32767)
                         == ((want[b] >> (k * 15)) & 32767) for k in range(4))
            if shares:
                assert pairs[(a, b)] == bin(want[a] ^ want[b]).count("1")
            else:
                assert (a, b) not in pairs
    assert pairs[("dup1", "dup2")] == 0


def test_fingerprint_md5_basis_matches_pure_python(spark):
    """fingerprints(hash_basis='md5') — the oracle-checked driver variant —
    against a hashlib-only Python fold (no Spark primitives shared)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: (r["doc_fp60"], r["rolling_fp"])
           for r in text_ops.fingerprints(df, hash_basis="md5").collect()}
    for doc_id, text in DOCS:
        acc = 0
        for tok in re.findall(text_ops.WORD_RE, text.lower()):
            acc = (acc * 1000003 + md5_hash60_py(tok)) % 2147483647
        assert got[doc_id] == (md5_hash60_py(text), acc), doc_id


def test_fingerprint_values_match_python_fold(spark):
    """rolling_fp: Python fold over zlib.crc32 (same CRC32 polynomial as
    F.crc32) must equal the F.aggregate fold; xx64 must equal xxhash64 of
    the literal text evaluated outside fingerprints()."""
    sf_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
                        .orderBy("doc_id").limit(3).collect()
    rows = [(str(r["doc_id"]), r["text"]) for r in sf_docs] + DOCS[:1] + DOCS[3:]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["xx64"], r["rolling_fp"])
           for r in text_ops.fingerprints(df).collect()}

    texts = [t for _, t in rows]
    xx_lit = dict(zip([d for d, _ in rows], _xxhash64(spark, texts)))
    for doc_id, text in rows:
        acc = 0
        for tok in re.findall(text_ops.WORD_RE, text.lower()):
            acc = (acc * 1000003 + zlib.crc32(tok.encode())) % 2147483647
        assert got[doc_id] == (xx_lit[doc_id], acc), doc_id
