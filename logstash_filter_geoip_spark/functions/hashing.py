"""Engine-neutral 60-bit md5 hash family, identical in Spark, DuckDB, and
pure Python.

The dedup/fingerprint operators default to Spark-native hashes (xxhash64 /
crc32 — fastest, engine-internal). For the driver's DuckDB correctness gate
that's unverifiable, so each of those operators also accepts
``hash_basis="md5"``: the per-token hash becomes the first 15 hex digits of
md5 read as a 60-bit integer, which all three engines compute bit-identically
(md5 is standard everywhere; 60 bits stays below 2^63 so no signed-overflow
divergence under Spark ANSI mode or DuckDB's checked BIGINT arithmetic).

One definition point for all three engines — the same single-source pattern
as sources/transcripts.py (CLAUDE.md invariant).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash60(col: Column) -> Column:
    """Spark: 60-bit integer from the first 15 hex digits of md5(col)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10) \
            .cast("long")


def md5_hash60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the identical 60-bit value."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def md5_hash60_py(s: str) -> int:
    """Pure-Python reference (value-lock tests)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
