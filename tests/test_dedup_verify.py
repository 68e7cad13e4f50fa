"""Dedup verify-path tests (VERDICT r1 #4 + ADVICE df_cap undercount)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import dedup
from tests.conftest import SF_ORACLE


def test_df_cap_prunes_candidates_not_counts(spark):
    """A shingle over the df cap is excluded from candidate generation but
    still counted in n_shared for surviving pairs (exact verification)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f"), (3, "a b c x y")],
        ["doc_id", "text"])
    # df("a b c") = 3 > cap; pair (1,2) still found via "b c d"/"c d e"
    out = {(r["doc_a"], r["doc_b"]): (r["n_shared"], r["n_a"], r["n_b"])
           for r in dedup.ngram_jaccard_pairs(docs, df_cap=2).collect()}
    assert out == {(1, 2): (3, 3, 4)}  # n_shared includes the capped shingle


def test_minhash_lsh_equals_exact_jaccard_sf001(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    exact = {tuple(r) for r in dedup.ngram_jaccard_pairs(docs).collect()}
    lsh = {tuple(r) for r in dedup.minhash_lsh_pairs(docs).collect()}
    # LSH at 16 bands × 4 rows has near-1 recall at Jaccard ≥ 0.5 and the
    # verify step removes every false candidate → sets match on this data
    assert lsh == exact


def test_minhash_lsh_releases_shingle_cache(spark):
    """The shingle persist() must not outlive the operator (r1 leaked it into
    the shared session). localCheckpoint keeps exactly one pair-sized RDD."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    dedup.minhash_lsh_pairs(docs).collect()
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (
        f"persistent RDDs grew {before} -> {after}: shingle cache leaked")
