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


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment 100% but
    Jaccard far below the gate — the asymmetric operator's reason to
    exist. Shingles are word-3-grams, so doc 1 (6 words → 4 shingles) is
    a strict prefix of doc 2 (16 words → 14 shingles): J = 4/14 ≈ 0.29."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " eta theta iota kappa lam mu nu xi omicron pi"
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated words entirely here")],
        ["doc_id", "text"])
    cont = {(r["doc_a"], r["doc_b"]): (r["n_shared"], r["n_a"], r["n_b"])
            for r in dedup.containment_pairs(docs).collect()}
    assert cont == {(1, 2): (4, 4, 14)}
    jac = {(r["doc_a"], r["doc_b"])
           for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert (1, 2) not in jac


def test_containment_integer_gate_boundary(spark):
    """The cross-multiplied gate is inclusive: n_shared*100 == pct*min
    passes; one shingle less fails. 5 shared of min-side 5 vs 4 of 5 at
    pct=80 → 4/5 passes exactly, 3/5 fails."""
    a = "w1 w2 w3 w4 w5 w6"                     # 4 shingles
    b = "w1 w2 w3 w4 w5 zz qq"                  # shares 3 of them
    docs = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    hit = dedup.containment_pairs(docs, pct=75).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_shared"]) for r in hit] == \
        [(1, 2, 3)]  # 3*100 >= 75*4 exactly
    assert dedup.containment_pairs(docs, pct=76).collect() == []


def test_containment_pct_validation(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    import pytest
    with pytest.raises(ValueError, match="pct"):
        dedup.containment_pairs(docs, pct=0)
    with pytest.raises(ValueError, match="pct"):
        dedup.containment_pairs(docs, pct=0.8)  # float pct is a bug


def test_indexed_pair_stats_equals_legacy_verify(spark):
    """r6 refactor pin: the direct pair-instance counting + over-cap
    correction (_indexed_pair_stats) equals the legacy composition
    (candidate distinct + re-join recount against the full shingle
    relation) row-for-row — including with a tiny df_cap that makes the
    over-cap set non-empty."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    sh = dedup._shingles(docs)
    for cap in (3, dedup.DF_CAP):
        new = sorted(map(tuple, dedup._indexed_pair_stats(
            docs, cap).collect()))
        legacy = sorted(map(tuple, dedup.verify_candidate_pairs(
            dedup._candidate_pairs(sh, cap), sh, 0.0).collect()))
        assert new == legacy and new, cap
