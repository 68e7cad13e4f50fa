"""bm25_topk: independent Python-reference scoring (±1 micro tolerance for
the single ln), ranking semantics on crafted docs, input guards, and the
scan-shaped plan pin (TakeOrderedAndProject, no data-sized shuffle, no
Python)."""

from __future__ import annotations

import math
import re

import pytest

from logstash_filter_geoip_spark.operators.retrieval import (
    BM25_B, BM25_K1, BM25_K1_PLUS_1, DRIVER_TERMS, MAX_TERMS,
    bm25_multi_topk, bm25_scores, bm25_topk)

DOCS = [
    (0, "spark merge join merge merge speed"),        # tf(merge)=3, short
    (1, "merge once in a much longer document " + "pad " * 30),
    (2, "customer filter merge all three terms here"),
    (3, "no relevant words at all in this one"),
    (4, "customer customer customer"),
    (5, None),
    # filler rows keep every term's df below n/2 so idf stays positive
    (6, "plain filler text with nothing of interest"),
    (7, "another plain filler row to hold idf up"),
    (8, "yet more padding words that match no query term"),
]
TERMS = ["customer", "filter", "merge"]


def _py_bm25(docs, terms):
    toks = {d: re.findall("[a-z0-9]+", (t or "").lower()) for d, t in docs}
    dl = {d: len(tk) for d, tk in toks.items()}
    n = float(len(docs))
    sum_dl = float(sum(dl.values()))
    out = {}
    for d, tk in toks.items():
        total = 0
        for t in terms:
            tf = sum(1 for x in tk if x == t)
            if tf == 0:
                continue
            df = float(sum(1 for tk2 in toks.values() if t in tk2))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            norm = (1.0 - BM25_B) + BM25_B * (dl[d] * n / sum_dl)
            w = idf * (tf * BM25_K1_PLUS_1) / (tf + BM25_K1 * norm)
            total += round(w * 1_000_000)
        if total:
            out[d] = total
    return out


def test_scores_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score_micro"]
           for r in bm25_scores(df, TERMS).collect()}
    ref = _py_bm25(DOCS, TERMS)
    assert set(got) == set(ref)
    for d in ref:  # ±1 micro per contributing term (ln ulp headroom)
        assert abs(got[d] - ref[d]) <= len(TERMS), (d, got[d], ref[d])


def test_ranking_semantics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(df, TERMS, k=3).collect()
    ids = [r["doc_id"] for r in top]
    # doc 2 matches all three terms → best; docs 3 and 5 never appear
    assert ids[0] == 2
    assert 3 not in ids and 5 not in ids
    # scores are sorted descending with doc_id tiebreak
    keys = [(-r["score_micro"], r["doc_id"]) for r in top]
    assert keys == sorted(keys)
    # tf saturation: doc 0 (tf=3, short) outranks doc 1 (tf=1, long)
    all_rows = {r["doc_id"]: r["score_micro"]
                for r in bm25_scores(df, TERMS).collect()}
    assert all_rows[0] > all_rows[1]


def test_term_guards(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])
    with pytest.raises(ValueError):
        bm25_scores(df, ["UPPER"])
    with pytest.raises(ValueError):
        bm25_scores(df, ["has space"])
    with pytest.raises(ValueError):
        bm25_scores(df, ["t"] * (MAX_TERMS + 1))


def test_plan_is_scan_shaped(spark, sf_oracle_dir="/root/testdata/sf0.01"):
    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    plan = bm25_topk(docs, DRIVER_TERMS, k=25)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only Exchange is the 1-row stats reduction; the corpus never
    # shuffles on a data-sized key and no Python reaches the plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "query_id long, term string")


def test_multi_matches_single_on_same_terms(spark):
    """One multi-query over TERMS == bm25_scores with the same terms:
    identical doc set and identical score_micro (token-equality tf equals
    the \\b-regex tf on underscore-free text)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    single = {r["doc_id"]: r["score_micro"]
              for r in bm25_scores(df, TERMS).collect()}
    multi = {r["doc_id"]: r["score_micro"]
             for r in bm25_multi_topk(
                 df, _qdf(spark, [(9, t) for t in TERMS]),
                 k=1_000_000).collect()}
    assert multi == single


def test_multi_duplicate_term_doubles_weight(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    once = {r["doc_id"]: r["score_micro"]
            for r in bm25_multi_topk(df, _qdf(spark, [(1, "merge")]),
                                     k=100).collect()}
    twice = {r["doc_id"]: r["score_micro"]
             for r in bm25_multi_topk(
                 df, _qdf(spark, [(1, "merge"), (1, "merge")]),
                 k=100).collect()}
    assert twice == {d: 2 * s for d, s in once.items()}


def test_multi_per_query_topk_and_rank(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_multi_topk(
        df, _qdf(spark, [(1, "merge"), (2, "customer")]), k=2).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2}
    for q, rs in by_q.items():
        assert len(rs) <= 2
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        keys = [(-r["score_micro"], r["doc_id"]) for r in
                sorted(rs, key=lambda r: r["rank"])]
        assert keys == sorted(keys)


def test_multi_plan_prunes_topk_below_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    from logstash_filter_geoip_spark.operators.retrieval import (
        MULTI_K, _multi_queries_df)
    plan = bm25_multi_topk(docs, _multi_queries_df(spark),
                           k=MULTI_K)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan  # map-side prune below the rank Exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multi_accepts_prebuilt_postings(spark):
    from logstash_filter_geoip_spark.operators.retrieval import \
        build_postings
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    fresh = {(r["query_id"], r["doc_id"]): r["score_micro"]
             for r in bm25_multi_topk(df, _qdf(spark, [(1, "merge")]),
                                      k=100).collect()}
    post = build_postings(df)
    reused = {(r["query_id"], r["doc_id"]): r["score_micro"]
              for r in bm25_multi_topk(df, _qdf(spark, [(1, "merge")]),
                                       k=100, postings=post).collect()}
    assert fresh == reused


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_top_terms_matches_python(spark):
    from collections import Counter

    from logstash_filter_geoip_spark.operators.retrieval import (
        TFIDF_SCALE, tfidf_top_terms)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.score)
           for r in tfidf_top_terms(df, k=2).collect()}

    toks = {d: re.findall("[a-z0-9]+", (t or "").lower()) for d, t in DOCS}
    dfreq = Counter()
    for tk in toks.values():
        dfreq.update(set(tk))
    expect = {}
    for d, tk in toks.items():
        tf = Counter(tk)
        scored = sorted(
            ((-(tf[t] * TFIDF_SCALE // dfreq[t])), t) for t in tf)
        for rank, (neg, t) in enumerate(scored[:2], start=1):
            expect[(d, rank)] = (t, tf[t], dfreq[t], -neg)
    assert out == expect
    # doc 1: 'merge' (df=3) scores BELOW doc-unique words — the rare-term
    # preference the df division encodes ('pad' tf=30 df=1 dominates)
    assert out[(1, 1)][0] == "pad"
    with pytest.raises(ValueError):
        tfidf_top_terms(df, k=0)


def test_tfidf_plan_merge_join_and_group_limit(spark):
    from logstash_filter_geoip_spark.operators.retrieval import \
        tfidf_top_terms
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (tfidf_top_terms(docs, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    # the postings x df join of two corpus-derived relations must never be
    # a static-estimate broadcast (the session-10 OOM class)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # the per-doc top-k prunes map-side
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# rrf_fuse (hybrid retrieval)
# ---------------------------------------------------------------------------


def test_rrf_crafted_matrix(spark):
    """Both-legs vs single-leg rationals, hand-computed; fused order is
    exactly the rational order."""
    from logstash_filter_geoip_spark.operators.retrieval import rrf_fuse
    lex = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                                "doc_id long, r_lex int")
    sem = spark.createDataFrame([(11, 1), (13, 2)],
                                "doc_id long, r_sem int")
    rows = rrf_fuse(lex, sem, k0=60, k=10).collect()
    assert [r.doc_id for r in rows] == [11, 10, 13, 12]
    by_id = {r.doc_id: r for r in rows}
    assert (by_id[11].rrf_num, by_id[11].rrf_den) == (123, 61 * 62)
    assert (by_id[10].rrf_num, by_id[10].rrf_den) == (1, 61)
    assert (by_id[13].rrf_num, by_id[13].rrf_den) == (1, 62)
    assert (by_id[12].rrf_num, by_id[12].rrf_den) == (1, 63)
    assert by_id[11].r_lex == 2 and by_id[11].r_sem == 1
    assert by_id[10].r_sem is None and by_id[13].r_lex is None


def test_rrf_matches_fraction_reference_and_cut(spark):
    """Seeded fuzz: fused ordering == exact Fraction ordering (score desc,
    doc_id asc), and the k cut takes exactly the top k."""
    import random
    from fractions import Fraction

    from logstash_filter_geoip_spark.operators.retrieval import rrf_fuse

    rng = random.Random(1503)
    docs = list(range(100))
    lex_pool = rng.sample(docs, 30)
    sem_pool = rng.sample(docs, 30)
    lex = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(lex_pool)],
        "doc_id long, r_lex int")
    sem = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(sem_pool)],
        "doc_id long, r_sem int")
    got = rrf_fuse(lex, sem, k0=60, k=15).collect()
    score = {}
    for i, d in enumerate(lex_pool):
        score[d] = score.get(d, Fraction(0)) + Fraction(1, 60 + i + 1)
    for i, d in enumerate(sem_pool):
        score[d] = score.get(d, Fraction(0)) + Fraction(1, 60 + i + 1)
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r in got:
        assert Fraction(r.rrf_num, r.rrf_den) == score[r.doc_id]


def test_rrf_driver_query_shape(spark):
    """The sf0.001 hybrid query returns ≤ HYBRID_K rows with exact
    rational columns consistent with the double score."""
    from logstash_filter_geoip_spark.operators.retrieval import (
        HYBRID_K, q_hybrid_topk)
    rows = q_hybrid_topk(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= HYBRID_K
    for r in rows:
        assert r.rrf_score == r.rrf_num / r.rrf_den
        assert (r.r_lex is not None) or (r.r_sem is not None)
