"""Bigram-LM quality filter (text_ops.lm_bigram_scores): independent
pure-Python model equality, the keep rule, degenerate docs, and external
reference corpora (the unseen-bigram backoff path)."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import types as T

from logstash_filter_geoip_spark.operators.text_ops import (WORD_RE,
                                                            lm_bigram_scores)

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _py_lm(docs: list[tuple[int, str]], ref: list[tuple[int, str]],
           keep_avg_micro: int):
    """Independent reimplementation: add-one bigram LM in plain Python."""
    def toks(t):
        return re.findall(WORD_RE, t.lower())

    c2, c1, vocab = Counter(), Counter(), set()
    for _, t in ref:
        tk = toks(t)
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    out = {}
    for doc_id, t in docs:
        tk = toks(t)
        n, s = 0, 0
        for a, b in zip(tk, tk[1:]):
            p = (c2[(a, b)] + 1.0) / (c1[a] + v)
            micro = math.log(p) * 1e6
            # round half away from zero (Spark/DuckDB round semantics)
            s += int(math.floor(micro + 0.5) if micro >= 0
                     else math.ceil(micro - 0.5))
            n += 1
        keep = int(n > 0 and s >= keep_avg_micro * n)
        out[doc_id] = (n, s, keep)
    return out


def _run(spark, docs, ref=None, thr=-6_500_000):
    ddf = spark.createDataFrame(docs, DOC_SCHEMA)
    rdf = spark.createDataFrame(ref, DOC_SCHEMA) if ref is not None else None
    return {r["doc_id"]: (r["n_bigrams"], r["lp_micro_sum"], r["keep_lm"])
            for r in lm_bigram_scores(ddf, ref=rdf,
                                      keep_avg_micro=thr).collect()}


# 10 repeats of each common sentence boost their bigram counts, and the
# filler doc inflates V to ~90 so add-one smoothing doesn't flatten the
# common-vs-unseen gap (with a tiny vocab every P collapses toward 1/V)
CORPUS = (
    [(i, "the cat sat on the mat") for i in range(10)]
    + [(10 + i, "the cat sat on the hat") for i in range(10)]
    + [(20 + i, "the dog sat on the mat") for i in range(10)]
    + [(30, " ".join(f"w{j}" for j in range(80)))]  # vocab filler
    + [(31, "one"),           # single token: zero bigrams
       (32, ""),              # empty: zero tokens
       (33, "zq xv jk qqq zork prlx")]  # gibberish: every bigram unique
)


def test_matches_python_reference_self_scored(spark):
    got = _run(spark, CORPUS)
    assert got == _py_lm(CORPUS, CORPUS, -6_500_000)


def test_keep_rule_splits_common_from_gibberish(spark):
    """With a threshold between the common-phrase and unique-bigram scores,
    repeated phrasing keeps and gibberish drops; degenerate docs (<2
    tokens) always drop."""
    got = _run(spark, CORPUS, thr=-3_000_000)
    assert got[0][2] == 1 and got[10][2] == 1 and got[20][2] == 1
    assert got[33][2] == 0         # unique bigrams → low avg log-prob
    assert got[31] == (0, 0, 0)    # one token
    assert got[32] == (0, 0, 0)    # empty
    assert got == _py_lm(CORPUS, CORPUS, -3_000_000)


def test_external_reference_backoff(spark):
    """Scoring against a DIFFERENT reference exercises the unseen-bigram
    and unseen-prefix backoff (c2/c1 both absent → 1/V)."""
    ref = CORPUS[:3]
    docs = [(10, "the cat sat on the mat"),   # fully in-model
            (11, "purple elephants waltz")]   # fully out-of-model
    got = _run(spark, docs, ref=ref)
    assert got == _py_lm(docs, ref, -6_500_000)
    # out-of-model doc must score strictly worse per bigram
    assert got[11][1] / got[11][0] < got[10][1] / got[10][0]
