"""Domain mixing (packing.mix_corpus) and BPE tokenizer-training primitives
(operators/bpe.py): exact equality against pure-Python references,
determinism/branch coverage, and the no-shuffle plan contract for mixing."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
from logstash_filter_geoip_spark.operators import bpe, packing
from tests.conftest import SF_SMOKE

RATES = {"src0": 2.5, "src1": 0.2, "src2": 0.0}


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


# ---------------------------------------------------------------------------
# mix_corpus
# ---------------------------------------------------------------------------

def _py_mix(rows, rates, default_rate, salt):
    out = {}
    for doc_id, source in rows:
        rate = rates.get(source, default_rate)
        base = int(rate)
        thr = int(round((rate - base) * (1 << 60)))
        u = md5_hash60_py(f"mix:{salt}:{doc_id}")
        n = base + (1 if u < thr else 0)
        if n > 0:
            out[doc_id] = (source, n)
    return out


def test_mix_corpus_matches_python_reference(spark):
    docs = _docs(spark)
    got = packing.mix_corpus(docs, RATES, default_rate=1.0,
                             salt="mix-v1").collect()
    ref = _py_mix([(r["doc_id"], r["source"])
                   for r in docs.select("doc_id", "source").collect()],
                  RATES, 1.0, "mix-v1")
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["source"], r["epoch"]))
    assert set(by_doc) == set(ref)
    for doc_id, (source, n) in ref.items():
        pairs = sorted(by_doc[doc_id])
        # exactly epochs 0..n-1, all carrying the right source
        assert pairs == [(source, e) for e in range(n)]


def test_mix_corpus_branches_all_hit(spark):
    """The driver config must actually exercise upsample / downsample /
    drop / default, else the oracle is checking nothing."""
    docs = _docs(spark)
    out = packing.mix_corpus(docs, RATES, default_rate=1.0, salt="mix-v1")
    per_src = {r["source"]: (r["n_in"], r["n_out"]) for r in
               (out.groupBy("source").agg(F.count("*").alias("n_out"))
                .join(docs.groupBy("source").agg(F.count("*").alias("n_in")),
                      "source", "right")
                .fillna(0, ["n_out"]).collect())}
    n_in0, n_out0 = per_src["src0"]
    assert 2 * n_in0 <= n_out0 <= 3 * n_in0  # upsampled 2.5x
    assert per_src["src1"][1] < per_src["src1"][0]  # downsampled
    assert per_src["src2"][1] == 0  # dropped
    assert per_src["src3"] == (per_src["src3"][0], per_src["src3"][0])


def test_mix_corpus_is_a_pure_projection(spark):
    """No shuffle: mixing must stay a scan + project + generate — a single
    Exchange would mean the operator re-partitions 100 TB for nothing."""
    plan = (packing.mix_corpus(_docs(spark), RATES)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_mix_corpus_rejects_negative_rate(spark):
    with pytest.raises(ValueError, match="rate"):
        packing.mix_corpus(_docs(spark), {"src0": -0.5})


# ---------------------------------------------------------------------------
# bpe
# ---------------------------------------------------------------------------

def _py_word_counts(texts):
    wc = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    return wc


def _py_pair_counts(wc):
    pc = {}
    for w, n in wc.items():
        for i in range(len(w) - 1):
            p = w[i:i + 2]
            pc[p] = pc.get(p, 0) + n
    return pc


def _py_bpe(wc, n_merges):
    """Independent reference: the original Sennrich-script formulation —
    words as space-joined symbol strings, merges applied with a regex
    substitution (left-to-right non-overlapping, same greedy semantics as
    the operator's index loop but implemented a different way)."""
    from collections import Counter
    vocab = Counter({" ".join(w): n for w, n in wc.items()})
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for word, n in vocab.items():
            syms = word.split(" ")
            for pair in zip(syms, syms[1:]):
                counts[pair] += n
        if not counts:
            break
        (left, right), cnt = sorted(counts.items(),
                                    key=lambda kv: (-kv[1], kv[0]))[0]
        pat = re.compile(
            r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
        nv = Counter()
        for word, n in vocab.items():
            nv[pat.sub(left + right, word)] += n
        vocab = nv
        merges.append((rank, left, right, left + right, cnt))
    return merges


def test_pair_counts_matches_python(spark):
    docs = _docs(spark)
    texts = [r["text"] for r in docs.select("text").collect()]
    ref = _py_pair_counts(_py_word_counts(texts))
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["pair"], r["n_occurrences"])
           for r in bpe.pair_counts(docs, k=50).collect()]
    assert got == top


def test_bpe_merges_match_python(spark):
    docs = _docs(spark)
    texts = [r["text"] for r in docs.select("text").collect()]
    ref = _py_bpe(_py_word_counts(texts), 12)
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in bpe.bpe_merges(docs, n_merges=12).collect()]
    assert got == ref
    # the first merge is by definition the top pair_counts row
    first = bpe.pair_counts(docs, k=1).collect()[0]
    assert (got[0][1] + got[0][2], got[0][4]) == (first["pair"],
                                                 first["n_occurrences"])


def test_bpe_vocab_guard(spark):
    with pytest.raises(ValueError, match="vocab"):
        bpe.bpe_merges(_docs(spark), n_merges=1, vocab_cap=3)


def _py_encode(text, merges):
    """Independent encode reference: regex-substitution formulation (the
    Sennrich script's apply step), vs the operator's index loop."""
    out = []
    for w in re.findall("[a-z0-9]+", text.lower()):
        word = " ".join(w)
        for _, left, right, merged, _ in merges:
            pat = re.compile(
                r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
            word = pat.sub(merged, word)
        out.extend(word.split(" "))
    return out


def test_bpe_encode_matches_python(spark):
    docs = _docs(spark)
    merges = bpe.bpe_merges(docs, n_merges=12)
    py_merges = [(r["rank"], r["left"], r["right"], r["merged"],
                  r["pair_count"]) for r in merges.collect()]
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe.bpe_encode(docs, merges).collect()}
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)  # every doc comes back, none dropped
    for r in rows:
        ref = _py_encode(r["text"], py_merges)
        assert got[r["doc_id"]] == (ref, len(ref)), r["doc_id"]


def test_bpe_encode_edge_rows(spark):
    docs = spark.createDataFrame(
        [(0, "aa aa ab"), (1, ""), (2, None), (3, "AA!aa")],
        "doc_id long, text string")
    merges = spark.createDataFrame(
        [(0, "a", "a", "aa", 3)],
        "rank int, left string, right string, merged string, pair_count long")
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe.bpe_encode(docs, merges).collect()}
    # empty / NULL text → empty token array, row preserved; the WORD_RE
    # tokenizer lowercases and splits on punctuation before merging
    assert got == {0: (["aa", "aa", "a", "b"], 4),
                   1: ([], 0),
                   2: ([], 0),
                   3: (["aa", "aa"], 2)}


def test_bpe_min_count_prunes(spark):
    docs = _docs(spark)
    full = {r["word"]: r["n"] for r in bpe.word_counts(docs).collect()}
    # pick a cut strictly inside the observed count range so the prune
    # provably drops something and keeps something, at any corpus scale
    cut = (min(full.values()) + max(full.values())) // 2 + 1
    pruned = {r["word"]: r["n"]
              for r in bpe.word_counts(docs, min_count=cut).collect()}
    assert pruned == {w: n for w, n in full.items() if n >= cut}
    assert 0 < len(pruned) < len(full)
