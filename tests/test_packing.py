"""Sequence packing + deterministic split assignment
(operators/packing.py): value equality against a pure-Python reference,
stream invariants, the no-single-partition-window plan contract, and the
engine-identical md5 split hash."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
from logstash_filter_geoip_spark.operators import packing
from tests.conftest import SF_SMOKE

SEQ_LEN = 64


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _py_pack(rows, seq_len, eos):
    """Pure-Python concat-then-chunk reference."""
    out, off = {}, 0
    for doc_id, text in sorted(rows):
        n = len(re.findall(r"\S+", text))
        cost = n + eos
        out[doc_id] = (n, off, off // seq_len, (off + cost - 1) // seq_len)
        off += cost
    return out


@pytest.mark.parametrize("docs_per_block", [7, 1 << 16])
def test_pack_matches_python_reference(spark, docs_per_block):
    # docs_per_block=7 forces many blocks, exercising the driver-side
    # exclusive-prefix path; 1<<16 is the single-block degenerate case.
    docs = _docs(spark)
    got = {r["doc_id"]: r for r in
           packing.pack_sequences(docs, seq_len=SEQ_LEN, eos_tokens=1,
                                  docs_per_block=docs_per_block).collect()}
    ref = _py_pack([(r["doc_id"], r["text"])
                    for r in docs.select("doc_id", "text").collect()],
                   SEQ_LEN, 1)
    assert set(got) == set(ref)
    for doc_id, (n, off, first, last) in ref.items():
        g = got[doc_id]
        assert (g["n_tokens"], g["start_offset"], g["first_seq"],
                g["last_seq"]) == (n, off, first, last)
        assert g["n_seqs"] == last - first + 1


def test_pack_stream_invariants(spark):
    rows = sorted(
        packing.pack_sequences(_docs(spark), seq_len=SEQ_LEN).collect(),
        key=lambda r: r["doc_id"])
    off = 0
    for r in rows:
        # contiguous stream: each doc starts exactly where the previous
        # one's tokens + EOS ended
        assert r["start_offset"] == off
        off += r["n_tokens"] + 1
        assert r["first_seq"] == r["start_offset"] // SEQ_LEN
        assert r["n_seqs"] >= 1


def test_pack_plan_has_no_single_partition_exchange(spark):
    """The 100-TB contract: the global running sum must NOT be a
    Window.orderBy over everything (one reducer). The only allowed
    exchanges are hash by block and the bounded broadcast of prefixes."""
    df = packing.pack_sequences(_docs(spark), seq_len=SEQ_LEN)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" in plan  # the per-block window is still there


def test_pack_block_guard(spark, monkeypatch):
    monkeypatch.setattr(packing, "_MAX_BLOCKS", 2)
    with pytest.raises(ValueError, match="docs_per_block"):
        packing.pack_sequences(_docs(spark), seq_len=SEQ_LEN,
                               docs_per_block=1)


def test_pack_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError, match="seq_len"):
        packing.pack_sequences(_docs(spark), seq_len=0)


def test_pack_rejects_bad_eos_and_block(spark):
    with pytest.raises(ValueError, match="eos_tokens"):
        packing.pack_sequences(_docs(spark), seq_len=8, eos_tokens=-1)
    # negative block size would silently reverse the prefix order
    with pytest.raises(ValueError, match="docs_per_block"):
        packing.pack_sequences(_docs(spark), seq_len=8, docs_per_block=-7)
    with pytest.raises(ValueError, match="docs_per_block"):
        packing.pack_sequences(_docs(spark), seq_len=8, docs_per_block=0)


def test_split_assign_matches_python_hash(spark):
    got = packing.split_assign(_docs(spark)).collect()
    assert len(got) > 0
    for r in got:
        bucket = md5_hash60_py(f"split:corpus-v1:{r['doc_id']}") % 100
        assert r["bucket"] == bucket
        want = "train" if bucket < 98 else ("valid" if bucket < 99 else
                                            "test")
        assert r["split"] == want


def test_split_assign_is_salt_sensitive_and_total(spark):
    docs = _docs(spark)
    n = docs.count()
    a = packing.split_assign(docs, salt="a")
    b = packing.split_assign(docs, salt="b")
    assert a.count() == n  # every doc assigned
    moved = (a.alias("a").join(b.alias("b"), "doc_id")
              .where(F.col("a.split") != F.col("b.split")).count())
    assert moved > 0  # different salt -> different assignment somewhere


def test_split_assign_rejects_bad_weights(spark):
    with pytest.raises(ValueError, match="weights"):
        packing.split_assign(_docs(spark), weights=(("train", 0),))


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def _py_chunks(doc_id, tokens, chunk, overlap):
    stride = chunk - overlap
    n = len(tokens)
    if n == 0:
        return []
    out = []
    for start in range(0, max(n - overlap - 1, 0) + 1, stride):
        piece = tokens[start:start + chunk]
        out.append((doc_id, start // stride, start, len(piece),
                    " ".join(piece)))
    return out


def test_chunks_match_python_reference(spark):
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(n)))
            for i, n in enumerate([1, 7, 8, 9, 24, 25, 31, 32, 33,
                                   40, 56, 57, 80, 99])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(tuple(r) for r in packing.chunk_documents(
        df, chunk_tokens=32, overlap=8).collect())
    want = sorted(t for i, txt in rows
                  for t in _py_chunks(i, txt.split(), 32, 8))
    assert got == [tuple(w) for w in want]


def test_chunks_cover_every_token_and_overlap_exactly(spark):
    got = packing.chunk_documents(_docs(spark), chunk_tokens=32,
                                  overlap=8).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        # contiguous indices, stride-spaced starts
        for k, r in enumerate(chunks):
            assert r["chunk_idx"] == k
            assert r["chunk_start"] == k * 24
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        n_total = last["chunk_start"] + last["n_tokens"]
        for a, b in zip(chunks, chunks[1:]):
            # consecutive chunks overlap by exactly `overlap` tokens
            a_toks = a["chunk_text"].split(" ")
            b_toks = b["chunk_text"].split(" ")
            assert a_toks[24:] == b_toks[:a["n_tokens"] - 24]
        # reconstruction: chunk 0 + each later chunk's non-overlap tail
        rebuilt = chunks[0]["chunk_text"].split(" ")
        for b in chunks[1:]:
            rebuilt += b["chunk_text"].split(" ")[8:]
        assert len(rebuilt) == n_total


def test_chunks_empty_doc_and_bad_params(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b")],
                               "doc_id bigint, text string")
    got = packing.chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    assert {r["doc_id"] for r in got} == {2}
    with pytest.raises(ValueError, match="overlap"):
        packing.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunks_plan_is_pure_codegen(spark):
    """Tokenize once below the Generate; no shuffle, no Python, no HOF."""
    df = packing.chunk_documents(_docs(spark))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "EvalPython" not in p
    assert "Generate" in p
    # the TOKEN_RE scan appears only BELOW the Generate (computed once per
    # doc, not re-inlined per chunk at the slice reference)
    above = p.split("Generate")[0]
    assert "regexp_extract_all" not in above


def test_training_corpus_equals_manual_composition(spark):
    """The end-to-end pass must BE its pieces: clean_corpus kept ∩ train
    split, chunked — composed manually — row-for-row."""
    from logstash_filter_geoip_spark.operators.curation import clean_corpus
    docs = _docs(spark)
    bench = docs.where(packing._CURATION_BENCH_SQL)
    got = packing.training_corpus(docs, bench)
    kept = {r["doc_id"] for r in
            clean_corpus(docs, bench).where("kept = 1").collect()}
    train = {r["doc_id"] for r in
             packing.split_assign(docs).where("split = 'train'").collect()}
    manual = packing.chunk_documents(
        docs.where(F.col("doc_id").isin(kept & train)))
    assert got.exceptAll(manual).count() == 0
    assert manual.exceptAll(got).count() == 0
    assert got.count() > 0
    # both gates are semi-joins: no fan-out, no dedup step needed
    p = got._jdf.queryExecution().executedPlan().toString()
    assert p.count("LeftSemi") == 2


@pytest.mark.parametrize("chunk,overlap", [(2, 0), (5, 1), (7, 6), (32, 8)])
def test_chunks_exhaustive_lengths(spark, chunk, overlap):
    """Every token count 0..120 against the Python reference for each
    (chunk, overlap) shape — boundary-complete, one Spark job per shape."""
    rows = [(n, " ".join(f"w{j}" for j in range(n))) for n in range(121)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(tuple(r) for r in packing.chunk_documents(
        df, chunk_tokens=chunk, overlap=overlap).collect())
    want = sorted(t for n, txt in rows
                  for t in _py_chunks(n, txt.split() if txt else [],
                                      chunk, overlap))
    assert got == [tuple(w) for w in want]


# ---------------------------------------------------------------------------
# curriculum_order (session 17)
# ---------------------------------------------------------------------------


def test_curriculum_global_pos_is_the_global_rank(spark):
    """global_pos must be a permutation of 0..n-1 that sorts exactly by
    (band, shard, sort_key, doc_id) — the offset arithmetic equals one
    genuine global rank (the oracle recomputes it as a single
    row_number; here the independent driver-side check)."""
    rows = packing.curriculum_order(_docs(spark)).collect()
    n = len(rows)
    assert sorted(r.global_pos for r in rows) == list(range(n))
    key = {r.doc_id: (r.band, r.shard,
                      md5_hash60_py(f"curr:{packing.CURRICULUM_SALT}:"
                                    f"{r.doc_id}"), r.doc_id)
           for r in rows}
    by_pos = sorted(rows, key=lambda r: r.global_pos)
    assert [r.doc_id for r in by_pos] == sorted(
        (r.doc_id for r in rows), key=lambda d: key[d])
    # bands are contiguous ranges of the curriculum: every band-b doc
    # precedes every band-(b+1) doc
    for a, b in zip(by_pos, by_pos[1:]):
        assert a.band <= b.band


def test_curriculum_bands_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "a b c"), (3, " ".join(["t"] * 40)),
         (4, " ".join(["t"] * 200))],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_tok, r.band)
           for r in packing.curriculum_order(docs).collect()}
    # edges (8, 32, 128): NULL → 0 tokens → band 0; 3 → 0; 40 → 2; 200 → 3
    assert got == {1: (0, 0), 2: (3, 0), 3: (40, 2), 4: (200, 3)}


def test_curriculum_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = {tuple(r) for r in packing.curriculum_order(docs).collect()}
    b = {tuple(r)
         for r in packing.curriculum_order(docs.repartition(7)).collect()}
    assert a == b


def test_curriculum_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        packing.curriculum_order(docs, band_edges=())
    with pytest.raises(ValueError):
        packing.curriculum_order(docs, band_edges=(32, 8))
    with pytest.raises(ValueError):
        packing.curriculum_order(docs, band_edges=(8, 8, 32))
    with pytest.raises(ValueError):
        packing.curriculum_order(docs, shards_per_band=0)
