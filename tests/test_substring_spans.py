"""substring_span_stats (ExactSubstr gram audit): crafted-corpus semantics,
hash-basis equivalence, and a pure-Python reference fold.

The crafted corpus pins the owner rule (corpus-wide first occurrence by
(doc_id, pos)), the interval-union token coverage (overlapping removable
spans must not double-count), and the edge rows (NULL text, short doc).
"""

from __future__ import annotations

import pytest

from logstash_filter_geoip_spark.operators.dedup import (SPAN_W_DRIVER,
                                                         substring_span_stats)

W = 4

DOCS = [
    # doc 0: the canonical owner of the repeated run "a b c d e f"
    (0, "a b c d e f tail0 tail1"),
    # doc 1: clone of the run → its spans are removable; the clone run is
    # 6 tokens = three overlapping 4-grams → union coverage = 6 tokens
    (1, "a b c d e f other words here"),
    # doc 2: repeats a span WITHIN itself (second occurrence removable)
    (2, "x y z w pad1 pad2 x y z w"),
    # doc 3: unique text, no dup spans
    (3, "unique tokens never repeated anywhere else at all"),
    # doc 4: shorter than the window → zero spans
    (4, "too short"),
    # doc 5: NULL text → zero tokens, zero spans
    (5, None),
]


def _stats(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = substring_span_stats(df, width=W, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def _py_reference():
    """Independent pure-Python fold of the same definition."""
    import re
    toks = {d: re.findall("[a-z0-9]+", (t or "").lower()) for d, t in DOCS}
    occ = {}  # gram -> list[(doc, pos)]
    for d, tk in toks.items():
        for i in range(len(tk) - W + 1):
            occ.setdefault(tuple(tk[i:i + W]), []).append((d, i))
    out = {d: {"doc_id": d, "n_tokens": len(tk), "n_spans": 0,
               "n_dup_spans": 0, "n_removed_spans": 0,
               "n_removed_tokens": 0} for d, tk in toks.items()}
    removed = {d: set() for d in toks}
    for g, where in occ.items():
        owner = min(where)
        for d, p in where:
            out[d]["n_spans"] += 1
            if len(where) > 1:
                out[d]["n_dup_spans"] += 1
                if (d, p) != owner:
                    out[d]["n_removed_spans"] += 1
                    removed[d].update(range(p, p + W))
    for d in toks:
        out[d]["n_removed_tokens"] = len(removed[d])
    return out


@pytest.mark.parametrize("basis", ["native", "md5"])
def test_crafted_corpus_matches_python_reference(spark, basis):
    got = _stats(spark, hash_basis=basis)
    assert got == _py_reference()


def test_owner_and_coverage_semantics(spark):
    got = _stats(spark)
    # doc 0 owns the shared run: duplicated but nothing removable
    assert got[0]["n_dup_spans"] == 3 and got[0]["n_removed_spans"] == 0
    assert got[0]["n_removed_tokens"] == 0
    # doc 1's clone: 3 overlapping removable 4-grams cover 6 tokens (union,
    # not 3*4=12)
    assert got[1]["n_removed_spans"] == 3
    assert got[1]["n_removed_tokens"] == 6
    # doc 2's self-repeat: second occurrence removable, 4 tokens cut
    assert got[2]["n_removed_spans"] == 1
    assert got[2]["n_removed_tokens"] == 4
    # unique doc: spans counted, nothing duplicated
    assert got[3]["n_dup_spans"] == 0 and got[3]["n_spans"] == 5
    # short + NULL rows survive with zeros
    assert got[4] == {"doc_id": 4, "n_tokens": 2, "n_spans": 0,
                      "n_dup_spans": 0, "n_removed_spans": 0,
                      "n_removed_tokens": 0}
    assert got[5]["n_tokens"] == 0 and got[5]["n_spans"] == 0


def test_bad_width_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_span_stats(df, width=1)


def test_driver_width_constant_sane():
    assert 2 <= SPAN_W_DRIVER <= 16  # sf0.01 docs average ~60 tokens
