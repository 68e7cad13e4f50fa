"""Similarity-suite tests: bounded brute force, IVF recall, LSH near-dup
recall/precision, and the no-nested-loop plan contract (VERDICT r1 items
2/3/7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logstash_filter_geoip_spark.operators import similarity as sim
from logstash_filter_geoip_spark.plans.checks import physical_plan
from tests.conftest import SF_ORACLE

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("emb", T.ArrayType(T.DoubleType())),
    T.StructField("label", T.StringType()),
])


def _planted(spark, n_base: int = 40, dim: int = 32, dup_every: int = 4):
    """Deterministic corpus: every dup_every-th base vector gets a slightly
    perturbed copy with cosine > 0.99 (a guaranteed near-dup pair); all other
    pairs are i.i.d. gaussian (cosine concentrated near 0 at dim=32)."""
    rng = np.random.default_rng(7)
    rows, expected = [], set()
    vid = 0
    for i in range(n_base):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v], f"base{i}"))
        base_id = vid
        vid += 1
        if i % dup_every == 0:
            w = v + 0.05 * rng.standard_normal(dim)
            w /= np.linalg.norm(w)
            cos = float(v @ w)
            if cos >= sim.NEAR_DUP_SIM:
                expected.add((base_id, vid))
            rows.append((vid, [float(x) for x in w], f"dup{i}"))
            vid += 1
    return spark.createDataFrame(rows, EMB_SCHEMA), expected


def test_near_dup_lsh_matches_allpairs_planted(spark):
    df, expected = _planted(spark)
    assert expected, "fixture must plant at least one qualifying pair"
    got = {(r["vec_a"], r["vec_b"])
           for r in sim.embedding_near_dup(df).collect()}
    exact = {(r["vec_a"], r["vec_b"])
             for r in sim.embedding_near_dup_allpairs(df).collect()}
    assert exact == expected
    # recall bound 1 - 1.7e-8 at the threshold → exact equality expected here
    assert got == exact


def test_near_dup_lsh_matches_allpairs_sf001(spark):
    e = sim._emb(spark, SF_ORACLE)
    got = {(r["vec_a"], r["vec_b"]) for r in sim.embedding_near_dup(e).collect()}
    exact = {(r["vec_a"], r["vec_b"])
             for r in sim.embedding_near_dup_allpairs(e).collect()}
    assert got == exact


def test_near_dup_plan_has_no_nested_loop(spark):
    e = sim._emb(spark, SF_ORACLE)
    plan = physical_plan(sim.embedding_near_dup(e))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_brute_force_query_set_is_bounded(spark):
    e = sim._emb(spark, SF_ORACLE)
    out = sim.brute_force_topk(e, max_queries=7)
    qs = out.select("query_id").distinct().collect()
    assert len(qs) == 7
    # deterministic choice: the 7 smallest qualifying vec_ids
    assert sorted(r["query_id"] for r in qs) == [0, 10, 20, 30, 40, 50, 60]


def test_brute_force_exact_on_planted(spark):
    """Each planted dup must be its base's rank-1 neighbor."""
    df, expected = _planted(spark)
    out = sim.brute_force_topk(df, query_mod=1, max_queries=1000)
    rank1 = {r["query_id"]: r["neighbor_id"]
             for r in out.where("rank = 1").collect()}
    for a, b in expected:
        assert rank1[a] == b and rank1[b] == a


def _clustered(spark, n_clusters: int = 20, per_cluster: int = 30,
               dim: int = 32):
    """Gaussian-mixture corpus: tight clusters, the realistic embedding
    shape IVF is built for (sf testdata embeddings are near-random, where
    ANY IVF's recall is bounded by the probed fraction)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.15 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v], f"c{c}"))
            vid += 1
    return spark.createDataFrame(rows, EMB_SCHEMA)


def test_ivf_recall_at_k_clustered(spark):
    e = _clustered(spark)
    bf = {(r["query_id"], r["neighbor_id"])
          for r in sim.brute_force_topk(e, query_mod=7, max_queries=64).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in sim.ivf_topk(e, query_mod=7, max_queries=64).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.9, f"IVF recall@{sim.TOP_K} = {recall:.3f}"


def test_ivf_centroid_count_is_fixed(spark):
    """Fixed-k contract: the quantizer size never grows with N."""
    e = sim._emb(spark, SF_ORACLE)
    out = sim.ivf_topk(e, n_cells=8, nprobe=8)  # nprobe = n_cells → exhaustive
    bf = {(r["query_id"], r["neighbor_id"])
          for r in sim.brute_force_topk(e).collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    assert got == bf  # probing every cell must reproduce brute force


def test_semantic_dedup_exact_planted(spark):
    """n_cells=1 (exact all-pairs): keep=0 for exactly the planted dup
    copies (the larger id of each qualifying pair), keep=1 elsewhere."""
    df, expected = _planted(spark)
    assert expected
    out = {r["vec_id"]: r["keep"]
           for r in sim.semantic_dedup(df, n_cells=1).collect()}
    dup_ids = {b for _, b in expected}
    assert out.keys() == {r["vec_id"] for r in df.select("vec_id").collect()}
    assert {v for v, k in out.items() if k == 0} == dup_ids


def test_semantic_dedup_clustered_multicell(spark):
    """Clustering can only MISS qualifying pairs, never invent them: the
    multi-cell keep=0 set is a subset of the exact one, with high recall
    on the clustered fixture (same-cluster dups land in the same cell)."""
    e = _clustered(spark)
    exact = {v for v, k in
             ((r["vec_id"], r["keep"]) for r in
              sim.semantic_dedup(e, threshold=0.75, n_cells=1).collect())
             if k == 0}
    multi = {v for v, k in
             ((r["vec_id"], r["keep"]) for r in
              sim.semantic_dedup(e, threshold=0.75, n_cells=20).collect())
             if k == 0}
    assert exact, "fixture must produce semantic dups at 0.75"
    assert multi <= exact
    assert len(multi) / len(exact) >= 0.9


def test_semantic_dedup_plan_no_nested_loop(spark):
    e = _clustered(spark)
    plan = physical_plan(sim.semantic_dedup(e, n_cells=4))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------


def test_quantize_roundtrip_error_bound(spark):
    """Element error <= scale/2 and cosine(original, dequantized) stays
    near 1 — the property that makes int8 storage usable for ANN."""
    e = sim._emb(spark, SF_ORACLE)
    orig = {r["vec_id"]: np.array(r["emb"]) for r in
            e.select("vec_id", "emb").collect()}
    got = sim.quantize_embeddings(e).collect()
    assert len(got) == len(orig)
    for r in got:
        x = orig[r["vec_id"]]
        deq = np.array(r["qvec"], dtype=np.float64) * r["scale"]
        assert np.all(np.abs(x - deq) <= r["scale"] / 2 + 1e-12)
        assert max(abs(v) for v in r["qvec"]) <= 127
        cos = float(np.dot(x, deq)
                    / max(np.linalg.norm(x) * np.linalg.norm(deq), 1e-300))
        assert cos >= 0.999


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id bigint, emb array<double>")
    got = {r["vec_id"]: r for r in sim.quantize_embeddings(df).collect()}
    assert got[1]["scale"] == 0.0 and got[1]["qvec"] == [0, 0, 0]
    assert got[2]["qvec"] == [64, -127, 32]  # floor(x*127/2 + 0.5)


def test_quantize_plan_one_arrow_pass(spark):
    from logstash_filter_geoip_spark.plans.checks import simple_plan
    e = sim._emb(spark, SF_ORACLE)
    p = simple_plan(sim.quantize_embeddings(e))
    assert p.count("ArrowEvalPython") == 1
    assert "Exchange" not in p and "Join" not in p
    assert "BatchEvalPython" not in p


def test_quantized_ann_recall(spark):
    """The serving-path property: brute-force top-k over DEQUANTIZED int8
    vectors recovers >=0.9 of the exact fp32 neighbor sets."""
    e = sim._emb(spark, SF_ORACLE)
    q = sim.quantize_embeddings(e).collect()
    deq = spark.createDataFrame(
        [(r["vec_id"],
          [v * r["scale"] for v in r["qvec"]]) for r in q],
        "vec_id bigint, emb array<double>")
    exact = {}
    for r in sim.brute_force_topk(e).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in sim.brute_force_topk(deq).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert exact and set(exact) == set(approx)
    hits = sum(len(exact[k] & approx[k]) for k in exact)
    total = sum(len(exact[k]) for k in exact)
    assert hits / total >= 0.9


def test_truncate_embeddings_properties(spark):
    """Unit norm after truncation, direction preserved (proportional to the
    raw prefix), zero-vector passthrough, guard."""
    import math
    import pytest as _pytest
    from logstash_filter_geoip_spark.operators.similarity import \
        truncate_embeddings
    rows = [(0, [3.0, 4.0, 100.0, 100.0]),
            (1, [0.0, 0.0, 5.0, 5.0]),        # zero prefix -> stays zeros
            (2, [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.tvec
           for r in truncate_embeddings(df, k=2).collect()}
    assert abs(math.hypot(*got[0]) - 1.0) < 1e-12
    assert abs(got[0][0] / got[0][1] - 3.0 / 4.0) < 1e-12
    assert got[1] == [0.0, 0.0]
    assert got[2] == [1.0, 0.0]
    with _pytest.raises(ValueError, match="k must be"):
        truncate_embeddings(df, k=0)


def test_truncate_cosine_degrades_gracefully(spark):
    """Truncated-cosine ranking sanity: on SYNTHETIC (non-MRL-trained)
    vectors a 16-of-64 prefix carries only its proportional share of the
    signal, so exact top-5 recall is far from 1 — but it must beat the
    random baseline (~5/499 ≈ 1%) by an order of magnitude, proving the
    operator ranks by the prefix geometry and not noise. (On real
    matryoshka-TRAINED embeddings the prefix concentrates the energy and
    recall approaches the full-dim ranking — a model property, not an
    operator property.)"""
    from logstash_filter_geoip_spark.operators.similarity import (
        brute_force_topk, _emb)
    emb = _emb(spark, "/root/testdata/sf0.001")
    full = {(r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, k=5).collect()}
    from logstash_filter_geoip_spark.operators.similarity import \
        truncate_embeddings
    t = truncate_embeddings(emb, k=16, emb_col="emb") \
        .select("vec_id", __import__("pyspark").sql.functions.col("tvec")
                .alias("emb"))
    trunc = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(t, k=5).collect()}
    recall = len(full & trunc) / len(full)
    assert recall >= 0.05, recall   # ≥5× the ~1% random baseline
