"""Integer k-means semantics beyond the oracle: pure-Python third-engine
equality, determinism under repartitioning, empty-cluster freeze, clamp
rule, argument validation, and the assignment plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
from logstash_filter_geoip_spark.operators import clustering as km

SF = "/root/testdata/sf0.001"


def _int_vec_py(vec):
    out = []
    for x in vec:
        q = math.floor(float(x) * km.SCALE + 0.5)
        out.append(min(max(q, -km.SHIFT), km.SHIFT) + km.SHIFT)
    return out


def _kmeans_py(vecs: dict[int, list[float]], k: int, n_iter: int):
    """Pure-Python reference: same init rank, same (dist2, cid) total
    order, same truncating non-negative mean, same empty-cluster freeze."""
    iv = {vid: _int_vec_py(v) for vid, v in vecs.items()}
    order = sorted(iv, key=lambda vid: (md5_hash60_py(str(vid)), vid))
    cents = [iv[vid][:] for vid in order[:k]]

    def assign(c):
        out = {}
        for vid, x in iv.items():
            dists = [sum((a - b) * (a - b) for a, b in zip(x, cj))
                     for cj in c]
            m = min(dists)
            out[vid] = (dists.index(m), m)
        return out

    for _ in range(n_iter):
        a = assign(cents)
        for j in range(k):
            members = [iv[vid] for vid, (cid, _) in a.items() if cid == j]
            if members:
                n = len(members)
                cents[j] = [sum(col) // n for col in zip(*members)]
    return assign(cents)


def test_kmeans_matches_python_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {r.vec_id: (r.cid, r.dist2)
           for r in km.kmeans_assign(emb).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    expect = _kmeans_py(vecs, km.K_CLUSTERS, km.N_ITER)
    assert got == expect


def test_kmeans_deterministic_under_repartition(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(tuple(r) for r in km.kmeans_assign(emb).collect())
    b = sorted(tuple(r) for r in
               km.kmeans_assign(emb.repartition(13)).collect())
    assert a == b and a


def test_kmeans_empty_cluster_frozen(spark):
    # 4 identical vectors: both init centroids coincide, every row
    # tie-breaks to cid 0, cluster 1 never gets members — its centroid
    # stays frozen and the run still terminates deterministically
    rows = [(i, [0.1] * 4) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = km.kmeans_assign(emb, k=2, n_iter=2, dim=4).collect()
    assert {r.cid for r in out} == {0}
    assert all(r.dist2 == 0 for r in out)
    summ = km.kmeans_summary(emb, k=2, n_iter=2, dim=4).collect()
    assert [(r.cid, r.n_members, r.inertia) for r in summ] == [(0, 4, 0)]


def test_kmeans_clamp_extremes(spark):
    # coordinates beyond ±SHIFT/SCALE clamp identically in the Spark rule
    # and the Python mirror (the oracle SQL shares the spelling verbatim)
    rows = [(0, [9.9, -9.9]), (1, [0.0, 0.0]), (2, [9.8, -9.8])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    iv = {r.vec_id: [r[f"x{i}"] for i in range(2)]
          for r in km.int_vectors(emb, dim=2).collect()}
    assert iv[0] == [2 * km.SHIFT, 0]
    assert iv[2] == [2 * km.SHIFT, 0]  # clamp collapses 9.8 and 9.9
    got = {r.vec_id: (r.cid, r.dist2)
           for r in km.kmeans_assign(emb, k=2, n_iter=1, dim=2).collect()}
    expect = _kmeans_py({r[0]: r[1] for r in rows}, 2, 1)
    assert got == expect


def test_kmeans_validation(spark):
    emb = spark.createDataFrame([(0, [0.1, 0.2])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k >= 1"):
        km.kmeans_assign(emb, k=0, dim=2)
    with pytest.raises(ValueError, match="exceeds"):
        km.kmeans_assign(emb, k=5, dim=2)


def test_kmeans_assignment_plan_shape(spark):
    # the returned assignment is ONE narrow codegen scan: no Exchange, no
    # Python, no HOF — every Lloyd round's shuffle (the K-group aggregate)
    # has already executed by construction
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = km.kmeans_assign(emb, n_iter=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
    # the leading `*(1)` star is the whole-stage-codegen marker
    assert plan.lstrip().startswith("*(")
