from __future__ import annotations

from logstash_filter_geoip_spark.operators.dedup import dedup_components


def test_components_label_propagation(spark):
    # two components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; singleton 8
    # appears in no pair → not in output (nothing to dedup)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 7)], ["doc_a", "doc_b"])
    out = {r["doc_id"]: (r["component_id"], r["keep"])
           for r in dedup_components(pairs).collect()}
    assert out == {1: (1, 1), 2: (1, 0), 3: (1, 0), 9: (1, 0),
                   5: (5, 1), 7: (5, 0)}


def test_components_on_real_pairs(spark):
    from logstash_filter_geoip_spark.operators.dedup import ngram_jaccard_pairs
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = ngram_jaccard_pairs(docs)
    comp = dedup_components(pairs)
    n_pairs_docs = (pairs.select("doc_a").union(pairs.select("doc_b"))
                    .distinct().count())
    assert comp.count() == n_pairs_docs
    # exactly one keeper per component
    from pyspark.sql import functions as F
    per = comp.groupBy("component_id").agg(F.sum("keep").alias("k"))
    assert per.where(F.col("k") != 1).count() == 0

def test_components_lineage_stays_shallow(spark):
    """The returned frame must be rooted at a checkpointed RDD, not the full
    per-round join lineage back to the input (VERDICT r1 #5)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], ["doc_a", "doc_b"])  # one chain
    out = dedup_components(pairs, max_iter=20)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan
    assert "Join" not in plan, f"unexpected join lineage in final plan:\n{plan}"
    # the 11-node chain converges to a single component kept by doc 1
    rows = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert set(rows.values()) == {1}


def test_components_default_reaches_fixpoint_on_long_chain(spark):
    """ADVICE r3: no silent iteration cap — the default runs to a true
    fixpoint even when the component diameter exceeds the old cap of 20,
    matching the exact WITH RECURSIVE closure the driver oracle computes."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], ["doc_a", "doc_b"])  # diam 39
    rows = {r["doc_id"]: r["component_id"]
            for r in dedup_components(pairs).collect()}
    assert set(rows.values()) == {1}
    assert len(rows) == 40


def test_components_raises_when_cap_hit(spark):
    """An explicit max_iter that truncates propagation must be LOUD (raise),
    never a warning that lets a refinement diverge from the exact oracle."""
    import pytest
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], ["doc_a", "doc_b"])  # long chain
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(pairs, max_iter=2).collect()
