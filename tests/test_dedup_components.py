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


def test_keep_best_picks_quality_winner_not_min_id(spark):
    """Canonical selection: the keeper is the quality-kept doc with the
    most tokens (tie → min doc_id) — NOT the min-id doc; singletons keep
    themselves; NULL-text docs rank last (NULLS LAST both engines)."""
    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators.dedup import keep_best

    good = ("the quick brown fox jumps over the lazy dog and then "
            "the fox naps for a while in the sun")
    better = good + " and the dog naps too under the same warm sun"
    docs = spark.createDataFrame(
        [(1, "short txt"),          # min-id, fails the quality keep rule
         (2, good),                 # kept, fewer tokens
         (3, better),              # kept, most tokens → the keeper
         (4, "a lone singleton document that is long enough to be kept "
             "by the quality rule with the usual stopwords in it"),
         (5, None),                 # NULL text → ranks last
         (6, good)],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  ["doc_a", "doc_b"])
    out = {r.doc_id: (r.component_id, r.keep)
           for r in keep_best(docs, pairs=pairs).collect()}
    assert out == {1: (1, 0), 2: (1, 0), 3: (1, 1),
                   4: (4, 1), 5: (5, 0), 6: (5, 1)}

    res = keep_best(docs, pairs=pairs)
    # exactly one keeper per component, every doc labeled
    per = res.groupBy("component_id").agg(F.sum("keep").alias("k"))
    assert per.where(F.col("k") != 1).count() == 0
    assert res.count() == docs.count()


def test_keep_best_plan_merge_joins_components(spark):
    """The component relation is corpus-derived → its join back to the
    quality projection must be an SMJ (merge-hinted), never a
    static-estimate broadcast; no Python in the plan."""
    from logstash_filter_geoip_spark.operators.dedup import keep_best
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    plan = (keep_best(docs, pairs=pairs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
