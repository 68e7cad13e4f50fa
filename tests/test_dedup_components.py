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