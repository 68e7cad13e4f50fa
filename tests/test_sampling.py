"""Semantics of the sampling/selection/anomaly operators beyond the oracle:
determinism under repartitioning, rate-bound validation, total-order
tiebreaks, and the integer spike rule's edges."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
from logstash_filter_geoip_spark.operators import aggregate as agg
from logstash_filter_geoip_spark.operators.sampling import (group_topk,
                                                            sample_stratified)

SF = "/root/testdata/sf0.001"


def test_sample_deterministic_under_repartition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rates = {"en": 0.5, "de": 0.25}
    a = {r[0] for r in sample_stratified(docs, "lang", "doc_id", rates, 0.1)
         .select("doc_id").collect()}
    b = {r[0] for r in sample_stratified(docs.repartition(13), "lang",
                                         "doc_id", rates, 0.1)
         .select("doc_id").collect()}
    assert a == b and a
    # python recomputation of the keep rule agrees row for row
    rows = docs.select("doc_id", "lang").collect()
    expect = {r.doc_id for r in rows
              if md5_hash60_py(str(r.doc_id)) % 1_000_000
              < round(rates.get(r.lang, 0.1) * 1_000_000)}
    assert a == expect


def test_sample_rate_bounds():
    with pytest.raises(ValueError):
        from logstash_filter_geoip_spark.operators.sampling import _rate_ppm
        _rate_ppm(1.5)


def test_sample_zero_and_one(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    assert sample_stratified(docs, "lang", "doc_id", {}, 0.0).count() == 0
    assert sample_stratified(docs, "lang", "doc_id", {}, 1.0).count() == n


def test_group_topk_total_order(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = group_topk(docs, ["lang"], "n_chars", 2, "doc_id").collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    all_rows = docs.collect()
    for lang, rows in by_lang.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == \
            list(range(1, len(rows) + 1))
        expect = sorted((r for r in all_rows if r.lang == lang),
                        key=lambda r: (-r.n_chars, r.doc_id))[:2]
        got = sorted(rows, key=lambda r: r.rank)
        assert [r.doc_id for r in got] == [r.doc_id for r in expect]


def test_zscore_outliers_matches_driver_recompute(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {r.event_id for r in
           agg.zscore_outliers(ev, ("event_type",), "value", 2.0).collect()}
    import statistics
    rows = ev.select("event_id", "event_type", "value").collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(r)
    expect = set()
    for g in groups.values():
        vals = [r.value for r in g]
        mu = statistics.fmean(vals)
        sd = statistics.pstdev(vals)
        expect |= {r.event_id for r in g if abs(r.value - mu) > 2.0 * sd}
    assert got == expect


def test_rate_spikes_edges(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base, 0.0)] * 4 \
        + [("a", base + datetime.timedelta(days=1), 0.0)] * 5 \
        + [("a", base + datetime.timedelta(days=2), 0.0)] * 6 \
        + [("b", base, 0.0)] * 10
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {(r.event_type, r.bucket_ts.day): (r.n_events, r.prev_events, r.is_spike)
           for r in agg.rate_spikes(df, "event_type", "ts",
                                    bucket="day", factor=(5, 4)).collect()}
    assert out[("a", 1)] == (4, None, 0)      # first bucket: never a spike
    assert out[("a", 2)] == (5, 4, 0)          # 4*5 == 5*4 — strict, no spike
    assert out[("a", 3)] == (6, 5, 0)          # 24 < 25 — below threshold
    assert out[("b", 1)] == (10, None, 0)
    # a genuine jump: 4*11 > 5*5
    df2 = df.union(spark.createDataFrame(
        [("a", base + datetime.timedelta(days=3), 0.0)] * 11,
        "event_type string, ts timestamp, value double"))
    out2 = {(r.event_type, r.bucket_ts.day): r.is_spike
            for r in agg.rate_spikes(df2, "event_type", "ts").collect()}
    assert out2[("a", 4)] == 1


def test_quality_sample_single_scan_no_join(spark):
    """quality_sample: the computed stratum folds into one codegen scan —
    no Join, no Exchange, no Python (the flag and keep rule are one
    projection over the parquet scan)."""
    from logstash_filter_geoip_spark.operators.sampling import \
        q_quality_sample
    out = q_quality_sample(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    rows = out.collect()
    # both strata survive at their very different rates
    keeps = {r["keep"] for r in rows}
    assert keeps <= {0, 1} and 1 in keeps


def test_sample_exact_k_semantics(spark):
    from logstash_filter_geoip_spark.operators.sampling import (
        sample_exact_k, sample_exact_k_global)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k = 7
    out = sample_exact_k(docs, "lang", "doc_id", k)
    per = {(r.lang): r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(k, n) for lang, n in sizes.items()}
    # deterministic under repartitioning (a sequential reservoir is not)
    a = sorted(r.doc_id for r in out.select("doc_id").collect())
    b = sorted(r.doc_id for r in
               sample_exact_k(docs.repartition(13), "lang", "doc_id", k)
               .select("doc_id").collect())
    assert a == b
    # python recomputation of the min-k rule agrees exactly
    rows = [(r.doc_id, r.lang) for r in docs.select("doc_id", "lang").collect()]
    expect = []
    for lang in sizes:
        ranked = sorted(
            (md5_hash60_py(f"ksample:ksample-v1:{d}"), d)
            for d, lg in rows if lg == lang)
        expect += [d for _, d in ranked[:k]]
    assert a == sorted(expect)
    # a different salt is an independent draw (overlap but not equality)
    c = sorted(r.doc_id for r in
               sample_exact_k(docs, "lang", "doc_id", k, salt="other")
               .select("doc_id").collect())
    assert c != a
    # global variant: k smallest over the whole input, same hash family
    g = sorted(r.doc_id for r in
               sample_exact_k_global(docs, "doc_id", 11).collect())
    ranked_all = sorted((md5_hash60_py(f"ksample:ksample-v1:{d}"), d)
                        for d, _ in rows)
    assert g == sorted(d for _, d in ranked_all[:11])
    with pytest.raises(ValueError):
        sample_exact_k(docs, "lang", "doc_id", 0)


def test_mixture_sample_matches_integer_rule(spark):
    """The selected sample is exactly the k_d hash-smallest keys per
    stratum with k_d from the T = min(n_d*W//w_d) rule — recomputed
    independently in Python over the collected input."""
    from logstash_filter_geoip_spark.operators.sampling import (
        MIXTURE_TARGETS, mixture_sample)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = mixture_sample(docs, "lang", "doc_id", MIXTURE_TARGETS)
    got = {(r.doc_id, r.lang, r.sample_rank) for r in
           out.select("doc_id", "lang", "sample_rank").collect()}

    rows = docs.select("doc_id", "lang").collect()
    W = sum(w for _, w in MIXTURE_TARGETS)
    by = {}
    for r in rows:
        by.setdefault(r.lang, []).append(r.doc_id)
    t_total = min(len(by[s]) * W // w for s, w in MIXTURE_TARGETS)
    expect = set()
    for s, w in MIXTURE_TARGETS:
        k = w * t_total // W
        ranked = sorted(
            by[s], key=lambda d: (md5_hash60_py(f"ksample:mixture-v1:{d}"),
                                  d))
        expect |= {(d, s, i + 1) for i, d in enumerate(ranked[:k])}
    assert got == expect and got

    # achieved mixture is within one floor step of the target shares
    n_by = {s: sum(1 for *_x, lang, _r in [(g[0], g[1], g[2]) for g in got]
                   if lang == s) for s, _ in MIXTURE_TARGETS}
    tot = sum(n_by.values())
    for s, w in MIXTURE_TARGETS:
        assert abs(n_by[s] - w * tot / W) <= len(MIXTURE_TARGETS)


def test_mixture_sample_deterministic_under_repartition(spark):
    from logstash_filter_geoip_spark.operators.sampling import (
        MIXTURE_TARGETS, mixture_sample)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {tuple(r) for r in mixture_sample(
        docs, "lang", "doc_id", MIXTURE_TARGETS)
        .select("doc_id", "sample_rank").collect()}
    b = {tuple(r) for r in mixture_sample(
        docs.repartition(13), "lang", "doc_id", MIXTURE_TARGETS)
        .select("doc_id", "sample_rank").collect()}
    assert a == b and a


def test_mixture_sample_validation(spark):
    from logstash_filter_geoip_spark.operators.sampling import mixture_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError, match="empty"):
        mixture_sample(docs, "lang", "doc_id", [])
    with pytest.raises(ValueError, match="duplicate"):
        mixture_sample(docs, "lang", "doc_id", [("en", 1), ("en", 2)])
    with pytest.raises(ValueError, match="positive integer"):
        mixture_sample(docs, "lang", "doc_id", [("en", 0.5)])
    with pytest.raises(ValueError, match="infeasible"):
        mixture_sample(docs, "lang", "doc_id", [("en", 1), ("xx", 1)])


def test_mixture_gap_enumerates_both_sides(spark):
    from logstash_filter_geoip_spark.operators.sampling import (
        mixture_gap)
    df = spark.createDataFrame(
        [("en",)] * 6 + [("de",)] * 2 + [("xx",)] + [(None,)],
        "lang string")
    targets = [("en", 50), ("de", 25), ("fr", 25)]
    rows = {r.stratum: r for r in
            mixture_gap(df, "lang", targets).collect()}
    # observed ∪ target strata, incl. the NULL stratum and both one-sided
    # arms (fr target-only, xx/None observed-only)
    assert set(rows) == {"en", "de", "fr", "xx", None}
    assert (rows["en"].n_rows, rows["en"].obs_ppm,
            rows["en"].target_ppm) == (6, 600000, 500000)
    assert rows["en"].gap_ppm == 100000
    assert (rows["fr"].n_rows, rows["fr"].obs_ppm,
            rows["fr"].target_ppm, rows["fr"].gap_ppm) == (0, 0, 250000,
                                                           -250000)
    assert (rows["xx"].n_rows, rows["xx"].target_ppm) == (1, 0)
    assert (rows[None].n_rows, rows[None].obs_ppm) == (1, 100000)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mixture_gap(df, "lang", [])
    with _pytest.raises(ValueError):
        mixture_gap(df, "lang", [("en", 0)])
