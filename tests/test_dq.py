"""Data-quality expectations: NULL-is-violation semantics, duplicate-key
counting (exact and sketch), and quarantine labels on crafted rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import dq


def _df(spark):
    rows = [
        (1, 10.0),      # clean
        (2, None),      # value NULL -> range check must count a violation
        (None, 5.0),    # key NULL
        (4, -1.0),      # out of range
        (4, 3.0),       # duplicate key
        (4, 4.0),       # duplicate key again
    ]
    return spark.createDataFrame(rows, "id bigint, value double")


def _checks():
    # built lazily: Column construction needs an active session
    return {
        "id_not_null": F.col("id").isNotNull(),
        "value_in_range": (F.col("value") >= 0) & (F.col("value") <= 100),
    }


def test_dq_summary_null_condition_is_violation(spark):
    got = {r["check"]: (r["n_violations"], r["n_rows"], r["violation_ppm"])
           for r in dq.dq_summary(_df(spark), _checks(),
                                  unique_key="id").collect()}
    # value NULL makes the range predicate NULL -> counted as a violation
    assert got["value_in_range"] == (2, 6, 333333)
    assert got["id_not_null"] == (1, 6, 166666)
    # 5 non-null keys, 3 distinct -> 2 surplus duplicate rows
    assert got["unique_id"] == (2, 6, 333333)


def test_dq_summary_approx_unique_runs(spark):
    got = {r["check"]: r["n_violations"]
           for r in dq.dq_summary(_df(spark), _checks(), unique_key="id",
                                  unique_approx=True).collect()}
    # HLL is exact at this cardinality; the contract is "runs and is sane"
    assert got["unique_id"] == 2


def test_dq_quarantine_labels(spark):
    rows = {(r["id"], r["value"]): (r["violations"], r["passed"])
            for r in dq.dq_quarantine(_df(spark), _checks()).collect()}
    assert rows[(1, 10.0)] == ([], True)
    assert rows[(2, None)] == (["value_in_range"], False)
    assert rows[(None, 5.0)] == (["id_not_null"], False)
    assert rows[(4, -1.0)] == (["value_in_range"], False)


def test_event_checks_fire_on_real_data(spark):
    import __spark_entry__ as em
    from tests.conftest import SF_SMOKE
    got = {r["check"]: r["n_violations"]
           for r in em.queries()["dq_summary"](spark, SF_SMOKE).collect()}
    assert set(got) == {n for n, _, _ in dq.EVENT_CHECKS} | {"unique_event_id"}
    # 'error' events exist in the corpus, so at least one check fires
    assert got["known_event_type"] > 0


def test_dq_plan_shape(spark):
    """dq_summary: ONE scan, hash aggregates, no join; dq_quarantine: pure
    codegen projection — no Exchange, no Python."""
    import __spark_entry__ as em
    from tests.conftest import SF_SMOKE

    s = em.queries()["dq_summary"](spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert s.count("Scan parquet") + s.count("FileScan parquet") >= 1
    assert "Join" not in s and "EvalPython" not in s

    q = em.queries()["dq_quarantine"](spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in q and "Join" not in q and "EvalPython" not in q


def test_dq_summary_empty_input(spark):
    """An empty relation must yield zero-count rows with NULL ppm, not an
    ANSI divide-by-zero error."""
    empty = _df(spark).where("id = -999")
    got = {r["check"]: (r["n_violations"], r["n_rows"], r["violation_ppm"])
           for r in dq.dq_summary(empty, _checks(),
                                  unique_key="id").collect()}
    assert got["id_not_null"] == (0, 0, None)
    assert got["unique_id"] == (0, 0, None)


# ---------------------------------------------------------------------------
# profile_columns
# ---------------------------------------------------------------------------


def test_profile_columns_crafted(spark):
    from logstash_filter_geoip_spark.operators.dq import profile_columns
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (None, "b", 2.5), (2, None, None)],
        "i bigint, s string, d double")
    rows = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(rows) == {"i", "s", "d"}
    assert all(r.n_rows == 4 for r in rows.values())
    i = rows["i"]
    assert (i.n_nulls, i.n_distinct, i.min_val, i.max_val) == (1, 2, "1", "2")
    s = rows["s"]
    assert (s.n_nulls, s.n_distinct, s.min_val, s.max_val) == (1, 2, "a", "b")
    d = rows["d"]   # double: counted, but min/max suppressed (not portable)
    assert (d.n_nulls, d.n_distinct, d.min_val, d.max_val) == (2, 2, None,
                                                               None)


def test_profile_spec_matches_schema_detection(spark):
    """EVENT_PROFILE_SPEC (the oracle's minmax flags) must equal what
    profile_columns derives from the real events schema."""
    from logstash_filter_geoip_spark.operators.dq import (_MINMAX_SAFE,
                                                          EVENT_PROFILE_SPEC)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    types = dict(ev.dtypes)
    derived = [(c, types[c] in _MINMAX_SAFE) for c, _ in EVENT_PROFILE_SPEC]
    assert derived == EVENT_PROFILE_SPEC
    assert [c for c, _ in EVENT_PROFILE_SPEC] == ev.columns


def test_profile_columns_approx_and_guards(spark):
    from logstash_filter_geoip_spark.operators.dq import profile_columns
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = {r.col_name: r.n_distinct
             for r in profile_columns(ev, ["user_id"]).collect()}
    approx = {r.col_name: r.n_distinct
              for r in profile_columns(ev, ["user_id"],
                                       approx=True).collect()}
    # HLL default rsd is 5%
    assert abs(approx["user_id"] - exact["user_id"]) <= \
        max(2, 0.1 * exact["user_id"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing columns"):
        profile_columns(ev, ["nope"])


def test_profile_columns_single_pass_no_join(spark):
    """One aggregate pass: no Join in the plan; exactly one Generate (the
    bounded unpivot explode)."""
    from logstash_filter_geoip_spark.operators.dq import profile_columns
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = profile_columns(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Generate") == 1


# ---------------------------------------------------------------------------
# table_checksum / key_skew_stats
# ---------------------------------------------------------------------------


def test_table_checksum_order_and_partition_invariant(spark):
    from logstash_filter_geoip_spark.operators.dq import table_checksum
    rows = [(1, "a"), (2, "b"), (3, None), (4, "")]
    a = spark.createDataFrame(rows, "i bigint, s string")
    b = spark.createDataFrame(list(reversed(rows)), "i bigint, s string") \
             .repartition(7)
    ca = table_checksum(a, ["i", "s"]).collect()[0]
    cb = table_checksum(b, ["i", "s"]).collect()[0]
    assert (ca.checksum60, ca.n_rows) == (cb.checksum60, cb.n_rows)
    # any single changed value changes the checksum
    c = spark.createDataFrame(rows[:-1] + [(4, "x")], "i bigint, s string")
    assert table_checksum(c, ["i", "s"]).collect()[0].checksum60 \
        != ca.checksum60


def test_table_checksum_matches_python_fold(spark):
    from functools import reduce
    from logstash_filter_geoip_spark.functions.hashing import md5_hash60_py
    from logstash_filter_geoip_spark.operators.dq import table_checksum
    rows = [(1, "a"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "i bigint, s string")
    got = table_checksum(df, ["i", "s"]).collect()[0]

    def enc(v):
        return "\x01" if v is None else "\x02" + str(v)
    want = reduce(lambda acc, r: acc ^ md5_hash60_py(
        "\x1f".join(enc(v) for v in r)), rows, 0)
    assert (got.checksum60, got.n_rows) == (want, 3)


def test_table_checksum_null_vs_empty_and_framing(spark):
    """NULL != '' and values never shift across columns."""
    from logstash_filter_geoip_spark.operators.dq import table_checksum
    a = spark.createDataFrame([(None, "x")], "s string, t string")
    b = spark.createDataFrame([("", "x")], "s string, t string")
    shift = spark.createDataFrame([("x", None)], "s string, t string")
    cs = [table_checksum(d, ["s", "t"]).collect()[0].checksum60
          for d in (a, b, shift)]
    assert len(set(cs)) == 3


def test_table_checksum_empty_and_even_duplicate_caveat(spark):
    from logstash_filter_geoip_spark.operators.dq import table_checksum
    empty = spark.createDataFrame([], "i bigint")
    r = table_checksum(empty, ["i"]).collect()[0]
    assert (r.checksum60, r.n_rows) == (0, 0)
    # the documented xor caveat: an even duplication cancels in the xor
    # but is caught by n_rows
    once = spark.createDataFrame([(1,)], "i bigint")
    twice = spark.createDataFrame([(1,), (1,)], "i bigint")
    r1 = table_checksum(once, ["i"]).collect()[0]
    r2 = table_checksum(twice, ["i"]).collect()[0]
    assert r2.checksum60 == 0 and r1.checksum60 != 0
    assert (r1.n_rows, r2.n_rows) == (1, 2)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing columns"):
        table_checksum(once, ["nope"])


def test_table_checksum_single_pass_no_exchange_but_final(spark):
    """Mergeable-aggregate claim: the plan is scan → partial agg → 1-row
    final (SinglePartition exchange only), no Join, no sort."""
    from logstash_filter_geoip_spark.operators.dq import table_checksum
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = table_checksum(ev, ["event_id", "event_type"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Sort" not in plan
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan


def test_key_skew_stats_crafted(spark):
    from logstash_filter_geoip_spark.operators.dq import key_skew_stats
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",)] + [("b",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_stats(df, ["k"], top_k=3).collect()
    assert [(r.k, r.n_rows, r.share_ppm) for r in out] == [
        ("hot", 6, 545454),       # 6/11
        ("warm", 3, 272727),
        ("a", 1, 90909),          # key-asc tiebreak over ("b", 1)
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="top_k"):
        key_skew_stats(df, ["k"], top_k=0)


def test_snapshot_diff_classes(spark):
    from logstash_filter_geoip_spark.operators.dq import snapshot_diff
    old = spark.createDataFrame(
        [("k1", 1), ("k2", 2), ("k3", None), ("k4", 4)], "k string, v int")
    new = spark.createDataFrame(
        [("k1", 9), ("k3", None), ("k4", 4), ("k5", 5)], "k string, v int")
    got = {(r.k, r.change_class, r.old_v, r.new_v)
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {
        ("k1", "changed", 1, 9),
        ("k2", "deleted", 2, None),
        ("k5", "inserted", None, 5),
    }   # k3 NULL==NULL unchanged; k4 equal unchanged — both excluded
    full = snapshot_diff(old, new, ["k"], ["v"], include_unchanged=True)
    assert {r.k for r in full.collect() if r.change_class == "unchanged"} \
        == {"k3", "k4"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing columns"):
        snapshot_diff(old, new.drop("v"), ["k"], ["v"])
    with _pytest.raises(ValueError, match="key column"):
        snapshot_diff(old, new, [], ["v"])


def test_snapshot_diff_single_join(spark):
    """One full-outer join, no second scan of either side."""
    from logstash_filter_geoip_spark.operators.dq import snapshot_diff
    a = spark.createDataFrame([("k", 1)], "k string, v int")
    b = spark.createDataFrame([("k", 2)], "k string, v int")
    plan = snapshot_diff(a, b, ["k"], ["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_crafted(spark):
    """Known group sizes (3, 2, 1, and a NULL-quasi group of 1): the NULL
    combination is its own group in BOTH the summary and DuckDB."""
    import duckdb
    rows = [("a", "x"), ("a", "x"), ("a", "x"),
            ("b", "x"), ("b", "x"),
            ("c", "y"),
            (None, "x")]
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    got = dq.k_anonymity(df, ["q1", "q2"], k=2).collect()[0]
    assert (got["n_rows"], got["n_groups"], got["n_small_groups"],
            got["rows_at_risk"], got["min_group_size"]) == (7, 4, 2, 2, 1)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q1 VARCHAR, q2 VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute("""
WITH g AS (SELECT q1, q2, count(*) AS n FROM t GROUP BY 1, 2)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT), count(*),
       CAST(coalesce(sum(CASE WHEN n < 2 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN n < 2 THEN n ELSE 0 END), 0) AS BIGINT),
       CAST(coalesce(min(n), 0) AS BIGINT)
FROM g""").fetchone()
    assert tuple(got) == tuple(want)


def test_k_anonymity_empty_input_is_zeros(spark):
    df = spark.createDataFrame([], "q1 string, q2 string")
    got = dq.k_anonymity(df, ["q1"], k=5).collect()[0]
    assert tuple(got) == (0, 0, 0, 0, 0)


def test_k_anonymity_flags_null_safe(spark):
    """The flags join must keep rows whose quasi value is NULL (a plain
    equi-join would drop them — the rows most likely to be rare)."""
    rows = [(1, "a"), (2, "a"), (3, None), (4, "b")]
    df = spark.createDataFrame(rows, "id long, q string")
    out = {r["id"]: r for r in
           dq.k_anonymity_flags(df, ["q"], k=2).collect()}
    assert set(out) == {1, 2, 3, 4}  # NULL row 3 survives
    assert out[1]["group_size"] == 2 and out[1]["at_risk"] == 0
    assert out[3]["group_size"] == 1 and out[3]["at_risk"] == 1
    assert out[4]["at_risk"] == 1


def test_k_anonymity_plans(spark):
    """Summary: one two-phase aggregate chain, NO Join anywhere. Flags:
    exactly one join, merge-hinted (the group-count side is corpus-derived
    — never a static-estimate broadcast)."""
    from logstash_filter_geoip_spark.plans import checks
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("day", F.date_trunc("day", F.col("ts"))))
    p = checks.simple_plan(dq.k_anonymity(ev, ["event_type", "day"], 60))
    assert "Join" not in p and "Python" not in p, p[:3000]
    pf = checks.simple_plan(
        dq.k_anonymity_flags(ev, ["event_type", "day"], 60))
    assert "BroadcastExchange" not in pf, pf[:3000]
    assert pf.count("SortMergeJoin") == 1, pf[:3000]


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_crafted(spark):
    """Known diversities: group a has 2 distinct sensitive values over 3
    rows, group b has 1 over 2 rows, the NULL-quasi group has 1, and group
    c's only sensitive value is NULL → diversity 0 (count DISTINCT ignores
    NULLs) — always weak."""
    import duckdb
    rows = [("a", "s1"), ("a", "s2"), ("a", "s1"),
            ("b", "s1"), ("b", "s1"),
            ("c", None),
            (None, "s9")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = dq.l_diversity(df, ["q"], "s", l=2).collect()[0]
    assert (got["n_rows"], got["n_groups"], got["n_weak_groups"],
            got["rows_at_risk"], got["min_distinct_sensitive"]) \
        == (7, 4, 3, 4, 0)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q VARCHAR, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute("""
WITH g AS (SELECT q, count(*) AS n, count(DISTINCT s) AS d
           FROM t GROUP BY 1)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT), count(*),
       CAST(coalesce(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN d < 2 THEN n ELSE 0 END), 0) AS BIGINT),
       CAST(coalesce(min(d), 0) AS BIGINT)
FROM g""").fetchone()
    assert tuple(got) == tuple(want)


def test_l_diversity_large_group_can_be_weak(spark):
    """The screen k-anonymity misses: a BIG group with ONE sensitive value
    is weak under l-diversity while passing k-anonymity."""
    rows = [("big", "same")] * 100 + [("ok", "v1"), ("ok", "v2")]
    df = spark.createDataFrame(rows, "q string, s string")
    kan = dq.k_anonymity(df, ["q"], k=2).collect()[0]
    ldi = dq.l_diversity(df, ["q"], "s", l=2).collect()[0]
    assert kan["n_small_groups"] == 0          # k-anonymity: all clear
    assert ldi["n_weak_groups"] == 1           # l-diversity: flags it
    assert ldi["rows_at_risk"] == 100


def test_l_diversity_empty_input_is_zeros(spark):
    df = spark.createDataFrame([], "q string, s string")
    got = dq.l_diversity(df, ["q"], "s", l=3).collect()[0]
    assert tuple(got) == (0, 0, 0, 0, 0)


def test_l_diversity_flags_null_safe(spark):
    rows = [(1, "a", "x"), (2, "a", "y"), (3, None, "x"), (4, "b", "x"),
            (5, "b", "x")]
    df = spark.createDataFrame(rows, "id long, q string, s string")
    out = {r["id"]: r for r in
           dq.l_diversity_flags(df, ["q"], "s", l=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # NULL-quasi row survives
    assert out[1]["sensitive_diversity"] == 2 and out[1]["low_diversity"] == 0
    assert out[3]["sensitive_diversity"] == 1 and out[3]["low_diversity"] == 1
    assert out[4]["sensitive_diversity"] == 1 and out[4]["low_diversity"] == 1


def test_l_diversity_plans(spark):
    """Summary: stacked two-phase aggregates, NO Join, NO Expand (the
    distinct is a pre-group, never an Expand). Flags: one merge-hinted
    join, no static-estimate broadcast."""
    from logstash_filter_geoip_spark.plans import checks
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("day", F.date_trunc("day", F.col("ts"))))
    p = checks.simple_plan(
        dq.l_diversity(ev, ["event_type", "day"], "user_id", 54))
    assert "Join" not in p and "Python" not in p and "Expand" not in p, \
        p[:3000]
    pf = checks.simple_plan(
        dq.l_diversity_flags(ev, ["event_type", "day"], "user_id", 54))
    assert "BroadcastExchange" not in pf, pf[:3000]
    assert pf.count("SortMergeJoin") == 1, pf[:3000]


# ---------------------------------------------------------------------------
# fk_audit
# ---------------------------------------------------------------------------


def test_fk_audit_crafted_directions(spark):
    """Both directions + NULL-key accounting on a crafted pair: orphans
    (child keys with no parent), unreferenced parents, NULL child keys
    counted separately, duplicate child keys collapse to one orphan key."""
    from logstash_filter_geoip_spark.operators.dq import fk_audit
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None)],
        "id long, fk long")
    parent = spark.createDataFrame(
        [(10,), (20,), (30,), (None,)], "pk long")
    row = fk_audit([("c_p", child, "fk", parent, "pk")]).collect()[0]
    assert row.relation == "c_p"
    assert row.n_child == 6
    assert row.n_null_keys == 1
    assert row.orphan_rows == 2       # the two fk=99 rows
    assert row.orphan_keys == 1       # one distinct missing key
    assert row.unref_parents == 1     # pk=30 (NULL parent key excluded)


def test_fk_audit_empty_child_is_zeros(spark):
    from logstash_filter_geoip_spark.operators.dq import fk_audit
    child = spark.createDataFrame([], "id long, fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    row = fk_audit([("e", child, "fk", parent, "pk")]).collect()[0]
    assert (row.n_child, row.n_null_keys, row.orphan_rows,
            row.orphan_keys, row.unref_parents) == (0, 0, 0, 0, 2)


def test_fk_audit_driver_relations_non_vacuous(spark):
    """The declared relations exercise BOTH outcomes at smoke scale: the
    warehouse FKs are clean, the events→customer coverage gap is real."""
    from logstash_filter_geoip_spark.operators.dq import q_fk_audit
    rows = {r.relation: r for r in
            q_fk_audit(spark, "/root/testdata/sf0.001").collect()}
    assert rows["lineitem_orders"].orphan_rows == 0
    assert rows["orders_customer"].orphan_rows == 0
    assert rows["events_customer"].unref_parents > 0


def test_fk_audit_plan_merge_full_outer_no_broadcast(spark):
    """Key relations are corpus-derived on both sides: the full-outer must
    be an SMJ (merge-hinted), never a static-estimate broadcast."""
    from logstash_filter_geoip_spark.operators.dq import q_fk_audit
    plan = (q_fk_audit(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("SortMergeJoin") == 3 and "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# pk_audit
# ---------------------------------------------------------------------------


def test_pk_audit_crafted_matrix(spark):
    """Duplicate groups vs NULL-part groups vs clean rows, hand-computed;
    a NULL key part never counts as a duplicate (three-valued)."""
    from logstash_filter_geoip_spark.operators.dq import pk_audit
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"),      # dup group of 3
         (2, "b"), (2, "c"),                # clean (distinct second part)
         (3, None), (3, None),              # NULL-part group (NOT a dup)
         (4, "d")],                         # clean
        "k1 long, k2 string")
    row = pk_audit([("t", df, ["k1", "k2"])]).collect()[0]
    assert (row.relation, row.n_rows, row.n_null_key_rows,
            row.n_dup_keys, row.n_dup_rows) == ("t", 8, 2, 1, 3)


def test_pk_audit_empty_and_guards(spark):
    from logstash_filter_geoip_spark.operators.dq import pk_audit
    df = spark.createDataFrame([], "k long")
    row = pk_audit([("e", df, ["k"])]).collect()[0]
    assert (row.n_rows, row.n_null_key_rows, row.n_dup_keys,
            row.n_dup_rows) == (0, 0, 0, 0)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty relations"):
        pk_audit([])
    with _pytest.raises(ValueError, match="no key columns"):
        pk_audit([("t", df, [])])


def test_pk_audit_driver_relations_non_vacuous(spark):
    """Both outcomes exercised at smoke scale: orders/customer PKs are
    clean, events (user_id, event_type) is genuinely non-unique — and so
    is the synthetic lineitem's (orderkey, linenumber), a REAL testdata
    constraint violation this audit surfaced."""
    from logstash_filter_geoip_spark.operators.dq import q_pk_audit
    rows = {r.relation: r for r in
            q_pk_audit(spark, "/root/testdata/sf0.001").collect()}
    assert rows["orders_pk"].n_dup_keys == 0
    assert rows["customer_pk"].n_dup_keys == 0
    assert rows["lineitem_pk"].n_dup_keys > 0
    assert rows["events_user_type"].n_dup_keys > 0


def test_pk_audit_plan_one_aggregate_no_join(spark):
    """One per-key two-phase aggregate per relation, no Join anywhere,
    no Python."""
    from logstash_filter_geoip_spark.operators.dq import q_pk_audit
    from logstash_filter_geoip_spark.plans import checks
    plan = checks.simple_plan(q_pk_audit(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan[:3000]
    assert "EvalPython" not in plan, plan[:3000]
