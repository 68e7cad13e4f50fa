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
