"""Plan-shape assertions: the physical plan we DESIGNED for is the one
Catalyst actually picks. Used in tests and ad-hoc `.explain` audits.

The contract (SURVEY.md §4.2):
  * the enrich lookup must be a BroadcastHashJoin on the /16 bucket equi-key
    — a bare range predicate would degenerate to BroadcastNestedLoopJoin,
    O(rows × dim) at 100 TB;
  * parquet scans must show pushed filters / pruned columns when the query
    filters or projects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def simple_plan(df: DataFrame) -> str:
    """One-line-per-node physical plan (join types inline, e.g.
    'BroadcastHashJoin [...], LeftAnti, BuildRight') — formatted mode moves
    the join type into the detail block, which line-wise assertions miss."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """Post-execution physical plan (AQE-final). Runs THIS plan instance —
    df.count() would spawn a different QueryExecution and leave this one
    un-finalized (isFinalPlan=false)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_broadcast_hash_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "BroadcastNestedLoopJoin" in plan:
        raise AssertionError(
            "enrich join degenerated to BroadcastNestedLoopJoin — the bucket "
            "equi-key was lost:\n" + plan)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError("expected BroadcastHashJoin in plan:\n" + plan)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError("CartesianProduct in plan:\n" + plan)


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines of every file scan (column-pruning audit)."""
    return [ln.strip() for ln in physical_plan(df).splitlines()
            if "ReadSchema" in ln]


def assert_columns_pruned(df: DataFrame, must_not_read: list[str]) -> None:
    schemas = " ".join(scan_read_schema(df))
    leaked = [c for c in must_not_read if c in schemas]
    if leaked:
        raise AssertionError(
            f"columns {leaked} reached the scan ReadSchema: {schemas}")
