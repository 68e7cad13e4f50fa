"""Conversation-level window operators (SURVEY §2.6: the stable
(conv_id, turn_idx) ordering contract, input_hint).

All per-conversation windows partition by conv_id and order by turn_idx —
the one ordering the input_hint guarantees. At 10^12 turns a conv_id window
is safe: conversations are small (thousands of turns max), so no single
partition key explodes; the hot-key risk is the shuffle DISTRIBUTION, which
salting handles for aggregates (aggregate.salted_conv_rollup) — windows
that genuinely need full-conversation ordering cannot be salted and rely on
AQE skew handling plus the bounded conversation length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_turn_features(t: DataFrame) -> DataFrame:
    """Per-turn conversational features: previous role/tool, seconds since
    the previous turn, position statistics. Pure window functions."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wall = Window.partitionBy("conv_id")
    prev_ts = F.lag("ts").over(w)
    return t.select(
        "conv_id", "turn_idx", "role",
        F.lag("role").over(w).alias("prev_role"),
        F.lead("role").over(w).alias("next_role"),
        F.lag("tool").over(w).alias("prev_tool"),
        # microsecond diff is exact in both engines (storage unit); SECOND
        # variants disagree on sub-second handling (truncate vs boundaries)
        F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
               "(PARTITION BY conv_id ORDER BY turn_idx), ts)")
         .cast("long").alias("gap_us"),
        F.count(F.lit(1)).over(wall).alias("conv_len"),
        (F.col("turn_idx") == 0).cast("int").alias("is_first"),
    )


def distinct_ip_stats(parsed: DataFrame) -> DataFrame:
    """Exact distinct-IP cardinality + turn counts (metrics contract;
    approx_count_distinct is the at-scale variant, exact is the test form
    per SURVEY §2.5)."""
    return parsed.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count("ip_str").alias("n_with_ip"),
        F.countDistinct("ip_str").alias("n_distinct_ips"),
    )


def distinct_ip_stats_approx(parsed: DataFrame) -> DataFrame:
    """HyperLogLog++ variant for 10^12-turn metrics (one pass, no exact
    distinct shuffle). Rows-only check (approximate by construction)."""
    return parsed.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.approx_count_distinct("ip_str").alias("n_distinct_ips_approx"),
    )
