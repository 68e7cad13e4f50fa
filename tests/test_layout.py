"""Z-order layout (operators/layout.py): three-engine value locks on the
Morton code, layout guards, and the data-skipping evidence — z-ordered
files are narrow in BOTH dimensions while a time-sorted layout is narrow
in one and full-width in the other."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators.layout import (zorder_key,
                                                          zorder_layout,
                                                          zorder_py,
                                                          zorder_sql)

# deterministic probe set: corners, mid-range, bit patterns
_CASES = [(0, 0), (1, 0), (0, 1), (65535, 65535), (65535, 0), (0, 65535),
          (12345, 54321), (0x5555, 0xAAAA), (256, 255), (40000, 1)]


def test_zorder_three_engine_lock(spark):
    py = [zorder_py(x, y) for x, y in _CASES]
    df = spark.createDataFrame(_CASES, "x long, y long")
    sp = [r.z for r in
          df.select(zorder_key(F.col("x"), F.col("y")).alias("z"))
            .collect()]
    con = duckdb.connect()
    dk = [con.execute(f"SELECT {zorder_sql(str(x), str(y))}").fetchone()[0]
          for x, y in _CASES]
    assert py == sp == dk


def test_zorder_bit_interleave_definition():
    # bit i of x at output bit 2i, bit i of y at 2i+1 — checked bitwise
    for x, y in _CASES:
        z = zorder_py(x, y)
        for i in range(16):
            assert (z >> (2 * i)) & 1 == (x >> i) & 1
            assert (z >> (2 * i + 1)) & 1 == (y >> i) & 1


def test_zorder_locality_beats_single_dim_sort(spark, tmp_path):
    """The data-skipping claim, measured: write events 8-ways z-ordered vs
    8-ways time-sorted; per-file (max-min) spreads of user_id must shrink
    dramatically under z-order while day spread stays bounded — min-max
    pruning then skips most files for user-range filters."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    x = F.pmod(F.col("user_id"), F.lit(65536))
    y = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))

    zdir, tdir = f"{tmp_path}/z", f"{tmp_path}/t"
    zorder_layout(ev, x, y, n_files=8).write.parquet(zdir)
    (ev.repartitionByRange(8, "ts").sortWithinPartitions("ts")
       .write.parquet(tdir))

    def spreads(path):
        df = spark.read.parquet(path).select(
            F.input_file_name().alias("f"),
            F.col("user_id").alias("u"),
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2024-01-01").cast("date")).alias("d"))
        agg = df.groupBy("f").agg(
            (F.max("u") - F.min("u")).alias("su"),
            (F.max("d") - F.min("d")).alias("sd"))
        rows = agg.collect()
        n = len(rows)
        return (sum(r.su for r in rows) / n, sum(r.sd for r in rows) / n, n)

    zu, zd, zn = spreads(zdir)
    tu, td, tn = spreads(tdir)
    assert zn >= 4 and tn >= 4          # the layouts actually split
    # time-sorted: every file spans ~the full user domain
    assert zu < tu / 2
    # z-order keeps the day dimension bounded too (not a user-only sort,
    # which would make every file span the full month)
    assert zd < 31


def test_zorder_layout_guards(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="n_files"):
        zorder_layout(ev, F.col("user_id"), F.col("user_id"), 0)
    out = zorder_layout(ev, F.pmod(F.col("user_id"), F.lit(65536)),
                        F.lit(0), n_files=2)
    assert out.columns == ev.columns     # layout key dropped
    assert out.count() == ev.count()     # row-preserving


# ---------------------------------------------------------------------------
# bucket_table (co-located joins at rest)
# ---------------------------------------------------------------------------


def test_bucketed_join_plans_with_zero_exchange(spark, tmp_path):
    """Two tables co-bucketed on the join key SortMergeJoin with ZERO
    Exchange — the shuffle happened at write time; the identical
    unbucketed merge join needs two. Values match the plain join."""
    import os

    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators import layout
    from logstash_filter_geoip_spark.plans import checks

    od = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
               .select("o_orderkey", "o_orderpriority"))
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
              .select("l_orderkey")
    to = layout.bucket_table(od, "t_bkt_o", ["o_orderkey"], 8,
                             str(tmp_path / "o"))
    tl = layout.bucket_table(li, "t_bkt_l", ["l_orderkey"], 8,
                             str(tmp_path / "l"))
    j = tl.hint("merge").join(to.hint("merge"),
                              tl.l_orderkey == to.o_orderkey)
    plan = checks.simple_plan(j)
    assert plan.count("Exchange") == 0, plan[:3000]
    assert plan.count("SortMergeJoin") == 1, plan[:3000]
    plain = li.hint("merge").join(od.hint("merge"),
                                  li.l_orderkey == od.o_orderkey)
    assert checks.simple_plan(plain).count("Exchange") == 2
    got = sorted(tuple(r) for r in j.groupBy("o_orderpriority")
                 .agg(F.count(F.lit(1)).alias("n")).collect())
    want = sorted(tuple(r) for r in plain.groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("n")).collect())
    assert got == want and len(got) > 0


def test_bucketed_mismatched_counts_still_correct(spark, tmp_path):
    """Different bucket counts on the two sides: the layout advantage is
    lost (an Exchange comes back on at least one side) but values never
    change — bucketing is layout, not semantics."""
    from pyspark.sql import functions as F

    from logstash_filter_geoip_spark.operators import layout

    od = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
               .select("o_orderkey"))
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
              .select("l_orderkey")
    to = layout.bucket_table(od, "t_bkt_o4", ["o_orderkey"], 4,
                             str(tmp_path / "o4"))
    tl = layout.bucket_table(li, "t_bkt_l16", ["l_orderkey"], 16,
                             str(tmp_path / "l16"))
    n = (tl.hint("merge").join(to.hint("merge"),
                               tl.l_orderkey == to.o_orderkey).count())
    assert n == li.join(od, li.l_orderkey == od.o_orderkey).count()
