"""geo_velocity_stream: the stateful streaming twin of the batch
impossible-travel screen. Pins (1) the pandas pair-arithmetic mirror
against the gate semantics on a crafted matrix, and (2) batch == stream
row-for-row on the sf0.001 transcripts INCLUDING pairs that straddle a
micro-batch/restart boundary (the state carries the last located point)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.operators import geo
from logstash_filter_geoip_spark.pipeline import enriched_transcripts
from logstash_filter_geoip_spark.sources.geolite2 import vendored_dims
from logstash_filter_geoip_spark.sources.transcripts import load_transcripts
from logstash_filter_geoip_spark.streaming.pipeline import geo_velocity_stream

SF = "/root/testdata/sf0.001"
_NS = 1_000_000_000


def _pts(rows):
    return pd.DataFrame(rows, columns=["turn_idx", "ts_ns",
                                       "lat_mdeg", "lon_mdeg"])


def test_velocity_pairs_pd_gates():
    """The vectorized mirror applies the batch gates: out-of-order ts and
    beyond-max-gap pairs are EXCLUDED but still advance the reference
    point (lag semantics); dt=0 with distance flags; wrap is short-way."""
    rows = [
        (1, 0 * _NS, 47251, -122315),
        (2, 1800 * _NS, 47251, -122315),        # same place → kept, no flag
        (3, 5400 * _NS, 40000, -4000),          # continental hop in 1h → flag
        (4, 3600 * _NS, 40000, -4000),          # ts < prev → excluded
        (5, 3600 * _NS, 40000, -4000),          # vs row 4: dt=0 dist=0 → 0
        (6, (3600 + 90 * 86400) * _NS, 47251, -122315),  # > max gap → excluded
        (7, (3600 + 90 * 86400 + 600) * _NS, 10000, 179900),  # hop in 10min → flag
        (8, (3600 + 90 * 86400 + 1200) * _NS, 10000, -179900),  # wrap → slow
    ]
    out = geo.velocity_pairs_pd(_pts(rows))
    got = {(int(r.prev_turn_idx), int(r.turn_idx)): int(r.is_violation)
           for r in out.itertuples()}
    # (5,6) is excluded by the gap gate, but row 6 still BECOMES the lag
    # reference, so (6,7) is a kept (and flagged) pair — lag semantics
    assert got == {(1, 2): 0, (2, 3): 1, (4, 5): 0, (6, 7): 1, (7, 8): 0}
    # dt/dist2 are the exact integers of the Column expression
    by = {(int(r.prev_turn_idx), int(r.turn_idx)): (int(r.dt_s),
          int(r.dist2_mdeg2)) for r in out.itertuples()}
    assert by[(1, 2)] == (1800, 0)
    d_lat, d_wlon = 40000 - 47251, min(abs(-4000 + 122315),
                                       360_000 - abs(-4000 + 122315))
    assert by[(2, 3)] == (3600, d_lat * d_lat + d_wlon * d_wlon)
    assert by[(7, 8)] == (600, 200 * 200)  # wrapped dlon = 200 mdeg


def test_velocity_pairs_pd_empty_and_single():
    assert len(geo.velocity_pairs_pd(_pts([]))) == 0
    assert len(geo.velocity_pairs_pd(_pts([(1, 0, 0, 0)]))) == 0


def _batch_expected(spark):
    e = enriched_transcripts(spark, SF)
    hits = e.select(
        "conv_id", "turn_idx", "ts",
        F.col("geoip.geo.location.lat").alias("lat"),
        F.col("geoip.geo.location.lon").alias("lon"))
    return geo.geo_velocity(hits)


def test_stream_matches_batch_across_restart(spark, tmp_path):
    """Drained in-order stream == batch operator row-for-row. The input is
    split at turn_idx 6 and delivered over TWO query runs (restart from
    checkpoint), so cross-boundary pairs exist iff the checkpointed state
    carries the previous located point — the resume contract."""
    inp = str(tmp_path / "in_geo")
    out = str(tmp_path / "out_geo")
    ckpt = str(tmp_path / "ckpt_geo")
    t = load_transcripts(spark, SF)
    t.where(F.col("turn_idx") < 6).repartition(4) \
     .write.mode("overwrite").parquet(inp)
    # the batch/stream dim-parity rule (CLAUDE.md): the provider returns
    # the vendored pair, the same default enriched_transcripts resolves —
    # a golden-subset v4 dim here would locate a different point set
    dims = vendored_dims(spark, "City")

    q = geo_velocity_stream(spark, inp, out, ckpt, lambda: dims)
    q.awaitTermination(300)

    t.where(F.col("turn_idx") >= 6).repartition(4) \
     .write.mode("append").parquet(inp)
    q2 = geo_velocity_stream(spark, inp, out, ckpt, lambda: dims)
    q2.awaitTermination(300)

    got = spark.read.parquet(out)
    want = _batch_expected(spark).select(*got.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the split is real: some pair straddles the restart boundary
    straddle = want.where((F.col("prev_turn_idx") < 6)
                          & (F.col("turn_idx") >= 6)).count()
    assert straddle > 0
    assert want.where("is_violation = 1").count() > 0
