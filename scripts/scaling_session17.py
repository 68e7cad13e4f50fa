"""Two-parallelism scaling datapoint for the session-17 window operators
(retry_collapse + seasonal_anomalies + erasure_audit) — the same local[1]
vs local[4] taskset-pinned stand-in as scripts/scaling_bench.py, with the
sha2 control in the same window. Appends a row block to stdout (manually
recorded into BENCH/BASELINE.md when the window is healthy)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
cpus = int(sys.argv[1]); scale = int(sys.argv[2])
from pyspark.sql import functions as F
from logstash_filter_geoip_spark.session import get_spark
from logstash_filter_geoip_spark.sources.transcripts import load_transcripts
from logstash_filter_geoip_spark.operators import hygiene

spark = get_spark(app=f"s17scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 4))
SF = "/root/testdata/sf0.1"
ev = spark.read.parquet(f"{SF}/events.parquet")
n = ev.count()
big = (ev.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                 F.lit(scale - 1))))
         .select((F.col("event_id") + F.col("rep") * n).alias("event_id"),
                 (F.col("ts") + F.make_interval(days=F.col("rep")))
                 .alias("ts"),
                 (F.col("user_id") + F.col("rep") * 1000).alias("user_id"),
                 "event_type", "value", "props"))
path = f"/tmp/s17scale_events_{scale}.parquet"
import os as _os
if not _os.path.exists(path):
    big.write.mode("overwrite").parquet(path)
spark.read.parquet(path).count()   # warm the page cache identically

def timed(fn):
    t0 = time.monotonic(); fn(); return time.monotonic() - t0

be = spark.read.parquet(path)
be.createOrReplaceTempView("events")
t = spark.sql(__import__("logstash_filter_geoip_spark.sources.transcripts",
                         fromlist=["transcripts_sql"])
              .transcripts_sql("spark"))

out = {"cpus": cpus, "n_events": scale * n}
out["control_sha2"] = timed(lambda: be.select(
    F.sha2(F.col("event_id").cast("string"), 256).alias("h"))
    .agg(F.count_distinct("h")).collect())
out["retry_collapse"] = timed(lambda: hygiene.retry_collapse(t).agg(
    F.count(F.lit(1)), F.sum("ext_len")).collect())
out["seasonal"] = timed(lambda: hygiene.seasonal_anomalies(be).agg(
    F.count(F.lit(1)), F.sum("n_events")).collect())
out["erasure"] = timed(lambda: hygiene.erasure_audit(be).collect())
print(json.dumps(out))
spark.stop()
"""


def run_level(cpus: int, scale: int) -> dict:
    pin = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"]
    out = subprocess.run(
        pin + [sys.executable, "-c", CHILD, str(cpus), str(scale)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-4000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    low = run_level(1, scale)
    high = run_level(4, scale)
    rows = []
    for k in ("retry_collapse", "seasonal", "erasure", "control_sha2"):
        eff = low[k] / (4 * high[k])
        rows.append({"job": k, "local1_sec": round(low[k], 2),
                     "local4_sec": round(high[k], 2),
                     "efficiency": round(eff, 3)})
    print(json.dumps({"scale": scale, "n_events": low["n_events"],
                      "rows": rows}))


if __name__ == "__main__":
    main()
