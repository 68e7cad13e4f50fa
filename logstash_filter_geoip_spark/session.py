"""SparkSession factory with the scale-tuned configuration used everywhere.

Settings chosen for the 1000-executor / 100 TB target (tested on local[N]):
  * AQE on (runtime coalesce + skew-join backstop for conv_id hot keys)
  * Arrow enabled for the two allowed pandas-UDF families
  * broadcast threshold raised so a realistic GeoLite2 dim (~millions of
    ranges, low-hundreds of MB bucketed) still broadcasts instead of
    falling back to a shuffled range join
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "logstash-filter-geoip-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder
        .appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # call-site capture for DataFrame error origins costs a Python
        # stack walk + import per DataFrame API call — ~10% of the
        # driver-side build time of expression-heavy operators (r6
        # cProfile of enrich: 747 captures/call). Diagnostics-only
        # metadata; flip on when debugging an AnalysisException origin.
        .config("spark.python.sql.dataFrameDebugging.enabled",
                os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
