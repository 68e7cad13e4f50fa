"""logstash_filter_geoip_spark — a PySpark-native parse→enrich→route→aggregate engine.

A brand-new, Spark-first analytics engine with the query and data-processing
capabilities of logstash-plugins/logstash-filter-geoip (reference read-only at
/root/reference), generalized from a per-event lookup-enrich filter into a
set-oriented pipeline over transcript tables:

    parse   — vectorized regex extraction of IPs / tool mentions / error codes
              from transcript text (functions/parse.py)
    enrich  — broadcast bucketed range join against a GeoLite2-style CIDR
              dimension table, 28-field ECS/legacy mapping, miss tagging
              (operators/enrich.py)
    route   — salted repartition + role/tool-keyed sinks (operators/route.py)
    aggregate — windowed per-sink aggregates, failure-tag counts
              (operators/aggregate.py)

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot path,
Arrow-vectorized pandas UDFs only where Python is genuinely required, no
per-row Python and no RDDs.
"""

__version__ = "0.1.0"
