"""Schemas: the transcripts input table, the enrich dimension, verdicts,
and the routed sink rows.

Input per BASELINE.json input_hint:
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``.

Sink tables mirror the reference's routing outputs
(skyline/analyzer/analyzer.py:4042-4243 — not_anomalous / real_anomalous /
sent_to_mirage sets; persistent anomalies schema skyline/skyline.sql:123).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

# mirrors the settings.ALERTS tuple + metrics_manager hashes
# (skyline/settings.py:1149-1177; skyline/analyzer/metrics_manager.py:1885,
# 1973, 2293)
ALERT_CONFIG_SCHEMA = T.StructType([
    T.StructField("namespace_pattern", T.StringType(), False),
    T.StructField("alerter", T.StringType(), True),
    T.StructField("expiration_time", T.IntegerType(), True),
    T.StructField("second_order_resolution_hours", T.IntegerType(), True),
    T.StructField("is_derivative", T.BooleanType(), True),
    T.StructField("custom_stale_period", T.IntegerType(), True),
])

# output of the analyze stage — one row per series
VERDICT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("metric", T.StringType(), True),
    T.StructField("anomalous", T.BooleanType(), False),
    T.StructField("ensemble", T.ArrayType(T.BooleanType(), True), True),
    T.StructField("triggered", T.ArrayType(T.StringType()), True),
    T.StructField("algorithms_run", T.ArrayType(T.StringType()), True),
    T.StructField("datapoint", T.DoubleType(), True),
    T.StructField("exception", T.StringType(), True),
    T.StructField("negatives_found", T.BooleanType(), True),
    T.StructField("n_points", T.LongType(), True),
    T.StructField("last_ts", T.DoubleType(), True),
    # waterfall-alert from_timestamp (analyzer.py:3958-3966)
    T.StructField("from_ts", T.DoubleType(), True),
    T.StructField("analyze_ms", T.DoubleType(), True),
    # enrichment resolved in-UDF from the broadcast rule list (the
    # metrics_manager hash analogue) — carried on the verdict so the
    # router needs no dimension join
    T.StructField("matched_pattern", T.StringType(), True),
    T.StructField("alerter", T.StringType(), True),
    T.StructField("expiration_time", T.IntegerType(), True),
    T.StructField("second_order_resolution_hours", T.IntegerType(), True),
    T.StructField("is_mirage", T.BooleanType(), True),
    T.StructField("is_smtp_alerter", T.BooleanType(), True),
])

SINKS = ("anomalous", "deferred", "ionosphere", "normal", "exception")
