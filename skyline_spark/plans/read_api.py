"""§3.3 webapp read path — the Flask JSON endpoints re-expressed as
Spark SQL reads over the engine's own tables (SURVEY.md scopes these as
verification queries; the HTTP layer itself is out of scope).

Reference endpoints (skyline/webapp/webapp.py):
- ``/api?metric=<name>[&from_timestamp=&until_timestamp=]`` (:1277) —
  fetch one metric's series;
- ``/anomalies.json`` (:1193) — the current anomalies list
  (panorama-backed in the reference; here the anomalous+ionosphere
  verdict rows);
- ``/api?anomaly_breakdown`` — per-algorithm trigger counts.

Every function is a plain declarative read: the metric/time predicates
push down to the sink scan (partition pruning on a ts-partitioned sink
table), nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def api_metric(parsed: DataFrame, metric: str,
               from_timestamp: float | None = None,
               until_timestamp: float | None = None) -> DataFrame:
    """``/api?metric=&from_timestamp=&until_timestamp=`` — one metric's
    (ts, value) series, time-bounded (webapp.py:1277; graphite_metric
    variant docs/webapp.rst:15-22)."""
    te = epoch_seconds(F.col("ts"))
    out = parsed.where((F.col("metric") == metric)
                       & F.col("value").isNotNull())
    if from_timestamp is not None:
        out = out.where(te >= F.lit(float(from_timestamp)))
    if until_timestamp is not None:
        out = out.where(te <= F.lit(float(until_timestamp)))
    return (out.select("conv_id", "metric", "ts", "value")
            .orderBy("conv_id", "ts"))


def api_anomalies(routed_verdicts: DataFrame) -> DataFrame:
    """``/anomalies.json`` (webapp.py:1193) — current anomalies with
    their trigger metadata, newest first."""
    return (routed_verdicts
            .where(F.col("sink").isin("anomalous", "deferred", "ionosphere"))
            .select("conv_id", "metric",
                    F.col("datapoint").alias("anomalous_datapoint"),
                    F.col("last_ts").alias("anomaly_timestamp"),
                    "triggered", "sink")
            .orderBy(F.col("anomaly_timestamp").desc(), "conv_id"))


def api_anomaly_breakdown(routed_verdicts: DataFrame) -> DataFrame:
    """Per-algorithm trigger counts over the current anomaly set."""
    from skyline_spark.operators.aggregate import anomaly_breakdown
    return anomaly_breakdown(routed_verdicts)
