"""Aggregate stage — run summary, per-algorithm breakdowns, exception
counters, illuminance, and the flux windowed aggregator.

Reference analogues:
- G1 run summary (run_time, total_metrics, total_analyzed,
  total_anomalies, exception/anomaly-breakdown totals):
  skyline/analyzer/analyzer.py:8564-8643, 6629-6642;
- G2 per-algorithm timing: analyzer.py:8301-8306;
- G3 flux windowed aggregator (tumbling interval, avg/sum/min/max):
  skyline/flux/aggregator.py:591-606;
- G4 illuminance (sum of anomaly magnitudes per timestamp):
  analyzer.py:4012-4015, 4245-4253.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def run_summary(verdicts: DataFrame) -> DataFrame:
    """G1 — one-row global summary."""
    return verdicts.agg(
        F.count("*").alias("total_metrics"),
        F.count(F.when(F.col("exception").isNull(), 1)).alias("total_analyzed"),
        F.count(F.when(F.col("anomalous"), 1)).alias("total_anomalies"),
        F.count(F.when(F.col("exception") == "TooShort", 1)).alias("exc_too_short"),
        F.count(F.when(F.col("exception") == "Stale", 1)).alias("exc_stale"),
        F.count(F.when(F.col("exception") == "Boring", 1)).alias("exc_boring"),
        F.count(F.when(F.col("exception") == "EmptyTimeseries", 1)).alias("exc_empty"),
        F.sum("analyze_ms").alias("total_analyze_ms"),
    )


def exception_counts(verdicts: DataFrame) -> DataFrame:
    """E5 — exceptions['TooShort'/'Stale'/…] counters
    (analyzer.py:4879-5051)."""
    return (verdicts.where(F.col("exception").isNotNull())
            .groupBy("exception").count())


def anomaly_breakdown(verdicts: DataFrame) -> DataFrame:
    """Per-algorithm trigger counts — ``anomaly_breakdown[alg] += 1``
    (analyzer.py:4217-4243)."""
    return (verdicts.where(F.col("anomalous"))
            .select(F.explode("triggered").alias("algorithm"))
            .groupBy("algorithm").count())


def algorithm_timings(verdicts: DataFrame) -> DataFrame:
    """G2 — per-series analyze timing stats (times_run, total/median time,
    analyzer.py:8301-8306). Median is exact (F.median), matching the
    reference's median_time metric."""
    return verdicts.where(F.col("exception").isNull()).agg(
        F.count("*").alias("times_run"),
        F.sum("analyze_ms").alias("total_time_ms"),
        F.median("analyze_ms").alias("median_time_ms"),
    )


def illuminance(verdicts: DataFrame) -> DataFrame:
    """G4 — sum of anomalous datapoint magnitudes per timestamp."""
    return (verdicts.where(F.col("anomalous"))
            .groupBy(F.col("last_ts").alias("ts"))
            .agg(F.sum("datapoint").alias("illuminance"),
                 F.count("*").alias("n_anomalies")))


def flux_aggregate(events: DataFrame, interval_seconds: int,
                   methods: tuple[str, ...] = ("avg", "sum", "min", "max"),
                   namespace_col: str = "metric",
                   ts_col: str = "ts", value_col: str = "value",
                   zero_fill: bool = False,
                   fill: str | None = None) -> DataFrame:
    """G3 — the flux tumbling-window aggregator
    (skyline/flux/aggregator.py:591-606): per-namespace tumbling
    ``interval`` buckets with avg/sum/min/max; empty buckets optionally
    filled with zero (FLUX_ZERO_FILL_NAMESPACES, flux/worker.py:633-655)
    or the last known value (FLUX_LAST_KNOWN_VALUE_NAMESPACES,
    flux/worker.py:675-681) via a native sequence/explode lattice
    left-join — no Python.

    ``fill``: None | 'zero' | 'last_known_value' (``zero_fill=True`` is
    the legacy spelling of fill='zero').
    """
    if zero_fill and fill is None:
        fill = "zero"
    if fill not in (None, "zero", "last_known_value"):
        raise ValueError(f"unknown fill {fill!r}")
    agg_exprs = []
    for m in methods:
        fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[m]
        agg_exprs.append(fn(value_col).alias(m))
    bucketed = (
        events
        .groupBy(F.col(namespace_col).alias("namespace"),
                 F.window(ts_col, f"{interval_seconds} seconds").alias("w"))
        .agg(*agg_exprs)
        .select("namespace", F.col("w.start").alias("bucket_start"),
                F.col("w.end").alias("bucket_end"), *[F.col(m) for m in methods])
    )
    if fill is None:
        return bucketed
    # generate the full bucket lattice per namespace and left-join
    te = epoch_seconds(F.col(ts_col))
    spans = events.groupBy(F.col(namespace_col).alias("namespace")).agg(
        F.floor(F.min(te)).cast("long").alias("t0"),
        F.floor(F.max(te)).cast("long").alias("t1"))
    lattice = spans.select(
        "namespace",
        F.explode(F.sequence(
            (F.col("t0") / interval_seconds).cast("long") * interval_seconds,
            F.col("t1"),
            F.lit(interval_seconds))).alias("bucket_epoch"))
    lattice = lattice.select(
        "namespace", F.col("bucket_epoch").cast("timestamp").alias("bucket_start"))
    out = lattice.join(bucketed, ["namespace", "bucket_start"], "left")
    if fill == "zero":
        filled = [F.coalesce(F.col(m), F.lit(0.0)).alias(m) for m in methods]
    else:
        wff = (Window.partitionBy("namespace")
               .orderBy(F.col("bucket_start").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
        filled = [F.last(F.col(m), ignorenulls=True).over(wff).alias(m)
                  for m in methods]
    return out.select("namespace", "bucket_start", *filled)
