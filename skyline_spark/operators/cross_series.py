"""Cross-series / second-stage operators: anomaly-end timestamps (X4)
and the Mirage longer-window re-analysis with veto semantics (§3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skyline_spark.config import PipelineConfig
from skyline_spark.operators.analyze import analyze


def anomaly_end_timestamps(flagged: DataFrame, key: str = "conv_id",
                           ts_col: str = "bucket_start",
                           flag_col: str = "anomalous") -> DataFrame:
    """X4 — close each anomaly run with the first not-anomalous
    observation after it (skyline/analyzer/analyzer.py:4038-4074;
    ``anomaly_end_timestamp`` column skyline/skyline.sql:133).

    Input: per-(series, bucket) boolean flags, ordered by ``ts_col``.
    Output: one row per anomaly episode: (key, anomaly_start,
    anomaly_end) — anomaly_end is NULL for still-open episodes.
    Sessionization via lag -> run-id prefix sums -> lead, all window
    functions (single shuffle on the series key).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    runs = (flagged
            .withColumn("__new_run",
                        (F.col(flag_col)
                         & ~F.coalesce(F.lag(flag_col).over(w), F.lit(False)))
                        .cast("int"))
            .withColumn("__run_id", F.sum("__new_run").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    # first not-anomalous bucket AFTER the run = min ts among following
    # non-flagged rows; compute per run: end = min over group of next
    # non-flag ts
    next_clear = F.min(F.when(~F.col(flag_col), F.col(ts_col))).over(
        w.rowsBetween(1, Window.unboundedFollowing))
    runs = runs.withColumn("__next_clear", next_clear)
    episodes = (runs.where(F.col(flag_col))
                .groupBy(key, "__run_id")
                .agg(F.min(ts_col).alias("anomaly_start"),
                     F.max(ts_col).alias("last_flagged"),
                     F.max("__next_clear").alias("__nc_max"),
                     F.min("__next_clear").alias("__nc_min")))
    # the closing observation is the first clear bucket after the LAST
    # flagged bucket of the episode: since __next_clear is monotone
    # non-decreasing along the run, take the value at the last row (max)
    return episodes.select(
        key, "anomaly_start", "last_flagged",
        F.col("__nc_max").alias("anomaly_end"))


def sigma_flags(buckets: DataFrame, key: str = "conv_id",
                ts_col: str = "bucket_start",
                value_col: str = "value", k: float = 3.0) -> DataFrame:
    """Per-bucket 3-sigma flag vs the series' own mean/std — the
    simplest windowed anomaly marker used to drive anomaly_end logic
    natively. Stats attach as unbounded-partition window aggregates
    (one shuffle on the series key, reused by the downstream
    sessionization window) — never a broadcast of a series-cardinality
    side table."""
    w = Window.partitionBy(key)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return buckets.withColumn(
        "anomalous",
        F.coalesce(F.abs(F.col(value_col) - mean) > k * std, F.lit(False)))


def is_anomalously_anomalous(trigger_history: DataFrame,
                             new_triggers: DataFrame,
                             key: str = "metric",
                             ts_col: str = "trigger_ts",
                             value_col: str = "datapoint",
                             dedupe_seconds: float = 300.0) -> DataFrame:
    """A11 — the ENABLE_SECOND_ORDER meta-analysis
    (skyline/analyzer/algorithms.py:1113-1154): does this metric's
    triggering PATTERN look anomalous?

    Reference semantics over the per-metric trigger history (the
    ``trigger_history.<metric>`` Redis key -> here an input table of
    (key, trigger_ts, datapoint), one NEW trigger per key):
    - no history yet -> True (:1128-1130);
    - same datapoint as the last trigger within ``dedupe_seconds`` ->
      False (:1134-1135);
    - else append and test |last_interval - mean| > 3 * sample std over
      ALL inter-trigger intervals (:1142-1154; std of a single interval
      is NaN -> False, pandas semantics).

    Fully native: one union, one lag window, one group-by on the key.
    Returns (key, trigger_ts, second_order_anomalous).
    """
    h = trigger_history.select(F.col(key), F.col(ts_col).cast("double"),
                               F.col(value_col).cast("double")) \
        .withColumn("__new", F.lit(False))
    n = new_triggers.select(F.col(key), F.col(ts_col).cast("double"),
                            F.col(value_col).cast("double")) \
        .withColumn("__new", F.lit(True))
    allr = h.unionByName(n)
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    d = (allr
         .withColumn("__interval", F.col(ts_col) - F.lag(ts_col).over(w))
         .withColumn("__prev_dp", F.lag(value_col).over(w)))
    agg = d.groupBy(key).agg(
        F.count(F.when(~F.col("__new"), 1)).alias("__n_hist"),
        F.avg("__interval").alias("__mean"),
        F.stddev_samp("__interval").alias("__std"),
        F.max(F.when(F.col("__new"), F.col("__interval"))).alias("__last_int"),
        F.max(F.when(F.col("__new"), F.col(ts_col))).alias(ts_col),
        F.max(F.when(F.col("__new"), F.col(value_col))).alias("__dp"),
        F.max(F.when(F.col("__new"), F.col("__prev_dp"))).alias("__last_dp"),
    )
    verdict = (
        F.when(F.col("__n_hist") == 0, F.lit(True))
        .when((F.col("__dp") == F.col("__last_dp"))
              & (F.col("__last_int") <= dedupe_seconds), F.lit(False))
        .otherwise(F.coalesce(
            F.abs(F.col("__last_int") - F.col("__mean")) > 3 * F.col("__std"),
            F.lit(False))))
    return agg.select(key, ts_col, verdict.alias("second_order_anomalous"))


def mirage_periodic_check_due(metrics: DataFrame, check_history: DataFrame,
                              interval_seconds: int, now: float,
                              metric_col: str = "metric") -> list[str]:
    """§3.2 — MIRAGE_PERIODIC_CHECK (analyzer.py:4107-4120 +
    metrics_manager periodic keys): metrics on the periodic list are
    force-sent to Mirage every ``interval`` even when not anomalous. The
    reference samples with per-metric Redis key expiries; the batch
    analogue computes the due-list from the check history
    (metric, last_check_ts) and feeds it to run_pipeline's
    ``mirage_always`` (the force-deferred branch, analyzer.py:4144-4158).

    Returns a plain list (config-sized — one entry per periodic metric)."""
    hist = check_history.groupBy(metric_col).agg(
        F.max("last_check_ts").alias("__last"))
    due = (metrics.select(metric_col).distinct()
           .join(hist, metric_col, "left")
           .where(F.col("__last").isNull()
                  | (F.col("__last") <= F.lit(now - interval_seconds))))
    return [r[0] for r in due.select(metric_col).collect()]


def mirage_reanalyze(spark: SparkSession, transcripts_parsed: DataFrame,
                     deferred: DataFrame, cfg: PipelineConfig,
                     now: float,
                     mirage_consensus: int | None = None,
                     mirage_stale_seconds: int | None = 300,
                     downsample_to: int | None = None) -> DataFrame:
    """§3.2 — the Mirage second stage: re-run the full algorithm suite
    for every deferred series at its SECOND_ORDER_RESOLUTION window and
    emit confirm/veto verdicts.

    Reference: skyline/mirage/mirage.py:923 (spin_process), :2053
    (algorithm run at second-order duration), routing :2530-2635 —
    anomalous -> mirage.anomalous_metrics (confirmed), not anomalous ->
    mirage.not_anomalous_metrics (the analyzer anomaly is VETOED).

    Operational semantics:
    - stale-check discard (mirage.py:1437-1463): a check whose anomaly
      timestamp is older than MIRAGE_STALE_SECONDS (settings.py:2300,
      default 300; pass None to disable, rescale for coarse-cadence
      data) vs the batch watermark is DISCARDED, not analyzed —
      final_sink='discarded_stale' (the mirage.stale_check_discarded
      Redis-set analogue).
    - downsampled re-check (mirage.py:1947-2185): when ``downsample_to``
      is set, the windowed series is first downsampled to that
      resolution (downsample_full_duration_and_merge_graphite analogue;
      mean buckets) and the verdict comes from the downsampled series
      while the reported datapoint stays the RAW last value
      (mirage.py:2172-2173).

    Spark shape: semi-join the parsed facts to the deferred conv set
    (broadcast — deferred is anomaly-cardinality), re-window per series
    with full_duration = hours_to_resolve * 3600, optional native
    downsample, one more applyInPandas pass at MIRAGE_CONSENSUS.
    """
    mirage_consensus = mirage_consensus or cfg.consensus
    if mirage_stale_seconds is not None and "last_ts" in deferred.columns:
        stale = (F.lit(now) - F.col("last_ts")) > F.lit(mirage_stale_seconds)
        deferred = deferred.withColumn(
            "__stale_discard", F.coalesce(stale, F.lit(False)))
    else:
        deferred = deferred.withColumn("__stale_discard", F.lit(False))
    keys = (deferred.where(~F.col("__stale_discard"))
            .select("conv_id", "hours_to_resolve").distinct())
    facts = transcripts_parsed.join(F.broadcast(keys), "conv_id", "inner")
    # per-series window: ts > now - hours*3600 (applied natively)
    facts = facts.where(
        F.col("ts").cast("timestamp").cast("double")
        > F.lit(now) - F.col("hours_to_resolve") * 3600)
    if downsample_to:
        from skyline_spark.operators.preprocess import downsample
        facts = downsample(facts, downsample_to,
                           key=["conv_id", "metric"]) \
            .withColumnRenamed("bucket_start", "ts")
    for col, default in (("is_derivative", F.lit(False)),
                         ("custom_stale_period", F.lit(None).cast("double"))):
        if col not in facts.columns:
            facts = facts.withColumn(col, default)
    # the widest deferred window bounds the trim the analyze stage does
    max_hours_row = keys.agg(F.max("hours_to_resolve")).first()
    max_hours = int(max_hours_row[0]) if max_hours_row and max_hours_row[0] else 24
    from dataclasses import replace
    cfg2 = replace(cfg, full_duration=max_hours * 3600,
                   consensus=mirage_consensus)
    second = analyze(facts, cfg2, now).select(
        "conv_id",
        F.col("anomalous").alias("mirage_anomalous"),
        F.col("ensemble").alias("mirage_ensemble"),
        F.col("triggered").alias("mirage_triggered"),
        F.col("datapoint").alias("mirage_datapoint"))
    out = deferred.join(second, "conv_id", "left")
    if downsample_to and "datapoint" in deferred.columns:
        # datapoint is reported from the RAW series (mirage.py:2172-2173)
        out = out.withColumn("mirage_datapoint", F.col("datapoint"))
    return out.withColumn(
        "final_sink",
        F.when(F.col("__stale_discard"), F.lit("discarded_stale"))
        .when(F.coalesce(F.col("mirage_anomalous"), F.lit(False)),
              F.lit("anomalous")).otherwise(F.lit("vetoed"))
    ).drop("__stale_discard")
