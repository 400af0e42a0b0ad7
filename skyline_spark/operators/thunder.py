"""Thunder stale-metrics check — the webapp ``/api?stale_metrics``
and metrics_manager staleness sweep.

Reference: skyline/functions/thunder/stale_metrics.py:18-520
(thunder_stale_metrics) + webapp/backend.py:3150 (namespace_stale_metrics).
The Redis/cluster plumbing distilled to its decision core:

- per metric, the last timestamp (int-truncated epoch) decides: stale
  iff ``last < now - stale_period``, where metrics matched by
  CUSTOM_STALE_PERIOD use their namespace's custom period
  (stale_metrics.py:368-369 splits the population into custom and
  default groups) and everything else uses settings.STALE_PERIOD;
- sparsely populated metrics (data_sparsity below
  SPARSELY_POPULATED_PERCENTAGE) are excluded when
  ``exclude_sparsely_populated`` (the webapp toggle;
  stale_metrics.py:370-394);
- the parent namespace is the metric's first dot element, and the
  output carries ``stale_for = now - last_timestamp``
  (backend.py:3214-3218);
- the alerted-on/recovered bookkeeping is Redis alert state with no
  batch analogue and is out of scope (the webapp path clears
  ``alerted_on_stale_metrics`` anyway, stale_metrics.py:229-230).

Scale: one per-series aggregate for the last timestamp + the sparsity
operator's aggregates; the custom-period map is config-sized (a CASE
expression).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def thunder_stale_metrics(valid: DataFrame, now_epoch: float,
                          stale_period: int,
                          full_duration: int,
                          custom_stale_periods: dict | None = None,
                          sparsity_threshold: float = 40.0,
                          exclude_sparsely_populated: bool = True,
                          key_cols=("conv_id", "metric"),
                          ts_col: str = "ts") -> DataFrame:
    """The stale metrics per namespace: (parent_namespace, conv_id,
    metric, last_timestamp, stale_for) for every series whose last
    point is older than its (custom or default) stale period, minus
    the sparsely-populated exclusions."""
    from skyline_spark.operators.preprocess import determine_data_sparsity

    last = valid.groupBy(*key_cols).agg(
        F.max(F.floor(epoch_seconds(F.col(ts_col))).cast("long"))
        .alias("last_timestamp"))
    ns = F.split(F.col("metric"), "\\.").getItem(0)
    period = F.lit(int(stale_period))
    for n, p in (custom_stale_periods or {}).items():
        period = F.when(ns == n, F.lit(int(p))).otherwise(period)
    out = last.withColumn("parent_namespace", ns) \
        .withColumn("__period", period)
    if exclude_sparsely_populated:
        sp = determine_data_sparsity(valid, full_duration,
                                     key_cols=key_cols, ts_col=ts_col)
        out = out.join(sp.select(*key_cols, "data_sparsity"),
                       list(key_cols))
        out = out.where(F.col("data_sparsity")
                        >= F.lit(float(sparsity_threshold)))
    return (out.where(F.col("last_timestamp")
                      < F.lit(float(now_epoch)) - F.col("__period"))
            .select("parent_namespace", *key_cols, "last_timestamp",
                    (F.lit(int(now_epoch)) - F.col("last_timestamp"))
                    .cast("long").alias("stale_for")))


def thunder_rolling_checks(valid: DataFrame, now_epoch: float,
                           up_expiry: int = 900,
                           overrun_threshold: float = 120.0,
                           after_overruns: int = 5,
                           reported_within: int = 299,
                           change_window: int = 600,
                           change_percent: float = 20.0,
                           change_period: int = 3600,
                           times_in_a_row: int = 5,
                           key_col: str = "conv_id",
                           ts_col: str = "ts") -> DataFrame:
    """Thunder rolling checks — the per-app health sweep
    (skyline/thunder/thunder_rolling.py:88-360) with each series
    playing an app-health metric. The three data-shaped checks:

    - **up** (functions/thunder/checks/app/up.py:23-271): an app is up
      iff its heartbeat key is live — batch analogue: the last
      timestamp is within ``up_expiry`` of now (the reference key is a
      setex with that expiry);
    - **run_time overrun** (checks/analyzer/run_time.py:40-190): alert
      iff the current value exceeds the optimum-duration threshold AND
      every one of the last ``after_overruns`` points exceeded it
      (the confirmation walk over ``timeseries[-after_overruns:]``,
      :135-155 — a shorter series can never confirm);
    - **metrics_received** (checks/horizon/metrics_received.py:26-269):
      ``not_reported`` when the last report is older than 299 s
      (:88-92), plus the significant_change_window_percent_sustained
      custom algorithm (:163-196; kernel already ported and oracled)
      with ``return_percent_as_anomalyScore``'s sustained
      ``times_in_a_row`` confirmation.

    The thunder.alert.* Redis keys (alert-once / recovery-notice state)
    are event-delivery plumbing with no batch analogue — the output is
    the decision surface each rolling pass evaluates, one row per
    series. Scale: one narrow projection, one per-series aggregate for
    the native checks and one applyInPandas on the same per-series
    exchange for the change kernel, joined on the series key.
    """
    import pandas as pd

    from skyline_spark.functions.custom_algorithms import (
        significant_change_window_percent_sustained,
    )

    te = epoch_seconds(F.col(ts_col))
    cols = set(valid.columns)
    order = (F.col("turn_idx") if "turn_idx" in cols
             else F.lit(0)).alias("__o")
    proj = valid.where(F.col("value").isNotNull()).select(
        F.col(key_col).alias("conv_id"), te.alias("__x"),
        F.floor(te).cast("long").alias("__e"), order, "value")

    wd = Window.partitionBy("conv_id").orderBy(
        F.col("__x").desc(), F.col("__o").desc())
    rn = proj.withColumn("__rn", F.row_number().over(wd))
    native = rn.groupBy("conv_id").agg(
        F.max("__e").alias("last_timestamp"),
        F.max(F.when(F.col("__rn") == 1, F.col("value")))
        .alias("last_value"),
        F.sum(F.when((F.col("__rn") <= after_overruns)
                     & (F.col("value") > overrun_threshold), 1)
              .otherwise(0)).cast("int").alias("n_recent_overruns"))
    now = F.lit(float(now_epoch))
    native = native.select(
        "conv_id", "last_timestamp",
        (F.round("last_value", 6) + F.lit(0.0)).alias("last_value"),
        (F.col("last_timestamp") >= now - F.lit(int(up_expiry)))
        .alias("reported_up"),
        (F.col("last_timestamp") < now - F.lit(int(reported_within)))
        .alias("not_reported"),
        ((F.col("last_value") > F.lit(float(overrun_threshold)))
         & (F.col("n_recent_overruns") == F.lit(int(after_overruns))))
        .alias("overrun"),
        "n_recent_overruns")

    params = {"window": change_window, "percent": change_percent,
              "period": change_period, "times_in_a_row": times_in_a_row}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__x", "__o"], kind="stable")
        a, s = significant_change_window_percent_sustained(
            pdf["__x"].to_numpy(np.float64),
            pdf["value"].to_numpy(np.float64), params)
        return pd.DataFrame([{"conv_id": pdf["conv_id"].iloc[0],
                              "significant_change": a,
                              "change_score": s}])

    sig = proj.groupBy("conv_id").applyInPandas(
        kernel, "conv_id string, significant_change boolean, "
                "change_score double")
    return native.join(sig, "conv_id", "left")


def thunder_alert_events_exact(checks: DataFrame, expiry: float,
                               key: str = "check_key",
                               ts_col: str = "ts",
                               bad_col: str = "bad") -> DataFrame:
    """Batch twin of streaming/thunder_alerts.py — an independent
    literal simulation of the thunder.alert.* Redis key
    (set-with-TTL on alert, delete on recovery,
    checks/app/up.py:151-214): per check, chronological walk emitting
    'alert' when bad with no live key, 'recovery' when healthy with a
    live key. Used by the multi-micro-batch parity test."""
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__t", kind="stable")
        key_expires_at = float("-inf")  # no key
        out = []
        for t, b in zip(pdf["__t"].astype(float), pdf["bad"].astype(bool)):
            key_live = t < key_expires_at
            event = None
            if b and not key_live:
                event = "alert"
                key_expires_at = t + expiry  # setex(key, expiry)
            elif not b and key_live:
                event = "recovery"
                key_expires_at = float("-inf")  # delete(key)
            elif not b:
                key_expires_at = float("-inf")
            out.append(event)
        return pd.DataFrame({"check_key": pdf["check_key"].iloc[0],
                             "ts_epoch": pdf["__t"].astype(float),
                             "bad": pdf["bad"].astype(bool),
                             "event": out})

    proj = checks.select(
        F.col(key).alias("check_key"),
        F.col(ts_col).cast("timestamp").cast("double").alias("__t"),
        F.col(bad_col).alias("bad"))
    return proj.groupBy("check_key").applyInPandas(
        kernel, "check_key string, ts_epoch double, bad boolean, "
                "event string")
