"""Ionosphere-lite (X2) — per-series feature profiles and
known-not-anomalous matching.

Reference: skyline/features_profile.py:103 (tsfresh
``extract_features(EfficientFCParameters)``) and the match rule: a new
anomaly is CANCELLED when the percent difference of the feature SUMS
vs a trained profile is below IONOSPHERE_FEATURES_PERCENT_SIMILAR
(skyline/features_profile.py:640-657; docs/ionosphere.rst).

tsfresh is not in this container, so the feature set is a fixed,
documented basket of the same flavor (moments, quantiles, trend,
autocorrelation, energy) computed vectorized per series in ONE
applyInPandas pass. The *matching semantics* — feature-sum percent
difference below threshold cancels the anomaly — follow the reference
exactly and are what the routing depends on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_NAMES = (
    "mean", "std", "median", "min", "max", "sum", "abs_energy",
    "mean_abs_change", "count_above_mean", "count_below_mean",
    "q25", "q75", "skewness_like", "autocorr_lag1", "slope",
)


def compute_features(ts: np.ndarray, values: np.ndarray) -> dict[str, float]:
    v = values.astype(np.float64)
    n = v.size
    if n == 0:
        return {k: 0.0 for k in FEATURE_NAMES}
    mean = float(v.mean())
    std = float(v.std())
    diffs = np.abs(np.diff(v)) if n > 1 else np.array([0.0])
    centered = v - mean
    ac1 = float(np.dot(centered[:-1], centered[1:]) / (std * std * (n - 1))) \
        if n > 1 and std > 0 else 0.0
    x = ts - ts[0]
    slope = float(np.polyfit(x, v, 1)[0]) if n > 1 and np.ptp(x) > 0 else 0.0
    m3 = float(np.mean(centered ** 3) / (std ** 3)) if std > 0 else 0.0
    return {
        "mean": mean, "std": std, "median": float(np.median(v)),
        "min": float(v.min()), "max": float(v.max()), "sum": float(v.sum()),
        "abs_energy": float(np.dot(v, v)),
        "mean_abs_change": float(diffs.mean()),
        "count_above_mean": float((v > mean).sum()),
        "count_below_mean": float((v < mean).sum()),
        "q25": float(np.percentile(v, 25)), "q75": float(np.percentile(v, 75)),
        "skewness_like": m3, "autocorr_lag1": ac1, "slope": slope,
    }


def feature_profiles(parsed: DataFrame, key: str = "conv_id") -> DataFrame:
    """One feature-vector row per series (conv_id, features map)."""
    def fp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_epoch", kind="stable")
        feats = compute_features(pdf["ts_epoch"].to_numpy(),
                                 pdf["value"].to_numpy())
        row = {"conv_id": pdf[key].iloc[0],
               "features_sum": float(sum(feats.values()))}
        row.update({f"f_{k}": val for k, val in feats.items()})
        return pd.DataFrame([row])

    schema = ("conv_id string, features_sum double, "
              + ", ".join(f"f_{k} double" for k in FEATURE_NAMES))
    proj = parsed.where(F.col("value").isNotNull()).select(
        F.col(key), F.col("ts").cast("timestamp").cast("double").alias("ts_epoch"),
        "value")
    return proj.groupBy(key).applyInPandas(fp, schema=schema)


def ionosphere_match(anomalies: DataFrame, trained_profiles: DataFrame,
                     current_profiles: DataFrame,
                     percent_similar: float = 1.0) -> DataFrame:
    """Cancel anomalies whose current feature-sum is within
    ``percent_similar`` percent of a trained profile's
    (features_profile.py:640-657). Broadcast join on conv_id; emits
    ``ionosphere_matched`` + final disposition."""
    cur = current_profiles.select("conv_id",
                                  F.col("features_sum").alias("cur_sum"))
    trained = trained_profiles.select("conv_id",
                                      F.col("features_sum").alias("trained_sum"))
    # profiles are SERIES-cardinality (potentially huge); anomalies are
    # the small side — no explicit broadcast of the profile tables, the
    # planner/AQE picks the build side from actual sizes
    j = (anomalies.join(cur, "conv_id", "left")
         .join(trained, "conv_id", "left"))
    pct_diff = F.abs(F.col("cur_sum") - F.col("trained_sum")) \
        / F.abs(F.col("trained_sum")) * 100.0
    matched = F.when(F.col("trained_sum").isNotNull()
                     & (F.col("trained_sum") != 0),
                     pct_diff < percent_similar).otherwise(F.lit(False))
    return (j.withColumn("ionosphere_matched", matched)
            .withColumn("final_disposition",
                        F.when(F.col("ionosphere_matched"),
                               F.lit("cancelled_known_pattern"))
                        .otherwise(F.lit("anomalous"))))
