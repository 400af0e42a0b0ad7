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

#: 105 features — the numpy-closed-form tranche of tsfresh's
#: EfficientFCParameters basket (reference golden CSVs
#: /root/reference/tests/baseline/*.features.transposed.csv; tsfresh
#: names in parentheses where ours differ). Location/count features are
#: emitted as RAW indices/counts (integer-exact in every engine) rather
#: than tsfresh's n-normalized ratios — ratios of integers can land
#: exactly on a decimal rounding boundary and flip cross-engine.
FEATURE_NAMES = (
    "mean", "std", "median", "min", "max", "sum", "abs_energy",
    "mean_abs_change", "count_above_mean", "count_below_mean",
    "q25", "q75", "skewness_like", "autocorr_lag1", "slope",
    # round-3 tranche:
    "length", "rms",                      # (root_mean_square)
    "kurtosis_like",                      # population m4/std^4
    "variation_coeff",                    # (variation_coefficient)
    "cid_ce",                             # sqrt sum of squared diffs
    "abs_sum_of_changes",                 # (absolute_sum_of_changes)
    "range_val", "abs_max", "q05", "q95",
    "intercept",                          # OLS intercept on ts - ts[0]
    "mean_change", "mean_second_derivative",
    "num_crossing_mean",                  # (number_crossing_m, m=mean)
    "num_peaks",                          # (number_peaks, n=1)
    "longest_strike_above_mean", "longest_strike_below_mean",
    "first_loc_max", "last_loc_max",      # raw 0-based indices
    "first_loc_min", "last_loc_min",
    "count_unique", "has_duplicate",
    "has_duplicate_max", "has_duplicate_min",
    # round-3 second tranche (21 more -> 61):
    "variance", "var_gt_std",             # (variance_larger_than_std)
    "c3_lag1", "c3_lag2", "c3_lag3",
    "trev_lag1", "trev_lag2", "trev_lag3",  # (time_reversal_asymmetry)
    # raw counts, not tsfresh's ratios (integer-exact in every engine)
    "count_beyond_1sigma", "count_beyond_2sigma", "count_beyond_3sigma",
    "symmetry_r01",                       # (symmetry_looking, r=0.1)
    "large_std_r025",                     # (large_standard_deviation)
    "sum_reoccurring_values", "sum_reoccurring_points",
    "binned_entropy_10",
    "autocorr_lag2", "autocorr_lag3",
    "mean_n_abs_max_7",                   # (mean_n_absolute_max, n=7)
    "corr_rvalue",                        # (linear_trend rvalue)
    "index_mass_quantile_05",             # raw 1-based index, not ratio
    # round-4 tranche (44 more -> 105): the next numpy-closed-form
    # EfficientFCParameters slice — the remaining quantile grid,
    # autocorrelation lags 4-9, number_crossing_m at m in {0,1,-1},
    # ratio_beyond_r_sigma's full r grid as raw counts, more
    # symmetry_looking / large_standard_deviation r points,
    # number_peaks n in {3,5,10}, value_count / range_count,
    # index_mass_quantile q grid, normalized cid_ce, and the
    # reoccurring-value counts behind tsfresh's percentage features
    "q10", "q20", "q30", "q40", "q60", "q70", "q80", "q90",
    "autocorr_lag4", "autocorr_lag5", "autocorr_lag6",
    "autocorr_lag7", "autocorr_lag8", "autocorr_lag9",
    "num_crossing_0", "num_crossing_1", "num_crossing_m1",
    "count_beyond_05sigma", "count_beyond_15sigma",
    "count_beyond_25sigma", "count_beyond_5sigma",
    "count_beyond_6sigma", "count_beyond_7sigma", "count_beyond_10sigma",
    "symmetry_r005", "symmetry_r02", "symmetry_r03",
    "large_std_r005", "large_std_r035", "large_std_r05",
    "num_peaks_3", "num_peaks_5", "num_peaks_10",
    "value_count_0", "value_count_1", "value_count_m1",
    "range_count_m1_1",
    "index_mass_quantile_01", "index_mass_quantile_025",
    "index_mass_quantile_075", "index_mass_quantile_09",
    "cid_ce_normalized",
    "count_reoccurring_values", "count_reoccurring_points",
)


def _longest_run(flags: np.ndarray) -> float:
    """Length of the longest run of True in a boolean array."""
    if not flags.any():
        return 0.0
    edges = np.flatnonzero(np.diff(
        np.concatenate(([0], flags.astype(np.int8), [0]))))
    return float((edges[1::2] - edges[::2]).max())


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
    if n > 1 and np.ptp(x) > 0:
        coef = np.polyfit(x, v, 1)
        slope, intercept = float(coef[0]), float(coef[1])
    else:
        slope, intercept = 0.0, 0.0
    m3 = float(np.mean(centered ** 3) / (std ** 3)) if std > 0 else 0.0
    m4 = float(np.mean(centered ** 4) / (std ** 4)) if std > 0 else 0.0
    vmax, vmin = float(v.max()), float(v.min())
    above, below = v > mean, v < mean
    return {
        "mean": mean, "std": std, "median": float(np.median(v)),
        "min": vmin, "max": vmax, "sum": float(v.sum()),
        "abs_energy": float(np.dot(v, v)),
        "mean_abs_change": float(diffs.mean()),
        "count_above_mean": float(above.sum()),
        "count_below_mean": float(below.sum()),
        "q25": float(np.percentile(v, 25)), "q75": float(np.percentile(v, 75)),
        "skewness_like": m3, "autocorr_lag1": ac1, "slope": slope,
        "length": float(n),
        "rms": float(np.sqrt(np.dot(v, v) / n)),
        "kurtosis_like": m4,
        "variation_coeff": std / mean if mean != 0 else 0.0,
        "cid_ce": float(np.sqrt(np.sum(np.diff(v) ** 2))) if n > 1 else 0.0,
        "abs_sum_of_changes": float(diffs.sum()) if n > 1 else 0.0,
        "range_val": vmax - vmin,
        "abs_max": max(abs(vmax), abs(vmin)),
        "q05": float(np.percentile(v, 5)), "q95": float(np.percentile(v, 95)),
        "intercept": intercept,
        "mean_change": float((v[-1] - v[0]) / (n - 1)) if n > 1 else 0.0,
        "mean_second_derivative":
            float((v[-1] - v[-2] - v[1] + v[0]) / (2.0 * (n - 2)))
            if n > 2 else 0.0,
        "num_crossing_mean":
            float(np.sum(np.diff(above.astype(np.int8)) != 0))
            if n > 1 else 0.0,
        "num_peaks":
            float(np.sum((v[1:-1] > v[:-2]) & (v[1:-1] > v[2:])))
            if n > 2 else 0.0,
        "longest_strike_above_mean": _longest_run(above),
        "longest_strike_below_mean": _longest_run(below),
        "first_loc_max": float(np.argmax(v)),
        "last_loc_max": float(n - 1 - np.argmax(v[::-1])),
        "first_loc_min": float(np.argmin(v)),
        "last_loc_min": float(n - 1 - np.argmin(v[::-1])),
        "count_unique": float(np.unique(v).size),
        "has_duplicate": float(np.unique(v).size < n),
        "has_duplicate_max": float(np.sum(v == vmax) > 1),
        "has_duplicate_min": float(np.sum(v == vmin) > 1),
        **_second_tranche(x, v, n, mean, std, vmin, vmax, centered),
        **_third_tranche(v, n, mean, std, centered),
    }


def _c3(v: np.ndarray, n: int, lag: int) -> float:
    """tsfresh c3: mean of x[i]·x[i+lag]·x[i+2lag]."""
    if n <= 2 * lag:
        return 0.0
    return float(np.mean(v[:n - 2 * lag] * v[lag:n - lag] * v[2 * lag:]))


def _trev(v: np.ndarray, n: int, lag: int) -> float:
    """tsfresh time_reversal_asymmetry_statistic:
    mean of x[i+2lag]²·x[i+lag] − x[i+lag]·x[i]²."""
    if n <= 2 * lag:
        return 0.0
    a, b, c = v[2 * lag:], v[lag:n - lag], v[:n - 2 * lag]
    return float(np.mean(a * a * b - b * c * c))


def _autocorr_k(centered: np.ndarray, n: int, std: float, k: int) -> float:
    if n <= k or std <= 0:
        return 0.0
    return float(np.dot(centered[:-k], centered[k:])
                 / (std * std * (n - k)))


def _second_tranche(x: np.ndarray, v: np.ndarray, n: int, mean: float,
                    std: float, vmin: float, vmax: float,
                    centered: np.ndarray) -> dict[str, float]:
    rng_v = vmax - vmin
    absd = np.abs(centered)
    uniq, counts = np.unique(v, return_counts=True)
    dup = counts > 1
    # binned entropy: the bin index formula is written IDENTICALLY in
    # the SQL twin (floor((x-min)/range*10), clamped) so decimal-grid
    # edge values bin the same way in both engines
    if rng_v > 0:
        bins = np.minimum(np.floor((v - vmin) / rng_v * 10), 9)
        p = np.unique(bins, return_counts=True)[1] / n
        ent = float(-np.sum(p * np.log(p)))
    else:
        ent = 0.0
    if std > 0 and n > 1 and np.ptp(x) > 0:
        rvalue = float(np.corrcoef(x, v)[0, 1])
    else:
        rvalue = 0.0
    a = np.abs(v)
    tot = float(a.sum())
    imq = float(np.searchsorted(np.cumsum(a), 0.5 * tot) + 1) \
        if tot > 0 else 0.0
    return {
        "variance": std * std,
        "var_gt_std": float(std * std > std),
        "c3_lag1": _c3(v, n, 1), "c3_lag2": _c3(v, n, 2),
        "c3_lag3": _c3(v, n, 3),
        "trev_lag1": _trev(v, n, 1), "trev_lag2": _trev(v, n, 2),
        "trev_lag3": _trev(v, n, 3),
        "count_beyond_1sigma": float(np.sum(absd > std)) if std > 0 else 0.0,
        "count_beyond_2sigma":
            float(np.sum(absd > 2 * std)) if std > 0 else 0.0,
        "count_beyond_3sigma":
            float(np.sum(absd > 3 * std)) if std > 0 else 0.0,
        "symmetry_r01": float(abs(mean - float(np.median(v)))
                              < 0.1 * rng_v),
        "large_std_r025": float(std > 0.25 * rng_v),
        "sum_reoccurring_values": float(uniq[dup].sum()),
        "sum_reoccurring_points": float((uniq[dup] * counts[dup]).sum()),
        "binned_entropy_10": ent,
        "autocorr_lag2": _autocorr_k(centered, n, std, 2),
        "autocorr_lag3": _autocorr_k(centered, n, std, 3),
        "mean_n_abs_max_7":
            float(np.mean(np.sort(a)[-7:])) if n >= 7 else 0.0,
        "corr_rvalue": rvalue,
        "index_mass_quantile_05": imq,
    }


def _num_crossings(v: np.ndarray, n: int, m: float) -> float:
    """tsfresh number_crossing_m: sign changes of (x > m)."""
    if n <= 1:
        return 0.0
    return float(np.sum(np.diff((v > m).astype(np.int8)) != 0))


def _num_peaks_n(v: np.ndarray, n: int, nn: int) -> float:
    """tsfresh number_peaks: points strictly larger than their nn
    neighbors on both sides (support excludes the first/last nn)."""
    if n <= 2 * nn:
        return 0.0
    mid = v[nn:n - nn]
    ok = np.ones(mid.size, dtype=bool)
    for j in range(1, nn + 1):
        ok &= (mid > v[nn - j:n - nn - j]) & (mid > v[nn + j:n - nn + j])
    return float(ok.sum())


def _imq(a: np.ndarray, tot: float, q: float) -> float:
    """index_mass_quantile as a RAW 1-based index (see FEATURE_NAMES)."""
    if tot <= 0:
        return 0.0
    return float(np.searchsorted(np.cumsum(a), q * tot) + 1)


def _third_tranche(v: np.ndarray, n: int, mean: float, std: float,
                   centered: np.ndarray) -> dict[str, float]:
    absd = np.abs(centered)
    uniq, counts = np.unique(v, return_counts=True)
    dup = counts > 1
    a = np.abs(v)
    tot = float(a.sum())
    out: dict[str, float] = {}
    for q in (10, 20, 30, 40, 60, 70, 80, 90):
        out[f"q{q}"] = float(np.percentile(v, q))
    for k in range(4, 10):
        out[f"autocorr_lag{k}"] = _autocorr_k(centered, n, std, k)
    out["num_crossing_0"] = _num_crossings(v, n, 0.0)
    out["num_crossing_1"] = _num_crossings(v, n, 1.0)
    out["num_crossing_m1"] = _num_crossings(v, n, -1.0)
    for tag, r in (("05", 0.5), ("15", 1.5), ("25", 2.5), ("5", 5.0),
                   ("6", 6.0), ("7", 7.0), ("10", 10.0)):
        out[f"count_beyond_{tag}sigma"] = \
            float(np.sum(absd > r * std)) if std > 0 else 0.0
    rng_v = float(v.max()) - float(v.min())
    med = float(np.median(v))
    for tag, r in (("005", 0.05), ("02", 0.2), ("03", 0.3)):
        out[f"symmetry_r{tag}"] = float(abs(mean - med) < r * rng_v)
    for tag, r in (("005", 0.05), ("035", 0.35), ("05", 0.5)):
        out[f"large_std_r{tag}"] = float(std > r * rng_v)
    for nn in (3, 5, 10):
        out[f"num_peaks_{nn}"] = _num_peaks_n(v, n, nn)
    out["value_count_0"] = float(np.sum(v == 0.0))
    out["value_count_1"] = float(np.sum(v == 1.0))
    out["value_count_m1"] = float(np.sum(v == -1.0))
    out["range_count_m1_1"] = float(np.sum((v >= -1.0) & (v < 1.0)))
    out["index_mass_quantile_01"] = _imq(a, tot, 0.1)
    out["index_mass_quantile_025"] = _imq(a, tot, 0.25)
    out["index_mass_quantile_075"] = _imq(a, tot, 0.75)
    out["index_mass_quantile_09"] = _imq(a, tot, 0.9)
    if n > 1 and std > 0:
        z = (v - mean) / std
        out["cid_ce_normalized"] = float(np.sqrt(np.sum(np.diff(z) ** 2)))
    else:
        out["cid_ce_normalized"] = 0.0
    out["count_reoccurring_values"] = float(dup.sum())
    out["count_reoccurring_points"] = float(counts[dup].sum())
    return out


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
