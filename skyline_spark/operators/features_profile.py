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

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 145 features — the numpy-closed-form tranche of tsfresh's
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
    # round-4 second tranche (29 more -> 134): the spectral /
    # distributional EfficientFCParameters slice — fft_coefficient
    # (real/imag/abs at k=1..3, direct-DFT term order mirrored in the
    # SQL twin), fft_aggregated spectrum moments, energy_ratio_by_chunks
    # (np.array_split boundaries), change_quantiles with ORDER-STATISTIC
    # corridor bounds (discrete quantile, not tsfresh's interpolated one,
    # so the inside-corridor membership test is bit-identical across
    # engines), permutation_entropy (dim 3, tau 1, argsort tie order),
    # benford_correlation (first digit via %e scientific rounding in
    # both engines), linear_trend stderr on the ts axis, and the
    # closed-form lag-2 partial autocorrelation
    "fft_coef_1_real", "fft_coef_1_imag", "fft_coef_1_abs",
    "fft_coef_2_abs", "fft_coef_3_abs",
    "fft_agg_centroid", "fft_agg_variance",
    "fft_agg_skew", "fft_agg_kurtosis",
    "energy_ratio_chunk_0", "energy_ratio_chunk_1",
    "energy_ratio_chunk_2", "energy_ratio_chunk_3",
    "energy_ratio_chunk_4", "energy_ratio_chunk_5",
    "energy_ratio_chunk_6", "energy_ratio_chunk_7",
    "energy_ratio_chunk_8", "energy_ratio_chunk_9",
    "change_q_mean_00_10", "change_q_var_00_10",
    "change_q_mean_02_08", "change_q_var_02_08",
    "change_q_mean_04_06", "change_q_var_04_06",
    "permutation_entropy_3", "benford_correlation",
    "linear_trend_stderr", "pacf_lag2",
    # round-4 third tranche (11 more -> 145): agg_linear_trend over
    # chunk-mean series (tsfresh _aggregate_on_chunks: consecutive
    # chunk_len slices, x-axis = chunk index) at chunk_len 10 and 50,
    # and agg_autocorrelation (mean/median/var of the adjusted acf at
    # lags 1..min(40, n-1) — the statsmodels adjusted estimator, which
    # equals the autocorr_lag_k definition used above)
    "agg_lt10_slope", "agg_lt10_intercept",
    "agg_lt10_rvalue", "agg_lt10_stderr",
    "agg_lt50_slope", "agg_lt50_intercept",
    "agg_lt50_rvalue", "agg_lt50_stderr",
    "agg_acf_mean", "agg_acf_median", "agg_acf_var",
    # round-4 fourth tranche (27 more -> 172): the spectral-depth
    # EfficientFCParameters slice —
    # partial_autocorrelation lags 3..9 (Durbin-Levinson over the
    # adjusted-acf estimates, extending the pacf_lag2 convention),
    # spkt_welch_density coeff {2,5,8} + fourier_entropy bins
    # {2,3,5,10,100} over an own Welch periodogram in the
    # scipy.signal.welch default form (fs=1, periodic Hann,
    # nperseg=min(n,256), 50% overlap, per-segment constant detrend,
    # density scaling; entropy binning uses the same clamped-floor
    # formula as binned_entropy_10), and cwt_coefficients — Ricker
    # wavelet, scipy.signal.cwt conv semantics (wavelet length
    # min(10w, n), mode='same') at widths {2,5,10,20} and coeff
    # positions {0,5,10}
    "pacf_lag3", "pacf_lag4", "pacf_lag5", "pacf_lag6",
    "pacf_lag7", "pacf_lag8", "pacf_lag9",
    "welch_c2", "welch_c5", "welch_c8",
    "fourier_entropy_b2", "fourier_entropy_b3", "fourier_entropy_b5",
    "fourier_entropy_b10", "fourier_entropy_b100",
    "cwt_w2_c0", "cwt_w2_c5", "cwt_w2_c10",
    "cwt_w5_c0", "cwt_w5_c5", "cwt_w5_c10",
    "cwt_w10_c0", "cwt_w10_c5", "cwt_w10_c10",
    "cwt_w20_c0", "cwt_w20_c5", "cwt_w20_c10",
    # round-4 fifth tranche (5 more -> 177): ar_coefficient at
    # tsfresh's default grid (k=10, coeff 0..4) — the AutoReg(lags=10,
    # trend='c') OLS fit, solved by an OWN Cholesky factorization of
    # the normal equations written operation-for-operation identically
    # in numpy and the unrolled SQL twin (NOT lstsq/SVD, whose
    # pseudo-inverse path would diverge across engines on
    # ill-conditioned lag matrices); coeff 0 is the intercept
    "ar_k10_c0", "ar_k10_c1", "ar_k10_c2", "ar_k10_c3", "ar_k10_c4",
)

# round-4 sixth tranche (109 more -> 286): the FULL tsfresh default
# grids of families previously sampled at a few points —
# symmetry_looking r = 0.0..0.95 step 0.05 (16 new),
# large_standard_deviation r = 0.05..0.95 step 0.05 (15 new),
# index_mass_quantile q = 0.1..0.9 step 0.1 (6 new),
# change_quantiles every ql < qh corridor over {0,.2,.4,.6,.8,1} with
# mean + population var (12 new corridors, 24 features), and
# cwt_coefficients at ALL coeff positions 0..14 per width (48 new).
# Shared grid tables drive both the numpy kernel and the SQL twin
# generators in queries.py so the two sides cannot drift.
SYM_GRID_T6 = (
    ("000", 0.0), ("015", 0.15), ("025", 0.25), ("035", 0.35),
    ("04", 0.4), ("045", 0.45), ("05", 0.5), ("055", 0.55),
    ("06", 0.6), ("065", 0.65), ("07", 0.7), ("075", 0.75),
    ("08", 0.8), ("085", 0.85), ("09", 0.9), ("095", 0.95))
LSTD_GRID_T6 = (
    ("01", 0.1), ("015", 0.15), ("02", 0.2), ("03", 0.3),
    ("04", 0.4), ("045", 0.45), ("055", 0.55), ("06", 0.6),
    ("065", 0.65), ("07", 0.7), ("075", 0.75), ("08", 0.8),
    ("085", 0.85), ("09", 0.9), ("095", 0.95))
IMQ_GRID_T6 = (("02", 0.2), ("03", 0.3), ("04", 0.4),
               ("06", 0.6), ("07", 0.7), ("08", 0.8))
CQ_GRID_T6 = (
    ("00_02", 0.0, 0.2), ("00_04", 0.0, 0.4), ("00_06", 0.0, 0.6),
    ("00_08", 0.0, 0.8), ("02_04", 0.2, 0.4), ("02_06", 0.2, 0.6),
    ("02_10", 0.2, 1.0), ("04_08", 0.4, 0.8), ("04_10", 0.4, 1.0),
    ("06_08", 0.6, 0.8), ("06_10", 0.6, 1.0), ("08_10", 0.8, 1.0))
CWT_COEFFS_T6 = (1, 2, 3, 4, 6, 7, 8, 9, 11, 12, 13, 14)

FEATURE_NAMES = FEATURE_NAMES + (
    tuple(f"symmetry_r{t}" for t, _ in SYM_GRID_T6)
    + tuple(f"large_std_r{t}" for t, _ in LSTD_GRID_T6)
    + tuple(f"index_mass_quantile_{t}" for t, _ in IMQ_GRID_T6)
    + tuple(f"change_q_{agg}_{t}" for t, _, _ in CQ_GRID_T6
            for agg in ("mean", "var"))
    + tuple(f"cwt_w{w}_c{c}" for w in (2, 5, 10, 20)
            for c in CWT_COEFFS_T6))

# round-4 seventh tranche: name-for-name completion of the reference's
# pinned 216-feature tsfresh basket (skyline/tsfresh_feature_names.py,
# golden values tests/baseline/tsfresh-0.20.3-skyline...csv). The exact
# formulas were reverse-engineered against the golden CSVs and are
# pinned by tests/test_tsfresh_golden.py on the reference's OWN two
# baseline series. Degenerate change_quantiles corridors (ql >= qh)
# are part of tsfresh's grid; they evaluate through the same corridor
# code and are identically 0 by construction.
CQ_DEGEN_T7 = (
    ("02_02", 0.2, 0.2), ("04_02", 0.4, 0.2), ("04_04", 0.4, 0.4),
    ("06_02", 0.6, 0.2), ("06_04", 0.6, 0.4), ("06_06", 0.6, 0.6),
    ("08_02", 0.8, 0.2), ("08_04", 0.8, 0.4), ("08_06", 0.8, 0.6),
    ("08_08", 0.8, 0.8))
APEN_GRID_T7 = (("01", 0.1), ("03", 0.3), ("05", 0.5),
                ("07", 0.7), ("09", 0.9))
#: fixed rfft input length of the reference's fft_coefficient family —
#: empirically 2 * max_coeff = 18 on BOTH baseline series (n=60 and
#: n=1439), i.e. the transform reads only the first 18 samples
#: (zero-padded when shorter)
FFT_TF_N = 18

FEATURE_NAMES = FEATURE_NAMES + (
    ("autocorr_lag0", "mean_autocorrelation")
    + tuple(f"fft_tf_c{k}" for k in range(10))
    + ("value_count_nan", "value_count_inf", "value_count_minf",
       "num_peaks_1", "large_num_peaks_1", "large_num_peaks_3",
       "large_num_peaks_5", "ratio_unique_to_length",
       "pct_reoccurring_dp", "pct_reoccurring_val", "large_std_r00")
    + tuple(f"change_q_mean_{t}" for t, _, _ in CQ_DEGEN_T7)
    + tuple(f"approximate_entropy_r{t}" for t, _ in APEN_GRID_T7)
    + ("sample_entropy", "adf_tstat",
       "number_cwt_peaks_1", "number_cwt_peaks_5"))

#: features whose computation is genuinely not ANSI-SQL-expressible
#: (AIC-autolag ADF regression; scipy find_peaks_cwt ridge-line
#: filtering). They are excluded from features_sum and from the
#: driver-oracled projection, and pinned instead by the golden parity
#: test against the reference's own baseline CSVs.
NON_SQL_FEATURES = frozenset({
    "adf_tstat", "number_cwt_peaks_1", "number_cwt_peaks_5"})


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
    ac1 = _autocorr_k(centered, n, std, 1)
    x = ts - ts[0]
    if n > 1 and np.ptp(x) > 0:
        coef = np.polyfit(x, v, 1)
        slope, intercept = float(coef[0]), float(coef[1])
    else:
        slope, intercept = 0.0, 0.0
    # sample-adjusted skewness/kurtosis (pandas .skew()/.kurt(), the
    # form the reference's tsfresh basket pins; golden-CSV-verified)
    g1 = float(np.mean(centered ** 3) / (std ** 3)) if std > 0 else 0.0
    g2 = float(np.mean(centered ** 4) / (std ** 4)) if std > 0 else 0.0
    m3 = g1 * math.sqrt(n * (n - 1.0)) / (n - 2.0) \
        if n > 2 and std > 0 else 0.0
    m4 = ((n - 1.0) / ((n - 2.0) * (n - 3.0))
          * ((n + 1.0) * (g2 - 3.0) + 6.0)) \
        if n > 3 and std > 0 else 0.0
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
        # tsfresh relative locations: first = idx/n, last = (idx+1)/n
        "first_loc_max": float(np.argmax(v)) / n,
        "last_loc_max": float(n - np.argmax(v[::-1])) / n,
        "first_loc_min": float(np.argmin(v)) / n,
        "last_loc_min": float(n - np.argmin(v[::-1])) / n,
        "count_unique": float(np.unique(v).size),
        "has_duplicate": float(np.unique(v).size < n),
        "has_duplicate_max": float(np.sum(v == vmax) > 1),
        "has_duplicate_min": float(np.sum(v == vmin) > 1),
        **_second_tranche(x, v, n, mean, std, vmin, vmax, centered),
        **_third_tranche(v, n, mean, std, centered),
        **_fourth_tranche(ts, v, n, mean, std, centered),
        **_fifth_tranche(v, n, std, centered),
        **_seventh_tranche(v, n, mean, std, centered),
    }


def _c3(v: np.ndarray, n: int, lag: int) -> float:
    """tsfresh c3: mean of x[i]·x[i+lag]·x[i+2lag]."""
    if n <= 2 * lag:
        return 0.0
    return float(np.mean(v[:n - 2 * lag] * v[lag:n - lag] * v[2 * lag:]))


def _trev(v: np.ndarray, n: int, lag: int) -> float:
    """tsfresh time_reversal_asymmetry_statistic in the ORIGINAL
    (0.1.2) arrangement the reference's golden CSVs pin:
    mean of x[i+2lag]²·x[i] − x[i+lag]·x[i]² over the first n−2lag
    positions (verified value-exact on both baseline series)."""
    if n <= 2 * lag:
        return 0.0
    a, b, c = v[2 * lag:], v[lag:n - lag], v[:n - 2 * lag]
    return float(np.mean(a * a * c - b * c * c))


def _autocorr_k(centered: np.ndarray, n: int, std: float, k: int) -> float:
    """tsfresh autocorrelation__lag_k: Pearson r between the two
    overlapping slices x[:-k] and x[k:] (pandas Series.autocorr /
    np.corrcoef semantics — per-slice means and stds, NOT the global
    mean/var estimator; golden-CSV-verified). 0.0 where undefined."""
    if n <= k + 1 or std <= 0:
        return 0.0
    a, b = centered[:-k], centered[k:]
    # exact-constancy guard: a constant slice must yield 0, not the
    # 1-ulp mean-residue garbage the den>0 test alone lets through
    # (same min<max guard in the SQL twin, queries._acf_cc_sql)
    if float(a.max()) == float(a.min()) or float(b.max()) == float(b.min()):
        return 0.0
    m = n - k
    ma, mb = float(a.mean()), float(b.mean())
    da, db = a - ma, b - mb
    den = float(np.dot(da, da)) * float(np.dot(db, db))
    if den <= 0:
        return 0.0
    return float(np.dot(da, db) / math.sqrt(den))


def _acf_adj(centered: np.ndarray, n: int, std: float, k: int) -> float:
    """Adjusted-denominator acf estimate R(k) = sum c_t c_{t+k} /
    ((n−k)·var) — the tsfresh agg_autocorrelation estimator, kept for
    the agg_acf_* aggregates."""
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
    imq = _imq(a, tot, 0.5)
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
    """tsfresh index_mass_quantile: the RELATIVE 1-based index where
    q of the |x| mass lies left of it (golden-CSV-verified fraction
    form)."""
    if tot <= 0:
        return 0.0
    return float(np.searchsorted(np.cumsum(a), q * tot) + 1) / a.size


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
    for tag, r in (("005", 0.05), ("02", 0.2), ("03", 0.3)) + SYM_GRID_T6:
        out[f"symmetry_r{tag}"] = float(abs(mean - med) < r * rng_v)
    for tag, r in (("005", 0.05), ("035", 0.35),
                   ("05", 0.5)) + LSTD_GRID_T6:
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
    for tag, q in IMQ_GRID_T6:
        out[f"index_mass_quantile_{tag}"] = _imq(a, tot, q)
    if n > 1 and std > 0:
        z = (v - mean) / std
        out["cid_ce_normalized"] = float(np.sqrt(np.sum(np.diff(z) ** 2)))
    else:
        out["cid_ce_normalized"] = 0.0
    out["count_reoccurring_values"] = float(dup.sum())
    out["count_reoccurring_points"] = float(counts[dup].sum())
    return out


def _fourth_tranche(ts: np.ndarray, v: np.ndarray, n: int, mean: float,
                    std: float, centered: np.ndarray) -> dict[str, float]:
    out: dict[str, float] = {}
    # fft_coefficient at k=1..3 — direct DFT dot products with the SAME
    # term order/argument expression as the SQL twin (numpy rfft sign
    # convention: imag = -sum v sin)
    idx = np.arange(n, dtype=np.float64)
    for k in (1, 2, 3):
        ang = 2.0 * np.pi * k * idx / n
        re = float(np.dot(v, np.cos(ang)))
        im = -float(np.dot(v, np.sin(ang)))
        if k == 1:
            out["fft_coef_1_real"] = re
            out["fft_coef_1_imag"] = im
        out[f"fft_coef_{k}_abs"] = float(np.sqrt(re * re + im * im))
    # fft_aggregated — weighted bin-index moments of the rfft amplitude
    # spectrum (tsfresh centroid/variance/skew/kurtosis formulas)
    amps = np.abs(np.fft.rfft(v))
    tot = float(amps.sum())
    if tot > 0:
        bins = np.arange(amps.size, dtype=np.float64)
        m1 = float(np.dot(amps, bins)) / tot
        m2 = float(np.dot(amps, bins ** 2)) / tot
        m3 = float(np.dot(amps, bins ** 3)) / tot
        m4 = float(np.dot(amps, bins ** 4)) / tot
        var = m2 - m1 * m1
        out["fft_agg_centroid"] = m1
        out["fft_agg_variance"] = var
        # guards mirrored in the SQL twin: on a constant series (std=0)
        # the non-DC amplitudes are pure engine noise (exact zeros from
        # the FFT butterflies, ~1e-13 residues from the direct DFT), so
        # the moment quotients are noise/noise — gate on the EXACT
        # time-domain std; the relative-epsilon var guard additionally
        # keeps single-bin spectra (var = cancellation noise) at 0.0
        if std > 0 and var > 1e-12 * (m2 + m1 * m1):
            out["fft_agg_skew"] = \
                (m3 - 3 * m1 * m2 + 2 * m1 ** 3) / var ** 1.5
            out["fft_agg_kurtosis"] = \
                (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 ** 4) \
                / (var * var)
        else:
            out["fft_agg_skew"] = 0.0
            out["fft_agg_kurtosis"] = 0.0
    else:
        for kname in ("fft_agg_centroid", "fft_agg_variance",
                      "fft_agg_skew", "fft_agg_kurtosis"):
            out[kname] = 0.0
    # energy_ratio_by_chunks — np.array_split boundaries: the first
    # n%10 chunks get ceil(n/10) points
    e_tot = float(np.dot(v, v))
    q, r = divmod(n, 10)
    start = 0
    for j in range(10):
        size = q + 1 if j < r else q
        chunk = v[start:start + size]
        start += size
        out[f"energy_ratio_chunk_{j}"] = \
            float(np.dot(chunk, chunk)) / e_tot if e_tot > 0 else 0.0
    # change_quantiles (isabs=True, f_agg mean + population var) with
    # LINEAR-INTERPOLATION corridor bounds (np.quantile / pd.quantile —
    # the tsfresh form the golden CSVs pin; all 25 mean_abs_change_
    # quantiles corridors verified value-exact). Degenerate corridors
    # (ql >= qh) flow through the same code and are identically 0.
    d = np.diff(v) if n > 1 else np.empty(0)
    for tag, ql, qh in ((("00_10", 0.0, 1.0), ("02_08", 0.2, 0.8),
                         ("04_06", 0.4, 0.6)) + CQ_GRID_T6
                        + CQ_DEGEN_T7):
        degen = ql >= qh
        lo = float(np.quantile(v, ql))
        hi = float(np.quantile(v, qh))
        if n > 1:
            inside = (v >= lo) & (v <= hi)
            sel = np.abs(d[inside[:-1] & inside[1:]])
        else:
            sel = np.empty(0)
        if sel.size:
            # corridor means are rationals p/(100*n) whose float-sum
            # differs between engines by ~1e-13 and can straddle ANY
            # decimal rounding boundary (r04 driver red row:
            # f_change_q_mean_02_10 on the 5e-7 half-grid). When every
            # diff is an exact integer-cent value (the %.2f parse
            # domain guarantees it), sum exact cents and divide once —
            # a single correctly-rounded double, byte-equal to the SQL
            # twin with no rounding needed. Non-cent data (e.g. the
            # statsd golden series) keeps the float mean.
            cents = sel * 100.0
            snapped = np.rint(cents)
            if float(np.max(np.abs(cents - snapped))) < 1e-6:
                m = float(snapped.sum() / (100.0 * sel.size))
            else:
                m = float(sel.mean())
            out[f"change_q_mean_{tag}"] = m
            if not degen:
                out[f"change_q_var_{tag}"] = \
                    float(np.mean((sel - m) ** 2))
        else:
            out[f"change_q_mean_{tag}"] = 0.0
            if not degen:
                out[f"change_q_var_{tag}"] = 0.0
    # permutation_entropy (dim 3, tau 1) — pattern id by argsort with
    # stable index tie-breaking; natural-log entropy
    if n > 2:
        a, b, c = v[:-2], v[1:-1], v[2:]
        pats = np.array([
            np.sum((a <= b) & (b <= c)),   # (0,1,2)
            np.sum((a <= c) & (c < b)),    # (0,2,1)
            np.sum((b < a) & (a <= c)),    # (1,0,2)
            np.sum((b <= c) & (c < a)),    # (1,2,0)
            np.sum((c < a) & (a <= b)),    # (2,0,1)
            np.sum((c < b) & (b < a)),     # (2,1,0)
        ], dtype=np.float64)
        p = pats[pats > 0] / (n - 2)
        out["permutation_entropy_3"] = float(-np.sum(p * np.log(p)))
    else:
        out["permutation_entropy_3"] = 0.0
    # benford_correlation — first significant digit via %e scientific
    # rounding (np.format_float_scientific here, printf('%e') in the
    # SQL twin: identical on decimal-grid data), correlation against
    # log10(1 + 1/d) in the explicit closed form both engines share
    ax = np.abs(np.nan_to_num(v))
    digits = np.zeros(n, dtype=np.int64)
    for i in np.flatnonzero(ax > 0):
        digits[i] = int(np.format_float_scientific(ax[i],
                                                   precision=6)[0])
    pd_ = np.array([float(np.sum(digits == dd)) / n
                    for dd in range(1, 10)])
    bd = np.log10(1.0 + 1.0 / np.arange(1, 10, dtype=np.float64))
    mp_, mb = float(pd_.mean()), float(bd.mean())
    vp = float(np.mean(pd_ * pd_)) - mp_ * mp_
    vb = float(np.mean(bd * bd)) - mb * mb
    cov = float(np.mean(pd_ * bd)) - mp_ * mb
    out["benford_correlation"] = \
        cov / np.sqrt(vp * vb) if vp > 0 and vb > 0 else 0.0
    # linear_trend stderr on the ts axis (regr_sxx/syy/sxy formulas)
    if n > 2:
        tbar, vbar = float(ts.mean()), mean
        dt = ts - tbar
        sxx = float(np.dot(dt, dt))
        syy = float(np.dot(v - vbar, v - vbar))
        sxy = float(np.dot(dt, v - vbar))
        out["linear_trend_stderr"] = float(np.sqrt(
            max(syy - sxy * sxy / sxx, 0.0) / ((n - 2) * sxx))) \
            if sxx > 0 else 0.0
    else:
        out["linear_trend_stderr"] = 0.0
    # lag-2 partial autocorrelation, Durbin-Levinson closed form over
    # the tsfresh-style acf estimates
    r1 = _autocorr_k(centered, n, std, 1)
    r2 = _autocorr_k(centered, n, std, 2)
    denom = 1.0 - r1 * r1
    out["pacf_lag2"] = (r2 - r1 * r1) / denom if denom != 0 else 0.0
    # agg_linear_trend — OLS over the chunk-mean series, x = chunk index
    for size in (10, 50):
        k = -(-n // size)  # ceil
        if k > 2:
            means = np.array([float(v[j * size:(j + 1) * size].mean())
                              for j in range(k)])
            xs = np.arange(k, dtype=np.float64)
            xbar = float(xs.mean())
            ybar = float(means.mean())
            sxx = float(np.dot(xs - xbar, xs - xbar))
            syy = float(np.dot(means - ybar, means - ybar))
            sxy = float(np.dot(xs - xbar, means - ybar))
            slope = sxy / sxx
            out[f"agg_lt{size}_slope"] = slope
            out[f"agg_lt{size}_intercept"] = ybar - slope * xbar
            out[f"agg_lt{size}_rvalue"] = \
                sxy / np.sqrt(sxx * syy) if syy > 0 else 0.0
            out[f"agg_lt{size}_stderr"] = float(np.sqrt(
                max(syy - sxy * sxy / sxx, 0.0) / ((k - 2) * sxx)))
        else:
            for a in ("slope", "intercept", "rvalue", "stderr"):
                out[f"agg_lt{size}_{a}"] = 0.0
    # agg_autocorrelation — adjusted acf at lags 1..min(40, n-1)
    maxlag = min(40, n - 1)
    if maxlag >= 1 and std > 0:
        acfs = np.array([_acf_adj(centered, n, std, k)
                         for k in range(1, maxlag + 1)])
        out["agg_acf_mean"] = float(acfs.mean())
        out["agg_acf_median"] = float(np.median(acfs))
        m_ = float(acfs.mean())
        out["agg_acf_var"] = float(np.mean((acfs - m_) ** 2))
    else:
        out["agg_acf_mean"] = 0.0
        out["agg_acf_median"] = 0.0
        out["agg_acf_var"] = 0.0
    return out


def _welch_pxx(v: np.ndarray, n: int) -> np.ndarray | None:
    """Own Welch periodogram in the scipy.signal.welch DEFAULT form the
    tsfresh spkt_welch_density / fourier_entropy calculators rely on:
    fs=1, periodic Hann window, nperseg=min(n, 256), noverlap=nperseg//2,
    per-segment constant detrend, 'density' scaling (1/sum(win^2)),
    one-sided doubling except DC and the even-nperseg Nyquist bin, mean
    average over segments. Written term-for-term like the SQL twin
    (direct DFT there, rfft here — deltas absorbed by output rounding)."""
    nper = min(n, 256)
    if nper < 2:
        return None
    step = nper - nper // 2
    nseg = (n - nper) // step + 1
    i = np.arange(nper, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / nper)
    acc = np.zeros(nper // 2 + 1)
    for s in range(nseg):
        seg = v[s * step:s * step + nper]
        acc += np.abs(np.fft.rfft((seg - seg.mean()) * win)) ** 2
    pxx = acc / (nseg * float(np.dot(win, win)))
    if nper % 2 == 0:
        pxx[1:-1] *= 2.0
    else:
        pxx[1:] *= 2.0
    return pxx


def _binned_entropy_arr(x: np.ndarray, bins: int) -> float:
    """binned_entropy over an arbitrary array with the SAME clamped
    floor bin-index formula as binned_entropy_10 (written identically
    in the SQL twin so edge values bin the same way in both engines)."""
    mn, mx = float(x.min()), float(x.max())
    if mx <= mn:
        return 0.0
    b = np.minimum(np.floor((x - mn) / (mx - mn) * bins), bins - 1)
    p = np.unique(b, return_counts=True)[1] / x.size
    return float(-np.sum(p * np.log(p)))


def _ar_ols(v: np.ndarray, n: int, k: int = 10) -> list[float] | None:
    """AutoReg(lags=k, trend='c') OLS coefficients [c, phi_1..phi_k]
    via an OWN Cholesky solve of the normal equations — the identical
    operation sequence is unrolled in the SQL twin, so both engines
    follow the same floating-point path (lstsq's SVD would not).
    Returns None (-> all-0.0 features) when there are fewer usable rows
    than parameters or a pivot degenerates (relative guard, mirrored)."""
    if n < 2 * k + 1:
        return None
    # normal equations over rows t = k..n-1: regressors [1, x_{t-1}..x_{t-k}]
    m = k + 1
    a = np.empty((m, m))
    b = np.empty(m)
    nobs = n - k
    a[0, 0] = float(nobs)
    b[0] = float(v[k:].sum())
    for p in range(1, m):
        a[0, p] = a[p, 0] = float(v[k - p:n - p].sum())
        b[p] = float(np.dot(v[k - p:n - p], v[k:]))
        for q in range(p, m):
            a[p, q] = a[q, p] = float(np.dot(v[k - p:n - p],
                                             v[k - q:n - q]))
    # Cholesky a = L L^T, unrolled identically in SQL
    L = np.zeros((m, m))
    for j in range(m):
        d = a[j, j] - float(np.dot(L[j, :j], L[j, :j]))
        if not d > 1e-10 * (abs(a[j, j]) + 1.0):
            return None
        L[j, j] = np.sqrt(d)
        for i in range(j + 1, m):
            L[i, j] = (a[i, j]
                       - float(np.dot(L[i, :j], L[j, :j]))) / L[j, j]
    # forward then back substitution
    z = np.zeros(m)
    for i in range(m):
        z[i] = (b[i] - float(np.dot(L[i, :i], z[:i]))) / L[i, i]
    beta = np.zeros(m)
    for i in range(m - 1, -1, -1):
        beta[i] = (z[i] - float(np.dot(L[i + 1:, i], beta[i + 1:]))) \
            / L[i, i]
    return [float(x) for x in beta]


def _fifth_tranche(v: np.ndarray, n: int, std: float,
                   centered: np.ndarray) -> dict[str, float]:
    out: dict[str, float] = {}
    # partial_autocorrelation lags 3..9 — Durbin-Levinson recursion over
    # the adjusted-acf estimates (r_k = autocorr_lag_k above); stage 2
    # reproduces the pacf_lag2 closed form, stages 3..9 extend it.
    # Guard convention: a zero denominator at any stage yields 0.0.
    r = [_autocorr_k(centered, n, std, k) for k in range(1, 10)]
    phi = [r[0]]
    for k in range(2, 10):
        num = r[k - 1] - sum(phi[j] * r[k - 2 - j] for j in range(k - 1))
        den = 1.0 - sum(phi[j] * r[j] for j in range(k - 1))
        pkk = num / den if den != 0 else 0.0
        phi = [phi[j] - pkk * phi[k - 2 - j]
               for j in range(k - 1)] + [pkk]
        if k >= 3:
            out[f"pacf_lag{k}"] = pkk
    # Welch periodogram features — gated on std > 0 (mirrored in the
    # SQL twin): a constant series detrends to an exact-zero segment in
    # one engine but an ~1e-15 constant residual in the other, and the
    # scale-free entropy of that residual's window-spectrum shape would
    # flip between 0.0 and a finite value
    pxx = _welch_pxx(v, n) if std > 0 else None
    if pxx is None:
        for c in (2, 5, 8):
            out[f"welch_c{c}"] = 0.0
        for b in (2, 3, 5, 10, 100):
            out[f"fourier_entropy_b{b}"] = 0.0
    else:
        for c in (2, 5, 8):
            out[f"welch_c{c}"] = float(pxx[c]) if pxx.size > c else 0.0
        pmax = float(pxx.max())
        for b in (2, 3, 5, 10, 100):
            out[f"fourier_entropy_b{b}"] = \
                _binned_entropy_arr(pxx / pmax, b) if pmax > 0 else 0.0
    # ar_coefficient (k=10, coeff 0..4) — see FEATURE_NAMES note
    beta = _ar_ols(v, n)
    for c in range(5):
        out[f"ar_k10_c{c}"] = beta[c] if beta is not None else 0.0
    # cwt_coefficients — Ricker wavelet of length min(10w, n),
    # np.convolve mode='same' (the wavelet is even, so scipy's reversal
    # is a no-op), value at position coeff; coeff >= n degenerates to 0
    for w in (2, 5, 10, 20):
        nn = min(10 * w, n)
        vec = np.arange(nn, dtype=np.float64) - (nn - 1) / 2.0
        wav = (2.0 / (np.sqrt(3.0 * w) * np.pi ** 0.25)
               * (1.0 - vec * vec / (w * w))
               * np.exp(-vec * vec / (2.0 * w * w)))
        conv = np.convolve(v, wav, mode="same")
        for c in (0, 5, 10) + CWT_COEFFS_T6:
            out[f"cwt_w{w}_c{c}"] = float(conv[c]) if c < n else 0.0
    return out


def _apen_phi(v: np.ndarray, n: int, m: int, r: float) -> float:
    """phi(m) of tsfresh approximate_entropy: mean log of the fraction
    of m-vectors within Chebyshev distance r of each m-vector
    (self-matches included, so the log argument is never 0). The
    O(n^2) pairwise matrix is row-blocked to bound peak memory."""
    cnt = n - m + 1
    xr = np.lib.stride_tricks.sliding_window_view(v, m)
    c = np.empty(cnt)
    block = max(1, 2_000_000 // max(cnt, 1))
    for s in range(0, cnt, block):
        e = min(s + block, cnt)
        dmax = np.max(np.abs(xr[s:e, None, :] - xr[None, :, :]), axis=2)
        c[s:e] = np.sum(dmax <= r, axis=1)
    return float(np.sum(np.log(c / cnt)) / cnt)


def _sample_entropy(v: np.ndarray, n: int) -> float:
    """tsfresh sample_entropy as pinned by the reference's golden CSVs
    (the original running-match implementation reduces to a pair
    count): -log(#{i<j: |x_i - x_j| < 0.2 std} / (n(n-1)/2)).
    Row-blocked O(n^2); verified value-exact on both baseline series."""
    if n < 2:
        return 0.0
    tol = 0.2 * float(v.std())
    cols = np.arange(n)
    a0 = 0
    block = 2048
    for s in range(0, n, block):
        e = min(s + block, n)
        hits = np.abs(v[s:e, None] - v[None, :]) < tol
        a0 += int(np.sum(hits & (cols[None, :] > cols[s:e, None])))
    if a0 == 0:
        return 0.0
    return float(-np.log(2.0 * a0 / (n * (n - 1.0))))


def _cwt_matrix(v: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """scipy-style ricker cwt rows (same wavelet/conv conventions as
    the fifth-tranche cwt_coefficients, which are golden-CSV-exact)."""
    out = np.empty((widths.size, v.size))
    for i, w in enumerate(widths):
        nn = min(10 * int(w), v.size)
        vec = np.arange(nn, dtype=np.float64) - (nn - 1) / 2.0
        wav = (2.0 / (np.sqrt(3.0 * w) * np.pi ** 0.25)
               * (1.0 - vec * vec / (w * w))
               * np.exp(-vec * vec / (2.0 * w * w)))
        out[i] = np.convolve(v, wav, mode="same")
    return out


def _number_cwt_peaks(v: np.ndarray, n: int, nw: int) -> float:
    """tsfresh number_cwt_peaks: len(scipy.signal.find_peaks_cwt(x,
    widths=1..nw, ricker)) — own port of scipy's ridge-line
    identification (nearest-previous-column linking, gap_thresh =
    ceil(widths[0]), max_distances = widths/4) and filtering
    (min_length = ceil(rows/4), min_snr 1 vs the 10th percentile of
    the width-1 row over a ceil(n/20) window). Verified against the
    reference's golden counts on both baseline series."""
    if n < 3:
        return 0.0
    widths = np.arange(1, nw + 1)
    gap_thresh = math.ceil(widths[0])
    max_d = widths / 4.0
    mat = _cwt_matrix(v, widths)
    locs = np.arange(n)
    relmax = np.ones(mat.shape, dtype=bool)
    relmax &= mat > mat[:, np.clip(locs + 1, 0, n - 1)]
    relmax &= mat > mat[:, np.clip(locs - 1, 0, n - 1)]
    has = np.nonzero(relmax.any(axis=1))[0]
    if has.size == 0:
        return 0.0
    start = int(has[-1])
    ridge = [[[start], [int(c)], 0] for c in np.nonzero(relmax[start])[0]]
    final: list = []
    for row in range(start - 1, -1, -1):
        for line in ridge:
            line[2] += 1
        prev = np.array([ln[1][-1] for ln in ridge])
        for col in np.nonzero(relmax[row])[0]:
            line = None
            if prev.size:
                diffs = np.abs(int(col) - prev)
                closest = int(np.argmin(diffs))
                if diffs[closest] <= max_d[row]:
                    line = ridge[closest]
            if line is not None:
                line[1].append(int(col))
                line[0].append(row)
                line[2] = 0
            else:
                ridge.append([[row], [int(col)], 0])
        for i in range(len(ridge) - 1, -1, -1):
            if ridge[i][2] > gap_thresh:
                final.append(ridge[i])
                del ridge[i]
    min_length = math.ceil(mat.shape[0] / 4.0)
    window = int(math.ceil(n / 20.0))
    hf, odd = divmod(window, 2)
    row0 = mat[0]
    noises = np.array([
        np.percentile(row0[max(i - hf, 0):min(i + hf + odd, n)], 10)
        for i in range(n)])
    cnt = 0
    for line in final + ridge:
        rows_ = np.asarray(line[0])
        cols_ = np.asarray(line[1])
        srt = np.argsort(rows_, kind="stable")
        rows_, cols_ = rows_[srt], cols_[srt]
        if rows_.size < min_length:
            continue
        denom = noises[cols_[0]]
        snr = abs(mat[rows_[0], cols_[0]] / denom) if denom != 0 \
            else math.inf
        if snr < 1.0:
            continue
        cnt += 1
    return float(cnt)


def _seventh_tranche(v: np.ndarray, n: int, mean: float, std: float,
                     centered: np.ndarray) -> dict[str, float]:
    """Round-4 seventh tranche: the remaining names of the reference's
    216-feature tsfresh basket (skyline/tsfresh_feature_names.py),
    each formula verified value-exact against the reference's own
    golden CSVs (tests/baseline/tsfresh-0.20.3-skyline...csv and the
    0.1.2 statsd baseline) by tests/test_tsfresh_golden.py."""
    out: dict[str, float] = {}
    var = std * std
    out["autocorr_lag0"] = 1.0 if std > 0 else 0.0
    # mean_autocorrelation — the ORIGINAL tsfresh estimator divides the
    # lag-l raw autocovariance sum by l (ascending), not (n-l): mean
    # over l of sum_t c_t c_{t+l} / (l * var). FFT path above 4096
    # points (identical to ~1e-10 rel; the oracle rounding absorbs it).
    if n > 1 and var > 0:
        if n <= 4096:
            r = np.correlate(centered, centered, mode="full")[n:]
        else:
            f = np.fft.rfft(centered, 2 * n)
            r = np.fft.irfft(f * np.conj(f))[1:n]
        out["mean_autocorrelation"] = \
            float(np.mean(r / (var * np.arange(1, n))))
    else:
        out["mean_autocorrelation"] = 0.0
    # fft_coefficient coeff 0..9 — rfft over the FIRST 18 samples
    # (zero-padded when shorter), real part; see FFT_TF_N note. Written
    # as the direct DFT cosine sum in the SAME argument shape as the
    # SQL twin (rfft-vs-direct deltas ~1e-12 rel, inside both the
    # golden tolerance and the oracle rounding).
    vv = v[:FFT_TF_N]
    tt = np.arange(vv.size, dtype=np.float64)
    for k in range(10):
        out[f"fft_tf_c{k}"] = \
            float(np.dot(vv, np.cos(2.0 * np.pi * k * tt / 18.0)))
    out["value_count_nan"] = float(np.isnan(v).sum())
    out["value_count_inf"] = float(np.sum(v == np.inf))
    out["value_count_minf"] = float(np.sum(v == -np.inf))
    out["num_peaks_1"] = _num_peaks_n(v, n, 1)
    for k in (1, 3, 5):
        out[f"large_num_peaks_{k}"] = float(_num_peaks_n(v, n, k) > 5)
    uniq, counts = np.unique(v, return_counts=True)
    dup = counts > 1
    out["ratio_unique_to_length"] = uniq.size / n
    # tsfresh's famously swapped pair: _dp = reoccurring unique values
    # over all unique values, _val = reoccurring datapoints over n
    out["pct_reoccurring_dp"] = \
        float(dup.sum()) / uniq.size if uniq.size else 0.0
    out["pct_reoccurring_val"] = float(counts[dup].sum()) / n
    out["large_std_r00"] = float(std > 0.0)
    for tag, rr in APEN_GRID_T7:
        rabs = rr * std
        if n <= 3 or std <= 0:
            out[f"approximate_entropy_r{tag}"] = 0.0
        else:
            out[f"approximate_entropy_r{tag}"] = abs(
                _apen_phi(v, n, 2, rabs) - _apen_phi(v, n, 3, rabs))
    out["sample_entropy"] = _sample_entropy(v, n) if std > 0 else 0.0
    from skyline_spark.functions.stats import adfuller_tstat
    out["adf_tstat"] = adfuller_tstat(v) if n >= 12 and std > 0 else 0.0
    out["number_cwt_peaks_1"] = _number_cwt_peaks(v, n, 1)
    out["number_cwt_peaks_5"] = _number_cwt_peaks(v, n, 5)
    return out


def feature_profiles(parsed: DataFrame, key: str = "conv_id") -> DataFrame:
    """One feature-vector row per series (conv_id, features map)."""
    def fp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_epoch", kind="stable")
        feats = compute_features(pdf["ts_epoch"].to_numpy(),
                                 pdf["value"].to_numpy())
        row = {"conv_id": pdf[key].iloc[0],
               "features_sum": float(sum(
                   val for k, val in feats.items()
                   if k not in NON_SQL_FEATURES))}
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
