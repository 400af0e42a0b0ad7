"""Absolute feature parity against the REFERENCE'S OWN golden CSVs.

The reference pins its ionosphere feature basket to a fixed tsfresh
version and ships golden feature values for two input series
(reference tests/baseline/tsfresh_features_test.py):

- the first 60 points of utils/data.json, baselined by the fork the
  reference pins today (tests/baseline/tsfresh-0.20.3-skyline...csv,
  216 features), and
- the 1439-point stats.statsd.bad_lines_seen.20161110.csv series,
  baselined by the original tsfresh 0.1.2 (206 features).

This test maps every golden feature name to the corresponding
skyline_spark feature (operators/features_profile.compute_features)
and asserts VALUE equality within 1e-6 relative — i.e. the engine
reproduces the reference's trained-profile feature space exactly,
not just a similar-looking basket.
"""

from __future__ import annotations

import csv
import json
import os
import warnings

import numpy as np
import pytest

from skyline_spark.operators.features_profile import compute_features

BASELINE = "/root/reference/tests/baseline"
DATA_JSON = "/root/reference/utils/data.json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASELINE), reason="reference baselines not present")


def _load_gold(path: str) -> dict[str, float]:
    gold = {}
    with open(path) as fh:
        for row in csv.reader(fh):
            if row and row[0].startswith("value__"):
                gold[row[0][len("value__"):]] = float(row[1])
    return gold


def _name_map() -> dict[str, str]:
    """tsfresh golden feature name -> compute_features key."""
    m = {
        "variance_larger_than_standard_deviation": "var_gt_std",
        "has_duplicate_max": "has_duplicate_max",
        "has_duplicate_min": "has_duplicate_min",
        "has_duplicate": "has_duplicate",
        "sum_values": "sum",
        "abs_energy": "abs_energy",
        "mean_abs_change": "mean_abs_change",
        "mean_change": "mean_change",
        "median": "median",
        "mean": "mean",
        "length": "length",
        "standard_deviation": "std",
        "variance": "variance",
        "skewness": "skewness_like",
        "kurtosis": "kurtosis_like",
        "absolute_sum_of_changes": "abs_sum_of_changes",
        "longest_strike_below_mean": "longest_strike_below_mean",
        "longest_strike_above_mean": "longest_strike_above_mean",
        "count_above_mean": "count_above_mean",
        "count_below_mean": "count_below_mean",
        "last_location_of_maximum": "last_loc_max",
        "first_location_of_maximum": "first_loc_max",
        "last_location_of_minimum": "last_loc_min",
        "first_location_of_minimum": "first_loc_min",
        # tsfresh's sum_of_reoccurring_values counts each reoccurring
        # datapoint with multiplicity (the famous naming quirk)
        "sum_of_reoccurring_values": "sum_reoccurring_points",
        "maximum": "max",
        "minimum": "min",
        "mean_second_derivate_central": "mean_second_derivative",
        "binned_entropy__max_bins_10": "binned_entropy_10",
        "mean_autocorrelation": "mean_autocorrelation",
        "augmented_dickey_fuller": "adf_tstat",
        "sample_entropy": "sample_entropy",
        "percentage_of_reoccurring_datapoints_to_all_datapoints":
            "pct_reoccurring_dp",
        "percentage_of_reoccurring_values_to_all_values":
            "pct_reoccurring_val",
        "ratio_value_number_to_time_series_length":
            "ratio_unique_to_length",
        "range_count__max_1__min_-1": "range_count_m1_1",
        "value_count__value_0": "value_count_0",
        "value_count__value_1": "value_count_1",
        "value_count__value_nan": "value_count_nan",
        "value_count__value_inf": "value_count_inf",
        "value_count__value_-inf": "value_count_minf",
        "number_cwt_peaks__n_1": "number_cwt_peaks_1",
        "number_cwt_peaks__n_5": "number_cwt_peaks_5",
        "autocorrelation__lag_0": "autocorr_lag0",
        "number_peaks__n_1": "num_peaks_1",
    }
    for lag in (1, 2, 3):
        m[f"time_reversal_asymmetry_statistic__lag_{lag}"] = \
            f"trev_lag{lag}"
    for lag in range(1, 10):
        m[f"autocorrelation__lag_{lag}"] = f"autocorr_lag{lag}"
    rgrid = [
        ("0.0", "000"), ("0.05", "005"), ("0.1", "01"),
        ("0.15000000000000002", "015"), ("0.2", "02"), ("0.25", "025"),
        ("0.30000000000000004", "03"), ("0.35000000000000003", "035"),
        ("0.4", "04"), ("0.45", "045"), ("0.5", "05"), ("0.55", "055"),
        ("0.6000000000000001", "06"), ("0.65", "065"),
        ("0.7000000000000001", "07"), ("0.75", "075"), ("0.8", "08"),
        ("0.8500000000000001", "085"), ("0.9", "09"),
        ("0.9500000000000001", "095")]
    for rs, r in rgrid:
        # both the py3 full-repr and py2 short-repr spellings appear
        # across baseline vintages
        for spell in (rs, f"{float(rs):g}"):
            m[f"symmetry_looking__r_{spell}"] = f"symmetry_r{r}"
    for rs, r in rgrid[:10]:
        tag = "00" if r == "000" else r
        for spell in (rs, f"{float(rs):g}"):
            m[f"large_standard_deviation__r_{spell}"] = \
                f"large_std_r{tag}"
    for q in ("0.1", "0.2", "0.3", "0.4", "0.6", "0.7", "0.8", "0.9"):
        m[f"quantile__q_{q}"] = "q" + q.replace("0.", "").ljust(2, "0")
        m[f"index_mass_quantile__q_{q}"] = \
            "index_mass_quantile_0" + q.replace("0.", "")
    for nn in (3, 5):
        m[f"number_peaks__n_{nn}"] = f"num_peaks_{nn}"
    for nn in (1, 3, 5):
        m[f"large_number_of_peaks__n_{nn}"] = f"large_num_peaks_{nn}"
    for c in range(15):
        for w in (2, 5, 10, 20):
            m[f"cwt_coefficients__widths_(2, 5, 10, 20)"
              f"__coeff_{c}__w_{w}"] = f"cwt_w{w}_c{c}"
    for c in (2, 5, 8):
        m[f"spkt_welch_density__coeff_{c}"] = f"welch_c{c}"
    for c in range(5):
        m[f"ar_coefficient__k_10__coeff_{c}"] = f"ar_k10_c{c}"
    tag = {"0.0": "00", "0.2": "02", "0.4": "04",
           "0.6": "06", "0.8": "08", "1.0": "10"}
    for ql in ("0.0", "0.2", "0.4", "0.6", "0.8"):
        for qh in ("0.2", "0.4", "0.6", "0.8", "1.0"):
            m[f"mean_abs_change_quantiles__qh_{qh}__ql_{ql}"] = \
                f"change_q_mean_{tag[ql]}_{tag[qh]}"
    for c in range(10):
        m[f"fft_coefficient__coeff_{c}"] = f"fft_tf_c{c}"
    for rr in ("0.1", "0.3", "0.5", "0.7", "0.9"):
        m[f"approximate_entropy__m_2__r_{rr}"] = \
            "approximate_entropy_r0" + rr[-1]
    return m


def _assert_parity(ts: np.ndarray, v: np.ndarray,
                   gold: dict[str, float]) -> None:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = compute_features(ts, v)
    nmap = _name_map()
    unmapped = [g for g in gold if g not in nmap]
    assert not unmapped, f"golden names with no mapping: {unmapped}"
    missing = [nmap[g] for g in gold if nmap[g] not in ours]
    assert not missing, f"mapped names absent from the kernel: {missing}"
    bad = []
    for g, val in gold.items():
        mine = ours[nmap[g]]
        if not abs(mine - val) <= 1e-6 + 1e-6 * abs(val):
            bad.append((g, val, mine))
    assert not bad, f"{len(bad)} golden value mismatches: {bad[:10]}"


def test_golden_parity_data_json_60pt():
    """All 216 features of the fork the reference pins today
    (tsfresh-0.20.3-skyline) on the first 60 points of data.json —
    the exact input the reference's own parity test uses
    (tests/baseline/tsfresh_features_test.py:139)."""
    pts = json.load(open(DATA_JSON))["results"][:60]
    assert int(pts[0][0]) == 1369677886 and len(pts) == 60
    ts = np.array([p[0] for p in pts], dtype=np.float64)
    v = np.array([float(p[1]) for p in pts])
    gold = _load_gold(
        f"{BASELINE}/tsfresh-0.20.3-skyline.py3.data.json"
        ".features.transposed.csv")
    assert len(gold) == 216
    _assert_parity(ts, v, gold)


def test_golden_parity_statsd_1439pt():
    """All 206 features of the original tsfresh 0.1.2 baseline on the
    1439-point statsd series — a second, independent (length, shape)
    point pinning the same formulas (sparse/zero-heavy input)."""
    with open(f"{BASELINE}/stats.statsd.bad_lines_seen.20161110.csv") \
            as fh:
        rows = [r for r in csv.reader(fh) if r]
    v = np.array([float(r[-1]) for r in rows])
    ts = np.arange(v.size, dtype=np.float64) * 60.0
    gold = _load_gold(
        f"{BASELINE}/tsfresh-0.1.2.stats.statsd.bad_lines_seen"
        ".20161110.csv.features.transposed.csv")
    assert len(gold) >= 200
    _assert_parity(ts, v, gold)
