"""The reference's 9-algorithm three-sigma suite as pure numpy/pandas
functions of ``(ts, values)`` float64 arrays.

Semantic source: skyline/analyzer/algorithms.py (non-numba paths — the
reference only takes numba paths when numba is importable; semantics match
to float rounding either way except mean_subtraction_cumulation where the
numba path uses population std — we implement the pandas sample-std path,
skyline/analyzer/algorithms.py:433-466).

Each function mirrors its reference twin's exact formula, including:
- pandas *sample* standard deviation (ddof=1) where the reference uses
  ``series.std()`` (PR #124 change, skyline/analyzer/algorithms.py:291-301);
- ``tail_avg`` = mean of last 3 values, falling back to the last value for
  series shorter than 3 (skyline/analyzer/algorithms.py:180-191);
- histogram first/last-bin edge cases of ``np.histogram`` semantics
  (skyline/analyzer/algorithms.py:655-704);
- the deterministic last-ts-relative form of ks_test (the analyzer form
  uses wall-clock ``time()``, skyline/analyzer/algorithms.py:716-717; we
  use the mirage last-ts-relative form incl. the daily-resolution rule,
  skyline/mirage/mirage_algorithms.py:491-520) so results are a pure
  function of the input.

Errors inside an algorithm yield ``None`` (tri-state ensemble,
skyline/analyzer/algorithms.py:1785-1794).

All functions take pre-sorted, deduplicated arrays — ordering is the
caller's invariant (stable (conv_id, turn_idx) sort upstream).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import pandas as pd

from skyline_spark.functions.stats import (_kolmogorov_sf,
                                           adfuller_pvalue, ks_2samp,
                                           t_isf)


@lru_cache(maxsize=65536)
def _grubbs_threshold(n: int) -> float:
    """Grubbs critical score for series length n — depends only on n, and
    real series populations repeat lengths heavily, so memoize the
    t-ISF bisection (pure-python, ~ms each)."""
    threshold = t_isf(0.05 / (2 * n), n - 2)
    t2 = threshold * threshold
    return ((n - 1) / math.sqrt(n)) * math.sqrt(t2 / (n - 2 + t2))

FULL_DURATION_DEFAULT = 86400


def _std1(values: np.ndarray) -> float:
    """Sample standard deviation (ddof=1) — numerically equal (~1 ulp)
    to the reference's ``pandas.Series.std()`` without the ~0.05 ms
    Series-construction overhead per call (the analyze UDF runs this
    5×+ per series)."""
    if values.size < 2:
        return float("nan")
    return float(np.std(values, ddof=1))


def tail_avg(values: np.ndarray) -> float:
    """Mean of the last three datapoints; the last value if fewer than 3.

    Ref: skyline/analyzer/algorithms.py:180-191 (IndexError fallback).
    """
    n = values.size
    if n >= 3:
        return float((values[-1] + values[-2] + values[-3]) / 3.0)
    return float(values[-1])


def median_absolute_deviation(ts: np.ndarray, values: np.ndarray,
                              full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """|last deviation from median| / median-deviation > 6.

    Ref: skyline/analyzer/algorithms.py:221-282 (trigger on the *last*
    datapoint's demedianed value, not tail_avg; False when MAD == 0).
    """
    median = float(np.median(values))
    demedianed = np.abs(values - median)
    median_deviation = float(np.median(demedianed))
    if median_deviation == 0:
        return False
    return bool(demedianed[-1] / median_deviation > 6)


def grubbs(ts: np.ndarray, values: np.ndarray,
           full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """One-sided Grubbs test on tail_avg with sample std.

    Ref: skyline/analyzer/algorithms.py:285-324. Threshold via
    ``t.isf(.05 / (2N), N-2)`` (here our pure-numpy t_isf).
    """
    n = values.size
    if n < 3:
        # reference: t.isf with df<=0 returns nan -> `z > nan` -> False
        # (NOT an error/None; unreachable in-pipeline since TooShort
        # fires at <100 points, but vortex one-shots can feed tiny series)
        return False
    std_dev = _std1(values)  # sample std (ddof=1)
    if std_dev == 0 or math.isnan(std_dev):
        return False
    mean = float(np.mean(values))
    z_score = (tail_avg(values) - mean) / std_dev
    return bool(z_score > _grubbs_threshold(n))


def first_hour_average(ts: np.ndarray, values: np.ndarray,
                       full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """tail_avg outside 3 sample-std of the first hour of the window.

    Ref: skyline/analyzer/algorithms.py:327-351 — window is
    ``(last_ts - FULL_DURATION, last_ts - FULL_DURATION + 3600)`` with
    *exclusive* bounds. Empty window -> NaN comparison -> False (matching
    pandas NaN semantics in the reference).
    """
    last_hour_threshold = ts[-1] - full_duration
    end = last_hour_threshold + 3600
    mask = (ts > last_hour_threshold) & (ts < end)
    window = values[mask]
    if window.size == 0:
        return False
    mean = float(np.mean(window))
    std_dev = _std1(window)
    t = tail_avg(values)
    if math.isnan(std_dev):
        return False
    return bool(abs(t - mean) > 3 * std_dev)


def stddev_from_average(ts: np.ndarray, values: np.ndarray,
                        full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """|tail_avg - mean| > 3 * sample std of the whole series.

    Ref: skyline/analyzer/algorithms.py:363-383.
    """
    mean = float(np.mean(values))
    std_dev = _std1(values)
    if math.isnan(std_dev):
        return False
    return bool(abs(tail_avg(values) - mean) > 3 * std_dev)


def stddev_from_moving_average(ts: np.ndarray, values: np.ndarray,
                               full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """|v_last - ewm_mean_last| > 3 * ewm_std_last, com=50.

    Ref: skyline/analyzer/algorithms.py:386-416 — pandas
    ``ewm(ignore_na=False, min_periods=0, adjust=True, com=50)``,
    ``.std(bias=False)``. Only the LAST ewm mean/std are consumed, so
    both are computed closed-form in numpy (adjust=True weights
    w_i=(1-a)^(n-1-i); bias=False debias (Σw)²/((Σw)²-Σw²)) — equal to
    pandas within ~1e-14 and ~20× faster. The tail is truncated at 8192
    points: older weights are < (50/51)^8192 ≈ 1e-70, numerically
    invisible in float64.
    """
    v = values[-8192:]
    n = v.size
    if n < 2:
        return False
    a = 1.0 / 51.0  # com=50
    w = np.power(1.0 - a, np.arange(n - 1, -1, -1, dtype=np.float64))
    sw = float(w.sum())
    exp_average = float(np.dot(w, v)) / sw
    sw2 = float(np.dot(w, w))
    denom = sw * sw - sw2
    if denom <= 0:
        return False
    var = (float(np.dot(w, (v - exp_average) ** 2)) / sw) \
        * (sw * sw / denom)
    std_dev = math.sqrt(var)
    if math.isnan(std_dev):
        return False
    return bool(abs(values[-1] - exp_average) > 3 * std_dev)


def mean_subtraction_cumulation(ts: np.ndarray, values: np.ndarray,
                                full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """|v_last - mean(v[:-1])| > 3 * sample std of demeaned v[:-1].

    Ref: skyline/analyzer/algorithms.py:433-466 (pandas path): zero/None
    values replaced with 0 (``x[1] if x[1] else 0``); demean by mean of
    all-but-last; sample std of demeaned all-but-last.
    """
    v = np.where(np.isnan(values), 0.0, values)
    head = v[:-1]
    if head.size == 0:
        return False
    mean = float(np.mean(head))
    demeaned_last = v[-1] - mean
    std_dev = _std1(head)  # std(head - mean) == std(head)
    if math.isnan(std_dev):
        return False
    return bool(abs(demeaned_last) > 3 * std_dev)


def least_squares(ts: np.ndarray, values: np.ndarray,
                  full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """Mean of last-3 OLS residuals beyond 3 sample-std of all residuals.

    Ref: skyline/analyzer/algorithms.py:490-573 — ``np.linalg.lstsq(A, y,
    rcond=-1)``, errors = y - (m*x + c), sample std (PR #124), plus the
    ``round(std) != 0 and round(t) != 0`` guards. The OLS fit is the
    closed form on CENTERED x (m = Σ(x₀y)/Σ(x₀²), c = ȳ - m·x̄) — equal
    to the SVD lstsq within ~1e-12 for a 2-parameter fit and ~10×
    faster (no per-series LAPACK call).
    """
    x = ts.astype(np.float64)
    y = values
    if x.size < 2:
        # reference lstsq does NOT error on a rank-deficient 1-row A
        # (min-norm solution, zero residual) -> falls through to the
        # len(errors) < 3 guard -> False, not a recorded error
        return False
    if np.ptp(x) == 0:
        # constant-x (all-duplicate timestamps): lstsq min-norm solution
        # fits y_hat = mean(y) for every row, so the residuals are the
        # mean-centered values and the test proceeds on those
        errors = y - float(np.mean(y))
    else:
        xm = float(np.mean(x))
        x0 = x - xm
        m = float(np.dot(x0, y)) / float(np.dot(x0, x0))
        c = float(np.mean(y)) - m * xm
        errors = y - (m * x + c)
    if errors.size < 3:
        return False
    std_dev = _std1(errors)
    t = float((errors[-1] + errors[-2] + errors[-3]) / 3.0)
    if math.isnan(std_dev):
        return False
    return bool(abs(t) > std_dev * 3 and round(std_dev) != 0 and round(t) != 0)


def histogram_bins(ts: np.ndarray, values: np.ndarray,
                   full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """tail_avg falls in a 15-bin histogram bin with <= 20 members.

    Ref: skyline/analyzer/algorithms.py:655-704 — np.histogram(bins=15)
    semantics; first-bin edge case ``t <= bins[0]``; inner bins
    ``bins[i] <= t < bins[i+1]`` (the last bin is right-inclusive in
    np.histogram but the reference's explicit loop uses a half-open check
    for every non-first bin — we replicate the loop, not np.digitize).
    NaN values dropped first (:674).
    """
    series = values[~np.isnan(values)]
    if series.size == 0:
        return None
    t = tail_avg(values)
    hist, bins = np.histogram(series, bins=15)
    for index, bin_size in enumerate(hist):
        if bin_size <= 20:
            if index == 0:
                if t <= bins[0]:
                    return True
            elif bins[index] <= t < bins[index + 1]:
                return True
    return False


def ks_test(ts: np.ndarray, values: np.ndarray,
            full_duration: int = FULL_DURATION_DEFAULT) -> bool | None:
    """Two-sample KS between the last-hour-minus-10-min and last-10-min
    distributions, gated by ADF stationarity of the reference window.

    Deterministic last-ts-relative form (mirage variant,
    skyline/mirage/mirage_algorithms.py:491-556), incl. the
    daily-resolution widening (resolution in (80000, 90000) -> 90/30-day
    windows) and the constant-reference guard
    (skyline/analyzer/algorithms.py:728-733).
    """
    if ts.size < 2:
        return False
    last_ts = ts[-1]
    hour_ago = last_ts - 3600
    ten_minutes_ago = last_ts - 600
    resolution = ts[-1] - ts[-2]
    if 80000 < resolution < 90000:
        hour_ago = last_ts - (86400 * 90)
        ten_minutes_ago = last_ts - (86400 * 30)
    reference = values[(ts >= hour_ago) & (ts < ten_minutes_ago)]
    probe = values[ts >= ten_minutes_ago]
    if reference.size < 20 or probe.size < 20:
        return False
    if np.all(reference == reference[0]):
        return False
    ks_d, ks_p_value = ks_2samp(reference, probe)
    if ks_p_value < 0.05 and ks_d > 0.5:
        adf_p = adfuller_pvalue(reference, 10)
        if adf_p < 0.05:
            return True
    return False


def ks_d_stat(ts: np.ndarray, values: np.ndarray, ref_span: int,
              probe_span: int) -> tuple[int, int, float] | None:
    """The distributional core of A9 — the exact two-sample KS statistic
    D (max ECDF gap over the union grid) between a reference window
    ``[last_ts - ref_span, last_ts - probe_span)`` and a probe window
    ``[last_ts - probe_span, last_ts]``, split out of ks_test so the
    driver can value-check it against an ANSI twin.

    Same form as skyline/mirage/mirage_algorithms.py:491-556, which
    computes D over the last-hour/last-10-min windows at 1 Hz; callers
    rescale the spans to the data cadence. The p-value/ADF gate stays in
    ks_test (not ANSI-expressible, golden-pytest pinned).

    Returns (n_ref, n_probe, d), or None under ks_test's own guards:
    windows under 20 points, or a constant reference.
    """
    if ts.size < 2:
        return None
    last_ts = ts.max()
    reference = values[(ts >= last_ts - ref_span)
                       & (ts < last_ts - probe_span)]
    probe = values[ts >= last_ts - probe_span]
    if reference.size < 20 or probe.size < 20:
        return None
    if np.all(reference == reference[0]):
        return None
    d, _p = ks_2samp(reference, probe)
    return int(reference.size), int(probe.size), float(d)


def ks_test_d_gate(ts: np.ndarray, values: np.ndarray,
                   full_duration: int = FULL_DURATION_DEFAULT
                   ) -> bool | None:
    """A9 restricted to its KS core — the consensus_vote_sql9k form:
    ``p < 0.05 and D > 0.5`` (skyline/mirage/mirage_algorithms.py:
    543-556) WITHOUT the trailing ADF stationarity confirmation
    (adfuller + the MacKinnon surface is the one genuinely non-ANSI
    numeric left in the vote; the full ks_test stays golden-pytest
    pinned). Because the asymptotic p is
    kolmogorov_sf((en + 0.12 + 0.11/en) * D) with en depending only on
    the two window sizes, ``p < 0.05`` is the deterministic comparison
    ``(en + 0.12 + 0.11/en) * D > kolmogorov_isf(0.05)`` — a single
    literal in the SQL twin, exactly like the grubbs t-ISF thresholds.

    Windows rescaled to the corpus cadence like ks_d_stat's callers:
    reference [last - full_duration, last - full_duration/3), probe the
    trailing full_duration/3 (hour/10-min -> FULL_DURATION/STALE)."""
    res = ks_d_stat(ts, values, full_duration, full_duration // 3)
    if res is None:
        return False
    n1, n2, d = res
    en = math.sqrt(n1 * n2 / (n1 + n2))
    p = _kolmogorov_sf((en + 0.12 + 0.11 / en) * d)
    return bool(p < 0.05 and d > 0.5)


def negatives_present(ts: np.ndarray, values: np.ndarray) -> bool:
    """Whether the series contains negative values (untrainable-metric
    flag). Ref: skyline/analyzer/algorithms.py:1083-1110 (min < 0)."""
    if values.size == 0:
        return False
    return bool(np.min(values) < 0)


#: name -> callable, in no particular order; ordering lives in
#: config.ALGORITHMS (skyline/settings.py:820-836).
ALGORITHM_FUNCS = {
    "histogram_bins": histogram_bins,
    "first_hour_average": first_hour_average,
    "stddev_from_average": stddev_from_average,
    "grubbs": grubbs,
    "ks_test": ks_test,
    "ks_test_d_gate": ks_test_d_gate,
    "mean_subtraction_cumulation": mean_subtraction_cumulation,
    "median_absolute_deviation": median_absolute_deviation,
    "stddev_from_moving_average": stddev_from_moving_average,
    "least_squares": least_squares,
}
