"""CUSTOM_ALGORITHMS — the reference's extensibility surface (§2.10).

Reference: skyline/analyzer/algorithms.py:1513-1724 (run_before/after
three-sigma, consensus override, run_3sigma_algorithms suppression);
loader skyline/custom_algorithms_to_run.py; 37 shipped algorithms in
skyline/custom_algorithms/.

Spark shape: a registry of python callables applied inside the same
applyInPandas group pass — signature
``fn(ts: np.ndarray, values: np.ndarray, params: dict) ->
(bool | None, float | None)`` returning (anomalous, anomaly_score).
No JVM UDAF needed.

Semantics implemented (the exercised subset of the reference's knobs):
- ``run_before_3sigma``: custom algorithms run first; with
  ``consensus_override=True`` (reference ``'consensus': 1``) a True
  result decides the verdict by itself and, when
  ``run_3sigma_algorithms=False``, suppresses the 9-algorithm suite
  entirely (algorithms.py:1689-1724);
- otherwise custom results are appended to the ensemble and counted in
  the ordinary CONSENSUS vote (threshold stays len(ensemble) -
  CONSENSUS, algorithms.py:2000-2016);
- ``use_with`` namespace pattern restricts which series run it.

Three shipped examples mirror reference custom algorithms
(skyline/custom_algorithms/): sigma (k-sigma last point), level_shift
(median shift between window halves vs MAD), iqr_outlier.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class CustomAlgorithm:
    name: str
    fn: Callable[[np.ndarray, np.ndarray, dict], tuple[bool | None, float | None]]
    params: dict = field(default_factory=dict)
    consensus_override: bool = False    # reference 'consensus': 1
    run_before_3sigma: bool = True
    run_3sigma_algorithms: bool = True  # False -> custom-only ensemble
    # post-3sigma only: skip unless the three-sigma suite already reached
    # CONSENSUS True votes (algorithms.py:1863-1879) — the expensive-
    # confirmation pattern (e.g. matrixprofile after the cheap suite)
    run_only_if_consensus: bool = False
    use_with: str | None = None         # substring namespace restriction

    def applies_to(self, metric: str | None) -> bool:
        if self.use_with is None or metric is None:
            return True
        return self.use_with in metric


# --- shipped examples ------------------------------------------------------

def sigma(ts: np.ndarray, values: np.ndarray, params: dict):
    """k-sigma on the last point (cf. skyline/custom_algorithms/sigma.py
    semantics: |v_last - mean| > k * sample std)."""
    k = params.get("sigma_value", 3)
    s = pd.Series(values)
    std = float(s.std())
    if std == 0 or np.isnan(std):
        return False, 0.0
    score = abs(float(values[-1]) - float(s.mean())) / std
    return bool(score > k), float(score)


def level_shift(ts: np.ndarray, values: np.ndarray, params: dict):
    """Median level shift between the two halves of the tail window vs
    the MAD of the head (cf. skyline/custom_algorithms/
    adtk_level_shift.py intent)."""
    w = params.get("window", 10)
    if values.size < 3 * w:
        return None, None
    head = values[:-2 * w]
    a = np.median(values[-2 * w:-w])
    b = np.median(values[-w:])
    med = np.median(head)
    mad = np.median(np.abs(head - med))
    if mad == 0:
        return False, 0.0
    score = abs(b - a) / mad
    return bool(score > params.get("factor", 6.0)), float(score)


def iqr_outlier(ts: np.ndarray, values: np.ndarray, params: dict):
    """Tukey-fence outlier on the last point."""
    k = params.get("k", 3.0)
    q1, q3 = np.percentile(values, [25, 75])
    iqr = q3 - q1
    if iqr == 0:
        return False, 0.0
    v = float(values[-1])
    score = max(q1 - v, v - q3) / iqr
    return bool(score > k), float(score)


def abs_stddev_from_median(ts: np.ndarray, values: np.ndarray, params: dict):
    """Last point outside median ± 3 sample-std
    (skyline/custom_algorithms/abs_stddev_from_median.py:75-90)."""
    s = pd.Series(values)
    med = float(s.median())
    std = float(s.std())
    v = float(values[-1])
    if v > med + 3 * std or v < med - 3 * std:  # NaN std -> both False
        return True, 1.0
    return False, 0.0


def single_value_anomaly(ts: np.ndarray, values: np.ndarray, params: dict):
    """Exactly two distinct values in the window and the singleton IS the
    last point — i.e. a constant series whose final datapoint broke away
    (skyline/custom_algorithms/single_value_anomaly.py:117-145)."""
    v = values[~np.isnan(values)]
    if v.size == 0:
        return False, 0.0
    uniq, counts = np.unique(v, return_counts=True)
    if uniq.size == 2:
        for u, c in zip(uniq, counts):
            if c == 1 and u == v[-1]:
                return True, 1.0
    return False, 0.0


def m66(ts: np.ndarray, values: np.ndarray, params: dict):
    """The m66 six-sigma-of-sixth-median detector
    (skyline/custom_algorithms/m66.py:781-890): apply a rolling median
    ``nth_median`` times, take the rolling std of the result, flag
    points whose smoothed-std exceeds ``sigma`` × the std of that std
    array, and call the series anomalous only when such a flag run
    persists longer than window/2 and reaches into the last
    ``anomaly_window`` points."""
    window = int(params.get("window", 6))
    nth_median = int(params.get("nth_median", 6))
    n_sigma = float(params.get("sigma", 6))
    anomaly_window = int(params.get("anomaly_window", 1))
    n = values.size
    if n < window * (nth_median + 1):
        return None, None
    data = pd.Series(values, dtype=float)
    for _ in range(nth_median):
        data = data.rolling(window).median()
    std_nth = data.rolling(window).std().fillna(0).to_numpy()
    metric_std = float(np.std(std_nth))
    flags = (std_nth > metric_std * n_sigma).astype(np.int8)
    # persistence: only runs longer than window/2 count (m66.py:863-889)
    scores = np.zeros(n)
    edges = np.flatnonzero(np.diff(np.concatenate(([0], flags, [0]))))
    for s, e in zip(edges[::2], edges[1::2]):
        if e - s > window // 2:
            scores[s:e] = 1.0
    tail = float(scores[-anomaly_window:].sum())
    return bool(tail > 0), (1.0 if tail > 0 else 0.0)


def macd(ts: np.ndarray, values: np.ndarray, params: dict):
    """MACD-feature outlier fencing
    (skyline/custom_algorithms/macd.py:223-320): EMA(fast) - EMA(slow)
    (optionally the signal line or histogram), 15-bin histogram over the
    scores, outliers are points in the extreme bins (score <=
    second-lowest bin edge and < 0, or >= second-highest edge and > 1),
    with an extreme bin disabled when it holds >= n/3 of the points;
    anomalous when an outlier lands in the last ``anomaly_window``."""
    fast = int(params.get("fast_window", 12))
    slow = int(params.get("slow_window", 26))
    signal_window = int(params.get("signal_window", 9))
    feature = params.get("feature", "macd")
    anomaly_window = int(params.get("anomaly_window", 1))
    n = values.size
    if n < slow + signal_window:
        return None, None
    s = pd.Series(values, dtype=float)
    ema_f = s.ewm(span=fast, adjust=False, min_periods=fast).mean()
    ema_s = s.ewm(span=slow, adjust=False, min_periods=slow).mean()
    line = ema_f - ema_s
    if feature in ("macd_signal", "macd_histogram"):
        sig = line.ewm(span=signal_window, adjust=False,
                       min_periods=signal_window).mean()
        line = sig if feature == "macd_signal" else line - sig
    scores = line.fillna(0.0).to_numpy()
    counts, bins = np.histogram(scores, bins=15)
    lo2 = float(bins[1]) if counts[0] < n / 3 else None
    hi2 = float(bins[-2]) if counts[-1] < n / 3 else None
    flags = np.zeros(n, dtype=bool)
    if lo2 is not None:
        flags |= (scores <= lo2) & (scores < 0)
    if hi2 is not None:
        flags |= (scores >= hi2) & (scores > 1)
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _spectral_entropy_window(x: np.ndarray) -> float:
    """Normalized Shannon entropy of the periodogram PSD (detrend by
    mean, one-sided, boxcar — the scipy.signal.periodogram defaults the
    reference relies on; the fs scale factor cancels in normalization)."""
    x = x - x.mean()
    spec = np.abs(np.fft.rfft(x)) ** 2 / x.size
    if x.size % 2 == 0:
        spec[1:-1] *= 2
    else:
        spec[1:] *= 2
    with np.errstate(divide="ignore", invalid="ignore"):
        p = spec / spec.sum()
        ent = -np.nansum(p * np.log2(p))
    return float(ent / np.log2(p.size))


def spectral_entropy(ts: np.ndarray, values: np.ndarray, params: dict):
    """Rolling spectral-entropy low-entropy detector
    (skyline/custom_algorithms/spectral_entropy.py:147-380): rolling
    normalized periodogram entropy (NaN head -> 1.0 = maximum
    uncertainty), 15-bin histogram, low_entropy_value = lowest bin edge
    + a third of the first bin width capped at ``max_low_entropy``;
    anomalous when a window in the last ``anomaly_window`` has entropy
    <= that value (0.0 entropy is ignored — constant windows)."""
    window = int(params.get("window", 60))
    anomaly_window = int(params.get("anomaly_window", 1))
    max_low_entropy = float(params.get("max_low_entropy", 0.6))
    n = values.size
    if n < window * 2:
        return None, None
    se = (pd.Series(values, dtype=float)
          .rolling(window).apply(_spectral_entropy_window, raw=True)
          .fillna(1.0).to_numpy())
    _, bins = np.histogram(se, bins=15)
    low = float(bins[0] + (bins[1] - bins[0]) / 3)
    low = min(low, max_low_entropy)
    flags = (se <= low) & (se != 0.0)
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _percent_different(base: float, compare: float) -> float | None:
    """skyline/functions/numpy/percent_different.py:36-70 — |Δ|/base as
    a percent; 0-vs-0 is 0; zero base is undeterminable (None)."""
    if np.isnan(base) or np.isnan(compare):
        return None
    if base == 0 and compare == 0:
        return 0.0
    if base == 0:
        return None
    return abs((compare - base) / base * 100.0)


def significant_change_window_percent_sustained(ts: np.ndarray,
                                                values: np.ndarray,
                                                params: dict):
    """Last value vs the median of window-resampled medians over the
    trailing period (skyline/custom_algorithms/
    significant_change_window_percent_sustained.py:154-197); with
    ``times_in_a_row`` every one of the last k values must exceed
    ``percent`` difference."""
    window = int(params.get("window", 600))
    percent = float(params.get("percent", 10.0))
    period = int(params.get("period", 3600))
    times_in_a_row = int(params.get("times_in_a_row", 0))
    t_last, v_last = float(ts[-1]), float(values[-1])
    mask = ts >= t_last - period
    tt, vv = ts[mask], values[mask]
    if tt.size == 0:
        return None, None
    # resample(origin='epoch').median() == per-floor(epoch/window) median
    # (empty buckets are NaN and skipped by the median, same as pandas)
    buckets = np.floor(tt / window).astype(np.int64)
    meds = [float(np.median(vv[buckets == b])) for b in np.unique(buckets)]
    med = float(np.median(meds))
    pct = _percent_different(med, v_last)
    if pct is None:
        return None, None
    # reference flow (:171-197): the verdict is the LAST value's;
    # times_in_a_row only force-confirms when every one of the last k
    # values exceeded (count == k), averaging their scores
    anomalous, score = pct > percent, 1.0 if pct > percent else 0.0
    if times_in_a_row:
        tail = values[-times_in_a_row:]
        pcts = [_percent_different(med, float(v)) for v in tail]
        if any(p is None for p in pcts):
            return None, None
        hits = [p > percent for p in pcts]
        anomalous, score = hits[-1], 1.0 if hits[-1] else 0.0
        if all(hits) and len(hits) == times_in_a_row:
            anomalous, score = True, 1.0
    return bool(anomalous), float(score)


SHIPPED = {
    "sigma": sigma, "level_shift": level_shift, "iqr_outlier": iqr_outlier,
    "abs_stddev_from_median": abs_stddev_from_median,
    "single_value_anomaly": single_value_anomaly,
    "m66": m66, "macd": macd, "spectral_entropy": spectral_entropy,
    "significant_change_window_percent_sustained":
        significant_change_window_percent_sustained,
}
