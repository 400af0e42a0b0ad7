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

Shipped library: all 36 algorithm files in the reference's
skyline/custom_algorithms/ are ported (see SHIPPED at the bottom; each
cites its reference file; SHIPPED additionally carries two simple
non-reference example detectors, level_shift and iqr_outlier, so the
registry holds 38 entries). laoccfdlpnc + skyline_laoccfdlpnc ship
with an own projected-gradient solve of their cvxpy interior-point
program; skyline_prophet ships with an own deterministic prophet-lite
(MAP piecewise-linear trend, coordinate-descent lasso, analytic
intervals); sigma ships the full run_sigma_algorithms /
run_sigma_oneshot_algorithms suite (custom_algorithm_sources/sigma/);
irregular_unstable composes both with its variance gates (the Graphite
30-day refetch maps to this engine's retention window, as with mirage);
grafana_promql_anomaly_detection's band logic is fully local in the
reference and ported quirk-for-quirk; azure_ai_anomalydetector ports
the wrapper semantics exactly, with the one remote round-trip (the
Azure univariate API) replaced by an own local spectral-residual
detector per the published algorithm behind the service (documented in
its docstring).
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
    """The reference's ``sigma`` custom algorithm
    (skyline/custom_algorithms/sigma.py:145-204): the full 9-algorithm
    ensemble re-run with a parameterized sigma value.  ``anomaly_window
    < 20`` routes to :func:`run_sigma_algorithms` (the windowed prefix
    loop, sigma.py:177-184); >= 20 routes to
    :func:`run_sigma_oneshot_algorithms` (sigma.py:184-188).
    anomalyScore maps truthy-anomalous -> 1.0 else 0.0
    (sigma.py:200-203)."""
    sigma_value = int(params.get("sigma", params.get("sigma_value", 3)))
    consensus = params.get("consensus", 6)
    anomaly_window = int(params.get("anomaly_window", 1))
    if anomaly_window < 20:
        anomalous, _ = run_sigma_algorithms(
            ts, values, sigma_value, consensus, anomaly_window)
    else:
        anomalous, _, _ = run_sigma_oneshot_algorithms(
            ts, values, sigma_value, consensus, anomaly_window)
    return anomalous, (1.0 if anomalous else 0.0)


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


def _m66_flags(values: np.ndarray, window: int, nth_median: int,
               n_sigma: float) -> np.ndarray:
    """Per-point m66 flag array (shared with the mmzrmp ensemble)."""
    n = values.size
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
    return scores


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
    # the reference only refuses len < 10 (m66.py:812); for
    # 10 <= n < window*(nth_median+1) the rolling medians are all-NaN,
    # fillna(0) zeroes the std array and the verdict is a deterministic
    # False — computed, not None, to keep did-run semantics aligned
    if values.size < 10:
        return None, None
    scores = _m66_flags(values, window, nth_median, n_sigma)
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
    if values.size < slow + signal_window:
        return None, None
    flags = _macd_flags(values, fast, slow, signal_window, feature)
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _macd_flags(values: np.ndarray, fast: int, slow: int,
                signal_window: int, feature: str) -> np.ndarray:
    """Per-point macd outlier flags (shared with the mmzrmp ensemble)."""
    n = values.size
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
    # the reference gates on TRUTHINESS (`if second_lowest_value_bin:`,
    # macd.py), so an exactly-0.0 bin edge disables that side's check —
    # quirk preserved (not `is not None`)
    if lo2:
        flags |= (scores <= lo2) & (scores < 0)
    if hi2:
        flags |= (scores >= hi2) & (scores > 1)
    return flags


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


def custom_median_absolute_deviation(ts: np.ndarray, values: np.ndarray,
                                     params: dict):
    """The shipped custom MAD variant — same statistic as the 3-sigma
    suite's A1 but with a fixed threshold of 6 and a (True, 1.0) /
    (False, 0.0) score shape
    (skyline/custom_algorithms/median_absolute_deviation.py:99-113)."""
    med = float(np.median(values))
    demed = np.abs(values - med)
    mad = float(np.median(demed))
    if mad == 0:
        return False, 0.0
    return (True, 1.0) if demed[-1] / mad > 6 else (False, 0.0)


def lad(ts: np.ndarray, values: np.ndarray, params: dict):
    """Large-deviations anomaly detection
    (skyline/custom_algorithms/lad.py:187-247): z-normalize (mean-center
    only when std is 0), rate-function entropy -z²/2, scores = -entropy
    min-max normalized, label points above the ``threshold`` percentile
    (default 95), anomalous when a label lands in the last
    ``anomaly_window`` (default 1)."""
    threshold = int(params.get("threshold", 95))
    anomaly_window = int(params.get("anomaly_window", 1))
    std = float(np.std(values))
    z = (values - float(np.mean(values))) / std if std != 0 \
        else values - float(np.mean(values))
    scores = np.square(z) / 2.0
    lo, hi = float(np.min(scores)), float(np.max(scores))
    scores = (scores - lo) / (hi - lo) if hi != lo \
        else np.zeros_like(scores)
    labels = scores > np.percentile(scores, threshold)
    hit = bool(labels[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def last_same_hours(ts: np.ndarray, values: np.ndarray, params: dict):
    """Last value vs the 3-sigma (population) band of the values at
    exactly ts_last - k·86400 within ``sample_period``
    (skyline/custom_algorithms/last_same_hours.py:144-207). Quirks kept:
    needs >= 3 days of span else (None, None); the daily chain stops at
    the first missing exact timestamp (the reference's descending scan
    never re-syncs after a miss); <= 1 collected points -> (False, 0.0)
    via the reference's ``if not anomalous`` fall-through."""
    sample_period = int(params.get("sample_period", 259200))
    end_ts = int(ts[-1])
    if end_ts - int(ts[0]) < 259200:
        return None, None
    tt = ts.astype(np.int64)
    same_hour: list[float] = []
    target = end_ts - 86400
    oldest = end_ts - sample_period
    while target >= oldest:
        hit = np.flatnonzero(tt == target)
        if hit.size == 0:
            break
        same_hour.append(float(values[hit[0]]))
        target -= 86400
    if len(same_hour) > 1:
        mean = float(np.mean(same_hour))
        std = float(np.std(same_hour))
        v = float(values[-1])
        if v > mean + 3 * std or v < mean - 3 * std:
            return True, 1.0
    return False, 0.0


_SR_EPSILON = 1e-8


def _sr_pad_same(x: np.ndarray, ksize: int, method: str,
                 side: str) -> np.ndarray:
    """'same'-length padding before a valid convolution — constant-0 /
    replicate / reflect, bilateral / left / right (the alibi-detect
    pad_same the reference vendors,
    skyline/custom_algorithm_sources/spectral_residual/
    spectral_residual.py:207-293)."""
    pad = ksize - 1
    if side == "bilateral":
        pr = pad // 2
        pl = pad - pr
    elif side == "left":
        pl, pr = pad, 0
    else:
        pl, pr = 0, pad
    if method == "replicate":
        left, right = np.tile(x[0], pl), np.tile(x[-1], pr)
    elif method == "reflect":
        left = x[1:pl + 1][::-1]
        right = x[-pr - 1:-1][::-1] if pr > 0 else np.array([])
    else:
        left, right = np.zeros(pl), np.zeros(pr)
    return np.concatenate([left, x, right])


def spectral_residual(ts: np.ndarray, values: np.ndarray, params: dict):
    """Saliency-map spectral residual (Ren et al. 2019,
    arXiv:1906.03821), the math of the alibi-detect implementation the
    reference vendors (skyline/custom_algorithms/spectral_residual.py:
    296-440 wrapper defaults at :221-278): estimate n_est_points future
    points from the last-gradient, FFT -> log-amplitude minus its
    window_amp moving average -> inverse FFT saliency, iscore =
    (sr - local-mean(sr)) / local-mean(sr) with a preceding-only
    window_local kernel, threshold inferred at the ``threshold_perc``
    percentile of the scores, anomalous when an outlier lands in the
    last ``anomaly_window`` (default 1 -> promoted to 3, the leading-
    edge quirk at :274-278)."""
    threshold = params.get("threshold")
    threshold_perc = float(params.get("threshold_perc", 99.0))
    window_amp = int(params.get("window_amp", 20))
    window_local = int(params.get("window_local", 20))
    n_est = int(params.get("estimate_points", 20))
    n_grad = int(params.get("gradient_points", 5))
    amp_method = params.get("padding_amp_method", "reflect")
    local_method = params.get("padding_local_method", "reflect")
    amp_side = params.get("padding_amp_side", "bilateral")
    anomaly_window = int(params.get("anomaly_window", 1))
    if anomaly_window == 1:
        anomaly_window = 3
    outliers = _sr_outlier_flags(
        ts, values, threshold=threshold, threshold_perc=threshold_perc,
        window_amp=window_amp, window_local=window_local, n_est=n_est,
        n_grad=n_grad, amp_method=amp_method, local_method=local_method,
        amp_side=amp_side)
    if outliers is None:
        return None, None
    hit = bool(outliers[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _sr_outlier_flags(ts: np.ndarray, values: np.ndarray, *,
                      threshold=None, threshold_perc: float = 99.0,
                      window_amp: int = 20, window_local: int = 20,
                      n_est: int = 20, n_grad: int = 5,
                      amp_method: str = "reflect",
                      local_method: str = "reflect",
                      amp_side: str = "bilateral") -> np.ndarray | None:
    """Per-point spectral-residual outlier flags — the saliency math of
    :func:`spectral_residual` factored out so the azure stand-in can
    reuse the identical flag array; returns None when the series is too
    short or the transform degenerates."""
    try:
        x = values.astype(np.float64)
        t = ts.astype(np.float64)
        if x.size <= max(window_local, window_amp, n_grad + 1):
            return None
        # pad estimated points so the tail sits mid-window (:369-389)
        dx = x[-1] - x[-n_grad - 1:-1]
        dt = t[-1] - t[-n_grad - 1:-1]
        grads = float(np.mean(dx / dt) * np.mean(dt))
        x_pad = np.concatenate([x, np.tile(x[-n_grad] + grads, n_est)])
        # saliency map (:296-344)
        fft = np.fft.fft(x_pad)
        log_amp = np.log(np.abs(fft) + _SR_EPSILON)
        phase = np.angle(fft)
        bias, sym = log_amp[:1], log_amp[1:]
        freq = sym[:(len(sym) + 1) // 2]
        conv_amp = np.ones(window_amp) / window_amp
        ma_freq = np.convolve(
            _sr_pad_same(freq, window_amp, amp_method, amp_side),
            conv_amp, "valid")
        ma_log_amp = np.concatenate([
            bias, ma_freq,
            (ma_freq[:-1] if len(sym) % 2 == 1 else ma_freq)[::-1]])
        sr = np.abs(np.fft.ifft(np.exp(log_amp - ma_log_amp
                                       + 1j * phase)))[:-n_est]
        # preceding-only local average: [0, 1/w, ..., 1/w] (:155-163)
        conv_local = np.ones(window_local + 1) / window_local
        conv_local[0] = 0.0
        ma_sr = np.convolve(
            _sr_pad_same(sr, window_local + 1, local_method, "left"),
            conv_local, "valid")
        iscore = (sr - ma_sr) / (ma_sr + _SR_EPSILON)
        thr = float(threshold) if threshold is not None \
            else float(np.percentile(iscore, threshold_perc))
        return iscore > thr
    except Exception:
        return None


def azure_ai_anomalydetector(ts: np.ndarray, values: np.ndarray,
                             params: dict):
    """Port of skyline/custom_algorithms/azure_ai_anomalydetector.py:
    180-341 — the wrapper semantics quirk-for-quirk, with the remote
    ``AnomalyDetectorClient.detect_univariate_entire_series`` round-trip
    replaced by an OWN local spectral-residual detector (the published
    algorithm behind the Azure univariate service, Ren et al. 2019,
    arXiv:1906.03821 — the same saliency math as
    :func:`_sr_outlier_flags`).  ``sensitivity`` (0..99, default 99,
    azure_ai_anomalydetector.py:190-193) maps to the SR threshold
    percentile directly — an own deterministic stand-in for the
    service's margin calibration.  Ported faithfully from the wrapper:
    the per-point 0/1 anomalyScore_list, ``anomalous = any flag in the
    last anomaly_window points`` (:273-277), and the unreliable
    discard — ``total flags > n/5`` hardcoded, NOT max_anomaly_ratio,
    which the reference accepts but never applies (:279-286) — which
    forces (False, 0.0) (:316-318)."""
    anomaly_window = int(params.get("anomaly_window", 1))
    try:
        sensitivity = int(params.get("sensitivity", 99))
    except (TypeError, ValueError):
        sensitivity = 99
    flags = _sr_outlier_flags(
        ts, values,
        threshold_perc=float(min(max(sensitivity, 1), 99)))
    if flags is None:
        return None, None
    score_list = flags.astype(np.float64)
    anomalous = bool(score_list[-anomaly_window:].sum() > 0)
    if float(score_list.sum()) > (len(values) / 5):
        # "this algorithm does not suit this data" — discard
        return False, 0.0
    return anomalous, (1.0 if anomalous else 0.0)


def grafana_promql_anomaly_detection(ts: np.ndarray, values: np.ndarray,
                                     params: dict):
    """Port of skyline/custom_algorithms/
    grafana_promql_anomaly_detection.py:28-592 — the (fully local)
    band logic of grafana/promql-anomaly-detection re-expressed on
    numpy/pandas.  Quirk-for-quirk with the reference:

    - resolution = the modal timestamp diff (:154-159); timestamps
      floor-aligned to it (:289);
    - series spanning < 5.5 days return (None, None) (:294-299);
    - resolution < 600 s: pandas ``resample('10min', origin='end')``
      on the MEDIAN with bfill, falling back to the MEAN when <= 10
      non-zero resampled values or min-max-normalised variance <=
      0.009 (:312-396);
    - missing grid points filled with the median of up to the 3
      previous (already-filled) values; leading gaps stay NaN
      (:409-424);
    - trailing move_mean/move_std (min_count=1, ddof=0 — the
      bottleneck defaults) over int(3600/res) samples; cov against a
      zero/NaN-cleaned mean; std zeroed where cov <= threshold_by_covar
      (which defaults to 1 — the reference's except-clause overwrites
      its own 0.5 initialiser, :222-225); smoothed over
      int(93600/res) samples (:436-470);
    - bands avg +/- smoothed_std * stddev_multiplier, margin bands
      avg +/- avg * margin_multiplier where smoothed_std == 0, lower
      clipped at 0 (:471-487); NaNs filled with nanmeans (:488-490);
    - out-of-band runs shorter than min_anomaly_duration_seconds
      (default 300 — measured START to LAST member, so a single point
      has duration 0) are dropped; scores are 1 only at period START
      timestamps, and the verdict is any score in the last
      anomaly_window grid points (:491-537) — with the default
      anomaly_window=1 a qualifying run can never start at the final
      point, a reference quirk preserved as-is."""
    anomaly_window = int(params.get("anomaly_window", 1))
    min_dur = int(params.get("min_anomaly_duration_seconds", 300))
    try:
        threshold_by_covar = int(params["threshold_by_covar"])
    except (KeyError, TypeError, ValueError):
        threshold_by_covar = 1
    stddev_multiplier = int(params.get("stddev_multiplier", 2))
    margin_multiplier = float(params.get("margin_multiplier", 0.5))
    short_window = int(params.get("short_window", 3600))
    smoothing_window_seconds = int(
        params.get("smoothing_window_seconds", 93600))
    low_variance = 0.009
    try:
        diffs = np.diff(ts.astype(np.int64))
        uniq, counts = np.unique(diffs, return_counts=True)
        resolution = int(uniq[np.argmax(counts)])
        t = (ts.astype(np.int64) // resolution * resolution)
        v = values.astype(np.float64)
        if int(t[-1] - t[0]) < (86400 * 5.5):
            return None, None
        if resolution < 600:
            np_max, np_min = float(np.amax(v)), float(np.amin(v))
            with np.errstate(divide="ignore", invalid="ignore"):
                norm = (v - np_min) / (np_max - np_min)
                normalised_var = round(float(np.var(norm)), 4)
            aggregate_on_mean = normalised_var <= low_variance
            df = pd.DataFrame(
                {"value": v},
                index=pd.DatetimeIndex(pd.to_datetime(t, unit="s")))
            res_df = df.resample("10min", origin="end").median().bfill()
            non_zero = int((res_df["value"].to_numpy() != 0).sum())
            if non_zero <= 10 or aggregate_on_mean:
                res_df = df.resample("10min", origin="end").mean().bfill()
            t = np.array([int(x.value // 10 ** 9) for x in res_df.index],
                         dtype=np.int64)
            v = res_df["value"].to_numpy(dtype=np.float64)
            resolution = 600
        expected_ts = np.arange(t[0], t[-1] + resolution, resolution)
        expected_v = np.full_like(expected_ts, np.nan, dtype=np.float64)
        expected_v[np.isin(expected_ts, t)] = v
        for i in range(len(expected_v)):
            if np.isnan(expected_v[i]):
                prev = expected_v[max(0, i - 3):i]
                prev = prev[~np.isnan(prev)]
                if len(prev) > 0:
                    expected_v[i] = np.median(prev)
        vals = expected_v
        w_avg = int(short_window / resolution)
        w_smooth = int(smoothing_window_seconds / resolution)
        s = pd.Series(vals)
        moving_avg = s.rolling(w_avg, min_periods=1).mean().to_numpy()
        moving_std = s.rolling(w_avg, min_periods=1).std(ddof=0).to_numpy()
        avg_clean = np.where(
            np.isnan(moving_avg) | (moving_avg == 0), 1e-10, moving_avg)
        cov = moving_std / avg_clean
        filtered_std = np.where(cov > threshold_by_covar, moving_std, 0)
        smoothed_std = pd.Series(filtered_std).rolling(
            w_smooth, min_periods=1).mean().to_numpy()
        lower = moving_avg - smoothed_std * stddev_multiplier
        upper = moving_avg + smoothed_std * stddev_multiplier
        margin = moving_avg * margin_multiplier
        lower = np.where(smoothed_std == 0, moving_avg - margin, lower)
        upper = np.where(smoothed_std == 0, moving_avg + margin, upper)
        lower = np.clip(lower, a_min=0, a_max=None)
        vals_f = np.nan_to_num(vals, nan=float(np.nanmean(vals)))
        lower_f = np.nan_to_num(lower, nan=float(np.nanmean(lower)))
        upper_f = np.nan_to_num(upper, nan=float(np.nanmean(upper)))
        flags = (vals_f < lower_f) | (vals_f > upper_f)
        start_ts = set()
        i, n = 0, len(flags)
        while i < n:
            if flags[i]:
                start = int(expected_ts[i])
                while i + 1 < n and flags[i + 1]:
                    i += 1
                if int(expected_ts[i]) - start >= min_dur:
                    start_ts.add(start)
            i += 1
        scores = np.array([1.0 if int(x) in start_ts else 0.0
                           for x in expected_ts])
        anomalous = bool(scores[-anomaly_window:].sum() > 0)
        return anomalous, (1.0 if anomalous else 0.0)
    except Exception:
        return None, None


def _value_runs(xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Equal-value run starts + run id per position of a SORTED array."""
    new = np.empty(xs.size, dtype=bool)
    new[0] = True
    new[1:] = xs[1:] != xs[:-1]
    return np.flatnonzero(new), np.cumsum(new) - 1


def _lof_exact_kset(xs: np.ndarray, orig: np.ndarray, starts: np.ndarray,
                    g_of: np.ndarray, p: int, k: int,
                    exclude_self: bool) -> np.ndarray:
    """sklearn-exact k-neighbor sorted positions of sorted-pos ``p``:
    equal-value groups taken outward by distance; tied groups (v-d and
    v+d) and partially-taken groups resolved by ORIGINAL dataset index —
    sklearn's (distance, index) ordering, unconstrained by any window."""
    n = xs.size
    ends = np.append(starts[1:], n)
    v = xs[p]
    g = int(g_of[p])

    def members(gi: int, skip: int = -1) -> list[int]:
        # within a run, stable argsort left members in original-index
        # order, so position order IS orig order
        return [q for q in range(starts[gi], ends[gi]) if q != skip]

    chosen = members(g, p if exclude_self else -1)[:k]
    left, right = g - 1, g + 1
    while len(chosen) < k:
        need = k - len(chosen)
        dl = v - xs[starts[left]] if left >= 0 else np.inf
        dr = xs[starts[right]] - v if right < starts.size else np.inf
        if dl < dr:
            m = members(left)
            left -= 1
        elif dr < dl:
            m = members(right)
            right += 1
        else:  # tie: merge the two runs by original dataset index
            m = sorted(members(left) + members(right),
                       key=lambda q: orig[q])
            left -= 1
            right += 1
        chosen.extend(m[:need])
    return np.asarray(chosen[:k], dtype=np.int64)


def lof(ts: np.ndarray, values: np.ndarray, params: dict):
    """Local outlier factor over the 1-D value space, reproducing
    sklearn's ``LocalOutlierFactor(novelty=True).fit(X).predict(X)``
    flow the reference runs (skyline/custom_algorithms/lof.py:175-207):
    fit-neighbors exclude self, query-neighbors (the same points) keep
    self at distance 0, outlier when mean lrd-ratio > 1.5 (the novelty
    offset), anomalous when an outlier lands in the last
    ``anomaly_window``. kNN via the sorted-order window (O(n·k)), not an
    all-pairs matrix; distance ties break by ORIGINAL dataset index
    exactly like sklearn (lexsort inside the window, and an exact
    group-merge fallback for the rare points whose cutoff-distance tie
    run extends past the ±k window)."""
    n_neighbors = int(params.get("n_neighbors", 20))
    anomaly_window = int(params.get("anomaly_window", 1))
    n = values.size
    k = min(n_neighbors, n - 1)
    if k < 1:
        return False, 0.0
    outlier = _lof_scores(values, k) < -1.5   # novelty offset_ = -1.5
    hit = bool(outlier[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _lof_scores(values: np.ndarray, k: int) -> np.ndarray:
    """Per-point sklearn score_samples (original order) — the windowed
    kNN core of lof(), exposed so tests can pin scores, not just flags."""
    n = values.size
    order = np.argsort(values, kind="stable")
    xs = values[order].astype(np.float64)
    sorted_orig = order.astype(np.int64)
    # candidate neighbors of sorted-position i live in [i-k, i+k]
    offs = np.arange(-k, k + 1)
    posr = np.arange(n)[:, None] + offs[None, :]
    pos = np.clip(posr, 0, n - 1)
    valid = posr == pos  # out-of-range clipped duplicates sort last
    dist = np.abs(xs[pos] - xs[:, None])
    oid = sorted_orig[pos]
    big = np.inf
    self_col = k  # offset 0

    def select(exclude_self: bool) -> tuple[np.ndarray, np.ndarray]:
        d = np.where(valid, dist, big)
        if exclude_self:
            d[:, self_col] = big
        # sklearn tie-break: (distance, original dataset index)
        cols = np.lexsort((oid, d), axis=-1)[:, :k]
        return (np.take_along_axis(d, cols, 1),
                np.take_along_axis(pos, cols, 1))

    nd_fit, ni_fit = select(True)
    k_dist = nd_fit[:, -1]
    nd_q, ni_q = select(False)

    # a cutoff tie run can leave the ±k window only when the first
    # position OUTSIDE it is still within k_dist — recompute those
    # points with the exact group merge (identities change, the
    # distance multiset k_dist is already correct either way)
    idx = np.arange(n)
    needs = np.zeros(n, dtype=bool)
    m = idx - k - 1 >= 0
    needs[m] = xs[idx[m]] - xs[idx[m] - k - 1] <= k_dist[m]
    m = idx + k + 1 < n
    needs[m] |= xs[idx[m] + k + 1] - xs[idx[m]] <= k_dist[m]
    if needs.any():
        starts, g_of = _value_runs(xs)
        for p in np.flatnonzero(needs):
            s_fit = _lof_exact_kset(xs, sorted_orig, starts, g_of,
                                    int(p), k, True)
            ni_fit[p] = s_fit
            nd_fit[p] = np.abs(xs[s_fit] - xs[p])
            s_q = _lof_exact_kset(xs, sorted_orig, starts, g_of,
                                  int(p), k, False)
            ni_q[p] = s_q
            nd_q[p] = np.abs(xs[s_q] - xs[p])
        k_dist = nd_fit.max(axis=1)

    reach = np.maximum(nd_fit, k_dist[ni_fit])
    lrd_fit = 1.0 / (reach.mean(axis=1) + 1e-10)
    reach_q = np.maximum(nd_q, k_dist[ni_q])
    lrd_q = 1.0 / (reach_q.mean(axis=1) + 1e-10)
    score_sorted = -(lrd_fit[ni_q] / lrd_q[:, None]).mean(axis=1)
    scores = np.empty(n, dtype=np.float64)
    scores[order] = score_sorted
    return scores


def _iforest_avg_path(m: np.ndarray | int) -> np.ndarray | float:
    """Average BST unsuccessful-search path length c(m) (Liu et al.
    2008, eq. 1) — sklearn's _average_path_length: 0 for m<=1, 1 for
    m==2, else 2·H(m-1) - 2(m-1)/m."""
    m_arr = np.atleast_1d(np.asarray(m, dtype=np.float64))
    out = np.zeros_like(m_arr)
    out[m_arr == 2] = 1.0
    big = m_arr > 2
    mb = m_arr[big]
    out[big] = 2.0 * (np.log(mb - 1.0) + np.euler_gamma) \
        - 2.0 * (mb - 1.0) / mb
    return out if np.ndim(m) else float(out[0])


def isolation_forest(ts: np.ndarray, values: np.ndarray, params: dict):
    """Isolation forest over the standardized 1-D value space
    (skyline/custom_algorithms/isolation_forest.py:218-247: scale,
    IsolationForest(contamination='auto').fit/predict, outlier when the
    anomaly score crosses the auto offset -0.5, anomalous when an
    outlier lands in the last ``anomaly_window``). The reference rides
    sklearn's unseeded RNG; this port is the same forest (100 trees,
    256-point subsamples, uniform split thresholds, depth cap
    ceil(log2(psi))) with a fixed seed for determinism."""
    anomaly_window = int(params.get("anomaly_window", 1))
    n_trees = int(params.get("n_estimators", 100))
    seed = int(params.get("seed", 0))
    n = values.size
    if n < 2:
        return False, 0.0
    std = float(np.std(values))
    x = (values - float(np.mean(values))) / std if std != 0 \
        else values - float(np.mean(values))
    score_samples = _iforest_scores(x, n_trees=n_trees, seed=seed)
    outlier = score_samples < -0.5      # contamination='auto' offset_
    hit = bool(outlier[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _iforest_scores(x: np.ndarray, n_trees: int = 100,
                    seed: int = 0) -> np.ndarray:
    """sklearn-style isolation-forest score_samples over a 1-D array
    (100 trees, 256-point subsamples, uniform split thresholds, depth
    cap ceil(log2(psi)), seeded RNG). Shared by isolation_forest and
    the laoccfdlpnc ensemble; offsets (contamination) are the callers'
    business."""
    n = x.size
    rng = np.random.RandomState(seed)
    psi = min(256, n)
    max_depth = int(np.ceil(np.log2(max(psi, 2))))
    depths = np.zeros(n, dtype=np.float64)

    def grow(sample: np.ndarray, ev: np.ndarray, depth: int) -> None:
        if depth >= max_depth or sample.size <= 1 \
                or float(sample.min()) == float(sample.max()):
            depths[ev] += depth + _iforest_avg_path(sample.size)
            return
        q = rng.uniform(float(sample.min()), float(sample.max()))
        left = x[ev] < q
        grow(sample[sample < q], ev[left], depth + 1)
        grow(sample[sample >= q], ev[~left], depth + 1)

    everything = np.arange(n)
    for _ in range(n_trees):
        grow(x[rng.choice(n, psi, replace=False)], everything, 0)
    return -np.power(2.0, -(depths / n_trees) / _iforest_avg_path(psi))


def _find_peaks(y: np.ndarray, distance: int) -> np.ndarray:
    """Local maxima with plateau-midpoint selection and min-distance
    thinning by height priority — the scipy.signal.find_peaks(distance=)
    semantics the reference calls (anomalous_daily_peak.py:229-232);
    scipy itself is absent from this container."""
    n = y.size
    mids = []
    heights = []
    i = 1
    while i < n - 1:
        if y[i - 1] < y[i]:
            j = i
            while j < n - 1 and y[j + 1] == y[i]:
                j += 1
            if j < n - 1 and y[j + 1] < y[i]:
                mids.append((i + j) // 2)
                heights.append(y[i])
                i = j
        i += 1
    peaks = np.asarray(mids, dtype=np.int64)
    if peaks.size == 0 or distance <= 1:
        return peaks
    keep = np.ones(peaks.size, dtype=bool)
    priority = np.argsort(np.asarray(heights))
    for pi in range(peaks.size - 1, -1, -1):
        j = priority[pi]
        if not keep[j]:
            continue
        k = j - 1
        while k >= 0 and peaks[j] - peaks[k] < distance:
            keep[k] = False
            k -= 1
        k = j + 1
        while k < peaks.size and peaks[k] - peaks[j] < distance:
            keep[k] = False
            k += 1
    return peaks[keep]


def anomalous_daily_peak(ts: np.ndarray, values: np.ndarray, params: dict):
    """Is the current anomaly just the normal daily peak?
    (skyline/custom_algorithms/anomalous_daily_peak.py:160-546) — a
    mirage-side NEGATING check: True = genuinely anomalous, False = a
    repetitive daily peak within 3-sigma of the other days' peak-period
    sums. Quirks kept: low resolution (>900s) or <5.25 days of data
    return (True, 1.0); non-aligned values are flattened to the mean
    before peak finding; peak periods are the 4-of-7 consecutive values
    whose sum is closest to the anomaly period's sum; the daily-gap
    window is the literal integer range 83000..88999."""
    number_of_daily_peaks = int(params.get("number_of_daily_peaks", 3))
    within_pct = float(params.get("within_percent_of_normal_peaks", 0.0))
    try:
        tt = ts.astype(np.int64)
        diffs = np.diff(tt)
        uniq, counts = np.unique(diffs, return_counts=True)
        resolution = int(uniq[np.argmax(counts)])
        if resolution > 900:
            return True, 1.0
        if int(tt[-1] - tt[0]) < 446400:
            return True, 1.0
        anomaly_ts = int(tt[-1])
        mean = float(np.mean(values))
        # flatten values outside the +/-3-point daily windows (:182-215)
        aligned: set[int] = {anomaly_ts}
        for i in range(1, 7):
            t0 = anomaly_ts - 86400 * i
            aligned.add(t0)
            for ii in range(1, 4):
                aligned.add(t0 - resolution * ii)
        for ii in range(1, 4):
            aligned.add(anomaly_ts - resolution * ii)
        y = values.astype(np.float64).copy()
        flat = np.array([int(t) not in aligned and int(t) < anomaly_ts
                         for t in tt])
        y[flat] = mean
        # trailing mean pad so an end-of-series peak still registers
        y_pad = np.concatenate([y, np.full(7, mean)])
        distance = int((3600 / resolution) * 23)
        peaks = _find_peaks(y_pad, distance)
        if peaks.size == 0:
            return True, 1.0
        n = tt.size
        anomaly_index = n - 1
        peak_set = set(int(p) for p in peaks)
        in_window = anomaly_index in peak_set
        anomaly_peak_index = anomaly_index
        if not in_window:
            # the reference scans offsets -6..-2 and +1..+5 (:246-258 —
            # note -1 is excluded by its range(-allow_for, -1))
            allow_for = 6 if resolution <= 600 else 4
            for p in peaks:
                for off in list(range(-allow_for, -1)) + \
                        list(range(1, allow_for)):
                    if anomaly_index == p + off:
                        in_window = True
                        anomaly_peak_index = int(p)
                        break
                if in_window:
                    break
        if not in_window:
            return True, 1.0
        # peak periods: 3 before .. 3 after (last peak: 3 before only),
        # values collected in DESCENDING ts order (:274-308)
        period_indices = {}
        for idx, p in enumerate(peaks):
            p = int(p)
            last = (p == int(peaks[-1]))
            period_indices[idx] = set(
                range(p - 3, p + 1) if last else range(p - 3, p + 4))
        peak_periods: dict[int, list[tuple[int, float]]] = \
            {idx: [] for idx in period_indices}
        peak_timestamps = []
        for i in range(n - 1, -1, -1):
            for idx, indices in period_indices.items():
                if i in indices:
                    peak_periods[idx].append((int(tt[i]), float(values[i])))
                    if i in peak_set:
                        peak_timestamps.append(int(tt[i]))
                    break
        # keep peaks whose gap to the next is ~24h (:310-317)
        gaps = [-d for d in np.diff(peak_timestamps)]
        daily_peaks = [peak_timestamps[i] for i, g in enumerate(gaps)
                       if 83000 <= g < 89000
                       or peak_timestamps[i] == anomaly_ts]
        if len(daily_peaks) < number_of_daily_peaks:
            return True, 1.0
        target_ts = daily_peaks[-1]
        target_sum = 0.0
        for idx, period in peak_periods.items():
            if target_ts in [p[0] for p in period]:
                target_sum = sum(p[1] for p in period)
        # closest-sum 4-of-7 window per period (:376-398)
        peak_period_values = {}
        for peak_ts in reversed(daily_peaks):
            for idx, period in peak_periods.items():
                p_ts = [p[0] for p in period]
                if peak_ts not in p_ts:
                    continue
                vals = [p[1] for p in period]
                window_sum = sum(vals[:4])
                closest, closest_vals = window_sum, vals[:4]
                for i in range(1, len(vals) - 3):
                    window_sum = window_sum - vals[i - 1] + vals[i + 3]
                    if abs(window_sum - target_sum) < \
                            abs(closest - target_sum):
                        closest, closest_vals = window_sum, vals[i:i + 4]
                if sum(closest_vals) == 0:
                    continue
                peak_period_values[idx] = (peak_ts, sum(closest_vals))
        if len(peak_period_values) < number_of_daily_peaks:
            return True, 1.0
        anomaly_peak_ts = int(tt[anomaly_peak_index])
        peak_values = [s for (p_ts, s) in peak_period_values.values()
                       if p_ts != anomaly_peak_ts]
        anomaly_sum = sum(s for (p_ts, s) in peak_period_values.values()
                          if p_ts == anomaly_peak_ts)
        if len(peak_values) < number_of_daily_peaks:
            return True, 1.0
        if anomaly_sum == 0:
            return True, 1.0
        mean_s = float(np.mean(peak_values))
        std_s = float(np.std(peak_values))
        diff = float(anomaly_sum - mean_s)
        anomalous = bool(abs(diff) > 3 * std_s)
        if within_pct and anomalous:
            pct = _percent_different(abs(diff), 3 * std_s)
            pct = 100.0 if pct is None else abs(pct)
            if pct <= within_pct:
                anomalous = False
        return anomalous, (1.0 if anomalous else 0.0)
    except Exception:
        return None, None


def _kneedle_convex_increasing(y: np.ndarray) -> int | None:
    """Knee index of a convex increasing curve per the Kneedle paper
    (Satopaa et al. 2011, S=1) — the container has no kneed, so this is
    the paper's offline algorithm: normalize, difference curve
    x_n - y_n, candidate = local maxima, knee fires when the difference
    drops below (max - S·mean Δx) before the next maximum."""
    n = y.size
    if n < 3:
        return None
    x_n = np.arange(n, dtype=np.float64) / (n - 1)
    lo, hi = float(np.min(y)), float(np.max(y))
    if hi == lo:
        return None
    y_n = (y - lo) / (hi - lo)
    diff = x_n - y_n
    maxima = [i for i in range(1, n - 1)
              if diff[i] >= diff[i - 1] and diff[i] >= diff[i + 1]]
    if not maxima:
        return None
    s_dx = 1.0 * float(np.mean(np.diff(x_n)))
    knee = None
    mi = 0
    thr = diff[maxima[0]] - s_dx
    for i in range(maxima[0] + 1, n):
        if mi + 1 < len(maxima) and i == maxima[mi + 1]:
            mi += 1
            thr = diff[maxima[mi]] - s_dx
            continue
        if diff[i] < thr:
            knee = maxima[mi]
            break
    return knee


def _dbscan_labels(X: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Plain DBSCAN (Ester et al. 1996) with per-point on-demand
    neighborhoods — O(n²) time, O(n) memory, no sklearn in container.
    Self counts toward min_samples and the radius is inclusive, matching
    sklearn.cluster.DBSCAN."""
    n = X.shape[0]
    labels = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    eps2 = eps * eps

    def neighbors(i: int) -> np.ndarray:
        return np.flatnonzero(((X - X[i]) ** 2).sum(axis=1) <= eps2)

    cluster = -1
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        nb = neighbors(i)
        if nb.size < min_samples:
            continue
        cluster += 1
        labels[i] = cluster
        queue = list(nb)
        qi = 0
        while qi < len(queue):
            q = int(queue[qi])
            qi += 1
            if labels[q] == -1:
                labels[q] = cluster
            if not visited[q]:
                visited[q] = True
                nq = neighbors(q)
                if nq.size >= min_samples:
                    queue.extend(nq)
    return labels


def dbscan(ts: np.ndarray, values: np.ndarray, params: dict):
    """DBSCAN outlier detection over (rolling mean, rolling var)
    features (skyline/custom_algorithms/dbscan.py:270-536). Quirks kept:
    eps is the knee INDEX of the sorted kNN-distance curve (not the
    distance at the knee — dbscan.py:363-377), falling back to
    int(0.95·n); a fit with 0 outliers or more than a third outliers is
    refit at eps·2; >n/3 outliers after labeling makes the verdict
    unreliable -> (None, None)."""
    window = int(params.get("window", 3))
    min_samples = int(params.get("min_samples", 4))
    eps_percentile = int(params.get("eps_percentile", 95))
    anomaly_window = int(params.get("anomaly_window", 1))
    try:
        x = values.astype(np.float64)
        n = x.size
        if n < window + min_samples:
            return None, None
        sw = np.lib.stride_tricks.sliding_window_view(x, window)
        feats = np.column_stack([sw.mean(axis=1), sw.var(axis=1)])
        m = feats.shape[0]
        # sorted kNN distance curve, column 1 (dbscan.py:365-371): the
        # distance to each point's nearest non-self neighbor, sorted
        k = min(min_samples, m)
        d1 = np.empty(m)
        for i in range(m):
            d = np.sqrt(((feats - feats[i]) ** 2).sum(axis=1))
            d1[i] = np.partition(d, 1)[1] if m > 1 else 0.0
        curve = np.sort(d1)
        eps = _kneedle_convex_increasing(curve)
        if eps is None or eps <= 0:
            eps = int((m / 100) * eps_percentile)
        lbl = _dbscan_labels(feats, float(eps), min_samples)
        outlier_count = int((lbl == -1).sum())
        if outlier_count == 0 or outlier_count > n / 3:
            lbl = _dbscan_labels(feats, float(eps) * 2, min_samples)
        # left-pad the window warmup as inliers (:476-479)
        scores = np.concatenate([np.zeros(n - m), (lbl == -1).astype(float)])
        hit = bool(scores[-anomaly_window:].any())
        if float((lbl == -1).sum()) > n / 3:
            return None, None       # unreliable parameter fit (:501-510)
        return hit, (1.0 if hit else 0.0)
    except Exception:
        return None, None


def _fft_extrapolation(values: np.ndarray, n_predict: int = 10,
                       n_harmonics: int = 4) -> np.ndarray:
    """Fourier extrapolation padding (skyline/functions/
    timeseries_predictions/fft_extrapolation.py:109-140): linear detrend
    by the fitted slope only, keep the 1+2·n_harmonics largest-amplitude
    FFT components, reconstruct over n+n_predict samples, re-add the
    slope. NaNs forward-filled (mean when leading) per :92-103. Returns
    the n original values followed by n_predict predictions."""
    x = values.astype(np.float64).copy()
    nan = np.isnan(x)
    if nan.all():
        return x
    if nan.any():
        mean_value = float(np.nanmean(x))
        last = mean_value
        for i in range(x.size):
            if nan[i]:
                x[i] = last
            else:
                last = x[i]
    n = x.size
    t = np.arange(n, dtype=np.float64)
    p = np.polyfit(t, x, 1)
    x_freqdom = np.fft.fft(x - p[0] * t)
    f = np.fft.fftfreq(n)
    order = np.argsort(-np.absolute(x_freqdom), kind="stable")
    t2 = np.arange(n + n_predict, dtype=np.float64)
    sig = np.zeros(t2.size)
    for i in order[:1 + n_harmonics * 2]:
        sig += (np.absolute(x_freqdom[i]) / n) * \
            np.cos(2 * np.pi * f[i] * t2 + np.angle(x_freqdom[i]))
    out = sig + p[0] * t2
    # the reference keeps the ORIGINAL head and appends only the
    # predicted tail (fft_extrapolation.py:137-143)
    out[:n] = x
    return out


def low_variance_anomalous_peak_trough(ts: np.ndarray, values: np.ndarray,
                                       params: dict):
    """Is the flagged point an anomalous peak (or trough) relative to the
    series' other peaks? (skyline/custom_algorithms/
    low_variance_anomalous_peak_trough.py:190-680) — a mirage-side
    second-opinion check whose default verdict is the passed-in
    ``currently_anomalous``. Quirks kept: near-monotonic series (>=95%
    one-signed diffs and >=98% of total change) skip analysis; peaks are
    found on the Fourier-extrapolated series so an end-of-series peak
    registers; >20 peaks are trimmed to the 10 largest (troughs: 10
    smallest); the trough branch's "other" basket is the positional
    ``trough_values[0:-2]``, not value-filtered like the peak branch."""
    currently_anomalous = bool(params.get("currently_anomalous", False))
    anomaly_window = int(params.get("anomaly_window", 4))
    sig = float(params.get("sigma", 3))
    try:
        v = values.astype(np.float64)
        n = v.size
        last_index = n - 1
        if n < 3:
            return currently_anomalous, None
        diffs = np.diff(v)
        inc_zero = float((diffs >= 0).sum())
        dec_zero = float((diffs <= 0).sum())
        if inc_zero / n * 100 >= 95.0 or dec_zero / n * 100 >= 95.0:
            inc_sum = float(diffs[diffs > 0].sum())
            dec_sum = float(-diffs[diffs < 0].sum())
            total = inc_sum + dec_sum
            if total > 0:
                pi, pd_ = inc_sum / total * 100, dec_sum / total * 100
                if (pi >= 98.0 and pd_ < 2.0) or (pd_ >= 98.0 and pi < 2.0):
                    return currently_anomalous, None
        anomalous: bool | None = True
        if anomaly_window < 10:
            tail_avg = float(np.mean(v[-anomaly_window:]))
        else:
            tail_avg = float(np.mean(v[-4:]))
        trough_mode = tail_avg < float(np.mean(v))
        y_pred = _fft_extrapolation(v, n_predict=10)
        extrema = _find_peaks(-y_pred if trough_mode else y_pred, 1)
        extrema = [int(i) for i in extrema if i <= last_index]
        if len(extrema) <= 1:
            return True, None
        all_extrema = list(extrema)
        tail_window = set(range(last_index - 4, last_index + 1))
        if not tail_window & set(extrema):
            return True, None
        # trim many extrema to the 10 most extreme (:385-418)
        if len(extrema) > 20:
            by_value = sorted(extrema, key=lambda i: v[i], reverse=True)
            extrema = sorted(by_value[:10]) if not trough_mode \
                else sorted(by_value[-10:])
        check_index = None
        for i in range(last_index - 4, last_index + 1):
            if i in extrema:
                check_index = i
        if check_index is None:
            return True, None       # trimmed away (:398-404)
        check_value = float(v[check_index])
        vals = [float(v[i]) for i in extrema]
        if len(vals) == 1:
            return True, 1.0
        mean_v, med_v = float(np.mean(vals)), float(np.median(vals))
        std_v = float(np.std(vals))
        s = 1.0 if not trough_mode else -1.0
        threshold = mean_v + s * sig * std_v
        all_vals = [float(v[i]) for i in all_extrema]
        if len(all_vals) <= 2:
            return True, None
        all_med = float(np.median(all_vals))
        all_std = float(np.std(all_vals))
        all_med_threshold = all_med + s * sig * all_std
        use_median = any((x > all_med_threshold) if not trough_mode
                         else (x < all_med_threshold) for x in all_vals)
        outlier_in_vals = False
        if not trough_mode:
            others = [x for x in vals if x != check_value]
            if others:
                o_thr = float(np.mean(others)) + sig * float(np.std(others))
                if check_value > o_thr:
                    use_median = outlier_in_vals = True
            else:
                use_median = outlier_in_vals = True
        else:
            others = vals[0:-2]
            if others:
                o_thr = float(np.mean(others)) - sig * float(np.std(others))
                if check_value < o_thr:
                    use_median = outlier_in_vals = True
            else:
                use_median = outlier_in_vals = True
        if use_median:
            threshold = med_v + s * sig * std_v
        if outlier_in_vals:
            threshold = all_med_threshold
        anomalous = check_value > threshold if not trough_mode \
            else check_value < threshold
        return bool(anomalous), (1.0 if anomalous else 0.0)
    except Exception:
        return None, None


def pca(ts: np.ndarray, values: np.ndarray, params: dict):
    """PCA reconstruction-distance outlier detection
    (skyline/custom_algorithms/pca.py:122-560): features are |abs| of
    the diffed, smoothed series plus ``lags`` lagged copies; a 2-component
    PCA is fitted on the head (all but ``n_test`` points) after
    standardization; the anomaly score is the eigenvector-distance sum
    weighted by 1/explained_variance_ratio (the reference's
    cdist-to-components quirk), min-max normalized by the TRAIN scores;
    anomalous when a score >= ``threshold`` lands in the last
    ``anomaly_window``. Warmup rows score 0 via the reference's NaN->0
    index alignment. Unsuitable data (zero-variance / low-variance /
    under-sampled / uncorrelated features) -> (None, None). sklearn's
    SVD sign convention (svd_flip, u-based) is reproduced."""
    threshold = float(params.get("threshold", 0.7))
    n_test = int(params.get("n_test", 10))
    diffs_n = int(params.get("diffs", 1))
    lags_n = int(params.get("lags", 3))
    smooth_n = int(params.get("smooth", 3))
    anomaly_window = int(params.get("anomaly_window", 1))
    try:
        x = values.astype(np.float64)
        n = x.size
        warm = diffs_n + max(smooth_n - 1, 0) + lags_n
        n_train = n - n_test
        if n_train <= warm + 2:
            return None, None

        def prep(arr: np.ndarray) -> np.ndarray:
            d = arr[diffs_n:] - arr[:-diffs_n] if diffs_n >= 1 else arr
            if smooth_n >= 2:
                c = np.cumsum(np.concatenate([[0.0], d]))
                d = (c[smooth_n:] - c[:-smooth_n]) / smooth_n
            cols = [d[lags_n - k:d.size - k] for k in range(lags_n + 1)]
            return np.abs(np.column_stack(cols))

        train = prep(x[:n_train])
        tail = prep(x[n - (n - train.shape[0]):])

        def suitable(data: np.ndarray) -> bool:
            var = np.var(data, axis=0)
            if np.any(var == 0) or np.all(var < 1e-5):
                return False
            if data.shape[0] < data.shape[1]:
                return False
            cc = np.corrcoef(data, rowvar=False)
            off = cc[~np.eye(cc.shape[0], dtype=bool)]
            return bool(np.nanmax(np.abs(off)) >= 0.1)

        if not suitable(train) or not suitable(tail):
            return None, None
        mu, sd = train.mean(axis=0), train.std(axis=0)
        z_train = (train - mu) / sd
        zc = z_train - z_train.mean(axis=0)
        u, s, vt = np.linalg.svd(zc, full_matrices=False)
        # sklearn svd_flip (u-based): largest-|u| element made positive
        signs = np.sign(u[np.argmax(np.abs(u), axis=0),
                          np.arange(u.shape[1])])
        vt = vt * signs[:, None]
        var = (s ** 2) / (zc.shape[0] - 1)
        evr = (var / var.sum())[:2]
        comps = vt[:2]

        def score(z: np.ndarray) -> np.ndarray:
            d = np.sqrt(((z[:, None, :] - comps[None, :, :]) ** 2).sum(-1))
            return (d / evr).sum(axis=1)

        tr = score(z_train)
        lo, hi = float(tr.min()), float(tr.max())
        if hi == lo:
            return None, None
        te = (score((tail - mu) / sd) - lo) / (hi - lo)
        tr = (tr - lo) / (hi - lo)
        scores = np.zeros(n)
        scores[warm:n_train] = tr
        scores[n - te.size:] = te
        flags = scores >= threshold
        hit = bool(flags[-anomaly_window:].any())
        return hit, (1.0 if hit else 0.0)
    except Exception:
        return None, None


def _rolling_agg(v: np.ndarray, w: int, agg: str) -> np.ndarray:
    """Trailing-window aggregate ending AT each index (NaN warmup)."""
    n = v.size
    out = np.full(n, np.nan)
    if w <= 0 or n < w:
        return out
    sw = np.lib.stride_tricks.sliding_window_view(v, w)
    out[w - 1:] = np.median(sw, axis=1) if agg == "median" \
        else (np.std(sw, axis=1) if agg == "std" else np.mean(sw, axis=1))
    return out


def _double_rolling_iqr_detect(v: np.ndarray, left_w: int, right_w: int,
                               c: float, side: str,
                               agg: str) -> np.ndarray:
    """adtk's DoubleRollingAggregate + InterQuartileRangeAD pipeline
    (the adtk package is absent from this container; semantics per the
    adtk docs/source): at each t the left window covers t-w..t-1 and the
    right window t..t+w-1; the series of window differences (abs for
    side='both', signed otherwise) is thresholded at
    Q3 + c·IQR of itself (fit_detect trains on the same series)."""
    n = v.size
    left = np.roll(_rolling_agg(v, left_w, agg), 1)
    left[0] = np.nan
    if right_w == 1:
        right = v.astype(np.float64)
    else:
        right = np.full(n, np.nan)
        ra = _rolling_agg(v, right_w, agg)
        right[:n - right_w + 1] = ra[right_w - 1:]
    if side == "positive":
        diff = right - left
    elif side == "negative":
        diff = left - right
    else:
        diff = np.abs(right - left)
    fin = diff[np.isfinite(diff)]
    if fin.size == 0:
        return np.zeros(n, dtype=bool)
    q1, q3 = np.percentile(fin, [25, 75])
    thr = q3 + c * (q3 - q1)
    with np.errstate(invalid="ignore"):
        return np.nan_to_num(diff, nan=-np.inf) > thr


def adtk_persist(ts: np.ndarray, values: np.ndarray, params: dict):
    """adtk PersistAD semantics (skyline/custom_algorithms/
    adtk_persist.py:722-760): each value vs the median of its preceding
    ``window`` values, IQR-fenced at ``c`` (default 9.0) on the same
    series; anomalous when a flag lands in the last ``window``
    timestamps (the wrapper's realtime window)."""
    window = int(params.get("window", 5))
    c = float(params.get("c", 9.0))
    side = params.get("side", "both")
    if values.size < window + 1:
        return None, None
    flags = _double_rolling_iqr_detect(values.astype(np.float64),
                                       window, 1, c, side, "median")
    hit = bool(flags[-window:].any())
    return hit, (1.0 if hit else 0.0)


def adtk_volatility_shift(ts: np.ndarray, values: np.ndarray, params: dict):
    """adtk VolatilityShiftAD semantics (skyline/custom_algorithms/
    adtk_volatility_shift.py:690-745): rolling-std of the left vs right
    ``window`` around each point, |shift| IQR-fenced at ``c`` (default
    9.0); anomalous when a flag lands in the last ``window``
    timestamps."""
    window = int(params.get("window", 5))
    c = float(params.get("c", 9.0))
    side = params.get("side", "both")
    if values.size < 2 * window + 1:
        return None, None
    flags = _double_rolling_iqr_detect(values.astype(np.float64),
                                       window, window, c, side, "std")
    hit = bool(flags[-window:].any())
    return hit, (1.0 if hit else 0.0)


def _moving_sums(v: np.ndarray, window: int) -> np.ndarray:
    """bn.move_sum twin: trailing window sum, NaN warmup."""
    n = v.size
    c = np.cumsum(np.concatenate([[0.0], v]))
    out = np.full(n, np.nan)
    out[window - 1:] = c[window:] - c[:-window]
    return out


def _constant_decrease_walk(ma_hist: list[float], last_ma: float,
                            window: int, pct: float,
                            break_on_fail: bool) -> tuple[bool, int]:
    """The reference's backward walk over prior moving averages: each
    step must be an increase of more than ``pct`` percent going back
    (msd breaks at the first failure, msavd keeps walking and also
    counts the passing steps)."""
    last_value = last_ma
    constant_decrease = False
    n_passed = 0
    for k in range(2, window - 1):
        new_last = ma_hist[-k]
        lm_pd = _percent_different(new_last, last_value)
        if last_value < new_last and lm_pd is not None and lm_pd > pct:
            constant_decrease = True
            last_value = new_last
            n_passed += 1
        else:
            constant_decrease = False
            if break_on_fail:
                break
    return constant_decrease, n_passed


def moving_sum_decrease(ts: np.ndarray, values: np.ndarray, params: dict):
    """Sustained moving-sum decrease / spike / zero-drop detection
    (skyline/custom_algorithms/moving_sum_decrease.py:235-514). Per
    point over the trailing ``window`` sums: 0.8 when the window-mean of
    sums has been in a >``percentage_difference``% per-step decline
    across the backward walk; 0.7 when the sum jumped by more than that
    percent AND the raw value exceeds 3x the mean; 1.0 when the sum hits
    exactly 0 from a non-zero predecessor with no zero sums in the
    preceding window. Realtime verdict = the LAST point's score (the
    reference's trailing zero-streak block mutates only trigger
    metadata, never the verdict, and is omitted). Quirks kept: the
    window-mean excludes the immediately previous sum
    (``timeseries[i-window:i-1]``); a zero/undeterminable percent
    difference skips all checks for that point."""
    window = int(params.get("window", 60))
    pct = float(params.get("percentage_difference", 70))
    realtime = bool(params.get("realtime_analysis", True))
    try:
        v = values.astype(np.float64)
        if v.size < window * 3:
            return None, None
        if realtime:
            v = v[-(window * 10):]
        n = v.size
        msum = _moving_sums(v, window)
        ma_hist: list[float] = []
        sum_hist: list[float] = []
        last_score, any_anom = 0.0, False
        for i in range(n):
            score = 0.0
            if i < window:
                ma_hist.append(0.0)
                sum_hist.append(float(msum[i]))
                last_score = score
                continue
            ma = float(np.mean(msum[i - window:i - 1]))
            pd_val = _percent_different(ma, float(msum[i])) if ma > 0 else 0
            if not pd_val:
                ma_hist.append(ma)
                sum_hist.append(float(msum[i]))
                last_score = score
                continue
            if ma < ma_hist[-1]:
                dec, _ = _constant_decrease_walk(ma_hist, ma_hist[-1],
                                                window, pct, True)
                if dec:
                    score = 0.8
            if pd_val > pct and v[i] > ma * 3:
                score = 0.7
            if msum[i] == 0:
                zeros = [s for s in sum_hist[-window:] if s == 0]
                if sum_hist[-1] > 0 and v[i] == 0 and not zeros:
                    score = 1.0
            if score > 0:
                any_anom = True
            ma_hist.append(ma)
            sum_hist.append(float(msum[i]))
            last_score = score
        anomalous = (last_score > 0) if realtime else any_anom
        return bool(anomalous), (1.0 if anomalous else 0.0)
    except Exception:
        return None, None


def moving_sum_and_value_decrease(ts: np.ndarray, values: np.ndarray,
                                  params: dict):
    """The value-decrease variant (skyline/custom_algorithms/
    moving_sum_and_value_decrease.py:290-550) for low-frequency
    seasonal series: 0.7 when the sum dropped more than
    ``percentage_difference``% AND below mean/``less_than`` (default 3)
    from a positive predecessor; 0.8 from the backward decline walk
    (no break — the final step's state OR nearly-all passing steps);
    1.0 on the zero-sum drop. Verdict = last score > 0 OR the last
    CHECKED point scored (the compressed anomalyScore_list window
    quirk at :543-548)."""
    window = int(params.get("window", 60))
    pct = float(params.get("percentage_difference", 70))
    less_than = float(params.get("less_than_moving_sum_average", 3))
    anomaly_window = int(params.get("anomaly_window", 1))
    realtime = bool(params.get("realtime_analysis", True))
    try:
        v = values.astype(np.float64)
        if v.size < window * 3:
            return None, None
        if realtime:
            v = v[-(window * 10):]
        scores, checked = _msavd_scores(v, window, pct, less_than)
        anomalous = (scores[-1] > 0) if realtime else bool(scores.any())
        checked_scores = [1 if scores[i] > 0 else 0 for i in checked]
        if checked_scores and any(checked_scores[-anomaly_window:]):
            anomalous = True
        return bool(anomalous), (1.0 if anomalous else 0.0)
    except Exception:
        return None, None


def _msavd_scores(v: np.ndarray, window: int, pct: float,
                  less_than: float) -> tuple[np.ndarray, list[int]]:
    """Per-point moving_sum_and_value_decrease scores (0/0.7/0.8/1.0)
    plus the list of CHECKED indices (points past the warmup whose
    percent-difference was determinable) — shared with mmzrmp."""
    n = v.size
    msum = _moving_sums(v, window)
    ma_hist: list[float] = []
    sum_hist: list[float] = []
    checked: list[int] = []
    out = np.zeros(n)
    for i in range(n):
        score = 0.0
        if i < window:
            ma_hist.append(0.0)
            sum_hist.append(float(msum[i]))
            continue
        ma = float(np.mean(msum[i - window:i - 1]))
        pd_val = _percent_different(ma, float(msum[i]))
        if not pd_val:
            ma_hist.append(ma)
            sum_hist.append(float(msum[i]))
            continue
        if pd_val > pct and msum[i] < ma / less_than \
                and msum[i] > 0 and sum_hist[-1] > 0:
            score = 0.7
        if ma < ma_hist[-1]:
            dec, passed = _constant_decrease_walk(ma_hist, ma_hist[-1],
                                                  window, pct, False)
            if dec or passed >= (window - 3) - 1:
                score = 0.8
        if msum[i] == 0:
            zeros = [s for s in sum_hist[-window:] if s == 0]
            if sum_hist[-1] > 0 and v[i] == 0 and not zeros:
                score = 1.0
        checked.append(i)
        ma_hist.append(ma)
        sum_hist.append(float(msum[i]))
        out[i] = score
    return out, checked


def adtk_level_shift(ts: np.ndarray, values: np.ndarray, params: dict):
    """adtk LevelShiftAD semantics (skyline/custom_algorithms/
    adtk_level_shift.py:266-420): rolling-median of the left vs right
    ``window`` around each point, |shift| IQR-fenced at ``c`` (default
    9.0); anomalous when a flag lands in the last ``window`` timestamps.
    (The earlier ``level_shift`` entry is the loose MAD stand-in; this
    is the faithful adtk pipeline.)"""
    window = int(params.get("window", 5))
    c = float(params.get("c", 9.0))
    side = params.get("side", "both")
    if values.size < 2 * window + 1:
        return None, None
    flags = _double_rolling_iqr_detect(values.astype(np.float64),
                                       window, window, c, side, "median")
    hit = bool(flags[-window:].any())
    return hit, (1.0 if hit else 0.0)


def _matrix_profile(x: np.ndarray, m: int) -> np.ndarray:
    """Self-join z-normalized matrix profile via the STOMP recurrence
    (Zhu et al. 2016) — O(n²) time, O(n) memory, stumpy-convention
    handling of constant subsequences (d=0 for const-vs-const, √m for
    const-vs-varying) and a ±⌈m/4⌉ trivial-match exclusion zone."""
    x = x.astype(np.float64)
    n = x.size - m + 1
    c1 = np.cumsum(np.concatenate([[0.0], x]))
    c2 = np.cumsum(np.concatenate([[0.0], x * x]))
    s1 = c1[m:] - c1[:-m]
    s2 = c2[m:] - c2[:-m]
    mu = s1 / m
    var = np.maximum(s2 / m - mu * mu, 0.0)
    sig = np.sqrt(var)
    const = sig < 1e-13
    excl = int(np.ceil(m / 4))
    qt0 = np.correlate(x, x[:m], "valid")       # dot(x[0:m], x[j:j+m])
    qt = qt0.copy()
    prof = np.full(n, np.inf)
    for i in range(n):
        if i > 0:
            # QT(i,j) = QT(i-1,j-1) - x[j-1]x[i-1] + x[j+m-1]x[i+m-1]
            qt[1:] = qt[:-1] - x[:n - 1] * x[i - 1] \
                + x[m:m + n - 1] * x[i + m - 1]
            qt[0] = qt0[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = (qt - m * mu[i] * mu) / (m * sig[i] * sig)
        d2 = 2.0 * m * (1.0 - corr)
        d = np.sqrt(np.maximum(d2, 0.0))
        if const[i]:
            d = np.where(const, 0.0, np.sqrt(m))
        else:
            d[const] = np.sqrt(m)
        d[max(0, i - excl):i + excl + 1] = np.inf
        prof[i] = float(np.min(d)) if np.isfinite(d).any() else np.inf
    return prof


def skyline_matrixprofile(ts: np.ndarray, values: np.ndarray, params: dict):
    """Matrix-profile discord detection (skyline/custom_algorithms/
    skyline_matrixprofile.py:845-1000, stumpy.stump backend): compute
    the self-join profile at subsequence length ``windows`` (default 5),
    take the ``k_discords`` (default 20) subsequences with the LARGEST
    profile distance, and call the series anomalous when a discord start
    index lands within the last ``windows``+1 positions."""
    windows = int(params.get("windows", 5))
    k_discords = int(params.get("k_discords", 20))
    try:
        x = values.astype(np.float64)
        if x.size < windows * 3:
            return None, None
        prof = _matrix_profile(x, windows)
        discords = np.argsort(prof, kind="stable")[-k_discords:]
        last_index = x.size - 1
        window_idx = set(range(last_index - windows, last_index + 1))
        hit = bool(window_idx & set(int(d) for d in discords))
        return hit, (1.0 if hit else 0.0)
    except Exception:
        return None, None


def adtk_seasonal(ts: np.ndarray, values: np.ndarray, params: dict):
    """adtk SeasonalAD semantics (skyline/custom_algorithms/
    adtk_seasonal.py:233-520, adtk package absent): classic seasonal
    decomposition — period auto-detected as the strongest significant
    ACF local maximum, seasonal pattern = per-phase mean, residual
    IQR-fenced at ``c`` (both/positive/negative sides); anomalous when a
    flag lands in the last ``window`` timestamps. No detectable period
    mirrors the wrapper's caught-fit-failure path -> (False, 0.0)."""
    window = int(params.get("window", 5))
    c = float(params.get("c", 9.0))
    side = params.get("side", "both")
    v = values.astype(np.float64)
    n = v.size
    if n < 20:
        return None, None
    x = v - v.mean()
    denom = float(np.dot(x, x))
    if denom == 0:
        return False, 0.0
    acf = np.correlate(x, x, "full")[n - 1:] / denom
    sig_level = 2.0 / np.sqrt(n)
    cands = [k for k in range(2, n // 2)
             if acf[k] >= acf[k - 1] and acf[k] >= acf[k + 1]
             and acf[k] > sig_level]
    if not cands:
        return False, 0.0
    period = max(cands, key=lambda k: acf[k])
    phase = np.arange(n) % period
    pattern = np.array([v[phase == p].mean() for p in range(period)])
    resid = v - pattern[phase]
    q1, q3 = np.percentile(resid, [25, 75])
    iqr = q3 - q1
    if side == "positive":
        flags = resid > q3 + c * iqr
    elif side == "negative":
        flags = resid < q1 - c * iqr
    else:
        flags = (resid > q3 + c * iqr) | (resid < q1 - c * iqr)
    hit = bool(flags[-window:].any())
    return hit, (1.0 if hit else 0.0)


def _holt_fitted(y: list, alpha: float, beta: float,
                 l0: float, b0: float) -> tuple[float, list]:
    """One-step-ahead fitted values of the innovations-form ETS(A,A,N)
    model (l_t = l_{t-1}+b_{t-1}+a*e_t; b_t = b_{t-1}+a*b*e_t).
    Returns (sse, fitted)."""
    l, b = l0, b0
    ab = alpha * beta
    sse = 0.0
    fitted = []
    for yt in y:
        f = l + b
        fitted.append(f)
        e = yt - f
        sse += e * e
        l = f + alpha * e
        b = b + ab * e
    return sse, fitted


def _ets_fitted(v: np.ndarray) -> np.ndarray:
    """One-step-ahead fitted values of ETS(A,A,N), smoothing parameters
    chosen by SSE-minimizing grid+refine. statsmodels
    initialization_method="estimated" analogue: an OLS line over the
    first handful of points seeds level/slope."""
    y = v.tolist()
    n = v.size
    head = min(10, n)
    hx = np.arange(head, dtype=np.float64)
    hb = float(np.polyfit(hx, v[:head], 1)[0]) if head > 1 else 0.0
    l0, b0 = float(v[0]), hb
    best = (np.inf, 0.5, 0.1)
    for a in (0.1, 0.3, 0.5, 0.7, 0.9):
        for bfrac in (0.05, 0.2, 0.5, 1.0):
            sse, _ = _holt_fitted(y, a, bfrac, l0, b0)
            if sse < best[0]:
                best = (sse, a, bfrac)
    _, a0, bf0 = best
    for a in np.clip([a0 - 0.1, a0, a0 + 0.1], 0.01, 0.99):
        for bfrac in np.clip([bf0 / 2, bf0, min(1.0, bf0 * 2)], 0.01, 1.0):
            sse, _ = _holt_fitted(y, float(a), float(bfrac), l0, b0)
            if sse < best[0]:
                best = (sse, float(a), float(bfrac))
    _, fitted = _holt_fitted(y, best[1], best[2], l0, b0)
    return np.asarray(fitted)


def _gpd_pwm_fit(x: np.ndarray) -> tuple[float, float] | None:
    """Hosking & Wallis (1987) probability-weighted-moment estimators
    for the two-parameter GPD over exceedances x >= 0: returns
    (kappa, scale) with CDF F(x) = 1 - (1 - kappa*x/scale)^(1/kappa)
    (kappa -> 0 reduces to the exponential)."""
    x = np.sort(x.astype(np.float64))
    n = x.size
    if n < 3:
        return None
    b0 = float(x.mean())
    # a_1 = E[X(1-F(X))]: ascending order stats weighted (n-i)/(n-1)
    b1 = float(np.sum((1.0 - np.arange(n) / (n - 1.0)) * x) / n)
    denom = b0 - 2.0 * b1
    if denom == 0 or b0 <= 0:
        return None
    kappa = b0 / denom - 2.0
    scale = 2.0 * b0 * b1 / denom
    if scale <= 0:
        return None
    return kappa, scale


def _gpd_cdf(q: np.ndarray, kappa: float, scale: float) -> np.ndarray:
    q = np.maximum(q, 0.0)
    if abs(kappa) < 1e-9:
        return 1.0 - np.exp(-q / scale)
    inner = 1.0 - kappa * q / scale
    # kappa > 0 has bounded support scale/kappa: beyond it F = 1
    out = np.where(inner > 0.0,
                   1.0 - np.power(np.maximum(inner, 1e-300), 1.0 / kappa),
                   1.0)
    if kappa < 0:
        return out
    return np.where(q >= scale / kappa, 1.0, out)


def probabilistic_forecasts_gpd_ets(ts: np.ndarray, values: np.ndarray,
                                    params: dict):
    """pfgpde — Hyndman's probabilistic-forecast anomaly detection
    (skyline/custom_algorithms/
    probabilistic_forecasts_generalized_pareto_distribution_ets.py:
    240-345, statsmodels-statespace-ETS + scipy genpareto absent from
    this container): fit a trend exponential-smoothing model (own
    Holt/ETS(A,A,N) with SSE-minimizing grid+refine over the smoothing
    parameters), take density scores = -log N(y; fitted, std(resid)),
    fit a GPD (Hosking-Wallis PWM, loc=0) to the scores above the
    ``p_value`` percentile, and flag points whose tail probability
    exceeds ``threshold``; anomalous iff a flagged point lands in the
    last ``anomaly_window`` observations."""
    threshold = float(params.get("threshold", 0.95))
    p_value = float(params.get("p_value", 95))
    anomaly_window = int(params.get("anomaly_window", 1))
    v = values.astype(np.float64)
    n = v.size
    if n < 30 or not np.isfinite(v).all():
        return None, None
    resid = v - _ets_fitted(v)
    sigma = float(resid.std(ddof=1))      # pandas Series.std default
    if sigma <= 0 or not np.isfinite(sigma):
        return None, None                 # reference: logpdf blows up
    density = (0.5 * np.log(2.0 * np.pi) + np.log(sigma)
               + 0.5 * (resid / sigma) ** 2)
    p_threshold = float(np.percentile(density, p_value))
    exceed = density[density > p_threshold] - p_threshold
    fit = _gpd_pwm_fit(exceed)
    if fit is None:
        return None, None                 # reference: genpareto.fit raises
    probabilities = _gpd_cdf(density - p_threshold, *fit)
    labels = probabilities > threshold
    hit = bool(labels[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _ma_reflect(x: np.ndarray, w: int) -> np.ndarray:
    """Centered moving average, reflect-padded to full length (the
    classical-decomposition trend filter; even windows use the standard
    2xMA so the filter stays centered)."""
    if w < 2:
        return x.copy()
    pad = w // 2
    xp = np.concatenate([x[pad:0:-1], x, x[-2:-pad - 2:-1]])
    kern = np.full(w, 1.0 / w)
    if w % 2 == 0:
        kern = np.convolve(kern, np.full(2, 0.5))
        xp = np.concatenate([xp[:1], xp])
    out = np.convolve(xp, kern, "valid")
    return out[:x.size]


def _mstl_seasonal(v: np.ndarray, periods: list[int],
                   iterations: int = 2) -> np.ndarray:
    """MSTL-lite seasonal extraction (Bandara, Hyndman & Bergmeir 2021
    semantics: one STL pass per seasonal period, iterated so each
    component is re-estimated net of the others). Per period: detrend
    with the centered MA at that period, then zero-mean per-phase means
    of the detrended cycle-subseries."""
    n = v.size
    seasonals = [np.zeros(n) for _ in periods]
    phase = [np.arange(n) % p for p in periods]
    for _ in range(iterations):
        for k, p in enumerate(periods):
            x = v - sum(seasonals[j] for j in range(len(periods)) if j != k)
            det = x - _ma_reflect(x, p)
            pat = np.array([det[phase[k] == q].mean() for q in range(p)])
            pat -= pat.mean()
            seasonals[k] = pat[phase[k]]
    return sum(seasonals)


def mstl(ts: np.ndarray, values: np.ndarray, params: dict):
    """mstl — statsforecast-MSTL in-sample interval breach
    (skyline/custom_algorithms/mstl.py:214-400, statsforecast absent
    from this container): decompose at season_length=[season_hours,
    season_hours*season_days] (MSTL-lite above), fit the trend
    forecaster (own ETS(A,A,N)) on the deseasonalized series, rebuild
    in-sample fitted values + a Gaussian ``level``% interval from the
    residual sigma, and flag y >= hi or y <= lo; anomalous iff a flag
    lands in the last ``anomaly_window`` observations."""
    from skyline_spark.functions.stats import norm_ppf

    anomaly_window = int(params.get("anomaly_window", 1))
    level = float(params.get("level", 99))
    season_hours = int(params.get("season_hours", 24))
    season_days = int(params.get("season_days", 7))
    v = values.astype(np.float64)
    n = v.size
    if n < 30 or not np.isfinite(v).all():
        return None, None
    # statsforecast needs >= 2 full cycles to fit a seasonal component
    periods = [p for p in
               dict.fromkeys([season_hours, season_hours * season_days])
               if 2 <= p and n >= 2 * p]
    if not periods:
        return None, None             # reference: MSTL fit raises
    seasonal = _mstl_seasonal(v, periods)
    fitted = _ets_fitted(v - seasonal) + seasonal
    resid = v - fitted
    sigma = float(resid.std(ddof=1))
    if sigma <= 0 or not np.isfinite(sigma):
        return None, None             # degenerate interval
    z = norm_ppf(0.5 + level / 200.0)
    breach = (v >= fitted + z * sigma) | (v <= fitted - z * sigma)
    hit = bool(breach[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def skyline_tsb_uad_pca(ts: np.ndarray, values: np.ndarray, params: dict):
    """TSB-UAD PCA detector (skyline/custom_algorithms/
    skyline_tsb_uad_pca.py:595-725 local path + custom_algorithm_sources/
    TSB_UAD/pca.py fit; sklearn absent from this container): the wrapper
    feeds the RAW 1-D series, which check_array reshapes to (n, 1) — so
    the detector reduces in closed form: standardize to z, the single
    principal component is [s] with s = sign(z[argmax |z|]) (sklearn
    svd_flip makes the max-|u| entry positive), decision_scores_ =
    cdist(z, [s]) = |z - s|. Scores are min-max scaled to [0, 1],
    thresholded at mean + 6*std (capped to 0.95 when that exceeds 1),
    and the verdict is any flagged point inside the last
    ``anomaly_window``. Constant series short-circuit to (False, None)
    per the reference's near-zero-variance guard; the mirage-side
    downsample branch is not applicable in the analyzer context."""
    anomaly_window = int(params.get("anomaly_window", 1))
    v = values.astype(np.float64)
    n = v.size
    if n < 10:
        return None, None
    if np.isnan(v).mean() > 0.1:
        return None, None
    if np.isnan(v).any():                   # reference fill_nans analogue
        idx = np.arange(n)
        good = ~np.isnan(v)
        v = np.interp(idx, idx[good], v[good])
    std = float(v.std())                    # StandardScaler: ddof=0
    if std < 1e-10:
        return False, None
    z = (v - v.mean()) / std
    s = 1.0 if z[int(np.argmax(np.abs(z)))] > 0 else -1.0
    score = np.abs(z - s)
    smin, smax = float(score.min()), float(score.max())
    if smax == smin:
        return False, 0.0
    score = (score - smin) / (smax - smin)
    threshold = float(score.mean() + 6.0 * score.std())
    if threshold > 1:
        threshold = 0.95
    flags = score > threshold
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _rbf_gram_prefix(x: np.ndarray) -> np.ndarray:
    """2-D prefix sums of the RBF Gram matrix with the ruptures CostRbf
    median-heuristic bandwidth (gamma = 1/median of the off-diagonal
    squared pairwise distances). Segment Gram-block sums are then O(1):
    S(a,b) = P[b,b] - 2*P[a,b] + P[a,a] (symmetry)."""
    x = x.astype(np.float64).reshape(-1, 1)
    d2 = (x - x.T) ** 2
    n = x.shape[0]
    if n > 1:
        off = d2[~np.eye(n, dtype=bool)]   # symmetric: same median as triu
        med = float(np.median(off))
        del off
    else:
        med = 0.0
    gamma = 1.0 / med if med != 0 else 1.0
    K = np.exp(-gamma * d2)
    del d2
    P = np.zeros((n + 1, n + 1))
    P[1:, 1:] = K.cumsum(axis=0).cumsum(axis=1)
    return P


def _kcpd_seg_costs(P: np.ndarray, a: int, ends: np.ndarray) -> np.ndarray:
    """Kernel segment costs c(a, b) = (b-a) - S(a,b)/(b-a) for a vector
    of exclusive end indices (Arlot, Celisse & Harchaoui 2019)."""
    lens = ends - a
    S = P[ends, ends] - 2.0 * P[a, ends] + P[a, a]
    return lens - S / lens


def kernel_cpd_pelt(x: np.ndarray, pen: float = 30.0,
                    min_size: int = 6,
                    P: np.ndarray | None = None) -> list[int]:
    """Penalized kernel change-point detection — the ruptures
    KernelCPD(kernel='rbf').predict(pen=...) shape (PELT dynamic
    program, Killick et al. 2012, over the kernel cost): returns the
    sorted exclusive segment ends INCLUDING n, like ruptures. Pass a
    precomputed ``_rbf_gram_prefix`` to share the O(n²) Gram work."""
    n = x.size
    if P is None:
        P = _rbf_gram_prefix(x)
    F = np.full(n + 1, np.inf)
    F[0] = -pen
    prev = np.zeros(n + 1, dtype=np.int64)
    for t in range(min_size, n + 1):
        starts = np.arange(0, t - min_size + 1)
        # vectorized: c(s, t) over all s at once
        lens = t - starts
        S = P[t, t] - 2.0 * P[starts, t] + P[starts, starts]
        costs = lens - S / lens
        total = F[starts] + costs + pen
        j = int(np.argmin(total))
        F[t] = total[j]
        prev[t] = starts[j]
    ends = []
    t = n
    while t > 0:
        ends.append(t)
        t = int(prev[t])
    return sorted(ends)


def kernel_cpd_binseg(x: np.ndarray, pen: float = 30.0,
                      min_size: int = 6,
                      P: np.ndarray | None = None) -> list[int]:
    """Greedy binary segmentation over the same RBF kernel cost — the
    ruptures Binseg(model='rbf').predict(pen=...) shape: recursively
    take the max-gain split while the gain exceeds the penalty."""
    n = x.size
    if P is None:
        P = _rbf_gram_prefix(x)

    def best_split(a: int, b: int) -> tuple[float, int] | None:
        if b - a < 2 * min_size:
            return None
        splits = np.arange(a + min_size, b - min_size + 1)
        c_left = _kcpd_seg_costs(P, a, splits)
        c_right = np.array([_kcpd_seg_costs(P, int(s), np.array([b]))[0]
                            for s in splits])
        c_full = _kcpd_seg_costs(P, a, np.array([b]))[0]
        gains = c_full - (c_left + c_right)
        j = int(np.argmax(gains))
        return float(gains[j]), int(splits[j])

    ends = [n]
    segments = [(0, n)]
    while True:
        cands = [(best_split(a, b), (a, b)) for a, b in segments]
        cands = [(g, s, seg) for (gs, seg) in cands
                 if gs is not None for g, s in [gs]]
        if not cands:
            break
        g, s, seg = max(cands, key=lambda c: c[0])
        if g <= pen:
            break
        segments.remove(seg)
        a, b = seg
        segments += [(a, s), (s, b)]
        ends.append(s)
    return sorted(ends)


def mmzrmp(ts: np.ndarray, values: np.ndarray, params: dict):
    """mmzrmp — the sustained-changepoint ensemble
    (skyline/custom_algorithms/mmzrmp.py:41-830; ruptures absent from
    this container, so the two ruptures members run on the own
    kernel-CPD implementations above): moving-median(4) preprocess;
    members m66 (on the fft-extrapolated smoothed series, window 5 /
    sigma 6 / anomaly_window*2), macd (12/26/9), zscore (|z| > 3),
    ruptures_pelt + ruptures_binseg (RBF kernel, pen=30, min_size=6, on
    the RAW values; pelt hits widened ±6 points), and
    moving_sum_and_value_decrease (window 60, full-series). Collation
    mirrors the reference: single-member points adopt the member union
    within ±3 points (±1 when anomaly_window < 10), combinations drawn
    only from {zscore, pelt, binseg} collapse to ONE pseudo-member, and
    a point is anomalous when >1 distinct members remain; the verdict
    is any such point in the last ``anomaly_window``. The mirage-side
    downsample branch is not applicable in the analyzer context."""
    anomaly_window = int(params.get("anomaly_window", 1))
    v = values.astype(np.float64)
    n = v.size
    if n < 180 or n > 4000:          # sub-detector warmups / O(n^2) Gram
        return None, None
    if np.isnan(v).any():
        # reference mmzrmp.py:443-457: NaNs in the REVERSED series are
        # replaced by a 0-floored running MAXIMUM of the values seen so
        # far (not a plain forward fill)
        rv = v[::-1].copy()
        mask = np.isnan(rv)
        rv[mask] = np.maximum.accumulate(np.where(mask, 0, rv))[mask]
        v = rv[::-1]
    std = float(v.std())
    z = (v - v.mean()) / std if std > 0 else np.zeros(n)
    zflags = (z > 3) | (z < -3)
    tser = (pd.Series(v).rolling(4).median()
            .bfill().to_numpy())     # moving-median(4), head padded
    member_flags: dict[str, np.ndarray] = {}
    ext = _fft_extrapolation(tser, n_predict=10)
    member_flags["m66"] = _m66_flags(ext, 5, 6, 6.0)[:n] > 0
    member_flags["macd"] = _macd_flags(tser, 12, 26, 9, "macd")
    member_flags["zscore"] = zflags
    gram_p = _rbf_gram_prefix(v)       # shared by both CPD members
    pelt = np.zeros(n, dtype=bool)
    for e in kernel_cpd_pelt(v, pen=30.0, min_size=6, P=gram_p):
        pelt[max(0, e - 1 - 6):min(n, e - 1 + 6)] = True   # ±window(6)
    member_flags["ruptures_pelt"] = pelt
    binseg = np.zeros(n, dtype=bool)
    for e in kernel_cpd_binseg(v, pen=30.0, min_size=6, P=gram_p):
        binseg[e - 1] = True
    del gram_p
    member_flags["ruptures_binseg"] = binseg
    msavd, _ = _msavd_scores(v, 60, 70.0, 3.0)
    member_flags["msavd"] = msavd > 0
    names = sorted(member_flags)
    sets = [frozenset(m for m in names if member_flags[m][i])
            for i in range(n)]
    # single-member rescue: adopt the neighborhood union when larger.
    # The reference mutates all_algorithm_results IN PLACE while
    # iterating ascending (mmzrmp.py:729-753), so earlier rescues
    # cascade into later points' neighborhoods — iterate over the
    # evolving list, not a snapshot
    reach = 3 if anomaly_window >= 10 else 1
    rescued = list(sets)
    for i in range(n):
        if len(rescued[i]) == 1:
            lo, hi = max(0, i - reach), min(n, i + reach + 1)
            union = frozenset().union(*rescued[lo:hi])
            if len(union) > 1:
                rescued[i] = union
    ruptures_like = {"zscore", "ruptures_pelt", "ruptures_binseg"}
    hit = False
    for i in range(n - anomaly_window, n):
        s = rescued[i]
        if len(s) >= 2 and s <= ruptures_like:
            continue                 # collapses to one pseudo-member
        if len(s) > 1:
            hit = True
            break
    return hit, (1.0 if hit else 0.0)


def _rbf_kernel_mat(A: np.ndarray, B: np.ndarray,
                    gamma: float) -> np.ndarray:
    d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=-1)
    return np.exp(-gamma * d2)


def _ocsvm_fit(X: np.ndarray, nu: float, gamma: float,
               tol: float = 1e-6,
               max_iter: int = 100000) -> tuple[np.ndarray, float]:
    """Schölkopf nu-one-class SVM dual via SMO (the libsvm ONE_CLASS
    formulation) over the RBF kernel — see _ocsvm_fit_kernel."""
    return _ocsvm_fit_kernel(_rbf_kernel_mat(X, X, gamma), nu,
                             tol=tol, max_iter=max_iter)


def _ocsvm_fit_kernel(K: np.ndarray, nu: float, tol: float = 1e-6,
                      max_iter: int = 100000) -> tuple[np.ndarray, float]:
    """The SMO one-class solve over a PRECOMPUTED Gram matrix (any
    kernel): min 0.5 a'Ka s.t. 0 <= a_i <= 1/(nu n), sum a = 1,
    solved by maximal-violating-pair updates. Returns (alpha, rho);
    decision for a point x is sum_i a_i k(x_i, x) - rho."""
    n = K.shape[0]
    C = 1.0 / (nu * n)
    alpha = np.zeros(n)
    nf = int(nu * n)
    alpha[:nf] = C                       # libsvm initialization
    if nf < n:
        alpha[nf] = 1.0 - C * nf
    g = K @ alpha
    for _ in range(max_iter):
        up = alpha < C - 1e-12
        dn = alpha > 1e-12
        i = int(np.argmin(np.where(up, g, np.inf)))
        j = int(np.argmax(np.where(dn, g, -np.inf)))
        if g[j] - g[i] < tol:
            break
        eta = K[i, i] + K[j, j] - 2.0 * K[i, j]
        d = (g[j] - g[i]) / max(eta, 1e-12)
        d = min(d, C - alpha[i], alpha[j])
        alpha[i] += d
        alpha[j] -= d
        g += d * (K[:, i] - K[:, j])
    free = (alpha > 1e-8) & (alpha < C - 1e-8)
    if free.any():
        rho = float(g[free].mean())
    else:
        lo = g[alpha > 1e-12]
        hi = g[alpha < C - 1e-12]
        rho = float((lo.max() + hi.min()) / 2.0) if lo.size and hi.size \
            else float(g.mean())
    return alpha, rho


def one_class_svm(ts: np.ndarray, values: np.ndarray, params: dict):
    """one_class_svm (skyline/custom_algorithms/one_class_svm.py:
    200-340; sklearn absent — the nu-SVM dual is solved by the own SMO
    above): features are the rolling mean and rolling variance (std
    when the min-max-normalised variance <= 0.009) over ``window``
    (default 3), standardized; OneClassSVM(rbf, gamma='scale',
    nu=0.09) flags -1 windows; head padded inlier; anomalous iff a
    flagged point lands in the last ``anomaly_window``."""
    nu = float(params.get("nu", 0.09))
    window = int(params.get("window", 3))
    anomaly_window = int(params.get("anomaly_window", 1))
    v = values.astype(np.float64)
    n = v.size
    if n < max(window + 1, 30) or not np.isfinite(v).all():
        return None, None
    vmax, vmin = float(v.max()), float(v.min())
    if vmax == vmin:
        norm_var = 0.0
    else:
        norm_var = round(float(np.var((v - vmin) / (vmax - vmin))), 4)
    sw = np.lib.stride_tricks.sliding_window_view(v, window)
    xmean = sw.mean(axis=1)
    xvar = sw.std(axis=1) if norm_var <= 0.009 else sw.var(axis=1)
    XX = np.column_stack([xmean, xvar])
    mu, sd = XX.mean(axis=0), XX.std(axis=0)      # StandardScaler ddof=0
    sd = np.where(sd == 0, 1.0, sd)
    XX = (XX - mu) / sd
    gamma = 1.0 / (XX.shape[1] * XX.var()) if XX.var() > 0 else 1.0
    alpha, rho = _ocsvm_fit(XX, nu, gamma)
    dec = _rbf_kernel_mat(XX, XX[alpha > 1e-12], gamma) \
        @ alpha[alpha > 1e-12] - rho
    flags = np.concatenate([np.zeros(window - 1, dtype=bool),  # head pad
                            dec <= 0])
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def _acf_find_length(v: np.ndarray) -> int:
    """TSB-UAD find_length (custom_algorithm_sources/TSB_UAD/utils.py:
    173-203): acf to 400 lags, sliced from lag 3; the strongest strict
    local maximum decides the subsequence length (+3 base); a sliced
    index < 3 or > 300, or no maximum, falls back to 100."""
    data = v[:min(20000, v.size)].astype(np.float64)
    n = data.size
    x = data - data.mean()
    nlags = min(400, n - 1)
    c = np.correlate(x, x, "full")[n - 1:n + nlags]
    if c[0] == 0:
        return 100
    ac = (c / c[0])[3:]
    if ac.size < 3:
        return 100
    lm = np.flatnonzero((ac[1:-1] > ac[:-2]) & (ac[1:-1] > ac[2:])) + 1
    if lm.size == 0:
        return 100
    best = int(lm[np.argmax(ac[lm])])
    if best < 3 or best > 300:
        return 100
    return best + 3


def skyline_tsb_uad_ocsvm(ts: np.ndarray, values: np.ndarray,
                          params: dict):
    """TSB-UAD OCSVM (skyline/custom_algorithms/
    skyline_tsb_uad_ocsvm.py:598-700 local path; sklearn absent — same
    own SMO solver as one_class_svm): auto subsequence length via
    find_length, sliding-window embedding (TSB Window.convert column
    order: newest first), train on the first max(10%, window) of the
    series, per-window min-max scaling, OneClassSVM(rbf, gamma=1/w,
    nu=0.05) decision over ALL windows inverted to outlier scores,
    center-padded to series length, min-max scaled and thresholded at
    mean + 6*std (capped to 0.75 when that exceeds 1); anomalous iff a
    flagged point lands in the last ``anomaly_window``."""
    import math

    nu = float(params.get("nu", 0.05))
    anomaly_window = int(params.get("anomaly_window", 1))
    v = values.astype(np.float64)
    n = v.size
    if n < 30:
        return None, None
    if np.isnan(v).mean() > 0.1:
        return None, None
    if np.isnan(v).any():
        idx = np.arange(n)
        good = ~np.isnan(v)
        v = np.interp(idx, idx[good], v[good])
    if float(np.std(v)) < 1e-10:
        return None, None
    w = _acf_find_length(v)
    if n <= w:
        return None, None             # reference: Window/fit raises
    train_len = max(int(0.1 * n), w)

    def windows(x: np.ndarray) -> np.ndarray:
        sw = np.lib.stride_tricks.sliding_window_view(x, w)
        return sw[:, ::-1]            # TSB Window: shift(0..n) columns

    def row_minmax(X: np.ndarray) -> np.ndarray:
        lo = X.min(axis=1, keepdims=True)
        rng = X.max(axis=1, keepdims=True) - lo
        rng = np.where(rng == 0, 1.0, rng)
        return (X - lo) / rng

    Xtr = row_minmax(windows(v[:train_len]))
    Xte = row_minmax(windows(v))
    gamma = 1.0 / w                   # sklearn gamma='auto'
    alpha, rho = _ocsvm_fit(Xtr, nu, gamma)
    sv = alpha > 1e-12
    dec = _rbf_kernel_mat(Xte, Xtr[sv], gamma) @ alpha[sv] - rho
    score = -dec                      # pyod invert_order
    score = np.concatenate([
        np.full(math.ceil((w - 1) / 2), score[0]), score,
        np.full((w - 1) // 2, score[-1])])
    smin, smax = float(score.min()), float(score.max())
    if smax == smin:
        return False, 0.0
    score = (score - smin) / (smax - smin)
    threshold = float(score.mean() + 6.0 * score.std())
    if threshold > 1:
        threshold = 0.75
    flags = score > threshold
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


# --------------------------------------------------------------------------
# laoccfdlpnc — locally adaptive one-class classifier fusion (the last
# solver-requiring port: cvxpy absent, so the convex program gets an own
# projected-gradient interior-point solve below)
# --------------------------------------------------------------------------

def _nystroem_transform(X: np.ndarray, gamma: float, m: int,
                        seed: int = 42) -> np.ndarray:
    """sklearn.kernel_approximation.Nystroem: m random landmark rows,
    K(X, L) @ (U/sqrt(S) @ Vt).T from the SVD of K(L, L). The reference
    leaves Nystroem's random_state unset (nondeterministic landmarks);
    this port seeds the permutation for reproducibility."""
    n = X.shape[0]
    m = min(m, n)
    rng = np.random.RandomState(seed)
    basis = X[rng.permutation(n)[:m]]
    Kb = _rbf_kernel_mat(basis, basis, gamma)
    U, S, Vt = np.linalg.svd(Kb)
    S = np.maximum(S, 1e-12)
    return _rbf_kernel_mat(X, basis, gamma) @ ((U / np.sqrt(S)) @ Vt).T


def _gmm1_score_samples(x: np.ndarray) -> np.ndarray:
    """GaussianMixture(n_components=1, covariance_type='full')
    .score_samples over 1-D data: the single component converges to the
    sample mean/variance (+ sklearn's reg_covar=1e-6), so the log
    density is closed-form."""
    mu = x.mean()
    var = x.var() + 1e-6
    return -0.5 * (np.log(2.0 * np.pi * var) + (x - mu) ** 2 / var)


def _project_p15(w: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Euclidean projection onto the l_1.5 ball: per-coordinate the
    prox root is closed-form (quadratic in sqrt(u)), the multiplier is
    found by bisection."""
    a = np.abs(w)
    if float((a ** 1.5).sum()) <= radius:
        return w.copy()

    def shrunk(lam: float) -> np.ndarray:
        r = (-1.5 * lam + np.sqrt(2.25 * lam * lam + 4.0 * a)) / 2.0
        return r * r

    lo, hi = 0.0, 1.0
    while float((shrunk(hi) ** 1.5).sum()) > radius:
        hi *= 2.0
    for _ in range(100):
        mid = (lo + hi) / 2.0
        if float((shrunk(mid) ** 1.5).sum()) > radius:
            lo = mid
        else:
            hi = mid
    return np.sign(w) * shrunk(hi)


def _laoccfdlpnc_weights(S: np.ndarray, mu: float = 10.0,
                         iters: int = 400) -> np.ndarray:
    """Own solve of the reference's locally-adaptive weight program
    (laoccfdlpnc.py:428-489): minimize sum_i hinge(1 - (Sw)_i)
    - mu * sum_j log(1 - |w_j|) subject to ||w||_1.5 <= 1, labels all
    +1, mu = 10 (the reference's interior-point loop solves once at
    mu=10 and breaks on 'optimal'). cvxpy is absent, so: annealed
    smoothing of the hinge (Huber) and |.| (sqrt(w^2+eps^2)), projected
    gradient with Armijo backtracking onto the l_1.5 ball. Convex,
    k=6 dims; converges to ~1e-7 of the probed optimum (pinned by
    test_laoccfdlpnc_weights_optimal)."""
    n, k = S.shape

    def make_fg(delta: float, eps: float):
        def fval(w: np.ndarray) -> float:
            aw = np.sqrt(w * w + eps * eps)
            if (aw >= 1.0 - 1e-12).any():
                return np.inf
            t = 1.0 - S @ w
            h = np.where(t <= 0.0, 0.0,
                         np.where(t < delta, t * t / (2.0 * delta),
                                  t - delta / 2.0))
            return float(h.sum() - mu * np.log(1.0 - aw).sum())

        def grad(w: np.ndarray) -> np.ndarray:
            aw = np.sqrt(w * w + eps * eps)
            t = 1.0 - S @ w
            dh = np.where(t <= 0.0, 0.0,
                          np.where(t < delta, t / delta, 1.0))
            return -(S * dh[:, None]).sum(axis=0) \
                + mu * (w / aw) / (1.0 - aw)

        return fval, grad

    w = np.full(k, 0.1)
    for delta, eps in ((1e-1, 1e-2), (1e-3, 1e-4), (1e-6, 1e-8)):
        fval, grad = make_fg(delta, eps)
        f = fval(w)
        step = 1.0
        for _ in range(iters):
            g = grad(w)
            improved = False
            while step > 1e-14:
                cand = _project_p15(w - step * g)
                np.clip(cand, -1.0 + 1e-9, 1.0 - 1e-9, out=cand)
                fc = fval(cand)
                if fc < f - 1e-12:
                    w, f = cand, fc
                    step *= 1.5
                    improved = True
                    break
                step *= 0.5
            if not improved:
                break
    return w


def laoccfdlpnc(ts: np.ndarray, values: np.ndarray, params: dict):
    """laoccfdlpnc (skyline/custom_algorithms/laoccfdlpnc.py:38-759) —
    locally adaptive fusion of six one-class detectors with p-norm
    constraint: z-score the series; RBF widths (0.25, 0.5, 1)*M with M
    the mean pairwise squared distance (computed here via the closed
    form 2(n*sum(x^2) - sum(x)^2)/(n(n-1)), identical value to the
    reference's squared_diffs matrix); three RBF one-class SVMs
    (own SMO), an isolation forest (own, seed 42 like the reference's
    random_state=42), a linear one-class SVM over a Nystroem RBF
    embedding (300 components, gamma = the 0.5-width gamma), and a
    single-component GMM log-density; per-detector z-scored scores,
    two-sided 5%-trimmed min-max, locally-adaptive weights from the
    interior-point program (own solver above), weighted scores
    thresholded at their 5th percentile; anomalous iff a flagged point
    lands in the last ``anomaly_window``.

    Reference quirks preserved: a NaN-bearing series returns
    (None, None) — the reference's backward-fill idiom assigns an
    n-length np.where into the masked slots, which RAISES in numpy and
    lands in its except; a constant series (and any solver failure)
    returns (False, 0.0) — the reference's staged try/excepts call
    return_result WITHOUT returning, so the final scores loop runs
    with empty anomaly_indices. Scope cap: n > 4000 returns
    (None, None) (three n^2 Gram matrices; the wrapper's mirage
    downsample bounds real series the same way)."""
    nu = float(params.get("oc_svm_nu", 0.05))
    anomaly_window = int(params.get("anomaly_window", 1))
    v = values.astype(np.float64)
    n = v.size
    if n < 30 or n > 4000:
        return None, None
    if np.isnan(v).any():
        return None, None
    sd = float(v.std())
    if sd == 0:
        return False, 0.0
    x = ((v - v.mean()) / sd).reshape(-1, 1)
    xf = x.ravel()
    sx, sxx = float(xf.sum()), float(xf @ xf)
    M = (2.0 * n * sxx - 2.0 * sx * sx) / (n * (n - 1))
    if np.isnan(M) or M == 0:
        gammas = [1.0, 0.5, 0.1]
    else:
        gammas = [1.0 / (2.0 * w_ * M) for w_ in (0.25, 0.5, 1)]
    cols = []
    for g in gammas:
        K = _rbf_kernel_mat(x, x, g)
        alpha, rho = _ocsvm_fit_kernel(K, nu)
        cols.append(K @ alpha - rho)
    cols.append(_iforest_scores(xf, n_trees=100, seed=42))
    Z = _nystroem_transform(x, gammas[1], 300)
    KZ = Z @ Z.T
    alpha, rho = _ocsvm_fit_kernel(KZ, nu)
    cols.append(KZ @ alpha - rho)
    cols.append(_gmm1_score_samples(xf))
    smat = np.column_stack(cols)
    with np.errstate(divide="ignore", invalid="ignore"):
        smat = (smat - smat.mean(axis=0)) / smat.std(axis=0)  # zscore
    if not np.isfinite(smat).all():
        return False, 0.0        # the reference's error-cascade path
    trimmed = np.empty_like(smat)
    for j in range(smat.shape[1]):
        col = smat[:, j]
        c = np.clip(col, np.percentile(col, 5), np.percentile(col, 95))
        cmin, cmax = float(c.min()), float(c.max())
        trimmed[:, j] = 0.0 if cmin == cmax \
            else (c - cmin) / (cmax - cmin)
    wopt = _laoccfdlpnc_weights(trimmed, mu=10.0)
    ws = trimmed @ wopt
    flags = ws < float(np.percentile(ws, 5))
    hit = bool(flags[-anomaly_window:].any())
    return hit, (1.0 if hit else 0.0)


def skyline_laoccfdlpnc(ts: np.ndarray, values: np.ndarray, params: dict):
    """skyline_laoccfdlpnc (skyline/custom_algorithms/
    skyline_laoccfdlpnc.py:62-598): sort by timestamp, determine the
    modal resolution, and for long fine-grained series (> 1600 points
    at < 600 s resolution) downsample to 600 s mean buckets exactly as
    the reference does (pandas resample origin='end' + bfill,
    functions/timeseries/downsample.py:91-93) before running the
    laoccfdlpnc kernel. The reference dispatches the kernel to its
    flux-tornado HTTP service (returning (None, None) when tornado is
    disabled); this port runs the same kernel in-process — the service
    hop is transport, not semantics."""
    order = np.argsort(ts, kind="stable")
    t = ts[order].astype(np.float64)
    v = values[order].astype(np.float64)
    n = t.size
    if n < 2:
        return None, None
    diffs = np.diff(t.astype(np.int64))
    uv, uc = np.unique(diffs, return_counts=True)
    resolution = int(uv[np.argmax(uc)]) if uv.size else 0
    if n > 1600 and resolution and resolution < 600:
        df = pd.DataFrame({"value": v},
                          index=pd.to_datetime(t, unit="s"))
        rs = df.resample("600s", origin="end").mean().bfill()
        t = rs.index.astype(np.int64).to_numpy() / 1e9
        v = rs["value"].to_numpy()
    return laoccfdlpnc(t, v, params)


# --- skyline_prophet (prophet-lite) ----------------------------------------

def _prophet_lite_fit(t: np.ndarray, y: np.ndarray,
                      changepoint_range: float,
                      n_changepoints: int = 25,
                      tau: float = 0.05):
    """Deterministic MAP fit of Prophet's piecewise-linear trend model
    (Taylor & Letham 2017; prophet's linear-growth Stan program):
    g(t) = k*t + m + sum_j delta_j * relu(t - s_j) on scaled time/value,
    with delta ~ Laplace(0, tau) (L1), k,m ~ N(0,5), sigma_obs
    half-N(0,0.5), jointly optimized.  Changepoints at prophet's
    linspace-rounded indices over the first changepoint_range of the
    history.  Solved by coordinate-descent lasso + closed-form sigma
    update (deterministic — no Stan, no sampling).  Returns
    (yhat_scaled, sigma_obs) on the scaled axis."""
    n = y.size
    hist_size = int(np.floor(n * changepoint_range))
    n_cp = n_changepoints
    if n_cp + 1 > hist_size:
        n_cp = max(hist_size - 1, 0)
    if n_cp > 0:
        cp_idx = np.unique(
            np.linspace(0, hist_size - 1, n_cp + 1).round()
            .astype(int)[1:])
        s = t[cp_idx]
    else:
        s = np.empty(0)
    A = np.column_stack([t, np.ones(n)]
                        + [np.maximum(t - sj, 0.0) for sj in s])
    p = A.shape[1]
    AtA = A.T @ A
    Aty = A.T @ y
    theta = np.zeros(p)
    sigma2 = max(float(np.var(y)), 1e-12)
    ridge = 1.0 / 25.0  # k,m ~ N(0,5)
    diag = np.diag(AtA).copy()
    for _outer in range(6):
        lam = sigma2 / tau  # L1 weight on the working least-squares scale
        for _sweep in range(300):
            max_step = 0.0
            for j in range(p):
                rho = Aty[j] - AtA[j] @ theta + diag[j] * theta[j]
                if j < 2:
                    new = rho / (diag[j] + sigma2 * ridge)
                else:
                    if rho > lam:
                        new = (rho - lam) / diag[j] if diag[j] > 0 else 0.0
                    elif rho < -lam:
                        new = (rho + lam) / diag[j] if diag[j] > 0 else 0.0
                    else:
                        new = 0.0
                max_step = max(max_step, abs(new - theta[j]))
                theta[j] = new
            if max_step < 1e-12:
                break
        resid = y - A @ theta
        rss = float(resid @ resid)
        # d/dsigma [n log s + RSS/(2s^2) + s^2/(2*0.25^2)] = 0
        # -> 8 s^4 + n s^2 - RSS = 0
        sigma2 = max((-n + np.sqrt(n * n + 32.0 * rss)) / 16.0, 1e-12)
    return A @ theta, float(np.sqrt(sigma2))


_PROPHET_FOURIER = {
    "daily_seasonality": (86400.0, 4),
    "weekly_seasonality": (604800.0, 3),
    "yearly_seasonality": (365.25 * 86400.0, 10),
}


def skyline_prophet(ts: np.ndarray, values: np.ndarray, params: dict):
    """Port of skyline/custom_algorithms/skyline_prophet.py:32-327 with
    an own deterministic prophet-lite in place of the prophet/cmdstan
    dependency (absent from this container): MAP piecewise-linear trend
    (:118-127 fit_predict_model), analytic normal predictive interval at
    ``interval_width`` instead of prophet's Monte-Carlo percentiles
    (documented deviation — deterministic by design), optional Fourier
    seasonality for the daily/weekly/yearly flags (all default False,
    :100-105).  Anomaly rule is exact (:129-144 detect_anomalies +
    :262-287): a point is anomalous when fact > yhat_upper AND
    (fact - yhat_upper) / fact > 0; the verdict is True when any such
    point lands in the last ``anomaly_window`` (default 1)."""
    from skyline_spark.functions.stats import norm_ppf
    anomaly_window = int(params.get("anomaly_window", 1))
    interval_width = float(params.get("interval_width", 0.99))
    changepoint_range = float(params.get("changepoint_range", 0.8))
    seasonality_mode = params.get("seasonality_mode", "multiplicative")
    try:
        X_all = np.asarray(ts, dtype=np.float64)
        Y_all = np.asarray(values, dtype=np.float64)
        finite = np.isfinite(Y_all) & np.isfinite(X_all)
        X = X_all[finite]  # prophet treats NaN y as missing history
        Y = Y_all[finite]
        n = Y.size
        if n < 3:
            return None, None
        span = X[-1] - X[0]
        t_sc = (X - X[0]) / span if span > 0 else np.zeros(n)
        y_scale = float(np.max(np.abs(Y)))  # prophet absmax scaling
        if y_scale == 0:
            y_scale = 1.0
        y_sc = Y / y_scale
        yhat_sc, sigma_obs = _prophet_lite_fit(
            t_sc, y_sc, changepoint_range)
        # optional Fourier seasonality on the trend residual
        fourier_cols = []
        for flag, (period, order) in _PROPHET_FOURIER.items():
            if params.get(flag, False) and span > period / 2:
                arg = 2.0 * np.pi * np.outer(X, np.arange(1, order + 1)) \
                    / period
                fourier_cols += [np.cos(arg), np.sin(arg)]
        if fourier_cols:
            F_mat = np.hstack(fourier_cols)
            if seasonality_mode == "multiplicative":
                safe = np.where(np.abs(yhat_sc) < 1e-12, 1e-12, yhat_sc)
                target = y_sc / safe - 1.0
            else:
                target = y_sc - yhat_sc
            beta = np.linalg.lstsq(
                F_mat.T @ F_mat + np.eye(F_mat.shape[1]) / 100.0,
                F_mat.T @ target, rcond=None)[0]
            seas = F_mat @ beta
            if seasonality_mode == "multiplicative":
                yhat_sc = yhat_sc * (1.0 + seas)
            else:
                yhat_sc = yhat_sc + seas
            resid = y_sc - yhat_sc
            sigma_obs = float(np.sqrt(max(np.mean(resid * resid),
                                          1e-24)))
        z = norm_ppf((1.0 + interval_width) / 2.0)
        yhat_upper = (yhat_sc + z * sigma_obs) * y_scale
        with np.errstate(divide="ignore", invalid="ignore"):
            importance = np.where(Y > yhat_upper,
                                  (Y - yhat_upper) / Y, 0.0)
        flags = np.zeros(Y_all.size, dtype=int)
        flags[finite] = ((Y > yhat_upper) & (importance > 0)).astype(int)
        anomaly_sum = int(np.sum(flags[-anomaly_window:]))
        if anomaly_sum > 0:
            return True, 1.0
        return False, 0.0
    except Exception:
        return None, None


# --- irregular_unstable -----------------------------------------------------

def _normalised_variance(values: np.ndarray) -> float:
    """irregular_unstable.py:112-126 — variance of the min-max
    normalised series, rounded to 4 places; NaN on a degenerate
    (max == min) span exactly as the reference's unguarded division
    produces."""
    with np.errstate(divide="ignore", invalid="ignore"):
        lo = float(np.min(values))
        hi = float(np.max(values))
        norm = (values - lo) / (hi - lo)
        return float(round(np.var(norm), 4))


def irregular_unstable(ts: np.ndarray, values: np.ndarray, params: dict):
    """Port of skyline/custom_algorithms/irregular_unstable.py:38-725.
    The reference refetches a 30-day window from Graphite /
    VictoriaMetrics (:340-343); in this engine the full retention window
    IS the series handed to the algorithm (the same source mapping as
    the mirage long-window second stage, SURVEY §2.1 S6), so both the
    7-day and 30-day variance gates run on the given series and the
    downsample-merge step is structurally unnecessary.  Decision flow is
    exact: resolution > 900 -> True (:273-282); duration < 5.25d ->
    True (:283-293); normalised variance 0 -> (None, None) (:318-328),
    > low_variance (0.009) -> True (:329-335); 30-day normalised
    variance >= 0.0065 -> True (:425-436); else 2-of-2 consensus over
    spectral_residual (threshold_perc 99, the +2 anomaly-window quirk at
    :476-481) and run_sigma_algorithms(sigma=3, consensus=6)
    (:617-646)."""
    low_variance = params.get("low_variance", 0.009)
    anomaly_window = int(params.get("anomaly_window", 1))
    threshold = params.get("threshold")
    threshold_perc = float(params.get("threshold_perc", 99))
    sigma_value = int(params.get("sigma", 3))
    sigma_consensus = params.get("consensus", 6)
    try:
        X = np.asarray(ts, dtype=np.float64)
        Y = np.asarray(values, dtype=np.float64)
        diffs, counts = np.unique(np.diff(X), return_counts=True)
        resolution = float(diffs[np.argmax(counts)])
        if resolution > 900:
            return True, 1.0
        if X[-1] - X[0] < 446400:
            return True, 1.0
        nv = _normalised_variance(Y)
        if not nv:  # 0.0 -> undetermined; NaN is truthy and falls through
            return None, None
        if nv > low_variance:
            return True, 1.0
        nv_long = _normalised_variance(Y)  # 30d window == this window
        if nv_long >= 0.0065:
            return True, 1.0
        consensus: list[str] = []
        sr_hit, _ = spectral_residual(X, Y, {
            "threshold": threshold, "threshold_perc": threshold_perc,
            "anomaly_window": anomaly_window,
        })
        if sr_hit:
            consensus.append("spectral_residual")
        sig_hit, _anoms = run_sigma_algorithms(
            X, Y, sigma_value, sigma_consensus, anomaly_window)
        if sig_hit:
            consensus.append("sigma")
        if len(consensus) >= 2:
            return True, 1.0
        return False, 0.0
    except Exception:
        return None, None


# --- sigma custom-algorithm source ----------------------------------------
# The reference ships a SECOND copy of the 9-algorithm suite under
# skyline/custom_algorithm_sources/sigma/{sigma,sigma_oneshot}.py with
# every threshold parameterized by sigma_value; run_sigma_algorithms
# (sigma.py:622-818) re-votes prefixes of the series over an
# anomaly_window, run_sigma_oneshot_algorithms (sigma_oneshot.py:461-602)
# scores every point in one pass over a 7-algorithm subset.  Ported
# quirk-for-quirk below (numba paths, since the reference sets
# USE_NUMBA = True).

_SIGMA_MIN_TOLERABLE_LENGTH = 100   # settings.py:541
_SIGMA_MAX_TOLERABLE_BOREDOM = 100  # settings.py:559
_SIGMA_BOREDOM_SET_SIZE = 1         # settings.py:569


def _sigma_tail_avg(Y: np.ndarray, sigma_value: int) -> float:
    """sigma.py:28-40 — ``sum(Y[-sigma_value:]) / sigma_value`` (NOT the
    mean when fewer than sigma_value points remain — quirk preserved)."""
    return float(np.sum(Y[-sigma_value:])) / sigma_value


def _numba_histogram(a: np.ndarray, bins: int = 15):
    """numpy twin of the reference's numba_histogram
    (sigma.py:396-450): equal-width edges with the LAST edge pinned to
    a_max, truncating bin index ``int(n*(x-min)/(max-min))``, x==a_max
    forced into the last bin, out-of-range values dropped."""
    a_min = float(a.min())
    a_max = float(a.max())
    delta = (a_max - a_min) / bins
    edges = a_min + delta * np.arange(bins + 1, dtype=np.float64)
    edges[-1] = a_max
    if a_max == a_min:
        hist = np.zeros(bins, dtype=np.int64)
        hist[-1] = a.size  # compute_bin: x == a_max -> bin n-1
        return hist, edges
    with np.errstate(invalid="ignore"):
        raw = bins * (a - a_min) / (a_max - a_min)
        idx = np.where(a == a_max, bins - 1,
                       raw.astype(np.int64, copy=False))
    valid = (idx >= 0) & (idx < bins) & np.isfinite(a)
    hist = np.bincount(idx[valid], minlength=bins)
    return hist, edges


def _sig_histogram_bins(X, Y, ts_list, res, series, sigma_value):
    """sigma.py:474-521 numba path (numba_histogram_bins :451-471)."""
    t = _sigma_tail_avg(Y, sigma_value)
    hist, bins = _numba_histogram(Y, 15)
    for index, bin_size in enumerate(hist):
        if bin_size <= 20:
            if index == 0:
                if t <= bins[0]:
                    return True
            elif t >= bins[index] and t < bins[index + 1]:
                return True
    return False


def _sig_first_hour_average(X, Y, ts_list, res, series, sigma_value):
    """sigma.py:166-187 — mean/sample-std of the hour FULL_DURATION ago
    (strict bounds), vs the sigma-length tail average."""
    lo = X[-1] - 86400
    hi = lo + 3600
    w = Y[(X > lo) & (X < hi)]
    if w.size == 0:
        return False  # pandas mean of empty -> NaN -> comparison False
    mean = float(np.mean(w))
    std = float(np.std(w, ddof=1)) if w.size > 1 else float("nan")
    t = _sigma_tail_avg(Y, sigma_value)
    return bool(abs(t - mean) > sigma_value * std)


def _sig_stddev_from_average(X, Y, ts_list, res, series, sigma_value):
    """sigma.py:199-220 — full-series mean/sample-std vs tail average."""
    mean = float(series.mean())
    std = float(series.std())
    t = _sigma_tail_avg(Y, sigma_value)
    return bool(abs(t - mean) > sigma_value * std)


def _sig_grubbs(X, Y, ts_list, res, series, sigma_value):
    """sigma.py:124-164 — one-sided Grubbs on the tail average with
    sample std and the exact t-ISF critical value."""
    from skyline_spark.functions.stats import t_isf
    std = float(series.std())
    if std == 0 or np.isnan(std):
        return False
    n = len(series)
    if n < 3:
        return False  # scipy t.isf(df<=0) -> nan -> comparison False
    mean = float(np.mean(series))
    t = _sigma_tail_avg(Y, sigma_value)
    z = (t - mean) / std
    thr = t_isf(0.05 / (2 * n), n - 2)
    g = ((n - 1) / np.sqrt(n)) * np.sqrt(thr * thr / (n - 2 + thr * thr))
    return bool(z > g)


def _sig_ks_test(X, Y, ts_list, res, series, sigma_value):
    """sigma.py:523-571 — KS(last hour vs last 10 min) + ADF gate, with
    the >60s-resolution window rescale and the constant-reference
    guard."""
    from skyline_spark.functions.stats import adfuller_pvalue, ks_2samp
    hour_ago = X[-1] - 3600
    ten_ago = X[-1] - 600
    if res > 60:
        hour_ago = X[-1] - res * 60
        ten_ago = X[-1] - res * 10
    ref = Y[(X >= hour_ago) & (X < ten_ago)]
    probe = Y[X >= ten_ago]
    if ref.size < 20 or probe.size < 20:
        return False
    if np.all(ref == ref[0]):
        return False
    d, p = ks_2samp(ref, probe)
    if p < 0.05 and d > 0.5:
        if adfuller_pvalue(ref, 10) < 0.05:
            return True
    return False


def _sig_mean_subtraction_cumulation(X, Y, ts_list, res, series,
                                     sigma_value):
    """sigma.py:246-260 numba path — population std of the
    mean-subtracted head and a HARDCODED 3x threshold (the numba
    function takes sigma_value but never uses it — quirk preserved)."""
    y = np.where(Y == 0, 0.0, Y)  # reference: x if x else 0
    out = y - float(np.mean(y[:-1]))
    std = float(np.std(out[:-1]))
    return bool(abs(out[-1]) > 3 * std)


def _sig_median_absolute_deviation(X, Y, ts_list, res, series,
                                   sigma_value):
    """sigma.py:44-66 numba path — last-point deviation over the median
    deviation, threshold sigma_value * 2."""
    median = float(np.median(Y))
    dem = np.abs(Y - median)
    md = float(np.median(dem))
    if md == 0:
        return False
    return bool(dem[-1] / md > sigma_value * 2)


def _sig_stddev_from_moving_average(X, Y, ts_list, res, series,
                                    sigma_value):
    """sigma.py:222-241 — pandas ewm(com=50, adjust=True) mean/std
    (bias=False), last values only, so computed closed-form in numpy
    exactly as functions/algorithms.py:146 does (equal to pandas within
    ~1e-14)."""
    import math
    v = Y[-8192:]
    n = v.size
    if n < 2:
        return False
    a = 1.0 / 51.0
    w = np.power(1.0 - a, np.arange(n - 1, -1, -1, dtype=np.float64))
    sw = float(w.sum())
    exp_average = float(np.dot(w, v)) / sw
    sw2 = float(np.dot(w, w))
    denom = sw * sw - sw2
    if denom <= 0:
        return False
    var = (float(np.dot(w, (v - exp_average) ** 2)) / sw) \
        * (sw * sw / denom)
    std = math.sqrt(var)
    if math.isnan(std):
        return False
    return bool(abs(Y[-1] - exp_average) > sigma_value * std)


def _sig_least_squares(X, Y, ts_list, res, series, sigma_value):
    """sigma.py:306-394 — OLS residuals (rcond=-1), sigma-length tail
    mean of the errors vs sigma * sample std, with the round()!=0
    guards."""
    A = np.vstack([X, np.ones(len(X))]).T
    m, c = np.linalg.lstsq(A, Y, rcond=-1)[0]
    errors = Y - (m * X + c)
    if errors.size < sigma_value:
        return False
    std = float(pd.Series(errors).std())
    t = float(np.sum(errors[-sigma_value:])) / sigma_value
    return bool(abs(t) > std * sigma_value
                and round(std) != 0 and round(t) != 0)


# settings.py:820-830 ALGORITHMS order — early exit depends on it.
_SIGMA_SUITE = [
    ("histogram_bins", _sig_histogram_bins),
    ("first_hour_average", _sig_first_hour_average),
    ("stddev_from_average", _sig_stddev_from_average),
    ("grubbs", _sig_grubbs),
    ("ks_test", _sig_ks_test),
    ("mean_subtraction_cumulation", _sig_mean_subtraction_cumulation),
    ("median_absolute_deviation", _sig_median_absolute_deviation),
    ("stddev_from_moving_average", _sig_stddev_from_moving_average),
    ("least_squares", _sig_least_squares),
]


def _sigma_gates(Y: np.ndarray) -> bool:
    """run_sigma_algorithms entry gates (sigma.py:640-650)."""
    if Y.size == 0 or Y.size < _SIGMA_MIN_TOLERABLE_LENGTH:
        return False
    tail = Y[-_SIGMA_MAX_TOLERABLE_BOREDOM:]
    if len(set(tail.tolist())) == _SIGMA_BOREDOM_SET_SIZE:
        return False
    return True


def _sigma_resolution(X: np.ndarray) -> float:
    """Most-common timestamp delta (sigma.py:668-671)."""
    diffs, counts = np.unique(np.diff(X), return_counts=True)
    return float(diffs[np.argmax(counts)])


def _sigma_vote(X, Y, ts_list, res, sigma_value, consensus,
                algorithms: tuple | None = None):
    """One ensemble pass with the maximum-false early exit
    (sigma.py:672-744).  Returns (anomaly, algorithms_run).
    ``algorithms`` restricts the suite (the settings.ALGORITHMS
    analogue — maximum_false_count scales with the restricted
    length, exactly as the reference derives it from len(ALGORITHMS))."""
    series = pd.Series(Y)
    suite = [(n, f) for n, f in _SIGMA_SUITE
             if algorithms is None or n in algorithms]
    max_false = len(suite) - consensus + 1
    ensemble: list[bool | None] = []
    algorithms_run: dict[str, bool | None] = {}
    consensus_possible = True
    for name, fn in suite:
        if not consensus_possible:
            continue
        try:
            r = fn(X, Y, ts_list, res, series, sigma_value)
            failed = False
        except Exception:
            r = None
            failed = True
        algorithms_run[name] = None if failed else bool(r)
        if r:
            result: bool | None = True
        elif r is None:
            result = None  # in-algorithm error path returns None
        else:
            result = False
        ensemble.append(result)
        if ensemble.count(False) >= max_false:
            consensus_possible = False
    # sigma.py:735-741: the count(False) branch is overridden by the
    # count(True) checks, so the decision reduces to this.
    anomaly = ensemble.count(True) >= consensus
    return anomaly, ensemble, algorithms_run


#: the SQL-expressible 8 of the suite (everything but ks_test), in
#: settings.ALGORITHMS order — the sigma_vote_sql8 oracle restriction
SIGMA_SQL8_ALGORITHMS = (
    "histogram_bins", "first_hour_average", "stddev_from_average",
    "grubbs", "mean_subtraction_cumulation",
    "median_absolute_deviation", "stddev_from_moving_average",
    "least_squares")


def sigma_vote_flags(ts: np.ndarray, values: np.ndarray,
                     sigma_value: int = 3, consensus: int = 6,
                     algorithms: tuple | None = None):
    """Oracle/test surface: the run_sigma_algorithms entry gates + ONE
    ensemble pass (no anomaly-window prefix loop), returning
    (gated, anomaly, algorithms_run) so per-algorithm flags are
    observable even on non-anomalous series.  Not-run algorithms
    (post-early-exit) are simply absent from algorithms_run."""
    X = np.asarray(ts, dtype=np.float64)
    Y = np.asarray(values, dtype=np.float64)
    if not _sigma_gates(Y):
        return True, False, {}
    res = _sigma_resolution(X)
    anomaly, _ensemble, algos = _sigma_vote(
        X, Y, None, res, sigma_value, consensus, algorithms)
    return False, anomaly, algos


def run_sigma_algorithms(ts: np.ndarray, values: np.ndarray,
                         sigma_value: int, consensus: int,
                         anomaly_window: int):
    """Port of run_sigma_algorithms (sigma.py:622-818): entry gates,
    a prefix re-vote per window position when anomaly_window > 1 (the
    prefix EXCLUDES the trailing |i| points; resolution stays the
    full-series one), then the full-series vote; returns
    (bool(anomalies), anomalies)."""
    anomalies: dict[int, dict] = {}
    X = np.asarray(ts, dtype=np.float64)
    Y = np.asarray(values, dtype=np.float64)
    if not _sigma_gates(Y):
        return False, anomalies
    try:
        res = _sigma_resolution(X)
        n = Y.size
        if anomaly_window > 1:
            for i in range(-anomaly_window, 0):
                anomaly, ensemble, algos = _sigma_vote(
                    X[:i], Y[:i], None, res, sigma_value, consensus)
                if anomaly:
                    idx = n - 1 + i
                    anomalies[int(X[idx])] = {
                        "anomalous": True,
                        "anomalyScore": ensemble.count(True) / len(algos),
                        "index": idx,
                        "value": float(Y[idx]),
                        "algorithms_results": algos,
                        "score": 1,
                    }
        anomaly, ensemble, algos = _sigma_vote(
            X, Y, None, res, sigma_value, consensus)
        if anomaly:
            anomalies[int(X[-1])] = {
                "anomalous": True,
                "anomalyScore": ensemble.count(True) / len(algos),
                "index": n - 1,
                "value": float(Y[-1]),
                "algorithms_results": algos,
                "score": 1,
            }
    except Exception:
        return False, anomalies
    return len(anomalies) > 0, anomalies


# --- oneshot per-point variants (sigma_oneshot.py) -------------------------

def _osh_histogram_bins(X, Y, series, sigma_value, tail_avgs):
    """sigma_oneshot.py:375-402 — per-point bin membership of the
    rolling tail average."""
    hist, bins = _numba_histogram(Y, 15)
    rare = [(i, hist[i]) for i in range(len(hist)) if hist[i] <= 20]
    scores = []
    for t in tail_avgs:
        score = 0
        for bin_index, _ in rare:
            if bin_index == 0:
                if t <= bins[0]:
                    score = 1
            elif t >= bins[bin_index] and t < bins[bin_index + 1]:
                score = 1
        scores.append(score)
    return scores


def _osh_stddev_from_average(X, Y, series, sigma_value, tail_avgs):
    """sigma_oneshot.py:145-166 — POPULATION std here (np.std), unlike
    the windowed path's sample std — quirk preserved."""
    mean = float(np.mean(Y))
    std = float(np.std(Y))
    return [1 if abs(t - mean) > sigma_value * std else 0
            for t in tail_avgs]


def _osh_grubbs(X, Y, series, sigma_value, tail_avgs):
    """sigma_oneshot.py:108-134 — per-point z of the rolling tail
    average; empty scores when std == 0 (propagates to a suite-wide
    None, see run_sigma_oneshot_algorithms)."""
    from skyline_spark.functions.stats import t_isf
    std = float(series.std())
    if std == 0 or np.isnan(std):
        return []
    n = len(series)
    if n < 3:
        return []
    mean = float(np.mean(series))
    thr = t_isf(0.05 / (2 * n), n - 2)
    g = ((n - 1) / np.sqrt(n)) * np.sqrt(thr * thr / (n - 2 + thr * thr))
    return [1 if (t - mean) / std > g else 0 for t in tail_avgs]


def _osh_mean_subtraction_cumulation(X, Y, series, sigma_value,
                                     tail_avgs):
    """sigma_oneshot.py:211-241 — head-sample-std of the mean-subtracted
    series but scored against the RAW value (the reference compares
    ``series.iat[index]``, not the subtracted series — quirk
    preserved)."""
    use = np.where(Y == 0, 0.0, Y)
    head_mean = float(np.mean(use[:-1])) if use.size > 1 else float("nan")
    out = use - head_mean
    std = float(pd.Series(out[:-1]).std())
    return [1 if abs(float(series.iat[i])) > sigma_value * std else 0
            for i in range(Y.size)]


def _osh_median_absolute_deviation(X, Y, series, sigma_value, tail_avgs):
    """sigma_oneshot.py:61-106 — per-point deviation ratio; empty when
    the median deviation is 0; NaN / zero deviations score 0."""
    median = float(series.median())
    dem = np.abs(Y - median)
    md = float(pd.Series(dem).median())  # pandas median: NaN-skipping
    if md == 0:
        return []
    thr = sigma_value * 2
    return [1 if (not np.isnan(d)) and d != 0 and d / md > thr else 0
            for d in dem]


def _osh_stddev_from_moving_average(X, Y, series, sigma_value,
                                    tail_avgs):
    """sigma_oneshot.py:169-190 — full pandas ewm series, per point."""
    exp_avg = series.ewm(ignore_na=False, min_periods=0, adjust=True,
                         com=50).mean()
    std = series.ewm(ignore_na=False, min_periods=0, adjust=True,
                     com=50).std(bias=False)
    flags = (np.abs(series.to_numpy() - exp_avg.to_numpy())
             > sigma_value * std.to_numpy())
    return [1 if f else 0 for f in flags]


def _osh_least_squares(X, Y, series, sigma_value, tail_avgs):
    """sigma_oneshot.py:262-297 — per-point trailing-error mean
    EXCLUDING the current point (empty slice -> t=0 for the first
    sigma_value points), and the reference's precedence quirk
    ``(abs(t) > std_dev) * sigma_value`` which reduces the sigma
    multiplier to a truthiness factor — preserved."""
    A = np.vstack([X, np.ones(len(X))]).T
    m, c = np.linalg.lstsq(A, Y, rcond=-1)[0]
    errors = (Y - (m * X + c)).tolist()
    if len(errors) < sigma_value:
        return [0] * Y.size
    std = float(pd.Series(errors).std())
    scores = []
    for index in range(Y.size):
        start = index - sigma_value
        window = errors[start:index] if start >= 0 else []
        t = sum(window) / sigma_value
        hit = ((abs(t) > std) * sigma_value) \
            and round(std) != 0 and round(t) != 0
        scores.append(1 if hit else 0)
    return scores


# sigma_oneshot.py:496-506 USE_ALGORITHMS (first_hour_average and
# ks_test commented out in the reference).
_SIGMA_ONESHOT_SUITE = [
    ("histogram_bins", _osh_histogram_bins),
    ("stddev_from_average", _osh_stddev_from_average),
    ("grubbs", _osh_grubbs),
    ("mean_subtraction_cumulation", _osh_mean_subtraction_cumulation),
    ("median_absolute_deviation", _osh_median_absolute_deviation),
    ("stddev_from_moving_average", _osh_stddev_from_moving_average),
    ("least_squares", _osh_least_squares),
]


def oneshot_score_vectors(ts: np.ndarray, values: np.ndarray,
                          sigma_value: int) -> dict[str, list] | None:
    """The per-point score vectors of the oneshot pass
    (sigma_oneshot.py:526-552) — also the sigma_oneshot_sql oracle
    surface.  None when the entry gates fail OR any algorithm yields an
    empty vector (the reference's KeyError -> outer-except collapse,
    :558-561)."""
    X = np.asarray(ts, dtype=np.float64)
    Y = np.asarray(values, dtype=np.float64)
    if not _sigma_gates(Y):
        return None
    series = pd.Series(Y)
    tail_avgs = series.rolling(3, min_periods=1).mean().to_numpy()
    results: dict[str, list] = {}
    for name, fn in _SIGMA_ONESHOT_SUITE:
        try:
            scores = [float(s) for s in
                      fn(X, Y, series, sigma_value, tail_avgs)]
        except Exception:
            scores = []
        if not scores:
            return None
        results[name] = scores
    return results


def run_sigma_oneshot_algorithms(ts: np.ndarray, values: np.ndarray,
                                 sigma_value: int, consensus: int,
                                 anomaly_window: int):
    """Port of run_sigma_oneshot_algorithms (sigma_oneshot.py:461-602):
    per-point score vectors for 7 algorithms, per-point consensus
    (anomalies recorded at >= consensus), but the anomalous flag
    requires a consensus_score >= 1 in the last window — i.e. ALL seven
    algorithms triggering (the reference's score>=1 quirk, :586).
    Gates return (None, 0.0, {}); any algorithm yielding an empty score
    vector collapses the whole pass to (None, 0.0, {}) via the
    reference's KeyError path (:558-561 -> outer except)."""
    X = np.asarray(ts, dtype=np.float64)
    Y = np.asarray(values, dtype=np.float64)
    anomalies: dict[int, dict] = {}
    try:
        results = oneshot_score_vectors(X, Y, sigma_value)
        if results is None:
            return None, 0.0, anomalies
        names = [n for n, _ in _SIGMA_ONESHOT_SUITE]
        consensus_scores = []
        for index in range(Y.size):
            triggered = [n for n in names
                         if index < len(results[n])
                         and results[n][index] > 0]
            score = len(triggered) / len(names) if triggered else 0
            consensus_scores.append(score)
            if len(triggered) >= consensus:
                anomalies[int(X[index])] = {
                    "anomalous": True,
                    "anomalyScore": score,
                    "index": index,
                    "value": float(Y[index]),
                    "algorithms_results":
                        {n: (n in triggered) for n in names},
                    "score": 1,
                }
        in_window = len([s for s in consensus_scores[-anomaly_window:]
                         if s >= 1])
        if in_window:
            return True, 1.0, anomalies
        return False, 0.0, anomalies
    except Exception:
        return None, 0.0, anomalies


SHIPPED = {
    "sigma": sigma, "level_shift": level_shift, "iqr_outlier": iqr_outlier,
    "abs_stddev_from_median": abs_stddev_from_median,
    "single_value_anomaly": single_value_anomaly,
    "m66": m66, "macd": macd, "spectral_entropy": spectral_entropy,
    "significant_change_window_percent_sustained":
        significant_change_window_percent_sustained,
    "median_absolute_deviation": custom_median_absolute_deviation,
    "lad": lad, "last_same_hours": last_same_hours,
    "spectral_residual": spectral_residual,
    "lof": lof, "isolation_forest": isolation_forest,
    "anomalous_daily_peak": anomalous_daily_peak, "dbscan": dbscan,
    "low_variance_anomalous_peak_trough": low_variance_anomalous_peak_trough,
    "pca": pca,
    "adtk_persist": adtk_persist,
    "adtk_volatility_shift": adtk_volatility_shift,
    "moving_sum_decrease": moving_sum_decrease,
    "moving_sum_and_value_decrease": moving_sum_and_value_decrease,
    "adtk_level_shift": adtk_level_shift,
    "skyline_matrixprofile": skyline_matrixprofile,
    "adtk_seasonal": adtk_seasonal,
    "probabilistic_forecasts_gpd_ets": probabilistic_forecasts_gpd_ets,
    "mstl": mstl,
    "skyline_tsb_uad_pca": skyline_tsb_uad_pca,
    "mmzrmp": mmzrmp,
    "one_class_svm": one_class_svm,
    "skyline_tsb_uad_ocsvm": skyline_tsb_uad_ocsvm,
    "laoccfdlpnc": laoccfdlpnc,
    "skyline_laoccfdlpnc": skyline_laoccfdlpnc,
    "skyline_prophet": skyline_prophet,
    "irregular_unstable": irregular_unstable,
    "azure_ai_anomalydetector": azure_ai_anomalydetector,
    "grafana_promql_anomaly_detection": grafana_promql_anomaly_detection,
}
