"""Luminosity metric / anomaly classification — the level-shift and
volatility-shift population sweeps and the per-anomaly type
classification.

Reference parity:

- ``classify_metrics`` re-expresses
  skyline/luminosity/classify_metrics.py:58-1191 (the realtime
  sweep): per metric, adtk LevelShiftAD (window=10, c=9.9) with a
  companion PersistAD pass (window=60, c=9.9,
  adtk_level_shift.py:924-975), then
  ``check_significant_level_shift`` (classify_metrics.py:100-290):
  resolution = most-common diff of the last 30 timestamps
  (Counter.most_common first-inserted tie-break), anomaly timestamps
  grouped into continuous periods (consecutive = exactly one
  resolution apart); without persist anomalies a metric is a
  level-shift metric iff it shifted in at most 2 periods and one
  lasted >= ``significant_length`` points; with persist anomalies the
  reference walks level-shift timestamps shared with the persist set
  (classify_metrics.py:226-276) — the walk's un-reset
  ``last_p_timestamp`` means only the FIRST shared timestamp's
  consecutive persist run can ever grow (every later period stays a
  singleton), so significance reduces to that first run reaching
  ``significant_length`` (quirk kept, pinned by the literal-walk
  property test). adtk VolatilityShiftAD (window=5, c=9.9,
  classify_metrics.py:1005-1120) classifies a volatility-shift metric
  iff its anomalies span at most 2 continuous periods, triggered at
  the LAST period start (the reference loop leaves the last key).
  The Redis TTL / processing-key / per-run budget scheduling
  (classify_metrics.py:66-456) is work-queue plumbing the batch scan
  replaces; the 90-day Graphite long-term back-walk
  (classify_metrics.py:556-790) is the same kernel re-run over
  7-day slices with significant_length=3 and is subsumed by running
  the full series.
- ``classify_anomalies`` re-expresses
  skyline/luminosity/classify_anomalies.py:69-584: per recorded
  anomaly, run the LUMINOSITY_CLASSIFY_ANOMALY_ALGORITHMS suite
  (settings.py:3915 — adtk_level_shift, adtk_volatility_shift,
  adtk_persist, adtk_seasonal) at window=5, c=6.0 over the anomaly's
  training window and call an algorithm triggered when it flags a
  point inside the last ``window`` timestamps
  (classify_anomalies.py:305-330 walks the reversed anomaly list —
  equivalent to any-flag-in-last-window); the triggered names become
  the anomaly's types (classify_anomalies.py:339-349). The MySQL
  anomaly_types/anomalies_type bookkeeping is the sink the output
  DataFrame replaces.

Scale: both sweeps ride the standard single per-series exchange (one
``applyInPandas`` after a narrow projection); ``classify_anomalies``
fans each series to its anomaly windows with a broadcast of the
anomaly list (anomaly-cardinality, config-sized per series). No
shuffle beyond the one per-series exchange; kernels are O(n·window)
numpy.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.custom_algorithms import (
    _double_rolling_iqr_detect,
    _rolling_agg,
)

__all__ = [
    "metric_resolution",
    "continuous_periods",
    "persist_walk",
    "persist_walk_closed",
    "significant_level_shift",
    "classify_metrics",
    "classify_anomalies",
    "CLASSIFY_ANOMALY_ALGORITHMS",
]

#: settings.LUMINOSITY_CLASSIFY_ANOMALY_ALGORITHMS (settings.py:3915)
CLASSIFY_ANOMALY_ALGORITHMS = (
    "adtk_level_shift", "adtk_volatility_shift", "adtk_persist",
    "adtk_seasonal",
)


def metric_resolution(e: np.ndarray) -> int:
    """Most-common diff of the last 30 timestamps
    (classify_metrics.py:102-130): Counter.most_common with its
    insertion-order tie-break — the FIRST-encountered diff wins among
    equal counts."""
    tail = e[-30:]
    if tail.size < 2:
        return 0
    diffs = np.diff(tail)
    return int(Counter(diffs.tolist()).most_common(1)[0][0])


def continuous_periods(ts: list[int], resolution: int) -> list[list[int]]:
    """Group anomaly timestamps into continuous periods — consecutive
    means exactly one resolution apart (classify_metrics.py:132-151)."""
    periods: list[list[int]] = []
    last = None
    for t in ts:
        if last is not None and t - resolution == last:
            periods[-1].append(t)
        else:
            periods.append([t])
        last = t
    return periods


def persist_walk(level_ts: list[int], persist_ts: list[int],
                 resolution: int,
                 significant_length: int) -> tuple[bool, int | None]:
    """The LITERAL reference walk over level-shift timestamps shared
    with the PersistAD set (classify_metrics.py:226-290), un-reset
    ``last_p_timestamp`` quirk and all. Returns (significant,
    first_significant_timestamp)."""
    persist_set = set(persist_ts)
    periods: dict[int, list[int]] = {}
    last_p = None
    for t in level_ts:
        if t not in persist_set:
            continue
        if last_p is not None and t < last_p:
            continue
        periods[t] = [t]
        if last_p is None:
            last_p = t
        for p in persist_ts:
            if p < t:
                continue
            if p - resolution == last_p:
                periods[t].append(p)
                last_p = p
    significant = [t for t, run in periods.items()
                   if len(run) >= significant_length]
    if significant:
        return True, significant[0]
    return False, None


def persist_walk_closed(level_ts: list[int], persist_ts: list[int],
                        resolution: int,
                        significant_length: int
                        ) -> tuple[bool, int | None]:
    """Closed form of :func:`persist_walk` (the SQL twin's shape):
    only the first shared timestamp's consecutive persist run can
    grow — later periods are always singletons — so significance is
    that run reaching ``significant_length`` (or any shared timestamp
    when significant_length <= 1)."""
    persist_set = set(persist_ts)
    shared = [t for t in level_ts if t in persist_set]
    if not shared:
        return False, None
    s1 = shared[0]
    run = 1
    last = s1
    for p in persist_ts:
        if p <= s1:
            continue
        if p - resolution == last:
            run += 1
            last = p
        elif p > last:
            break
    if run >= significant_length:
        # run starts at 1, so significant_length <= 1 always lands here:
        # every singleton period qualifies, and the first period starts
        # at the first shared timestamp either way
        return True, s1
    return False, None


def significant_level_shift(level_ts: list[int], persist_ts: list[int],
                            resolution: int, significant_length: int
                            ) -> tuple[bool, int | None, int]:
    """check_significant_level_shift (classify_metrics.py:100-290):
    returns (significant, triggered_timestamp, n_level_periods). The
    level-anomaly period count is computed on the level timestamps
    regardless of branch (the reference builds it before checking for
    persist anomalies)."""
    periods = continuous_periods(level_ts, resolution)
    n_periods = len(periods)
    if not level_ts:
        return False, None, 0
    if persist_ts:
        sig, ts = persist_walk(level_ts, persist_ts, resolution,
                               significant_length)
        return sig, ts, n_periods
    if n_periods <= 2:
        for p in periods:
            if len(p) >= significant_length:
                return True, p[0], n_periods
    return False, None, n_periods


def _iqr_flag_ts(e: np.ndarray, v: np.ndarray, left_w: int, right_w: int,
                 c: float, agg: str, min_len: int) -> list[int]:
    """Anomaly timestamps of the adtk DoubleRollingAggregate + IQR
    pipeline, empty below the kernel's minimum length (the wrapper's
    TooShort path)."""
    if v.size < min_len:
        return []
    flags = _double_rolling_iqr_detect(v, left_w, right_w, c, "both", agg)
    return [int(t) for t in e[flags]]


def _std_shift_flags(v: np.ndarray, w: int, c: float,
                     decimals: int = 10) -> np.ndarray:
    """VolatilityShiftAD flags with the |Δstd| series rounded to
    ``decimals`` before the IQR fence — an oracle-stability
    determinization: numpy's two-pass std yields an exact 0 on
    constant windows where a streaming stddev_pop leaves ~1e-14
    residue, and on LKV-filled grids the zero-IQR threshold makes
    ``d > 0`` flip between engines on mathematically equal windows
    (the classify_metrics_longterm week slices hit this). The verdict
    is unchanged at any plausible fence multiplier."""
    n = v.size
    left = np.roll(_rolling_agg(v, w, "std"), 1)
    left[0] = np.nan
    right = np.full(n, np.nan)
    ra = _rolling_agg(v, w, "std")
    right[:n - w + 1] = ra[w - 1:]
    diff = np.round(np.abs(right - left), decimals)
    fin = diff[np.isfinite(diff)]
    if fin.size == 0:
        return np.zeros(n, dtype=bool)
    q1, q3 = np.percentile(fin, [25, 75])
    thr = q3 + c * (q3 - q1)
    with np.errstate(invalid="ignore"):
        return np.nan_to_num(diff, nan=-np.inf) > thr


def _std_shift_flag_ts(e: np.ndarray, v: np.ndarray, w: int, c: float,
                       min_len: int) -> list[int]:
    if v.size < min_len:
        return []
    return [int(t) for t in e[_std_shift_flags(v, w, c)]]


def _prep(pdf: pd.DataFrame) -> pd.DataFrame:
    """sort by (epoch, turn order), keep the FIRST point per epoch —
    the Redis-series contract every classify input honours (T1+T2)."""
    pdf = pdf.sort_values(["__e", "turn_idx"], kind="stable")
    return pdf.drop_duplicates(subset="__e", keep="first")


_CLASSIFY_METRICS_SCHEMA = (
    "conv_id string, metric string, n_points int, resolution bigint, "
    "n_level_anomalies int, n_level_periods int, n_persist_anomalies int, "
    "level_shift boolean, level_shift_timestamp bigint, "
    "n_volatility_anomalies int, n_volatility_periods int, "
    "volatility_shift boolean, volatility_shift_timestamp bigint")


def classify_series(e: np.ndarray, v: np.ndarray, window: int = 10,
                    c: float = 9.9, persist_window: int = 60,
                    persist_c: float = 9.9, volatility_window: int = 5,
                    volatility_c: float = 9.9,
                    sig_len: int = 10) -> dict:
    """The pure per-series classify_metrics decision (sorted, deduped
    epoch/value arrays in, one result record out) — shared by the batch
    kernel below and the streaming twin
    (skyline_spark.streaming.classify)."""
    n = int(v.size)
    res = metric_resolution(e)

    level_ts = _iqr_flag_ts(e, v, window, window, c, "median",
                            2 * window + 1)
    # PersistAD only runs after LevelShiftAD found anomalies
    # (adtk_level_shift.py:924: `if len(anomalies) > 0 and
    # run_PersistAD`)
    persist_ts: list[int] = []
    if level_ts:
        persist_ts = _iqr_flag_ts(e, v, persist_window, 1, persist_c,
                                  "median", persist_window + 1)
    level_sig, level_trig, n_level_periods = significant_level_shift(
        level_ts, persist_ts, res, sig_len)

    vol_ts = _std_shift_flag_ts(e, v, volatility_window, volatility_c,
                                2 * volatility_window + 1)
    vol_periods = continuous_periods(vol_ts, res)
    vol_sig = bool(vol_ts) and len(vol_periods) <= 2
    vol_trig = vol_periods[-1][0] if vol_sig else None

    return {
        "n_points": n,
        "resolution": int(res),
        "n_level_anomalies": len(level_ts),
        "n_level_periods": int(n_level_periods),
        "n_persist_anomalies": len(persist_ts),
        "level_shift": bool(level_sig),
        "level_shift_timestamp": level_trig,
        "n_volatility_anomalies": len(vol_ts),
        "n_volatility_periods": len(vol_periods),
        "volatility_shift": bool(vol_sig),
        "volatility_shift_timestamp": vol_trig,
    }


def classify_metrics(parsed: DataFrame, window: int = 10, c: float = 9.9,
                     persist_window: int = 60, persist_c: float = 9.9,
                     volatility_window: int = 5,
                     volatility_c: float = 9.9,
                     significant_length: int | None = None) -> DataFrame:
    """Per-series level-shift / volatility-shift classification —
    the classify_metrics decision surface (one row per series)."""
    sig_len = window if significant_length is None else significant_length

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _prep(pdf)
        e = pdf["__e"].to_numpy(np.int64)
        v = pdf["value"].to_numpy(np.float64)
        rec = classify_series(e, v, window, c, persist_window, persist_c,
                              volatility_window, volatility_c, sig_len)
        return pd.DataFrame([{
            "conv_id": pdf["conv_id"].iloc[0],
            "metric": pdf["metric"].max(),
            **rec,
        }])

    cols = set(parsed.columns)
    proj = parsed.where(F.col("value").isNotNull()).select(
        "conv_id",
        (F.col("metric") if "metric" in cols else F.lit("")).alias("metric"),
        (F.col("turn_idx") if "turn_idx" in cols
         else F.lit(0)).alias("turn_idx"),
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("__e"),
        "value")
    return proj.groupBy("conv_id").applyInPandas(
        kernel, schema=_CLASSIFY_METRICS_SCHEMA)


def _acf_seasonal_flags(v: np.ndarray, c: float) -> np.ndarray | None:
    """adtk_seasonal's flag vector (custom_algorithms.adtk_seasonal
    body, exposed per-point): strongest significant ACF local maximum
    -> per-phase mean pattern -> residual IQR fence. None when no
    period is detectable (the caught-fit-failure path)."""
    n = v.size
    x = v - v.mean()
    denom = float(np.dot(x, x))
    if denom == 0:
        return None
    acf = np.correlate(x, x, "full")[n - 1:] / denom
    sig_level = 2.0 / np.sqrt(n)
    cands = [k for k in range(2, n // 2)
             if acf[k] >= acf[k - 1] and acf[k] >= acf[k + 1]
             and acf[k] > sig_level]
    if not cands:
        return None
    period = max(cands, key=lambda k: acf[k])
    phase = np.arange(n) % period
    pattern = np.array([v[phase == p].mean() for p in range(period)])
    resid = v - pattern[phase]
    q1, q3 = np.percentile(resid, [25, 75])
    iqr = q3 - q1
    return (resid > q3 + c * iqr) | (resid < q1 - c * iqr)


_CLASSIFY_ANOMALIES_SCHEMA = (
    "conv_id string, anomaly_e bigint, n_points int, "
    "adtk_level_shift boolean, adtk_volatility_shift boolean, "
    "adtk_persist boolean, adtk_seasonal boolean, anomaly_types string")


def classify_anomaly_slice(v: np.ndarray, window: int = 5,
                           c: float = 6.0) -> dict:
    """The pure per-anomaly type decision over the (sorted, deduped)
    training-window values at or before the anomaly — shared by the
    batch kernel below and the streaming twin
    (skyline_spark.streaming.classify)."""
    n = int(v.size)

    def hit(flags: np.ndarray | None) -> bool:
        if flags is None:
            return False
        return bool(flags[-window:].any())

    results = {
        "adtk_level_shift": False, "adtk_volatility_shift": False,
        "adtk_persist": False, "adtk_seasonal": False,
    }
    if n >= 2 * window + 1:
        results["adtk_level_shift"] = hit(_double_rolling_iqr_detect(
            v, window, window, c, "both", "median"))
        results["adtk_volatility_shift"] = hit(
            _std_shift_flags(v, window, c))
    if n >= window + 1:
        results["adtk_persist"] = hit(_double_rolling_iqr_detect(
            v, window, 1, c, "both", "median"))
    if n >= 20:
        results["adtk_seasonal"] = hit(_acf_seasonal_flags(v, c))
    types = ",".join(a for a in CLASSIFY_ANOMALY_ALGORITHMS
                     if results[a])
    return {"n_points": n, **results, "anomaly_types": types}


def classify_anomalies(parsed: DataFrame, anomalies: DataFrame,
                       window: int = 5, c: float = 6.0) -> DataFrame:
    """Per-anomaly type classification: for each (conv_id, anomaly_e)
    run the four-algorithm suite over the series points at or before
    the anomaly (the training-data window) and report which triggered
    inside the last ``window`` timestamps. ``anomaly_types`` is the
    comma-joined triggered subset in settings order (empty string =
    classified as no specific type, the results_recorded path)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _prep(pdf)
        return pd.DataFrame([{
            "conv_id": pdf["conv_id"].iloc[0],
            "anomaly_e": int(pdf["anomaly_e"].iloc[0]),
            **classify_anomaly_slice(
                pdf["value"].to_numpy(np.float64), window, c),
        }])

    proj = parsed.where(F.col("value").isNotNull()).select(
        "conv_id", "turn_idx",
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("__e"),
        "value")
    anoms = anomalies.select("conv_id",
                             F.col("anomaly_e").cast("long")
                             .alias("anomaly_e"))
    sliced = proj.join(F.broadcast(anoms), "conv_id") \
        .where(F.col("__e") <= F.col("anomaly_e"))
    return sliced.groupBy("conv_id", "anomaly_e").applyInPandas(
        kernel, schema=_CLASSIFY_ANOMALIES_SCHEMA)
