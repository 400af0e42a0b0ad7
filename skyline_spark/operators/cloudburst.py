"""Luminosity cloudburst detection — the two-stage m66 changepoint
flow of skyline/luminosity/cloudburst.py:128-1100 (Feature #4164,
``find_cloudbursts``), re-expressed over the transcripts series.

Stages, each cited:

- Stage 1 (short period, cloudburst.py:354-710): per series at native
  resolution (timestamps aligned ``ts // res * res``), run m66
  (nth_median=6, sigma=6, window 5/4/3 by resolution <= 60 / > 60 /
  > 600) and keep series with a persisted anomaly run inside the last
  ``check_last`` = 4 h (+ 30 min when res > 60, + 1 h when res > 600).
  The m66 gates replayed from custom_algorithms/m66.py:407-700:
  metric resolution = the most-common delta of the LAST 30 points
  (Counter.most_common — ties resolve to the FIRST-SEEN delta, not the
  smallest, unlike determine_data_frequency), determine_duration ->
  period_required = 0.75 * total_period, minimum_datapoints and the
  sparsity gate at the HARDCODED 90 % (the passed minimum_sparsity=75
  only arms the gate, :624 — quirk), constant-series False.
- Stage 2 (long period, cloudburst.py:743-1000): the 7-day window
  summarized to 15-minute MEDIAN buckets (Graphite summarize semantics:
  epoch-aligned buckets labelled by bucket START), first and last TWO
  summarized points dropped (``timeseries[1:len-2]``, :855-857), m66
  again (window=4, minimum_sparsity=0 -> every gate off), anomalies
  required inside the last ``long_period_check_last`` = 6 h.
- Cloudburst extraction (cloudburst.py:1001-1040): contiguous stage-2
  anomaly runs where adjacent means EXACTLY +resolution apart; a
  single-point run is widened by one resolution
  (``initial_start_ts == last_ts`` quirk, :1029-1030).

The m66 flag math reuses the repo's ``_m66_flags``
(functions/custom_algorithms.py): the reference min-max scales first
and its two backends disagree on ddof (bottleneck move_std ddof=0 vs
pandas rolling().std() ddof=1) — both are mathematically irrelevant to
the flags because the ``std_nth > np.std(std_nth) * sigma`` comparison
is invariant under any uniform linear scaling of the inputs, so the
unscaled ddof=1 form produces the identical flag set up to float
noise (pinned by test_cloudburst).

The MySQL cloudburst-table dedup / plotting / Redis work-queue around
this (cloudburst.py:1040-1840) and the cross-metric related-matching
(cloudbursts.py, find_cloudburst_motifs — the same MASS matcher
already shipped in operators/motifs.py) are orchestration per SURVEY
§3.3; the DETECTION surface is what this module ships.

Scale: one applyInPandas on the standard per-series exchange; both m66
passes are O(n) rolling windows inside the kernel.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.custom_algorithms import _m66_flags

__all__ = [
    "m66_anomaly_indices",
    "metric_resolution_last30",
    "summarize_median",
    "extract_cloudburst_runs",
    "find_cloudbursts_kernel",
    "cloudbursts",
]


def metric_resolution_last30(epochs: np.ndarray) -> int | None:
    """m66.py:558-584 — most-common consecutive delta of the last 30
    timestamps; Counter.most_common tie -> first-seen delta."""
    tail = [int(e) for e in epochs[-30:]]
    deltas = [b - a for a, b in zip(tail, tail[1:])]
    if not deltas:
        return None
    return int(Counter(deltas).most_common()[0][0])


def m66_anomaly_indices(values: np.ndarray, window: int,
                        nth_median: int = 6,
                        n_sigma: float = 6.0) -> np.ndarray:
    """Indices of the persisted m66 anomaly runs
    (m66.py:720-832 with shift_to_start_of_window=False)."""
    if values.size < 10:
        return np.empty(0, dtype=np.int64)
    scores = _m66_flags(values, window, nth_median, n_sigma)
    return np.flatnonzero(scores > 0)


def _m66_gates(epochs: np.ndarray, values: np.ndarray,
               sparsity_armed: bool) -> bool:
    """The stage-1 eligibility gates (m66.py:430-700 with
    determine_duration=True): resolution/minimum-datapoints, the
    hardcoded-90 sparsity floor, the constant-series False."""
    total_period = int(epochs[-1]) - int(epochs[0])
    total_datapoints = int(values.size)
    period_required = int(total_period * 0.75)
    res = metric_resolution_last30(epochs)
    if sparsity_armed:
        if res:
            minimum_datapoints = int(period_required / res)
            if total_datapoints < minimum_datapoints:
                return False
        if not res:
            return False
        total_period_datapoints = int(total_period / res)
        if total_period_datapoints <= 0:
            return False
        sparsity = int(total_datapoints / (total_period_datapoints / 100))
        if sparsity < 90:  # the hardcoded floor (m66.py:624)
            return False
    if np.unique(values).size == 1:
        return False
    return True


def summarize_median(epochs: np.ndarray, values: np.ndarray,
                     interval: int = 900) -> tuple[np.ndarray, np.ndarray]:
    """Graphite ``summarize(intervalString, 'median')`` semantics:
    epoch-aligned buckets labelled by bucket start."""
    buckets = (epochs.astype(np.int64) // interval) * interval
    out_t, out_v = [], []
    order = np.argsort(buckets, kind="stable")
    buckets, vals = buckets[order], values[order]
    i = 0
    n = buckets.size
    while i < n:
        j = i
        while j < n and buckets[j] == buckets[i]:
            j += 1
        out_t.append(int(buckets[i]))
        out_v.append(float(np.median(vals[i:j])))
        i = j
    return np.asarray(out_t, dtype=np.int64), np.asarray(out_v)


def extract_cloudburst_runs(anomaly_epochs: list[int],
                            resolution: int) -> list[tuple[int, int]]:
    """cloudburst.py:1001-1040 — contiguous runs (adjacent == exactly
    +resolution); the single-point-run widening quirk."""
    if not anomaly_epochs:
        return []
    runs = []
    initial_start_ts = int(anomaly_epochs[0])
    start_ts = initial_start_ts
    last_ts = start_ts
    for ts in [int(t) for t in anomaly_epochs]:
        if ts == initial_start_ts:
            last_ts = ts
            continue
        if ts == last_ts + resolution:
            last_ts = ts
            continue
        if ts > last_ts + resolution:
            runs.append((start_ts, last_ts))
            start_ts = ts
        last_ts = ts
    if initial_start_ts == last_ts:
        last_ts = initial_start_ts + resolution
    runs.append((start_ts, last_ts))
    return runs


def find_cloudbursts_kernel(epochs: np.ndarray, values: np.ndarray,
                            now: float, *,
                            check_last: int = 3600 * 4,
                            long_period_check_last: int = 3600 * 6,
                            long_window_seconds: int = 86400 * 7,
                            summarize_interval: int = 900,
                            nth_median: int = 6,
                            n_sigma: float = 6.0) -> list[dict]:
    """Both stages for one series; returns the found cloudbursts."""
    order = np.argsort(epochs, kind="stable")
    epochs, values = epochs[order], values[order]
    res = metric_resolution_last30(epochs)
    if not res:
        return []
    # stage 1: align to resolution, window/check_last by resolution
    aligned = (epochs.astype(np.int64) // res) * res
    window = 5
    custom_check_last = check_last
    if res > 60:
        custom_check_last = check_last + 1800
        window = 4
    if res > 600:
        custom_check_last = check_last + 3600
        window = 3
    if not _m66_gates(aligned, values, sparsity_armed=True):
        return []
    idx = m66_anomaly_indices(values, window, nth_median, n_sigma)
    s1 = aligned[idx]
    if not [t for t in s1 if t > now - custom_check_last]:
        return []
    # stage 2: 7-day window, 15-min median summarize, drop first +
    # last two, m66 at window=4, anomalies in the last 6 h
    w = epochs >= now - long_window_seconds
    st, sv = summarize_median(epochs[w], values[w], summarize_interval)
    if st.size > 3:
        st, sv = st[1:st.size - 2], sv[1:sv.size - 2]
    idx2 = m66_anomaly_indices(sv, 4, nth_median, n_sigma)
    s2 = [int(t) for t in st[idx2] if t > now - long_period_check_last]
    if not s2:
        return []
    out = []
    for start_ts, end_ts in extract_cloudburst_runs(s2,
                                                    summarize_interval):
        out.append({"start": start_ts, "end": end_ts,
                    "duration": end_ts - start_ts,
                    "resolution": summarize_interval,
                    "from_ts": int(now - long_window_seconds),
                    "until_ts": int(now)})
    return out


CLOUDBURST_SCHEMA = ("conv_id string, metric string, start long, "
                     "end long, duration long, resolution int, "
                     "from_ts long, until_ts long")


def cloudbursts(parsed: DataFrame, now: float, **kernel_kwargs) -> DataFrame:
    """One row per found cloudburst (series with none emit nothing —
    the reference only records found cloudbursts)."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__e", kind="stable")
        found = find_cloudbursts_kernel(
            pdf["__e"].to_numpy(np.float64),
            pdf["value"].to_numpy(np.float64), now, **kernel_kwargs)
        rows = [{"conv_id": pdf["conv_id"].iloc[0],
                 "metric": pdf["metric"].iloc[0], **f} for f in found]
        return pd.DataFrame(
            rows, columns=["conv_id", "metric", "start", "end",
                           "duration", "resolution", "from_ts",
                           "until_ts"])

    proj = parsed.where(F.col("value").isNotNull()).select(
        "conv_id", "metric",
        F.col("ts").cast("timestamp").cast("double").alias("__e"),
        "value")
    return proj.groupBy("conv_id").applyInPandas(
        kernel, schema=CLOUDBURST_SCHEMA)


def cloudburst_related_metrics(parsed: DataFrame, now: float,
                               sources: DataFrame,
                               window_seconds: int = 7 * 86400,
                               align_seconds: int = 3600,
                               threshold: float = 0.5,
                               cv: int = 4) -> DataFrame:
    """find_related — ppscore relationships between cloudburst source
    metrics and the candidate population
    (skyline/luminosity/cloudbursts.py:79-380): per (source,
    candidate) pair, both directed predictive power scores over the
    trailing window's shared timestamps; related when either exceeds
    0.5 (:289), ranked by the two scores' sum (:314).

    Faithful pieces: the strictly-greater window trim
    (``ts > until - window``, :221), the falsy skip that drops shared
    rows where the x-side value is exactly 0.0 (``if x_value:``,
    :270-273), both directed scores from one aligned frame (the
    pps.matrix call, :284), the >0.5 either-direction gate and the
    score-sum ranking. Documented out of scope: the reference's
    longest/shortest selection is a dict-enumerate bug that compares
    METRIC NAME lengths (``max(enumerate(dict), key=len(tup[1]))``,
    :255-256) and can pull a third metric's timestamps into the
    frame — here the pair's lexicographically smaller conv is the x
    side, deterministically. The reference's minute-cadence shared-raw
    timestamps become the hourly mean alignment (the corpus'
    regular-cadence mapping used throughout); ppscore itself is the
    ppscore-lite kernel (functions/ppscore.py — published pps formula
    on an exact-parity 1-D CART, chronological folds).

    Scale: one hourly pre-aggregate, one broadcast of the source id
    list, one equi-join on the aligned bucket per (source, candidate)
    pair, one Arrow kernel per pair — never all-pairs beyond the
    source-cardinality fan-out the reference itself performs.
    """
    from skyline_spark.functions.ppscore import ppscore_1d

    te = F.col("ts").cast("timestamp").cast("double")
    pts = (parsed.where(F.col("value").isNotNull())
           .where(te > F.lit(float(now)) - F.lit(int(window_seconds)))
           .groupBy("conv_id",
                    (F.floor(te / align_seconds) * align_seconds)
                    .cast("long").alias("b"))
           .agg(F.avg("value").alias("v")))
    src = sources.select(F.col("conv_id").alias("source_conv")).distinct()
    a = pts.join(F.broadcast(src),
                 pts["conv_id"] == F.col("source_conv")) \
        .select(F.col("source_conv"), "b", F.col("v").alias("sv"))
    joined = a.join(pts.withColumnRenamed("conv_id", "cand_conv")
                    .withColumnRenamed("v", "cv_"), "b") \
        .where(F.col("cand_conv") != F.col("source_conv"))
    # the falsy x-side skip: x = the lexicographically smaller conv
    xv = F.when(F.col("source_conv") < F.col("cand_conv"),
                F.col("sv")).otherwise(F.col("cv_"))
    joined = joined.where(xv != 0.0)

    def kernel(pdf):
        import pandas as pd
        pdf = pdf.sort_values("b", kind="stable")
        s = pdf["sv"].to_numpy(np.float64)
        c = pdf["cv_"].to_numpy(np.float64)
        s2c, case1 = ppscore_1d(s, c, cv=cv)
        c2s, case2 = ppscore_1d(c, s, cv=cv)
        s2c, c2s = round(s2c, 6) + 0.0, round(c2s, 6) + 0.0
        return pd.DataFrame([{
            "source_conv": pdf["source_conv"].iloc[0],
            "cand_conv": pdf["cand_conv"].iloc[0],
            "n_shared": int(len(pdf)),
            "pps_source_to_cand": s2c,
            "pps_cand_to_source": c2s,
            "case_source_to_cand": case1,
            "case_cand_to_source": case2,
            "related": bool(s2c > threshold or c2s > threshold),
            "ppscores_sum": round(s2c + c2s, 6) + 0.0,
        }])

    schema = ("source_conv string, cand_conv string, n_shared int, "
              "pps_source_to_cand double, pps_cand_to_source double, "
              "case_source_to_cand string, case_cand_to_source string, "
              "related boolean, ppscores_sum double")
    return joined.groupBy("source_conv", "cand_conv").applyInPandas(
        kernel, schema=schema)
