"""Luminosity (X1) — cross-correlate other series' windows around each
anomaly; report best-shift correlation coefficients above threshold.

Reference: skyline/luminosity/process_correlations.py:1073-1521 — for
each anomaly, the ±window of every other metric is cross-correlated
(luminol Correlator) and kept when coefficient >= 0.9 (:1335-1339).

Spark shape: anomalies are anomaly-cardinality (tiny) -> their windowed
series are collected once and shipped in the UDF closure; candidate
windows are selected with a broadcast range filter; one
groupBy(anomaly, candidate).applyInPandas computes the max-lag Pearson.
The simple zero-shift Pearson variant lives in queries.q_correlate
(F.corr, oracle-checked); this operator adds the shift search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def _bucketize(ts: np.ndarray, v: np.ndarray, step: int
               ) -> dict[int, float]:
    buckets: dict[int, list] = {}
    for t, x in zip(ts, v):
        buckets.setdefault(int(t // step), []).append(x)
    return {k: float(np.mean(xs)) for k, xs in buckets.items()}


def max_shift_correlation(ts_a: np.ndarray, v_a: np.ndarray,
                          ts_b: np.ndarray, v_b: np.ndarray,
                          step: int, max_shift_steps: int
                          ) -> tuple[float, int]:
    """Best Pearson coefficient over integer bucket shifts in
    [-max_shift_steps, +max_shift_steps] (luminol Correlator
    semantics: max cross-correlation within allowed shift)."""
    a = _bucketize(ts_a, v_a, step)
    b = _bucketize(ts_b, v_b, step)
    best, best_shift = 0.0, 0
    for shift in range(-max_shift_steps, max_shift_steps + 1):
        keys = [k for k in a if (k + shift) in b]
        if len(keys) < 5:
            continue
        xa = np.array([a[k] for k in keys])
        xb = np.array([b[k + shift] for k in keys])
        sa, sb = xa.std(), xb.std()
        if sa == 0 or sb == 0:
            continue
        r = float(np.corrcoef(xa, xb)[0, 1])
        if abs(r) > abs(best):
            best, best_shift = r, shift
    return best, best_shift


def luminosity_correlations(parsed: DataFrame, anomalies: DataFrame,
                            window_s: int = 1200, step_s: int = 60,
                            max_shift_s: int = 120,
                            threshold: float = 0.9) -> DataFrame:
    """For each anomaly row (conv_id, last_ts), correlate every other
    series' ±window against the anomalous series' window."""
    spark = parsed.sparkSession
    anoms = anomalies.select(F.col("conv_id").alias("anom_conv"),
                             F.col("last_ts").cast("double").alias("anom_ts"))
    anom_rows = anoms.collect()
    if not anom_rows:
        return spark.createDataFrame(
            [], "anom_conv string, cand_conv string, coefficient double, "
                "shift_seconds int")

    te = epoch_seconds(F.col("ts"))
    base = parsed.where(F.col("value").isNotNull()) \
        .select("conv_id", te.alias("te"), "value")

    # anomaly windows -> driver (anomaly-cardinality × window points)
    win = None
    for r in anom_rows:
        cond = ((F.col("conv_id") == r.anom_conv)
                & (F.col("te") >= r.anom_ts - window_s)
                & (F.col("te") <= r.anom_ts + window_s))
        win = cond if win is None else (win | cond)
    target_pdf = base.where(win).toPandas()
    targets = {
        r.anom_conv: (
            target_pdf[target_pdf.conv_id == r.anom_conv].te.to_numpy(),
            target_pdf[target_pdf.conv_id == r.anom_conv].value.to_numpy())
        for r in anom_rows
    }

    cands = base.crossJoin(F.broadcast(anoms)).where(
        (F.col("conv_id") != F.col("anom_conv"))
        & (F.col("te") >= F.col("anom_ts") - window_s)
        & (F.col("te") <= F.col("anom_ts") + window_s))

    max_steps = max_shift_s // step_s

    def correlate(pdf: pd.DataFrame) -> pd.DataFrame:
        anom_conv = pdf["anom_conv"].iloc[0]
        cand_conv = pdf["conv_id"].iloc[0]
        t = targets.get(anom_conv)
        if t is None or t[0].size < 5:
            return pd.DataFrame(columns=["anom_conv", "cand_conv",
                                         "coefficient", "shift_seconds"])
        coef, shift = max_shift_correlation(
            t[0], t[1], pdf["te"].to_numpy(), pdf["value"].to_numpy(),
            step_s, max_steps)
        return pd.DataFrame([{
            "anom_conv": anom_conv, "cand_conv": cand_conv,
            "coefficient": round(coef, 6),
            "shift_seconds": shift * step_s}])

    out = cands.groupBy("anom_conv", "conv_id").applyInPandas(
        correlate,
        schema="anom_conv string, cand_conv string, coefficient double, "
               "shift_seconds int")
    return out.where(F.abs(F.col("coefficient")) >= threshold)
