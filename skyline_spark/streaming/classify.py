"""Stateful Structured-Streaming classify_metrics — the sweep as a
continuously maintained decision.

Reference: the luminosity classify_metrics sweep
(skyline/luminosity/classify_metrics.py:100-560) re-reads each
metric's full Redis window on every scheduled run and re-derives the
level-shift / volatility-shift classification from scratch. In
streaming that window is per-series group state:
``applyInPandasWithState`` keeps every conv_id's (epoch, turn, value)
points across micro-batches, appends each trigger's new turns, and
re-runs the SAME pure decision (operators.classify.classify_series) on
the accumulated series — one classification row per series per
micro-batch, exactly what each scheduled sweep would report at that
point of the stream.

State keeps the winning point per epoch PLUS its turn_idx so the
first-per-epoch rule (sort by (epoch, turn), keep first — the batch
``_prep`` contract) resolves identically no matter how the input is
split across micro-batches: a later batch can still deliver a
lower-turn point for an already-seen epoch and win it, as it would in
the batch sort.

Batch twin: operators.classify.classify_metrics — the pytest
(test_classify.py::test_streaming_classify_matches_batch) splits the
input over three chronological micro-batches and asserts the LAST
emission per series equals the batch output on the full input.

``streaming_classify_anomalies`` below is the same construction for
the per-anomaly type suite (classify_anomalies): the static anomaly
list broadcasts onto the stream, each (conv_id, anomaly_e) group keeps
its training slice in state, and the last emission per anomaly equals
the batch classification
(test_classify.py::test_streaming_classify_anomalies_matches_batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from skyline_spark.operators.classify import (
    _CLASSIFY_METRICS_SCHEMA,
    classify_series,
)

STATE_SCHEMA = ("e array<bigint>, turn array<bigint>, "
                "vals array<double>, metric string")


def _classify_fn(window: int, c: float, persist_window: int,
                 persist_c: float, volatility_window: int,
                 volatility_c: float, sig_len: int,
                 full_duration: int, stale_period: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            # no new data within stale_period: the reference sweep only
            # classifies metrics that still update (roomba removes dead
            # series); drop the group state instead of holding it forever
            state.remove()
            return
        if state.exists:
            se, stn, sv, metric = state.get
            e = np.asarray(se, dtype=np.int64)
            turn = np.asarray(stn, dtype=np.int64)
            vals = np.asarray(sv, dtype=np.float64)
        else:
            e = np.empty(0, dtype=np.int64)
            turn = np.empty(0, dtype=np.int64)
            vals = np.empty(0)
            metric = None

        for pdf in pdfs:
            e = np.concatenate([e, pdf["__e"].to_numpy(np.int64)])
            turn = np.concatenate(
                [turn, pdf["turn_idx"].to_numpy(np.int64)])
            vals = np.concatenate(
                [vals, pdf["value"].to_numpy(np.float64)])
            if len(pdf):
                # NaN-safe fold: a batch whose metric values are all
                # null would yield float NaN from .max() and poison a
                # later max(str, nan) comparison (ADVICE r07)
                m = pdf["metric"].dropna().max()
                if not pd.isna(m):
                    metric = m if metric is None else max(metric, m)
        if e.size == 0:
            state.setTimeoutDuration(int(stale_period * 1000))
            return
        # the batch _prep rule on the accumulated series: stable sort
        # by (epoch, turn), first point per epoch wins
        order = np.lexsort((turn, e))
        e, turn, vals = e[order], turn[order], vals[order]
        keep = np.ones(e.size, dtype=bool)
        if e.size > 1:
            keep[1:] = e[1:] != e[:-1]
        e, turn, vals = e[keep], turn[keep], vals[keep]
        # retention trim behind the series head (the roomba
        # FULL_DURATION window the batch sweep reads, r08: bounds group
        # state on a long-running stream — same rule as
        # streaming/analyze.py)
        head = int(e[-1])
        win = e > head - full_duration
        e, turn, vals = e[win], turn[win], vals[win]
        state.update((e.tolist(), turn.tolist(), vals.tolist(), metric))
        state.setTimeoutDuration(int(stale_period * 1000))

        rec = classify_series(e, vals, window, c, persist_window,
                              persist_c, volatility_window,
                              volatility_c, sig_len)
        yield pd.DataFrame([{"conv_id": conv_id, "metric": metric,
                             **rec}])

    return fn


def streaming_classify_metrics(parsed_stream: DataFrame,
                               window: int = 10, c: float = 9.9,
                               persist_window: int = 60,
                               persist_c: float = 9.9,
                               volatility_window: int = 5,
                               volatility_c: float = 9.9,
                               significant_length: int | None = None,
                               full_duration: int = 21 * 86400,
                               stale_period: int = 7 * 86400
                               ) -> DataFrame:
    """parsed turn stream -> one classify_metrics row per series per
    micro-batch, the accumulated-series state surviving triggers.

    State is BOUNDED (r08): each group keeps at most ``full_duration``
    of points behind its series head (the roomba-trimmed window the
    batch sweep reads) and a group idle past ``stale_period`` of
    processing time is removed."""
    sig_len = window if significant_length is None else significant_length
    cols = set(parsed_stream.columns)
    proj = parsed_stream.where(F.col("value").isNotNull()).select(
        "conv_id",
        (F.col("metric") if "metric" in cols else F.lit("")).alias("metric"),
        (F.col("turn_idx") if "turn_idx" in cols
         else F.lit(0)).cast("long").alias("turn_idx"),
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("__e"),
        "value")
    return proj.groupBy("conv_id").applyInPandasWithState(
        _classify_fn(window, c, persist_window, persist_c,
                     volatility_window, volatility_c, sig_len,
                     full_duration, stale_period),
        outputStructType=_CLASSIFY_METRICS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)


ANOM_STATE_SCHEMA = "e array<bigint>, turn array<bigint>, vals array<double>"


def _classify_anom_fn(window: int, c: float, stale_period: int):
    from skyline_spark.operators.classify import classify_anomaly_slice

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id, anomaly_e = key
        if state.hasTimedOut:
            # the training slice stops growing once the stream passes
            # anomaly_e; after stale_period with no new points the
            # classification is final — drop the state (r08: without
            # this every historical anomaly's slice lived forever)
            state.remove()
            return
        if state.exists:
            se, stn, sv = state.get
            e = np.asarray(se, dtype=np.int64)
            turn = np.asarray(stn, dtype=np.int64)
            vals = np.asarray(sv, dtype=np.float64)
        else:
            e = np.empty(0, dtype=np.int64)
            turn = np.empty(0, dtype=np.int64)
            vals = np.empty(0)

        for pdf in pdfs:
            e = np.concatenate([e, pdf["__e"].to_numpy(np.int64)])
            turn = np.concatenate(
                [turn, pdf["turn_idx"].to_numpy(np.int64)])
            vals = np.concatenate(
                [vals, pdf["value"].to_numpy(np.float64)])
        if e.size == 0:
            state.setTimeoutDuration(int(stale_period * 1000))
            return
        order = np.lexsort((turn, e))
        e, turn, vals = e[order], turn[order], vals[order]
        keep = np.ones(e.size, dtype=bool)
        if e.size > 1:
            keep[1:] = e[1:] != e[:-1]
        e, turn, vals = e[keep], turn[keep], vals[keep]
        state.update((e.tolist(), turn.tolist(), vals.tolist()))
        state.setTimeoutDuration(int(stale_period * 1000))

        yield pd.DataFrame([{
            "conv_id": conv_id, "anomaly_e": int(anomaly_e),
            **classify_anomaly_slice(vals, window, c),
        }])

    return fn


def streaming_classify_anomalies(parsed_stream: DataFrame,
                                 anomalies: DataFrame,
                                 window: int = 5,
                                 c: float = 6.0,
                                 stale_period: int = 7 * 86400) -> DataFrame:
    """Stateful streaming twin of classify_anomalies: the anomaly list
    is a STATIC (batch) DataFrame — anomaly-cardinality, broadcast onto
    the stream exactly like the batch fan-out — and each (conv_id,
    anomaly_e) group's training slice (points at or before the anomaly)
    accumulates in state, re-classified per micro-batch. The LAST
    emission per (conv_id, anomaly_e) equals the batch output on the
    full input under any chronological split; per-anomaly state
    duplication is the same anomaly-cardinality cost the batch fan-out
    pays (the reference re-reads the training window per anomaly the
    same way)."""
    from skyline_spark.operators.classify import _CLASSIFY_ANOMALIES_SCHEMA
    cols = set(parsed_stream.columns)
    proj = parsed_stream.where(F.col("value").isNotNull()).select(
        "conv_id",
        (F.col("turn_idx") if "turn_idx" in cols
         else F.lit(0)).cast("long").alias("turn_idx"),
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("__e"),
        "value")
    anoms = anomalies.select("conv_id",
                             F.col("anomaly_e").cast("long")
                             .alias("anomaly_e"))
    sliced = proj.join(F.broadcast(anoms), "conv_id") \
        .where(F.col("__e") <= F.col("anomaly_e"))
    return sliced.groupBy("conv_id", "anomaly_e").applyInPandasWithState(
        _classify_anom_fn(window, c, stale_period),
        outputStructType=_CLASSIFY_ANOMALIES_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)
