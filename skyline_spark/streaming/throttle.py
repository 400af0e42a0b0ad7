"""Stateful Structured-Streaming form of the alert EXPIRATION_TIME
throttle (S9).

Reference: the ``last_alert.<alerter>.<metric>`` Redis keys
(skyline/analyzer/analyzer.py:4364-4374) — one alert per metric per
expiration window. In streaming, that Redis key IS per-group state:
``applyInPandasWithState`` keeps the last emitted alert timestamp per
metric across micro-batches, so a burst split over many triggers still
emits exactly one alert per window.

Batch twin: skyline_spark.operators.alerts.throttle_alerts_exact (same
scan, state seeded per run) — the pytest asserts streaming == batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "metric string, ts_epoch double, emit_alert boolean"
STATE_SCHEMA = "last_emit double"


def _throttle_fn(expiration_seconds: float):
    def throttle(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else float("-inf")
        metric = key[0]
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_epoch", kind="stable")
            emits = []
            for t in pdf["ts_epoch"].to_numpy(dtype="float64"):
                ok = t >= last + expiration_seconds
                if ok:
                    last = float(t)
                emits.append(ok)
            yield pd.DataFrame({"metric": metric,
                                "ts_epoch": pdf["ts_epoch"].to_numpy(),
                                "emit_alert": emits})
        state.update((last,))

    return throttle


def streaming_alert_throttle(anomalies: DataFrame,
                             expiration_seconds: float,
                             key: str = "metric",
                             ts_col: str = "ts") -> DataFrame:
    """anomalies stream -> (metric, ts_epoch, emit_alert) with per-metric
    last-emit state persisted across micro-batches."""
    from pyspark.sql import functions as F
    proj = anomalies.select(
        F.col(key).alias("metric"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_epoch"))
    return proj.groupBy("metric").applyInPandasWithState(
        _throttle_fn(expiration_seconds),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
