"""Stateful Structured-Streaming analyze — the Redis-window analogue.

The reference analyzer re-reads each metric's FULL_DURATION window from
Redis every run (skyline/analyzer/analyzer.py:2281 via
skyline_functions), so the Redis key IS the per-series sliding window.
In streaming that window is per-group state: ``applyInPandasWithState``
keeps every (conv_id, metric) series' raw retention window across
micro-batches, appends each trigger's new turns, trims to
``cfg.full_duration`` behind the series head, and re-runs the SAME
batch consensus kernel (preprocess -> exceptions -> 9-algorithm vote,
functions/consensus.py) on the stateful window — one verdict row per
series per micro-batch, exactly what the analyzer emits per run.

``now`` semantics: the batch job uses the global input watermark
(max ts); inside a stateful group only the group's rows are visible, so
``now`` resolves in order of preference to (1) the caller-pinned
``now`` (deterministic tests / replay), (2) the stream's event-time
watermark when one is set, (3) the series head (which makes the Stale
filter a no-op for actively-flowing series — correct, since a series
with a row in this trigger is by definition not stale).

Stale detection for series with NO new rows uses processing-time
timeouts: each update arms a ``stale_period`` timeout, and a fired
timeout emits a Stale exception verdict from state alone — the
streaming twin of the analyzer's stale check over Redis keys it did not
just write.

Batch twin: operators/analyze.analyze — the pytest asserts the final
micro-batch's verdicts equal the batch kernel's on the full input
(test_second_stage::test_streaming_stateful_analyze).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from skyline_spark.config import PipelineConfig

OUT_SCHEMA = ("conv_id string, metric string, anomalous boolean, "
              "exception string, datapoint double, n_points int, "
              "last_ts double, triggered array<string>")
STATE_SCHEMA = "ts array<double>, vals array<double>"


def _analyze_fn(cfg: PipelineConfig, rules: list[dict] | None,
                now_override: float | None):
    from skyline_spark.functions.consensus import (
        preprocess_series,
        run_selected_algorithm,
    )
    from skyline_spark.operators.enrich import match_rules_py

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id, metric = key
        if state.exists:
            sts, svals = state.get
            ts = np.asarray(sts, dtype=np.float64)
            vals = np.asarray(svals, dtype=np.float64)
        else:
            ts = np.empty(0)
            vals = np.empty(0)

        if state.hasTimedOut:
            # no new data within stale_period: emit the Stale verdict
            # the batch analyzer would produce for this series
            last = float(ts[-1]) if ts.size else None
            yield pd.DataFrame([{
                "conv_id": conv_id, "metric": metric, "anomalous": False,
                "exception": "Stale",
                "datapoint": float(vals[-1]) if vals.size else None,
                "n_points": int(vals.size), "last_ts": last,
                "triggered": [],
            }])
            state.setTimeoutDuration(int(cfg.stale_period * 1000))
            return

        new_t: list[np.ndarray] = []
        new_v: list[np.ndarray] = []
        for pdf in pdfs:
            new_t.append(pdf["ts_epoch"].to_numpy(dtype=np.float64))
            new_v.append(pdf["value"].to_numpy(dtype=np.float64))
        if new_t:
            ts = np.concatenate([ts] + new_t)
            vals = np.concatenate([vals] + new_v)
        if ts.size == 0:
            state.setTimeoutDuration(int(cfg.stale_period * 1000))
            return
        # keep state sorted/deduped (first-per-ts, same rule as
        # preprocess_series) and trimmed to the retention window behind
        # the series head — the Redis roomba trim analogue
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]
        keep = np.ones(ts.size, dtype=bool)
        if ts.size > 1:
            keep[1:] = ts[1:] != ts[:-1]
        ts, vals = ts[keep], vals[keep]
        head = float(ts[-1])
        window = ts > head - cfg.full_duration
        ts, vals = ts[window], vals[window]
        state.update((ts.tolist(), vals.tolist()))
        state.setTimeoutDuration(int(cfg.stale_period * 1000))

        if now_override is not None:
            now = now_override
        else:
            wm = state.getCurrentWatermarkMs()
            now = wm / 1000.0 if wm > 0 else head

        rule = (match_rules_py(metric, rules) or {}) \
            if rules is not None else {}
        csp = rule.get("custom_stale_period")
        auto_det = (cfg.analyze_derivatives
                    and metric not in cfg.non_derivative_metrics)
        pts, pvals = preprocess_series(
            ts, vals, now, cfg,
            is_derivative=bool(rule.get("is_derivative") or False),
            auto_detect_derivative=auto_det)
        v = run_selected_algorithm(
            pts, pvals, now, cfg,
            custom_stale_period=float(csp) if csp is not None else None,
            metric=metric,
            low_priority=(rules is not None
                          and rule.get("alerter") != "smtp"))
        yield pd.DataFrame([{
            "conv_id": conv_id, "metric": metric,
            "anomalous": bool(v.anomalous),
            "exception": v.exception, "datapoint": v.datapoint,
            "n_points": int(v.n_points), "last_ts": v.last_ts,
            "triggered": list(v.triggered),
        }])

    return fn


def streaming_analyze(parsed_stream: DataFrame, cfg: PipelineConfig,
                      rules: list[dict] | None = None,
                      now: float | None = None) -> DataFrame:
    """parsed turn stream -> one verdict row per (conv_id, metric) per
    micro-batch, with the series' raw retention window held in group
    state. Shuffles once on the SAME (conv_id, metric) key as the batch
    analyze, so the state exchange is the only wide edge."""
    proj = parsed_stream.select(
        "conv_id", "metric",
        F.col("ts").cast("timestamp").cast("double").alias("ts_epoch"),
        "value").where(F.col("value").isNotNull())
    return proj.groupBy("conv_id", "metric").applyInPandasWithState(
        _analyze_fn(cfg, rules, now),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)
