"""Analyze stage — the per-series 9-algorithm CONSENSUS vote as ONE
shuffle + ONE Arrow-batched ``mapInPandas`` pass.

Design (SURVEY.md §2.6, §4):
- Input projection is minimal — (conv_id, metric, ts_epoch, value,
  is_derivative, custom_stale_period) — so Catalyst prunes ``text`` and
  every other wide column *before* the shuffle; the bulky turn payload
  never crosses the Python boundary. Verdicts (one row per series) are
  joined back to the turn rows by the router.
- Group size is bounded: the retention trim (``ts > now - full_duration``,
  skyline/horizon/roomba.py:300-307) is applied NATIVELY before the
  shuffle, so it is pushed to the parquet/Iceberg scan and hot
  conversations cannot exceed full_duration worth of turns per group.
  This is the same bound roomba enforces in the reference, and it is what
  makes the non-algebraic per-series statistics safe at 10^12-turn scale
  (SURVEY.md §7 milestone 2).
- Batched grouping: ``repartition(conv_id, metric)`` co-locates each
  series, ``sortWithinPartitions`` makes its rows contiguous, and a
  single ``mapInPandas`` walks the partition's Arrow batches slicing
  series out with numpy boundary detection. This amortizes the
  per-Python-call and per-result-DataFrame overhead across ~thousands of
  series per batch — the round-1 per-group ``applyInPandas`` paid
  ~2-7 ms of wrapper overhead per series against a ~0.25 ms kernel. A
  series that straddles two Arrow batches is carried over (batches
  arrive in partition order, so runs are contiguous across the stream).
- Inside the series: sort → dedup → derivative (order-dependent, per-row
  invariant) → exception filters → algorithm suite with early exit →
  vote, all vectorized numpy — this is the analogue of
  skyline/analyzer/analyzer.py:2281-4243 + algorithms.py:1168.
- Per-series wall time is recorded (analyze_ms) for the G2
  algorithm-timing telemetry (skyline/analyzer/analyzer.py:8301-8306).
"""

from __future__ import annotations

import time
import warnings
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds

from skyline_spark.config import PipelineConfig
from skyline_spark.functions.consensus import preprocess_series, run_selected_algorithm
from skyline_spark.schema import VERDICT_SCHEMA

#: output column order (must equal VERDICT_SCHEMA field order)
_OUT_COLS = [f.name for f in VERDICT_SCHEMA.fields]


def _make_partition_analyzer(cfg: PipelineConfig, now: float,
                             rules: list[dict] | None = None):
    from skyline_spark.operators.enrich import match_rules_py

    def analyze_one(conv_id, metric, ts, values, is_derivative, csp):
        start = time.perf_counter()
        # enrichment: resolved here from the closure rule list (the
        # metrics_manager hash analogue) unless the caller pre-joined
        if rules is not None:
            rule = match_rules_py(metric, rules) or {}
            is_derivative = bool(rule.get("is_derivative") or False)
            csp = rule.get("custom_stale_period")
            csp = float(csp) if csp is not None else None
        else:
            rule = {}
        auto_det = (cfg.analyze_derivatives
                    and metric not in cfg.non_derivative_metrics)
        # low priority = no smtp alert setting (docs/analyzer.rst:150);
        # resolvable only when enrichment rules ride in the closure
        low_priority = (rules is not None
                        and rule.get("alerter") != "smtp")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            ts, values = preprocess_series(ts, values, now, cfg,
                                           is_derivative=is_derivative,
                                           auto_detect_derivative=auto_det)
            v = run_selected_algorithm(ts, values, now, cfg,
                                       custom_stale_period=csp,
                                       metric=metric,
                                       low_priority=low_priority)
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        sor = rule.get("second_order_resolution_hours")
        return (conv_id, metric, v.anomalous, v.ensemble, v.triggered,
                v.algorithms_run, v.datapoint, v.exception,
                v.negatives_found, v.n_points, v.last_ts, v.from_ts,
                elapsed_ms,
                rule.get("namespace_pattern"), rule.get("alerter"),
                rule.get("expiration_time"), sor, sor is not None,
                rule.get("alerter") == "smtp")

    def analyze_partition(batches: Iterator[pd.DataFrame]
                          ) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        has_cols = rules is None  # pre-joined enrichment columns present

        def run_segments(pdf: pd.DataFrame, bounds: np.ndarray) -> list:
            conv = pdf["conv_id"].to_numpy()
            met = pdf["metric"].to_numpy(dtype=object)
            ts_all = pdf["ts_epoch"].to_numpy(dtype=np.float64)
            v_all = pdf["value"].to_numpy(dtype=np.float64)
            der = pdf["is_derivative"].to_numpy() if has_cols else None
            csp = pdf["custom_stale_period"].to_numpy() if has_cols else None
            out = []
            for s, e in zip(bounds[:-1], bounds[1:]):
                d = bool(der[s]) if der is not None else False
                c = None
                if csp is not None and not pd.isna(csp[s]):
                    c = float(csp[s])
                out.append(analyze_one(conv[s], met[s], ts_all[s:e],
                                       v_all[s:e], d, c))
            return out

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            conv = pdf["conv_id"].to_numpy()
            met = pdf["metric"].to_numpy(dtype=object)
            if n > 1:
                chg = np.flatnonzero((conv[1:] != conv[:-1])
                                     | (met[1:] != met[:-1])) + 1
            else:
                chg = np.array([], dtype=np.int64)
            bounds = np.concatenate(([0], chg, [n])).astype(np.int64)
            # hold the last run back: it may continue in the next batch
            carry = pdf.iloc[bounds[-2]:]
            rows = run_segments(pdf, bounds[:-1])
            if rows:
                yield pd.DataFrame(rows, columns=_OUT_COLS)
        if carry is not None and len(carry):
            rows = run_segments(carry, np.array([0, len(carry)]))
            yield pd.DataFrame(rows, columns=_OUT_COLS)

    return analyze_partition


def analyze(enriched: DataFrame, cfg: PipelineConfig, now: float,
            rules: list[dict] | None = None) -> DataFrame:
    """parsed/enriched facts -> one verdict row per (conv_id, metric)
    series.

    ``now`` is the batch watermark (max ts of the input) — supplied by the
    caller so the whole job is a pure function of its input. When
    ``rules`` is given, enrichment resolves inside the UDF (one fewer
    parse scan + no dimension sub-job); the input projection shrinks to
    four narrow columns.
    """
    cols = ["conv_id", "metric",
            epoch_seconds(F.col("ts")).alias("ts_epoch"), "value"]
    if rules is None:
        cols += [
            F.coalesce(F.col("is_derivative"), F.lit(False)).alias("is_derivative"),
            F.col("custom_stale_period").cast("double").alias("custom_stale_period"),
        ]
    projected = (
        enriched.select(*cols)
        # native pre-filters: drop non-event rows (EmptyTimeseries is
        # computed natively, see empty_series_verdicts) and retention
        # pre-trim — bounds group size AND pushes both predicates into
        # the scan (exact same window the UDF would trim)
        .filter(F.col("value").isNotNull()
                & (F.col("ts_epoch") > F.lit(now - cfg.full_duration)))
    )
    parts = (projected
             .repartition("conv_id", "metric")
             .sortWithinPartitions("conv_id", "metric", "ts_epoch"))
    return parts.mapInPandas(_make_partition_analyzer(cfg, now, rules),
                             schema=VERDICT_SCHEMA)


def empty_series_verdicts(transcripts: DataFrame, parsed: DataFrame,
                          cfg: PipelineConfig, now: float) -> DataFrame:
    """Series that produce no verdict from the analyze group-by:

    - E4/EmptyTimeseries — conv_ids whose turns parsed to zero valid
      metric events (skyline/analyzer/analyzer.py:4884-4893);
    - DeletedByRoomba — conv_ids with events but none inside the
      retention window (the analogue of the series roomba vacuumed away
      between listing and analysis, analyzer.py exceptions counter
      'DeletedByRoomba', skyline/horizon/roomba.py:293-298).

    Computed natively in a SINGLE aggregation pass over the parsed rows
    (one scan, map-side partial agg on (conv_id, metric), then a window
    over the already series-cardinality groups); unioned with the UDF
    verdicts so garbage rows never enter the Python stage.

    DeletedByRoomba verdicts CARRY their parsed metric so the router's
    exact (conv_id, metric) join matches the conv's event turns and the
    exception label + verdict columns ride along; metric stays NULL only
    for truly unparsed EmptyTimeseries conversations (whose turns also
    parse metric=NULL, matching via the null-safe join)."""
    valid = F.col("value").isNotNull()
    in_window = valid & (epoch_seconds(F.col("ts"))
                         > F.lit(now - cfg.full_duration))
    groups = parsed.groupBy("conv_id", "metric").agg(
        F.max(valid.cast("int")).alias("__has_any"),
        F.max(in_window.cast("int")).alias("__has_window"))
    conv_any = F.max("__has_any").over(Window.partitionBy("conv_id"))
    flags = groups.withColumn("__conv_any", conv_any)
    roomba = (F.col("__has_any") == 1) & (F.col("__has_window") == 0)
    # EmptyTimeseries: a conv with zero valid events anywhere emits one
    # verdict per parsed (metric) group — usually just the NULL-metric
    # group, but a value-unparseable event group gets its own row so its
    # turns still match the exact (conv_id, metric) route join
    empty = F.col("__conv_any") == 0
    empties = (
        flags.where(roomba | empty)
        .select("conv_id", "metric",
                F.when(F.col("__has_any") == 1, F.lit("DeletedByRoomba"))
                .otherwise(F.lit("EmptyTimeseries")).alias("__exc")))
    return empties.select(
        "conv_id",
        F.col("metric"),
        F.lit(False).alias("anomalous"),
        F.lit(None).cast("array<boolean>").alias("ensemble"),
        F.lit(None).cast("array<string>").alias("triggered"),
        F.lit(None).cast("array<string>").alias("algorithms_run"),
        F.lit(None).cast("double").alias("datapoint"),
        F.col("__exc").alias("exception"),
        F.lit(False).alias("negatives_found"),
        F.lit(0).cast("long").alias("n_points"),
        F.lit(None).cast("double").alias("last_ts"),
        F.lit(None).cast("double").alias("from_ts"),
        F.lit(0.0).alias("analyze_ms"),
        F.lit(None).cast("string").alias("matched_pattern"),
        F.lit(None).cast("string").alias("alerter"),
        F.lit(None).cast("int").alias("expiration_time"),
        F.lit(None).cast("int").alias("second_order_resolution_hours"),
        F.lit(False).alias("is_mirage"),
        F.lit(False).alias("is_smtp_alerter"),
    )
