"""Vortex (S4) — ad-hoc series upload for one-shot analysis.

Reference: skyline/flux/listen.py:4288 — a JSON/CSV file of
``[[ts, value], ...]`` (or csv rows) posted for immediate analysis.

Spark shape: spark.read.json/csv -> normalized (ts, value) ->
run_selected_algorithm via the same analyze kernel. The ingest formats
mirror the reference's accepted shapes (utils/data.json:
``{"results": [[ts, v], ...]}``; csv ``ts,value`` rows).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skyline_spark.config import PipelineConfig
from skyline_spark.functions.consensus import preprocess_series, run_selected_algorithm


def read_vortex_json(spark: SparkSession, path: str) -> DataFrame:
    """``{"results": [[ts, v], ...]}`` (utils/seed_data.py format)."""
    raw = spark.read.option("multiLine", "true").json(path)
    return (raw.select(F.explode("results").alias("pair"))
            .select(F.element_at("pair", 1).cast("double").alias("ts_epoch"),
                    F.element_at("pair", 2).cast("double").alias("value")))


def read_vortex_csv(spark: SparkSession, path: str) -> DataFrame:
    """``timestamp,value`` csv rows (tests/baseline/*.csv format)."""
    raw = spark.read.option("header", "false").csv(path)
    return raw.select(F.col("_c0").cast("double").alias("ts_epoch"),
                      F.col("_c1").cast("double").alias("value"))


def analyze_vortex(series: DataFrame, cfg: PipelineConfig | None = None) -> dict:
    """One-shot verdict for an uploaded series (driver-side: vortex
    uploads are single series by definition)."""
    cfg = cfg or PipelineConfig()
    pdf = series.orderBy("ts_epoch").toPandas()
    ts = pdf["ts_epoch"].to_numpy(dtype=np.float64)
    values = pdf["value"].to_numpy(dtype=np.float64)
    now = float(ts[-1]) if ts.size else 0.0
    ts, values = preprocess_series(ts, values, now, cfg)
    v = run_selected_algorithm(ts, values, now, cfg)
    return {
        "anomalous": v.anomalous, "ensemble": v.ensemble,
        "triggered": v.triggered, "datapoint": v.datapoint,
        "exception": v.exception, "n_points": v.n_points,
    }
