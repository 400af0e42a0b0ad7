"""Resumable batch runs with per-partition lineage + run metrics
(north_rule: "resumable from checkpoint with per-partition lineage and
metrics").

The reference's incremental state is Redis watermark keys
(``analyzer.last_timestamp.*``, skyline/analyzer/analyzer.py:3946-3951;
per-metric batch keys :4183-4204) plus idempotence keys for deferred
checks (``analyzer.mirage_check_sent.<ts>.<metric>``, :4578-4583).

Spark shape (Iceberg would use snapshot ranges; on plain parquet we use
a ts watermark — the mechanism is identical):
- each run processes rows with ``watermark_lo < ts <= watermark_hi``;
- sink output goes to a per-run directory (``.../run_id=<id>/``), so a
  re-run of a failed batch OVERWRITES its own output — idempotent, no
  dupes, no gaps;
- the checkpoint JSON is written atomically (tmp + rename) only AFTER
  the sink write succeeds; a crash between write and checkpoint replays
  the batch into the same directory;
- lineage table rows: (run_id, stage, partition_id, rows, bytes_approx)
  per output partition, + a one-row run_metrics record (wall_ms,
  per-sink counts, exception counts, watermarks).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skyline_spark.config import PipelineConfig
from skyline_spark.functions.spark_utils import epoch_seconds
from skyline_spark.plans.pipeline import run_pipeline


def read_checkpoint(path: str) -> dict:
    f = os.path.join(path, "checkpoint.json")
    if not os.path.exists(f):
        return {"watermark": None, "runs": []}
    with open(f) as fh:
        return json.load(fh)


def write_checkpoint(path: str, state: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".checkpoint.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, os.path.join(path, "checkpoint.json"))


def partition_lineage(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition row counts — the lineage record for one stage."""
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .select(F.lit(run_id).alias("run_id"), F.lit(stage).alias("stage"),
                    "partition_id", "rows"))


def run_incremental(spark: SparkSession, transcripts: DataFrame,
                    alert_config: DataFrame, base_path: str,
                    cfg: PipelineConfig | None = None,
                    batch_hi: float | None = None,
                    run_id: str | None = None,
                    crash_before_checkpoint: bool = False) -> dict:
    """Process one incremental batch: rows with
    ``watermark < ts <= batch_hi`` (default: all new rows). Returns the
    run record. ``crash_before_checkpoint`` simulates a failure after
    the sink write for the resume test."""
    cfg = cfg or PipelineConfig()
    state = read_checkpoint(base_path)
    lo = state["watermark"]
    te = epoch_seconds(F.col("ts"))
    batch = transcripts
    if lo is not None:
        batch = batch.where(te > F.lit(lo))
    if batch_hi is not None:
        batch = batch.where(te <= F.lit(batch_hi))

    hi_row = batch.agg(F.max(te)).first()
    if hi_row is None or hi_row[0] is None:
        return {"run_id": None, "rows": 0, "skipped": "empty batch"}
    hi = float(hi_row[0])
    run_id = run_id or f"run-{int(hi)}"

    t0 = time.perf_counter()
    res = run_pipeline(spark, batch, alert_config, cfg, now=hi)
    out_dir = os.path.join(base_path, "sinks", f"run_id={run_id}")
    # idempotent: a replayed run overwrites its own directory only
    res.routed_turns.write.mode("overwrite").partitionBy("sink") \
        .parquet(out_dir)
    wall_ms = (time.perf_counter() - t0) * 1000.0

    routed = spark.read.parquet(out_dir)
    lineage = partition_lineage(routed, run_id, "routed_turns")
    lineage.write.mode("append").parquet(os.path.join(base_path, "lineage"))

    sink_counts = {r["sink"]: r["count"] for r in
                   routed.groupBy("sink").count().collect()}
    metrics = {
        "run_id": run_id, "watermark_lo": lo, "watermark_hi": hi,
        "wall_ms": round(wall_ms, 1), "rows": int(sum(sink_counts.values())),
        "sink_counts": sink_counts,
    }
    spark.createDataFrame([json.dumps(metrics)], "string") \
        .toDF("record") \
        .write.mode("append").parquet(os.path.join(base_path, "run_metrics"))

    if crash_before_checkpoint:
        return {**metrics, "crashed": True}

    state["watermark"] = hi
    state["runs"] = state.get("runs", []) + [run_id]
    write_checkpoint(base_path, state)
    return metrics


def read_all_sinks(spark: SparkSession, base_path: str) -> DataFrame:
    """Union of all committed + replayed run outputs; per-run overwrite
    guarantees at-most-once rows per (run_id, conv_id, turn_idx)."""
    return spark.read.option("basePath", os.path.join(base_path, "sinks")) \
        .parquet(os.path.join(base_path, "sinks", "run_id=*"))
