"""Streaming form of the full pipeline: each micro-batch of transcript
turns runs the SAME batch plan via ``foreachBatch`` — the analogue of
the reference analyzer's periodic runs (one spin_process per
ANALYZER_OPTIMUM_RUN_SECONDS window, skyline/analyzer/analyzer.py:8564),
where every run is a pure function of the data visible at its watermark.

``now`` per micro-batch = max(ts) of the batch, so verdicts are
reproducible per batch; sinks append partitioned by sink (the same
layout as route.write_sinks) keyed by batch_id for idempotent replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def run_streaming_pipeline(spark: SparkSession, transcripts_stream: DataFrame,
                           alert_config: DataFrame, cfg,
                           out_dir: str, checkpoint_dir: str,
                           mirage_always: list[str] | None = None
                           ) -> StreamingQuery:
    from skyline_spark.plans.pipeline import run_pipeline

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = run_pipeline(spark, batch_df, alert_config, cfg,
                           mirage_always=mirage_always)
        (res.routed_turns.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").partitionBy("sink").parquet(out_dir))
        res.verdicts.unpersist()

    return (transcripts_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def run_streaming_pipeline_cumulative(
        spark: SparkSession, transcripts_stream: DataFrame,
        alert_config: DataFrame, cfg, out_dir: str, checkpoint_dir: str,
        staging_dir: str, mirage_always: list[str] | None = None
        ) -> StreamingQuery:
    """Cumulative streaming form — the reference analyzer's REAL
    arrival semantics: every turn (on time, late, or re-delivered)
    lands in the accumulating store (the Redis series the analyzer
    reads, skyline/analyzer/analyzer.py:575-581 — uniq_datapoints
    keeps the first point per key), and each periodic run re-analyzes
    the visible window from scratch, so the FINAL per-sink routed-row
    sets are a pure function of the accumulated deduplicated data — the
    north-rule invariant under late and duplicate arrivals.

    ``staging_dir`` is the Redis-store analogue (append per
    micro-batch); duplicates collapse on the (conv_id, turn_idx)
    idempotence key; sinks are OVERWRITTEN with the latest run's
    routing (each run supersedes the previous, like the analyzer's
    per-run Redis sets). Scale: the re-analysis window is
    FULL_DURATION-bounded by the retention trim pushed to the scan —
    the same bounded reread every reference spin_process performs.
    """
    from skyline_spark.plans.pipeline import run_pipeline

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(staging_dir)
        seen = (spark.read.parquet(staging_dir)
                .dropDuplicates(["conv_id", "turn_idx"]))
        res = run_pipeline(spark, seen, alert_config, cfg,
                           mirage_always=mirage_always)
        (res.routed_turns.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite").partitionBy("sink").parquet(out_dir))
        res.verdicts.unpersist()

    return (transcripts_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
