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
