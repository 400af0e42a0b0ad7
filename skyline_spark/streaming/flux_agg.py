"""Structured Streaming form of the flux aggregator (G3) and the
streaming ingest path (S1-S3 analogue).

Reference: skyline/flux/aggregator.py:591-606 — per-namespace tumbling
``interval`` windows with avg/sum/min/max; late data handled here with a
watermark (the reference's Redis queue tolerates lateness implicitly via
its aggregation delay).

Batch and streaming share the same aggregation expressions, so the
streaming query is the readStream -> window agg -> writeStream shape of
the identical logical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from skyline_spark.schema import TRANSCRIPTS_SCHEMA


def read_transcripts_stream(spark: SparkSession, path: str,
                            max_files_per_trigger: int = 8) -> DataFrame:
    """File-source streaming ingest of transcripts parquet drops — the
    socket/kafka swap-in point (S1/S2)."""
    return (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def streaming_flux_aggregate(events: DataFrame, interval_seconds: int,
                             watermark: str = "10 minutes",
                             namespace_col: str = "event_type",
                             ts_col: str = "ts",
                             value_col: str = "value") -> DataFrame:
    """Tumbling-window avg/sum/min/max with late-data watermark."""
    # watermarks require TIMESTAMP (with zone); parquet sources may carry
    # TIMESTAMP_NTZ — cast preserves the instant under the UTC session tz
    return (events
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(namespace_col).alias("namespace"),
                     F.window(ts_col, f"{interval_seconds} seconds"))
            .agg(F.avg(value_col).alias("avg"),
                 F.sum(value_col).alias("sum"),
                 F.min(value_col).alias("min"),
                 F.max(value_col).alias("max"))
            .select("namespace", F.col("window.start").alias("bucket_start"),
                    "avg", "sum", "min", "max"))


def run_to_memory(agg: DataFrame, query_name: str,
                  checkpoint_dir: str,
                  output_mode: str = "complete") -> StreamingQuery:
    """Drain all available input once (availableNow) into an in-memory
    sink — the test/verification harness shape; production swaps the
    sink for an Iceberg/parquet writeStream with the same plan.
    ``output_mode``: "complete" for full re-emitted aggregates,
    "append" for row-emitting operators (dedup, stateful flatMap)."""
    return (agg.writeStream.format("memory").queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
