"""Structured Streaming exact dedup — the streaming twin of
``operators/dedup.dedup_exact`` for a continuously-ingested corpus.

``dropDuplicatesWithinWatermark`` on the content hash keeps the FIRST
arrival of each distinct text and bounds the dedup state by the
watermark horizon (state for a hash is dropped once the watermark
passes its last-seen event time) — the streaming analogue of the batch
hash-groupBy, with the same first-wins semantics the reference's
Redis-keyed dedup has (skyline/horizon/worker.py key-dedup analogue;
the batch operator cites skyline/analyzer/analyzer.py:575-581 for
first-wins).

Scale: state is hash-keyed and watermark-bounded — no unbounded
accumulation; the shuffle key is the content hash, so hot documents
never skew a partition beyond their duplicate count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(docs: DataFrame, watermark: str = "1 hour",
                          text_col: str = "text",
                          ts_col: str = "ts") -> DataFrame:
    """Keep the first arrival per distinct ``text`` within the
    watermark horizon. Input must be a streaming DataFrame with an
    event-time column."""
    hashed = docs.withColumn(
        "content_hash", F.xxhash64(F.col(text_col))).withColumn(
        ts_col, F.col(ts_col).cast("timestamp"))
    return (hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))
