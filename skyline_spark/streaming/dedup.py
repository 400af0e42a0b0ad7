"""Structured Streaming dedup — the streaming twins of
``operators/dedup.dedup_exact`` (exact, via
dropDuplicatesWithinWatermark) and
``operators/dedup.lsh_candidate_pairs`` (MinHash-LSH candidate
generation, via band buckets held in group state) for a
continuously-ingested corpus.

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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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


def _lsh_pairs_fn(horizon_seconds: int, id_col: str):
    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batches = list(pdfs)
        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        out_a, out_b = [], []
        max_ms = 0
        for pdf in batches:
            pdf = pdf.sort_values(["ts_epoch", id_col], kind="stable")
            max_ms = max(max_ms,
                         int(pdf["ts_epoch"].max() * 1000))
            for n in pdf[id_col].tolist():
                n = int(n)
                if n in seen:
                    continue
                for o in seen:
                    out_a.append(min(o, n))
                    out_b.append(max(o, n))
                seen.append(n)
        state.update((seen,))
        # bucket state expires once the watermark passes the bucket's
        # last arrival by the horizon
        state.setTimeoutTimestamp(max_ms + horizon_seconds * 1000)
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})
    return fn


def streaming_lsh_candidate_pairs(docs: DataFrame,
                                  num_hashes: int = 32, bands: int = 8,
                                  shingle_k: int = 3,
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  ts_col: str = "ts",
                                  watermark: str = "1 hour",
                                  horizon_seconds: int = 3600,
                                  hash_mode: str = "xxhash64") \
        -> DataFrame:
    """Streaming twin of ``operators/dedup.lsh_candidate_pairs``: the
    stateless MinHash + banding stages run per micro-batch; each
    (band, band_sig) bucket's member ids are the GROUP STATE, so a new
    arrival pairs with every co-bucketed document seen in EARLIER
    micro-batches too — the emitted (id_a, id_b) set over a run equals
    the batch bucket-join on the same corpus (pinned by
    test_second_stage::test_streaming_lsh_candidate_pairs).

    Scale: the only wide edge is the shuffle on (band, band_sig) — the
    same key as the batch join; state per bucket is its member-id list,
    bounded by the event-time timeout (watermark + horizon), the
    streaming analogue of the batch job's corpus scope."""
    from skyline_spark.operators.dedup import band_explode, with_minhash
    sig = with_minhash(docs, num_hashes=num_hashes, shingle_k=shingle_k,
                       text_col=text_col, hash_mode=hash_mode)
    banded = band_explode(
        sig.withColumn("ts_epoch",
                       F.col(ts_col).cast("timestamp").cast("double")),
        num_hashes, bands, hash_mode,
        keep_cols=(id_col, "ts_epoch",
                   F.col(ts_col).cast("timestamp").alias("__evt")))
    return (banded.withWatermark("__evt", watermark)
            .groupBy("band", "band_sig")
            .applyInPandasWithState(
                _lsh_pairs_fn(horizon_seconds, id_col),
                outputStructType="id_a long, id_b long",
                stateStructType="seen array<long>",
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
