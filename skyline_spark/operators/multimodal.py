"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the *decode* kernels are
deterministic stubs behind ``_decode_image_stub`` / gated imports — but
every Spark-side piece is real and tested: the binary schema, the
mapInPandas batch iteration, output schemas, partition-preserving
projection, and batch-size independence. Swapping the stub for
PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("source_doc", T.LongType(), True),
])


def synth_media(spark, docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    a tiny header (kind tag + fake dims) + the utf-8 text bytes. Pure
    native expressions."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.to_binary(F.concat(
            F.lpad((F.col(id_col) % 640 + 1).cast("string"), 4, "0"),
            F.lpad((F.col(id_col) % 480 + 1).cast("string"), 4, "0"),
            F.col(text_col)), F.lit("utf-8")).alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.col(id_col).alias("source_doc"))


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: reads the fake 8-byte dims header and derives a
    deterministic tiny 'pixel' array from the payload bytes. A real
    deployment replaces this with PIL.Image.open(BytesIO(payload));
    the surrounding Spark plumbing is unchanged."""
    if payload is None or len(payload) < 8:
        raise ValueError("truncated media payload")
    w = int(payload[:4])
    h = int(payload[4:8])
    body = np.frombuffer(payload[8:], dtype=np.uint8)
    return w, h, body


def decode_metadata(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas metadata extraction: (media_id, kind, width, height,
    n_bytes, checksum). Arrow batches in/out, no per-row Python calls
    outside the vectorized loop body."""
    out_schema = ("media_id long, kind string, width int, height int, "
                  "n_bytes long, checksum long")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                try:
                    w, h, body = _decode_image_stub(payload)
                    rows.append((mid, kind, w, h, len(payload),
                                 int(body.sum()) if body.size else 0))
                except ValueError:
                    rows.append((mid, kind, None, None,
                                 len(payload) if payload is not None else 0, None))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "width",
                                              "height", "n_bytes", "checksum"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, schema=out_schema)


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Feature-extraction stub over decoded payloads: a deterministic
    byte-histogram projection per item (stands in for an embedding
    model). Output: (media_id, features array<float>)."""
    out_schema = "media_id long, features array<float>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _, _, body = _decode_image_stub(payload)
                except ValueError:
                    body = np.zeros(0, dtype=np.uint8)
                hist, _ = np.histogram(body, bins=n_features, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        featurize, schema=out_schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per sampled
    'frame' offset (explode pattern; real codecs swap in per-frame
    decode). Output: (media_id, frame_idx, offset, frame_checksum)."""
    out_schema = ("media_id long, frame_idx int, offset long, "
                  "frame_checksum long")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                body = payload[8:] if payload and len(payload) > 8 else b""
                for i in range(min(max_frames,
                                   max(len(body) // every_n_bytes, 0))):
                    chunk = body[i * every_n_bytes:(i + 1) * every_n_bytes]
                    rows.append((mid, i, i * every_n_bytes,
                                 int(sum(chunk))))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "offset", "frame_checksum"])

    return media.where(F.col("kind") == "video") \
        .select("media_id", "payload").mapInPandas(sample, schema=out_schema)
