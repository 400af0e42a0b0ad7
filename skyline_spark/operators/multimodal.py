"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

The AUDIO path is a REAL codec: ``synth_wav_media``/``decode_audio``
write and parse genuine RIFF/WAVE 16-bit PCM payloads with the stdlib
``wave`` module. The container has no image/video codecs, so those
*decode* kernels remain deterministic stubs behind
``_decode_image_stub`` — but every Spark-side piece is real and tested:
the binary schema, the mapInPandas batch iteration, output schemas,
partition-preserving projection, and batch-size independence. Swapping
the image stub for PIL is a one-function change, exactly like the wave
swap-in."""

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


def synth_wav_media(spark, n: int = 64, sample_rate: int = 8000,
                    n_samples: int = 800) -> DataFrame:
    """Deterministic REAL WAV payloads: 16-bit PCM mono sine waves whose
    frequency is keyed by media_id, written with the stdlib ``wave``
    codec inside mapInPandas (Arrow batches of binary rows — the same
    shape a parquet/Iceberg binary column arrives in)."""
    base = spark.range(n).select(F.col("id").alias("media_id"))
    cols = [f.name for f in MEDIA_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                # bin-aligned: 20 Hz steps are exact multiples of the
                # sample_rate/n_samples = 10 Hz FFT resolution at defaults
                freq = 100.0 + (int(mid) % 32) * 20.0
                t = np.arange(n_samples, dtype=np.float64) / sample_rate
                samples = (np.sin(2 * np.pi * freq * t)
                           * 12000).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(samples.tobytes())
                rows.append((int(mid), "audio", buf.getvalue(),
                             "audio/wav", int(mid)))
            yield pd.DataFrame(rows, columns=cols)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode — NOT a stub: parses RIFF/WAVE payloads with
    the stdlib ``wave`` codec and emits per-item audio features
    (sample_rate, channels, frames, duration, RMS, peak) through the
    same mapInPandas interface as the stubbed image path. Undecodable
    payloads degrade to NULL features instead of failing the batch."""
    out_schema = ("media_id long, sample_rate int, n_channels int, "
                  "n_frames long, duration_s double, rms double, peak int")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(payload)) as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        nf = w.getnframes()
                        raw = w.readframes(nf)
                    x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                    peak = int(np.abs(x).max()) if x.size else 0
                    rows.append((mid, sr, nch, nf, nf / sr, rms, peak))
                except (wave.Error, EOFError, AttributeError, TypeError):
                    rows.append((mid, None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=["media_id", "sample_rate",
                                              "n_channels", "n_frames",
                                              "duration_s", "rms", "peak"])

    return media.where(F.col("kind") == "audio") \
        .select("media_id", "payload").mapInPandas(dec, schema=out_schema)


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
