"""Small shared native-expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column) -> Column:
    """Timestamp -> fractional epoch seconds, handling both TIMESTAMP and
    TIMESTAMP_NTZ inputs (parquet tables here are NTZ; session tz is UTC,
    so NTZ -> LTZ preserves the wall-clock instant and matches DuckDB's
    ``epoch(ts)``)."""
    return col.cast("timestamp").cast("double")
