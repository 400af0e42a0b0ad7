"""Deterministic corpus mixing — per-stratum hash-threshold sampling.

The scale-correct way to downsample/mix a 100 TB corpus by language or
source: keep a document iff a stable hash of its id, mapped to [0, 1),
falls under the stratum's quota fraction. No shuffle, no global sort,
no per-stratum row_number skew (a top-k-per-stratum window would funnel
each stratum through one partition); embarrassingly parallel and
reproducible across engines (md5-prefix hash, DuckDB-twin-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: denominator for the 60-bit md5-prefix -> [0, 1) mapping
_HASH_DEN = float(1 << 60)


def hash_fraction(id_col: Column) -> Column:
    """Stable uniform [0, 1) from md5(id) — the first 15 hex digits as
    a 60-bit integer over 2^60."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10)
    return h.cast("double") / F.lit(_HASH_DEN)


def stratified_hash_sample(docs: DataFrame, fractions: dict,
                           strata_col: str = "lang",
                           default_fraction: float = 0.0,
                           id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff hash_fraction(id) < the stratum's quota.
    ``fractions`` maps stratum value -> keep fraction; strata absent
    from the map use ``default_fraction``."""
    quota = F.lit(float(default_fraction))
    for value, frac in fractions.items():
        quota = F.when(F.col(strata_col) == value,
                       F.lit(float(frac))).otherwise(quota)
    u = hash_fraction(F.col(id_col))
    return (docs.withColumn("sample_u", F.round(u, 6) + F.lit(0.0))
            .where(u < quota))
