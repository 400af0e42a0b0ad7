"""Explicit skew handling (north_rule: 'explicit skew handling — AQE
skew join + salt keys').

Three mechanisms, layered:

1. **AQE skew join** — enabled session-wide
   (``spark.sql.adaptive.skewJoin.enabled``): splits oversized join
   partitions at runtime; covers the verdicts->turns route join when
   the verdict side is too large to broadcast.
2. **Salted join** (here) — deterministic fallback for pathological
   hot keys: replicate the small/dimension side S× and spread the hot
   fact rows across S sub-keys. One extra narrow column, no data
   motion beyond the join's own shuffle.
3. **Bounded groups** — the analyze group-by cannot be salted (the
   per-series statistics are order-dependent and non-algebraic over
   the WHOLE series), so group size is bounded instead: the retention
   trim (native pre-filter, roomba semantics) caps any hot
   conversation at full_duration worth of turns, and
   ``cap_series_tail`` enforces a hard per-series row cap (keep the
   most recent N points) when cadence alone cannot bound it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_left_join(facts: DataFrame, dim: DataFrame, key: str,
                     salt_buckets: int = 16,
                     salt_source: str | None = None) -> DataFrame:
    """facts LEFT JOIN dim ON key, with the dim side exploded over
    ``salt_buckets`` salt values and the fact side assigned a
    deterministic salt from ``salt_source`` (default: a stable hash of
    all fact columns' row identity is avoided — pass a discriminating
    column such as turn_idx). Hot fact keys spread across
    ``salt_buckets`` reducers instead of one."""
    salt_source = salt_source or facts.columns[1]
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source)),
                         F.lit(salt_buckets)).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = salted_facts.join(salted_dim, [key, "__salt"], "left")
    return out.drop("__salt")


def cap_series_tail(df: DataFrame, max_points: int, key: str = "conv_id",
                    ts_col: str = "ts", order_col: str = "turn_idx"
                    ) -> DataFrame:
    """Keep only the most recent ``max_points`` rows per series — the
    hard bound on analyze group size (roomba's retention cap by count
    rather than by time). Window row_number over (ts desc, order desc);
    Spark's WindowGroupLimit pushes the limit into the sort."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(),
                                        F.col(order_col).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_points).drop("__rn"))


def key_histogram(df: DataFrame, key: str = "conv_id",
                  top_n: int = 20) -> DataFrame:
    """Skew diagnostics: the heaviest keys and their row counts —
    feeds the decision between broadcast / AQE / salting."""
    return (df.groupBy(key).count()
            .orderBy(F.col("count").desc()).limit(top_n))
