"""Boundary static checks (X3) — per-metric threshold algorithms, fully
native (conditional aggregation over per-series scalars).

Reference: skyline/boundary/boundary_algorithms.py —
- less_than (:124): v_last < trigger;
- greater_than (:146): v_last > trigger;
- detect_drop_off_cliff (:166-318): average of the last 10 datapoints
  over the last value exceeds a range-dependent trigger, with guards.
  NOTE on parity: the reference computes ``len(np.where(arr <= min))``
  which is the length of a TUPLE (always 1), so the
  "frequent-cliff-drops" guards can never fire; we reproduce the
  effective behavior (guards inert) rather than the intended one.
- autoaggregate (T8, :63-122): re-bucket to a fixed step by summation.

Config mirrors settings.BOUNDARY_METRICS tuples
(skyline/settings.py:2505): (metric_pattern, algorithm, expiration,
min_average, min_average_seconds, trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def autoaggregate(df: DataFrame, step_seconds: int, key: str = "conv_id",
                  ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """T8 — fixed-step re-bucketing by summation
    (boundary_algorithms.py:63-122)."""
    return (df.groupBy(key, F.window(ts_col, f"{step_seconds} seconds"))
            .agg(F.sum(value_col).alias(value_col))
            .select(key, F.col("window.start").alias("bucket_start"),
                    F.col(value_col)))


def _per_series_scalars(df: DataFrame, key: str, ts_col: str,
                        value_col: str,
                        min_average_seconds: int = 0) -> DataFrame:
    """last value, last ts, resolution (last two ts), the windowed
    aggregates drop_off_cliff needs, and (when configured) the
    min_average-window mean.

    SINGLE window pass + one group-by on the same key — the per-series
    scalars (t_last, resolution) are attached as unbounded-partition
    window maxima, NEVER materialized into a side table: a join against
    a series-cardinality aggregate would have to broadcast billions of
    rows at extreme series cardinality (the round-1 route-join trap)."""
    worder = Window.partitionBy(key).orderBy(F.col(ts_col).desc())
    wall = (Window.partitionBy(key)
            .orderBy(F.col(ts_col).desc())
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    te = epoch_seconds(F.col(ts_col))
    d = (df.withColumn("__te", te)
         .withColumn("__rn", F.row_number().over(worder))
         .withColumn("v_last",
                     F.max(F.when(F.col("__rn") == 1,
                                  F.col(value_col))).over(wall))
         .withColumn("t_last", F.max("__te").over(wall))
         .withColumn("t_prev",
                     F.max(F.when(F.col("__rn") == 2,
                                  F.col("__te"))).over(wall)))
    d = d.withColumn("resolution",
                     (F.floor("t_last") - F.floor("t_prev")).cast("double"))
    in10 = (F.col("__te") <= F.col("t_last")) & \
           (F.col("__te") > F.col("t_last") - 10 * F.col("resolution"))
    in_ma = (F.col("__te") <= F.col("t_last")) & \
            (F.col("__te") > F.col("t_last") - F.lit(min_average_seconds))
    return d.groupBy(key).agg(
        F.count("*").alias("n"),
        F.max("v_last").alias("v_last"),
        F.max("t_last").alias("t_last"),
        F.max("resolution").alias("resolution"),
        F.count(F.when(in10, 1)).alias("n10"),
        F.sum(F.when(in10, F.col(value_col))).alias("sum10"),
        F.min(F.when(in10, F.col(value_col))).alias("min10"),
        F.max(F.when(in10, F.col(value_col))).alias("max10"),
        F.avg(F.when(in_ma, F.col(value_col))).alias("ma_avg"),
    )


def _cliff_verdict(min_average: float = 0,
                   min_average_seconds: int = 0):
    """detect_drop_off_cliff verdict expression over the per-series
    scalars (boundary_algorithms.py:166-318), incl. the min_average
    guard (:272-289: mean of the last min_average_seconds below
    min_average -> not anomalous). The reference's 'frequent cliff
    drops' guards are inert (len of an np.where TUPLE) and reproduced as
    such; the configured trigger value is unused by the reference here.
    """
    avg10 = F.col("sum10") / F.col("n10")
    last10 = F.when(F.floor(F.col("v_last")) == 0, F.lit(0.1)) \
        .otherwise(F.floor(F.col("v_last")).cast("double"))
    trig = F.lit(15.0)
    trig = F.when(F.col("max10") < 20, avg10 / 2).otherwise(trig)
    trig = F.when(F.col("max10") > 100, F.lit(100.0)).otherwise(trig)
    trig = F.when(F.floor(F.col("v_last")) == 1, F.lit(1.0)).otherwise(trig)
    trig = F.when((F.floor(F.col("v_last")) == 1) & (F.col("max10") < 10),
                  F.lit(0.1)).otherwise(trig)
    trig = F.when((F.floor(F.col("v_last")) == 0) & (avg10 < 1)
                  & (F.col("sum10") < 7), F.lit(7.0)).otherwise(trig)
    verdict = (
        (F.col("n") >= 30) & (F.col("n10") > 3)
        & (F.col("min10") >= 0) & (F.col("max10") != 0)
        & (F.col("min10") != F.col("max10"))
        & (F.floor(avg10 / last10) > trig)
    )
    if min_average > 0 and min_average_seconds > 0:
        verdict = verdict & (F.col("ma_avg") >= min_average)
    return verdict


def boundary_check(df: DataFrame, algorithm: str, trigger: float,
                   key: str = "conv_id", ts_col: str = "ts",
                   value_col: str = "value",
                   min_average: float = 0,
                   min_average_seconds: int = 0) -> DataFrame:
    """Run one boundary algorithm for every series; returns
    (key, v_last, anomalous).

    ``min_average``/``min_average_seconds`` mirror the BOUNDARY_METRICS
    tuple fields (skyline/settings.py:2505): every boundary algorithm
    receives them (boundary_algorithms.py:124,146,165) but only
    detect_drop_off_cliff applies the guard (:272-289)."""
    s = _per_series_scalars(df, key, ts_col, value_col,
                            min_average_seconds=min_average_seconds)
    if algorithm == "less_than":
        verdict = (F.col("n") >= 1) & (F.col("v_last") < trigger)
    elif algorithm == "greater_than":
        verdict = (F.col("n") >= 1) & (F.col("v_last") > trigger)
    elif algorithm == "detect_drop_off_cliff":
        verdict = _cliff_verdict(min_average, min_average_seconds)
    else:
        raise ValueError(f"unknown boundary algorithm {algorithm}")
    return s.select(key, "v_last",
                    F.coalesce(verdict, F.lit(False)).alias("anomalous"))


def boundary_run(parsed: DataFrame, boundary_config: list[dict],
                 key: str = "conv_id", metric_col: str = "metric",
                 ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """BOUNDARY_METRICS-style config runner: each config entry is a dict
    with (metric_pattern, algorithm, trigger, min_average,
    min_average_seconds) mirroring the settings.BOUNDARY_METRICS tuples
    (skyline/settings.py:2505; dispatch skyline/boundary/boundary.py:
    390-435 — every matching (metric, algorithm) pair runs).

    Pattern match uses the reference's substring rule on the metric name
    (boundary.py namespace matching); one scalar pass per distinct
    min_average_seconds, verdicts unioned — series-cardinality rows
    only, no fact re-shuffle per entry."""
    out = None
    for entry in boundary_config:
        pat = entry["metric_pattern"]
        sub = parsed.where(F.col(metric_col).contains(pat))
        v = boundary_check(
            sub, entry["algorithm"], float(entry.get("trigger") or 0),
            key=key, ts_col=ts_col, value_col=value_col,
            min_average=float(entry.get("min_average") or 0),
            min_average_seconds=int(entry.get("min_average_seconds") or 0),
        ).select(
            F.col(key),
            F.lit(entry["algorithm"]).alias("algorithm"),
            F.lit(pat).alias("metric_pattern"),
            "v_last", "anomalous")
        out = v if out is None else out.unionByName(v)
    return out
