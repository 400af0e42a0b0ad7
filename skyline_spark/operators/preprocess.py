"""Standalone native (JVM-side) variants of the per-series deterministic
transforms T1-T8 (SURVEY.md §2.3).

The production pipeline performs these *inside* the analyze group (one
shuffle total); these DataFrame forms exist because each is a first-class
operator of the reference and each is independently oracle-checkable
against ANSI SQL. All are pure window/groupBy expressions — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def sort_dedup(df: DataFrame, key: str = "conv_id", ts_col: str = "ts",
               order_col: str = "turn_idx") -> DataFrame:
    """T1+T2 — stable sort by (key, ts) keeping the FIRST point per
    (key, ts) by the stable order column.

    Refs: sort skyline/skyline_functions.py:2631; dedup-first-per-ts
    skyline/analyzer/analyzer.py:575-581 (uniq_datapoints keeps first),
    roomba variant skyline/horizon/roomba.py:300-307.
    """
    w = Window.partitionBy(key, ts_col).orderBy(F.col(order_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def retention_trim(df: DataFrame, full_duration: int, now_epoch: float,
                   ts_col: str = "ts") -> DataFrame:
    """T3 — keep points with ``ts > now - full_duration``
    (skyline/horizon/roomba.py:300-307). A plain predicate: Catalyst
    pushes it into the scan (partition pruning on a ts-partitioned
    table)."""
    return df.filter(epoch_seconds(F.col(ts_col)) > F.lit(now_epoch - full_duration))


def non_negative_derivative(df: DataFrame, key: str = "conv_id",
                            ts_col: str = "ts", value_col: str = "value"
                            ) -> DataFrame:
    """T4 — counter -> rate with Graphite nonNegativeDerivative semantics
    (skyline/skyline_functions.py:1643-1671): per-point delta vs the
    previous point; negative deltas (counter resets) are DROPPED, and the
    first point has no delta. Window lag + filter, no Python."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    delta = F.col(value_col) - F.lag(value_col).over(w)
    return (df.withColumn("__delta", delta)
            .filter(F.col("__delta").isNotNull() & (F.col("__delta") >= 0))
            .withColumn(value_col, F.col("__delta")).drop("__delta"))


def monotonicity_flags(df: DataFrame, key: str = "conv_id",
                       ts_col: str = "ts", value_col: str = "value"
                       ) -> DataFrame:
    """T5 — flag strictly-increasing non-negative series as derivative
    metrics (skyline/skyline_functions.py:1673-1708): needs >= 90 points,
    no negatives, not constant, nonzero sum of the tail, and
    all diffs >= 0. Pure aggregates over a lag column."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    with_diff = df.withColumn("__diff", F.col(value_col) - F.lag(value_col).over(w))
    # note: the reference's sum(tail)==0 exclusion is implied by the
    # other three conditions for non-negative monotone series, so it
    # needs no order-dependent aggregate here
    return (with_diff.groupBy(key).agg(
        F.count("*").alias("__n"),
        F.min(value_col).alias("__minv"),
        F.count_distinct(value_col).alias("__nd"),
        F.min(F.when(F.col("__diff") < 0, 0).otherwise(1)).alias("__all_nonneg"),
    ).select(
        F.col(key),
        ((F.col("__n") >= 90) & (F.col("__minv") >= 0) & (F.col("__nd") > 1)
         & (F.col("__all_nonneg") == 1)).alias("is_strictly_increasing"),
    ))


def downsample(df: DataFrame, resolution_seconds: int,
               method: str = "mean", key: str | list[str] = "conv_id",
               ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """T7 — re-bucket each series to a fixed resolution with mean (gauge)
    or sum (derivative) aggregation
    (skyline/functions/timeseries/downsample.py:19-70). Tumbling
    F.window — map-side partial aggregation, single shuffle."""
    fn = F.avg if method == "mean" else F.sum
    keys = [key] if isinstance(key, str) else list(key)
    return (df.groupBy(*keys, F.window(ts_col, f"{resolution_seconds} seconds"))
            .agg(fn(value_col).alias(value_col))
            .select(*keys, F.col("window.start").alias("bucket_start"),
                    F.col(value_col)))


def fill_gaps(df: DataFrame, resolution_seconds: int, method: str = "zero",
              key: str = "conv_id", ts_col: str = "ts",
              value_col: str = "value") -> DataFrame:
    """T6 — fill missing timestamps on a dense per-series lattice with
    either ``zero`` or ``last_known_value``
    (skyline/functions/timeseries/full_duration_timeseries_fill.py:13-200;
    applied in skyline/analyzer/analyzer.py:3595-3628 and
    skyline/flux/worker.py:675-681).

    Reference semantics: timestamps are floor-aligned to the resolution
    (:99-107, the LAST raw point of a bucket wins the dict overwrite
    :164-166), the lattice spans first..last aligned timestamp (:138-144),
    and gaps take 0 or the previous known value (seeded with the first
    value, :146). All native: sequence/explode lattice + left join +
    ``last(value, ignoreNulls)`` running window — no Python, one shuffle
    on the series key.
    """
    if method not in ("zero", "last_known_value"):
        raise ValueError(f"unknown fill method {method!r}")
    te = epoch_seconds(F.col(ts_col))
    aligned = df.withColumn(
        "__epoch",
        (F.floor(te / resolution_seconds) * resolution_seconds).cast("long"))
    # last raw point per aligned bucket wins (reference dict overwrite)
    wlast = Window.partitionBy(key, "__epoch").orderBy(te.desc())
    pts = (aligned.withColumn("__rn", F.row_number().over(wlast))
           .where(F.col("__rn") == 1)
           .select(key, "__epoch", value_col))
    spans = pts.groupBy(key).agg(F.min("__epoch").alias("t0"),
                                 F.max("__epoch").alias("t1"))
    lattice = spans.select(
        key, F.explode(F.sequence("t0", "t1", F.lit(resolution_seconds))
                       ).alias("__epoch"))
    out = lattice.join(pts, [key, "__epoch"], "left")
    if method == "zero":
        filled = F.coalesce(F.col(value_col), F.lit(0.0))
    else:
        wff = (Window.partitionBy(key).orderBy(F.col("__epoch").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
        filled = F.last(F.col(value_col), ignorenulls=True).over(wff)
    return out.select(
        key, F.col("__epoch").cast("timestamp").alias(ts_col),
        filled.alias(value_col))


def fill_zero(df: DataFrame, resolution_seconds: int, key: str = "conv_id",
              ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """T6 zero-fill variant (see fill_gaps)."""
    return fill_gaps(df, resolution_seconds, "zero", key, ts_col, value_col)


def fill_forward(df: DataFrame, resolution_seconds: int,
                 key: str = "conv_id", ts_col: str = "ts",
                 value_col: str = "value") -> DataFrame:
    """T6 last_known_value variant (see fill_gaps)."""
    return fill_gaps(df, resolution_seconds, "last_known_value",
                     key, ts_col, value_col)


def determine_data_frequency(df: DataFrame, key_cols=("conv_id", "metric"),
                             ts_col: str = "ts") -> DataFrame:
    """Per-series metric resolution
    (skyline/functions/timeseries/determine_data_frequency.py:17-196):

    - the sample is the last 101 timestamps when the series has more
      than FULLY_POPULATED_PERCENTAGE=94 of them (i.e. n >= 95), else
      the whole series;
    - timestamps are int()-truncated before differencing;
    - the resolution is the most common consecutive delta; with
      several distinct deltas BOTH reference branches (all-counts-equal
      and otherwise) reduce to the MINIMUM delta among the max-count
      ones (the Counter insertion-order tie only survives the
      single-delta case, where it is moot);
    - the Prometheus snap: a resolution in [1, 68] that is not 60 and
      not a standard scrape interval {1,2,3,5,6,10,12,15,20,30} is set
      to 60 (determine_data_frequency.py:160-185).

    Native windows + one partial-aggregable groupBy per stage; no
    Python."""
    eps = F.floor(epoch_seconds(F.col(ts_col))).cast("long")
    wdesc = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    wall = Window.partitionBy(*key_cols)
    wasc = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    d = (df.withColumn("__e", eps)
         .withColumn("__rn", F.row_number().over(wdesc))
         .withColumn("__n", F.count(F.lit(1)).over(wall)))
    sample = d.where((F.col("__n") < 95) | (F.col("__rn") <= 101))
    diffs = (sample
             .withColumn("__prev", F.lag("__e").over(wasc))
             .where(F.col("__prev").isNotNull())
             .select(*key_cols,
                     (F.col("__e") - F.col("__prev")).alias("res")))
    counts = diffs.groupBy(*key_cols, "res").agg(
        F.count(F.lit(1)).alias("c"))
    wk = Window.partitionBy(*key_cols)
    best = (counts
            .withColumn("__maxc", F.max("c").over(wk))
            .where(F.col("c") == F.col("__maxc"))
            .groupBy(*key_cols)
            .agg(F.min("res").alias("__res")))
    keep = F.col("__res").isin(1, 2, 3, 5, 6, 10, 12, 15, 20, 30)
    snapped = F.when(
        (F.col("__res") != 60) & ~keep
        & (F.col("__res") >= 1) & (F.col("__res") <= 68),
        F.lit(60)).otherwise(F.col("__res"))
    return best.select(*key_cols,
                       snapped.cast("int").alias("metric_resolution"))


def determine_data_sparsity(df: DataFrame, full_duration: int,
                            key_cols=("conv_id", "metric"),
                            ts_col: str = "ts") -> DataFrame:
    """Per-series data sparsity
    (skyline/functions/timeseries/determine_data_sparsity.py):
    datapoints present / (full_duration / resolution) * 100, rounded to
    2, with the resolution from determine_data_frequency — the
    check_data_sparsity signal metrics_manager tracks."""
    res = determine_data_frequency(df, key_cols=key_cols, ts_col=ts_col)
    n = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    joined = n.join(res, list(key_cols))
    expected = F.lit(float(full_duration)) / F.col("metric_resolution")
    sparsity = F.round(F.col("__n") / expected * 100.0, 2) + F.lit(0.0)
    return joined.select(*key_cols, "metric_resolution",
                         sparsity.alias("data_sparsity"))


def normalized_variance(df: DataFrame, key_cols=("conv_id", "metric"),
                        value_col: str = "value") -> DataFrame:
    """Per-series variance of the min-max-normalized values, rounded to
    4 (skyline/functions/timeseries/normalized_variance.py — the
    luminosity metric-classification signal). A constant series is NULL
    (the reference's nan: its 0/0 normalization poisons np.var)."""
    w = Window.partitionBy(*key_cols)
    v = F.col(value_col)
    d = (df.withColumn("__mx", F.max(v).over(w))
         .withColumn("__mn", F.min(v).over(w)))
    # try_divide: a constant series is 0/0 — the reference's nan, and
    # the CASE guard below nulls its output anyway, but under Spark 4
    # ANSI a plain `/` ABORTS the whole query when any constant series
    # exists in the input (inherited r07 defect, seen at sf0.001 where
    # the Boring conv is all-constant). NULL rows feed var_pop
    # identically to the guarded path wherever the query succeeded
    # before, so defined results are unchanged.
    norm = F.try_divide(v - F.col("__mn"), F.col("__mx") - F.col("__mn"))
    return (d.groupBy(*key_cols)
            .agg((F.round(F.var_pop(norm), 4) + F.lit(0.0))
                 .alias("normalized_variance"),
                 F.max("__mx").alias("__mx2"), F.min("__mn").alias("__mn2"))
            .select(*key_cols,
                    F.when(F.col("__mx2") == F.col("__mn2"), F.lit(None))
                    .otherwise(F.col("normalized_variance"))
                    .alias("normalized_variance")))
