"""Thunder stale-metrics check — the webapp ``/api?stale_metrics``
and metrics_manager staleness sweep.

Reference: skyline/functions/thunder/stale_metrics.py:18-520
(thunder_stale_metrics) + webapp/backend.py:3150 (namespace_stale_metrics).
The Redis/cluster plumbing distilled to its decision core:

- per metric, the last timestamp (int-truncated epoch) decides: stale
  iff ``last < now - stale_period``, where metrics matched by
  CUSTOM_STALE_PERIOD use their namespace's custom period
  (stale_metrics.py:368-369 splits the population into custom and
  default groups) and everything else uses settings.STALE_PERIOD;
- sparsely populated metrics (data_sparsity below
  SPARSELY_POPULATED_PERCENTAGE) are excluded when
  ``exclude_sparsely_populated`` (the webapp toggle;
  stale_metrics.py:370-394);
- the parent namespace is the metric's first dot element, and the
  output carries ``stale_for = now - last_timestamp``
  (backend.py:3214-3218);
- the alerted-on/recovered bookkeeping is Redis alert state with no
  batch analogue and is out of scope (the webapp path clears
  ``alerted_on_stale_metrics`` anyway, stale_metrics.py:229-230).

Scale: one per-series aggregate for the last timestamp + the sparsity
operator's aggregates; the custom-period map is config-sized (a CASE
expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def thunder_stale_metrics(valid: DataFrame, now_epoch: float,
                          stale_period: int,
                          full_duration: int,
                          custom_stale_periods: dict | None = None,
                          sparsity_threshold: float = 40.0,
                          exclude_sparsely_populated: bool = True,
                          key_cols=("conv_id", "metric"),
                          ts_col: str = "ts") -> DataFrame:
    """The stale metrics per namespace: (parent_namespace, conv_id,
    metric, last_timestamp, stale_for) for every series whose last
    point is older than its (custom or default) stale period, minus
    the sparsely-populated exclusions."""
    from skyline_spark.operators.preprocess import determine_data_sparsity

    last = valid.groupBy(*key_cols).agg(
        F.max(F.floor(epoch_seconds(F.col(ts_col))).cast("long"))
        .alias("last_timestamp"))
    ns = F.split(F.col("metric"), "\\.").getItem(0)
    period = F.lit(int(stale_period))
    for n, p in (custom_stale_periods or {}).items():
        period = F.when(ns == n, F.lit(int(p))).otherwise(period)
    out = last.withColumn("parent_namespace", ns) \
        .withColumn("__period", period)
    if exclude_sparsely_populated:
        sp = determine_data_sparsity(valid, full_duration,
                                     key_cols=key_cols, ts_col=ts_col)
        out = out.join(sp.select(*key_cols, "data_sparsity"),
                       list(key_cols))
        out = out.where(F.col("data_sparsity")
                        >= F.lit(float(sparsity_threshold)))
    return (out.where(F.col("last_timestamp")
                      < F.lit(float(now_epoch)) - F.col("__period"))
            .select("parent_namespace", *key_cols, "last_timestamp",
                    (F.lit(int(now_epoch)) - F.col("last_timestamp"))
                    .cast("long").alias("stale_for")))
