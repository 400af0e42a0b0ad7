"""Ionosphere layers — user-defined D / D1 / E boundary rules evaluated
per anomaly, the rule-based sibling of the features-profile match.

Reference: skyline/ionosphere/layers.py:65-713 (run_layer_algorithms).
Quirks reproduced exactly:

- the operator map binds ``'<'`` to ``<=`` and ``'>'`` to ``>=``
  (layers.py:361-366 — ``ops = {'<': operator.le, '>': operator.ge, ...}``);
- the approximately_close tolerance (layers.py:380-439): no tolerance
  when the boundary is ``<= 10`` (and none in the uncovered float gap
  ``(10, 11)`` — the reference tests ``<= 10`` then ``>= 11``),
  ``ceil(10%)`` for ``11 <= b < 30``, ``ceil(5%)`` for ``b >= 30``; the
  tolerance is ADDED to the boundary, and only for D with condition
  ``'>'``/``'>='`` and E with condition ``'<'``/``'<='``;
- the D layer discards (layer not matched) on the LAST datapoint only
  (layers.py:444-459);
- the D1 layer is active when its condition is not the string ``'none'``
  and discards when ANY of the last ``times_in_row`` values breaches
  (layers.py:472-502); a series SHORTER than ``times_in_row`` with no
  breach in its available points raises IndexError in the reference's
  ``timeseries[-count]`` walk, which the bare except converts to a
  discard — reproduced as the ``d1_times > n_points`` discard;
- the E layer matches when ANY of the last ``times_in_row`` values
  satisfies the condition (layers.py:508-542; the loop breaks on the
  first match, so a short series behaves as any-over-available);
- Es / F1 / F2 are "not implemented yet" in the reference too
  (layers.py:551-556) — config rows for them are ignored;
- the approx_close label re-checks the ORIGINAL boundaries and clears
  the flag when the match would have happened without the tolerance
  (layers.py:601-661).

The autoaggregate pre-step (layers.py:252-332) runs only under
``settings.BOUNDARY_AUTOAGGRERATION`` (default off) and is available
separately as :func:`skyline_spark.operators.boundary.autoaggregate`.

Scale: the layers config is dimension-sized (a rule per trained metric)
and is broadcast; the series side needs only the last
``max(times_in_row)`` points per series — one row_number window over the
(conv_id, metric) partitioning every per-series kernel already uses, a
filter, and a partial-aggregable groupBy. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds

#: config columns run_layer_algorithms expects on the layers DataFrame
LAYER_CONFIG_COLUMNS = (
    "layer_id", "d_condition", "d_boundary_limit",
    "d1_condition", "d1_boundary_limit", "d1_boundary_times",
    "e_condition", "e_boundary_limit", "e_boundary_times",
)


def layer_op(condition: Column, value: Column, boundary: Column) -> Column:
    """The reference's funky operator map (layers.py:361-366): ``'<'``
    and ``'<='`` both mean ``<=``; ``'>'`` and ``'>='`` both mean
    ``>=``."""
    return (F.when(condition.isin("<", "<="), value <= boundary)
            .when(condition.isin(">", ">="), value >= boundary)
            .when(condition == "==", value == boundary)
            .when(condition == "!=", value != boundary)
            .otherwise(F.lit(False)))


def approx_boundary(condition: Column, boundary: Column,
                    grow_conditions: tuple) -> tuple:
    """(adjusted_boundary, tolerance_applied) under
    IONOSPHERE_LAYERS_USE_APPROXIMATELY_CLOSE (layers.py:380-439):
    ceil(boundary * pct / 100) added to the boundary, pct = 10 for
    11 <= b < 30, 5 for b >= 30, none otherwise; only for the layer's
    growing conditions (D: '>'/'>='; E: '<'/'<=')."""
    pct = (F.when((boundary >= 11) & (boundary < 30), F.lit(10.0))
           .when(boundary >= 30, F.lit(5.0)))
    applied = condition.isin(*grow_conditions) & pct.isNotNull()
    tol = F.ceil(boundary / 100.0 * pct).cast("double")
    adjusted = F.when(applied, boundary + tol).otherwise(boundary)
    return adjusted, applied


def run_layer_algorithms(series: DataFrame, layers: DataFrame,
                         use_approximately_close: bool = True,
                         key_cols: tuple = ("conv_id", "metric"),
                         join_on: str = "metric",
                         ts_col: str = "ts",
                         value_col: str = "value") -> DataFrame:
    """Evaluate every configured layer against every series, returning
    one row per (series, layer): ``layer_matched`` (True = the layer
    suppressed the anomaly, the reference's ``not_anomalous``),
    ``approx_close`` (1 when the approximately_close tolerance was
    needed for the match, layers.py:601-661), plus the
    ``anomaly_timestamp`` / ``anomalous_datapoint`` pair the reference
    records in ionosphere_layers_matched (layers.py:672-687).

    ``layers`` must carry ``join_on`` plus LAYER_CONFIG_COLUMNS; a
    ``'none'`` d1_condition deactivates D1 exactly as in the reference.
    """
    d_adj, d_applied = approx_boundary(
        F.col("d_condition"), F.col("d_boundary_limit"), (">", ">="))
    e_adj, e_applied = approx_boundary(
        F.col("e_condition"), F.col("e_boundary_limit"), ("<", "<="))
    if not use_approximately_close:
        d_adj, e_adj = F.col("d_boundary_limit"), F.col("e_boundary_limit")
        d_applied = e_applied = F.lit(False)
    cfg = (layers.withColumn("__d_adj", d_adj)
           .withColumn("__e_adj", e_adj)
           .withColumn("__d_applied", d_applied)
           .withColumn("__e_applied", e_applied)
           .withColumn("__d1_active", F.col("d1_condition") != F.lit("none")))

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    pts = (series
           .withColumn("__rn", F.row_number().over(w))
           .withColumn("__n", F.count(F.lit(1)).over(
               Window.partitionBy(*key_cols))))

    j = pts.join(F.broadcast(cfg), on=join_on, how="inner")
    keep = F.greatest(
        F.lit(1),
        F.when(F.col("__d1_active"), F.col("d1_boundary_times")).otherwise(1),
        F.col("e_boundary_times"))
    j = j.where(F.col("__rn") <= keep)

    val = F.col(value_col)
    group_keys = [c for c in key_cols if c != join_on] + [join_on, "layer_id"]
    agg = j.groupBy(*group_keys).agg(
        F.max(F.when(F.col("__rn") == 1, val)).alias("__last_value"),
        F.max(F.when(F.col("__rn") == 1,
                     epoch_seconds(F.col(ts_col)))).alias("__last_ts"),
        F.max("__n").alias("__n"),
        F.max(F.when(
            F.col("__d1_active")
            & (F.col("__rn") <= F.col("d1_boundary_times"))
            & layer_op(F.col("d1_condition"), val,
                       F.col("d1_boundary_limit")),
            F.lit(1)).otherwise(0)).alias("__d1_breach"),
        F.max(F.when(
            (F.col("__rn") <= F.col("e_boundary_times"))
            & layer_op(F.col("e_condition"), val, F.col("__e_adj")),
            F.lit(1)).otherwise(0)).alias("__e_match"),
        F.max(F.when(
            (F.col("__rn") <= F.col("e_boundary_times"))
            & layer_op(F.col("e_condition"), val,
                       F.col("e_boundary_limit")),
            F.lit(1)).otherwise(0)).alias("__e_match_orig"),
        *(F.first(c).alias(c) for c in
          ("d_condition", "d_boundary_limit", "d1_boundary_times",
           "__d_adj", "__d_applied", "__e_applied", "__d1_active")))

    d_breach = layer_op(F.col("d_condition"), F.col("__last_value"),
                        F.col("__d_adj"))
    d_breach_orig = layer_op(F.col("d_condition"), F.col("__last_value"),
                             F.col("d_boundary_limit"))
    # the reference's IndexError-on-short-series discard (layers.py:497-502)
    d1_discard = F.col("__d1_active") & (
        (F.col("__d1_breach") == 1)
        | (F.col("d1_boundary_times") > F.col("__n")))
    matched = (~d_breach) & (~d1_discard) & (F.col("__e_match") == 1)
    # layers.py:601-661 — clear approx_close when the original
    # boundaries would have matched anyway
    orig_ok = ((F.col("__d_applied") & ~d_breach_orig)
               | (F.col("__e_applied") & (F.col("__e_match_orig") == 1)))
    approx_close = F.when(
        matched & (F.col("__d_applied") | F.col("__e_applied")) & ~orig_ok,
        F.lit(1)).otherwise(F.lit(0))

    return agg.select(
        *group_keys,
        matched.alias("layer_matched"),
        approx_close.alias("approx_close"),
        F.col("__last_ts").cast("long").alias("anomaly_timestamp"),
        F.col("__last_value").alias("anomalous_datapoint"))
