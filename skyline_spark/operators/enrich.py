"""Enrich stage — attach per-series namespace/alert metadata via a
broadcast dimension join.

The reference's enrich state is a set of Redis hashes built by
metrics_manager from the static settings.ALERTS tuples
(skyline/analyzer/metrics_manager.py:1885-1896 smtp alerter metrics,
:1973 mirage.unique_metrics, :2293-2296 per-metric mirage resolutions;
source of truth skyline/settings.py:1149-1177).

Spark-first design: the pattern match
(skyline/matched_or_regexed_in_list.py:18 — per pattern in list order:
absolute match, substring, dotted-element subset, regex; first wins) is
precomputed once over the *distinct metric names* (dimension-sized, tiny
vs. the fact table), producing a resolved exact-key dimension that is
broadcast-joined to the fact rows. The match itself runs as native SQL
expressions over the small cross join — no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _match_condition(metric_col, pattern_col):
    """One pattern's match predicate, mirroring
    matched_or_regexed_in_list.py:89-137 (absolute | substring |
    element-subset | regex-prefix-match)."""
    absolute = metric_col == pattern_col
    substring = metric_col.contains(pattern_col)
    pat_elems = F.split(pattern_col, r"\.")
    met_elems = F.split(metric_col, r"\.")
    elements = F.size(F.array_except(pat_elems, met_elems)) == 0
    # python re.match anchors at the start only
    regex = F.rlike(metric_col, F.concat(F.lit("^(?:"), pattern_col, F.lit(")")))
    return absolute | substring | elements | regex


def resolve_metric_dimension(metrics: DataFrame, alert_config: DataFrame) -> DataFrame:
    """metrics(metric) × alert_config(namespace_pattern, …) -> resolved
    per-metric dimension with first-matching-pattern-in-list-order
    semantics.

    ``alert_config`` must carry a ``priority`` column (its row order in
    settings.ALERTS); if missing, one is derived from input order.
    """
    if "priority" not in alert_config.columns:
        alert_config = alert_config.withColumn(
            "priority", F.monotonically_increasing_id())
    cond = _match_condition(F.col("m.metric"), F.col("c.namespace_pattern"))
    joined = (
        metrics.alias("m")
        .join(F.broadcast(alert_config.alias("c")), cond, "left")
    )
    first_match = F.row_number().over(
        Window.partitionBy("m.metric")
        .orderBy(F.col("c.priority").asc_nulls_last()))
    return (
        joined.withColumn("__rn", first_match).filter(F.col("__rn") == 1)
        .select(
            F.col("m.metric").alias("metric"),
            F.col("c.namespace_pattern").alias("matched_pattern"),
            F.col("c.alerter").alias("alerter"),
            F.col("c.expiration_time").alias("expiration_time"),
            F.col("c.second_order_resolution_hours").alias("second_order_resolution_hours"),
            F.coalesce(F.col("c.is_derivative"), F.lit(False)).alias("is_derivative"),
            F.col("c.custom_stale_period").alias("custom_stale_period"),
            F.col("c.second_order_resolution_hours").isNotNull().alias("is_mirage"),
            (F.col("c.alerter") == "smtp").alias("is_smtp_alerter"),
        )
    )


def rules_from_config(alert_config: DataFrame) -> list[dict]:
    """Collect the (tiny, config-sized) alert dimension to a plain list
    of rule dicts in priority order — for closure-side resolution inside
    the analyze UDF (the analogue of the analyzer resolving per-metric
    settings in-process; avoids a whole parse scan + broadcast sub-job
    per run)."""
    if "priority" not in alert_config.columns:
        alert_config = alert_config.withColumn(
            "priority", F.monotonically_increasing_id())
    # r08: sort the config-sized rows driver-side. A Spark orderBy on a
    # non-deterministic column (monotonically_increasing_id) cannot be
    # folded to a local sort and runs a full range-partitioning job
    # (sampling pass + sort) per pipeline construction — ~0.5 s of pure
    # overhead for a handful of rows. Same order: ascending priority,
    # nulls first (the orderBy default).
    rows = alert_config.collect()
    rows.sort(key=lambda r: (r["priority"] is not None, r["priority"]))
    return [r.asDict() for r in rows]


def match_rules_py(metric: str | None, rules: list[dict]) -> dict | None:
    """Python twin of matched_or_regexed_in_list.py:18 — per rule in
    list order: absolute match, substring, dotted-element subset, then
    anchored regex; first match wins."""
    import re as _re
    if metric is None:
        return None
    m_elems = set(metric.split("."))
    for r in rules:
        pat = r["namespace_pattern"]
        if metric == pat or pat in metric:
            return r
        if set(pat.split(".")) <= m_elems:
            return r
        try:
            if _re.match(pat, metric):
                return r
        except _re.error:
            continue
    return None


def enrich(parsed: DataFrame, alert_config: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Attach the resolved dimension to parsed fact rows.

    Returns (enriched_facts, resolved_dim). The dim is derived from the
    facts' own distinct metrics (the analogue of metrics.unique_metrics,
    skyline/horizon/worker.py:282) and broadcast for the join — at
    10^12-row scale the distinct-metric set remains dimension-sized, so
    the fact-side join is shuffle-free.
    """
    metrics = parsed.select("metric").where(F.col("metric").isNotNull()).distinct()
    dim = resolve_metric_dimension(metrics, alert_config)
    enriched = parsed.join(F.broadcast(dim), "metric", "left")
    return enriched, dim
