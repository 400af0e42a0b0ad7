"""Webapp read path — the Panorama anomaly-browsing API (§3.3).

Reference: skyline/webapp/backend.py:128-720 (``panorama_request``) —
the Flask endpoint that assembles a MySQL SELECT over the ``anomalies``
table from request args, plus webapp.py's "latest anomalies" default
view.  The reference stores one MySQL row per detected anomaly
(``skyline/panorama/panorama.py`` inserts ``metric_id,
anomalous_datapoint, anomaly_timestamp, full_duration,
created_timestamp``); the webapp only ever reads it back with the
filter/order/limit grammar ported here.

Spark shape: the anomaly store is a DataFrame derived from the analyze
verdicts (one row per anomalous, non-exception series), and each
request is a declarative filter -> orderBy -> limit plan over it.  The
MySQL autoincrement ``id`` is reproduced deterministically as
``row_number() OVER (ORDER BY anomaly_timestamp, metric, conv_id)`` —
insertion order in the reference IS detection-time order, and the
tie-break by name makes the id reproducible across engines.  The id
window is global (single partition) by design: like the MySQL
autoincrement it mirrors, it runs over the *anomalies* (already reduced
by the kernel to a tiny fraction of input rows), never over raw turns,
so it stays driver-feasible at any input scale.

Quirks ported faithfully from backend.py:

- an unknown ``metric`` name adds NO filter (the found_id lookup fails
  and the WHERE clause is silently skipped, backend.py:255-283);
- an unmatched ``metric_like`` pattern yields ``WHERE metric_id IN
  (0)`` — an empty result, not an unfiltered one (backend.py:335-338);
- ``count_by_metric`` RESETS the query string, discarding any
  metric/metric_like filter parsed before it, while from/until
  timestamps (parsed after) still apply (backend.py:357-367);
- a non-integer ``limit`` falls back to 10 (backend.py:662-673);
  ``order`` is DESC unless exactly 'ASC' (backend.py:675-685);
- search: ``ORDER BY id {order} LIMIT {limit}``; count:
  ``GROUP BY metric_id ORDER BY COUNT(*) {order} LIMIT {limit}``
  (backend.py:686-694) — the count ordering adds a metric_id
  tie-break here so the limited prefix is deterministic (MySQL leaves
  ties arbitrary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def metric_dimension(parsed: DataFrame) -> DataFrame:
    """The ``metrics`` dimension table (MySQL ``metrics(id, metric)``,
    populated at ingestion): every distinct metric base_name with a
    deterministic dense-rank id.  Config-sized (one row per metric
    name, not per series)."""
    return (parsed.where(F.col("metric").isNotNull())
            .select("metric").distinct()
            .withColumn("metric_id",
                        F.dense_rank().over(Window.orderBy("metric"))))


def anomalies_table(verdicts: DataFrame, metrics: DataFrame,
                    full_duration: int, now: float) -> DataFrame:
    """The ``anomalies`` store (panorama.py insert columns): one row
    per anomalous non-exception verdict with the deterministic
    autoincrement stand-in id.  ``metrics`` is the
    :func:`metric_dimension` output (tiny -> broadcast join)."""
    anom = (verdicts
            .where(F.col("anomalous") & F.col("exception").isNull()
                   & F.col("metric").isNotNull())
            .join(F.broadcast(metrics), "metric"))
    w = Window.orderBy("anomaly_timestamp", "metric", "conv_id")
    return (anom
            .select(
                F.col("conv_id"),
                F.col("metric_id"),
                F.col("metric"),
                F.col("datapoint").alias("anomalous_datapoint"),
                F.col("last_ts").cast("bigint").alias("anomaly_timestamp"),
                F.lit(int(full_duration)).cast("bigint")
                    .alias("full_duration"),
                F.lit(int(now)).cast("bigint").alias("created_timestamp"))
            .withColumn("id", F.row_number().over(w).cast("bigint")))


_SEARCH_COLS = ("id", "metric_id", "metric", "anomalous_datapoint",
                "anomaly_timestamp", "full_duration", "created_timestamp")


def panorama_request(anomalies: DataFrame, metrics: DataFrame, *,
                     metric: str | None = None,
                     metric_like: str | None = None,
                     from_timestamp: int | str | None = None,
                     until_timestamp: int | str | None = None,
                     count_by_metric: bool = False,
                     limit: int | str = 10,
                     order: str = "DESC") -> DataFrame:
    """backend.py:128-720 — one Panorama request as a DataFrame plan.

    The metric / metric_like lookups hit the config-sized metrics
    dimension driver-side (the reference's ``metric_id_from_base_name``
    / ``metric_ids_from_metric_like`` MySQL lookups); everything else
    stays distributed.  Timestamp args accept epoch ints, or the
    reference's two string forms ('%Y%m%d %H:%M' then '%Y-%m-%d
    %H:%M', backend.py:373-386) interpreted as UTC for determinism
    (the reference uses server-local mktime)."""
    try:
        limit = int(limit)
    except (TypeError, ValueError):
        limit = 10
    order_desc = (order != "ASC")
    from_ts = _epoch(from_timestamp)
    until_ts = _epoch(until_timestamp)

    filtered = anomalies
    if isinstance(metric, str) and metric != "all":
        ids = [r.metric_id for r in
               metrics.where(F.col("metric") == metric).collect()]
        if ids:
            filtered = filtered.where(F.col("metric_id") == ids[0])
        # else: found_id falsy -> no filter added (reference quirk)
    if isinstance(metric_like, str) and metric_like != "all":
        ids = [r.metric_id for r in
               metrics.where(F.col("metric").like(metric_like)).collect()]
        filtered = filtered.where(
            F.col("metric_id").isin(ids) if ids else F.lit(False))

    if count_by_metric:
        # the reference resets the query string here, dropping any
        # metric/metric_like filter parsed before this arg
        filtered = anomalies
    if from_ts is not None:
        filtered = filtered.where(F.col("anomaly_timestamp") >= from_ts)
    if until_ts is not None:
        filtered = filtered.where(F.col("anomaly_timestamp") <= until_ts)

    if count_by_metric:
        cnt = (filtered.groupBy("metric_id")
               .agg(F.count(F.lit(1)).alias("n")))
        keys = ([F.col("n").desc(), F.col("metric_id")] if order_desc
                else [F.col("n").asc(), F.col("metric_id")])
        return cnt.orderBy(*keys).limit(limit)

    key = F.col("id").desc() if order_desc else F.col("id").asc()
    return filtered.select(*_SEARCH_COLS).orderBy(key).limit(limit)


def latest_anomalies(anomalies: DataFrame) -> DataFrame:
    """The no-args default view: the 10 newest rows by id
    (webapp backend.py:214-233 / db_latest_anomalies)."""
    return (anomalies.select(*_SEARCH_COLS)
            .orderBy(F.col("id").desc()).limit(10))


def _epoch(ts) -> int | None:
    if ts is None or ts == "all":
        return None
    if isinstance(ts, str) and ":" in ts:
        import calendar
        import datetime
        for fmt in ("%Y%m%d %H:%M", "%Y-%m-%d %H:%M"):
            try:
                return int(calendar.timegm(
                    datetime.datetime.strptime(ts, fmt).timetuple()))
            except ValueError:
                continue
        raise ValueError(f"unparseable timestamp {ts!r}")
    return int(ts)


def inactive_metrics(known: DataFrame, active: DataFrame,
                     namespace: str | None = None,
                     name_col: str = "metric") -> DataFrame:
    """webapp inactive_metrics (functions/metrics/
    get_inactive_metrics.py:16-109): the base names known to the
    database but absent from the active population (the
    aet.analyzer.unique_base_names Redis set the ``active`` input
    stands in for), optionally filtered to a namespace under the
    matched_or_regexed_in_list predicate. The DB id is reproduced as a
    deterministic name-ordered rank (the autoincrement stand-in the
    panorama store already uses). One anti-join on the
    (dimension-sized) name populations — no fact-table scan."""
    from pyspark.sql import Window

    from skyline_spark.operators.enrich import _match_condition

    inact = known.select(name_col).distinct().join(
        active.select(name_col).distinct(), [name_col], "left_anti")
    if namespace:
        inact = inact.where(_match_condition(F.col(name_col),
                                             F.lit(namespace)))
    rank = F.row_number().over(Window.orderBy(F.col(name_col).asc()))
    return inact.select(F.col(name_col).alias("base_name"),
                        rank.cast("long").alias("metric_id"))


def namespace_metric_counts(known: DataFrame, active: DataFrame,
                            namespaces: list[str],
                            name_col: str = "metric") -> DataFrame:
    """webapp namespace metric counts (functions/metrics/
    get_namespace_metric_count.py:14-109): per requested namespace
    pattern, the total / active / inactive base-name counts, where
    inactive = known minus active and membership uses the
    matched_or_regexed_in_list predicate. The patterns are
    settings-sized (broadcast literal); one aggregate over the name
    dimension."""
    from skyline_spark.operators.enrich import _match_condition

    spark = known.sparkSession
    pats = spark.createDataFrame([(p,) for p in namespaces],
                                 "namespace string")
    act = active.select(F.col(name_col).alias("base_name")).distinct() \
        .withColumn("__act", F.lit(1))
    k = known.select(F.col(name_col).alias("base_name")).distinct() \
        .join(act, "base_name", "left") \
        .withColumn("__act", F.coalesce("__act", F.lit(0)))
    j = k.crossJoin(F.broadcast(pats)).where(
        _match_condition(F.col("base_name"), F.col("namespace")))
    return j.groupBy("namespace").agg(
        F.count("*").cast("long").alias("total_metrics"),
        F.sum("__act").cast("long").alias("active_metrics"),
        F.sum(1 - F.col("__act")).cast("long").alias("inactive_metrics"))


def metric_analysed_events(realtime: DataFrame, long_series: DataFrame,
                           now: float, last_day_window: int = 86400,
                           boundary_namespaces: tuple[str, ...] = (),
                           key_col: str = "conv_id",
                           ts_col: str = "ts",
                           long_e_col: str = "e") -> DataFrame:
    """webapp analysed-events inventory (functions/metrics/
    get_metric_analysed_events.py:18-166): per metric, the number of
    analysed events over [from, until] — the per-metric twin of the
    namespace inventory counts.

    The reference counts two stores: the Redis FULL_DURATION series
    (``realtime``; every point newer than now - 86400 counts once,
    :146-149) and the Graphite long fetch (``long_series``, the
    retention-DOWNSAMPLED history; each point older than the last-day
    boundary counts int(full_resolution / resolution) times when the
    long store is coarser than the live one, else once, :120-137 —
    the weighting undoes the retention thinning). resolution is the
    metrics_manager hash value floored at 60 (:89-103, the hash is
    itself determine_data_frequency over the live series, so that is
    what stands in here); full_resolution is determine_data_frequency
    over the long fetch. The >1-point guard on the long fetch
    (:129-130) is kept. Metrics in the boundary hash double their
    total (analyzer + boundary, :152-162); zero-count metrics return
    the empty dict -> no row (:163-164).

    ``long_series`` carries ``key_col`` + epoch-seconds ``long_e_col``
    (a downsample() output). Scale: two per-series aggregates plus the
    (shared) frequency kernels — map-side combinable groupBys on the
    series key; boundary membership is a settings-sized literal
    predicate. No broadcast of facts, no collect.
    """
    from skyline_spark.operators.enrich import _match_condition
    from skyline_spark.operators.preprocess import determine_data_frequency

    last_day = F.lit(float(now)) - F.lit(int(last_day_window))
    e_rt = F.floor(F.col(ts_col).cast("timestamp").cast("double")) \
        .cast("long")

    recent = (realtime.where(e_rt >= last_day)
              .groupBy(key_col)
              .agg(F.count(F.lit(1)).cast("long").alias("n_recent")))

    le = F.col(long_e_col).cast("long")
    longc = (long_series
             .groupBy(key_col)
             .agg(F.count(F.lit(1)).cast("long").alias("n_long_total"),
                  F.sum(F.when(le < last_day, 1).otherwise(0))
                  .cast("long").alias("n_long_old")))

    res = determine_data_frequency(realtime, key_cols=(key_col,),
                                   ts_col=ts_col) \
        .select(key_col, F.greatest("metric_resolution", F.lit(60))
                .alias("res"))
    lfreq = determine_data_frequency(
        long_series.withColumn("__ts", le.cast("timestamp")),
        key_cols=(key_col,), ts_col="__ts") \
        .select(key_col, F.col("metric_resolution").alias("full_res"))

    j = (recent.join(longc, key_col, "full")
         .join(res, key_col, "left").join(lfreq, key_col, "left")
         # hash-miss default: resolution falls back to 60 (:89-103)
         .withColumn("res", F.coalesce("res", F.lit(60))))
    weight = F.when(F.col("full_res") > F.col("res"),
                    F.floor(F.col("full_res").cast("double")
                            / F.col("res")).cast("long")) \
        .otherwise(F.lit(1))
    analyzer = (F.when((F.col("n_long_total") > 1)
                       & F.col("full_res").isNotNull(),
                       F.col("n_long_old") * weight).otherwise(F.lit(0))
                + F.coalesce("n_recent", F.lit(0)))
    out = j.withColumn("analyzer", analyzer.cast("long")) \
        .where(F.col("analyzer") > 0)
    is_boundary = F.lit(False)
    for p in boundary_namespaces:
        is_boundary = is_boundary | _match_condition(F.col(key_col),
                                                     F.lit(p))
    return out.select(
        F.col(key_col).alias("base_name"),
        F.col("analyzer"),
        F.when(is_boundary, F.col("analyzer")).cast("long")
        .alias("boundary"),
        F.when(is_boundary, F.col("analyzer") * 2)
        .otherwise(F.col("analyzer")).cast("long").alias("total"))
