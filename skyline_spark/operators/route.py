"""Route stage — fan the per-turn rows out to per-sink tables based on
the verdicts, in a single pass.

Reference decision tree (skyline/analyzer/analyzer.py §2.7 of SURVEY.md):
- exception                      -> 'exception' sink (E1-E4 counters,
  analyzer.py:4884-5051)
- not anomalous                  -> 'normal'
  (analyzer.not_anomalous_metrics, analyzer.py:4042-4074)
- anomalous and mirage metric    -> 'deferred'
  (analyzer.sent_to_mirage + check file, analyzer.py:4340-4344, 4496-4538)
- anomalous otherwise            -> 'anomalous'
  (analyzer.real_anomalous_metrics, analyzer.py:4092-4105)
- MIRAGE_ALWAYS metrics force-route to 'deferred' even when not
  anomalous (analyzer.py:4144-4158)

Per-turn ``text`` passes through UNMODIFIED (per-row invariant). The
deferred sink carries a deterministic idempotence key mirroring
``analyzer.mirage_check_sent.<ts>.<metric>`` (analyzer.py:4578-4583) and
the waterfall-alert payload fields (analyzer.py:3958-3980).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.schema import SINKS


def sink_expr(mirage_always: list[str] | None = None,
              ionosphere_enabled: bool = False):
    """The routing decision tree. The ionosphere branch mirrors
    analyzer.py:4322-4374: an anomalous NON-mirage metric goes to
    ionosphere when ionosphere is enabled, the metric is smtp-alerter
    enabled (:4348-4354), and there is no recent smtp alert
    (last_alert.smtp.* cache key, :4362-4374); mirage metrics always win
    over ionosphere (:4340-4344, 4431-4434)."""
    iono = (F.lit(ionosphere_enabled)
            & F.coalesce(F.col("is_smtp_alerter"), F.lit(False))
            & ~F.coalesce(F.col("__recent_alert"), F.lit(False))
            ) if ionosphere_enabled else F.lit(False)
    base = (
        F.when(F.col("exception").isNotNull(), F.lit("exception"))
        .when(~F.col("anomalous"), F.lit("normal"))
        .when(F.coalesce(F.col("is_mirage"), F.lit(False)), F.lit("deferred"))
        .when(iono, F.lit("ionosphere"))
        .otherwise(F.lit("anomalous"))
    )
    if mirage_always:
        force = F.col("metric").isin(mirage_always) & F.col("exception").isNull()
        return F.when(force, F.lit("deferred")).otherwise(base)
    return base


def route_verdicts(verdicts: DataFrame, dim: DataFrame | None = None,
                   mirage_always: list[str] | None = None,
                   ionosphere_enabled: bool = False,
                   recent_alerts: DataFrame | None = None,
                   now: float | None = None,
                   host: str = "spark") -> DataFrame:
    """Attach sink + deferred-check metadata to verdict rows.

    Verdicts normally carry their enrichment columns (resolved in-UDF);
    ``dim`` is only joined when they don't (legacy pre-joined path).
    ``recent_alerts`` is an optional metric-keyed table of active
    last_alert.smtp.* keys (skyline alert cache analogue) gating the
    ionosphere branch."""
    if "is_mirage" in verdicts.columns:
        v = verdicts
    else:
        v = verdicts.join(
            F.broadcast(dim.select("metric", "is_mirage", "is_smtp_alerter",
                                   "second_order_resolution_hours",
                                   "expiration_time")),
            "metric", "left")
    if recent_alerts is not None:
        ra = recent_alerts.select("metric").distinct() \
            .withColumn("__recent_alert", F.lit(True))
        v = v.join(F.broadcast(ra), "metric", "left")
    else:
        v = v.withColumn("__recent_alert", F.lit(False))
    v = v.withColumn("sink", sink_expr(mirage_always, ionosphere_enabled)) \
        .drop("__recent_alert")
    # mirage check-file analogue: idempotence key + hours_to_resolve
    # (analyzer.py:4496-4538, 4578-4583)
    return v.withColumn(
        "check_id",
        F.when(F.col("sink") == "deferred",
               F.concat_ws(".", F.lit("mirage_check"),
                           F.col("last_ts").cast("long").cast("string"),
                           F.col("metric"))),
    ).withColumn(
        "hours_to_resolve",
        F.when(F.col("sink") == "deferred",
               F.col("second_order_resolution_hours")),
    ).withColumn(
        # the full waterfall-alert payload tuple (analyzer.py:3967-3980):
        # [base_name, datapoint, from_timestamp, metric_timestamp,
        #  algorithms_run, triggered_algorithms, app, source, host,
        #  added_at]; added_at is the batch watermark (no wall clock)
        "waterfall_payload",
        F.when(F.col("sink") == "deferred", F.struct(
            F.col("metric").alias("base_name"),
            F.col("datapoint").alias("datapoint"),
            F.col("from_ts").cast("long").alias("from_timestamp"),
            F.col("last_ts").cast("long").alias("metric_timestamp"),
            F.col("algorithms_run").alias("algorithms_run"),
            F.col("triggered").alias("triggered_algorithms"),
            F.lit("analyzer").alias("app"),
            F.lit("transcripts").alias("source"),
            F.lit(host).alias("host"),
            F.lit(now).cast("long").alias("added_at"))),
    )


def route_turns(facts: DataFrame, routed_verdicts: DataFrame,
                broadcast_verdicts: bool | None = None) -> DataFrame:
    """Join the turn rows to their series verdict -> routed per-turn
    rows for the sink tables.

    Join key: verdicts are keyed (conv_id, metric) — a conversation
    emitting two metrics has two verdict rows, so when the fact rows
    carry a ``metric`` column (parsed facts) the join uses BOTH keys
    (null-safe on metric: unparsed turns of an all-unparsed conversation
    match its EmptyTimeseries verdict). Joining on conv_id alone would
    duplicate every turn of a multi-metric conversation.

    Broadcast: verdicts are series-cardinality. That is usually tiny
    relative to the facts, but at extreme conversation cardinality it is
    billions of rows and a STATIC broadcast hint would OOM the driver —
    so the default (None) leaves the strategy to AQE, which sees the
    verdicts' actual runtime size after their shuffle materializes and
    converts to broadcast only when it fits
    (spark.sql.adaptive.autoBroadcastJoinThreshold). Pass True/False to
    force either path. ``text`` and all other turn columns pass through
    untouched.
    """
    vcols = routed_verdicts.select(
        F.col("conv_id").alias("__v_conv"), F.col("metric").alias("__v_metric"),
        "sink", "anomalous", "ensemble", "triggered",
        "algorithms_run", "datapoint", "exception", "negatives_found",
        "last_ts", "check_id", "hours_to_resolve")
    if broadcast_verdicts:
        vcols = F.broadcast(vcols)
    cond = F.col("conv_id") == F.col("__v_conv")
    if "metric" in facts.columns:
        cond = cond & F.col("metric").eqNullSafe(F.col("__v_metric"))
    out = facts.join(vcols, cond, "left").drop("__v_conv", "__v_metric")
    return out.withColumn("sink", F.coalesce(F.col("sink"), F.lit("exception")))


def write_sinks(routed: DataFrame, base_path: str, fmt: str = "parquet") -> None:
    """Single partitioned write — one pass, one file-set per sink.

    Production target is Iceberg (``df.writeTo(table).append()`` per sink,
    partitioned by days(ts) + bucket(conv_id)); this container has no
    Iceberg runtime jar, so the layout is parquet partitioned by sink,
    which exercises the same single-pass partitioned-write plan.
    """
    (routed.write.mode("overwrite").partitionBy("sink").format(fmt)
     .save(base_path))


def split_sinks(routed: DataFrame) -> dict[str, DataFrame]:
    return {s: routed.filter(F.col("sink") == s) for s in SINKS}
