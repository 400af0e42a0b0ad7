"""The full parse -> enrich -> analyze -> route -> aggregate pipeline.

One declarative plan; Catalyst handles pushdown/pruning, AQE handles
skew. Exactly one wide shuffle (the conv_id group-by of the analyze
stage) plus the verdict->turns broadcast-or-shuffle join for sink
routing. SURVEY.md §3.1 maps each stage to its reference analogue.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds

from skyline_spark.config import PipelineConfig
from skyline_spark.operators.analyze import analyze, empty_series_verdicts
from skyline_spark.operators.enrich import enrich, rules_from_config
from skyline_spark.operators.parse import parse_events
from skyline_spark.operators.route import route_turns, route_verdicts


@dataclass
class PipelineResult:
    parsed: DataFrame
    dim: DataFrame
    verdicts: DataFrame
    routed_verdicts: DataFrame
    routed_turns: DataFrame
    now: float
    extras: dict = field(default_factory=dict)


def batch_now(transcripts: DataFrame) -> float:
    """The batch watermark: max(ts). The only driver-side scalar the
    plan needs (replaces every wall-clock read in the reference)."""
    row = transcripts.agg(F.max(epoch_seconds(F.col("ts")))).first()
    return float(row[0])


def run_pipeline(spark: SparkSession, transcripts: DataFrame,
                 alert_config: DataFrame, cfg: PipelineConfig | None = None,
                 now: float | None = None,
                 mirage_always: list[str] | None = None,
                 ionosphere_enabled: bool = False,
                 recent_alerts: DataFrame | None = None,
                 persist_intermediates: bool = True,
                 broadcast_verdicts_max_bytes: int = 128 << 20
                 ) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    if now is None:
        now = batch_now(transcripts)

    parsed = parse_events(transcripts)
    # enrichment rules are config-sized: collected once and resolved
    # inside the analyze UDF (the metrics_manager-hash analogue) — no
    # dimension sub-job, no extra parse scan, and the analyze input
    # projection shrinks to 4 narrow columns
    rules = rules_from_config(alert_config)

    verdicts = analyze(parsed, cfg, now, rules=rules)
    empties = empty_series_verdicts(transcripts, parsed, cfg, now)
    all_verdicts = verdicts.unionByName(empties)
    broadcast_verdicts: bool | None = None
    if persist_intermediates:
        # verdicts are SERIES-cardinality — orders of magnitude smaller
        # than the fact table at any scale; persisting them stops every
        # downstream action from re-running the analyze shuffle. The
        # fact table itself is never cached (rescans are pruned
        # columnar reads).
        all_verdicts = all_verdicts.persist()
        # SIZE-GATED broadcast decision for the route join: counting the
        # persisted verdicts is one cheap action (the analyze job runs
        # exactly once either way), and it decides between the zero-
        # fact-movement broadcast join (normal case: verdicts are tiny)
        # and the shuffle join (extreme conv cardinality: a forced
        # broadcast of billions of verdict rows would OOM the driver).
        # Without the gate, AQE only converts AFTER the fact side's
        # shuffle WRITE has happened — the write itself is the cost.
        # The gate is a BYTE budget, not a row count: verdict rows carry
        # ensemble/triggered/algorithms_run arrays plus the waterfall
        # struct, so 1M rows can be hundreds of MB — row counting is the
        # wrong unit on a 4-8 GiB production driver. After the count
        # materializes the cache, the InMemoryRelation's stats report
        # the ACTUAL cached size, not an estimate.
        all_verdicts.count()
        est_bytes = int(all_verdicts._jdf.queryExecution()
                        .optimizedPlan().stats().sizeInBytes())
        broadcast_verdicts = est_bytes <= broadcast_verdicts_max_bytes

    routed_v = route_verdicts(all_verdicts, mirage_always=mirage_always,
                              ionosphere_enabled=ionosphere_enabled,
                              recent_alerts=recent_alerts, now=now)
    # the route path needs each turn's METRIC (the verdict join is exact
    # on (conv_id, metric) — a multi-metric conversation never
    # duplicates its turns) but nothing else from the parse, so it
    # extracts only group 1: one regex per row instead of re-running the
    # full 3-group parse on the fact table a second time
    from skyline_spark.operators.parse import EVENT_RE
    route_facts = transcripts.withColumn(
        "metric", F.nullif(F.regexp_extract("text", EVENT_RE, 1), F.lit("")))
    routed_t = route_turns(route_facts, routed_v,
                           broadcast_verdicts=broadcast_verdicts)
    # the broadcast-join dimension remains available for inspection /
    # the oracle surface; lazy, not on the routed path
    _, dim = enrich(parsed, alert_config)
    return PipelineResult(
        parsed=parsed, dim=dim, verdicts=all_verdicts,
        routed_verdicts=routed_v, routed_turns=routed_t, now=now)
