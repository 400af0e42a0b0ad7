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

from skyline_spark.config import PipelineConfig
from skyline_spark.operators.analyze import analyze, empty_series_verdicts
from skyline_spark.operators.enrich import enrich
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
    row = transcripts.agg(F.max(F.col("ts").cast("double"))).first()
    return float(row[0])


def run_pipeline(spark: SparkSession, transcripts: DataFrame,
                 alert_config: DataFrame, cfg: PipelineConfig | None = None,
                 now: float | None = None,
                 mirage_always: list[str] | None = None) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    if now is None:
        now = batch_now(transcripts)

    parsed = parse_events(transcripts)
    enriched, dim = enrich(parsed, alert_config)

    verdicts = analyze(enriched, cfg, now)
    empties = empty_series_verdicts(transcripts, parsed, cfg, now)
    all_verdicts = verdicts.unionByName(empties)

    routed_v = route_verdicts(all_verdicts, dim, mirage_always)
    routed_t = route_turns(transcripts, routed_v)
    return PipelineResult(
        parsed=parsed, dim=dim, verdicts=all_verdicts,
        routed_verdicts=routed_v, routed_turns=routed_t, now=now)
