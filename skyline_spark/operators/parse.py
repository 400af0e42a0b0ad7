"""Parse stage — the grok/regex analogue of horizon/flux ingest.

Extracts ``metric=<name> value=<float> [err=<code>]`` events plus
error/tool signals from ``transcripts.text`` using *native* Spark
regexp expressions (JVM-side, whole-stage codegen; no Python in this
stage).

Reference analogues:
- flux JSON/field validation: skyline/flux/listen.py:607 (timestamp),
  :662 (metric-name charset/shape), :839/:1595 (ingest);
- old-datapoint drop at ingest: skyline/horizon/worker.py:431 with
  MAX_RESOLUTION (skyline/settings.py:1831);
- SKIP_LIST / DO_NOT_SKIP namespace filter: skyline/horizon/worker.py:156,
  388-422.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds

#: the metric-event grammar (FIXTURES.md §1)
EVENT_RE = r"metric=([A-Za-z0-9_.]+)\s+value=(-?\d+(?:\.\d+)?)(?:\s+err=([A-Z]\d{3}))?"

#: P1 — valid metric name shape (flux/listen.py:662 charset rules:
#: dotted alnum/underscore, no leading/trailing dot)
METRIC_NAME_RE = r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)*$"


def parse_events(transcripts: DataFrame) -> DataFrame:
    """Extract the first metric event per turn as typed columns.

    Keeps every input row; rows whose text has no event get null
    metric/value (needed downstream for the EmptyTimeseries route,
    skyline/analyzer/analyzer.py:4884-4893).
    """
    # ONE regexp execution per row (r08, guide §1.2 per-task work):
    # extract the full match (group 0) once, then recover the three
    # groups with cheap split/substr string ops. Exact equivalence to
    # per-group regexp_extract: the match is "metric=<g1><ws>value=<g2>
    # [<ws>err=<g3>]" where g1/g2/g3 contain no whitespace and the
    # separators are \s+ runs, so splitting group 0 on \s+ yields the
    # key=value tokens verbatim; a non-matching text gives m0 = '' ->
    # split -> [''] -> null metric/value/err (the nullif/get paths).
    # The m0 subtree is shared by all three columns, so codegen's
    # subexpression elimination runs the regex (and the split) once —
    # previously three regexp_extract calls each ran the full match.
    m0 = F.regexp_extract("text", EVENT_RE, 0)
    toks = F.split(m0, r"\s+")
    metric = F.nullif(F.get(toks, 0).substr(F.lit(8), F.length(F.get(toks, 0))),
                      F.lit(""))
    value = F.get(toks, 1).substr(F.lit(7), F.length(F.get(toks, 1)))
    err = F.get(toks, 2).substr(F.lit(5), F.length(F.get(toks, 2)))
    return (
        transcripts
        .withColumn("metric", metric)
        .withColumn("value", value.cast("double"))
        .withColumn("err", err)
        .withColumn("has_err", F.col("err").isNotNull())
        .withColumn("is_tool_turn", F.col("role") == F.lit("tool"))
    )


def parse_events_multi(transcripts: DataFrame) -> DataFrame:
    """Explode *all* metric events per turn (a turn's text may carry
    several): regexp_extract_all + posexplode, still fully native."""
    events = F.regexp_extract_all("text", F.lit(EVENT_RE), 0)
    df = transcripts.withColumn("event", F.explode_outer(events))
    return (
        df
        .withColumn("metric", F.when(F.col("event").isNotNull(),
                                     F.regexp_extract("event", EVENT_RE, 1)))
        .withColumn("value", F.when(F.col("event").isNotNull(),
                                    F.regexp_extract("event", EVENT_RE, 2)).cast("double"))
        .withColumn("err", F.nullif(F.regexp_extract("event", EVENT_RE, 3), F.lit("")))
        .drop("event")
    )


def valid_metric_name(col: str = "metric") -> Column:
    """P1 metric-name validation predicate (flux/listen.py:662)."""
    return F.col(col).rlike(METRIC_NAME_RE)


def validate_events(parsed: DataFrame, now_epoch: float | None = None,
                    max_age_seconds: int | None = None,
                    max_future_seconds: int = 3600) -> DataFrame:
    """P1-P3 validation filters on parsed events.

    - P1: metric-name shape (flux/listen.py:662);
    - P2: timestamp sanity — not in the future beyond tolerance, not
      older than ``max_age_seconds`` (flux/listen.py:607);
    - P3: old-datapoint drop analogue of MAX_RESOLUTION
      (horizon/worker.py:431).
    """
    df = parsed.filter(F.col("metric").isNotNull() & valid_metric_name())
    if now_epoch is not None:
        ts_epoch = epoch_seconds(F.col("ts"))
        df = df.filter(ts_epoch <= F.lit(now_epoch + max_future_seconds))
        if max_age_seconds is not None:
            df = df.filter(ts_epoch >= F.lit(now_epoch - max_age_seconds))
    return df


def skip_list_filter(df: DataFrame, skip_list: list[str],
                     do_not_skip_list: list[str] | None = None,
                     col: str = "metric") -> DataFrame:
    """P4 — namespace allow/deny on ingest
    (skyline/horizon/worker.py:156 ``in_skip_list``): a metric is skipped
    if any SKIP_LIST pattern is a substring of its name, unless a
    DO_NOT_SKIP pattern also matches. Native ``contains`` ORs — no UDF.
    """
    if not skip_list:
        return df
    skip = None
    for pat in skip_list:
        c = F.col(col).contains(pat)
        skip = c if skip is None else (skip | c)
    if do_not_skip_list:
        keep = None
        for pat in do_not_skip_list:
            c = F.col(col).contains(pat)
            keep = c if keep is None else (keep | c)
        skip = skip & ~keep
    return df.filter(~skip | F.col(col).isNull())
