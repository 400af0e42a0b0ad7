"""End-to-end routing tests on the deterministic fixture transcripts
(FIXTURES.md §4): per-sink membership, text passthrough equality,
order-invariance under shuffle+dup, derivative handling.

Verdicts are collected ONCE per module (each Spark action re-executes
the whole DAG); assertions run on the collected frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyline_spark.config import PipelineConfig
from skyline_spark.plans.pipeline import run_pipeline
from skyline_spark.schema import ALERT_CONFIG_SCHEMA
from skyline_spark.sources.transcripts import synthetic_transcripts
from skyline_spark.synth import fixture_alert_config, fixture_pipeline_config


@pytest.fixture(scope="module")
def result(spark):
    tdf = synthetic_transcripts(spark)
    adf = spark.createDataFrame(
        fixture_alert_config(),
        schema=ALERT_CONFIG_SCHEMA).withColumn(
        "priority", F.monotonically_increasing_id())
    res = run_pipeline(spark, tdf, adf, fixture_pipeline_config())
    verdicts = res.routed_verdicts.toPandas().set_index("conv_id")
    return res, tdf, verdicts


def test_routing_membership(result):
    _, _, v = result
    assert v.loc["conv-app.server-0001", "sink"] == "anomalous"
    assert bool(v.loc["conv-app.server-0001", "anomalous"])
    assert v.loc["conv-stats.statsd-0002", "sink"] == "deferred"
    assert v.loc["conv-app.server-0003", "sink"] == "normal"
    assert v.loc["conv-app.server-0004", "exception"] == "TooShort"
    assert v.loc["conv-app.server-0005", "exception"] == "Boring"
    assert v.loc["conv-app.server-0006", "exception"] == "Stale"
    assert v.loc["conv-app.server-0007", "exception"] == "EmptyTimeseries"
    # exactly one verdict per conv
    assert v.index.is_unique


def test_deferred_check_metadata(result):
    _, _, v = result
    row = v.loc["conv-stats.statsd-0002"]
    assert row.check_id.startswith("mirage_check.")
    assert row.check_id.endswith(".stats.statsd.turns.rate")
    assert row.hours_to_resolve == 168
    # full waterfall-alert payload tuple (analyzer.py:3967-3980)
    wp = row.waterfall_payload
    assert wp["base_name"] == "stats.statsd.turns.rate"
    assert wp["datapoint"] == 1000.0
    assert wp["metric_timestamp"] == int(row.last_ts)
    assert wp["from_timestamp"] <= wp["metric_timestamp"]
    assert wp["app"] == "analyzer" and wp["source"] == "transcripts"
    assert wp["added_at"] is not None
    assert "grubbs" in list(wp["triggered_algorithms"])
    # normal rows carry no payload
    assert v.loc["conv-app.server-0003", "waterfall_payload"] is None


def test_unordered_dup_equals_sorted_twin(result):
    _, _, v = result
    twin = v.loc["conv-app.server-0009"]
    messy = v.loc["conv-app.server-0010"]
    # dedup keeps first-per-ts -> the injected 9999 dupes are dropped and
    # the verdict equals the clean twin's
    assert (messy.sink, messy.anomalous) == (twin.sink, twin.anomalous)
    assert list(messy.ensemble) == list(twin.ensemble)
    assert messy.n_points == twin.n_points == 3000


def test_derivative_metric(result):
    _, _, v = result
    row = v.loc["conv-net.counters-0008"]
    # counter series is transformed (derivative), analyzed without error;
    # 5000 points -> 4999 deltas, minus the dropped negative reset delta
    assert row.exception is None
    assert row.n_points == 4998
    assert row.sink == "normal"


def test_negatives_flag(result):
    _, _, v = result
    row = v.loc["conv-app.server-0011"]
    assert row.anomalous and row.negatives_found


def test_text_passthrough_equality(result):
    """Per-row invariant: routed turn text equals input text under stable
    (conv_id, turn_idx) ordering."""
    res, tdf, _ = result
    orig = tdf.select("conv_id", "turn_idx", "text")
    routed = res.routed_turns.select("conv_id", "turn_idx",
                                     F.col("text").alias("routed_text"))
    diff = orig.join(routed, ["conv_id", "turn_idx"], "full") \
        .where((F.col("text") != F.col("routed_text"))
               | F.col("text").isNull() | F.col("routed_text").isNull())
    assert diff.count() == 0


def test_analyze_invariant_to_arrow_batch_size(spark):
    """The batched mapInPandas analyze slices series out of Arrow
    batches with a carry across batch boundaries — forcing tiny batches
    (so every series straddles several) must produce IDENTICAL verdicts
    to the default batch size."""
    from skyline_spark.operators.analyze import analyze
    from skyline_spark.operators.parse import parse_events
    from skyline_spark.plans.pipeline import batch_now
    from skyline_spark.synth import fixture_pipeline_config

    tdf = synthetic_transcripts(spark)
    parsed = parse_events(tdf)
    now = batch_now(tdf)
    cfg = fixture_pipeline_config()

    def run():
        return (analyze(parsed, cfg, now, rules=[])
                .select("conv_id", "metric", "anomalous", "exception",
                        "datapoint", "n_points", "last_ts")
                .toPandas().sort_values("conv_id", ignore_index=True))

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        big = run()
        spark.conf.set(key, "64")  # every series spans many batches
        small = run()
    finally:
        spark.conf.set(key, old)
    import pandas as pd
    pd.testing.assert_frame_equal(big, small)


def test_webapp_read_api(result):
    """§3.3 verification queries: /api?metric= time-bounded series fetch
    and /anomalies.json over the routed verdicts."""
    from skyline_spark.plans.read_api import api_anomalies, api_metric
    from skyline_spark.operators.parse import parse_events
    from skyline_spark.synth import EPOCH0
    res, tdf, _ = result
    parsed = parse_events(tdf)
    series = api_metric(parsed, "net.counters.turns.rate",
                        from_timestamp=EPOCH0 - 100).toPandas()
    assert len(series) == 101  # inclusive bound, 1 Hz fixture
    assert (series.metric == "net.counters.turns.rate").all()
    anoms = api_anomalies(res.routed_verdicts).toPandas()
    assert set(anoms.conv_id) == {"conv-app.server-0001",
                                  "conv-stats.statsd-0002",
                                  "conv-app.server-0011"}
    assert set(anoms.sink) <= {"anomalous", "deferred", "ionosphere"}


def test_panorama_request(result):
    """§3.3 Panorama grammar (webapp/backend.py:128-720) over the
    pipeline's anomaly store: deterministic ids, the unknown-metric
    no-filter quirk, the unmatched-metric_like empty quirk, the
    count_by_metric filter-reset quirk, and the limit fallback."""
    from skyline_spark.operators.parse import parse_events
    from skyline_spark.operators.webapp import (
        anomalies_table,
        latest_anomalies,
        metric_dimension,
        panorama_request,
    )
    from skyline_spark.plans.pipeline import batch_now
    res, tdf, _ = result
    parsed = parse_events(tdf)
    metrics = metric_dimension(parsed)
    store = anomalies_table(res.verdicts, metrics, 86400,
                            batch_now(tdf))
    rows = store.orderBy("id").toPandas()
    n_anom = len(rows)
    assert n_anom >= 2
    assert list(rows.id) == list(range(1, n_anom + 1))
    # ids follow (anomaly_timestamp, metric, conv_id)
    assert list(rows.anomaly_timestamp) == \
        sorted(rows.anomaly_timestamp)
    # unknown metric -> the reference silently applies NO filter
    assert panorama_request(store, metrics,
                            metric="no.such.metric").count() == n_anom
    # known metric -> equality filter
    one = rows.metric.iloc[0]
    got = panorama_request(store, metrics, metric=one).toPandas()
    assert (got.metric == one).all() and len(got) >= 1
    # unmatched metric_like -> WHERE metric_id IN (0) -> empty
    assert panorama_request(store, metrics,
                            metric_like="zzz%").count() == 0
    # count_by_metric discards the metric_like filter parsed before it
    cnt = panorama_request(store, metrics, metric_like="zzz%",
                           count_by_metric=True).toPandas()
    assert int(cnt.n.sum()) == n_anom
    # non-int limit falls back to 10; ASC order flips the id sort
    asc = panorama_request(store, metrics, limit="bogus",
                           order="ASC").toPandas()
    assert list(asc.id) == list(rows.id[:10])
    assert latest_anomalies(store).count() == min(10, n_anom)


def test_sink_counts(result):
    _, _, v = result
    counts = v.groupby("sink").size().to_dict()
    assert counts == {"anomalous": 2, "deferred": 1, "normal": 4,
                      "exception": 4}


def test_multi_metric_conversation_routes_per_metric(spark):
    """A conversation emitting TWO metrics produces two verdict rows;
    the turn join must key on (conv_id, metric) so no turn row is
    duplicated across the verdicts (round-1 latent bug: conv_id-only
    join fanned every turn out once per metric)."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        metric = "app.a.turns.rate" if i % 2 == 0 else "app.b.turns.rate"
        rows.append(("conv-mm", i, "user",
                     f"evt {i} metric={metric} value={float(i % 37) + 0.5:.2f}",
                     None, base + dt.timedelta(seconds=60 * i)))
    from skyline_spark.schema import TRANSCRIPTS_SCHEMA
    tdf = spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA)
    adf = spark.createDataFrame(
        [("app", "smtp", 3600, None, False, None)],
        schema=ALERT_CONFIG_SCHEMA)
    res = run_pipeline(spark, tdf, adf, fixture_pipeline_config(),
                       persist_intermediates=False)
    verdicts = res.routed_verdicts.toPandas()
    assert len(verdicts) == 2
    assert set(verdicts.metric) == {"app.a.turns.rate", "app.b.turns.rate"}
    routed = res.routed_turns.toPandas()
    assert len(routed) == 300  # no duplication
    # every turn row carries the verdict of ITS OWN metric
    assert (routed.groupby("metric")["turn_idx"].count() == 150).all()


def test_ionosphere_routing_branch(spark):
    """analyzer.py:4322-4374: anomalous + smtp-alerter + NOT mirage + no
    recent alert -> ionosphere sink; a recent last_alert.smtp.* key or a
    mirage namespace suppresses it."""
    tdf = synthetic_transcripts(spark)
    adf = spark.createDataFrame(
        fixture_alert_config(), schema=ALERT_CONFIG_SCHEMA)
    res = run_pipeline(spark, tdf, adf, fixture_pipeline_config(),
                       ionosphere_enabled=True, persist_intermediates=False)
    v = res.routed_verdicts.toPandas().set_index("conv_id")
    # smtp + anomalous + non-mirage -> ionosphere
    assert v.loc["conv-app.server-0001", "sink"] == "ionosphere"
    # mirage metric stays deferred (mirage wins over ionosphere)
    assert v.loc["conv-stats.statsd-0002", "sink"] == "deferred"
    # negatives are metadata, not a routing gate: smtp + anomalous goes
    # to ionosphere with negatives_found carried for the trainability UI
    assert v.loc["conv-app.server-0011", "sink"] == "ionosphere"
    assert bool(v.loc["conv-app.server-0011", "negatives_found"])

    # a recent smtp alert suppresses the ionosphere branch
    ra = spark.createDataFrame([("app.server.turns.rate",)], "metric string")
    res2 = run_pipeline(spark, tdf, adf, fixture_pipeline_config(),
                        ionosphere_enabled=True, recent_alerts=ra,
                        persist_intermediates=False)
    v2 = res2.routed_verdicts.toPandas().set_index("conv_id")
    assert v2.loc["conv-app.server-0001", "sink"] == "anomalous"


def test_undeclared_counter_auto_differenced(spark):
    """analyse_derivatives (skyline/analyzer/analyzer.py:1470,1488 +
    skyline_functions.py:1673-1708): a strictly-increasing series whose
    metric is NOT config-declared derivative is auto-detected from the
    data and differenced; the kill switch restores raw analysis."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    total, rows = 0.0, []
    for i in range(200):
        total += float(i % 7) + 1.0
        rows.append(("conv-ctr", i, "user",
                     f"evt {i} metric=app.ctr.total value={total:.2f}",
                     None, base + dt.timedelta(seconds=60 * i)))
    from skyline_spark.schema import TRANSCRIPTS_SCHEMA
    tdf = spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA)
    adf = spark.createDataFrame(
        [("app", "smtp", 3600, None, False, None)],  # NOT declared derivative
        schema=ALERT_CONFIG_SCHEMA)
    auto = run_pipeline(spark, tdf, adf, fixture_pipeline_config(),
                        persist_intermediates=False).verdicts.toPandas().iloc[0]
    assert auto.exception is None
    assert auto.n_points == 199  # differenced: 200 points -> 199 deltas
    raw = run_pipeline(spark, tdf, adf,
                       PipelineConfig(analyze_derivatives=False),
                       persist_intermediates=False).verdicts.toPandas().iloc[0]
    assert raw.n_points == 200  # kill switch: analyzed undifferenced


def test_deleted_by_roomba_turns_carry_exception(spark):
    """A conv whose events all fell out of retention gets a
    DeletedByRoomba verdict KEYED BY ITS PARSED METRIC, so the exact
    (conv_id, metric) route join attaches the exception label and
    verdict columns to the conv's event turns (round-2 regression: the
    NULL-metric verdict missed the join and the turns lost their
    exception attribution)."""
    import datetime as dt

    from skyline_spark.schema import TRANSCRIPTS_SCHEMA
    cfg = fixture_pipeline_config()
    base = dt.datetime(2024, 6, 1)
    rows = []
    for i in range(150):  # fresh conv defines the batch watermark
        rows.append(("conv-fresh", i, "user",
                     f"evt {i} metric=app.fresh.turns.rate "
                     f"value={float(i % 9) + 0.5:.2f}",
                     None, base + dt.timedelta(seconds=60 * i)))
    old = base - dt.timedelta(seconds=cfg.full_duration + 30 * 86400)
    for i in range(50):  # every event far outside full_duration
        rows.append(("conv-roomba", i, "user",
                     f"evt {i} metric=app.roomba.turns.rate "
                     f"value={float(i % 5) + 0.5:.2f}",
                     None, old + dt.timedelta(seconds=60 * i)))
    tdf = spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA)
    adf = spark.createDataFrame(
        [("app", "smtp", 3600, None, False, None)],
        schema=ALERT_CONFIG_SCHEMA)
    res = run_pipeline(spark, tdf, adf, cfg, persist_intermediates=False)
    v = res.routed_verdicts.toPandas().set_index("conv_id")
    assert v.loc["conv-roomba", "exception"] == "DeletedByRoomba"
    assert v.loc["conv-roomba", "metric"] == "app.roomba.turns.rate"
    rt = res.routed_turns.toPandas()
    roomba = rt[rt.conv_id == "conv-roomba"]
    assert len(roomba) == 50
    assert (roomba.sink == "exception").all()
    assert (roomba.exception == "DeletedByRoomba").all()


def test_golden_verdict_values(result):
    _, _, v = result
    row = v.loc["conv-app.server-0001"]
    assert row.datapoint == 1000.0
    assert sum(1 for x in row.ensemble if x is True) >= 6
    assert row.metric == "app.server.turns.rate"


def test_events_watermark_matches_derivation_max(spark, tmp_path):
    """r08: the shuffle-free events-level watermark must be bit-equal
    to max(epoch(ts)) over the derived (keep-filtered) transcripts.
    The sf0.001 events plant BOTH special convs with trimmed tails, so
    the decomposition's trimmed branch (second aggregate pass) is
    exercised for real; the synthesized parquet covers the untrimmed
    shortcut (special conv entirely inside its keep window, max taken
    from the pass-1 aggregate without a second scan) and the
    special-conv-is-global-max case."""
    import struct

    from pyspark.sql import functions as F

    from skyline_spark.functions.spark_utils import epoch_seconds
    from skyline_spark.sources.transcripts import (
        events_watermark_scalar,
        transcripts_from_events,
    )

    def both(sf_dir):
        old = float(transcripts_from_events(spark, sf_dir)
                    .agg(F.max(epoch_seconds(F.col("ts")))).first()[0])
        new = events_watermark_scalar(spark, sf_dir)
        assert struct.pack("<d", old) == struct.pack("<d", new), \
            (sf_dir, old, new)

    both("/root/testdata/sf0.001")
    # untrimmed special convs: click user 3 spans < 21d, signup user 3
    # spans < 5d, and the signup-3 conv holds the global max ts
    base = "2024-01-01 00:00:00"
    rows = [(i, base, uid, et, 1.0) for i, (uid, et) in enumerate(
        [(1, "view"), (3, "click"), (3, "click"), (8, "purchase"),
         (3, "signup")])]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double").select(
        "event_id",
        (F.to_timestamp("ts") + F.make_interval(
            hours=F.col("event_id") * 24)).cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value")
    d = str(tmp_path / "sfx")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    both(d)
