"""Tests for boundary checks (X3), anomaly-end sessionization (X4),
mirage second-stage veto (§3.2), resumable lineage runs, and the
streaming flux aggregator (G3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from skyline_spark.config import PipelineConfig
from skyline_spark.schema import ALERT_CONFIG_SCHEMA, TRANSCRIPTS_SCHEMA


def _series_df(spark, rows):
    """rows: list of (conv_id, ts_epoch, value)"""
    pdf = pd.DataFrame(rows, columns=["conv_id", "te", "value"])
    pdf["turn_idx"] = pdf.groupby("conv_id").cumcount().astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["te"], unit="s")
    return spark.createDataFrame(pdf[["conv_id", "turn_idx", "ts", "value"]])


def test_boundary_static_checks(spark):
    from skyline_spark.operators.boundary import boundary_check
    rows = []
    # steady 200s then holds: greater_than(100) fires, less_than(10) no
    for i in range(40):
        rows.append(("high", 1000.0 + i, 200.0))
    # cliff: 30 points of ~500 then last point crashes to 2
    for i in range(39):
        rows.append(("cliff", 1000.0 + i, 500.0 + (i % 5)))
    rows.append(("cliff", 1039.0, 2.0))
    df = _series_df(spark, rows)
    gt = boundary_check(df, "greater_than", 100.0).toPandas().set_index("conv_id")
    assert bool(gt.loc["high"].anomalous) and bool(gt.loc["cliff"].anomalous) is False
    lt = boundary_check(df, "less_than", 10.0).toPandas().set_index("conv_id")
    assert bool(lt.loc["cliff"].anomalous) and not bool(lt.loc["high"].anomalous)
    cliff = boundary_check(df, "detect_drop_off_cliff", 0).toPandas() \
        .set_index("conv_id")
    # avg of last 10 (~500s) / last value (2) = ~225 > trigger 100
    assert bool(cliff.loc["cliff"].anomalous)
    assert not bool(cliff.loc["high"].anomalous)  # flat: min10 == max10


def test_boundary_min_average_guard(spark):
    """drop_off_cliff's min_average guard (boundary_algorithms.py:272-289):
    a cliff on a LOW-average metric is suppressed when the mean over the
    last min_average_seconds is below min_average."""
    from skyline_spark.operators.boundary import boundary_check
    rows = []
    for i in range(39):
        rows.append(("cliff", 1000.0 + i, 500.0 + (i % 5)))
    rows.append(("cliff", 1039.0, 2.0))
    df = _series_df(spark, rows)
    # series average ~490 over the window: guard at min_average=600 kills
    # the detection; at 100 it passes through
    hi = boundary_check(df, "detect_drop_off_cliff", 0, min_average=600,
                        min_average_seconds=3600).toPandas().set_index("conv_id")
    assert not bool(hi.loc["cliff"].anomalous)
    lo = boundary_check(df, "detect_drop_off_cliff", 0, min_average=100,
                        min_average_seconds=3600).toPandas().set_index("conv_id")
    assert bool(lo.loc["cliff"].anomalous)


def test_boundary_run_config_dispatch(spark):
    """BOUNDARY_METRICS-style dispatch (skyline/settings.py:2505,
    boundary.py:390-435): each config entry runs its algorithm over the
    metrics its pattern matches."""
    from skyline_spark.operators.boundary import boundary_run
    rows = []
    for i in range(40):
        rows.append(("conv-a", 1000.0 + i, 200.0 + (i % 3)))
        rows.append(("conv-b", 1000.0 + i, 5.0))
    df = _series_df(spark, rows).withColumn(
        "metric", F.when(F.col("conv_id") == "conv-a",
                         F.lit("app.requests.rate"))
        .otherwise(F.lit("db.pool.free")))
    cfg = [
        {"metric_pattern": "app.", "algorithm": "greater_than",
         "trigger": 100.0},
        {"metric_pattern": "db.", "algorithm": "less_than", "trigger": 10.0,
         "min_average": 0, "min_average_seconds": 0},
    ]
    out = boundary_run(df, cfg).toPandas().set_index(["conv_id", "algorithm"])
    assert bool(out.loc[("conv-a", "greater_than")].anomalous)
    assert bool(out.loc[("conv-b", "less_than")].anomalous)
    assert len(out) == 2  # pattern-scoped: each entry ran its own subset


def test_fill_gaps_zero_and_last_known_value(spark):
    """T6 fill semantics (full_duration_timeseries_fill.py:99-188):
    floor-aligned lattice, last raw point per bucket wins, gaps take 0 or
    the previous known value."""
    from skyline_spark.operators.preprocess import fill_gaps
    rows = [("c", 0.5, 1.0), ("c", 9.0, 9.0),   # bucket 0: last wins -> 9.0
            ("c", 30.0, 3.0),                    # buckets 10,20 missing
            ("c", 50.0, 5.0)]                    # bucket 40 missing
    df = _series_df(spark, rows)
    z = fill_gaps(df, 10, "zero").toPandas().sort_values("ts")
    assert list(z.value) == [9.0, 0.0, 0.0, 3.0, 0.0, 5.0]
    f = fill_gaps(df, 10, "last_known_value").toPandas().sort_values("ts")
    assert list(f.value) == [9.0, 9.0, 9.0, 3.0, 3.0, 5.0]


def test_autoaggregate(spark):
    from skyline_spark.operators.boundary import autoaggregate
    rows = [("a", 0.0 + i, 1.0) for i in range(120)]
    df = _series_df(spark, rows)
    out = autoaggregate(df, 60).toPandas()
    assert sorted(out.value) == [60.0, 60.0]


def test_anomaly_end_timestamps(spark):
    from skyline_spark.operators.cross_series import anomaly_end_timestamps
    pdf = pd.DataFrame({
        "conv_id": ["c"] * 10,
        "bucket_start": list(range(10)),
        "anomalous": [False, True, True, False, False,
                      True, False, True, True, True],
    })
    df = spark.createDataFrame(pdf)
    eps = anomaly_end_timestamps(df, ts_col="bucket_start").toPandas() \
        .sort_values("anomaly_start").reset_index(drop=True)
    assert len(eps) == 3
    # run 1: buckets 1-2, closed by bucket 3
    assert (eps.loc[0].anomaly_start, eps.loc[0].last_flagged,
            eps.loc[0].anomaly_end) == (1, 2, 3)
    # run 2: bucket 5, closed by 6
    assert (eps.loc[1].anomaly_start, eps.loc[1].anomaly_end) == (5, 6)
    # run 3: buckets 7-9, still open
    assert eps.loc[2].anomaly_start == 7 and pd.isna(eps.loc[2].anomaly_end)


def test_sigma_flags_and_end_to_end_episodes(spark):
    from skyline_spark.operators.cross_series import (
        anomaly_end_timestamps,
        sigma_flags,
    )
    rng = np.random.RandomState(0)
    vals = rng.normal(100, 1, 50)
    vals[20:23] = 200.0
    pdf = pd.DataFrame({"conv_id": "c", "bucket_start": range(50),
                        "value": vals})
    flags = sigma_flags(spark.createDataFrame(pdf),
                        ts_col="bucket_start")
    eps = anomaly_end_timestamps(flags, ts_col="bucket_start").toPandas()
    assert len(eps) == 1
    assert eps.iloc[0].anomaly_start == 20
    assert eps.iloc[0].anomaly_end == 23


def test_mirage_veto_and_confirm(spark):
    """A series anomalous at the 1-day window but ordinary over 7 days
    (daily spikes) is VETOED; the golden series stays CONFIRMED."""
    from skyline_spark.operators.cross_series import mirage_reanalyze
    from skyline_spark.operators.parse import parse_events
    from skyline_spark.plans.pipeline import run_pipeline
    from skyline_spark.synth import EPOCH0, _series_rows, golden_series

    frames = []
    # G2-style golden series, mirage namespace
    ts, v = golden_series()
    frames.append(_series_rows("conv-stats.statsd-0002", "stats.statsd", ts, v))
    # veto series: quiet last day ending in a 1000 spike (anomalous at
    # the 1-day window), but 6 preceding days of loud uniform(0,1000)
    # noise — over the full 7-day window the spike is unremarkable
    n = 7 * 1440
    rng = np.random.RandomState(7)
    ts2 = EPOCH0 - (n - 1) * 60 + np.arange(n, dtype=np.float64) * 60
    v2 = np.concatenate([rng.uniform(0, 1000, n - 1440), np.ones(1440)])
    v2[-1] = 1000.0
    frames.append(_series_rows("conv-stats.statsd-0003", "stats.statsd", ts2, v2))

    tdf = spark.createDataFrame(pd.concat(frames, ignore_index=True),
                                schema=TRANSCRIPTS_SCHEMA)
    adf = spark.createDataFrame(
        [("stats.statsd", "smtp", 1800, 168, False, None)],
        schema=ALERT_CONFIG_SCHEMA)
    from skyline_spark.synth import fixture_pipeline_config
    cfg = fixture_pipeline_config()
    res = run_pipeline(spark, tdf, adf, cfg)
    deferred = res.routed_verdicts.where(F.col("sink") == "deferred") \
        .select("conv_id", "metric", "hours_to_resolve", "datapoint")
    dset = {r.conv_id for r in deferred.collect()}
    assert dset == {"conv-stats.statsd-0002", "conv-stats.statsd-0003"}

    parsed = parse_events(tdf)
    out = mirage_reanalyze(spark, parsed, deferred, cfg, now=res.now) \
        .toPandas().set_index("conv_id")
    assert out.loc["conv-stats.statsd-0002"].final_sink == "anomalous"
    assert out.loc["conv-stats.statsd-0003"].final_sink == "vetoed"


def test_is_anomalously_anomalous(spark):
    """A11 (algorithms.py:1113-1154): first-ever trigger -> True;
    same-datapoint re-trigger within 300 s -> False; an interval wildly
    off the metric's own trigger cadence -> True; an on-cadence trigger
    -> False."""
    from skyline_spark.operators.cross_series import is_anomalously_anomalous
    hist_rows = []
    for i in range(12):  # regular 100 s trigger cadence
        hist_rows.append(("m.cadence", float(i * 100), 5.0))
        hist_rows.append(("m.burst", float(i * 100), 5.0))
        hist_rows.append(("m.dedupe", float(i * 100), 5.0))
    hist = spark.createDataFrame(
        hist_rows, "metric string, trigger_ts double, datapoint double")
    new = spark.createDataFrame(
        [("m.cadence", 1200.0, 7.0),   # on-cadence -> not anomalous
         ("m.burst", 5800.0, 7.0),     # 4700 s gap vs 100 s cadence -> True
         ("m.dedupe", 1150.0, 5.0),    # same dp, 50 s <= 300 -> dedupe False
         ("m.fresh", 10.0, 1.0)],      # no history -> True
        "metric string, trigger_ts double, datapoint double")
    out = is_anomalously_anomalous(hist, new).toPandas().set_index("metric")
    assert bool(out.loc["m.fresh"].second_order_anomalous)
    assert bool(out.loc["m.burst"].second_order_anomalous)
    assert not bool(out.loc["m.dedupe"].second_order_anomalous)
    assert not bool(out.loc["m.cadence"].second_order_anomalous)


def test_mirage_periodic_check_due(spark):
    """MIRAGE_PERIODIC_CHECK (analyzer.py:4107-4120): a periodic metric
    is due when never checked or when its last check is older than the
    interval."""
    from skyline_spark.operators.cross_series import mirage_periodic_check_due
    metrics = spark.createDataFrame(
        [("m.fresh",), ("m.stale",), ("m.never",)], "metric string")
    hist = spark.createDataFrame(
        [("m.fresh", 1000.0), ("m.stale", 100.0)],
        "metric string, last_check_ts double")
    due = mirage_periodic_check_due(metrics, hist,
                                    interval_seconds=600, now=1100.0)
    assert sorted(due) == ["m.never", "m.stale"]


def test_mirage_stale_check_discard_and_downsampled_recheck(spark):
    """mirage.py:1437-1463: a check older than MIRAGE_STALE_SECONDS is
    discarded unanalyzed; mirage.py:1947-2185: with downsample_to set,
    the verdict comes from the downsampled series while the datapoint
    stays raw."""
    from skyline_spark.operators.cross_series import mirage_reanalyze
    from skyline_spark.operators.parse import parse_events
    from skyline_spark.plans.pipeline import run_pipeline
    from skyline_spark.synth import (
        EPOCH0,
        _series_rows,
        fixture_pipeline_config,
        golden_series,
    )

    ts, v = golden_series()
    frames = [_series_rows("conv-stats.statsd-0002", "stats.statsd", ts, v)]
    tdf = spark.createDataFrame(pd.concat(frames, ignore_index=True),
                                schema=TRANSCRIPTS_SCHEMA)
    adf = spark.createDataFrame(
        [("stats.statsd", "smtp", 1800, 168, False, None)],
        schema=ALERT_CONFIG_SCHEMA)
    cfg = fixture_pipeline_config()
    res = run_pipeline(spark, tdf, adf, cfg)
    deferred = res.routed_verdicts.where(F.col("sink") == "deferred") \
        .select("conv_id", "metric", "hours_to_resolve", "datapoint",
                "last_ts")
    parsed = parse_events(tdf)

    # fresh check (age 0) is analyzed and confirmed
    ok = mirage_reanalyze(spark, parsed, deferred, cfg, now=res.now) \
        .toPandas().iloc[0]
    assert ok.final_sink == "anomalous"

    # pretend the batch ran 10 minutes later: age > MIRAGE_STALE_SECONDS
    # -> discarded without analysis
    stale = mirage_reanalyze(spark, parsed, deferred, cfg,
                             now=res.now + 600).toPandas().iloc[0]
    assert stale.final_sink == "discarded_stale"
    assert stale.mirage_anomalous is None or pd.isna(stale.mirage_anomalous)

    # downsampled re-check: verdict from 60 s mean buckets, datapoint raw.
    # The golden 1000-spike is one point of 86401 -> a 60 s mean bucket
    # dilutes it to ~17.65, still >> the 1.0 noise floor -> confirmed.
    ds = mirage_reanalyze(spark, parsed, deferred, cfg, now=res.now,
                          downsample_to=60).toPandas().iloc[0]
    assert ds.final_sink == "anomalous"
    assert ds.mirage_datapoint == 1000.0  # raw, not the bucket mean


def test_resumable_lineage(spark, tmp_path):
    """Kill between snapshots, re-run, verify no dupes/gaps via the
    lineage table (north_rule resume semantics)."""
    from skyline_spark.plans.lineage import (
        read_all_sinks,
        read_checkpoint,
        run_incremental,
        write_checkpoint,
    )
    from skyline_spark.sources.transcripts import synthetic_transcripts
    from skyline_spark.synth import EPOCH0, fixture_alert_config

    tdf = synthetic_transcripts(spark)
    adf = spark.createDataFrame(fixture_alert_config(),
                                schema=ALERT_CONFIG_SCHEMA)
    base = str(tmp_path / "lineage_run")
    cut = float(EPOCH0 - 3600)

    # batch 1: everything up to `cut`
    m1 = run_incremental(spark, tdf, adf, base, batch_hi=cut)
    assert m1["rows"] > 0
    # batch 2 crashes AFTER writing sinks but BEFORE the checkpoint
    m2 = run_incremental(spark, tdf, adf, base, crash_before_checkpoint=True)
    assert m2.get("crashed")
    assert read_checkpoint(base)["watermark"] == cut  # checkpoint untouched
    # resume: batch 2 replays into the same run dir (idempotent)
    m3 = run_incremental(spark, tdf, adf, base)
    assert m3["run_id"] == m2["run_id"]

    allrows = read_all_sinks(spark, base)
    total = tdf.count()
    assert allrows.count() == total  # no dupes, no gaps
    dup = (allrows.groupBy("conv_id", "turn_idx").count()
           .where(F.col("count") > 1).count())
    assert dup == 0

    # idempotent re-run EQUALITY (SURVEY §5 test-plan item 3): roll the
    # checkpoint back and replay the last batch a third time — the same
    # run_id must regenerate byte-identical per-turn sink sets, not
    # just matching counts
    def sink_rows():
        return sorted(
            tuple(r) for r in read_all_sinks(spark, base)
            .select("run_id", "conv_id", "turn_idx", "sink",
                    F.md5(F.col("text")).alias("text_md5")).collect())

    before = sink_rows()
    write_checkpoint(base, {"watermark": cut, "runs": [m1["run_id"]]})
    m4 = run_incremental(spark, tdf, adf, base)
    assert m4["run_id"] == m3["run_id"]
    assert sink_rows() == before
    assert read_checkpoint(base)["watermark"] == m3["watermark_hi"]


def test_streaming_stateful_alert_throttle(spark, tmp_path):
    """applyInPandasWithState: the per-metric last-alert state (the
    last_alert.* Redis key analogue) must persist ACROSS micro-batches —
    a burst split over two file-triggers emits exactly like the batch
    throttle_alerts_exact twin."""
    import os

    from skyline_spark.operators.alerts import throttle_alerts_exact
    from skyline_spark.streaming.throttle import streaming_alert_throttle

    # two files = two micro-batches; metric m1 alerts at t=0,100,400 -
    # with expiration 300 only t=0 and t=400 emit, and t=400 lands in
    # batch 2, so suppression of t=100 must survive the batch boundary
    rows1 = [("m1", pd.Timestamp(1_700_000_000, unit="s")),
             ("m1", pd.Timestamp(1_700_000_100, unit="s")),
             ("m2", pd.Timestamp(1_700_000_050, unit="s"))]
    rows2 = [("m1", pd.Timestamp(1_700_000_400, unit="s")),
             ("m2", pd.Timestamp(1_700_000_200, unit="s"))]
    srcdir = str(tmp_path / "anoms")
    os.makedirs(srcdir, exist_ok=True)
    for i, rows in enumerate((rows1, rows2)):
        spark.createDataFrame(pd.DataFrame(rows, columns=["metric", "ts"])) \
            .coalesce(1).write.parquet(f"{srcdir}/b{i}")
    schema = "metric string, ts timestamp"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/b*"))
    out = streaming_alert_throttle(stream, 300.0)
    q = (out.writeStream.format("memory").queryName("throttled")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM throttled").toPandas() \
        .sort_values(["metric", "ts_epoch"], ignore_index=True)

    batch_in = spark.createDataFrame(
        pd.DataFrame(rows1 + rows2, columns=["metric", "ts"])) \
        .withColumn("last_ts", F.col("ts").cast("timestamp").cast("double")) \
        .withColumn("expiration_time", F.lit(300.0))
    want = throttle_alerts_exact(batch_in).toPandas() \
        .sort_values(["metric", "last_ts"], ignore_index=True)
    assert list(got.emit_alert) == list(want.emit_alert)
    assert list(got[got.emit_alert].ts_epoch) == \
        [1_700_000_000.0, 1_700_000_400.0, 1_700_000_050.0]


def test_streaming_full_pipeline_foreachbatch(spark, tmp_path):
    """foreachBatch streaming pipeline: two micro-batches of fixture
    turns run the batch plan per trigger; every input row lands in
    exactly one routed sink row, batch-stamped."""
    import os

    from skyline_spark.sources.transcripts import synthetic_transcripts
    from skyline_spark.streaming.pipeline import run_streaming_pipeline
    from skyline_spark.synth import fixture_alert_config, fixture_pipeline_config

    tdf = synthetic_transcripts(spark)
    srcdir = str(tmp_path / "turns_in")
    os.makedirs(srcdir, exist_ok=True)
    # two conv-disjoint drops -> two micro-batches with whole series
    tdf.where(F.col("conv_id") <= "conv-app.server-0005") \
        .coalesce(1).write.parquet(f"{srcdir}/d0")
    tdf.where(F.col("conv_id") > "conv-app.server-0005") \
        .coalesce(1).write.parquet(f"{srcdir}/d1")
    stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{srcdir}/d*"))
    adf = spark.createDataFrame(fixture_alert_config(),
                                schema=ALERT_CONFIG_SCHEMA)
    out = str(tmp_path / "sinks")
    q = run_streaming_pipeline(spark, stream, adf,
                               fixture_pipeline_config(), out,
                               str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    routed = spark.read.parquet(out)
    assert routed.count() == tdf.count()  # no dupes, no gaps
    assert routed.select("batch_id").distinct().count() == 2
    sinks = {r.sink for r in routed.select("sink").distinct().collect()}
    assert "anomalous" in sinks and "exception" in sinks


def test_streaming_flux_multibatch_equals_batch(spark, tmp_path):
    """Batch-vs-streaming parity under INCREMENTAL state: the events
    table split into 3 time-interleaved file drops (event_id mod 3, so
    every window keeps receiving rows across micro-batches) must drain
    to the IDENTICAL aggregate as the one-shot batch plan — pinning the
    streaming state updates, not just a single-batch replay."""
    import os

    from skyline_spark.operators.aggregate import flux_aggregate
    from skyline_spark.streaming.flux_agg import (
        run_to_memory,
        streaming_flux_aggregate,
    )
    src = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(src)
    srcdir = str(tmp_path / "events_mb")
    os.makedirs(srcdir, exist_ok=True)
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1) \
            .write.parquet(f"{srcdir}/d{i}")
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{srcdir}/d*"))
    agg = streaming_flux_aggregate(stream, 3600)
    q = run_to_memory(agg, "flux_mb", str(tmp_path / "ckpt_mb"))
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # genuinely incremental
    got = spark.sql("select * from flux_mb").toPandas() \
        .sort_values(["namespace", "bucket_start"]).reset_index(drop=True)
    want = flux_aggregate(ev, 3600, namespace_col="event_type").toPandas() \
        .sort_values(["namespace", "bucket_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["namespace", "bucket_start", "avg", "sum", "min", "max"]],
        want[["namespace", "bucket_start", "avg", "sum", "min", "max"]],
        check_dtype=False)


def test_streaming_flux_aggregate(spark, tmp_path):
    """availableNow streaming run over the events table must equal the
    batch aggregation."""
    import glob

    from skyline_spark.operators.aggregate import flux_aggregate
    from skyline_spark.streaming.flux_agg import (
        run_to_memory,
        streaming_flux_aggregate,
    )
    import shutil
    src = "/root/testdata/sf0.001/events.parquet"
    srcdir = str(tmp_path / "events_in")
    import os
    os.makedirs(srcdir, exist_ok=True)
    shutil.copy(src, f"{srcdir}/part-0.parquet")
    ev_schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(ev_schema)
              .option("maxFilesPerTrigger", 1).parquet(srcdir))
    agg = streaming_flux_aggregate(stream, 3600)
    q = run_to_memory(agg, "flux_test", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.sql("select * from flux_test").toPandas() \
        .sort_values(["namespace", "bucket_start"]).reset_index(drop=True)
    want = flux_aggregate(spark.read.parquet(src), 3600,
                          namespace_col="event_type").toPandas() \
        .sort_values(["namespace", "bucket_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["namespace", "bucket_start", "avg", "sum", "min", "max"]],
        want[["namespace", "bucket_start", "avg", "sum", "min", "max"]],
        check_dtype=False)


def test_streaming_stateful_analyze(spark, tmp_path):
    """applyInPandasWithState analyze: each (conv_id, metric) series'
    raw retention window lives in group state (the Redis FULL_DURATION
    window analogue) — turns split over THREE chronological
    micro-batches must converge to verdicts IDENTICAL to the batch
    kernel on the full input, per series, at the same pinned `now`."""
    import os

    from skyline_spark.operators.analyze import analyze
    from skyline_spark.operators.parse import parse_events
    from skyline_spark.plans.pipeline import batch_now
    from skyline_spark.sources.transcripts import synthetic_transcripts
    from skyline_spark.streaming.analyze import streaming_analyze
    from skyline_spark.synth import fixture_pipeline_config

    tdf = synthetic_transcripts(spark)
    parsed = parse_events(tdf).where(F.col("value").isNotNull())
    now = batch_now(tdf)
    cfg = fixture_pipeline_config()

    # three chronological files = three micro-batches; every series
    # straddles the batch boundaries, so its verdict can only be right
    # if the window state survives them
    pp = parsed.select("conv_id", "metric", "ts", "value").toPandas() \
        .sort_values("ts", kind="stable", ignore_index=True)
    cuts = [0, len(pp) // 3, 2 * len(pp) // 3, len(pp)]
    srcdir = str(tmp_path / "turns")
    os.makedirs(srcdir, exist_ok=True)
    for i in range(3):
        spark.createDataFrame(pp.iloc[cuts[i]:cuts[i + 1]]) \
            .coalesce(1).write.parquet(f"{srcdir}/b{i}")

    stream = (spark.readStream
              .schema("conv_id string, metric string, ts timestamp, "
                      "value double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/b*"))
    out = streaming_analyze(stream, cfg, rules=[], now=now)
    q = (out.writeStream.format("memory").queryName("stream_verdicts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_an"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    emitted = spark.sql("SELECT * FROM stream_verdicts").toPandas()
    # one emission per series per micro-batch it had rows in; the
    # converged verdict is the one with the LATEST window head
    # (last_ts is monotone per series as state accumulates; n_points is
    # NOT — the retention trim can shrink the window as the head
    # advances, which is exactly why it can't be the sort key)
    # (drop_duplicates keep='last', NOT groupby().last() — the latter
    # takes the last NON-NULL per column and would resurrect an early
    # partial-window Stale exception over the final None)
    last = (emitted.sort_values("last_ts", kind="stable")
            .drop_duplicates(["conv_id", "metric"], keep="last")
            .reset_index(drop=True))

    want = (analyze(parsed, cfg, now, rules=[])
            .select("conv_id", "metric", "anomalous", "exception",
                    "datapoint", "n_points", "last_ts", "triggered")
            .toPandas())
    merged = last.merge(want, on=["conv_id", "metric"],
                        suffixes=("_s", "_b"))
    assert len(merged) == len(want) == len(last)
    assert (merged.anomalous_s == merged.anomalous_b).all()
    assert (merged.exception_s.fillna("-")
            == merged.exception_b.fillna("-")).all()
    assert (merged.n_points_s == merged.n_points_b).all()
    assert (merged.last_ts_s == merged.last_ts_b).all()
    assert all(list(a) == list(b) for a, b in
               zip(merged.triggered_s, merged.triggered_b))
    # datapoint: exact equality (same kernel, same float path)
    import numpy as np
    assert np.allclose(merged.datapoint_s.astype(float),
                       merged.datapoint_b.astype(float),
                       rtol=0, atol=0, equal_nan=True)


def test_streaming_exact_dedup(spark, tmp_path):
    """Multi-micro-batch streaming dedup == batch first-wins dedup:
    duplicates planted across micro-batch boundaries must still dedup
    (state carries across batches), and the kept row is the first
    arrival by event time."""
    import os

    from skyline_spark.streaming.dedup import streaming_dedup_exact
    from skyline_spark.streaming.flux_agg import run_to_memory

    srcdir = str(tmp_path / "docs_in")
    os.makedirs(srcdir, exist_ok=True)
    mk = spark.createDataFrame
    schema = "doc_id long, text string, ts timestamp"
    # batch 1: two distinct docs + an in-batch dup of A
    mk([(0, "alpha text", "2024-01-01 00:00:00"),
        (1, "beta text", "2024-01-01 00:01:00"),
        (2, "alpha text", "2024-01-01 00:02:00")],
       schema="doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts")) \
        .write.parquet(f"{srcdir}/b1")
    # batch 2: a cross-batch dup of B + one new doc
    mk([(3, "beta text", "2024-01-01 00:03:00"),
        (4, "gamma text", "2024-01-01 00:04:00")],
       schema="doc_id long, text string, ts string") \
        .withColumn("ts", F.to_timestamp("ts")) \
        .write.parquet(f"{srcdir}/b2")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{srcdir}/*"))
    out = streaming_dedup_exact(stream, watermark="10 minutes")
    q = run_to_memory(out, "dedup_test", str(tmp_path / "ckpt_dd"),
                      output_mode="append")
    q.awaitTermination(120)
    got = spark.sql("select doc_id, text from dedup_test").toPandas()
    kept = set(got.doc_id)
    assert set(got.text) == {"alpha text", "beta text", "gamma text"}
    assert len(got) == 3
    # exactly one alpha survives (which of 0/2 wins within a
    # micro-batch is processing-order-arbitrary across partitions);
    # the cross-batch duplicate (doc 3) is dropped by carried state
    assert len(kept & {0, 2}) == 1
    assert 3 not in kept and 4 in kept


def test_streaming_lsh_candidate_pairs(spark, tmp_path):
    """Multi-micro-batch MinHash-LSH candidate generation == the batch
    bucket-join on the same corpus: near-duplicate families are split
    so their members arrive in DIFFERENT micro-batches — the pairs can
    only be emitted if each band bucket's membership survives in group
    state."""
    import os

    from skyline_spark.operators.dedup import (
        lsh_candidate_pairs,
        with_minhash,
    )
    from skyline_spark.streaming.dedup import streaming_lsh_candidate_pairs
    from skyline_spark.streaming.flux_agg import run_to_memory

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank while the sun sets slowly behind the hills")
    docs = []
    # three near-dup families (suffix tweaks keep shingle overlap
    # high) + unrelated fillers, ids interleaved so families straddle
    # the batch split
    for fam in range(3):
        for rep in range(3):
            docs.append((fam * 10 + rep,
                         f"{base} family {fam} variant tail {rep}"))
    for k in range(6):
        docs.append((100 + k,
                     f"totally unrelated document number {k} with "
                     f"its own words {k * 7} and nothing shared {k}"))
    # split so every family has members on both sides
    b1 = [d for d in docs if d[0] % 2 == 0]
    b2 = [d for d in docs if d[0] % 2 == 1]
    srcdir = str(tmp_path / "lsh_in")
    os.makedirs(srcdir, exist_ok=True)
    schema = "doc_id long, text string, ts timestamp"
    for i, part in enumerate((b1, b2)):
        spark.createDataFrame(
            [(i_, t, f"2024-01-01 00:0{i}:00") for i_, t in part],
            schema="doc_id long, text string, ts string") \
            .withColumn("ts", F.to_timestamp("ts")) \
            .coalesce(1).write.parquet(f"{srcdir}/b{i}")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false")
              .parquet(f"{srcdir}/*"))
    out = streaming_lsh_candidate_pairs(stream, watermark="10 minutes")
    q = run_to_memory(out, "lsh_pairs_test", str(tmp_path / "ckpt_lsh"),
                      output_mode="append")
    q.awaitTermination(120)
    got = {(int(a), int(b)) for a, b in spark.sql(
        "select id_a, id_b from lsh_pairs_test").toPandas().values}

    batch_docs = spark.createDataFrame(docs, "doc_id long, text string")
    want = {(int(a), int(b)) for a, b in
            lsh_candidate_pairs(with_minhash(batch_docs))
            .toPandas().values}
    assert got == want
    # the state actually mattered: at least one family pair crosses
    # the micro-batch split (one even, one odd id)
    assert any(a % 2 != b % 2 for a, b in got)
    # and the families were bucketed together at all
    assert any(a // 10 == b // 10 and a < 100 for a, b in got)


def test_thunder_stale_metrics(spark):
    import pandas as pd

    from skyline_spark.operators.thunder import thunder_stale_metrics

    def series(conv, metric, start, n, step=60):
        return pd.DataFrame({
            "conv_id": conv, "metric": metric,
            "ts": pd.to_datetime([start + i * step for i in range(n)],
                                 unit="s"),
            "value": 1.0})

    now = 1_700_100_000
    frames = [
        # ended 2000 s ago: stale under view's custom 1000 s period,
        # fresh under the default 5000 s
        series("a", "view.m", now - 2000 - 59 * 60, 60),
        series("b", "click.m", now - 2000 - 59 * 60, 60),
        # ended 6000 s ago: stale under the default too
        series("c", "click.m", now - 6000 - 59 * 60, 60),
        # stale but sparse: 5 points at the 60 s resolution over a
        # 3600 s expected window -> sparsity 8.3% -> excluded
        series("d", "click.m", now - 6000 - 4 * 60, 5),
    ]
    v = spark.createDataFrame(pd.concat(frames))
    out = thunder_stale_metrics(
        v, float(now), stale_period=5000, full_duration=3600,
        custom_stale_periods={"view": 1000},
        sparsity_threshold=50.0, exclude_sparsely_populated=True)
    got = {r.conv_id: r for r in out.collect()}
    assert set(got) == {"a", "c"}
    assert got["a"].parent_namespace == "view"
    assert got["a"].stale_for == 2000 and got["c"].stale_for == 6000
    # without the exclusion, the sparse series surfaces too
    out2 = thunder_stale_metrics(
        v, float(now), stale_period=5000, full_duration=3600,
        custom_stale_periods={"view": 1000},
        exclude_sparsely_populated=False)
    assert set(r.conv_id for r in out2.collect()) == {"a", "c", "d"}


def test_streaming_routed_sets_under_late_and_duplicate_arrivals(
        spark, tmp_path):
    """The north-rule invariant under disorder: micro-batches that
    interleave in time (every series' odd turns arrive a whole trigger
    AFTER its even turns — all of them 'late' w.r.t. the first batch's
    watermark) and re-deliver a slice of already-seen rows must drain
    to per-sink routed-row SETS identical to the one-shot batch plan on
    the deduplicated input, per-turn text equality included."""
    import os

    from skyline_spark.plans.pipeline import run_pipeline
    from skyline_spark.sources.transcripts import synthetic_transcripts
    from skyline_spark.streaming.pipeline import (
        run_streaming_pipeline_cumulative,
    )
    from skyline_spark.synth import (
        fixture_alert_config,
        fixture_pipeline_config,
    )

    tdf = synthetic_transcripts(spark).where(
        F.col("conv_id") <= "conv-app.server-0009")
    srcdir = str(tmp_path / "turns_in")
    os.makedirs(srcdir, exist_ok=True)
    even = tdf.where(F.col("turn_idx") % 2 == 0)
    odd = tdf.where(F.col("turn_idx") % 2 == 1)
    # drop 0: even turns only. drop 1: the late odd turns PLUS a
    # duplicate re-delivery of a third of the even turns.
    even.coalesce(1).write.parquet(f"{srcdir}/d0")
    odd.unionByName(even.where(F.col("turn_idx") % 3 == 0)) \
        .coalesce(1).write.parquet(f"{srcdir}/d1")
    stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/d*"))
    adf = spark.createDataFrame(fixture_alert_config(),
                                schema=ALERT_CONFIG_SCHEMA)
    out = str(tmp_path / "sinks")
    q = run_streaming_pipeline_cumulative(
        spark, stream, adf, fixture_pipeline_config(), out,
        str(tmp_path / "ckpt"), str(tmp_path / "staging"))
    q.awaitTermination(240)

    key = ("conv_id", "turn_idx", "sink")
    got = spark.read.parquet(out).select(
        *key, F.md5(F.col("text")).alias("text_md5"))
    want = run_pipeline(spark, tdf, adf,
                        fixture_pipeline_config()).routed_turns.select(
        *key, F.md5(F.col("text")).alias("text_md5"))
    got_set = {tuple(r) for r in got.collect()}
    want_set = {tuple(r) for r in want.collect()}
    assert got_set == want_set          # per-sink routed-row sets equal
    assert len(got_set) == tdf.count()  # duplicates collapsed, no gaps
    # per-sink aggregate counts equal too (the reference's headline)
    gc = dict(got.groupBy("sink").count().collect())
    wc = dict(want.groupBy("sink").count().collect())
    assert gc == wc


def test_streaming_thunder_alert_state_machine(spark, tmp_path):
    """applyInPandasWithState: the thunder.alert.* key (alert-once with
    TTL re-alert + recovery-on-heal) must persist across micro-batches —
    a flapping check split over two file-triggers emits exactly the
    event sequence of the batch Redis-key simulation."""
    import os

    from skyline_spark.operators.thunder import thunder_alert_events_exact
    from skyline_spark.streaming.thunder_alerts import (
        streaming_thunder_alerts,
    )

    base = 1_700_000_000
    # check c1: bad at 0..200 (alert at 0, suppressed), heals at 300
    # (recovery), bad again at 400 (alert) and STAYS bad past the TTL
    # (re-alert at 1500: 400+1000 < 1500). The heal/re-bad edge and the
    # TTL lapse both land in batch 2, so state must cross the boundary.
    rows1 = [("c1", base + 0, True), ("c1", base + 100, True),
             ("c1", base + 200, True),
             ("c2", base + 50, False)]
    rows2 = [("c1", base + 300, False), ("c1", base + 400, True),
             ("c1", base + 1500, True),
             ("c2", base + 250, True), ("c2", base + 350, False)]
    srcdir = str(tmp_path / "checks")
    os.makedirs(srcdir, exist_ok=True)
    for i, rows in enumerate((rows1, rows2)):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["check_key", "e", "bad"])
            .assign(ts=lambda d: pd.to_datetime(d.e, unit="s"))
            .drop(columns=["e"])) \
            .coalesce(1).write.parquet(f"{srcdir}/b{i}")
    schema = "check_key string, bad boolean, ts timestamp"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/b*"))
    out = streaming_thunder_alerts(stream, expiry=1000.0)
    q = (out.writeStream.format("memory").queryName("thunder_alerts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_ta"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM thunder_alerts").toPandas() \
        .sort_values(["check_key", "ts_epoch"], ignore_index=True)

    batch_in = spark.createDataFrame(
        pd.DataFrame(rows1 + rows2, columns=["check_key", "e", "bad"])
        .assign(ts=lambda d: pd.to_datetime(d.e, unit="s"))
        .drop(columns=["e"]))
    want = thunder_alert_events_exact(batch_in, expiry=1000.0).toPandas() \
        .sort_values(["check_key", "ts_epoch"], ignore_index=True)
    assert list(got.event.fillna("")) == list(want.event.fillna(""))
    c1 = got[got.check_key == "c1"]
    assert list(c1.event.fillna("")) == \
        ["alert", "", "", "recovery", "alert", "alert"]
    c2 = got[got.check_key == "c2"]
    assert list(c2.event.fillna("")) == ["", "alert", "recovery"]
