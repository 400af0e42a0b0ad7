"""Luminosity classification (classify_metrics / classify_anomalies)
— reference: skyline/luminosity/classify_metrics.py:58-1191 and
classify_anomalies.py:69-584."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from skyline_spark.operators.classify import (
    classify_anomalies,
    classify_metrics,
    continuous_periods,
    metric_resolution,
    persist_walk,
    persist_walk_closed,
    significant_level_shift,
)


def test_metric_resolution_mode_and_tie_break():
    # diffs: 60 x2, 120 x2 -> tie; Counter insertion order keeps the
    # FIRST-encountered diff (120 here)
    e = np.array([0, 120, 180, 300, 360], dtype=np.int64)
    assert metric_resolution(e) == 120
    # clear majority
    e = np.array([0, 60, 120, 180, 400], dtype=np.int64)
    assert metric_resolution(e) == 60
    assert metric_resolution(np.array([5], dtype=np.int64)) == 0


def test_metric_resolution_last_30_only():
    # 40 points: first 10 gaps are 600s, last 29 gaps are 60s; only the
    # last-30 tail (29 diffs of 60) is consulted
    e = np.concatenate([np.arange(11) * 600,
                        6000 + 60 + np.arange(29) * 60]).astype(np.int64)
    assert metric_resolution(e) == 60


def test_continuous_periods_grouping():
    assert continuous_periods([], 60) == []
    assert continuous_periods([0, 60, 120, 300, 360, 900], 60) == [
        [0, 60, 120], [300, 360], [900]]
    # non-exact spacing never chains
    assert continuous_periods([0, 61, 122], 60) == [[0], [61], [122]]


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_persist_walk_literal_matches_closed_form(data):
    """The closed form the SQL oracle uses is exactly the reference's
    literal walk (un-reset last_p_timestamp quirk included)."""
    res = data.draw(st.sampled_from([1, 60]))
    grid = [i * res for i in range(40)]
    level = sorted(data.draw(st.sets(st.sampled_from(grid), max_size=15)))
    persist = sorted(data.draw(st.sets(st.sampled_from(grid), max_size=15)))
    sig_len = data.draw(st.integers(min_value=1, max_value=6))
    assert persist_walk(level, persist, res, sig_len) == \
        persist_walk_closed(level, persist, res, sig_len)


def test_persist_walk_first_run_only_grows():
    # persist islands: [0..240] (5 pts) and [600..660] (2 pts); shared
    # level anomalies at 60 and 600. Only the run from the FIRST shared
    # timestamp (60 -> 240, length 4) counts; 600's period stays a
    # singleton even though its island has 2 points.
    level = [60, 600]
    persist = [0, 60, 120, 180, 240, 600, 660]
    assert persist_walk(level, persist, 60, 4) == (True, 60)
    assert persist_walk(level, persist, 60, 5) == (False, None)
    # sig_len 2 would be met by 600's island under a NON-quirky reading;
    # the reference walk still only grows the first run, but run(60)=5
    # already qualifies
    assert persist_walk([600], persist, 60, 2) == (True, 600)


def test_significant_level_shift_no_persist_branch():
    # <= 2 periods and one >= sig_len -> significant at that period's
    # first timestamp
    level = [0, 60, 120, 600]
    ok, ts, nper = significant_level_shift(level, [], 60, 3)
    assert (ok, ts, nper) == (True, 0, 2)
    # > 2 periods -> never significant
    level = [0, 300, 900, 1500]
    ok, ts, nper = significant_level_shift(level, [], 60, 1)
    assert (ok, ts) == (False, None) and nper == 4
    assert significant_level_shift([], [], 60, 3) == (False, None, 0)


def _series_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "value"])
        .assign(ts=lambda d: pd.to_datetime(d.ts, unit="s"),
                metric="m.test"))


def test_classify_metrics_planted_level_shift(spark):
    """A clean sustained step on a regular grid classifies as a
    level-shift metric; a stable series does not."""
    rng = np.random.RandomState(7)
    n = 200
    base = 1_700_000_000
    rows = []
    v = rng.normal(100, 0.5, n)
    v[120:] += 500.0  # one sustained shift
    for i in range(n):
        rows.append(("shifted", i, base + i * 60, float(v[i])))
    w = rng.normal(100, 0.5, n)
    for i in range(n):
        rows.append(("stable", i, base + i * 60, float(w[i])))
    out = classify_metrics(_series_df(spark, rows), c=4.0, persist_c=4.0,
                           volatility_c=4.0).toPandas() \
        .set_index("conv_id")
    assert out.loc["shifted"].level_shift
    assert out.loc["shifted"].resolution == 60
    assert out.loc["shifted"].n_level_anomalies > 0
    assert not out.loc["stable"].level_shift
    assert out.loc["stable"].n_level_anomalies == 0
    # the trigger lands at/near the plant (within the 10-pt window)
    trig = out.loc["shifted"].level_shift_timestamp
    assert base + 110 * 60 <= trig <= base + 130 * 60


def test_classify_metrics_volatility_shift(spark):
    """A variance burst classifies as a volatility-shift metric with
    the trigger at the LAST continuous period start."""
    rng = np.random.RandomState(11)
    n = 150
    base = 1_700_000_000
    v = rng.normal(50, 0.2, n)
    v[100:115] = 50 + rng.normal(0, 30, 15)
    rows = [("burst", i, base + i * 60, float(v[i])) for i in range(n)]
    out = classify_metrics(_series_df(spark, rows), c=4.0, persist_c=4.0,
                           volatility_c=4.0).toPandas().iloc[0]
    assert out.volatility_shift
    assert out.n_volatility_periods <= 2
    assert out.volatility_shift_timestamp is not None


def test_classify_metrics_too_short_series(spark):
    rows = [("tiny", i, 1_700_000_000 + i * 60, float(i)) for i in range(8)]
    out = classify_metrics(_series_df(spark, rows)).toPandas().iloc[0]
    assert out.n_points == 8
    assert out.n_level_anomalies == 0
    assert not out.level_shift and not out.volatility_shift


def test_classify_anomalies_types_and_gating(spark):
    """Per-anomaly training-window classification: a step right at the
    anomaly triggers the IQR algorithms inside the last-5 window; a
    too-short window (n < 11) triggers nothing."""
    rng = np.random.RandomState(3)
    n = 60
    base = 1_700_000_000
    v = rng.normal(10, 0.1, n)
    v[-3:] += 80.0  # shift landing inside the final 5-point window
    rows = [("a", i, base + i * 60, float(v[i])) for i in range(n)]
    rows += [("b", i, base + i * 60, float(i % 3)) for i in range(7)]
    df = _series_df(spark, rows)
    anoms = spark.createDataFrame(
        [("a", base + (n - 1) * 60), ("a", base + 30 * 60),
         ("b", base + 6 * 60)],
        "conv_id string, anomaly_e long")
    out = classify_anomalies(df, anoms).toPandas() \
        .set_index(["conv_id", "anomaly_e"]).sort_index()
    hot = out.loc[("a", base + (n - 1) * 60)]
    assert hot.adtk_persist  # value vs 5-pt trailing median fence
    assert hot.anomaly_types != ""
    assert all(t in ("adtk_level_shift", "adtk_volatility_shift",
                     "adtk_persist", "adtk_seasonal")
               for t in hot.anomaly_types.split(","))
    # mid-series anomaly: window ends before the plant -> quiet
    mid = out.loc[("a", base + 30 * 60)]
    assert mid.anomaly_types == ""
    # 7-point window: persist can run (n >= 6), level/vol/seasonal gated
    tiny = out.loc[("b", base + 6 * 60)]
    assert not tiny.adtk_level_shift and not tiny.adtk_volatility_shift
    assert not tiny.adtk_seasonal
    assert tiny.n_points == 7


def test_classify_anomalies_types_string_order(spark):
    """anomaly_types joins triggered algorithms in settings order."""
    from skyline_spark.operators.classify import (
        CLASSIFY_ANOMALY_ALGORITHMS,
    )
    assert CLASSIFY_ANOMALY_ALGORITHMS == (
        "adtk_level_shift", "adtk_volatility_shift", "adtk_persist",
        "adtk_seasonal")


@pytest.mark.parametrize("sig_len,expect", [(1, True), (4, True),
                                            (5, False)])
def test_persist_walk_run_length_boundary(sig_len, expect):
    level = [120]
    persist = [120, 180, 240, 300]
    got, ts = persist_walk(level, persist, 60, sig_len)
    assert got is expect
    assert ts == (120 if expect else None)


def test_classify_metrics_constant_series_no_flags(spark):
    """A constant series: every rolling aggregate equal, IQR fence 0,
    strict > never fires (the 10-dp rounding keeps two-pass and
    streaming std agreeing on the exact zero)."""
    rows = [("flat", i, 1_700_000_000 + i * 60, 42.0) for i in range(80)]
    out = classify_metrics(_series_df(spark, rows), c=4.0, persist_c=4.0,
                           volatility_c=4.0).toPandas().iloc[0]
    assert out.n_level_anomalies == 0
    assert out.n_volatility_anomalies == 0
    assert not out.level_shift and not out.volatility_shift


def test_classify_metrics_single_point(spark):
    rows = [("one", 0, 1_700_000_000, 5.0)]
    out = classify_metrics(_series_df(spark, rows)).toPandas().iloc[0]
    assert out.n_points == 1 and out.resolution == 0
    assert not out.level_shift and not out.volatility_shift


def test_classify_anomalies_constant_window(spark):
    """Constant training window: level/volatility/persist diffs are all
    zero (no flags); seasonal hits the zero-denominator path -> False."""
    rows = [("k", i, 1_700_000_000 + i * 60, 7.0) for i in range(40)]
    anoms = spark.createDataFrame([("k", 1_700_000_000 + 39 * 60)],
                                  "conv_id string, anomaly_e long")
    out = classify_anomalies(_series_df(spark, rows), anoms) \
        .toPandas().iloc[0]
    assert out.anomaly_types == ""
    assert not out.adtk_seasonal


def test_streaming_classify_matches_batch(spark, tmp_path):
    """applyInPandasWithState classify twin: the planted level-shift /
    volatility corpus split over THREE chronological micro-batches —
    every series straddles the boundaries, and one out-of-order
    duplicate epoch with a LOWER turn_idx arrives in the last batch so
    the first-per-epoch rule must resolve across state. The LAST
    emission per series must equal the batch classify_metrics output
    on the full input."""
    import os

    from skyline_spark.operators.classify import classify_metrics
    from skyline_spark.streaming.classify import (
        streaming_classify_metrics,
    )

    rng = np.random.RandomState(23)
    n = 180
    base = 1_700_000_000
    rows = []
    v = rng.normal(100, 0.5, n)
    v[110:] += 400.0
    for i in range(n):
        rows.append(("shifted", i, base + i * 60, float(v[i])))
    w = rng.normal(50, 0.2, n)
    w[100:115] = 50 + rng.normal(0, 30, 15)  # one contained burst
    for i in range(n):
        rows.append(("bursty", i, base + i * 60, float(w[i])))
    # a late duplicate of an EARLY epoch with a smaller turn_idx: the
    # batch sort prefers it, so streaming state must let it win too
    late_dup = ("shifted", -1, base + 5 * 60, 9999.0)

    pp = (pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts",
                                      "value"])
          .assign(ts=lambda d: pd.to_datetime(d.ts, unit="s"),
                  metric="m.test")
          .sort_values("ts", kind="stable", ignore_index=True))
    cuts = [0, len(pp) // 3, 2 * len(pp) // 3, len(pp)]
    parts = [pp.iloc[cuts[i]:cuts[i + 1]] for i in range(3)]
    parts[2] = pd.concat([parts[2], pd.DataFrame(
        [late_dup], columns=["conv_id", "turn_idx", "ts", "value"])
        .assign(ts=lambda d: pd.to_datetime(d.ts, unit="s"),
                metric="m.test")], ignore_index=True)
    srcdir = str(tmp_path / "turns")
    os.makedirs(srcdir, exist_ok=True)
    for i, part in enumerate(parts):
        spark.createDataFrame(part).coalesce(1) \
            .write.parquet(f"{srcdir}/b{i}")

    kw = dict(c=4.0, persist_c=4.0, volatility_c=4.0)
    stream = (spark.readStream
              .schema("conv_id string, turn_idx long, ts timestamp, "
                      "value double, metric string")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/b*"))
    out = streaming_classify_metrics(stream, **kw)
    q = (out.writeStream.format("memory").queryName("stream_classify")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_cl"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    emitted = spark.sql("SELECT * FROM stream_classify").toPandas()
    assert len(emitted) > 2  # multiple emissions per series
    last = (emitted.sort_values("n_points", kind="stable")
            .drop_duplicates("conv_id", keep="last")
            .sort_values("conv_id", ignore_index=True))

    batch_in = spark.createDataFrame(pd.concat(parts, ignore_index=True))
    want = (classify_metrics(batch_in, **kw).toPandas()
            .sort_values("conv_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        last[want.columns].reset_index(drop=True), want,
        check_dtype=False)
    # the planted behaviours survive the streaming path
    byc = last.set_index("conv_id")
    assert byc.loc["shifted"].level_shift
    assert byc.loc["bursty"].volatility_shift


def test_streaming_classify_anomalies_matches_batch(spark, tmp_path):
    """applyInPandasWithState classify_anomalies twin: the static
    anomaly list broadcasts onto a stream split over THREE
    chronological micro-batches; each (conv_id, anomaly_e) training
    slice accumulates in group state. The LAST emission per anomaly
    must equal the batch classify_anomalies on the full input."""
    import os

    rng = np.random.RandomState(3)
    n = 60
    base = 1_700_000_000
    v = rng.normal(10, 0.1, n)
    v[-3:] += 80.0
    rows = [("a", i, base + i * 60, float(v[i])) for i in range(n)]
    rows += [("b", i, base + i * 60, float(i % 3)) for i in range(7)]
    anoms_rows = [("a", base + (n - 1) * 60), ("a", base + 30 * 60),
                  ("b", base + 6 * 60)]

    pp = (pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts",
                                      "value"])
          .assign(ts=lambda d: pd.to_datetime(d.ts, unit="s"))
          .sort_values("ts", kind="stable", ignore_index=True))
    cuts = [0, len(pp) // 3, 2 * len(pp) // 3, len(pp)]
    srcdir = str(tmp_path / "turns")
    os.makedirs(srcdir, exist_ok=True)
    for i in range(3):
        spark.createDataFrame(pp.iloc[cuts[i]:cuts[i + 1]]) \
            .coalesce(1).write.parquet(f"{srcdir}/b{i}")
    anoms = spark.createDataFrame(anoms_rows,
                                  "conv_id string, anomaly_e long")

    from skyline_spark.streaming.classify import (
        streaming_classify_anomalies,
    )
    stream = (spark.readStream
              .schema("conv_id string, turn_idx long, ts timestamp, "
                      "value double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/b*"))
    out = streaming_classify_anomalies(stream, anoms)
    q = (out.writeStream.format("memory").queryName("stream_canoms")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_ca"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    emitted = spark.sql("SELECT * FROM stream_canoms").toPandas()
    # mid-series anomaly's slice completes in batch 1; the series-head
    # anomalies keep growing -> multiple emissions per group
    assert len(emitted) > 3
    last = (emitted.sort_values("n_points", kind="stable")
            .drop_duplicates(["conv_id", "anomaly_e"], keep="last")
            .sort_values(["conv_id", "anomaly_e"], ignore_index=True))

    want = (classify_anomalies(spark.createDataFrame(pp), anoms)
            .toPandas()
            .sort_values(["conv_id", "anomaly_e"], ignore_index=True))
    pd.testing.assert_frame_equal(
        last[want.columns].reset_index(drop=True), want,
        check_dtype=False)
    byk = last.set_index(["conv_id", "anomaly_e"])
    assert byk.loc[("a", base + (n - 1) * 60)].adtk_persist
    assert byk.loc[("a", base + 30 * 60)].anomaly_types == ""


def test_streaming_classify_state_bounded_by_retention(spark, tmp_path):
    """r08: the classify twin's group state trims to full_duration
    behind the series head (streaming/analyze.py rule). A long
    multi-batch feed spanning 3x the retention window must classify
    like the batch sweep over ONLY the head window — points older than
    full_duration behind the head no longer influence the result,
    which is exactly the state-length bound (state holds <= the window's
    points, never the whole history)."""
    import os

    from skyline_spark.operators.classify import classify_metrics
    from skyline_spark.streaming.classify import (
        streaming_classify_metrics,
    )

    rng = np.random.RandomState(7)
    n = 180  # 3 hours at 60 s cadence
    fd = 3600  # 1 h retention -> the last ~60 points
    base = 1_700_000_000
    v = rng.normal(100, 0.5, n)
    # a level shift INSIDE the head window so the trimmed classification
    # is non-trivial, plus an early burst OUTSIDE it that would flip the
    # result if stale points leaked through the trim
    v[:40] += 500.0
    v[150:] += 400.0
    rows = [("trimmed", i, base + i * 60, float(v[i])) for i in range(n)]
    pp = (pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts",
                                      "value"])
          .assign(ts=lambda d: pd.to_datetime(d.ts, unit="s"),
                  metric="m.test")
          .sort_values("ts", kind="stable", ignore_index=True))
    cuts = [0, len(pp) // 3, 2 * len(pp) // 3, len(pp)]
    srcdir = str(tmp_path / "turns")
    os.makedirs(srcdir, exist_ok=True)
    for i in range(3):
        spark.createDataFrame(pp.iloc[cuts[i]:cuts[i + 1]]) \
            .coalesce(1).write.parquet(f"{srcdir}/b{i}")

    kw = dict(c=4.0, persist_c=4.0, volatility_c=4.0)
    stream = (spark.readStream
              .schema("conv_id string, turn_idx long, ts timestamp, "
                      "value double, metric string")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(f"{srcdir}/b*"))
    out = streaming_classify_metrics(stream, full_duration=fd, **kw)
    q = (out.writeStream.format("memory").queryName("stream_cl_trim")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_trim"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    emitted = spark.sql("SELECT * FROM stream_cl_trim").toPandas()
    last = (emitted.sort_values("n_points", kind="stable")
            .drop_duplicates("conv_id", keep="last")
            .sort_values("conv_id", ignore_index=True))
    # state length bound: the head window holds < 62 points, and the
    # last emission's n_points is the state length at the final trigger
    assert int(last["n_points"].iloc[0]) <= fd // 60 + 1

    head = base + (n - 1) * 60
    window_in = pp[pp.ts > pd.Timestamp(head - fd, unit="s")]
    want = (classify_metrics(spark.createDataFrame(window_in), **kw)
            .toPandas().sort_values("conv_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        last[want.columns].reset_index(drop=True), want,
        check_dtype=False)
