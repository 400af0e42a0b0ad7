"""Repetitive-pattern learning: determine_repetitive_peaks kernel
pins (vs an independently-written naive twin), the
learn_repetitive_patterns alignment-walk quirk, and the
find_repetitive_patterns decision-flow branches the sf corpora cannot
reach (comparison abort, dead train-on-avg, trained-period strictness,
dense-window downsample parity with pandas backward resample)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from datetime import datetime, timezone
from hypothesis import given, settings
from hypothesis import strategies as st

from skyline_spark.operators.repetitive import (
    aligned_training_walk,
    determine_repetitive_peaks,
    find_peaks_1d,
    find_repetitive_patterns_flow,
)

series = st.lists(
    st.floats(min_value=-100, max_value=100,
              allow_nan=False, allow_infinity=False)
    .map(lambda x: round(x, 2)),
    min_size=3, max_size=60)


def _naive_peaks(v: list[float]) -> list[int]:
    """Independent re-derivation of the no-argument scipy find_peaks
    contract: strictly-greater-than-neighbour maxima, plateau reports
    its middle index."""
    out = []
    n = len(v)
    i = 1
    while i < n - 1:
        left = v[i - 1]
        if v[i] <= left:
            i += 1
            continue
        j = i
        while j + 1 < n and v[j + 1] == v[i]:
            j += 1
        if j + 1 < n and v[j + 1] < v[i]:
            out.append((i + j) // 2)
        i = j + 1
    return out


@given(series)
@settings(max_examples=100, deadline=None)
def test_find_peaks_matches_naive(v):
    assert find_peaks_1d(np.array(v)) == _naive_peaks(v)


def test_find_peaks_plateau_cases():
    # strict peak, flat plateau (middle index), edge plateaus excluded
    assert find_peaks_1d(np.array([0, 1, 0])) == [1]
    assert find_peaks_1d(np.array([0, 2, 2, 2, 0])) == [2]
    assert find_peaks_1d(np.array([0, 2, 2, 0])) == [1]
    assert find_peaks_1d(np.array([2, 2, 0, 1])) == []
    assert find_peaks_1d(np.array([0, 1, 2, 3])) == []


def test_determine_repetitive_peaks_planted_period():
    """Spikes every 10 steps on a quiet base: one period bucket with
    >= 5 pairs -> every spike index is repetitive."""
    v = np.zeros(64)
    spikes = list(range(5, 64, 10))
    for s in spikes:
        v[s] = 50.0
    res = determine_repetitive_peaks(v)
    # 6 spikes: period 10 has 5 forward pairs (>= the 5-pair floor),
    # period 20 only 4, period 30+ fewer -> only 10 survives
    assert set(res["peak_periods"]) == {10}
    assert res["repetitive_peak_indices"] == spikes
    # all spike values equal -> identical zscores, every forward pair
    # of every surviving period present
    assert [5, 15] in res["peak_periods"][10]


def test_determine_repetitive_peaks_min_pair_floor():
    """Periods with fewer than 5 pairs are dropped
    (find 5567's hardcoded floor, determine_repetitive_peaks.py:133-135)."""
    v = np.zeros(30)
    for s in (4, 14, 24):  # only 3 forward pairs at period 10/20
        v[s] = 50.0
    res = determine_repetitive_peaks(v)
    assert res["peak_periods"] == {}
    assert res["repetitive_peak_indices"] == []
    assert res["peaks"] == [4, 14, 24]


def test_determine_repetitive_peaks_zscore_band():
    """A pair only forms when the earlier peak's int-zscore falls in
    [op_zscore - 2, op_zscore + 1] — a much taller partner is not a
    repetition of the smaller one."""
    v = np.zeros(200)
    small = list(range(5, 100, 10))
    for s in small:
        v[s] = 30.0
    v[150] = 3000.0  # dominates the std, pushes small spikes below
    res = determine_repetitive_peaks(v)
    assert 150 not in res["repetitive_peak_indices"]


def test_aligned_training_walk_quirk():
    """learn_repetitive_patterns.py:124-126 — after the first
    iteration ``last < t + 3h`` always holds on ascending timestamps,
    so aligned_count is at most 1 no matter how perfectly daily the
    sets align; with >= 3 training sets the ``count - 1`` gate can
    never pass."""
    perfect_daily = [1000, 1000 + 86400, 1000 + 2 * 86400,
                     1000 + 3 * 86400]
    assert aligned_training_walk(perfect_daily) == 1
    assert aligned_training_walk(perfect_daily) < len(perfect_daily) - 1
    assert aligned_training_walk([1000, 1000 + 86400]) == 1
    assert aligned_training_walk([1000, 1000 + 7200]) == 0


# ---------------------------------------------------------------------------
# find_repetitive_patterns_flow branch pins (synthetic, tiny)
# ---------------------------------------------------------------------------

WEEK = 604800
DAY = 86400


def _mk_inputs(spark, sums_by_anomaly, *, n_points=30,
               full_duration=604800, triggered=("grubbs",),
               app_parent="mirage"):
    """One metric, anomalies at the given epochs; each anomaly's 7-day
    window is a dense synthetic series whose fp sums are OVERRIDDEN by
    a fake feature_sums_fn so the decision flow is tested in
    isolation from the (already-oracled) feature kernel."""
    anoms = sorted(sums_by_anomaly)
    rows = []
    for a in anoms:
        for k in range(n_points):
            rows.append(("m1", "click.turns.rate", a - k * 3600,
                         float(100 + k)))
    parsed = spark.createDataFrame(
        [(c, m, datetime.fromtimestamp(e, tz=timezone.utc).replace(tzinfo=None), v) for c, m, e, v in rows],
        "conv_id string, metric string, ts timestamp, value double")
    anomalies = spark.createDataFrame(
        [("m1", "click.turns.rate", a, full_duration, list(triggered),
          app_parent if a == anoms[-1] else "ionosphere")
         for a in anoms],
        "conv_id string, metric string, anomaly_e long, "
        "full_duration long, triggered array<string>, app string")
    fps = spark.createDataFrame(
        [], "conv_id string, fp_e long, enabled boolean")

    def fake_sums(df):
        from pyspark.sql import functions as F
        keys = df.select("conv_id").distinct()
        m = {f"m1#{a}": s for a, s in sums_by_anomaly.items()}
        expr = F.lit(None).cast("double")
        for k, s in m.items():
            expr = F.when(F.col("conv_id") == k, F.lit(s)).otherwise(expr)
        return keys.withColumn("features_sum", expr)

    return parsed, anomalies, fps, fake_sums


def _flow(spark, sums_by_anomaly, **kw):
    parsed, anomalies, fps, fake = _mk_inputs(
        spark, sums_by_anomaly,
        **{k: kw.pop(k) for k in ("full_duration", "triggered",
                                  "app_parent", "n_points")
           if k in kw})
    out = find_repetitive_patterns_flow(
        parsed, anomalies, fps, fake,
        min_use_len=5, sparse_len=5, edge_tolerance=7200, **kw)
    return {r["anomaly_e"]: r.asDict() for r in out.collect()}


def test_flow_train_and_generation_chain(spark):
    """Three mutually-similar anomalies 8 days apart: every one
    selected, none deduped, generations 2-3-4."""
    a = 1_700_000_000
    sums = {a: 100.0, a + 8 * DAY: 101.0, a + 16 * DAY: 100.5}
    res = _flow(spark, sums)
    assert all(r["stage"] == "compared" for r in res.values())
    assert all(r["train"] for r in res.values())
    assert not any(r["train_on_avg"] for r in res.values())
    gens = [res[k]["generation"] for k in sorted(res)]
    assert gens == [2, 3, 4]


def test_flow_dedup_removes_predecessor(spark):
    """A selected timestamp whose successor is closer than 169 h is
    removed (the 20250618 one-per-week dedup); the chain survives when
    >= 2 remain."""
    a = 1_700_000_000
    # 8 d and then 7.0 d (< 169 h) — the MIDDLE one is the predecessor
    # of a too-close successor
    sums = {a: 100.0, a + 8 * DAY: 100.2,
            a + 8 * DAY + 169 * 3600 - 60: 100.1}
    res = _flow(spark, sums)
    mids = sorted(res)
    assert res[mids[1]]["deduped"] is True
    assert res[mids[1]]["generation"] is None
    assert [res[mids[0]]["generation"], res[mids[2]]["generation"]] \
        == [2, 3]
    assert all(r["train"] for r in res.values())


def test_flow_dedup_below_two_cancels_training(spark):
    """If dedup leaves fewer than 2 timestamps, found_training is
    cancelled (find_repetitive_patterns.py:577-579)."""
    a = 1_700_000_000
    # three similar anomalies: gaps of 606000 s — at least a week (so
    # the week-skip excludes nothing) but inside the 169 h (608400 s)
    # dedup window, so BOTH predecessors are removed -> only the last
    # survives
    g = 606000
    sums = {a: 100.0, a + g: 100.2, a + 2 * g: 100.1}
    res = _flow(spark, sums)
    assert all(r["selected"] for r in res.values())
    assert all(r["train"] is False for r in res.values())
    assert all(r["generation"] is None for r in res.values())


def test_flow_week_skip_and_no_selection(spark):
    """Anomalies inside the same week are never compared; a metric
    whose every pair is skipped keeps the reference's
    empty-percentages default avg 100."""
    a = 1_700_000_000
    sums = {a: 100.0, a + 3 * DAY: 100.0, a + 6 * DAY: 100.0}
    res = _flow(spark, sums)
    assert all(r["similar_count"] == 0 for r in res.values())
    assert all(r["avg_percent_different"] == 100.0
               for r in res.values())
    assert all(r["train"] is False for r in res.values())


def test_flow_zero_base_aborts_metric(spark):
    """A zero base fp sum makes get_percent_different return None and
    the reference's ``float(None)`` TypeError aborts the whole
    metric -> comparison_error, no decisions."""
    a = 1_700_000_000
    sums = {a: 0.0, a + 8 * DAY: 100.0, a + 16 * DAY: 100.5}
    res = _flow(spark, sums)
    assert all(r["stage"] == "comparison_error" for r in res.values())
    assert all(r["train"] is None for r in res.values())


def test_flow_trained_period_strict_bounds(spark):
    """The trained-period removal is the OPEN interval
    (fp - 86400, fp + 14400) — an anomaly exactly at either bound
    survives (strict > and <, find_repetitive_patterns.py:242-247)."""
    a = 1_700_000_000
    sums = {a: 100.0, a + 8 * DAY: 101.0, a + 16 * DAY: 100.5,
            a + 24 * DAY: 100.2}
    parsed, anomalies, fps_empty, fake = _mk_inputs(spark, sums)
    fp_rows = [("m1", a + 8 * DAY, True),           # removes 2nd
               # both bounds are OPEN: an anomaly exactly at
               # fp - 86400 or fp + 14400 survives
               ("m1", a + 16 * DAY + 86400, True),
               ("m1", a - 14400, True),
               ("m1", a + 24 * DAY, False)]          # disabled: inert
    fps = spark.createDataFrame(
        fp_rows, "conv_id string, fp_e long, enabled boolean")
    out = find_repetitive_patterns_flow(
        parsed, anomalies, fps, fake,
        min_use_len=5, sparse_len=5, edge_tolerance=7200)
    res = {r["anomaly_e"]: r.asDict() for r in out.collect()}
    assert res[a + 8 * DAY]["stage"] == "trained_period"
    assert res[a]["stage"] == "compared"
    assert res[a + 16 * DAY]["stage"] == "compared"
    assert res[a + 24 * DAY]["stage"] == "compared"


def test_flow_downsample_matches_pandas_backward_resample(spark):
    """A dense (30 s cadence) window is backward-resampled to 600 s —
    the native bucket formula equals pandas resample(origin='end',
    closed='right', label='right') mean (downsample_timeseries,
    functions/timeseries/downsample.py:20-56)."""
    a = 1_700_000_000
    n = 1200  # 10 h at 30 s
    rows = [("m1", "click.turns.rate", a - k * 30, float(k % 97))
            for k in range(n)]
    parsed = spark.createDataFrame(
        [(c, m, datetime.fromtimestamp(e, tz=timezone.utc).replace(tzinfo=None), v) for c, m, e, v in rows],
        "conv_id string, metric string, ts timestamp, value double")
    anomalies = spark.createDataFrame(
        [("m1", "click.turns.rate", a, 604800, ["grubbs"], "mirage"),
         ("m1", "click.turns.rate", a - 9 * 3600, 604800, ["grubbs"],
          "ionosphere"),
         ("m1", "click.turns.rate", a - 5 * 3600, 604800, ["grubbs"],
          "ionosphere")],
        "conv_id string, metric string, anomaly_e long, "
        "full_duration long, triggered array<string>, app string")
    fps = spark.createDataFrame(
        [], "conv_id string, fp_e long, enabled boolean")
    captured = {}

    def capture(df):
        from pyspark.sql import functions as F
        pdf = df.toPandas()
        pdf["e"] = pdf["ts"].astype("int64") // 10 ** 9
        for cid, g in pdf.groupby("conv_id"):
            captured[cid] = g.sort_values("e")[["e", "value"]]
        keys = df.select("conv_id").distinct()
        return keys.withColumn("features_sum", F.lit(1.0))

    find_repetitive_patterns_flow(
        parsed, anomalies, fps, capture,
        min_use_len=5, sparse_len=5, edge_tolerance=7200).collect()
    key = f"m1#{a}"
    assert key in captured
    got = captured[key]
    # pandas twin over the same raw window
    raw = pd.DataFrame(
        [(e, v) for c, m, e, v in rows
         if a - 604800 < e <= a],
        columns=["e", "value"])
    raw["dt"] = pd.to_datetime(raw["e"], unit="s")
    twin = (raw.set_index("dt")["value"]
            .resample("600s", origin="end", closed="right",
                      label="right")
            .mean().dropna())
    twin_e = (twin.index.astype("int64") // 10 ** 9).tolist()
    assert got["e"].tolist() == twin_e
    np.testing.assert_allclose(got["value"].to_numpy(),
                               twin.to_numpy(), rtol=0, atol=0)
