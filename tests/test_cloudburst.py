"""Cloudburst detection pins: the m66 anomaly-index mapping vs a
literal reference-loop twin, the last-30 resolution tie quirk,
Graphite-summarize semantics, the run-extraction quirks, and the
end-to-end kernel on a planted cloudburst."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from skyline_spark.operators.cloudburst import (
    extract_cloudburst_runs,
    find_cloudbursts_kernel,
    m66_anomaly_indices,
    metric_resolution_last30,
    summarize_median,
)


def _m66_literal(values, window, nth_median=6, n_sigma=6.0,
                 minmax=True, ddof=0):
    """The reference m66 per-point loop (m66.py:720-832), INCLUDING
    the min-max scaling and a selectable std ddof — used to pin that
    the repo's unscaled ddof=1 form yields the identical flag set."""
    x = np.asarray(values, dtype=np.float64)
    if minmax:
        if x.max() == x.min():
            x = np.zeros_like(x)
        else:
            x = (x - x.min()) / (x.max() - x.min())
    data = pd.Series(x)
    for _ in range(nth_median):
        data = data.rolling(window).median()
    std_nth = data.rolling(window).std(ddof=ddof).fillna(0).tolist()
    metric_stddev = np.std(std_nth)
    flags = [1 if v > metric_stddev * n_sigma else 0 for v in std_nth]
    anomalies = []
    current = []
    for i, f in enumerate(flags):
        if f == 1:
            current.append(i)
        else:
            if len(current) > int(window / 2):
                anomalies.extend(current)
            current = []
    if len(current) > int(window / 2):
        anomalies.extend(current)
    return anomalies


@pytest.mark.parametrize("window", [3, 4, 5])
@pytest.mark.parametrize("minmax,ddof", [(True, 0), (True, 1),
                                         (False, 1)])
def test_m66_indices_invariant_to_scaling_and_ddof(window, minmax,
                                                   ddof):
    """The std_nth > np.std(std_nth)*sigma comparison is invariant
    under uniform linear scaling (minmax) and the uniform
    sqrt(w/(w-1)) ddof factor — the repo's form equals the reference's
    bottleneck AND pandas backends."""
    rng = np.random.RandomState(42)
    v = np.round(rng.normal(100, 3, 400), 2)
    v[300:340] += np.linspace(0, 400, 40)  # a cloudburst ramp
    got = m66_anomaly_indices(v, window).tolist()
    want = _m66_literal(v, window, minmax=minmax, ddof=ddof)
    assert got == want
    assert got, "the planted ramp must trigger m66"


def test_metric_resolution_tie_prefers_first_seen():
    """Counter.most_common tie -> first-seen delta (NOT the smallest:
    the determine_data_frequency rule does not apply here)."""
    e = np.array([0, 120, 180, 300, 360])  # deltas 120,60,120,60
    assert metric_resolution_last30(e) == 120
    e2 = np.array([0, 60, 180, 240, 360])  # deltas 60,120,60,120
    assert metric_resolution_last30(e2) == 60
    assert metric_resolution_last30(np.array([5])) is None


def test_summarize_median_epoch_aligned_start_labels():
    e = np.array([10, 900, 950, 1810])
    v = np.array([1.0, 2.0, 4.0, 9.0])
    t, m = summarize_median(e, v, 900)
    assert t.tolist() == [0, 900, 1800]
    assert m.tolist() == [1.0, 3.0, 9.0]


def test_extract_cloudburst_runs_quirks():
    # two contiguous runs at 900 s
    runs = extract_cloudburst_runs([900, 1800, 2700, 9000, 9900], 900)
    assert runs == [(900, 2700), (9000, 9900)]
    # single anomaly -> widened by one resolution (:1029-1030)
    assert extract_cloudburst_runs([5400], 900) == [(5400, 6300)]
    # a gap exactly == resolution continues the run
    assert extract_cloudburst_runs([0, 900], 900) == [(0, 900)]


def _planted_series(now, res=60, days=8, burst_from_h=5.0,
                    burst_to_h=1.0):
    """A quiet 8-day minute series with a step burst spanning
    [now - burst_from_h, now - burst_to_h]. The 6-fold trailing
    rolling median delays a step by up to nth*(window-1) positions,
    so stage 2 (900 s buckets) only confirms onsets >= ~4.5 h old,
    while stage 1 needs an edge inside the last 4 h — the burst's
    OFFSET supplies that; a detectable cloudburst therefore has its
    onset before the stage-2 smear horizon and an edge in the stage-1
    window, exactly like the reference's."""
    rng = np.random.RandomState(9)
    n = int(days * 86400 / res)
    e = now - res * np.arange(n)[::-1].astype(np.float64)
    v = np.round(rng.normal(50, 1, n), 2)
    burst = (e >= now - burst_from_h * 3600) \
        & (e <= now - burst_to_h * 3600)
    v[burst] += 300.0
    return e, v


def test_find_cloudbursts_kernel_planted_burst():
    now = 1_700_000_000.0
    e, v = _planted_series(now)
    found = find_cloudbursts_kernel(e, v, now)
    assert found, "planted burst not detected"
    # the run sits inside the last 6 h at 900 s resolution
    for f in found:
        assert f["resolution"] == 900
        assert f["end"] > now - 6 * 3600
        assert f["duration"] >= 0


def test_find_cloudbursts_kernel_quiet_series_empty():
    now = 1_700_000_000.0
    rng = np.random.RandomState(3)
    n = int(8 * 86400 / 60)
    e = now - 60 * np.arange(n)[::-1].astype(np.float64)
    v = np.round(rng.normal(50, 1, n), 2)
    assert find_cloudbursts_kernel(e, v, now) == []


def test_find_cloudbursts_kernel_old_burst_not_in_period():
    """A burst whose edges are all older than the 4 h stage-1 window
    is not a candidate."""
    now = 1_700_000_000.0
    e, v = _planted_series(now, burst_from_h=20.0, burst_to_h=12.0)
    assert find_cloudbursts_kernel(e, v, now) == []
