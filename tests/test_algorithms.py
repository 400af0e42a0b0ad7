"""Golden algorithm fixtures — the reference's own unit tests recast.

Source: /root/reference/tests/algorithms_test.py — 86,401-point 1 Hz
series, value 1.0 everywhere except the final value 1000; assertions
:62-133 (tail_avg == 334, seven algorithms True, consensus anomalous with
datapoint 1000).
"""

from __future__ import annotations

import numpy as np
import pytest

from skyline_spark.config import PipelineConfig
from skyline_spark.functions import algorithms as alg
from skyline_spark.functions.consensus import (
    classify_exception,
    preprocess_series,
    run_selected_algorithm,
)

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def golden():
    """tests/algorithms_test.py:42-60: ts = now-86400..now step 1,
    values all 1.0, last value 1000."""
    n = 86401
    ts = np.arange(n, dtype=np.float64)
    values = np.ones(n, dtype=np.float64)
    values[-1] = 1000.0
    return ts, values


def test_tail_avg(golden):
    _, v = golden
    assert int(alg.tail_avg(v)) == 334  # (1000+1+1)/3


def test_tail_avg_short_series():
    assert alg.tail_avg(np.array([5.0])) == 5.0
    assert alg.tail_avg(np.array([1.0, 5.0])) == 5.0


def test_grubbs_tiny_series_is_false_not_error():
    """n<3: the reference's t.isf(df<=0) yields nan and `z > nan` is
    False — NOT a recorded error/None (matters for vortex one-shots
    feeding tiny series; unreachable in-pipeline behind TooShort)."""
    ts = np.array([1.0, 2.0])
    assert alg.grubbs(ts, np.array([1.0, 5.0])) is False
    assert alg.grubbs(ts[:1], np.array([3.0])) is False


def test_grubbs(golden):
    ts, v = golden
    assert alg.grubbs(ts, v) is True


def test_first_hour_average(golden):
    ts, v = golden
    assert alg.first_hour_average(ts, v) is True


def test_stddev_from_average(golden):
    ts, v = golden
    assert alg.stddev_from_average(ts, v) is True


def test_stddev_from_moving_average(golden):
    ts, v = golden
    assert alg.stddev_from_moving_average(ts, v) is True


def test_mean_subtraction_cumulation(golden):
    ts, v = golden
    assert alg.mean_subtraction_cumulation(ts, v) is True


def test_least_squares(golden):
    ts, v = golden
    assert alg.least_squares(ts, v) is True


def test_histogram_bins(golden):
    ts, v = golden
    assert alg.histogram_bins(ts, v) is True


def test_median_absolute_deviation_flat_is_false(golden):
    # MAD of the golden series: median deviation is 0 -> False (guard)
    ts, v = golden
    assert alg.median_absolute_deviation(ts, v) is False


def test_median_absolute_deviation_triggers():
    rng = np.random.RandomState(42)
    v = rng.normal(100, 1, 1000)
    v[-1] = 200.0
    ts = np.arange(1000, dtype=np.float64)
    assert alg.median_absolute_deviation(ts, v) is True


def test_consensus_golden(golden):
    """tests/algorithms_test.py:100-133 — anomalous, >= CONSENSUS Trues,
    datapoint == 1000."""
    ts, v = golden
    verdict = run_selected_algorithm(ts, v, now=float(ts[-1]), cfg=CFG)
    assert verdict.exception is None
    assert verdict.anomalous is True
    assert sum(1 for r in verdict.ensemble if r is True) >= CFG.consensus
    assert verdict.datapoint == 1000.0
    assert len(verdict.ensemble) == 9
    assert verdict.algorithms_run == list(CFG.algorithms)


def test_consensus_normal_series():
    rng = np.random.RandomState(42)
    n = 2000
    ts = np.arange(n, dtype=np.float64)
    v = 100 + np.sin(ts / 600) * 2 + rng.normal(0, 0.5, n)
    verdict = run_selected_algorithm(ts, v, now=float(ts[-1]), cfg=CFG)
    assert verdict.exception is None
    assert verdict.anomalous is False
    # early exit: once 4 Falses accumulate, the tail is None-padded
    if verdict.ensemble.count(False) >= CFG.maximum_false_count:
        idx = [i for i, r in enumerate(verdict.ensemble) if r is False]
        fourth_false = sorted(idx)[CFG.maximum_false_count - 1]
        assert all(r is None for r in verdict.ensemble[fourth_false + 1:])


def test_exceptions():
    cfg = CFG
    now = 10_000.0
    # TooShort (< 100 points)
    ts = np.arange(9_901, 10_000, dtype=np.float64)
    v = np.ones(99)
    assert classify_exception(ts, v, now, cfg) == "TooShort"
    # EmptyTimeseries
    assert classify_exception(np.array([]), np.array([]), now, cfg) == "EmptyTimeseries"
    # Stale: last ts 501 s before now
    ts = np.arange(0, 9_500, dtype=np.float64)
    v = np.random.RandomState(0).normal(size=ts.size)
    assert classify_exception(ts, v, now, cfg) == "Stale"
    # custom stale period overrides (skyline/analyzer/algorithms.py:1206-1217)
    assert classify_exception(ts, v, now, cfg, custom_stale_period=1000) is None
    # Boring: last 100 values all equal
    ts = np.arange(9_000, 10_000, dtype=np.float64)
    v = np.concatenate([np.random.RandomState(0).normal(size=900), np.full(100, 7.0)])
    assert classify_exception(ts, v, now, cfg) == "Boring"
    # healthy
    v = np.random.RandomState(0).normal(size=1000)
    assert classify_exception(ts, v, now, cfg) is None


def test_preprocess_sort_dedup_trim():
    cfg = PipelineConfig(full_duration=100)
    ts = np.array([5.0, 3.0, 3.0, 10.0, 200.0, 150.0])
    v = np.array([50.0, 30.0, 31.0, 100.0, 2000.0, 1500.0])
    out_ts, out_v = preprocess_series(ts, v, now=200.0, cfg=cfg)
    # sorted, first-per-ts kept (value 30 at ts 3), trimmed to ts > 100
    assert list(out_ts) == [150.0, 200.0]
    assert list(out_v) == [1500.0, 2000.0]


def test_preprocess_derivative():
    cfg = PipelineConfig(full_duration=10_000)
    # counter with one reset: 10, 20, 35, 5, 15
    ts = np.arange(5, dtype=np.float64)
    v = np.array([10.0, 20.0, 35.0, 5.0, 15.0])
    out_ts, out_v = preprocess_series(ts, v, now=4.0, cfg=cfg, is_derivative=True)
    # deltas: +10, +15, -30 (dropped), +10
    assert list(out_ts) == [1.0, 2.0, 4.0]
    assert list(out_v) == [10.0, 15.0, 10.0]


def test_ks_test_deterministic():
    # distribution shift in the last 10 minutes over a stationary reference
    rng = np.random.RandomState(7)
    n = 3600
    ts = np.arange(n, dtype=np.float64)
    v = rng.normal(10, 1, n)
    v[-600:] = rng.normal(50, 1, 600)  # shifted probe window
    assert alg.ks_test(ts, v) is True
    # no shift -> False
    v2 = rng.normal(10, 1, n)
    assert alg.ks_test(ts, v2) is False
    # constant reference guard -> False
    v3 = np.ones(n)
    v3[-600:] = rng.normal(50, 1, 600)
    assert alg.ks_test(ts, v3) is False


def test_ks_test_d_gate_and_literal_equivalence():
    """ks_test_d_gate — the ADF-free KS core the consensus_vote_sql9k
    oracle pins: the True path on a distribution shift, guard paths,
    and the equivalence of `p < 0.05` with the SQL twin's literal form
    `(en + 0.12 + 0.11/en) * d > kolmogorov_isf(0.05)` across a dense
    sweep of (d, n1, n2)."""
    import math

    from skyline_spark.functions.stats import _kolmogorov_sf, kolmogorov_isf

    rng = np.random.RandomState(7)
    n = 3600
    fd = n  # windows: reference [last-3600, last-1200), probe 1200
    ts = np.arange(n, dtype=np.float64)
    v = rng.normal(10, 1, n)
    v[-1200:] = rng.normal(50, 1, 1200)
    assert alg.ks_test_d_gate(ts, v, full_duration=fd) is True
    # no shift -> False; constant reference -> guard False
    assert alg.ks_test_d_gate(ts, rng.normal(10, 1, n),
                              full_duration=fd) is False
    v3 = np.ones(n)
    v3[-1200:] = rng.normal(50, 1, 1200)
    assert alg.ks_test_d_gate(ts, v3, full_duration=fd) is False
    # tiny windows -> size guard False
    assert alg.ks_test_d_gate(ts[:30], v[:30], full_duration=30) is False

    # literal-form equivalence: sf strictly decreasing, so p < 0.05
    # iff scaled > K — checked over a dense grid incl. values straddling
    # the critical region
    K = kolmogorov_isf(0.05)
    assert abs(_kolmogorov_sf(K) - 0.05) < 1e-12
    for n1 in (20, 21, 100, 337, 504):
        for n2 in (20, 33, 144, 504):
            en = math.sqrt(n1 * n2 / (n1 + n2))
            scale = en + 0.12 + 0.11 / en
            for d in np.linspace(0.01, 0.99, 197):
                p = _kolmogorov_sf(scale * d)
                assert (p < 0.05) == (scale * d > K), (n1, n2, d, p)


def test_negatives_present():
    ts = np.arange(5, dtype=np.float64)
    assert alg.negatives_present(ts, np.array([1.0, -2.0, 3.0, 1.0, 1.0])) is True
    assert alg.negatives_present(ts, np.ones(5)) is False


def test_determine_data_frequency_quirks(spark):
    import pandas as pd

    from pyspark.sql import functions as F
    from skyline_spark.operators.preprocess import determine_data_frequency

    def series(conv, deltas, start=1_700_000_000):
        ts, t = [], start
        for d in [0] + list(deltas):
            t += d
            ts.append(t)
        return pd.DataFrame({"conv_id": conv, "metric": "m",
                             "ts": pd.to_datetime(ts, unit="s"),
                             "value": 1.0})

    frames = [
        # A: clean 300 s cadence -> 300 (not snapped: > 68)
        series("A", [300] * 20),
        # B: mixed {300: 25, 900: 5} -> max count 300
        series("B", [300] * 25 + [900] * 5),
        # C: equal counts {120: 5, 240: 5} -> min resolution 120
        series("C", [120, 240] * 5),
        # D: 45 s cadence -> not a scrape interval, in [1,68] -> 60
        series("D", [45] * 10),
        # E: 30 s cadence -> standard scrape interval, kept
        series("E", [30] * 10),
        # F: long series (n=120 >= 95): only the LAST 101 points
        # sampled — the early 600 s deltas fall outside the window
        series("F", [600] * 19 + [60] * 100),
    ]
    df = spark.createDataFrame(pd.concat(frames))
    got = {r.conv_id: r.metric_resolution
           for r in determine_data_frequency(df).collect()}
    assert got == {"A": 300, "B": 300, "C": 120, "D": 60, "E": 30,
                   "F": 60}
