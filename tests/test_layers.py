"""Branch-pinning tests for ionosphere layers (operators/layers.py) vs
the reference run_layer_algorithms (skyline/ionosphere/layers.py:65-713):
the quirk operator map, D discard, D1 breach + the short-series
IndexError discard, E any-of-last-N match, and the approximately_close
tolerance + original-boundary relabel."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

CFG_SCHEMA = ("family string, layer_id int, d_condition string, "
              "d_boundary_limit double, d1_condition string, "
              "d1_boundary_limit double, d1_boundary_times int, "
              "e_condition string, e_boundary_limit double, "
              "e_boundary_times int")

SERIES_SCHEMA = "conv_id string, metric string, ts timestamp, value double"


def _run(spark, points, cfg_row, **kw):
    """points: list of values, oldest->newest, one per minute."""
    from skyline_spark.operators.layers import run_layer_algorithms
    rows = [("c1", "fam.m", f"2024-01-01 00:{i:02d}:00", float(v))
            for i, v in enumerate(points)]
    series = (spark.createDataFrame(
        [(c, m, t, v) for c, m, t, v in rows],
        schema="conv_id string, metric string, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("family", F.lit("fam")))
    layers = spark.createDataFrame([("fam",) + tuple(cfg_row)],
                                   schema=CFG_SCHEMA)
    out = run_layer_algorithms(series, layers, join_on="family", **kw)
    got = out.collect()
    assert len(got) == 1
    return got[0]


# layer rows: (layer_id, d_cond, d_bound, d1_cond, d1_bound, d1_times,
#              e_cond, e_bound, e_times)
NO_D1 = ("none", 0.0, 0)


def test_d_layer_discards_on_last_value_with_ge_quirk(spark):
    # '>' binds to >= (layers.py:361-366): last value EQUAL to the
    # boundary discards (boundary <= 10 so no tolerance interferes)
    r = _run(spark, [1, 2, 10], (1, ">", 10.0) + NO_D1 + ("<", 500.0, 2))
    assert not r.layer_matched
    # with the tolerance, boundary 100 -> 105: an equal-to-boundary
    # last value no longer discards (the reference adjusts it too)
    r = _run(spark, [1, 2, 100], (1, ">", 100.0) + NO_D1 + ("<", 500.0, 2))
    assert r.layer_matched
    # boundary 100 gets a 5% tolerance -> 105; 104 no longer discards
    r = _run(spark, [1, 2, 104], (1, ">", 100.0) + NO_D1 + ("<", 500.0, 2))
    assert r.layer_matched and r.approx_close == 0  # E orig also matched


def test_d_tolerance_off_and_small_boundary(spark):
    # use_approximately_close=False: 104 >= 100 discards again
    r = _run(spark, [1, 2, 104], (1, ">", 100.0) + NO_D1 + ("<", 500.0, 2),
             use_approximately_close=False)
    assert not r.layer_matched
    # boundary <= 10 gets no tolerance even when enabled
    r = _run(spark, [1, 2, 10], (1, ">", 10.0) + NO_D1 + ("<", 500.0, 2))
    assert not r.layer_matched


def test_e_layer_any_of_last_n_and_le_quirk(spark):
    # E '<' binds to <=: a value EQUAL to the boundary inside the last
    # 3 points matches, even when the last value does not
    r = _run(spark, [5.0, 9, 8, 7], (1, ">", 1e9) + NO_D1 + ("<", 5.0, 3))
    assert not r.layer_matched  # the 5.0 sits outside the last 3
    r = _run(spark, [9, 8, 5.0, 7], (1, ">", 1e9) + NO_D1 + ("<", 5.0, 3))
    assert r.layer_matched
    assert r.anomalous_datapoint == 7.0


def test_e_short_series_checks_available_points(spark):
    # e_times > n: the reference loop breaks on the first match before
    # the IndexError, so a match among available points still matches
    r = _run(spark, [3.0], (1, ">", 1e9) + NO_D1 + ("<", 5.0, 10))
    assert r.layer_matched
    r = _run(spark, [30.0], (1, ">", 1e9) + NO_D1 + ("<", 5.0, 10))
    assert not r.layer_matched


def test_d1_breach_and_short_series_discard(spark):
    base = (1, ">", 1e9, "<", 2.0, 3, "<", 500.0, 2)
    # a value <= 2 within the last 3 points discards
    r = _run(spark, [9, 9, 1.5, 9, 9], base)
    assert not r.layer_matched
    # breach outside the last 3 points does not
    r = _run(spark, [1.5, 9, 9, 9, 9], base)
    assert r.layer_matched
    # series shorter than d1_times with no breach: the reference's
    # timeseries[-count] IndexError -> except -> False (layers.py:497-502)
    r = _run(spark, [9, 9], base)
    assert not r.layer_matched
    # inactive D1 ('none') ignores d1 columns entirely
    r = _run(spark, [9, 9], (1, ">", 1e9) + NO_D1 + ("<", 500.0, 2))
    assert r.layer_matched


def test_approx_close_labeling_and_relabel(spark):
    # E boundary 20 ('<' shrinking, 11<=20<30 -> +ceil(2)=22): last
    # value 21 matches only via the tolerance -> approx_close=1
    r = _run(spark, [100, 21], (1, "==", -1.0) + NO_D1 + ("<", 20.0, 1))
    assert r.layer_matched and r.approx_close == 1
    # last value 19 matches the ORIGINAL boundary too -> relabeled 0
    r = _run(spark, [100, 19], (1, "==", -1.0) + NO_D1 + ("<", 20.0, 1))
    assert r.layer_matched and r.approx_close == 0
    # D-side: boundary 100 -> adj 105; last 104 passes D only via the
    # tolerance; E '>' (non-shrinking, no tolerance) matches ->
    # orig_ok is False on both sides -> approx_close=1
    r = _run(spark, [1, 104], (1, ">", 100.0) + NO_D1 + (">", 50.0, 1))
    assert r.layer_matched and r.approx_close == 1
    # same but last 99 passes D even without tolerance -> 0
    r = _run(spark, [1, 99], (1, ">", 100.0) + NO_D1 + (">", 50.0, 1))
    assert r.layer_matched and r.approx_close == 0


def test_equality_and_inequality_conditions(spark):
    r = _run(spark, [5, 7.0], (1, "==", 7.0) + NO_D1 + ("<", 500.0, 1))
    assert not r.layer_matched  # D '==' fires on the last value
    r = _run(spark, [5, 7.0], (1, "!=", 7.0) + NO_D1 + ("<", 500.0, 1))
    assert r.layer_matched  # '!=' does not
    assert r.anomaly_timestamp > 0
