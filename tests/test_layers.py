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


def _reference_layers(vals, cfg, use_approx=True):
    """Independent Python twin of run_layer_algorithms
    (skyline/ionosphere/layers.py:361-562), written from the reference
    loop rather than the Spark expressions."""
    import math
    import operator as op
    ops = {"<": op.le, ">": op.ge, "==": op.eq, "!=": op.ne,
           "<=": op.le, ">=": op.ge}
    (d_cond, d_lim, d1_cond, d1_lim, d1_n, e_cond, e_lim, e_n) = cfg
    d_adj, e_adj = d_lim, e_lim
    d_app = e_app = False
    if use_approx:
        if d_cond in (">", ">=") and d_lim >= 11:
            pct = 10 if d_lim < 30 else 5
            d_adj = d_lim + int(math.ceil(d_lim / 100.0 * pct))
            d_app = True
        if e_cond in ("<", "<=") and e_lim >= 11:
            pct = 10 if e_lim < 30 else 5
            e_adj = e_lim + int(math.ceil(e_lim / 100.0 * pct))
            e_app = True
    last = vals[-1]
    if ops[d_cond](last, d_adj):
        return False, 0
    if d1_cond != "none":
        for c in range(1, d1_n + 1):
            try:
                v = vals[-c]
            except IndexError:
                return False, 0  # the reference's bare-except discard
            if c > len(vals):
                return False, 0
            if ops[d1_cond](v, d1_lim):
                return False, 0
        if d1_n > len(vals):
            return False, 0
    e_matched = False
    for c in range(1, e_n + 1):
        if c > len(vals):
            break  # IndexError -> except -> return False below
        if ops[e_cond](vals[-c], e_adj):
            e_matched = True
            break
    if not e_matched:
        return False, 0
    approx = 0
    if d_app or e_app:
        orig_ok = False
        if d_app and not ops[d_cond](last, d_lim):
            orig_ok = True
        if e_app and any(ops[e_cond](vals[-c], e_lim)
                         for c in range(1, min(e_n, len(vals)) + 1)):
            orig_ok = True
        approx = 0 if orig_ok else 1
    return True, approx


def test_layers_randomized_vs_python_twin(spark):
    """40 random (series, config) cases in ONE Spark call vs the
    independent Python twin of the reference loop."""
    import random

    from skyline_spark.operators.layers import run_layer_algorithms
    rng = random.Random(99)
    conds = ["<", ">", "==", "!=", "<=", ">="]
    rows, cfg_rows, want = [], [], {}
    for i in range(40):
        fam = f"f{i}"
        n = rng.randint(1, 12)
        vals = [round(rng.uniform(-5, 60), 2) for _ in range(n)]
        cfg = (rng.choice(conds), round(rng.uniform(-5, 60), 1),
               rng.choice(["none", "<", ">"]),
               round(rng.uniform(-5, 60), 1), rng.randint(1, 6),
               rng.choice(conds), round(rng.uniform(-5, 60), 1),
               rng.randint(1, 6))
        cfg_rows.append((fam, i) + cfg)
        for j, v in enumerate(vals):
            rows.append((f"c{i}", f"{fam}.m", fam,
                         f"2024-01-01 00:{j:02d}:00", float(v)))
        want[f"c{i}"] = _reference_layers(vals, cfg)
    series = (spark.createDataFrame(
        rows, schema="conv_id string, metric string, family string, "
                     "ts string, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    layers = spark.createDataFrame(cfg_rows, schema=CFG_SCHEMA)
    out = run_layer_algorithms(series, layers, join_on="family")
    got = {r.conv_id: (r.layer_matched, r.approx_close)
           for r in out.collect()}
    assert got == want
