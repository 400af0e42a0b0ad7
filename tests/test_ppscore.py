"""ppscore-lite parity — functions/ppscore.py vs a brute-force
recursive 1-D CART and hand-computed published-formula cases.
Reference flow: skyline/luminosity/cloudbursts.py:227-320."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from skyline_spark.functions.ppscore import (
    cart_1d_predict,
    kfold_blocks,
    ppscore_1d,
)


def _brute_cart_predict(x_train, y_train, x_test):
    """Literal recursive best-split CART regressor (squared-error
    criterion, fully grown, thresholds at midpoints of adjacent unique
    node values) — the sklearn-default tree the closed form claims to
    equal. No code shared with the kernel."""
    def sse(y):
        return float(np.sum((y - y.mean()) ** 2)) if y.size else 0.0

    def fit(x, y):
        ux = np.unique(x)
        if ux.size == 1 or np.unique(y).size == 1:
            return float(np.mean(y))
        best = None
        for a, b in zip(ux[:-1], ux[1:]):
            t = (a + b) / 2.0
            lm = x <= t
            cost = sse(y[lm]) + sse(y[~lm])
            if best is None or cost < best[0]:
                best = (cost, t)
        t = best[1]
        lm = x <= t
        return (t, fit(x[lm], y[lm]), fit(x[~lm], y[~lm]))

    def predict(node, v):
        while isinstance(node, tuple):
            t, left, right = node
            node = left if v <= t else right
        return node

    tree = fit(np.asarray(x_train, float), np.asarray(y_train, float))
    return np.array([predict(tree, v) for v in x_test])


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_cart_closed_form_equals_recursive_tree(data):
    n = data.draw(st.integers(min_value=2, max_value=25))
    xs = data.draw(st.lists(st.integers(min_value=-5, max_value=5),
                            min_size=n, max_size=n))
    ys = data.draw(st.lists(st.integers(min_value=-9, max_value=9),
                            min_size=n, max_size=n))
    xt = data.draw(st.lists(
        st.floats(min_value=-6, max_value=6,
                  allow_nan=False).map(lambda v: round(v, 1)),
        min_size=1, max_size=10))
    x = np.array(xs, float)
    y = np.array(ys, float)
    t = np.array(xt, float)
    got = cart_1d_predict(x, y, t)
    want = _brute_cart_predict(x, y, t)
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_cart_midpoint_tie_goes_left():
    # train x {0, 2}: boundary at 1.0; a test point exactly on it takes
    # the LEFT leaf (sklearn's `<= threshold`)
    pred = cart_1d_predict(np.array([0.0, 2.0]), np.array([10.0, 30.0]),
                           np.array([1.0, 0.99, 1.01]))
    assert list(pred) == [10.0, 10.0, 30.0]


def test_kfold_blocks_match_sklearn_shapes():
    # n=10, k=4 -> sklearn KFold sizes [3, 3, 2, 2], contiguous
    blocks = kfold_blocks(10, 4)
    assert [len(b) for b in blocks] == [3, 3, 2, 2]
    assert list(np.concatenate(blocks)) == list(range(10))


def test_ppscore_perfect_predictor_hand_computed():
    """y is a deterministic function of x -> every CV fold predicts
    exactly (all fold x values repeat in train), model MAE 0,
    ppscore 1."""
    x = np.array([1, 2, 3, 4] * 4, float)
    y = x * 10
    s, case = ppscore_1d(x, y)
    assert case == "ok" and s == 1.0


def test_ppscore_useless_predictor_is_zero():
    """x constant -> the model predicts the train mean everywhere;
    its MAE exceeds (or equals) the median baseline -> 0."""
    rng = np.random.RandomState(0)
    x = np.zeros(40)
    y = rng.normal(0, 1, 40)
    s, case = ppscore_1d(x, y)
    assert case == "ok" and s == 0.0


def test_ppscore_published_formula_planted():
    """Hand-run of the published formula on a small frame: folds are
    the chronological blocks, model MAE the unweighted fold mean,
    baseline the median MAE on the full frame."""
    # interleaved so every fold's x values recur in its train split;
    # the +/-1 jitter keeps the model imperfect -> a mid-range score
    x = np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4], float)
    y = np.array([10, 20, 30, 40, 11, 21, 31, 41, 9, 19, 29, 39], float)
    folds = kfold_blocks(12, 4)
    maes = []
    for te in folds:
        mask = np.ones(12, bool)
        mask[te] = False
        pred = cart_1d_predict(x[mask], y[mask], x[te])
        maes.append(np.mean(np.abs(y[te] - pred)))
    model = np.mean(maes)
    naive = np.mean(np.abs(y - np.median(y)))
    want = 0.0 if model > naive else 1 - model / naive
    got, case = ppscore_1d(x, y)
    assert case == "ok"
    assert got == pytest.approx(want, abs=0, rel=0)
    assert 0 < got < 1


def test_ppscore_invalid_cases():
    s, case = ppscore_1d(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    assert (s, case) == (0.0, "n_too_small")
    s, case = ppscore_1d(np.arange(8.0), np.full(8, 5.0))
    assert (s, case) == (0.0, "target_is_constant")


def test_cloudburst_related_operator(spark):
    """Planted relationship: cand 'f' is a deterministic function of
    source 's' -> related with pps ~1 in at least one direction;
    independent noise is not related."""
    import pandas as pd

    from skyline_spark.operators.cloudburst import (
        cloudburst_related_metrics,
    )
    rng = np.random.RandomState(4)
    n = 72
    base = 1_700_000_000
    s = np.tile(np.array([5.0, 8.0, 13.0, 21.0]), n // 4)
    f = s * 3 + 1
    z = rng.normal(100, 10, n)
    rows = []
    for name, vals in (("s", s), ("f", f), ("z", z)):
        for i, v in enumerate(vals):
            rows.append((name, i, pd.Timestamp(base + i * 3600, unit="s"),
                         float(v)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "value"]))
    sources = spark.createDataFrame([("s",)], "conv_id string")
    out = cloudburst_related_metrics(
        df, base + (n - 1) * 3600.0, sources,
        window_seconds=n * 3600 + 10).toPandas().set_index("cand_conv")
    assert out.loc["f"].related
    assert out.loc["f"].pps_source_to_cand == 1.0
    assert not out.loc["z"].related
    assert out.loc["f"].ppscores_sum > out.loc["z"].ppscores_sum


def test_ppscore_single_unique_x():
    """All train x identical: the tree is one leaf (global mean);
    still well-defined for every test point."""
    pred = cart_1d_predict(np.full(6, 3.0), np.arange(6.0),
                           np.array([-1.0, 3.0, 99.0]))
    assert np.allclose(pred, 2.5)
    s, case = ppscore_1d(np.full(12, 3.0), np.arange(12.0))
    assert case == "ok" and s == 0.0


def test_cart_degenerate_midpoint_rounding_matches_sql_rule():
    """Degenerate-float probe: train x {0.1, 0.2} — the IEEE midpoint
    fl((0.1+0.2)/2) = 0.15000000000000002 rounds ABOVE the true
    midpoint of the stored doubles, so a test point equal to it is
    nearer to 0.2 (nearest-x would route RIGHT) but sits on the
    boundary (midpoint-threshold routes LEFT, side='left'). Pins the
    kernel AND the DuckDB twin's routing rule (the prtmb/prpred shape
    in SQL_CLOUDBURST_RELATED: bnd = (x + lead(x))/2, first mean with
    test_x <= bnd) to the SAME midpoint-threshold formulation — the
    cross-engine straddle this removes."""
    import duckdb

    x = np.array([0.1, 0.2])
    y = np.array([10.0, 30.0])
    bnd = (0.1 + 0.2) / 2.0
    assert repr(bnd) == "0.15000000000000002"  # not the true midpoint
    pred = cart_1d_predict(x, y, np.array([bnd]))
    assert list(pred) == [10.0]  # midpoint rule: LEFT (nearest-x: 30)
    got = duckdb.sql("""
        WITH tm AS (SELECT * FROM (VALUES (0.1::DOUBLE, 10.0::DOUBLE),
                                          (0.2::DOUBLE, 30.0::DOUBLE))
                    t(x, my)),
        tmb AS (SELECT *, (x + lead(x) OVER (ORDER BY x)) / 2.0 AS bnd
                FROM tm),
        te AS (SELECT 0.15000000000000002::DOUBLE AS x)
        SELECT tm.my FROM te JOIN tmb tm
          ON (te.x <= tm.bnd OR tm.bnd IS NULL)
        QUALIFY row_number() OVER (ORDER BY tm.x ASC) = 1
    """).fetchall()
    assert [float(r[0]) for r in got] == [10.0]
