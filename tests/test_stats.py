"""Numerics tests for the scipy/statsmodels replacements, against
published table values."""

from __future__ import annotations

import numpy as np
import pytest

from skyline_spark.functions import stats


@pytest.mark.parametrize("q,df,expected", [
    (0.025, 10, 2.2281),
    (0.05, 5, 2.0150),
    (0.005, 30, 2.7500),
    (0.05, 1, 6.3138),
    (0.001, 120, 3.1595),
])
def test_t_isf_table_values(q, df, expected):
    assert stats.t_isf(q, df) == pytest.approx(expected, abs=2e-4)


def test_t_isf_large_df_approaches_normal():
    # t -> N(0,1): isf(0.025) -> 1.95996
    assert stats.t_isf(0.025, 1_000_000) == pytest.approx(1.95996, abs=1e-3)


def test_betainc_symmetry():
    for a, b, x in [(2.0, 3.0, 0.4), (0.5, 0.5, 0.7), (10, 2, 0.9)]:
        assert stats.betainc(a, b, x) == pytest.approx(
            1.0 - stats.betainc(b, a, 1.0 - x), abs=1e-12)


def test_ks_2samp():
    rng = np.random.RandomState(0)
    a = rng.normal(0, 1, 1000)
    b = rng.normal(0, 1, 800)
    d, p = stats.ks_2samp(a, b)
    assert d < 0.1 and p > 0.05
    d2, p2 = stats.ks_2samp(a, b + 5.0)
    assert d2 > 0.9 and p2 < 1e-10


def test_adfuller():
    rng = np.random.RandomState(0)
    assert stats.adfuller_pvalue(rng.normal(0, 1, 500), 10) < 0.01
    assert stats.adfuller_pvalue(np.cumsum(rng.normal(0, 1, 500)), 10) > 0.05


def test_mackinnon_bounds():
    assert stats.mackinnon_pvalue(-30.0) == 0.0
    assert stats.mackinnon_pvalue(5.0) == 1.0
    # MacKinnon 1% / 5% critical values for regression='c' are about
    # -3.43 / -2.86 asymptotically
    assert stats.mackinnon_pvalue(-3.43) == pytest.approx(0.01, abs=0.004)
    assert stats.mackinnon_pvalue(-2.86) == pytest.approx(0.05, abs=0.01)
