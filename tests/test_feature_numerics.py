"""Property pins for the seventh-tranche feature numerics: every
blocked / vectorized / FFT-pathed implementation equals its naive
literal twin on arbitrary series (the golden CSVs pin two fixed
points; these pin the whole input space)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from skyline_spark.operators.features_profile import (
    _apen_phi,
    _autocorr_k,
    _sample_entropy,
    _seventh_tranche,
    _trev,
    compute_features,
)

series = st.lists(
    st.floats(min_value=-1e4, max_value=1e4,
              allow_nan=False, allow_infinity=False)
    .map(lambda x: round(x, 2)),
    min_size=5, max_size=70).map(lambda xs: np.asarray(xs, np.float64))


@given(series)
@settings(max_examples=60, deadline=None)
def test_sample_entropy_equals_reference_loop(v):
    """The pair-count form equals the original tsfresh running-match
    loop (the implementation the reference's golden CSVs were made
    with) on arbitrary input."""
    n = v.size
    assume(float(v.std()) > 0)
    tol = 0.2 * float(v.std())
    prev = np.zeros(n)
    curr = np.zeros(n)
    a = 0.0
    for i in range(n - 1):
        nj = n - i - 1
        ts1 = v[i]
        for jj in range(nj):
            j = jj + i + 1
            if abs(v[j] - ts1) < tol:
                curr[jj] = prev[jj] + 1
                if int(min(1, curr[jj])) > 0:
                    a += 1
            else:
                curr[jj] = 0
        prev[:nj] = curr[:nj]
    expected = 0.0 if a == 0 else -np.log(a / (n * (n - 1) / 2))
    got = _sample_entropy(v, n)
    assert got == pytest.approx(expected, rel=1e-12, abs=1e-12)


@given(series, st.sampled_from([0.1, 0.3, 0.5, 0.7, 0.9]))
@settings(max_examples=40, deadline=None)
def test_apen_blocked_equals_naive(v, rr):
    """Row-blocked phi equals the full-matrix tsfresh formula."""
    n = v.size
    r = rr * float(v.std())
    for m in (2, 3):
        if n <= m + 1:
            continue
        xr = np.array([v[i:i + m] for i in range(n - m + 1)])
        c = np.sum(
            np.max(np.abs(xr[:, None] - xr[None, :]), axis=2) <= r,
            axis=0) / (n - m + 1)
        naive = float(np.sum(np.log(c)) / (n - m + 1))
        assert _apen_phi(v, n, m, r) == pytest.approx(
            naive, rel=1e-12, abs=1e-12)


@given(series, st.integers(min_value=1, max_value=9))
@settings(max_examples=60, deadline=None)
def test_autocorr_equals_corrcoef(v, k):
    """The closed-form slice correlation equals np.corrcoef (the
    pandas Series.autocorr semantics the golden CSVs pin)."""
    n = v.size
    std = float(v.std())
    got = _autocorr_k(v - v.mean(), n, std, k)
    if n <= k + 1 or std <= 0:
        assert got == 0.0
        return
    a, b = v[:-k], v[k:]
    if float(a.max()) == float(a.min()) or float(b.max()) == float(b.min()):
        assert got == 0.0
        return
    expected = float(np.corrcoef(a, b)[0, 1])
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


@given(series, st.sampled_from([1, 2, 3]))
@settings(max_examples=60, deadline=None)
def test_trev_literal_loop(v, lag):
    """_trev equals the original tsfresh 0.1.2 per-index loop."""
    n = v.size
    got = _trev(v, n, lag)
    if n <= 2 * lag:
        assert got == 0.0
        return
    terms = [v[i + 2 * lag] ** 2 * v[i] - v[i + lag] * v[i] ** 2
             for i in range(n - 2 * lag)]
    # the terms can catastrophically cancel to ~0 (e.g. +6.6e5, 0,
    # -6.6e5) while the vectorized sum's different order leaves a
    # ~1e-11 residue — a pure relative tolerance around 0 is
    # unsatisfiable, so scale an absolute term to the summand
    # magnitude (r04 verdict item 3)
    tol = 1e-9 * max(1.0, float(np.max(np.abs(terms))) if terms else 0.0)
    assert got == pytest.approx(float(np.mean(terms)),
                                rel=1e-12, abs=tol)


def test_mean_autocorrelation_fft_path_consistent():
    """Above the 4096-point threshold the kernel switches to the FFT
    autocovariance; it must agree with the direct estimator."""
    rng = np.random.RandomState(7)
    v = np.round(rng.normal(100.0, 5.0, 5000), 2)
    n = v.size
    out = _seventh_tranche(v, n, float(v.mean()), float(v.std()),
                           v - v.mean())
    cen = v - v.mean()
    var = float(v.var())
    r = np.correlate(cen, cen, mode="full")[n:]
    direct = float(np.mean(r / (var * np.arange(1, n))))
    assert out["mean_autocorrelation"] == pytest.approx(
        direct, rel=1e-9, abs=1e-9)


def test_seventh_tranche_scale_guard_memory():
    """The O(n^2) members stay memory-blocked at a 4k-turn series —
    the whole tranche completes on production-sized input."""
    rng = np.random.RandomState(11)
    v = np.round(rng.normal(100.0, 5.0, 4000), 2)
    feats = compute_features(np.arange(v.size) * 60.0, v)
    assert all(np.isfinite(x) for x in feats.values())
