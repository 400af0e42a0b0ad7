"""Tests: custom-algorithm registry (§2.10), skew utilities, luminosity
lagged cross-correlation (X1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from skyline_spark.config import PipelineConfig
from skyline_spark.functions.consensus import run_selected_algorithm
from skyline_spark.functions.custom_algorithms import (
    SHIPPED,
    CustomAlgorithm,
    iqr_outlier,
    level_shift,
    sigma,
)


@pytest.fixture(scope="module")
def noisy():
    rng = np.random.RandomState(0)
    n = 2000
    ts = np.arange(n, dtype=np.float64)
    v = 100 + rng.normal(0, 1, n)
    return ts, v


def test_shipped_custom_algorithms(noisy):
    ts, v = noisy
    v2 = v.copy()
    v2[-1] = 200.0
    assert sigma(ts, v2, {"sigma_value": 3})[0] is True
    assert sigma(ts, v, {"sigma_value": 3})[0] is False
    assert iqr_outlier(ts, v2, {})[0] is True
    v3 = v.copy()
    v3[-10:] += 50  # level shift in the last window
    assert level_shift(ts, v3, {"window": 10})[0] is True
    assert level_shift(ts, v, {"window": 10})[0] is False


def test_ported_custom_algorithms(noisy):
    """Round-3 tranche of reference custom algorithms
    (skyline/custom_algorithms/): abs_stddev_from_median,
    single_value_anomaly, m66, macd, spectral_entropy,
    significant_change_window_percent_sustained."""
    from skyline_spark.functions.custom_algorithms import (
        abs_stddev_from_median,
        m66,
        macd,
        significant_change_window_percent_sustained as scwps,
        single_value_anomaly,
        spectral_entropy,
    )
    ts, v = noisy

    spiked = v.copy()
    spiked[-1] = 200.0
    assert abs_stddev_from_median(ts, spiked, {}) == (True, 1.0)
    assert abs_stddev_from_median(ts, v, {}) == (False, 0.0)

    const = np.full(50, 7.0)
    broke = const.copy()
    broke[-1] = 9.0
    mid = const.copy()
    mid[10] = 9.0  # singleton NOT at the end -> not anomalous
    assert single_value_anomaly(ts[:50], broke, {}) == (True, 1.0)
    assert single_value_anomaly(ts[:50], const, {}) == (False, 0.0)
    assert single_value_anomaly(ts[:50], mid, {}) == (False, 0.0)

    # the repeated rolling medians filter transient noise; the robust
    # m66 signal is a sustained level step whose transition spikes the
    # smoothed-series rolling std (anomaly_window covers the transition)
    stepped_up = v.copy()
    stepped_up[-40:] += 50
    assert m66(ts, stepped_up, {"anomaly_window": 40}) == (True, 1.0)
    assert m66(ts, v, {"anomaly_window": 40}) == (False, 0.0)
    assert m66(ts[:9], v[:9], {}) == (None, None)  # too short (< 10, ref)
    # 10 <= n < window*(nth_median+1): all-NaN medians -> deterministic
    # False, exactly the reference's computed path (m66.py:812)
    assert m66(ts[:10], v[:10], {}) == (False, 0.0)

    stepped = v.copy()
    stepped[-5:] += 100  # fresh step: macd line still in the top bin
    assert macd(ts, stepped, {}) == (True, 1.0)
    assert macd(ts, stepped, {"feature": "macd_histogram"}) == (True, 1.0)
    assert macd(ts, v, {"anomaly_window": 10}) == (False, 0.0)

    siney = v.copy()
    siney[-80:] = 100 + 10 * np.sin(2 * np.pi * np.arange(80) / 10)
    assert spectral_entropy(ts, siney, {}) == (True, 1.0)  # ordered tail
    assert spectral_entropy(ts, v, {}) == (False, 0.0)  # white noise

    flat = np.full(1200, 100.0)
    jump = flat.copy()
    jump[-1] = 150.0
    small = flat.copy()
    small[-1] = 102.0
    sustained = flat.copy()
    sustained[-3:] = 150.0
    assert scwps(ts[:1200], jump, {}) == (True, 1.0)
    assert scwps(ts[:1200], small, {}) == (False, 0.0)
    assert scwps(ts[:1200], sustained, {"times_in_a_row": 3}) == (True, 1.0)
    zero_base = np.zeros(1200)
    zero_base[-1] = 5.0  # median 0 -> percent undeterminable
    assert scwps(ts[:1200], zero_base, {}) == (None, None)


def test_ported_custom_algorithms_tranche2(noisy):
    """Second round-3 tranche (skyline/custom_algorithms/):
    median_absolute_deviation (custom 6x variant), lad, last_same_hours,
    spectral_residual, lof, isolation_forest."""
    from skyline_spark.functions.custom_algorithms import (
        custom_median_absolute_deviation as cmad,
        isolation_forest,
        lad,
        last_same_hours,
        lof,
        spectral_residual,
    )
    ts, v = noisy

    spiked = v.copy()
    spiked[-1] = 200.0
    assert cmad(ts, spiked, {}) == (True, 1.0)
    assert cmad(ts, v, {}) == (False, 0.0)
    assert cmad(ts, np.full(10, 3.0), {}) == (False, 0.0)  # MAD 0 guard

    assert lad(ts, spiked, {}) == (True, 1.0)
    assert lad(ts, v, {}) == (False, 0.0)
    # threshold 95 flags the top 5% everywhere: a window wider than 5%
    # of the series always contains one -> anomalous even on noise
    assert lad(ts, v, {"anomaly_window": 200}) == (True, 1.0)

    # last_same_hours: hourly cadence over 4 days, daily-repeating peak
    hts = np.arange(0, 4 * 86400 + 3600, 3600, dtype=np.float64)
    hv = np.full(hts.size, 10.0)
    hv[np.flatnonzero(hts % 86400 == 0)] = 100.0  # daily spike incl last
    assert last_same_hours(hts, hv, {}) == (False, 0.0)  # repeating=normal
    solo = hv.copy()
    solo[-1] = 500.0  # this day's peak is way off the daily band
    assert last_same_hours(hts, solo, {}) == (True, 1.0)
    # < 3 days of data -> undeterminable
    assert last_same_hours(hts[:48], hv[:48], {}) == (None, None)

    assert spectral_residual(ts, spiked, {}) == (True, 1.0)
    sr_quiet = spectral_residual(ts, v, {})
    assert sr_quiet[0] is False
    assert spectral_residual(ts[:10], v[:10], {}) == (None, None)

    assert lof(ts, spiked, {}) == (True, 1.0)
    assert lof(ts, v, {}) == (False, 0.0)
    assert lof(ts[:1], v[:1], {}) == (False, 0.0)

    assert isolation_forest(ts, spiked, {}) == (True, 1.0)
    assert isolation_forest(ts, v, {}) == (False, 0.0)
    # deterministic: same seed, same verdict both calls
    assert isolation_forest(ts, spiked, {}) == \
        isolation_forest(ts, spiked, {})


def test_anomalous_daily_peak_and_dbscan():
    """Third round-3 tranche: anomalous_daily_peak (the mirage-side
    is-it-just-the-daily-peak negating check) and dbscan."""
    from skyline_spark.functions.custom_algorithms import (
        _find_peaks,
        anomalous_daily_peak,
        dbscan,
    )
    rng = np.random.RandomState(3)
    res = 600
    n = 7 * 86400 // res + 1
    ts = np.arange(n, dtype=np.float64) * res \
        + 1_700_000_000 - (n - 1) * res
    v = 10 + rng.normal(0, 0.2, n)
    for p in np.flatnonzero((ts - ts[-1]) % 86400 == 0):
        for off, h in [(-2, 30), (-1, 60), (0, 100)]:
            if 0 <= p + off < n:
                v[p + off] += h
    # the anomaly IS the repeating daily peak -> normal (False)
    assert anomalous_daily_peak(ts, v, {}) == (False, 0.0)
    v2 = v.copy()
    v2[-3:] *= 8  # this day's peak is 8x the daily band -> anomalous
    assert anomalous_daily_peak(ts, v2, {}) == (True, 1.0)
    # < 5.25 days / low resolution -> stays anomalous by design
    assert anomalous_daily_peak(ts[:100], v[:100], {}) == (True, 1.0)
    assert anomalous_daily_peak(ts[::2], v[::2], {}) == (True, 1.0)

    # find_peaks: plateau midpoint + height-priority distance thinning
    y = np.array([0, 1, 0, 2, 2, 0, 5, 0, 1, 0], float)
    assert list(_find_peaks(y, 1)) == [1, 3, 6, 8]
    assert list(_find_peaks(y, 3)) == [3, 6]

    ts2 = np.arange(800, dtype=np.float64)
    x = 50 + rng.normal(0, 1, 800)
    spiked = x.copy()
    spiked[-1] = 500.0
    assert dbscan(ts2, x, {}) == (False, 0.0)
    assert dbscan(ts2, spiked, {}) == (True, 1.0)
    assert dbscan(ts2[:5], x[:5], {}) == (None, None)  # too short


def test_pca_custom_algorithm():
    """pca — reconstruction-distance outlier over diff/smooth/lag
    features, train-normalized scores, suitability guards."""
    from skyline_spark.functions.custom_algorithms import pca
    rng = np.random.RandomState(2)
    n = 500
    ts = np.arange(n, dtype=np.float64)
    v = 50 + 5 * np.sin(2 * np.pi * ts / 50) + rng.normal(0, 0.5, n)
    spiked = v.copy()
    spiked[-1] += 100
    assert pca(ts, v, {}) == (False, 0.0)
    assert pca(ts, spiked, {}) == (True, 1.0)
    assert pca(ts[:12], v[:12], {}) == (None, None)       # too short
    assert pca(ts, np.full(n, 3.0), {}) == (None, None)   # zero variance


def test_adtk_persist_and_volatility_shift():
    """adtk PersistAD / VolatilityShiftAD semantics: IQR-fenced
    double-rolling aggregates, flags only count inside the realtime
    window."""
    from skyline_spark.functions.custom_algorithms import (
        adtk_persist,
        adtk_volatility_shift,
    )
    rng = np.random.RandomState(4)
    n = 1000
    ts = np.arange(n, dtype=np.float64)
    v = 100 + rng.normal(0, 1, n)
    spiked = v.copy()
    spiked[-2] = 200.0
    assert adtk_persist(ts, v, {}) == (False, 0.0)
    assert adtk_persist(ts, spiked, {}) == (True, 1.0)
    assert adtk_persist(ts[:3], v[:3], {}) == (None, None)

    assert adtk_volatility_shift(ts, v, {}) == (False, 0.0)
    # volatility jumps 1 -> 15 exactly window points from the end: the
    # shift POINT lands inside the realtime window -> anomalous
    shift_at_end = v.copy()
    shift_at_end[-5:] = 100 + rng.normal(0, 15, 5)
    assert adtk_volatility_shift(ts, shift_at_end, {}) == (True, 1.0)
    # the same shift 10 points back is OUTSIDE window 5 -> not flagged
    earlier = np.concatenate([v[:990], 100 + rng.normal(0, 15, 10)])
    assert adtk_volatility_shift(ts, earlier, {}) == (False, 0.0)


def test_moving_sum_decrease_pair():
    """moving_sum_decrease / moving_sum_and_value_decrease: zero-sum
    drop, spike-over-3x-mean (msd), and the collapse-below-mean/3 rule
    (msavd) each flip the verdict; quiet rates stay quiet."""
    from skyline_spark.functions.custom_algorithms import (
        moving_sum_and_value_decrease as msavd,
        moving_sum_decrease as msd,
    )
    rng = np.random.RandomState(6)
    n = 400
    ts = np.arange(n, dtype=np.float64)
    p = {"window": 20}
    v = 10 + rng.normal(0, 1, n)
    assert msd(ts, v, p) == (False, 0.0)
    assert msavd(ts, v, p) == (False, 0.0)
    drop = v.copy()
    drop[-20:] = 0.0        # window sum hits exactly 0 from nonzero
    assert msd(ts, drop, p) == (True, 1.0)
    assert msavd(ts, drop, p) == (True, 1.0)
    spike = v.copy()
    spike[-1] = 700.0       # sum jump > 70% AND value > 3x sum-mean
    assert msd(ts, spike, p) == (True, 1.0)
    cliff = v.copy()
    cliff[-25:] = 0.05      # collapse below mean/3 but still positive
    assert msavd(ts, cliff, p) == (True, 1.0)
    assert msd(ts, cliff, p) == (False, 0.0)   # msd has no decrease-0.7
    assert msd(ts[:30], v[:30], p) == (None, None)   # < 3 windows


def test_matrixprofile_and_adtk_level_shift():
    """skyline_matrixprofile: the STOMP profile must equal a brute-force
    z-normalized distance profile (incl. constant-subsequence and
    exclusion-zone conventions); discord-in-tail flips the verdict.
    adtk_level_shift: the faithful adtk median pipeline."""
    from skyline_spark.functions.custom_algorithms import (
        _matrix_profile,
        adtk_level_shift,
        skyline_matrixprofile,
    )

    def brute(x, m):
        n = x.size - m + 1
        excl = int(np.ceil(m / 4))
        subs = np.lib.stride_tricks.sliding_window_view(x, m).astype(float)
        mu, sig = subs.mean(1), subs.std(1)
        out = np.full(n, np.inf)
        for i in range(n):
            d = np.full(n, np.inf)
            for j in range(n):
                if abs(i - j) <= excl:
                    continue
                if sig[i] < 1e-13 and sig[j] < 1e-13:
                    d[j] = 0.0
                elif sig[i] < 1e-13 or sig[j] < 1e-13:
                    d[j] = np.sqrt(m)
                else:
                    a = (subs[i] - mu[i]) / sig[i]
                    b = (subs[j] - mu[j]) / sig[j]
                    d[j] = np.sqrt(((a - b) ** 2).sum())
            out[i] = d.min()
        return out

    rng = np.random.RandomState(9)
    x = rng.normal(0, 1, 200)
    x[50:60] = 0.0      # constant stretch exercises the σ=0 conventions
    assert np.allclose(_matrix_profile(x, 8), brute(x, 8), atol=1e-7)

    n = 1000
    ts = np.arange(n, dtype=np.float64)
    v = 50 + np.sin(2 * np.pi * ts / 24) + rng.normal(0, 0.1, n)
    spiked = v.copy()
    spiked[-3] = 500.0
    assert skyline_matrixprofile(ts, v, {}) == (False, 0.0)
    assert skyline_matrixprofile(ts, spiked, {}) == (True, 1.0)
    assert skyline_matrixprofile(ts[:10], v[:10], {}) == (None, None)

    shifted = v.copy()
    shifted[-5:] += 50
    assert adtk_level_shift(ts, v, {}) == (False, 0.0)
    assert adtk_level_shift(ts, shifted, {}) == (True, 1.0)


def test_adtk_seasonal():
    """adtk SeasonalAD: per-phase pattern residual IQR fence with
    ACF-detected period; pattern break flips the verdict, aperiodic
    series fail the fit to (False, 0.0)."""
    from skyline_spark.functions.custom_algorithms import adtk_seasonal
    rng = np.random.RandomState(11)
    n = 960
    ts = np.arange(n, dtype=np.float64)
    v = 100 + 10 * np.sin(2 * np.pi * ts / 24) + rng.normal(0, 0.5, n)
    assert adtk_seasonal(ts, v, {}) == (False, 0.0)
    broken = v.copy()
    broken[-2] += 60        # breaks the daily phase pattern
    assert adtk_seasonal(ts, broken, {}) == (True, 1.0)
    assert adtk_seasonal(ts, 100 + rng.normal(0, 1, n), {}) == (False, 0.0)
    assert adtk_seasonal(ts, np.full(n, 5.0), {}) == (False, 0.0)
    assert adtk_seasonal(ts[:10], v[:10], {}) == (None, None)


def test_probabilistic_forecasts_gpd_ets():
    """pfgpde — Hyndman probabilistic-forecast detection: ETS(A,A,N)
    density scores + GPD tail probability. The PWM fit recovers an
    exponential's (kappa=0, scale=theta); a forecast-breaking spike in
    the anomaly window flips the verdict; degenerate inputs mirror the
    reference's recorded-error (None, None) path."""
    from skyline_spark.functions.custom_algorithms import (
        _gpd_pwm_fit,
        probabilistic_forecasts_gpd_ets as pfgpde,
    )
    rng = np.random.RandomState(42)
    kappa, scale = _gpd_pwm_fit(rng.exponential(2.0, 5000))
    assert abs(kappa) < 0.05 and abs(scale - 2.0) < 0.1
    n = 200
    ts = np.arange(n, dtype=np.float64) * 60
    v = (50 + 0.05 * np.arange(n) + 3 * np.sin(np.arange(n) / 9.0)
         + rng.normal(0, 1.0, n))
    assert pfgpde(ts, v, {}) == (False, 0.0)
    spiked = v.copy()
    spiked[-1] += 40
    assert pfgpde(ts, spiked, {}) == (True, 1.0)
    mid = v.copy()
    mid[100] += 40                       # outside anomaly_window=1 ...
    assert pfgpde(ts, mid, {}) == (False, 0.0)
    assert pfgpde(ts, mid, {"anomaly_window": n}) == (True, 1.0)
    level = v.copy()
    level[150:] += 25                    # level shift breaks the forecast
    assert pfgpde(ts, level, {"anomaly_window": 60}) == (True, 1.0)
    assert pfgpde(ts, np.full(n, 7.0), {}) == (None, None)
    assert pfgpde(ts[:10], v[:10], {}) == (None, None)


def test_mstl():
    """mstl — MSTL-lite decomposition + ETS trend + in-sample Gaussian
    99% interval breach. The seasonal extraction must recover a planted
    two-period seasonality to sub-noise RMSE; breaches flip the verdict
    only inside anomaly_window; degenerate inputs mirror the
    reference's (None, None) error path."""
    from skyline_spark.functions.custom_algorithms import (
        _mstl_seasonal,
        mstl,
    )
    rng = np.random.RandomState(7)
    n = 24 * 7 * 3                     # three weeks at hourly cadence
    t = np.arange(n, dtype=np.float64)
    ts = t * 3600
    pure = 8 * np.sin(2 * np.pi * t / 24) + 4 * np.sin(2 * np.pi * t / 168)
    v = 100 + pure + 0.01 * t + rng.normal(0, 1.0, n)
    seas = _mstl_seasonal(v, [24, 168])
    rmse = float(np.sqrt(np.mean((seas - (pure - pure.mean())) ** 2)))
    assert rmse < 1.0                  # below the noise sigma
    assert mstl(ts, v.copy(), {}) == (False, 0.0)
    sp = v.copy()
    sp[-1] += 30
    assert mstl(ts, sp, {}) == (True, 1.0)
    mid = v.copy()
    mid[200] += 30
    assert mstl(ts, mid, {}) == (False, 0.0)
    assert mstl(ts, mid, {"anomaly_window": n}) == (True, 1.0)
    assert mstl(ts, np.full(n, 3.0), {}) == (None, None)
    assert mstl(ts[:20], v[:20], {}) == (None, None)
    assert mstl(ts[:40], v[:40], {"season_hours": 100}) == (None, None)


def test_skyline_tsb_uad_pca():
    """TSB-UAD PCA on a 1-D series reduces to |z - s| scoring with
    s = sign(z[argmax|z|]); a dominant end spike flags itself, a
    mid-series spike outside anomaly_window does not, and degenerate
    inputs mirror the reference's guards (constant -> (False, None))."""
    from skyline_spark.functions.custom_algorithms import (
        skyline_tsb_uad_pca as pca,
    )
    rng = np.random.RandomState(3)
    n = 300
    ts = np.arange(n, dtype=np.float64)
    v = 100 + rng.normal(0, 1.0, n)
    assert pca(ts, v.copy(), {}) == (False, 0.0)
    b = v.copy()
    b[-1] += 50
    assert pca(ts, b, {}) == (True, 1.0)
    mid = v.copy()
    mid[150] += 50
    assert pca(ts, mid, {}) == (False, 0.0)
    assert pca(ts, mid, {"anomaly_window": n}) == (True, 1.0)
    assert pca(ts, np.full(n, 5.0), {}) == (False, None)
    assert pca(ts[:5], v[:5], {}) == (None, None)


def test_mmzrmp_and_kernel_cpd():
    """mmzrmp — the sustained-changepoint ensemble. The own kernel-CPD
    PELT must return the exact optimum (verified against brute-force
    enumeration of admissible breakpoint sets) and find a planted level
    shift; the ensemble flags a recent sustained drop, ignores an old
    one outside anomaly_window, and guards degenerate input."""
    import itertools

    from skyline_spark.functions.custom_algorithms import (
        _kcpd_seg_costs,
        _rbf_gram_prefix,
        kernel_cpd_binseg,
        kernel_cpd_pelt,
        mmzrmp,
    )
    rng = np.random.RandomState(1)
    x = np.concatenate([rng.normal(0, 1, 100), rng.normal(8, 1, 100)])
    assert kernel_cpd_pelt(x, 30, 6) == [100, 200]
    assert kernel_cpd_binseg(x, 30, 6) == [100, 200]
    # brute-force optimality on a small admissible space
    xs = np.concatenate([rng.normal(0, .5, 12), rng.normal(4, .5, 12)])
    n = xs.size
    P = _rbf_gram_prefix(xs)

    def cost(a, b):
        return float(_kcpd_seg_costs(P, a, np.array([b]))[0])
    best = (np.inf, None)
    for k in range(0, 3):
        for bk in itertools.combinations(range(6, n - 5), k):
            segs = [0] + list(bk) + [n]
            if any(segs[i + 1] - segs[i] < 6 for i in range(len(segs) - 1)):
                continue
            tot = sum(cost(segs[i], segs[i + 1])
                      for i in range(len(segs) - 1)) + 30 * k
            if tot < best[0]:
                best = (tot, list(bk) + [n])
    assert kernel_cpd_pelt(xs, 30, 6) == best[1]

    nn = 600
    t = np.arange(nn, dtype=np.float64) * 60
    base = 100 + rng.normal(0, 1.0, nn)
    assert mmzrmp(t, base.copy(), {"anomaly_window": 15}) == (False, 0.0)
    recent = base.copy()
    recent[-20:] -= 60
    assert mmzrmp(t, recent, {"anomaly_window": 15}) == (True, 1.0)
    old = base.copy()
    old[-80:-60] -= 60              # over and done before the window
    assert mmzrmp(t, old, {"anomaly_window": 15}) == (False, 0.0)
    assert mmzrmp(t[:50], base[:50], {}) == (None, None)


def test_one_class_svm():
    """one_class_svm — own SMO solver for the nu-one-class-SVM dual.
    The solver must respect the nu bound (outlier fraction <= nu, sum
    alpha = 1); the detector flags a fresh spike via the rolling
    mean/variance embedding and ignores one outside anomaly_window.
    A constant series yields decision 0 -> flagged, matching libsvm's
    sign convention (the reference variant has no variance guard;
    Boring catches constants upstream)."""
    from skyline_spark.functions.custom_algorithms import (
        _ocsvm_fit,
        _rbf_kernel_mat,
        one_class_svm as ocs,
    )
    rng = np.random.RandomState(9)
    X = rng.normal(0, 1, (300, 2))
    alpha, rho = _ocsvm_fit(X, 0.09, 0.5)
    assert abs(alpha.sum() - 1.0) < 1e-9
    dec = _rbf_kernel_mat(X, X[alpha > 1e-12], 0.5) \
        @ alpha[alpha > 1e-12] - rho
    assert float((dec < 0).mean()) <= 0.09 + 1e-9
    n = 400
    ts = np.arange(n, dtype=np.float64)
    v = 100 + rng.normal(0, 1.0, n)
    assert ocs(ts, v.copy(), {}) == (False, 0.0)
    sp = v.copy()
    sp[-1] += 30
    assert ocs(ts, sp, {}) == (True, 1.0)
    mid = v.copy()
    mid[200] += 30
    assert ocs(ts, mid, {}) == (False, 0.0)
    assert ocs(ts, mid, {"anomaly_window": n}) == (True, 1.0)
    assert ocs(ts, np.full(n, 5.0), {}) == (True, 1.0)
    assert ocs(ts[:10], v[:10], {}) == (None, None)


def test_skyline_tsb_uad_ocsvm():
    """TSB-UAD OCSVM on the same SMO solver: find_length recovers a
    planted daily period, the verdict is exactly any-flag-in-window
    (window=n reduces to any-flag), and degenerate inputs mirror the
    reference's guards. Per-window min-max scaling means flags mark
    SHAPE outliers relative to the 10% training head — pinned here as
    golden behavior (sklearn unavailable for cross-checking)."""
    from skyline_spark.functions.custom_algorithms import (
        _acf_find_length,
        skyline_tsb_uad_ocsvm as oc,
    )
    rng = np.random.RandomState(11)
    n = 24 * 7 * 2
    t = np.arange(n, dtype=np.float64) * 3600
    v = 100 + 10 * np.sin(2 * np.pi * np.arange(n) / 24) \
        + rng.normal(0, 1.0, n)
    assert _acf_find_length(v) == 24
    assert oc(t, v.copy(), {}) == (False, 0.0)        # calm tail
    assert oc(t, v.copy(), {"anomaly_window": n}) == (True, 1.0)
    assert oc(t, np.full(n, 5.0), {}) == (None, None)
    assert oc(t[:20], v[:20], {}) == (None, None)
    # a tail whose WINDOW SHAPE breaks from the training head flags:
    # flatten the final day so its scaled window no longer matches any
    # sine-phase window
    flat = v.copy()
    flat[-24:] = flat[-24]
    assert oc(t, flat, {"anomaly_window": 5}) == (True, 1.0)
    assert oc(t, flat, {"anomaly_window": n}) == (True, 1.0)


def test_low_variance_anomalous_peak_trough():
    """lvapt — mirage-side second opinion: repeating modest peaks cancel
    the anomaly, an outsized final peak/trough confirms it, and
    near-monotonic series pass through ``currently_anomalous``."""
    from skyline_spark.functions.custom_algorithms import (
        low_variance_anomalous_peak_trough as lvapt,
    )
    rng = np.random.RandomState(5)
    n = 1000
    ts = np.arange(n, dtype=np.float64)
    v = 100 + rng.normal(0, 0.5, n)
    for p in range(99, n, 100):
        v[p] += 20
    assert lvapt(ts, v, {"currently_anomalous": True}) == (False, 0.0)
    big = v.copy()
    big[-1] += 200
    assert lvapt(ts, big, {"currently_anomalous": True}) == (True, 1.0)
    tv = 100 - (v - 100)        # mirrored: troughs instead of peaks
    tbig = tv.copy()
    tbig[-1] -= 200
    assert lvapt(ts, tv, {"currently_anomalous": True}) == (False, 0.0)
    assert lvapt(ts, tbig, {"currently_anomalous": True}) == (True, 1.0)
    mono = np.cumsum(np.abs(rng.normal(1, 0.1, n)))
    assert lvapt(ts, mono, {"currently_anomalous": True}) == (True, None)
    assert lvapt(ts, mono, {}) == (False, None)


def test_lof_windowed_knn_equals_all_pairs():
    """The O(n·k) sorted-window kNN inside lof() must agree with a naive
    all-pairs distance-matrix LOF (same fit-excludes-self /
    query-includes-self novelty flow) on random data with ties."""
    from skyline_spark.functions.custom_algorithms import lof

    from skyline_spark.functions.custom_algorithms import _lof_scores

    def naive_scores(x, k):
        # all-pairs twin with sklearn's (distance, dataset index)
        # tie-break: stable argsort over dataset-index column order
        n = x.size
        k = min(k, n - 1)
        d = np.abs(x[:, None] - x[None, :])
        d_fit = d.copy()
        np.fill_diagonal(d_fit, np.inf)
        sel = np.argsort(d_fit, 1, kind="stable")[:, :k]
        nd = np.take_along_axis(d_fit, sel, 1)
        k_dist = nd[:, -1]
        lrd = 1 / (np.maximum(nd, k_dist[sel]).mean(1) + 1e-10)
        sel_q = np.argsort(d, 1, kind="stable")[:, :k]
        nd_q = np.take_along_axis(d, sel_q, 1)
        lrd_q = 1 / (np.maximum(nd_q, k_dist[sel_q]).mean(1) + 1e-10)
        return -(lrd[sel_q] / lrd_q[:, None]).mean(1)

    rng = np.random.RandomState(7)
    for _ in range(10):
        n = rng.randint(5, 300)
        x = np.round(rng.normal(0, 1, n), rng.choice([1, 2, 6]))
        if rng.rand() < 0.5:
            x[rng.randint(n)] += 20
        ts = np.arange(n, dtype=float)
        k = int(rng.choice([3, 5, 20]))
        sc = naive_scores(x.astype(float), min(k, n - 1))
        out = sc < -1.5
        assert np.allclose(_lof_scores(x.astype(float), min(k, n - 1)),
                           sc, rtol=0, atol=1e-12)
        assert lof(ts, x, {"n_neighbors": k})[0] == bool(out[-1:].any())
        assert lof(ts, x, {"n_neighbors": k,
                           "anomaly_window": n})[0] == bool(out.any())
    # heavy duplicate runs larger than the ±k window: distance-tie runs
    # escape the window and must still break ties by ORIGINAL dataset
    # index (sklearn semantics — the exact group-merge fallback);
    # pinned at SCORE level, not just the flag
    for _ in range(8):
        n = rng.randint(30, 120)
        x = rng.choice([0.0, 0.0, 0.0, 1.0, 1.0, 5.0], n)
        x[rng.randint(n)] = 50.0
        ts = np.arange(n, dtype=float)
        k = min(int(rng.choice([3, 5, 10])), n - 1)
        sc = naive_scores(x.astype(float), k)
        assert np.allclose(_lof_scores(x.astype(float), k), sc,
                           rtol=0, atol=1e-12)
        assert lof(ts, x, {"n_neighbors": k,
                           "anomaly_window": n})[0] == bool((sc < -1.5).any())


def test_laoccfdlpnc(noisy):
    """laoccfdlpnc — six-detector fusion with the own interior-point
    weight solve (skyline/custom_algorithms/laoccfdlpnc.py): spike
    flags, quiet passes, plus the reference's quirks (NaN series ->
    (None, None) because its fill idiom raises; constant series ->
    (False, 0.0) via the error-cascade path). The wrapper sorts and
    mirage-downsamples long fine-grained series before dispatch."""
    from skyline_spark.functions.custom_algorithms import (
        laoccfdlpnc,
        skyline_laoccfdlpnc,
    )
    ts, v = noisy
    ts, v = ts[:600] * 60.0, v[:600]
    spiked = v.copy()
    spiked[-1] = 400.0
    assert laoccfdlpnc(ts, spiked, {}) == (True, 1.0)
    assert laoccfdlpnc(ts, v, {}) == (False, 0.0)
    assert laoccfdlpnc(ts[:100], np.full(100, 5.0), {}) == (False, 0.0)
    nanv = v[:100].copy()
    nanv[-1] = np.nan
    assert laoccfdlpnc(ts[:100], nanv, {}) == (None, None)
    assert laoccfdlpnc(ts[:10], v[:10], {}) == (None, None)
    # wrapper: unsorted input is sorted before dispatch
    perm = np.random.RandomState(1).permutation(ts.size)
    assert skyline_laoccfdlpnc(ts[perm], spiked[perm], {}) == (True, 1.0)
    # wrapper: > 1600 points at < 600 s resolution downsample to 600 s
    # mean buckets (end-aligned); a sustained tail step survives the
    # bucket means and still flags
    n2 = 1800
    t2 = np.arange(n2, dtype=float) * 60.0
    v2 = 100 + np.random.RandomState(2).normal(0, 1, n2)
    v2[-12:] = 400.0  # full final 600 s bucket is elevated
    assert skyline_laoccfdlpnc(t2, v2, {}) == (True, 1.0)
    assert skyline_laoccfdlpnc(t2, 100 + np.random.RandomState(3)
                               .normal(0, 1, n2), {}) == (False, 0.0)


def test_sigma_suite(noisy):
    """sigma — the reference's full 9-algorithm re-vote with
    parameterized sigma (custom_algorithm_sources/sigma/sigma.py:
    622-818): spike flags via >= consensus True votes, quiet passes,
    the MIN_TOLERABLE_LENGTH=100 and boredom gates return False, the
    windowed prefix loop records per-window anomalies, and the
    anomaly_window >= 20 route hits the oneshot pass whose anomalous
    flag needs ALL seven algorithms (the score >= 1 quirk,
    sigma_oneshot.py:586)."""
    from skyline_spark.functions.custom_algorithms import (
        run_sigma_algorithms,
        run_sigma_oneshot_algorithms,
        sigma,
    )
    ts, v = noisy
    v2 = v.copy()
    v2[-1] = 200.0
    assert sigma(ts, v2, {"sigma": 3}) == (True, 1.0)
    assert sigma(ts, v, {"sigma": 3}) == (False, 0.0)
    # gates
    assert sigma(ts[:50], v2[:50], {}) == (False, 0.0)
    assert sigma(ts, np.ones(ts.size), {}) == (False, 0.0)
    # windowed path: the spike only registers at the full-series vote
    anom, anomalies = run_sigma_algorithms(ts, v2, 3, 6, 5)
    assert anom is True
    assert list(anomalies) == [int(ts[-1])]
    rec = anomalies[int(ts[-1])]
    assert rec["index"] == ts.size - 1
    # 6 of 9 suffice: first_hour_average (empty window) and ks_test
    # (same distribution) stay False on this fixture
    votes = rec["algorithms_results"]
    assert sum(1 for r in votes.values() if r is True) >= 6
    # a mid-series spike inside the window registers at its own index
    v3 = v.copy()
    v3[-3] = 200.0
    anom3, anomalies3 = run_sigma_algorithms(ts, v3, 3, 6, 5)
    assert anom3 is True
    assert int(ts[-3]) in anomalies3
    # oneshot: per-point anomalies exist at >= consensus but the
    # anomalous flag requires all 7 (quirk preserved)
    osh_anom, osh_score, osh_anoms = run_sigma_oneshot_algorithms(
        ts, v2, 3, 6, 25)
    assert osh_anom is False and osh_score == 0.0
    assert int(ts[-1]) in osh_anoms
    # oneshot gates return the (None, 0.0, {}) triple
    assert run_sigma_oneshot_algorithms(ts[:50], v2[:50], 3, 6, 25) \
        == (None, 0.0, {})
    # oracle surface: maximum-false early exit stops the suite — on a
    # quiet series the first three algorithms (histogram_bins,
    # first_hour_average, stddev_from_average) all vote False at
    # consensus 6 over 8, so grubbs onward never run
    from skyline_spark.functions.custom_algorithms import (
        SIGMA_SQL8_ALGORITHMS,
        sigma_vote_flags,
    )
    gated, anom, algos = sigma_vote_flags(ts, v, 3, 6,
                                          SIGMA_SQL8_ALGORITHMS)
    assert (gated, anom) == (False, False)
    assert list(algos) == ["histogram_bins", "first_hour_average",
                           "stddev_from_average"]
    g2, a2, algos2 = sigma_vote_flags(ts, v2, 3, 6,
                                      SIGMA_SQL8_ALGORITHMS)
    assert (g2, a2) == (False, True)
    assert len(algos2) == 8
    assert sigma_vote_flags(ts[:50], v[:50], 3, 6,
                            SIGMA_SQL8_ALGORITHMS) == (True, False, {})


def test_skyline_prophet(noisy):
    """skyline_prophet — prophet-lite MAP trend + 99% interval
    (skyline/custom_algorithms/skyline_prophet.py): an upper-interval
    breach in the last anomaly_window flags, quiet and below-lower
    breaches do not (the reference only keeps anomaly > 0 with positive
    importance), a trend-following series stays quiet because the
    piecewise trend absorbs it, and the fit is deterministic."""
    from skyline_spark.functions.custom_algorithms import skyline_prophet
    rng = np.random.RandomState(7)
    n = 2000
    ts = 1_700_000_000 + 60.0 * np.arange(n)
    v = 100 + 0.01 * np.arange(n) + rng.normal(0, 1, n)
    spiked = v.copy()
    spiked[-1] = v[-1] + 30
    assert skyline_prophet(ts, spiked, {}) == (True, 1.0)
    assert skyline_prophet(ts, v, {}) == (False, 0.0)
    # a NEGATIVE breach is anomaly=-1 in detect_anomalies and filtered
    dipped = v.copy()
    dipped[-1] = v[-1] - 30
    assert skyline_prophet(ts, dipped, {}) == (False, 0.0)
    # an old spike outside anomaly_window=1 does not flag
    old_spike = v.copy()
    old_spike[-10] = v[-10] + 30
    assert skyline_prophet(ts, old_spike, {}) == (False, 0.0)
    assert skyline_prophet(ts, old_spike, {"anomaly_window": 10}) \
        == (True, 1.0)
    # deterministic
    assert skyline_prophet(ts, spiked, {}) == \
        skyline_prophet(ts, spiked, {})
    # a kinked trend is absorbed by the changepoints (no false flag)
    kinked = v.copy()
    kinked[n // 2:] += 0.05 * np.arange(n - n // 2)
    assert skyline_prophet(ts, kinked, {})[0] is False
    assert skyline_prophet(ts[:2], v[:2], {}) == (None, None)


def test_irregular_unstable(noisy):
    """irregular_unstable — gate cascade + 2-of-2 spectral_residual/
    sigma consensus (skyline/custom_algorithms/irregular_unstable.py):
    low-resolution and short-duration series short-circuit True,
    non-low-variance series short-circuit True, a low-variance series
    with a breaking spike needs both detectors to agree."""
    from skyline_spark.functions.custom_algorithms import (
        _normalised_variance,
        irregular_unstable,
    )
    rng = np.random.RandomState(11)
    n = 10080  # 7 days at 60 s
    ts = 1_700_000_000 + 60.0 * np.arange(n)
    quiet = 100 + rng.normal(0, 0.1, n)
    spiked = quiet.copy()
    spiked[-1] = 150.0
    # min-max-normalised variance collapses under the spike's range
    assert _normalised_variance(spiked) < 0.0065
    assert irregular_unstable(ts, spiked, {}) == (True, 1.0)
    # noisy-at-scale data is "not low variance" -> True short-circuit
    assert _normalised_variance(quiet) > 0.009
    assert irregular_unstable(ts, quiet, {}) == (True, 1.0)
    # flat series: NaN variance falls through, both detectors quiet
    assert irregular_unstable(ts, np.full(n, 5.0), {}) == (False, 0.0)
    # gates
    assert irregular_unstable(ts[::20], quiet[::20], {}) == (True, 1.0)
    assert irregular_unstable(ts[:1000], quiet[:1000], {}) \
        == (True, 1.0)


def test_azure_ai_anomalydetector(noisy):
    """azure_ai_anomalydetector — the wrapper semantics
    (skyline/custom_algorithms/azure_ai_anomalydetector.py:273-318)
    over the local spectral-residual stand-in: anomaly_window vote,
    n/5 unreliable discard, too-short -> (None, None)."""
    from skyline_spark.functions.custom_algorithms import (
        azure_ai_anomalydetector,
    )
    ts, v = noisy
    spiked = v.copy()
    spiked[-1] = 200.0
    assert azure_ai_anomalydetector(ts, spiked, {}) == (True, 1.0)
    assert azure_ai_anomalydetector(ts, v, {})[0] is False
    # sensitivity 50 -> half the points flagged -> > n/5 -> discarded
    assert azure_ai_anomalydetector(
        ts, spiked, {"sensitivity": 50}) == (False, 0.0)
    assert azure_ai_anomalydetector(ts[:10], v[:10], {}) == (None, None)


def test_grafana_promql_anomaly_detection():
    """grafana_promql_anomaly_detection
    (skyline/custom_algorithms/grafana_promql_anomaly_detection.py):
    margin bands on a quiet 600 s series, sustained-run duration
    filter, the anomaly_window=1 start-timestamp quirk, the < 5.5 day
    gate, and the < 600 s median-resample path."""
    from skyline_spark.functions.custom_algorithms import (
        grafana_promql_anomaly_detection as gpad,
    )
    rng = np.random.RandomState(7)
    n = 7 * 144  # 7 days at 600 s
    ts = 1_700_000_000 + 600.0 * np.arange(n)
    quiet = 100 + rng.normal(0, 1, n)
    assert gpad(ts, quiet, {"anomaly_window": 3}) == (False, 0.0)
    # sustained 3-point breach of the +50% margin band ending at the
    # last point: run starts at n-3, duration 1200 s >= 300 s
    burst = quiet.copy()
    burst[-3:] = 300.0
    assert gpad(ts, burst, {"anomaly_window": 3}) == (True, 1.0)
    # reference quirk: scores mark only run STARTS, and a run starting
    # at the final point has duration 0 -> the default anomaly_window=1
    # can never fire
    assert gpad(ts, burst, {}) == (False, 0.0)
    # a single out-of-band point has duration 0 -> dropped
    single = quiet.copy()
    single[-2] = 300.0
    assert gpad(ts, single, {"anomaly_window": 3}) == (False, 0.0)
    # < 5.5 days -> undeterminable
    assert gpad(ts[:400], quiet[:400], {"anomaly_window": 3}) \
        == (None, None)
    # 60 s resolution takes the median resample path down to 600 s
    n2 = 7 * 1440
    ts2 = 1_700_000_000 + 60.0 * np.arange(n2)
    q2 = 100 + rng.normal(0, 1, n2)
    assert gpad(ts2, q2, {"anomaly_window": 4}) == (False, 0.0)
    b2 = q2.copy()
    b2[-40:] = 300.0  # ~4 resampled buckets
    assert gpad(ts2, b2, {"anomaly_window": 4}) == (True, 1.0)


def test_custom_consensus_override(noisy):
    """A consensus_override custom algorithm decides by itself even when
    the 3-sigma suite votes not-anomalous."""
    ts, v = noisy  # not anomalous for the suite
    always = CustomAlgorithm(
        name="always_fire", fn=lambda t, x, p: (True, 1.0),
        consensus_override=True)
    cfg = PipelineConfig(custom_algorithms=(always,))
    verdict = run_selected_algorithm(ts, v, now=float(ts[-1]), cfg=cfg)
    assert verdict.anomalous is True
    assert "always_fire" in verdict.algorithms_run
    # without override it joins the ordinary vote and cannot win alone
    joiner = CustomAlgorithm(name="always_fire",
                             fn=lambda t, x, p: (True, 1.0))
    cfg2 = PipelineConfig(custom_algorithms=(joiner,))
    assert run_selected_algorithm(ts, v, float(ts[-1]), cfg2).anomalous is False


def test_mad_low_priority_prefilter(noisy):
    """ANALYZER_MAD_LOW_PRIORITY_METRICS (analyzer.py:3768-3793): a
    quiet LOW-priority series skips the suite via the MAD prefilter;
    high-priority series and big last steps go through the full vote."""
    ts, v = noisy
    cfg = PipelineConfig(mad_low_priority_n=10)
    quiet = run_selected_algorithm(ts, v, float(ts[-1]), cfg,
                                   low_priority=True)
    assert quiet.algorithms_run == ["mad_prefilter"]
    assert quiet.anomalous is False and quiet.exception is None
    # high-priority: full suite runs regardless
    hi = run_selected_algorithm(ts, v, float(ts[-1]), cfg,
                                low_priority=False)
    assert "mad_prefilter" not in hi.algorithms_run
    assert len(hi.algorithms_run) > 1
    # low-priority with a big last step: prefilter lets it through
    v2 = v.copy()
    v2[-1] += 500.0
    spiky = run_selected_algorithm(ts, v2, float(ts[-1]), cfg,
                                   low_priority=True)
    assert "mad_prefilter" not in spiky.algorithms_run
    assert spiky.anomalous is True


def test_custom_post_3sigma_and_run_only_if_consensus(noisy):
    """algorithms.py:1855-1995: post-3sigma custom results append to the
    SAME ensemble and count in the vote; run_only_if_consensus skips the
    algorithm entirely (not recorded) unless the suite already voted
    CONSENSUS Trues."""
    ts, v = noisy
    # quiet series: suite votes no -> gated confirmer never runs
    gated = CustomAlgorithm(
        name="expensive_confirm", fn=lambda t, x, p: (True, 1.0),
        run_before_3sigma=False, run_only_if_consensus=True)
    cfg = PipelineConfig(custom_algorithms=(gated,))
    quiet = run_selected_algorithm(ts, v, float(ts[-1]), cfg)
    assert "expensive_confirm" not in quiet.algorithms_run
    assert quiet.anomalous is False

    # anomalous series: suite reaches consensus -> confirmer runs and a
    # consensus_override=False veto from it kills the anomaly
    v2 = v.copy()
    v2[-3:] = 500.0
    fired = run_selected_algorithm(ts, v2, float(ts[-1]), cfg)
    assert "expensive_confirm" in fired.algorithms_run
    assert fired.anomalous is True
    assert len(fired.ensemble) == 10  # 9 suite votes + the appended custom
    veto = CustomAlgorithm(
        name="expensive_veto", fn=lambda t, x, p: (False, 0.0),
        run_before_3sigma=False, run_only_if_consensus=True,
        consensus_override=True)
    cfg2 = PipelineConfig(custom_algorithms=(veto,))
    vetoed = run_selected_algorithm(ts, v2, float(ts[-1]), cfg2)
    assert "expensive_veto" in vetoed.algorithms_run
    assert vetoed.anomalous is False


def test_custom_suppresses_3sigma(noisy):
    ts, v = noisy
    only = CustomAlgorithm(
        name="solo", fn=lambda t, x, p: (False, 0.0),
        run_3sigma_algorithms=False)
    cfg = PipelineConfig(custom_algorithms=(only,))
    verdict = run_selected_algorithm(ts, v, float(ts[-1]), cfg)
    assert verdict.algorithms_run == ["solo"]
    assert verdict.ensemble == [False]
    assert verdict.anomalous is False


def test_custom_use_with_restriction(noisy):
    ts, v = noisy
    scoped = CustomAlgorithm(
        name="scoped", fn=lambda t, x, p: (True, 1.0),
        consensus_override=True, use_with="db.")
    cfg = PipelineConfig(custom_algorithms=(scoped,))
    hit = run_selected_algorithm(ts, v, float(ts[-1]), cfg,
                                 metric="db.queries.rate")
    miss = run_selected_algorithm(ts, v, float(ts[-1]), cfg,
                                  metric="app.server.rate")
    assert hit.anomalous is True and "scoped" in hit.algorithms_run
    assert miss.anomalous is False and "scoped" not in miss.algorithms_run


def test_salted_left_join(spark):
    from skyline_spark.operators.skew import key_histogram, salted_left_join
    facts = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(1000)]
        + [("cold", i, float(i)) for i in range(10)],
        "conv_id string, turn_idx int, value double")
    dim = spark.createDataFrame(
        [("hot", "smtp"), ("cold", "slack"), ("unused", "x")],
        "conv_id string, alerter string")
    out = salted_left_join(facts, dim, "conv_id", salt_buckets=8,
                           salt_source="turn_idx")
    pdf = out.toPandas()
    assert len(pdf) == 1010  # left join row-preserving
    assert (pdf[pdf.conv_id == "hot"].alerter == "smtp").all()
    assert (pdf[pdf.conv_id == "cold"].alerter == "slack").all()
    hist = key_histogram(facts).toPandas()
    assert hist.iloc[0].conv_id == "hot" and hist.iloc[0]["count"] == 1000


def test_cap_series_tail(spark):
    from skyline_spark.operators.skew import cap_series_tail
    pdf = pd.DataFrame({
        "conv_id": ["a"] * 100 + ["b"] * 5,
        "turn_idx": list(range(100)) + list(range(5)),
    })
    pdf["ts"] = pd.to_datetime(pdf["turn_idx"], unit="s")
    pdf["value"] = 1.0
    capped = cap_series_tail(spark.createDataFrame(pdf), max_points=20) \
        .toPandas()
    a = capped[capped.conv_id == "a"]
    assert len(a) == 20 and a.turn_idx.min() == 80  # most recent kept
    assert len(capped[capped.conv_id == "b"]) == 5


def test_luminosity_lagged_correlation(spark):
    from skyline_spark.operators.correlate import luminosity_correlations
    rng = np.random.RandomState(1)
    n = 80
    base_ts = 1_700_000_000.0
    ts = base_ts - (n - 1) * 60 + np.arange(n) * 60.0
    a = np.sin(np.arange(n) / 4.0) * 10 + 100
    b = np.roll(a, 2) + rng.normal(0, 0.05, n)  # a shifted by 2 buckets
    c = rng.normal(100, 10, n)                  # uncorrelated
    rows = []
    for name, vals in (("anom", a), ("follower", b), ("noise", c)):
        for t, v in zip(ts, vals):
            rows.append((name, v, pd.Timestamp(t, unit="s")))
    parsed = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "value", "ts"]))
    anomalies = spark.createDataFrame(
        [("anom", float(ts[-1]))], "conv_id string, last_ts double")
    out = luminosity_correlations(parsed, anomalies, window_s=3600,
                                  step_s=60, max_shift_s=180,
                                  threshold=0.9).toPandas()
    assert set(out.cand_conv) == {"follower"}
    r = out.iloc[0]
    assert abs(r.coefficient) >= 0.95
    assert abs(r.shift_seconds) == 120


def _hand_luminol(ts, a, b, max_shift=120.0, impact=0.05):
    """Independent literal transcription of the published luminol
    DefaultCorrelator math — the hand-computed twin the kernel is
    pinned against (no shared code with the operator).  Pure-Python
    lists so ``b[i + d]`` WRAPS for negative indices and raises
    IndexError past the end, exactly as luminol's loop behaves; the
    sweep bound comes from luminol's quirky last-probe binary search."""
    a = (a / a.max()).tolist()
    b = (b / b.max()).tolist()
    n = len(a)
    am, bm = sum(a) / n, sum(b) / n
    denom = ((sum((x - am) ** 2 for x in a) / n) ** 0.5
             * (sum((x - bm) ** 2 for x in b) / n) ** 0.5 * n)
    res = [t - ts[0] for t in ts]
    lower, upper, pos = 0, n, 0
    while lower < upper:          # _find_first_bigger, returns last probe
        pos = lower + (upper - lower) // 2
        if res[pos] > max_shift:
            upper = pos
        else:
            lower = pos + 1
    allowed = pos
    lo, hi = (-allowed, allowed) if allowed else (0, 1)
    cors, shifted = [], []
    for d in range(lo, hi):
        dsec = ts[abs(d)] - ts[0]
        if d < 0:
            dsec = -dsec
        s = 0.0
        for i in range(n):
            try:
                s += (a[i] - am) * (b[i + d] - bm)  # negative index wraps
            except IndexError:
                pass
        r = s / denom if denom != 0 else s
        cors.append((r, dsec))
        shifted.append(r * (1 - impact * abs(dsec) / max_shift)
                       if max_shift else r)
    best = max(cors, key=lambda x: x[0])
    return best[0], best[1], max(shifted)


def test_luminol_correlator_fidelity(spark):
    """The 'luminol' correlation mode: fixed-denominator
    cross-correlation with normalize-by-max and shift-impact discount
    (process_correlations.py:1324-1342 semantics). The kernel must match
    a hand-computed twin exactly, find the planted 2-step lag, and the
    distributed mode='luminol' path must surface the same pair."""
    from skyline_spark.operators.correlate import (
        luminol_cross_correlation,
        luminosity_correlations,
    )
    n = 60
    ts = np.arange(n, dtype=float) * 60.0
    a = np.sin(np.arange(n) / 3.0) * 10 + 100
    b = np.roll(a, 2)  # b lags a by exactly 2 grid steps (120 s)

    coef, shift, shifted = luminol_cross_correlation(
        ts, a, ts, b, max_shift_seconds=180)
    h_coef, h_shift, h_shifted = _hand_luminol(ts, a.copy(), b.copy(),
                                               max_shift=180.0)
    assert np.isclose(coef, h_coef, rtol=0, atol=1e-12)
    assert shift == h_shift == 120.0
    assert np.isclose(shifted, h_shifted, rtol=0, atol=1e-12)
    # fixed-n denominator: partial overlap discounts the coefficient
    # below a re-normalized Pearson, but the true lag still wins big
    assert coef > 0.9
    assert shifted <= coef
    # zero-lag identical series: coefficient 1 at shift 0
    c0, s0, _ = luminol_cross_correlation(ts, a, ts, a.copy(),
                                          max_shift_seconds=180)
    assert np.isclose(c0, 1.0) and s0 == 0
    # fallback: when NO offset exceeds max_shift, luminol's
    # _find_first_bigger returns ~n-1 and the sweep covers ±(n-1);
    # negative delays include the wrap-around products — both pinned
    # against the literal hand twin
    sts = np.arange(8, dtype=float) * 60.0
    sa = np.array([1, 5, 2, 8, 3, 9, 4, 7], dtype=float)
    sb = np.roll(sa, 3)
    got = luminol_cross_correlation(sts, sa, sts, sb,
                                    max_shift_seconds=10_000)
    hand = _hand_luminol(sts, sa.copy(), sb.copy(), max_shift=10_000.0)
    assert np.isclose(got[0], hand[0], rtol=0, atol=1e-12)
    assert got[1] == hand[1]
    assert np.isclose(got[2], hand[2], rtol=0, atol=1e-12)

    # distributed path, mode='luminol'
    rng = np.random.RandomState(3)
    base_ts = 1_700_000_000.0
    gts = base_ts - (n - 1) * 60 + np.arange(n) * 60.0
    noise = rng.normal(100, 10, n)
    rows = []
    for name, vals in (("anom", a), ("follower", b), ("noise", noise)):
        for t, v in zip(gts, vals):
            rows.append((name, float(v), pd.Timestamp(t, unit="s")))
    parsed = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "value", "ts"]))
    anomalies = spark.createDataFrame(
        [("anom", float(gts[-1]))], "conv_id string, last_ts double")
    out = luminosity_correlations(parsed, anomalies, window_s=3600,
                                  step_s=60, max_shift_s=180,
                                  threshold=0.9, mode="luminol").toPandas()
    assert set(out.cand_conv) == {"follower"}
    r = out.iloc[0]
    assert r.coefficient >= 0.9
    assert r.shift_seconds == 120
    assert r.shifted_coefficient <= r.coefficient
