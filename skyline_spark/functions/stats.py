"""Pure-numpy statistical primitives replacing scipy/statsmodels.

The container has no scipy/statsmodels, so the three special functions the
reference's algorithm suite needs are implemented from standard published
numerics (Numerical Recipes-style continued fractions; the asymptotic
Kolmogorov distribution; MacKinnon's published ADF response-surface
coefficients):

- ``t_isf(q, df)``        — Student-t inverse survival function, used by
  grubbs (skyline/analyzer/algorithms.py:316 ``scipy.stats.t.isf``).
- ``ks_2samp(a, b)``      — two-sample Kolmogorov-Smirnov D + asymptotic
  two-sided p-value (skyline/analyzer/algorithms.py:736).
- ``adfuller_pvalue(x, maxlag)`` — Augmented Dickey-Fuller test (constant
  regression, AIC lag selection) returning the MacKinnon approximate
  p-value (skyline/analyzer/algorithms.py:739 ``sm.tsa.stattools.adfuller``).

Accuracy notes: t_isf agrees with scipy to ~1e-10 over the range used
(q down to 1e-9, df >= 3). ks_2samp's p-value uses the asymptotic series
(Numerical Recipes eq. 14.3.9 with the Stephens small-sample correction),
which differs from scipy's exact mode for tiny samples — the reference
only thresholds at p < 0.05 with D > 0.5, far from the divergence region.
adfuller reproduces statsmodels' autolag='AIC' fixed-sample selection and
MacKinnon(1994) p-values for regression='c', N=1.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# Regularized incomplete beta (continued fraction, Numerical Recipes 6.4)
# --------------------------------------------------------------------------

_MAXIT = 300
_EPS = 3.0e-14
_FPMIN = 1.0e-300


def _betacf(a: float, b: float, x: float) -> float:
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(lbeta)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


# --------------------------------------------------------------------------
# Student-t distribution
# --------------------------------------------------------------------------

def t_sf(x: float, df: float) -> float:
    """P(T > x) for Student-t with df degrees of freedom."""
    if x < 0:
        return 1.0 - t_sf(-x, df)
    return 0.5 * betainc(df / 2.0, 0.5, df / (df + x * x))


def t_isf(q: float, df: float) -> float:
    """Inverse survival function: x such that P(T > x) = q, for q <= 0.5.

    Bisection on t_sf — monotone decreasing; called once per series by
    grubbs, so a ~100-iteration bisection is negligible.
    """
    if not 0.0 < q <= 0.5:
        if q > 0.5:
            return -t_isf(1.0 - q, df)
        raise ValueError("q must be in (0, 1)")
    lo, hi = 0.0, 2.0
    while t_sf(hi, df) > q:
        hi *= 2.0
        if hi > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_sf(mid, df) > q:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-13 * max(1.0, lo):
            break
    return 0.5 * (lo + hi)


# --------------------------------------------------------------------------
# Normal CDF (for MacKinnon p-values)
# --------------------------------------------------------------------------

def norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def norm_ppf(p: float) -> float:
    """Inverse of ``norm_cdf`` via Newton's method seeded with a crude
    logit guess (used for prediction-interval z in custom mstl)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    x = math.copysign(math.sqrt(-2.0 * math.log(min(p, 1.0 - p))), p - 0.5)
    for _ in range(60):
        err = norm_cdf(x) - p
        pdf = math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)
        if pdf <= 0.0:
            break
        step = err / pdf
        x -= step
        if abs(step) <= 1e-14 * max(1.0, abs(x)):
            break
    return x


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov
# --------------------------------------------------------------------------

def _kolmogorov_sf(x: float) -> float:
    """Q_KS(x) = 2 * sum_{j>=1} (-1)^(j-1) exp(-2 j^2 x^2)."""
    if x < 1e-8:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * ((-1.0) ** (j - 1)) * math.exp(-2.0 * j * j * x * x)
        total += term
        if abs(term) < 1e-12:
            break
    return min(max(total, 0.0), 1.0)


def kolmogorov_isf(q: float) -> float:
    """Inverse survival of the Kolmogorov distribution by bisection on
    :func:`_kolmogorov_sf` (strictly decreasing for x > 0): the x with
    sf(x) = q, to double precision. kolmogorov_isf(0.05) is the
    critical constant that turns ks_2samp's ``p < 0.05`` into the
    deterministic comparison ``(en + 0.12 + 0.11/en) * D > K`` — the
    same literal-injection trick as the grubbs t-ISF thresholds."""
    lo, hi = 1e-8, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if mid == lo or mid == hi:
            break
        if _kolmogorov_sf(mid) > q:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def ks_2samp(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """Two-sample KS statistic D and asymptotic two-sided p-value."""
    a = np.sort(np.asarray(a, dtype=np.float64))
    b = np.sort(np.asarray(b, dtype=np.float64))
    n1, n2 = a.size, b.size
    both = np.concatenate([a, b])
    cdf1 = np.searchsorted(a, both, side="right") / n1
    cdf2 = np.searchsorted(b, both, side="right") / n2
    d = float(np.max(np.abs(cdf1 - cdf2)))
    en = math.sqrt(n1 * n2 / (n1 + n2))
    p = _kolmogorov_sf((en + 0.12 + 0.11 / en) * d)
    return d, p


# --------------------------------------------------------------------------
# Augmented Dickey-Fuller (regression='c', autolag='AIC')
# --------------------------------------------------------------------------

# MacKinnon (1994, 2010) response-surface coefficients for the constant-only
# regression, one variable (N=1) — as published (also tabulated in
# statsmodels.tsa.adfvalues, BSD).
_TAU_STAR_C = -1.61
_TAU_MIN_C = -18.83
_TAU_MAX_C = 2.74
_TAU_SMALLP_C = (2.1659, 1.4412, 3.8269e-2)
_TAU_LARGEP_C = (1.7339, 0.93202, -0.12745, -0.010368)


def mackinnon_pvalue(tau: float) -> float:
    """MacKinnon approximate asymptotic p-value for an ADF tau statistic
    (constant regression, N=1)."""
    if tau <= _TAU_MIN_C:
        return 0.0
    if tau >= _TAU_MAX_C:
        return 1.0
    if tau <= _TAU_STAR_C:
        c = _TAU_SMALLP_C
        poly = c[0] + c[1] * tau + c[2] * tau * tau
    else:
        c = _TAU_LARGEP_C
        poly = c[0] + c[1] * tau + c[2] * tau * tau + c[3] * tau ** 3
    return norm_cdf(poly)


def _ols(y: np.ndarray, X: np.ndarray) -> tuple[np.ndarray, float]:
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    return beta, ssr


def adfuller_tstat(x: np.ndarray, maxlag: int | None = None) -> float:
    """The ADF tau test statistic itself — the value tsfresh's
    augmented_dickey_fuller feature returns (statsmodels adfuller(x)[0]
    with the Schwert-rule default maxlag ceil(12·(n/100)^(1/4)), capped
    at n//2 - 2; both reference baseline series pin it to ~1e-9)."""
    n = int(np.asarray(x).size)
    if maxlag is None:
        maxlag = int(math.ceil(12.0 * (n / 100.0) ** 0.25))
        maxlag = max(0, min(n // 2 - 2, maxlag))
    tau = _adf_tau(x, maxlag)
    return tau if tau is not None else 0.0


def adfuller_pvalue(x: np.ndarray, maxlag: int = 10) -> float:
    """ADF unit-root test p-value, mirroring
    ``statsmodels.tsa.stattools.adfuller(x, maxlag)`` defaults
    (regression='c', autolag='AIC').

    Lag is chosen by AIC over 0..maxlag on a common sample (the last
    ``len(diff(x)) - maxlag`` observations), then the test regression is
    refit at the chosen lag on its full sample; p-value via MacKinnon.
    """
    tau = _adf_tau(x, maxlag)
    if tau is None:
        return 1.0
    return mackinnon_pvalue(tau)


def _adf_tau(x: np.ndarray, maxlag: int = 10) -> float | None:
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < maxlag + 10:
        maxlag = max(0, min(maxlag, n - 10))
    xdiff = np.diff(x)
    ndiff = xdiff.size
    if ndiff - maxlag < 5:
        maxlag = max(0, ndiff - 5)

    def design(lag: int, offset: int) -> tuple[np.ndarray, np.ndarray]:
        # y[i] = xdiff[offset + i]; regressors: level x[offset+i],
        # xdiff lags 1..lag, constant
        y = xdiff[offset:]
        m = y.size
        cols = [x[offset:offset + m]]
        for j in range(1, lag + 1):
            cols.append(xdiff[offset - j:offset - j + m])
        cols.append(np.ones(m))
        return y, np.column_stack(cols)

    # autolag: fixed sample at offset=maxlag
    best_lag, best_aic = 0, np.inf
    for lag in range(0, maxlag + 1):
        y, X = design(lag, maxlag)
        if y.size <= X.shape[1]:
            continue
        _, ssr = _ols(y, X)
        m = y.size
        if ssr <= 0:
            ssr = 1e-300
        llf = -m / 2.0 * (1.0 + math.log(2.0 * math.pi) + math.log(ssr / m))
        aic = -2.0 * llf + 2.0 * X.shape[1]
        if aic < best_aic:
            best_aic, best_lag = aic, lag

    # refit at chosen lag on full sample
    y, X = design(best_lag, best_lag)
    m = y.size
    k = X.shape[1]
    if m <= k:
        return None
    beta, ssr = _ols(y, X)
    sigma2 = ssr / (m - k)
    xtx_inv = np.linalg.pinv(X.T @ X)
    se0 = math.sqrt(max(sigma2 * xtx_inv[0, 0], 1e-300))
    return float(beta[0] / se0)
