"""ppscore-lite — the predictive power score on an own deterministic
1-D CART regressor, exact-parity-testable with no sklearn dependence.

Reference use: skyline/luminosity/cloudbursts.py:227-320 scores every
(cloudburst metric, candidate) pair with ``pps.matrix`` on a 2-column
frame and keeps pairs where either directed score exceeds 0.5, ranked
by the two scores' sum. The pps library's published formula
(8080labs/ppscore, regression task) is::

    model_mae  = mean over k folds of MAE(DecisionTreeRegressor)
    naive_mae  = MAE of the constant median predictor on the full frame
    ppscore    = 0 if model_mae > naive_mae else 1 - model_mae/naive_mae

with k = 4 (``cross_validation``) and sklearn's default fully-grown
tree. Two deliberate, documented determinizations:

- **the tree**: a fully grown 1-D CART with best-split thresholds at
  midpoints of adjacent unique x values partitions the line into one
  leaf per unique training x, so its prediction function is EXACTLY
  "mean y of the nearest unique training x, ties to the smaller x"
  (midpoint boundaries, ``<=`` goes left) — :func:`cart_1d_predict`
  implements that closed form directly (fixed-threshold enumeration,
  no recursive fit), pinned against a brute-force recursive CART in
  tests;
- **the shuffle**: pps shuffles rows with
  ``df.sample(frac=1, random_state=123)`` before unshuffled k-fold;
  that RNG permutation is plumbing with no ANSI analogue, so
  ppscore-lite folds over the given (chronological) order —
  :func:`kfold_blocks` is sklearn KFold's contiguous-block split
  (first n % k folds get one extra row).

Invalid cases mirror pps: fewer rows than folds -> 0 (``n_too_small``),
single-valued target -> 0 (``target_is_constant``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["cart_1d_predict", "kfold_blocks", "ppscore_1d"]


def cart_1d_predict(x_train: np.ndarray, y_train: np.ndarray,
                    x_test: np.ndarray) -> np.ndarray:
    """Prediction function of a fully grown 1-D CART regressor: mean y
    per unique training x, routed by the midpoint thresholds between
    adjacent unique x values (a test point exactly on a midpoint goes
    LEFT, sklearn's ``<= threshold`` convention)."""
    ux, inv = np.unique(x_train, return_inverse=True)
    sums = np.zeros(ux.size)
    cnts = np.zeros(ux.size)
    np.add.at(sums, inv, y_train.astype(np.float64))
    np.add.at(cnts, inv, 1.0)
    means = sums / cnts
    if ux.size == 1:
        return np.full(x_test.size, means[0])
    bounds = (ux[1:] + ux[:-1]) / 2.0
    idx = np.searchsorted(bounds, x_test, side="left")
    return means[idx]


def kfold_blocks(n: int, k: int) -> list[np.ndarray]:
    """sklearn KFold(shuffle=False) index blocks: contiguous, the first
    n % k folds one row longer."""
    base, rem = divmod(n, k)
    out = []
    start = 0
    for i in range(k):
        size = base + (1 if i < rem else 0)
        out.append(np.arange(start, start + size))
        start += size
    return out


def ppscore_1d(x: np.ndarray, y: np.ndarray, cv: int = 4
               ) -> tuple[float, str]:
    """Directed predictive power of x over y. Returns (score, case);
    case is 'ok', 'n_too_small' or 'target_is_constant'."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if n < cv:
        return 0.0, "n_too_small"
    if np.unique(y).size == 1:
        return 0.0, "target_is_constant"
    fold_maes = []
    for test_idx in kfold_blocks(n, cv):
        mask = np.ones(n, dtype=bool)
        mask[test_idx] = False
        pred = cart_1d_predict(x[mask], y[mask], x[test_idx])
        fold_maes.append(float(np.mean(np.abs(y[test_idx] - pred))))
    model_mae = float(np.mean(fold_maes))
    naive_mae = float(np.mean(np.abs(y - np.median(y))))
    if model_mae > naive_mae:
        return 0.0, "ok"
    return 1.0 - model_mae / naive_mae, "ok"
