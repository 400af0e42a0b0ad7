"""CUSTOM_ALGORITHMS — the reference's extensibility surface (§2.10).

Reference: skyline/analyzer/algorithms.py:1513-1724 (run_before/after
three-sigma, consensus override, run_3sigma_algorithms suppression);
loader skyline/custom_algorithms_to_run.py; 37 shipped algorithms in
skyline/custom_algorithms/.

Spark shape: a registry of python callables applied inside the same
applyInPandas group pass — signature
``fn(ts: np.ndarray, values: np.ndarray, params: dict) ->
(bool | None, float | None)`` returning (anomalous, anomaly_score).
No JVM UDAF needed.

Semantics implemented (the exercised subset of the reference's knobs):
- ``run_before_3sigma``: custom algorithms run first; with
  ``consensus_override=True`` (reference ``'consensus': 1``) a True
  result decides the verdict by itself and, when
  ``run_3sigma_algorithms=False``, suppresses the 9-algorithm suite
  entirely (algorithms.py:1689-1724);
- otherwise custom results are appended to the ensemble and counted in
  the ordinary CONSENSUS vote (threshold stays len(ensemble) -
  CONSENSUS, algorithms.py:2000-2016);
- ``use_with`` namespace pattern restricts which series run it.

Three shipped examples mirror reference custom algorithms
(skyline/custom_algorithms/): sigma (k-sigma last point), level_shift
(median shift between window halves vs MAD), iqr_outlier.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class CustomAlgorithm:
    name: str
    fn: Callable[[np.ndarray, np.ndarray, dict], tuple[bool | None, float | None]]
    params: dict = field(default_factory=dict)
    consensus_override: bool = False    # reference 'consensus': 1
    run_before_3sigma: bool = True
    run_3sigma_algorithms: bool = True  # False -> custom-only ensemble
    # post-3sigma only: skip unless the three-sigma suite already reached
    # CONSENSUS True votes (algorithms.py:1863-1879) — the expensive-
    # confirmation pattern (e.g. matrixprofile after the cheap suite)
    run_only_if_consensus: bool = False
    use_with: str | None = None         # substring namespace restriction

    def applies_to(self, metric: str | None) -> bool:
        if self.use_with is None or metric is None:
            return True
        return self.use_with in metric


# --- shipped examples ------------------------------------------------------

def sigma(ts: np.ndarray, values: np.ndarray, params: dict):
    """k-sigma on the last point (cf. skyline/custom_algorithms/sigma.py
    semantics: |v_last - mean| > k * sample std)."""
    k = params.get("sigma_value", 3)
    s = pd.Series(values)
    std = float(s.std())
    if std == 0 or np.isnan(std):
        return False, 0.0
    score = abs(float(values[-1]) - float(s.mean())) / std
    return bool(score > k), float(score)


def level_shift(ts: np.ndarray, values: np.ndarray, params: dict):
    """Median level shift between the two halves of the tail window vs
    the MAD of the head (cf. skyline/custom_algorithms/
    adtk_level_shift.py intent)."""
    w = params.get("window", 10)
    if values.size < 3 * w:
        return None, None
    head = values[:-2 * w]
    a = np.median(values[-2 * w:-w])
    b = np.median(values[-w:])
    med = np.median(head)
    mad = np.median(np.abs(head - med))
    if mad == 0:
        return False, 0.0
    score = abs(b - a) / mad
    return bool(score > params.get("factor", 6.0)), float(score)


def iqr_outlier(ts: np.ndarray, values: np.ndarray, params: dict):
    """Tukey-fence outlier on the last point."""
    k = params.get("k", 3.0)
    q1, q3 = np.percentile(values, [25, 75])
    iqr = q3 - q1
    if iqr == 0:
        return False, 0.0
    v = float(values[-1])
    score = max(q1 - v, v - q3) / iqr
    return bool(score > k), float(score)


SHIPPED = {"sigma": sigma, "level_shift": level_shift,
           "iqr_outlier": iqr_outlier}
