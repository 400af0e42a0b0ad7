"""Exception filters + ensemble loop + consensus vote — the core
per-series reduction of the reference analyzer.

Ref: skyline/analyzer/algorithms.py:1168 (run_selected_algorithm):
- exception filters: EmptyTimeseries / TooShort (:1289-1334), Stale
  (:1338-1343), Boring (:1346-1347) — evaluated before any algorithm and
  producing routing outputs, not errors;
- ensemble loop with tri-state results and the RUN_OPTIMIZED_WORKFLOW
  early exit: stop running algorithms once
  ``count(False) >= len(ALGORITHMS) - CONSENSUS + 1``; skipped algorithms
  contribute None (:1472, 1751-1815);
- vote: not anomalous if the ensemble is all-None; otherwise anomalous iff
  ``ensemble.count(False) <= len(ensemble) - CONSENSUS`` (:2000-2047);
- returned datapoint is the last value (:2047).

Wall-clock independence: ``now`` must be supplied by the caller (batch
max(ts)); the reference uses ``time()`` for the Stale check (:1338).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from skyline_spark.config import PipelineConfig
from skyline_spark.functions.algorithms import (
    ALGORITHM_FUNCS,
    negatives_present,
    tail_avg,
)


@dataclass
class Verdict:
    anomalous: bool
    ensemble: list[bool | None]
    algorithms_run: list[str]
    triggered: list[str]
    datapoint: float | None
    exception: str | None  # EmptyTimeseries | TooShort | Stale | Boring | None
    negatives_found: bool
    n_points: int
    last_ts: float | None
    #: waterfall-alert from_timestamp: the SECOND timestamp of the
    #: analyzed series (first has no value after nonNegativeDerivative),
    #: falling back to the first (analyzer.py:3958-3966)
    from_ts: float | None = None


def classify_exception(ts: np.ndarray, values: np.ndarray, now: float,
                       cfg: PipelineConfig,
                       custom_stale_period: float | None = None) -> str | None:
    """E1-E4 exception filters, in the reference's evaluation order.

    Ref: skyline/analyzer/algorithms.py:1289-1347. Order matters:
    Empty/TooShort, then Stale, then Boring.
    """
    n = values.size
    if n < cfg.min_tolerable_length:
        if n == 0:
            return "EmptyTimeseries"
        return "TooShort"
    stale_period = custom_stale_period if custom_stale_period else cfg.stale_period
    if now - ts[-1] > stale_period:
        return "Stale"
    tail = values[-cfg.max_tolerable_boredom:]
    if np.unique(tail).size == cfg.boredom_set_size:
        return "Boring"
    return None


def run_selected_algorithm(ts: np.ndarray, values: np.ndarray, now: float,
                           cfg: PipelineConfig,
                           custom_stale_period: float | None = None,
                           full_duration: int | None = None,
                           metric: str | None = None,
                           low_priority: bool = False) -> Verdict:
    """Run the exception filters, any configured custom algorithms
    (§2.10), the 9-algorithm suite with early exit, and the consensus
    vote for one (pre-sorted, deduplicated) series."""
    # ANALYZER_MAD_LOW_PRIORITY_METRICS prefilter
    # (skyline/analyzer/analyzer.py:3768-3793): for low-priority metrics
    # (no smtp alert setting), mean-absolute-deviation over the last N
    # points; when the last step |v[-2]-v[-1]| is inside the MAD the
    # whole suite (incl. exception classification — the reference skips
    # BEFORE run_selected_algorithm) is skipped as not-anomalous.
    # Sparse series (< N points) fall through to the normal path
    # (:3779-3780), as does n < 2 (the reference's IndexError -> except
    # -> check_for_anomalous=True).
    n_mad = getattr(cfg, "mad_low_priority_n", 0)
    if n_mad and low_priority and values.size >= max(n_mad, 2):
        tail = values[-n_mad:]
        mad = float(np.mean(np.abs(tail - np.mean(tail))))
        if abs(float(values[-2]) - float(values[-1])) < mad:
            return Verdict(
                anomalous=False, ensemble=[],
                algorithms_run=["mad_prefilter"], triggered=[],
                datapoint=float(values[-1]), exception=None,
                negatives_found=False, n_points=int(values.size),
                last_ts=float(ts[-1]),
                from_ts=float(ts[1] if ts.size > 1 else ts[0]),
            )
    exc = classify_exception(ts, values, now, cfg, custom_stale_period)
    if exc is not None:
        return Verdict(
            anomalous=False, ensemble=[], algorithms_run=[], triggered=[],
            datapoint=float(values[-1]) if values.size else None,
            exception=exc, negatives_found=False, n_points=int(values.size),
            last_ts=float(ts[-1]) if ts.size else None,
            from_ts=float(ts[1] if ts.size > 1 else ts[0]) if ts.size else None,
        )

    fd = full_duration if full_duration is not None else cfg.full_duration
    algorithms_run: list[str] = []
    triggered: list[str] = []

    # custom algorithms (skyline/analyzer/algorithms.py:1513-1724).
    # Reference semantics: custom results live in their OWN ensemble;
    # the vote runs over the three-sigma ensemble unless the suite was
    # suppressed (ensemble = final_ensemble, :1993-1998). A
    # consensus_override ('consensus': 1) True relaxes the threshold to
    # len(ensemble)-1 (:2000-2004); a consensus_override False forces
    # not-anomalous (custom_algorithm_not_anomalous veto, :1968-1975).
    customs = [c for c in getattr(cfg, "custom_algorithms", ())
               if c.applies_to(metric)]
    pre_customs = [c for c in customs if c.run_before_3sigma]
    post_customs = [c for c in customs if not c.run_before_3sigma]
    custom_ensemble: list[bool | None] = []
    custom_consensus_override = False
    custom_veto = False
    run_3sigma = True

    def _run_custom(c) -> bool | None:
        nonlocal custom_consensus_override, custom_veto
        try:
            result, _score = c.fn(ts, values, dict(c.params))
        except Exception:
            result = None
        algorithms_run.append(c.name)
        r = result if isinstance(result, bool) else None
        if r is True:
            triggered.append(c.name)
        if c.consensus_override:
            if r is True:
                custom_consensus_override = True
            elif r is False:
                custom_veto = True
        return r

    for c in pre_customs:
        custom_ensemble.append(_run_custom(c))
        if not c.run_3sigma_algorithms:
            run_3sigma = False

    ensemble: list[bool | None] = []
    consensus_possible = True
    if run_3sigma:
        for name in cfg.algorithms:
            if consensus_possible:
                try:
                    result = ALGORITHM_FUNCS[name](ts, values, full_duration=fd)
                except Exception:
                    # per-algorithm error swallowed -> None
                    # (skyline/analyzer/algorithms.py:768-803, 1766)
                    result = None
            else:
                result = None  # skipped, padded (:1781)
            algorithms_run.append(name)
            if result is True:
                ensemble.append(True)
                triggered.append(name)
            elif result is False:
                ensemble.append(False)
            else:
                ensemble.append(None)
            if cfg.run_optimized_workflow:
                if ensemble.count(False) >= cfg.maximum_false_count:
                    consensus_possible = False
    else:
        # suppressed suite -> the custom ensemble votes (:1996-1998)
        ensemble = list(custom_ensemble)

    # post-3sigma custom algorithms (algorithms.py:1855-1995): results
    # append to the SAME ensemble and count in the vote; with
    # run_only_if_consensus the algorithm is skipped entirely (not even
    # recorded in algorithms_run, :1868-1874) unless the three-sigma
    # suite already voted CONSENSUS Trues.
    for c in post_customs:
        if c.run_only_if_consensus and \
                ensemble.count(True) < cfg.consensus:
            continue
        ensemble.append(_run_custom(c))

    datapoint = float(values[-1])
    if ensemble.count(None) == len(ensemble):
        anomalous = False  # all-None guard (:2014-2016)
    else:
        if custom_consensus_override:
            threshold = len(ensemble) - 1  # :2000-2004
        else:
            threshold = len(ensemble) - cfg.consensus
        anomalous = ensemble.count(False) <= threshold
    if custom_veto:
        anomalous = False

    negatives_found = False
    if anomalous and cfg.run_negatives_present:
        negatives_found = negatives_present(ts, values)
    return Verdict(
        anomalous=anomalous, ensemble=ensemble, algorithms_run=algorithms_run,
        triggered=triggered, datapoint=datapoint, exception=None,
        negatives_found=negatives_found, n_points=int(values.size),
        last_ts=float(ts[-1]),
        from_ts=float(ts[1] if ts.size > 1 else ts[0]),
    )


def strictly_increasing_monotonicity(values: np.ndarray) -> bool:
    """T5 — detect counter metrics from the data itself.

    Ref: skyline/skyline_functions.py:1673-1708: needs >= 90 points, no
    negatives, not constant, nonzero tail sum, and all diffs >= 0.
    """
    if values.size < 90:
        return False
    if np.min(values) < 0.0:
        return False
    if np.unique(values).size == 1:
        return False
    if float(np.sum(values[1:])) == 0:
        return False
    return bool(np.all(np.diff(values) >= 0))


def preprocess_series(ts: np.ndarray, values: np.ndarray, now: float,
                      cfg: PipelineConfig, is_derivative: bool = False,
                      auto_detect_derivative: bool = False
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Per-series deterministic transforms T1-T4 in reference order:
    sort by ts (stable), dedup first-per-ts, retention trim to
    full_duration before `now`, then nonNegativeDerivative for counter
    metrics.

    Refs: sort skyline/skyline_functions.py:2631 (applied analyzer.py:2281);
    dedup-first-per-ts skyline/analyzer/analyzer.py:575-581, 2476-2481;
    trim skyline/horizon/roomba.py:300-307; nonNegativeDerivative
    skyline/skyline_functions.py:1643-1671 (delta per point, negative
    deltas dropped — counter resets).

    ``auto_detect_derivative``: the analyzer's analyse_derivatives path
    (skyline/analyzer/analyzer.py:1470,1488) — a metric not DECLARED
    derivative is still differenced when the data itself is strictly
    increasing monotonically (skyline_functions.py:1673-1708).
    """
    order = np.argsort(ts, kind="stable")
    ts, values = ts[order], values[order]
    keep = np.ones(ts.size, dtype=bool)
    if ts.size > 1:
        keep[1:] = ts[1:] != ts[:-1]  # first point per timestamp wins
    ts, values = ts[keep], values[keep]
    window = ts > (now - cfg.full_duration)
    ts, values = ts[window], values[window]
    if not is_derivative and auto_detect_derivative:
        is_derivative = strictly_increasing_monotonicity(values)
    if is_derivative and ts.size > 1:
        deltas = np.diff(values)
        keep = deltas >= 0
        ts, values = ts[1:][keep], deltas[keep]
    elif is_derivative:
        ts, values = ts[:0], values[:0]
    return ts, values
