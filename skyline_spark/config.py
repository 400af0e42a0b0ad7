"""Pipeline configuration mirroring the reference's settings contract.

Reference: skyline/settings.py — FULL_DURATION (:102), STALE_PERIOD (:497),
MIN_TOLERABLE_LENGTH (:541), MAX_TOLERABLE_BOREDOM (:559),
BOREDOM_SET_SIZE (:569), ALGORITHMS (:820-836), CONSENSUS (:838),
RUN_OPTIMIZED_WORKFLOW (:1063).

Wall-clock independence: everywhere the reference uses ``time()`` (Stale
check, analyzer ks_test windows) we use ``now`` = max(ts) of the batch, as
the mirage variants do (skyline/mirage/mirage_algorithms.py:491-512), so
results are a pure function of the input table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: The 9 three-sigma algorithms in the reference's configured order
#: (skyline/settings.py:820-836). Order matters: the consensus early-exit
#: skips trailing algorithms once too many have voted False, padding the
#: ensemble with None (skyline/analyzer/algorithms.py:1781-1815).
ALGORITHMS: tuple[str, ...] = (
    "histogram_bins",
    "first_hour_average",
    "stddev_from_average",
    "grubbs",
    "ks_test",
    "mean_subtraction_cumulation",
    "median_absolute_deviation",
    "stddev_from_moving_average",
    "least_squares",
)


@dataclass(frozen=True)
class PipelineConfig:
    # analysis window per series (skyline/settings.py:102)
    full_duration: int = 86400
    # series with no point in the last stale_period seconds (vs batch max
    # ts) raise Stale (skyline/settings.py:497)
    stale_period: int = 500
    # series shorter than this raise TooShort (skyline/settings.py:541)
    min_tolerable_length: int = 100
    # tail window for the Boring check (skyline/settings.py:559)
    max_tolerable_boredom: int = 100
    # distinct-count that makes the tail boring (skyline/settings.py:569)
    boredom_set_size: int = 1
    # votes required for an anomaly (skyline/settings.py:838)
    consensus: int = 6
    # early-exit once consensus is impossible
    # (skyline/settings.py:1063; skyline/analyzer/algorithms.py:1472)
    run_optimized_workflow: bool = True
    # whether to report negative values for anomalous series
    # (skyline/analyzer/algorithms.py:1083-1110)
    run_negatives_present: bool = True
    algorithms: tuple[str, ...] = field(default=ALGORITHMS)
    # analyse_derivatives: auto-detect counter metrics from the data
    # (skyline/settings.py ANALYZE_DERIVATIVES analogue;
    # skyline/analyzer/analyzer.py:1470,1488)
    analyze_derivatives: bool = True
    # NON_DERIVATIVE_MONOTONIC_METRICS analogue: metric names never
    # auto-differenced even when strictly increasing
    non_derivative_metrics: tuple[str, ...] = ()
    # ANALYZER_MAD_LOW_PRIORITY_METRICS (skyline/settings.py:868,
    # docs/analyzer.rst:150-171): run a cheap mean-absolute-deviation
    # prefilter on the last N points of LOW-priority metrics (no smtp
    # alert setting) and skip the three-sigma suite when the last step
    # is inside the MAD. 0 disables; the reference recommends <= 15.
    mad_low_priority_n: int = 0
    # CUSTOM_ALGORITHMS registry entries
    # (skyline/analyzer/algorithms.py:1513-1724; see
    # skyline_spark.functions.custom_algorithms)
    custom_algorithms: tuple = ()

    @property
    def maximum_false_count(self) -> int:
        # skyline/analyzer/algorithms.py:1472
        return len(self.algorithms) - self.consensus + 1
