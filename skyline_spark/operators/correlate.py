"""Luminosity (X1) — cross-correlate other series' windows around each
anomaly; report best-shift correlation coefficients above threshold.

Reference: skyline/luminosity/process_correlations.py:1073-1521 — for
each anomaly, the ±window of every other metric is cross-correlated
(luminol Correlator) and kept when coefficient >= 0.9 (:1335-1339).

Spark shape of ``luminosity_correlations`` (scale-safe — NO driver
collect, NO crossJoin; ``pearson_closest_matrix`` below is the one
exception in this module: it materializes the series×grid fill
lattice its semantics require via an explicit crossJoin):
1. each anomaly explodes to its <=3 coarse epoch buckets of width
   ``window_s``; facts carry the same bucket key, so candidate-window
   selection is ONE broadcast equi-join on the bucket (anomalies are
   anomaly-cardinality -> broadcastable) plus a range post-filter;
2. the selected rows are averaged onto the ``step_s`` alignment grid
   natively (groupBy, map-side combine);
3. per-(anomaly, candidate) bucket arrays are assembled with
   collect_list; the anomalous series' own arrays (target windows) come
   out of the same join and are broadcast-joined back — they never ride
   in a UDF closure;
4. one Arrow-batched mapInPandas computes the max-shift Pearson per
   pair (luminol Correlator semantics: best coefficient within
   ±max_shift).

At 100× anomaly cardinality every stage stays distributed: the only
broadcast sides are anomaly-cardinality, the shuffle keys are
(anomaly, candidate) pairs, and the Python stage sees one row per pair.
The simple zero-shift Pearson variant lives in queries.q_correlate
(F.corr, oracle-checked); this operator adds the shift search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds


def _bucketize(ts: np.ndarray, v: np.ndarray, step: int
               ) -> dict[int, float]:
    buckets: dict[int, list] = {}
    for t, x in zip(ts, v):
        buckets.setdefault(int(t // step), []).append(x)
    return {k: float(np.mean(xs)) for k, xs in buckets.items()}


def _shift_corr(a: dict[int, float], b: dict[int, float],
                max_shift_steps: int) -> tuple[float, int]:
    """Best Pearson coefficient over integer bucket shifts in
    [-max_shift_steps, +max_shift_steps] (luminol Correlator semantics:
    max cross-correlation within allowed shift) for two pre-bucketed
    series given as {bucket: mean} dicts."""
    best, best_shift = 0.0, 0
    for shift in range(-max_shift_steps, max_shift_steps + 1):
        keys = [k for k in a if (k + shift) in b]
        if len(keys) < 5:
            continue
        xa = np.array([a[k] for k in keys])
        xb = np.array([b[k + shift] for k in keys])
        if xa.std() == 0 or xb.std() == 0:
            continue
        r = float(np.corrcoef(xa, xb)[0, 1])
        if abs(r) > abs(best):
            best, best_shift = r, shift
    return best, best_shift


def max_shift_correlation(ts_a: np.ndarray, v_a: np.ndarray,
                          ts_b: np.ndarray, v_b: np.ndarray,
                          step: int, max_shift_steps: int
                          ) -> tuple[float, int]:
    """Raw-array form of the shift search (bucketize then _shift_corr)."""
    return _shift_corr(_bucketize(ts_a, v_a, step),
                       _bucketize(ts_b, v_b, step), max_shift_steps)


def _find_first_bigger(ts: np.ndarray, target: float) -> int:
    """luminol's exact Correlator._find_first_bigger: a binary search
    that returns the LAST PROBED position, which is the first index
    whose value exceeds ``target`` only when the final probe landed on
    the > side — otherwise it is that index minus one (and 0, falsy,
    when the final probe was position 0).  Reproduced quirk-for-quirk
    because the sweep bounds (and the all-within-max_shift fallback,
    where this returns ~n-1) depend on it."""
    lower, upper = 0, int(ts.size)
    pos = 0
    while lower < upper:
        pos = lower + (upper - lower) // 2
        if ts[pos] > target:
            upper = pos
        else:
            lower = pos + 1
    return pos


def luminol_cross_correlation(ts_a: np.ndarray, v_a: np.ndarray,
                              ts_b: np.ndarray, v_b: np.ndarray,
                              max_shift_seconds: int = 60,
                              shift_impact: float = 0.05
                              ) -> tuple[float, int, float]:
    """The luminol DefaultCorrelator cross-correlation (the library the
    reference's process_correlations.py:1327 drives; the algorithm is
    public — LinkedIn luminol, correlator_algorithms/default_correlator):

    - both series normalized by their own maximum;
    - mean/std computed ONCE over the aligned arrays; every delay's
      coefficient is Σ (a_i - ā)(b_{i+d} - b̄) / (n·σa·σb) with the FULL-n
      denominator, so partial overlap inherently discounts large shifts
      (unlike a per-overlap Pearson, which re-normalizes);
    - for NEGATIVE delays luminol indexes ``b_values[i + delay]`` with a
      plain Python list, so indices below zero WRAP to the array tail
      (no IndexError) and those wrap-around products are included in the
      sum; only i + delay >= n (positive delays) raises and is dropped —
      replicated here via the split dot products;
    - the sweep bounds come from luminol's ``_find_first_bigger`` binary
      search (replicated above, quirks included): when some offset
      exceeds ``max_shift_seconds`` the sweep is ±that index (upper
      bound exclusive); when NO offset exceeds it the search returns
      ~n-1 and the sweep covers ±(n-1); a falsy 0 result degrades to the
      single delay 0;
    - ``shifted_coefficient`` additionally applies the linear
      shift-impact discount r·(1 - shift_impact·|Δt|/max_shift).

    Returns (coefficient, shift_seconds, shifted_coefficient) of the
    max-coefficient delay (max by VALUE, not absolute value — luminol
    correlates positively; ties keep the earliest delay in sweep order).
    Alignment: intersection of timestamps (the analyzer feeds series on
    a shared resolution grid, where luminol's union-align is the
    identity).
    """
    common, ia, ib = np.intersect1d(ts_a, ts_b, return_indices=True)
    if common.size < 2:
        return 0.0, 0, 0.0
    a = v_a[ia].astype(np.float64)
    b = v_b[ib].astype(np.float64)
    if a.max() != 0:
        a = a / a.max()
    if b.max() != 0:
        b = b / b.max()
    n = a.size
    a0, b0 = a - a.mean(), b - b.mean()
    denom = float(a.std() * b.std() * n)  # population std, fixed n
    allowed = _find_first_bigger(common - common[0], max_shift_seconds)
    lo, hi = (-allowed, allowed) if allowed else (0, 1)
    best = None  # (coefficient, shift_seconds)
    best_shifted = None
    for delay in range(lo, hi):
        dsec = float(common[abs(delay)] - common[0])
        if delay < 0:
            dsec = -dsec
        if delay >= 0:
            s = float(np.dot(a0[:n - delay], b0[delay:]))
        else:
            # wrap-around terms: i + delay < 0 hits b0 from the tail
            s = float(np.dot(a0[-delay:], b0[:n + delay])
                      + np.dot(a0[:-delay], b0[n + delay:]))
        r = s / denom if denom != 0 else s
        shifted = r * (1.0 - shift_impact * abs(dsec) / max_shift_seconds) \
            if max_shift_seconds else r
        if best is None or r > best[0]:
            best = (r, int(dsec))
        if best_shifted is None or shifted > best_shifted:
            best_shifted = shifted
    return best[0], best[1], best_shifted


def luminosity_correlations(parsed: DataFrame, anomalies: DataFrame,
                            window_s: int = 1200, step_s: int = 60,
                            max_shift_s: int = 120,
                            threshold: float = 0.9,
                            mode: str = "pearson_shift") -> DataFrame:
    """For each anomaly row (conv_id, last_ts), correlate every other
    series' ±window against the anomalous series' window.

    ``mode``: 'pearson_shift' (max |Pearson| over bucket shifts, the
    fast default) or 'luminol' (luminol-DefaultCorrelator fidelity:
    fixed-denominator cross-correlation, normalize-by-max, threshold on
    the signed coefficient, plus a shifted_coefficient column —
    process_correlations.py:1324-1342 semantics)."""
    anoms = anomalies.select(F.col("conv_id").alias("anom_conv"),
                             F.col("last_ts").cast("double").alias("anom_ts"))
    # each anomaly covers <= 3 coarse buckets of width window_s
    anoms_b = anoms.withColumn(
        "cb", F.explode(F.sequence(
            F.floor((F.col("anom_ts") - window_s) / window_s).cast("long"),
            F.floor((F.col("anom_ts") + window_s) / window_s).cast("long"))))

    te = epoch_seconds(F.col("ts"))
    base = (parsed.where(F.col("value").isNotNull())
            .select("conv_id", te.alias("te"), "value")
            .withColumn("cb", F.floor(F.col("te") / window_s).cast("long")))

    # candidate-window selection: broadcast equi-join on the coarse
    # bucket (pushes down to an exact hash probe), range post-filter
    hits = base.join(F.broadcast(anoms_b), "cb").where(
        (F.col("te") >= F.col("anom_ts") - window_s)
        & (F.col("te") <= F.col("anom_ts") + window_s))

    # step-grid means (the Correlator's time-alignment grid), native
    stepb = hits.groupBy(
        "anom_conv", "anom_ts", "conv_id",
        F.floor(F.col("te") / step_s).cast("long").alias("sb")
    ).agg(F.avg("value").alias("v"))
    arrs = stepb.groupBy("anom_conv", "anom_ts", "conv_id").agg(
        F.array_sort(F.collect_list(F.struct("sb", "v"))).alias("pv"))

    # the anomalous series' own window = the target; anomaly-cardinality
    # -> broadcast back onto its candidates (never a closure)
    targets = arrs.where(F.col("conv_id") == F.col("anom_conv")).select(
        "anom_conv", "anom_ts", F.col("pv").alias("tpv"))
    cands = arrs.where(F.col("conv_id") != F.col("anom_conv"))
    joined = cands.join(F.broadcast(targets), ["anom_conv", "anom_ts"])

    max_steps = max_shift_s // step_s

    def corr_rows(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                a = {int(p["sb"]): float(p["v"]) for p in r.tpv}
                if len(a) < 5:
                    continue
                b = {int(p["sb"]): float(p["v"]) for p in r.pv}
                coef, shift = _shift_corr(a, b, max_steps)
                out.append((r.anom_conv, float(r.anom_ts), r.conv_id,
                            round(coef, 6), shift * step_s))
            yield pd.DataFrame(out, columns=["anom_conv", "anom_ts",
                                             "cand_conv",
                                             "coefficient", "shift_seconds"])

    def luminol_rows(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if len(r.tpv) < 5:
                    continue
                ta = np.array([p["sb"] * step_s for p in r.tpv], dtype=float)
                va = np.array([p["v"] for p in r.tpv], dtype=float)
                tb = np.array([p["sb"] * step_s for p in r.pv], dtype=float)
                vb = np.array([p["v"] for p in r.pv], dtype=float)
                coef, shift, shifted = luminol_cross_correlation(
                    ta, va, tb, vb, max_shift_seconds=max_shift_s)
                out.append((r.anom_conv, float(r.anom_ts), r.conv_id,
                            round(coef, 6), int(shift), round(shifted, 6)))
            yield pd.DataFrame(out, columns=["anom_conv", "anom_ts",
                                             "cand_conv",
                                             "coefficient", "shift_seconds",
                                             "shifted_coefficient"])

    if mode == "luminol":
        out = joined.mapInPandas(
            luminol_rows,
            schema="anom_conv string, anom_ts double, cand_conv string, "
                   "coefficient double, "
                   "shift_seconds int, shifted_coefficient double")
        # is_correlated(threshold): the SIGNED coefficient clears the bar
        return out.where(F.col("coefficient") >= threshold)
    out = joined.mapInPandas(
        corr_rows,
        schema="anom_conv string, anom_ts double, cand_conv string, "
               "coefficient double, shift_seconds int")
    return out.where(F.abs(F.col("coefficient")) >= threshold)


def cross_correlation_relationships(correlations: DataFrame,
                                    minimum_correlations_count: int = 3,
                                    count_percentile: float = 95.0,
                                    decimal_unit: float | None = None
                                    ) -> DataFrame:
    """related_metrics — aggregate per-anomaly cross-correlations into
    per-(base, candidate) relationships.

    Reference: skyline/functions/luminosity/
    get_cross_correlation_relationships.py:33-245 and
    luminosity/related_metrics.py:512 — for a base metric, gather the
    stored cross-correlations of all its anomalies (the ``luminosity``
    MySQL table the ``correlations`` input stands in for), summarize
    each candidate metric as (correlation count, avg coefficient,
    Counter of shifts, avg shifted coefficient) (:129-137), then keep
    only candidates whose count reaches BOTH the
    ``count_percentile``-th percentile of the base's candidate counts
    (np.percentile linear interpolation, :180) and
    LUMINOSITY_RELATED_METRICS_MINIMUM_CORRELATIONS_COUNT (:193,
    settings.py:3994 default 3). The Redis id<->name hydration and
    drop-bookkeeping hashes (:99-128, :211-235) are lookup plumbing
    the DataFrame keys replace.

    ``shifted_counts`` renders the Counter canonically as
    ``shift:count`` pairs sorted by shift.

    Input contract: any ``luminosity_correlations`` output. The
    'luminol' mode carries ``shifted_coefficient``; the default
    'pearson_shift' mode does not (no shift-impact damping), so it is
    defaulted to ``coefficient`` here — the zero-damping identity —
    rather than failing on the missing column.

    ``decimal_unit``: when the input coefficients are quantized to a
    fixed decimal grid (the reference persists them as DECIMAL(6,5),
    skyline.sql:572-578 — our store queries quantize at 6 dp, unit
    1e-6), pass that unit and the averages are computed over exact
    integer sums of grid units. Integer sums are order-independent, so
    the resulting avg double is bit-identical across engines and
    partitionings — float sums can differ in the last ulp with
    aggregation order, and a 6-dp re-round of the average sits exactly
    on a rounding tie whenever the count divides a power of ten
    (cnt=4 made sum/4 end in ...x5 at 7 dp, which Spark's HALF_UP and
    DuckDB's scaled-multiply round broke differently).

    Scale: two aggregations on the same (base, cand) grouping — the
    shift-level pre-aggregate map-side combines, the percentile is a
    window over per-base candidate rows (candidate-cardinality, never
    raw correlation rows). No broadcast, no collect.
    """
    if "shifted_coefficient" not in correlations.columns:
        correlations = correlations.withColumn(
            "shifted_coefficient", F.col("coefficient"))
    if decimal_unit is not None:
        unit = F.lit(float(decimal_unit))
        c_sum = F.sum(F.round(F.col("coefficient") / unit).cast("long"))
        s_sum = F.sum(F.round(F.col("shifted_coefficient") / unit)
                      .cast("long"))
        def _avg(col: str) -> F.Column:
            # exact integer units end-to-end; one double division
            return (F.sum(col).cast("double") / F.sum("cnt")
                    * F.lit(float(decimal_unit)))
    else:
        c_sum = F.sum("coefficient")
        s_sum = F.sum("shifted_coefficient")
        def _avg(col: str) -> F.Column:
            return F.sum(col) / F.sum("cnt")
    per_shift = correlations.groupBy(
        "anom_conv", "cand_conv", "shift_seconds").agg(
        F.count("*").alias("cnt"),
        c_sum.alias("sum_coef"),
        s_sum.alias("sum_shifted"))
    per = per_shift.groupBy("anom_conv", "cand_conv").agg(
        F.sum("cnt").cast("long").alias("cross_correlations_count"),
        _avg("sum_coef").alias("avg_coefficient"),
        _avg("sum_shifted").alias("avg_shifted_coefficient"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("shift_seconds",
                                                     "cnt"))),
                lambda x: F.concat_ws(
                    ":", x.shift_seconds.cast("string"),
                    x.cnt.cast("string"))), ",").alias("shifted_counts"))
    frac = float(count_percentile) / 100.0
    pct = F.expr(f"percentile(cross_correlations_count, {frac!r}) "
                 "OVER (PARTITION BY anom_conv)")
    return (per.withColumn("__pct", pct)
            .where((F.col("cross_correlations_count") >= F.col("__pct"))
                   & (F.col("cross_correlations_count")
                      >= F.lit(int(minimum_correlations_count))))
            .select(F.col("anom_conv").alias("base_conv"), "cand_conv",
                    "cross_correlations_count", "avg_coefficient",
                    "shifted_counts", "avg_shifted_coefficient"))


def _ns_join(parts, length) -> F.Column:
    """'.'.join(elements[0:length]) — python slice semantics (shorter
    lists pass through whole; length 0 -> '')."""
    return F.array_join(F.slice(parts, F.lit(1), length), ".")


def related_metrics_confidence(rel: DataFrame, names: DataFrame,
                               minimum_correlations_count: int = 3,
                               min_count_percentile: float = 95.0
                               ) -> DataFrame:
    """related-metrics confidence read — the webapp read over the
    metric-group store that scores each stored relationship.

    Reference: skyline/functions/metrics/get_related_metrics.py:155-381
    — for a base metric's group (our ``rel`` rows =
    cross_correlation_relationships output standing in for the MySQL
    metric_group table):

    * group stats (:216-227): max_correlations = max of the per-related
      summed shifted counts (== cross_correlations_count),
      include_correlation_count = (max_correlations / 100) * percentile
      with the ladder percentile 40 -> 50 (max>20) -> 60 (max>50) ->
      70 (max>100), min_correlation_count = np.percentile(counts,
      LUMINOSITY_RELATED_METRICS_MIN_CORRELATION_COUNT_PERCENTILE)
      (settings.py:3982 default 95.0, linear interpolation);
    * namespace rollups (:201-214): distinct counts of the first 1 / 2
      / 3 dotted elements over the group's related metric names;
    * per-relation confidence (:320-360, the ``new_confidence`` branch
      — the hardcoded ``new_confidence = True`` at :321 makes it the
      only branch whose result is STORED; the legacy :383-534 block
      recomputes a local ``confidence`` that is never written back, so
      it is dead for the returned payload): base factor by count
      (0.7 under 8; 1 at/above min_correlation_count; 0.85 inside
      [int(icc), int(mcc)); the initial ``True`` — numerically 1 —
      otherwise) times avg_coefficient, then the namespace elif-ladder
      (first-degree/tertiary <=0.7 -> /0.7; secondary <=0.5 -> /0.7;
      out-of-namespace >=0.5 -> *0.7), the high-coefficient rescues
      and the low-volume down-weights, rounded to 5 dp.

    The labelled-metrics (`_tenant_id=`) re-derivation at :246-259 and
    the instance down-weight at :362-374 are Prometheus-label plumbing
    with no analogue in the dotted-name corpus — out of scope here.
    ``in list(range(int(a), int(b)))`` membership (:324) is kept
    bit-faithful: int counts in [int(a), int(b)), empty when b <= a.

    ``names`` maps conv_id -> dotted metric name (metrics dimension).
    Scale: one broadcast join on the metrics dimension, then windows
    over the base-metric partition (group-cardinality rows, never raw
    correlations). No collect.
    """
    from pyspark.sql import Window
    base_n = F.broadcast(names.select(
        F.col("conv_id").alias("base_conv"),
        F.col("metric").alias("base_metric")))
    cand_n = F.broadcast(names.select(
        F.col("conv_id").alias("cand_conv"),
        F.col("metric").alias("related_metric")))
    df = rel.join(base_n, "base_conv").join(cand_n, "cand_conv")

    bp = F.split("base_metric", r"\.")
    rp = F.split("related_metric", r"\.")
    df = df.withColumns({
        "b_sec": _ns_join(bp, F.lit(2)), "b_ter": _ns_join(bp, F.lit(3)),
        "b_fd": _ns_join(bp, F.size(bp) - 1),
        "r_pri": _ns_join(rp, F.lit(1)),
        "r_sec": _ns_join(rp, F.lit(2)), "r_ter": _ns_join(rp, F.lit(3)),
        "r_fd": _ns_join(rp, F.size(rp) - 1),
    })
    w = Window.partitionBy("base_conv")
    cc = F.col("cross_correlations_count")
    frac = float(min_count_percentile) / 100.0
    df = df.withColumns({
        "max_correlations": F.max(cc).over(w),
        "min_correlation_count": F.expr(
            f"percentile(cross_correlations_count, {frac!r})").over(w),
        "primary_namespaces": F.size(F.collect_set("r_pri").over(w)),
        "secondary_namespaces": F.size(F.collect_set("r_sec").over(w)),
        "tertiary_namespaces": F.size(F.collect_set("r_ter").over(w)),
    })
    ladder = (F.when(F.col("max_correlations") > 100, F.lit(70.0))
              .when(F.col("max_correlations") > 50, F.lit(60.0))
              .when(F.col("max_correlations") > 20, F.lit(50.0))
              .otherwise(F.lit(40.0)))
    df = df.withColumn(
        "include_correlation_count",
        F.col("max_correlations") / F.lit(100.0) * ladder)

    icc = F.col("include_correlation_count")
    mcc = F.col("min_correlation_count")
    avg = F.col("avg_coefficient")
    in_fd = F.col("r_fd") == F.col("b_fd")
    in_ter = F.col("r_ter") == F.col("b_ter")
    in_sec = F.col("r_sec") == F.col("b_sec")
    in_ns = in_fd | in_ter | in_sec

    # base factor: the LAST matching assignment in the reference's
    # sequential ifs wins (cc<8 over cc>=mcc over the range test); the
    # untouched initial ``True`` multiplies as 1
    nc1 = (F.when(cc < 8, F.lit(0.7))
           .when(cc >= mcc, F.lit(1.0))
           .when((cc >= F.floor(icc).cast("long"))
                 & (cc < F.floor(mcc).cast("long")), F.lit(0.85))
           .otherwise(F.lit(1.0))) * avg
    df = df.withColumn("__nc", nc1)
    nc = F.col("__nc")
    # namespace elif-ladder
    df = df.withColumn("__nc", F.when(
        in_fd | in_ter, F.when(nc <= 0.7, nc / 0.7).otherwise(nc))
        .when(in_sec, F.when(nc <= 0.5, nc / 0.7).otherwise(nc))
        .when(nc >= 0.5, nc * 0.7).otherwise(nc))
    # high-coefficient rescue above the include gate
    df = df.withColumn("__nc", F.when(
        (cc >= icc) & (nc <= 0.7) & (avg >= 0.95),
        F.when(~in_ns, avg * 0.9).otherwise(avg * 0.95)).otherwise(nc))
    # low-volume all-1s down-weight
    df = df.withColumn("__nc", F.when(
        (nc == 1.0) & (cc < mcc), avg * 0.95).otherwise(nc))
    df = df.withColumn("__nc", F.when(
        (nc >= 0.95) & (cc < icc), nc * 0.8).otherwise(nc))
    df = df.withColumn("__nc", F.when(
        cc < int(minimum_correlations_count), nc * 0.5).otherwise(nc))
    df = df.withColumn("__nc", F.when(
        (cc < 8) & ~in_ns, nc * 0.5).otherwise(nc))

    return df.select(
        "base_conv", "cand_conv", "base_metric", "related_metric",
        "cross_correlations_count", "avg_coefficient",
        F.round(nc, 5).alias("confidence"),
        in_ns.alias("in_namespace"),
        "primary_namespaces", "secondary_namespaces",
        "tertiary_namespaces",
        "max_correlations", "include_correlation_count",
        "min_correlation_count")


def pearson_closest_matrix(parsed: DataFrame, resolution: int,
                           targets: DataFrame | None = None,
                           min_aligned: int = 10) -> DataFrame:
    """pearson_closest — rank every candidate series by Pearson
    correlation against each target over a common aligned+filled grid.

    Reference: skyline/webapp/luminosity_pearson_closest.py:45-450
    (determine_pearson_closest) + skyline/functions/luminosity/
    pearson_closest.py:34-350. Semantics kept exactly:

    - every point floor-aligns to ``resolution`` and the LAST raw
      point of a bucket wins the dict overwrite
      (luminosity_pearson_closest.py:293-317);
    - the fill grid is the UNION of observed aligned timestamps across
      all metrics — the dense start..end lattice the reference builds
      at :301-308 is dead code, ``unique_aligned_timestamps`` is what
      the fill loop iterates (:320);
    - gaps and NaNs fill from the last PRESENT value, except the
      reference's falsy test ``if last_value:`` routes a last value of
      exactly 0.0 to the series' FIRST value instead (:325-335 —
      quirk kept);
    - pairs need >= 10 aligned points (pearson_closest.py:313-325,
      'too short' -> None) and >= 3 for the pandas min_periods corr;
      a zero-variance side yields a None coefficient like
      pandas' NaN;
    - ranking is by |cc| descending (luminosity_pearson_closest.py:
      386-413); None coefficients trail unranked. Dict-order ties are
      determinized by candidate name ascending.

    Scale: the fill is one window pass per series over the shared
    grid; the correlation is one equi-join on the grid timestamp +
    grouped covariance aggregates (never a UDF). Pass ``targets``
    (a small conv_id DataFrame, broadcast) for the production
    target-vs-population shape; the default all-targets matrix is the
    oracle/utilities surface (utilities_pearson_closest).
    """
    from pyspark.sql import Window

    te = epoch_seconds(F.col("ts"))
    at = (F.floor(te / resolution) * resolution).cast("long")
    cols = set(parsed.columns)
    order = (F.col("turn_idx") if "turn_idx" in cols
             else F.lit(0)).alias("__o")
    pts = parsed.where(F.col("value").isNotNull()).select(
        "conv_id", at.alias("at"), te.alias("te"), order, "value")
    wl = Window.partitionBy("conv_id", "at").orderBy(
        F.col("te").desc(), F.col("__o").desc())
    last_pt = (pts.withColumn("__rn", F.row_number().over(wl))
               .where(F.col("__rn") == 1).select("conv_id", "at", "value"))
    grid = last_pt.select("at").distinct()
    convs = last_pt.select("conv_id").distinct()
    lattice = convs.crossJoin(grid)  # series x grid: the filled matrix
    j = lattice.join(last_pt, ["conv_id", "at"], "left")
    wseq = Window.partitionBy("conv_id").orderBy("at")
    lkv = F.last("value", ignorenulls=True).over(
        wseq.rowsBetween(Window.unboundedPreceding, -1))
    fv = F.first("value", ignorenulls=True).over(
        wseq.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    filled = j.select(
        "conv_id", "at",
        F.coalesce(F.col("value"),
                   F.when(lkv != 0.0, lkv).otherwise(fv)).alias("v"))
    gn = grid.agg(F.count("*").alias("n_grid"))

    t = filled.select(F.col("conv_id").alias("target_conv"), "at",
                      F.col("v").alias("tv"))
    if targets is not None:
        t = t.join(F.broadcast(targets.select(
            F.col("conv_id").alias("target_conv")).distinct()),
            "target_conv")
    o = filled.select(F.col("conv_id").alias("cand_conv"), "at",
                      F.col("v").alias("ov"))
    r = F.try_divide(F.covar_samp("tv", "ov"),
                     F.stddev_samp("tv") * F.stddev_samp("ov"))
    stats = (t.join(o, "at")
             .groupBy("target_conv", "cand_conv")
             .agg(F.count("*").alias("n_aligned"), r.alias("cc")))
    out = (stats.crossJoin(F.broadcast(gn))
           .withColumn("cc", F.when(F.col("n_grid") >= min_aligned,
                                    F.col("cc")))
           .withColumn("pearson_cc", F.round("cc", 6) + F.lit(0.0))
           .withColumn("abs_pearson_cc",
                       F.round(F.abs(F.col("cc")), 6) + F.lit(0.0)))
    wr = Window.partitionBy("target_conv").orderBy(
        F.col("abs_pearson_cc").desc(), F.col("cand_conv").asc())
    rank = F.when(F.col("pearson_cc").isNotNull(),
                  F.row_number().over(wr))
    return out.select("target_conv", "cand_conv",
                      F.col("n_aligned").cast("int").alias("n_aligned"),
                      "pearson_cc", "abs_pearson_cc",
                      rank.cast("int").alias("rank"))


def correlate_or_relate_filter(pairs: DataFrame,
                               a_metric: str, b_metric: str,
                               correlate_namespaces_only: list[str]
                               | None = None,
                               correlation_maps: dict[str, list[str]]
                               | None = None,
                               correlate_all: bool = True) -> DataFrame:
    """correlate_or_relate_with as a native pair predicate
    (skyline/functions/metrics/correlate_or_relate_with.py:21-175):

    - with NO LUMINOSITY_CORRELATE_NAMESPACES_ONLY and NO
      LUMINOSITY_CORRELATION_MAPS, everything correlates iff
      LUMINOSITY_CORRELATE_ALL (:114-117; a falsy CORRELATE_ALL with no
      config falls through to False);
    - namespaces-only: a pair correlates when SOME listed pattern
      matches BOTH metrics under the matched_or_regexed_in_list
      semantics (:119-148 — absolute | substring | dotted-element
      subset | anchored regex, the same predicate the enrich dimension
      uses);
    - correlation maps: a pair correlates when both metrics appear in
      the SAME map (:150-165);
    - the two branches OR together (the reference falls through from
      the namespace loop into the map check).

    Scale: the config is settings-sized — the whole gate compiles to
    one literal boolean expression over the pair columns, no join, no
    Python. Applied BEFORE correlation storage, exactly where
    process_correlations consults it.
    """
    from skyline_spark.operators.enrich import _match_condition

    ns = list(correlate_namespaces_only or [])
    maps = dict(correlation_maps or {})
    if not ns and not maps:
        return pairs if correlate_all else pairs.where(F.lit(False))
    keep = F.lit(False)
    for p in ns:
        pat = F.lit(p)
        keep = keep | (_match_condition(F.col(a_metric), pat)
                       & _match_condition(F.col(b_metric), pat))
    for members in maps.values():
        arr = F.array(*[F.lit(m) for m in members])
        keep = keep | (F.array_contains(arr, F.col(a_metric))
                       & F.array_contains(arr, F.col(b_metric)))
    return pairs.where(keep)
