"""Repetitive-pattern learning — the ionosphere orchestration that
re-evaluates a metric's 30-day anomaly history and decides which
anomaly windows to learn (create LEARNT feature profiles from).

Reference parity:

- ``find_repetitive_patterns_flow`` re-expresses
  skyline/ionosphere/find_repetitive_patterns.py:155-689 (the
  per-metric evaluation: anomaly-history pruning -> per-anomaly 7-day
  window fetch -> conditional downsample -> length/sparse/boring gates
  -> features-profile sums -> pairwise percent-different comparison ->
  train decision -> same-period dedup -> generation assignment) as one
  composition of native DataFrame stages around the already-oracled
  feature kernel. The Redis/Graphite/plot/tmp-dir plumbing
  (find_repetitive_patterns.py:92-150, 281-343, 592-648) is the
  fetch/cache layer the Spark scan replaces; the MySQL
  ``get_anomalies_for_period``/``get_fps_for_metric`` reads become the
  ``anomalies``/``existing_fps`` input DataFrames.
- ``determine_repetitive_peaks`` ports
  skyline/functions/timeseries/determine_repetitive_peaks.py:9-150
  (quirks preserved, see the docstring) on pure numpy;
  ``repetitive_peaks`` runs it per series via one applyInPandas on the
  same per-series exchange as the analyze kernel.
- The hourly/daily alignment walk of
  skyline/ionosphere/learn_repetitive_patterns.py:88-136
  (``get_training_to_evaluate``) is ported as
  ``aligned_training_walk`` including its sorted-ascending quirk: the
  ``last < t + 3h`` guard is true for every iteration after the first,
  so at most the FIRST consecutive difference is ever counted and the
  ``aligned_count == count - 1`` gate is unreachable for the
  3-training-set minimum ``get_metrics_to_evaluate`` enforces — the
  walk is faithfully inert (pinned by test, not papered over).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "find_peaks_1d",
    "determine_repetitive_peaks",
    "repetitive_peaks",
    "aligned_training_walk",
    "find_repetitive_patterns_flow",
]


# ---------------------------------------------------------------------------
# determine_repetitive_peaks (functions/timeseries/determine_repetitive_peaks.py)
# ---------------------------------------------------------------------------

def find_peaks_1d(values: np.ndarray) -> list[int]:
    """Local maxima with plateau handling — the no-argument
    scipy.signal.find_peaks contract the reference calls at
    determine_repetitive_peaks.py:45: a peak is a sample strictly
    greater than its immediate neighbours; a flat plateau strictly
    above both edges reports its middle index (left + right) // 2.
    Edges of the series can never be peaks."""
    v = np.asarray(values, dtype=np.float64)
    n = v.size
    peaks: list[int] = []
    i = 1
    while i < n - 1:
        if v[i] > v[i - 1]:
            # walk the (possibly flat) plateau
            j = i
            while j < n - 1 and v[j + 1] == v[i]:
                j += 1
            if j < n - 1 and v[j + 1] < v[i]:
                peaks.append((i + j) // 2)
            i = j + 1
        else:
            i += 1
    return peaks


def determine_repetitive_peaks(
        values: np.ndarray, sigma: float = 2,
        min_period_steps: int = 3,
        min_repetitive_peaks_for_period: int = 5) -> dict:
    """determine_repetitive_peaks.py:9-150, quirk-for-quirk:

    - threshold = mean + sigma * std (nan-aware, :41-43);
    - candidate peaks need int-truncated zscore >= 1 AND value above
      the threshold (:57-61);
    - a (p, op) pair joins period ``op - p`` when op is a later
      above-threshold peak, the period is >= 3 steps, and p's
      int-zscore falls in [op_zscore - 2, op_zscore + 1] (the
      half-open ``range(oz - 2, oz + 2)``, :79-81);
    - the end-of-series augmentation (:106-112) re-checks the last
      three indices against EARLIER peaks with +-3-padded periods
      (``range(period - 3, period + 3)``);
    - the second padded augmentation block (:113-132) is guarded by
      ``len(...) < 0`` — dead code in the reference, reproduced here
      as a no-op;
    - periods with fewer than 5 pairs are dropped (:133-135, the
      hardcoded 5, not the min_repetitive_peaks_for_period argument —
      we keep the argument but default it to the same 5 the reference
      ignores its own parameter in favour of);
    - ``min_period_steps`` is likewise hardcoded to 3 at :74.
    """
    v = np.asarray(values, dtype=np.float64)
    out = {"peak_periods": {}, "repetitive_peak_indices": [], "peaks": []}
    if v.size == 0:
        return out
    mean_value = float(np.nanmean(v))
    std_dev = float(np.nanstd(v))
    threshold = mean_value + sigma * std_dev
    peaks = find_peaks_1d(v)
    out["peaks"] = peaks
    if std_dev == 0:
        # the reference would ZeroDivisionError on the zscore; a
        # constant series has no above-threshold peaks anyway
        return out

    peak_periods: dict[int, list[list[int]]] = {}
    for p in peaks:
        p_value = float(v[p])
        p_zscore = int((p_value - mean_value) / std_dev)
        if p_zscore < 1:
            continue
        if p_value < threshold:
            continue
        for op in peaks:
            if p == op or op < p:
                continue
            op_value = float(v[op])
            if op_value < threshold:
                continue
            period = int(op - p)
            if period < min_period_steps:
                continue
            op_zscore = int((op_value - mean_value) / std_dev)
            if op_zscore < 1:
                continue
            if p_zscore not in range(op_zscore - 2, op_zscore + 2):
                continue
            peak_periods.setdefault(period, [])
            if [p, op] not in peak_periods[period]:
                peak_periods[period].append([p, op])

    periods = list(peak_periods.keys())
    all_indices = sorted({i for prs in peak_periods.values()
                          for pair in prs for i in pair})
    n = v.size
    padded_periods = {per: list(range(per - 3, per + 3)) for per in periods}
    # end-of-series augmentation: the pair loop only looks FORWARD, so
    # final peaks are matched backwards against padded periods
    for index in (n - 3, n - 2, n - 1):
        if index in peaks and index not in all_indices:
            for pi in peaks:
                eval_period = index - pi
                for per, plist in padded_periods.items():
                    if eval_period in plist:
                        peak_periods[per].append([pi, index])
    # (:113-132) guarded by ``if len(peak_periods[period]) < 0`` — dead
    # in the reference; nothing to do.
    for per in periods:
        if len(peak_periods[per]) < min_repetitive_peaks_for_period:
            del peak_periods[per]
    rep: list[int] = []
    for per in peak_periods:
        for pair in peak_periods[per]:
            for idx in pair:
                if idx not in rep:
                    rep.append(idx)
    out["repetitive_peak_indices"] = sorted(rep)
    out["peak_periods"] = peak_periods
    return out


def repetitive_peaks(parsed: DataFrame, sigma: float = 2) -> DataFrame:
    """Per-series repetitive-peak summary — one applyInPandas on the
    standard per-series exchange (the loop-heavy pair/period logic is
    not ANSI-expressible; rows-only in the driver, pinned by the
    naive-twin property test)."""
    schema = ("conv_id string, metric string, n_points int, "
              "n_peaks int, n_repetitive_peaks int, "
              "repetitive_peak_epochs array<bigint>, "
              "periods array<int>")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__e", kind="stable")
        v = pdf["value"].to_numpy(np.float64)
        res = determine_repetitive_peaks(v, sigma=sigma)
        idx = res["repetitive_peak_indices"]
        eps = pdf["__e"].to_numpy()
        return pd.DataFrame([{
            "conv_id": pdf["conv_id"].iloc[0],
            "metric": pdf["metric"].iloc[0],
            "n_points": int(len(v)),
            "n_peaks": int(len(res["peaks"])),
            "n_repetitive_peaks": int(len(idx)),
            "repetitive_peak_epochs": [int(eps[i]) for i in idx],
            "periods": sorted(int(p) for p in res["peak_periods"]),
        }])

    proj = parsed.where(F.col("value").isNotNull()).select(
        "conv_id", "metric",
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("__e"),
        "value")
    return proj.groupBy("conv_id").applyInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# learn_repetitive_patterns alignment walk (learn_repetitive_patterns.py:88-136)
# ---------------------------------------------------------------------------

def aligned_training_walk(timestamps: list[int],
                          hourly_tolerance: int = 180,
                          daily_tolerance: int = 900) -> int:
    """The get_training_to_evaluate alignment counter, ported exactly.
    Returns aligned_count. Quirk (learn_repetitive_patterns.py:124-126):
    ``last_training_data_timestamp < t + 3 * 3600`` is true for EVERY
    ascending timestamp after the first iteration, so only the first
    consecutive difference is ever checked and aligned_count is at most
    1 — with the ``count > 2`` floor of get_metrics_to_evaluate the
    ``aligned_count == count - 1`` gate can never pass."""
    timestamps = sorted(timestamps)
    count = len(timestamps)
    aligned_count = 0
    last = None
    for index, t in enumerate(timestamps):
        if index == count - 1:
            break
        diff = timestamps[index + 1] - t
        if last is not None and last < t + (3600 * 3):
            last = t
            continue
        last = t
        if (86400 - daily_tolerance) <= diff < (86400 + daily_tolerance):
            aligned_count += 1
            continue
        if (3600 - hourly_tolerance) <= diff < (3600 + hourly_tolerance):
            aligned_count += 1
    return aligned_count


# ---------------------------------------------------------------------------
# find_repetitive_patterns (ionosphere/find_repetitive_patterns.py:155-689)
# ---------------------------------------------------------------------------

def _percent_different_col(base, compare):
    """Column twin of functions/numpy/percent_different.py (see
    operators/motifs.get_percent_different): both-zero -> 0, zero
    base -> NULL (the caller's ``float(None)`` TypeError aborts the
    whole metric in the reference — surfaced as comparison_error),
    always positive."""
    return (F.when((base == 0) & (compare == 0), F.lit(0.0))
            .when(base == 0, F.lit(None).cast("double"))
            .otherwise(F.abs((compare - base) / base * 100.0)))


def find_repetitive_patterns_flow(
        parsed: DataFrame, anomalies: DataFrame, existing_fps: DataFrame,
        feature_sums_fn, *,
        window_seconds: int = 604800,
        downsample_to: int = 600,
        min_use_len: int = 360,
        sparse_len: int = 800,
        edge_tolerance: int = 7200,
        full_duration_floor: int = 604800 - 3600,
        max_tolerable_boredom: int = 100,
        boredom_set_size: int = 1,
        exclude_algorithms: tuple = (
            "decreased_percent_with_increasing_pair",),
        untrainable: tuple = (),
        namespace_excludes: tuple = (),
        similar_pct: float = 2.0,
        avg_pct: float = 4.0,
        dedup_seconds: int = 3600 * 169,
        sum_decimals: int | None = None) -> DataFrame:
    """The full find_repetitive_patterns evaluation, batched over every
    metric at once (the reference runs one metric per invocation;
    semantics per metric are identical with the parent anomaly = the
    metric's latest ionosphere/mirage anomaly).

    Inputs:

    - ``parsed``: the validated series points (conv_id, metric, ts,
      value) — the Graphite/VictoriaMetrics fetch stand-in.
    - ``anomalies``: (conv_id, metric, anomaly_e bigint,
      full_duration bigint, triggered array<string>, app string) — the
      get_anomalies_for_period read (find_repetitive_patterns.py:184).
    - ``existing_fps``: (conv_id, fp_e bigint, enabled boolean) — the
      get_fps_for_metric read (:226).
    - ``feature_sums_fn``: callable(DataFrame with composite conv_id,
      ts, value) -> DataFrame(conv_id, features_sum) — the
      calculate_features_profile stand-in (the oracled feature kernel).

    Output: one row per anomaly with the full decision surface —
    ``stage`` names the gate that removed it ('namespace_excluded',
    'untrainable', 'not_processed', 'excluded_algorithm',
    'insufficient_anomalies', 'trained_period', 'short_full_duration',
    'too_short', 'sparse_skipped', 'boring', 'sparse_below_avg',
    'comparison_error' or 'compared'), plus per-compared features_sum /
    similar_count / selected / deduped / generation and the per-metric
    train / train_on_avg / avg_percent_different.

    Scale notes: every stage is keyed on conv_id (the series key) —
    window extraction joins the anomaly dimension to the points table
    on conv_id and rides the same per-series exchange as the analyze
    kernel; the pairwise comparison self-join is on conv_id with <=
    a-few-anomalies-per-metric cardinality; no collects, no windows
    without PARTITION BY.
    """
    from skyline_spark.operators.preprocess import determine_data_frequency

    an = anomalies.select(
        "conv_id", "metric",
        F.col("anomaly_e").cast("long").alias("anomaly_e"),
        F.col("full_duration").cast("long").alias("full_duration"),
        "triggered", "app")

    # --- S0: namespace / untrainable / parent-app gates -----------------
    ns_excluded = F.lit(False)
    for pat in namespace_excludes:
        ns_excluded = ns_excluded | F.col("metric").startswith(pat)
    an = an.withColumn("__ns_excluded", ns_excluded)
    an = an.withColumn(
        "__untrainable",
        F.col("metric").isin(*untrainable) if untrainable else F.lit(False))
    wconv = Window.partitionBy("conv_id")
    # parent = the latest anomaly; processed only when its app is
    # ionosphere/mirage (the outer loop's app filter,
    # find_repetitive_patterns.py:877-883)
    an = an.withColumn("__max_e", F.max("anomaly_e").over(wconv))
    parent_ok = F.max(
        F.when((F.col("anomaly_e") == F.col("__max_e"))
               & F.col("app").isin("ionosphere", "mirage"), 1)
        .otherwise(0)).over(wconv) == 1
    an = an.withColumn("__parent_ok", parent_ok)

    # --- S1: excluded-algorithm anomaly removal (:190-213) --------------
    excl = F.lit(False)
    for a in exclude_algorithms:
        excl = excl | F.array_contains(F.col("triggered"), a)
    an = an.withColumn("__alg_excluded", excl)

    # --- S2: < 3 anomalies after exclusions (:215-218) -------------------
    live0 = (~F.col("__ns_excluded") & ~F.col("__untrainable")
             & F.col("__parent_ok") & ~F.col("__alg_excluded"))
    an = an.withColumn(
        "__n_after_excl",
        F.sum(F.when(live0, 1).otherwise(0)).over(wconv))

    # --- S3: trained-period removal (:224-253): anomaly inside
    # (fp_e - 86400, fp_e + 14400) of an ENABLED profile ------------------
    fps = (existing_fps.where(F.col("enabled"))
           .select("conv_id", F.col("fp_e").cast("long").alias("fp_e"))
           .distinct())
    trained = (an.join(fps, "conv_id")
               .where((F.col("anomaly_e") > F.col("fp_e") - 86400)
                      & (F.col("anomaly_e") < F.col("fp_e") + 14400))
               .select("conv_id", "anomaly_e").distinct()
               .withColumn("__trained", F.lit(True)))
    an = an.join(trained, ["conv_id", "anomaly_e"], "left") \
           .withColumn("__trained", F.coalesce("__trained", F.lit(False)))

    # --- S4: full_duration gate (:262-263) -------------------------------
    an = an.withColumn("__short_fd",
                       F.col("full_duration") < full_duration_floor)

    stage0 = (F.when(F.col("__ns_excluded"), "namespace_excluded")
              .when(F.col("__untrainable"), "untrainable")
              .when(~F.col("__parent_ok"), "not_processed")
              .when(F.col("__alg_excluded"), "excluded_algorithm")
              .when(F.col("__n_after_excl") < 3, "insufficient_anomalies")
              .when(F.col("__trained"), "trained_period")
              .when(F.col("__short_fd"), "short_full_duration"))
    an = an.withColumn("__stage0", stage0)

    # --- S5: per-anomaly window -> resolution -> conditional downsample
    # -> length/sparse/boring gates (:276-372) ----------------------------
    eligible = an.where(F.col("__stage0").isNull()) \
                 .select("conv_id", "anomaly_e")
    pts = parsed.where(F.col("value").isNotNull()).select(
        "conv_id",
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("e"),
        "value")
    win = (pts.join(eligible, "conv_id")
           .where((F.col("e") > F.col("anomaly_e") - window_seconds)
                  & (F.col("e") <= F.col("anomaly_e"))))
    freq = determine_data_frequency(
        win.withColumn("ts", F.col("e").cast("timestamp")),
        key_cols=("conv_id", "anomaly_e")) \
        .select("conv_id", "anomaly_e",
                F.col("metric_resolution").alias("res"))
    wwin = Window.partitionBy("conv_id", "anomaly_e")
    # backward resample anchored at the window's last point
    # (downsample_timeseries origin='end', right-closed buckets labelled
    # by their right edge); identity bucket when already coarse enough.
    # The bucket mean matches the pandas path bit-for-bit only when one
    # point lands per bucket (the live case at the engine's cadence —
    # per-window resolution is >= 25 min on the corpora); the dense
    # branch is pinned by the pandas-resample parity test.
    wd = (win.join(freq, ["conv_id", "anomaly_e"], "left")
          .withColumn("__last", F.max("e").over(wwin))
          .withColumn(
              "bucket",
              F.when(F.col("res") < downsample_to,
                     F.col("e") + (F.col("__last") - F.col("e"))
                     % downsample_to)
              .otherwise(F.col("e")))
          .groupBy("conv_id", "anomaly_e", "bucket")
          .agg(F.avg("value").alias("value")))
    stats = wd.groupBy("conv_id", "anomaly_e").agg(
        F.count(F.lit(1)).alias("w_n"),
        F.min("bucket").alias("w_first"),
        F.max("bucket").alias("w_last"))
    # boring tail: last max_tolerable_boredom values' distinct count
    wtail = Window.partitionBy("conv_id", "anomaly_e") \
                  .orderBy(F.col("bucket").desc())
    boring = (wd.withColumn("__rn", F.row_number().over(wtail))
              .where(F.col("__rn") <= max_tolerable_boredom)
              .groupBy("conv_id", "anomaly_e")
              .agg((F.countDistinct("value") == boredom_set_size)
                   .alias("__boring")))
    gates = stats.join(boring, ["conv_id", "anomaly_e"])
    from_e = F.col("anomaly_e") - window_seconds
    sparse_q = ((F.col("w_n") < sparse_len)
                & (F.col("w_first") < from_e + edge_tolerance)
                & (F.col("w_last") > F.col("anomaly_e") - edge_tolerance))
    gates = gates.withColumn("__sparse", sparse_q)
    stage5 = (F.when(F.col("w_n") < min_use_len, "too_short")
              .when((F.col("w_n") < sparse_len) & ~F.col("__sparse"),
                    "sparse_skipped")
              .when(F.col("__boring"), "boring"))
    gates = gates.withColumn("__stage5", stage5)

    # --- S7: sparse below-average removal (:435-455) ---------------------
    # avg over every sparse-QUALIFIED window (recorded before the boring
    # gate), int-truncated, minus int-truncated 10%
    wconv2 = Window.partitionBy("conv_id")
    sparse_avg = F.floor(
        F.avg(F.when(F.col("__sparse"), F.col("w_n"))).over(wconv2))
    gates = gates.withColumn("__savg", sparse_avg)
    gates = gates.withColumn(
        "__sthresh", F.col("__savg") - F.floor(F.col("__savg") * 0.1))
    below = (F.col("__sparse") & F.col("__stage5").isNull()
             & (F.col("w_n") < F.col("__sthresh")))
    gates = gates.withColumn(
        "__stage57",
        F.coalesce(F.col("__stage5"),
                   F.when(below, "sparse_below_avg")))

    # --- S6: feature sums on surviving windows ---------------------------
    surviving = gates.where(F.col("__stage57").isNull()) \
                     .select("conv_id", "anomaly_e")
    fp_in = (wd.join(surviving, ["conv_id", "anomaly_e"])
             .select(F.concat_ws("#", F.col("conv_id"),
                                 F.col("anomaly_e")).alias("conv_id"),
                     F.col("bucket").cast("timestamp").alias("ts"),
                     "value"))
    sums = feature_sums_fn(fp_in).select(
        F.split(F.col("conv_id"), "#").getItem(0).alias("conv_id"),
        F.split(F.col("conv_id"), "#").getItem(1).cast("long")
        .alias("anomaly_e"),
        "features_sum")
    if sum_decimals is not None:
        sums = sums.withColumn(
            "features_sum",
            F.round("features_sum", sum_decimals) + F.lit(0.0))

    # --- S8: pairwise comparison (:465-548) -------------------------------
    a_ = sums.select("conv_id", F.col("anomaly_e").alias("t"),
                     F.col("features_sum").alias("fs_t"))
    b_ = sums.select("conv_id", F.col("anomaly_e").alias("it"),
                     F.col("features_sum").alias("fs_it"))
    pairs = (a_.join(b_, "conv_id")
             .where(F.col("t") != F.col("it"))
             # skip pairs inside the same week (:487-495)
             .where(~(((F.col("it") > F.col("t"))
                       & (F.col("t") + window_seconds > F.col("it")))
                      | ((F.col("it") < F.col("t"))
                         & (F.col("it") > F.col("t") - window_seconds)))))
    pairs = pairs.withColumn(
        "pd", _percent_different_col(F.col("fs_t"), F.col("fs_it")))
    per_t = pairs.groupBy("conv_id", "t").agg(
        F.sum(F.when(F.col("pd") <= similar_pct, 1).otherwise(0))
        .alias("similar_count"),
        F.sum(F.when(F.col("pd").isNull(), 1).otherwise(0))
        .alias("null_pds"))
    # training timestamps: every t with similar_count >= 2 plus its
    # similar partners (:508-518)
    sel_t = per_t.where(F.col("similar_count") >= 2) \
                 .select("conv_id", F.col("t").alias("sel"))
    sel_it = (pairs.join(
        per_t.where(F.col("similar_count") >= 2).select("conv_id", "t"),
        ["conv_id", "t"])
        .where(F.col("pd") <= similar_pct)
        .select("conv_id", F.col("it").alias("sel")))
    selected = sel_t.unionByName(sel_it).distinct()
    # metric aggregates: avg over ALL computed pairs in deterministic
    # (t, it) order (sequential fold — byte-stable across engines), the
    # None-pd abort (:500-506 feeding float(None) at :508)
    magg = pairs.groupBy("conv_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("t", "it", "pd"))),
            F.lit(0.0), lambda acc, s: acc + s["pd"]).alias("__psum"),
        F.count(F.lit(1)).alias("__pn"),
        F.sum(F.when(F.col("pd").isNull(), 1).otherwise(0))
        .alias("__nulls"))
    magg = magg.withColumn(
        "avg_percent_different",
        F.when(F.col("__pn") > 0, F.col("__psum") / F.col("__pn"))
        .otherwise(F.lit(100.0)))
    nsel = selected.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("__nsel"))
    magg = (magg.join(nsel, "conv_id", "left")
            .withColumn("__nsel", F.coalesce("__nsel", F.lit(0)))
            .withColumn("__err", F.col("__nulls") > 0)
            .withColumn(
                "train_pre",
                (F.col("__nsel") >= 3)
                | ((F.col("__nsel") > 0)
                   & (F.col("avg_percent_different") <= avg_pct)))
            .withColumn(
                "train_on_avg",
                ~(F.col("__nsel") >= 3) & (F.col("__nsel") > 0)
                & (F.col("avg_percent_different") <= avg_pct)))

    # --- dedup within dedup_seconds (:552-579): walking the sorted
    # selection, the PREDECESSOR of any gap < dedup_seconds is removed
    # (last_timestamp_to_train is unconditionally re-pointed at every
    # step, so the walk reduces to a lead() comparison). Runs only for
    # train_pre metrics, exactly like the reference's
    # ``if found_training:`` guard.
    wsel = Window.partitionBy("conv_id").orderBy("sel")
    sel2 = (selected
            .join(magg.where(F.col("train_pre")).select("conv_id"),
                  "conv_id")
            .withColumn("__next", F.lead("sel").over(wsel))
            .withColumn(
                "__deduped",
                F.col("__next").isNotNull()
                & (F.col("sel") > F.col("__next") - dedup_seconds)))
    kept = sel2.where(~F.col("__deduped"))
    nkept = kept.groupBy("conv_id").agg(F.count(F.lit(1)).alias("__nkept"))
    # generation: 2 for the first created profile, +1 per subsequent
    # (the learn_parent_id chain, :582-681)
    wkept = Window.partitionBy("conv_id").orderBy("sel")
    kept = kept.withColumn("__generation",
                           (F.row_number().over(wkept) + 1).cast("int"))

    # --- assemble the decision surface ------------------------------------
    # train = found_training AFTER dedup (< 2 survivors cancels, :577);
    # train_on_avg is the comparison_matrix flag (set pre-dedup and
    # never unset in the reference)
    # metrics with sums but no comparable pairs (everything
    # week-skipped, or a single surviving window) default to the
    # reference's empty-percentages state: avg 100, nothing to train
    dec = (sums.select("conv_id").distinct()
           .join(magg, "conv_id", "left")
           .join(nkept, "conv_id", "left")
           .withColumn("avg_percent_different",
                       F.coalesce("avg_percent_different", F.lit(100.0)))
           .withColumn("train_pre",
                       F.coalesce("train_pre", F.lit(False)))
           .withColumn("train_on_avg",
                       F.coalesce("train_on_avg", F.lit(False)))
           .withColumn("__err", F.coalesce("__err", F.lit(False)))
           .withColumn("__nkept", F.coalesce("__nkept", F.lit(0)))
           .withColumn("__train",
                       F.col("train_pre") & (F.col("__nkept") >= 2))
           .select("conv_id", "__train", "train_pre", "train_on_avg",
                   "avg_percent_different", "__err"))

    out = (an.join(gates.select("conv_id", "anomaly_e", "w_n", "__stage57"),
                   ["conv_id", "anomaly_e"], "left")
           .join(sums, ["conv_id", "anomaly_e"], "left")
           .join(per_t.select("conv_id",
                              F.col("t").alias("anomaly_e"),
                              "similar_count"),
                 ["conv_id", "anomaly_e"], "left")
           .join(selected.withColumn("__selected", F.lit(True))
                 .select("conv_id", F.col("sel").alias("anomaly_e"),
                         "__selected"),
                 ["conv_id", "anomaly_e"], "left")
           .join(sel2.select("conv_id", F.col("sel").alias("anomaly_e"),
                             "__deduped"),
                 ["conv_id", "anomaly_e"], "left")
           .join(kept.select("conv_id", F.col("sel").alias("anomaly_e"),
                             "__generation"),
                 ["conv_id", "anomaly_e"], "left")
           .join(dec, "conv_id", "left"))
    stage = F.coalesce(
        F.col("__stage0"), F.col("__stage57"),
        F.when(F.col("features_sum").isNull(), "no_features"),
        F.when(F.col("__err"), "comparison_error"),
        F.lit("compared"))
    cmp_row = stage == F.lit("compared")
    return out.select(
        "conv_id", "metric", "anomaly_e",
        stage.alias("stage"),
        F.col("w_n").cast("int").alias("window_n"),
        F.col("features_sum"),
        F.when(cmp_row, F.coalesce(F.col("similar_count"), F.lit(0)))
        .cast("int").alias("similar_count"),
        F.when(cmp_row, F.coalesce(F.col("__selected"), F.lit(False)))
        .alias("selected"),
        F.when(cmp_row & F.col("train_pre")
               & F.col("__selected").isNotNull(),
               F.col("__deduped")).alias("deduped"),
        F.when(cmp_row & F.col("__train"), F.col("__generation"))
        .alias("generation"),
        F.when(cmp_row, F.col("__train")).alias("train"),
        F.when(cmp_row, F.col("train_on_avg")).alias("train_on_avg"),
        F.when(cmp_row, F.round("avg_percent_different", 6) + F.lit(0.0))
        .alias("avg_percent_different"))
