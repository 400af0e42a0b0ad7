"""Common-motifs learning gate — the ionosphere flow that decides
whether an anomaly window is "removable" as a repetition of patterns
already present in the previous four weeks
(skyline/ionosphere/common_motifs.py, Feature #5318/#5644).

Ported here, each with reference citations:

- ``minmax_pw5`` / window slicing: the whole 5-week series is min-max
  scaled FIRST (common_motifs.py:1956-1983, functions/numpy/
  minmax_scale.py — constant series scale to zeros), then split into
  the 7-day anomaly window and the preceding 4-week pw4 window
  (:1980-1983).
- ``candidate_gate``: common_motifs.py:187-246 — the anomaly window's
  min/max (each padded 10 % toward the interior, only when positive)
  must each appear >= 3 times in pw4, else nothing can be removed;
  the 'learn_self_validation' context forces candidacy (:238-245).
- ``stumpy_match``: an own implementation of the public
  ``stumpy.match(Q, T, max_distance, max_matches)`` contract
  (common_motifs.py:629-635 calls it): the z-normalized Euclidean
  distance profile of Q against every length-m window of T (computed
  with the repo's own MASS recurrences, operators/motifs.py), then
  matches picked best-first under ``max_distance`` with stumpy's
  trivial-match exclusion zone of ceil(m / 4) around each pick.
- ``remove_motifs``: common_motifs.py:248-716 — the sequential
  self-sweep over pw4 with every rate-limit quirk: the loop bound
  ``range(0, len - 1 - batch_size)`` (the final start index is never
  scanned), one motif per hour (skip < last_match + 6), at most one
  consideration per 2 steps and the +-batch_size shadow of the last
  considered index, single-value-motif dedup, the range-padding
  ladder (max_y < 30 -> absolute 2.0; max_y < 120 / range < 30 /
  range < 5 escalate the percent), the >= 3-candidate prefilter
  (:469-484), per-match all_in_range + trapezoid-area gates
  (the same gates as operators/motifs.py, here over raw minmaxed
  values), and the >= 3-matches floor for an index to count as a
  common motif (:697-699).

- ``motif_removed_timeseries_indices`` / ``remove_timeseries``: the
  downstream removal walk (common_motifs.py:719-1210) — each common
  motif annihilates its matches inside the anomaly window (stumpy.match
  against the window extended with batch_size fft-extrapolated
  predictions, via the already-ported ``_fft_extrapolation``), then
  micro motifs mop up leftovers (value AND delta each found >= 4 times
  in pw5, with the zero-value and negative-band quirks), and the learn
  verdict is ``removed_count == len(anomaly_window)``
  (common_motifs.py:2246-2258). The Redis work-queue / plotting /
  wind-results plumbing around it stays out of scope per SURVEY §3.3.

Scale: one applyInPandas on the standard per-series exchange; the
sweep is O(windows x profile) per series inside the kernel, bounded by
the retention window exactly like the analyze/motif kernels.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.operators.motifs import (
    get_percent_different,
    mass_distances,
)

__all__ = [
    "minmax_scale",
    "candidate_gate",
    "stumpy_match",
    "remove_motifs",
    "common_motifs",
]


def minmax_scale(x: np.ndarray) -> np.ndarray:
    """functions/numpy/minmax_scale.py — zeros when max == min."""
    x = np.asarray(x, dtype=np.float64)
    mx, mn = float(np.max(x)), float(np.min(x))
    if mx == mn:
        return np.zeros_like(x)
    return (x - mn) / (mx - mn)


def candidate_gate(anomaly_vals: np.ndarray, pw4_vals: np.ndarray,
                   context: str = "find_repetitive_patterns",
                   range_padding: float = 10.0) -> dict:
    """common_motifs.py:187-246 — is the anomaly window even a
    candidate for motif removal?"""
    out = {"candidate": True, "min_y": None, "max_y": None,
           "max_min_y": None, "min_max_y": None,
           "min_found": 0, "max_found": 0}
    min_y = float(np.min(anomaly_vals))
    max_y = float(np.max(anomaly_vals))
    max_min_y = min_y
    min_max_y = max_y
    if min_y > 0:
        max_min_y = min_y + ((min_y / 100) * range_padding)
    if max_y > 0:
        min_max_y = max_y - ((max_y / 100) * range_padding)
    pw4 = np.asarray(pw4_vals, dtype=np.float64)
    min_found = int(np.count_nonzero(pw4 <= max_min_y))
    max_found = int(np.count_nonzero(pw4 >= min_max_y))
    out.update({"min_y": min_y, "max_y": max_y, "max_min_y": max_min_y,
                "min_max_y": min_max_y, "min_found": min_found,
                "max_found": max_found})
    if min_found < 3:
        out["candidate"] = False
    if max_found < 3:
        out["candidate"] = False
    if context == "learn_self_validation":
        out["candidate"] = True
    return out


def stumpy_match(query: np.ndarray, series: np.ndarray,
                 max_distance: float,
                 max_matches: int = 200) -> list[tuple[float, int]]:
    """The public stumpy.match contract: all windows of ``series``
    whose z-normalized Euclidean distance to ``query`` is <=
    ``max_distance``, picked best-first with an exclusion zone of
    ceil(m / 4) around every pick, at most ``max_matches``. Distance
    profile via the repo's own MASS recurrences."""
    m = query.size
    n = series.size
    if n < m:
        return []
    offsets = np.arange(0, n - m + 1)
    dists, _ = mass_distances(series.astype(np.float64),
                              query.astype(np.float64), offsets)
    d = np.asarray(dists, dtype=np.float64).copy()
    # constant windows have no z-norm — MASS yields nan there; the
    # z-normalized distance convention (stumpy / the direct form with
    # znorm(const) = 0) is 0 when both sides are constant, sqrt(m)
    # when exactly one is
    bad = ~np.isfinite(d)
    if bad.any():
        sw = np.lib.stride_tricks.sliding_window_view(series, m)
        w_const = sw.max(axis=1) == sw.min(axis=1)
        q_const = float(query.max()) == float(query.min())
        both = bad & w_const & q_const
        one = bad & (w_const != q_const)
        d[bad] = np.inf
        d[both] = 0.0
        d[one] = math.sqrt(m)
    excl = int(math.ceil(m / 4.0))
    out: list[tuple[float, int]] = []
    while len(out) < max_matches:
        i = int(np.argmin(d))
        best = float(d[i])
        if not np.isfinite(best) or best > max_distance:
            break
        out.append((best, i))
        lo, hi = max(0, i - excl), min(d.size, i + excl + 1)
        d[lo:hi] = np.inf
    return out


def _padded_range(dataset: list[float],
                  range_padding: float = 10.0) -> tuple:
    """The range-padding ladder (common_motifs.py:420-448), shared by
    the sweep prefilter; returns (min_y, max_y, min_y_padded,
    max_y_padded, effective_range_padding)."""
    max_y = max(dataset)
    min_y = min(dataset)
    use_range_padding = ((max_y - min_y) / 100) * range_padding
    if max_y < 30:
        use_range_padding = 2.0
    range_total = max_y - min_y
    modify = False
    if max_y < 120 and range_padding < 20:
        range_padding = 20
        modify = True
    if max_y < 30 and range_padding < 33:
        range_padding = 33
        modify = True
    if range_total < 30 and range_padding < 33:
        range_padding = 33
        modify = True
    if range_total < 5 and range_padding < 200:
        range_padding = 200
        modify = True
    if modify:
        use_range_padding = (range_total / 100) * range_padding
    if min_y > 0 and (min_y - use_range_padding) > 0:
        min_y_padded = min_y - use_range_padding
    else:
        min_y_padded = min_y
    max_y_padded = max_y + use_range_padding
    if min_y_padded == max_y_padded:
        min_y_padded = min_y_padded - ((min_y_padded / 100)
                                       * range_padding)
        max_y_padded = max_y_padded + ((max_y_padded / 100)
                                       * range_padding)
    return min_y, max_y, min_y_padded, max_y_padded, range_padding


def remove_motifs(values: np.ndarray, batch_size: int = 6,
                  max_distance: float = 1.6,
                  max_area_percent_diff: float = 20.0) -> dict:
    """common_motifs.py:248-716 — find the COMMON motifs of a series:
    every batch_size window that recurs >= 3 times (by stumpy.match
    distance + the all_in_range / area gates), subject to the
    reference's rate-limit quirks. Returns
    {batch_index: {motif_id: {...decision fields...}}}."""
    ts = np.asarray(values, dtype=np.float64)
    motifs: dict[int, dict] = {}
    index_count = ts.size
    last_motif_match_index = None
    last_batch_index = None
    single_value_motifs_found: list[float] = []
    relate_dataset = ts.tolist()
    # the reference's loop bound: the LAST batch_size+1 start offsets
    # are never scanned (range(0, len - 1 - batch_size))
    for batch_index in range(0, (index_count - 1) - batch_size):
        if last_motif_match_index is not None \
                and batch_index < last_motif_match_index + 6:
            continue
        if last_batch_index is not None:
            if batch_index < last_batch_index + 2:
                continue
            if (last_batch_index - batch_size) <= batch_index \
                    < (last_batch_index + batch_size):
                continue
        subsequence = ts[batch_index:batch_index + batch_size]
        if subsequence.size < batch_size:
            break
        dataset = [float(v) for v in subsequence]
        single_value_motif = False
        sequence_value = None
        if len(set(dataset)) == 1:
            sequence_value = dataset[0]
            single_value_motif = True
            if sequence_value in single_value_motifs_found:
                continue
        last_batch_index = int(batch_index)

        (min_y, max_y, min_y_padded, max_y_padded,
         eff_padding) = _padded_range(dataset)

        # prefilter: >= 3 windows of the series fully inside the
        # padded band, else skip (:469-484)
        cand = 0
        for idx in range(index_count - batch_size + 1):
            w = ts[idx:idx + batch_size]
            if float(w.min()) >= min_y_padded \
                    and float(w.max()) <= max_y_padded:
                cand += 1
                if cand >= 3:
                    break
        if cand < 3:
            continue

        matches = stumpy_match(subsequence, ts, max_distance)
        if not matches:
            continue
        found: dict[str, dict] = {}
        # stumpy returns distance-sorted matches already
        for best_dist, best_index in matches:
            if batch_index == best_index:
                continue
            if best_index > index_count - 1:
                continue
            relate = relate_dataset[best_index:best_index + batch_size]
            if len(set(relate)) == 1 \
                    and relate[0] in single_value_motifs_found:
                continue
            match_type = "not_similar_enough"
            all_in_range = True
            for value in relate:
                if value < min_y_padded or value > max_y_padded:
                    all_in_range = False
                    break
            if all_in_range:
                related_max_y = max(relate)
                if related_max_y < (max_y - eff_padding) \
                        or related_max_y > (max_y + eff_padding):
                    all_in_range = False
                related_min_y = min(relate)
                if related_min_y < (min_y - eff_padding) \
                        or related_min_y > (min_y + eff_padding):
                    all_in_range = False
            add_match = False
            if all_in_range:
                add_match = True
                match_type = "all_in_range"
            if not all_in_range:
                continue
            motif_area = float(np.trapezoid(np.array(dataset), dx=1)) \
                if hasattr(np, "trapezoid") \
                else float(np.trapz(np.array(dataset), dx=1))
            sub_area = float(np.trapezoid(np.array(relate), dx=1)) \
                if hasattr(np, "trapezoid") \
                else float(np.trapz(np.array(relate), dx=1))
            percent_different = None
            if motif_area and sub_area:
                percent_different = get_percent_different(
                    sub_area, motif_area)
                if percent_different > max_area_percent_diff:
                    add_match = False
                if percent_different <= max_area_percent_diff \
                        and best_dist < max_distance:
                    add_match = True
                    match_type = "distance and area"
            if best_dist > max_distance:
                add_match = False
                match_type = "distance not within range"
            if add_match:
                if percent_different is None:
                    percent_different = 0.0
                motif_id = f"{batch_index}-{best_index}"
                found[motif_id] = {
                    "subsequence_start_index": int(batch_index),
                    "match_sequence_start_index": int(best_index),
                    "distance": float(best_dist),
                    "size": int(batch_size),
                    "motif_area": float(motif_area),
                    "subsequence_motif_area": float(sub_area),
                    "area_percent_diff": float(percent_different),
                    "match_type": match_type,
                }
        if len(found) < 3:
            continue
        motifs[batch_index] = found
        last_motif_match_index = batch_index
        if single_value_motif:
            single_value_motifs_found.append(sequence_value)
    return motifs


def motif_removed_timeseries_indices(
        motif_index: int, motif_vals: np.ndarray,
        anomaly_vals: np.ndarray, *, max_distance: float = 1.6,
        use_predictions: bool = True,
        range_padding: float = 10.0,
        max_area_percent_diff: float = 20.0) -> tuple[set, dict]:
    """common_motifs.py:719-999 — which anomaly-window indices does
    this common motif annihilate? stumpy.match of the motif against
    the anomaly window EXTENDED with batch_size fft-extrapolated
    predictions (matches landing in the predicted tail are skipped),
    then the same range/area gates as the sweep. Quirks kept: the
    motif tuple's source index IS the best index (:825 — motif_index
    only survives in the bookkeeping field), the
    ``if best_index not in motifs_matched`` guard that keys by
    source_index anyway (:956-957), and accepted removals spanning
    past the window end are recorded as-is (so the caller's
    all-indices-removed early-break can never fire on a tail match)."""
    from skyline_spark.functions.custom_algorithms import (
        _fft_extrapolation,
    )
    removed: set[int] = set()
    motifs_matched: dict = {}
    batch_size = int(motif_vals.size)
    if batch_size == 0:
        return removed, motifs_matched
    dataset = [float(v) for v in motif_vals]
    index_count = int(anomaly_vals.size)
    (min_y, max_y, min_y_padded, max_y_padded,
     eff_padding) = _padded_range(dataset, range_padding)
    # the (:781-784) zero-pin applied AFTER the ladder
    if min_y == 0:
        min_y_padded = min_y
    if max_y == 0:
        max_y_padded = max_y
    relate = anomaly_vals.astype(np.float64)
    if use_predictions:
        relate = _fft_extrapolation(relate, n_predict=batch_size)
    if batch_size < 3:
        return removed, motifs_matched
    matches = stumpy_match(np.asarray(dataset), relate, max_distance,
                           max_matches=int(relate.size + batch_size))
    if not matches:
        return removed, motifs_matched
    anomaly_list = anomaly_vals.tolist()
    for best_dist, best_index in matches:
        if best_index > index_count - 1:
            continue
        rel = anomaly_list[best_index:best_index + batch_size]
        all_in_range = True
        for value in rel:
            if value < min_y_padded or value > max_y_padded:
                all_in_range = False
                break
        if all_in_range:
            rmax, rmin = max(rel), min(rel)
            if rmax < (max_y - eff_padding) \
                    or rmax > (max_y + eff_padding):
                all_in_range = False
            if rmin < (min_y - eff_padding) \
                    or rmin > (min_y + eff_padding):
                all_in_range = False
        add_match = all_in_range
        match_type = "all_in_range" if all_in_range \
            else "not_similar_enough"
        motif_area = float(np.trapezoid(np.array(dataset), dx=1)) \
            if hasattr(np, "trapezoid") \
            else float(np.trapz(np.array(dataset), dx=1))
        sub_area = float(np.trapezoid(np.array(rel), dx=1)) \
            if hasattr(np, "trapezoid") \
            else float(np.trapz(np.array(rel), dx=1))
        percent_different = None
        if motif_area and sub_area:
            percent_different = get_percent_different(sub_area,
                                                      motif_area)
            if percent_different > max_area_percent_diff:
                add_match = False
            if percent_different <= max_area_percent_diff \
                    and best_dist < max_distance:
                add_match = True
                match_type = "distance and area"
        if best_dist > max_distance:
            add_match = False
            match_type = "distance not within range"
        if add_match:
            for ri in range(best_index, best_index + batch_size):
                removed.add(ri)
            source_index = best_index  # the :825 quirk
            if best_index not in motifs_matched:
                motifs_matched[source_index] = {}
            motifs_matched.setdefault(source_index, {})[best_index] = {
                "subsequence_start_index": int(motif_index),
                "distance": float(best_dist),
                "area_percent_diff": float(percent_different or 0.0),
                "match_type": match_type,
            }
    return removed, motifs_matched


def remove_timeseries(batch_size: int, anomaly_pairs: list,
                      removed_indices: list, pw5_pairs: list,
                      range_padding: float = 10.0) -> tuple:
    """common_motifs.py:1001-1210 — mark removed indices, then the
    micro-motif pass: any leftover index whose VALUE appears >= 4
    times in pw5 (within +-10 %, the zero-value quirk substitutes the
    smallest positive anomaly value) AND whose DELTA appears >= 4
    times (same bands, the inverted inclusive band when both bounds
    are negative) is removed too. Quirks kept: found_values counts the
    point itself (pw5 contains the anomaly window), the accepted micro
    match appends a PW5 index into the anomaly-removed list (:1177),
    and removed micro keys are deleted from both dicts (:1188-1200).
    An all-zero anomaly window raises inside the zero-value quirk in
    the reference (min() of an empty positive list) — surfaced here as
    the same no-removal failure the reference's outer try produces."""
    removed_anomaly = []
    removed_count = 0
    unremoved = []
    for index, (t, v) in enumerate(anomaly_pairs):
        if index in removed_indices:
            removed_anomaly.append([t, -1])
            removed_count += 1
        else:
            unremoved.append([t, v])
            removed_anomaly.append([t, v])
    unremoved_dict: dict = {}
    removed_unremoved: dict = {}
    same_value = list({v for _t, v in unremoved}) if unremoved else []
    # max contiguous unremoved run (600-second adjacency walk)
    max_item_size = 0
    last_ts = None
    run: list = []
    for item in unremoved:
        if last_ts is None:
            last_ts = item[0]
            run.append(item)
            continue
        if not run:
            run = [item]
        if item[0] > last_ts + 600:
            if run:
                max_item_size = max(max_item_size, len(run))
            run = []
        else:
            run.append(item)
        last_ts = item[0]
    if run:
        max_item_size = max(max_item_size, len(run))

    n = len(anomaly_pairs)
    try:
        if removed_count < n or len(same_value) == 1 \
                or max_item_size < (batch_size * 2):
            if removed_count >= (n - (batch_size - 1)) \
                    or len(same_value) == 1 \
                    or max_item_size < (batch_size * 2):
                for index, (t, v) in enumerate(anomaly_pairs):
                    if index in removed_indices:
                        continue
                    pw5_index = None
                    pw5_value = None
                    if index != 0:
                        delta = anomaly_pairs[index][1] \
                            - anomaly_pairs[index - 1][1]
                    else:
                        try:
                            pw5_index = [i for i, it in
                                         enumerate(pw5_pairs)
                                         if it[0] == t][0]
                            pw5_value = pw5_pairs[pw5_index - 1][1]
                            delta = v - pw5_value
                        except Exception:
                            delta = anomaly_pairs[index + 1][1] - v
                    unremoved_dict[index] = {"timestamp": t,
                                             "value": v, "delta": delta}
                    if pw5_index:
                        unremoved_dict[index]["pw5_index"] = \
                            pw5_index - 1
                        unremoved_dict[index]["pw5_value"] = pw5_value

        removed_unremoved_count = 0
        remove_keys = []
        delta_values = None
        for key, data in unremoved_dict.items():
            removed_unremoved[key] = data
            removed_unremoved[key]["removed"] = False
            value = data["value"]
            if value == 0:
                min_y = float(value)
                min_value = min(v for _t, v in anomaly_pairs if v > 0)
                max_y = min_value
                if min_value:
                    max_y = min_value - ((min_value / 100)
                                         * range_padding)
            else:
                min_y = value - ((value / 100) * range_padding)
                max_y = value + ((value / 100) * range_padding)
            removed_unremoved[key]["min_y"] = min_y
            removed_unremoved[key]["max_y"] = max_y
            found_values = [[i, it] for i, it in enumerate(pw5_pairs)
                            if min_y <= it[1] <= max_y]
            removed_unremoved[key]["value_found_count"] = \
                len(found_values)
            if len(found_values) < 4:
                continue
            if delta_values is None:
                delta_values = [0.0]
                last_value = pw5_pairs[0][1]
                for it in pw5_pairs[1:]:
                    delta_values.append(it[1] - last_value)
                    last_value = it[1]
            delta_value = data["delta"]
            if delta_value == 0:
                min_delta = float(delta_value)
                min_value = min(v for _t, v in anomaly_pairs if v > 0)
                max_delta = min_value
                if min_value:
                    max_delta = min_value - ((min_value / 100)
                                             * range_padding)
            else:
                min_delta = delta_value - ((delta_value / 100)
                                           * range_padding)
                max_delta = delta_value + ((delta_value / 100)
                                           * range_padding)
            removed_unremoved[key]["min_delta"] = min_delta
            removed_unremoved[key]["max_delta"] = max_delta
            if min_delta < 0 and max_delta < 0:
                found_deltas = [d for d in delta_values
                                if max_delta <= d <= min_delta]
            else:
                found_deltas = [d for d in delta_values
                                if min_delta <= d <= max_delta]
            removed_unremoved[key]["delta_found_count"] = \
                len(found_deltas)
            if len(found_deltas) >= 4:
                match_index = found_values[0][0]
                removed_indices.append(match_index)  # the :1177 quirk
                removed_anomaly[key] = [data["timestamp"], -1]
                removed_count += 1
                removed_unremoved_count += 1
                removed_unremoved[key]["removed"] = True
                remove_keys.append(key)
        for key in remove_keys:
            removed_unremoved.pop(key, None)
            unremoved_dict.pop(key, None)
    except ValueError:
        # the reference's outer try: an all-zero window crashes the
        # zero-value quirk and the run falls back to "nothing removed"
        return [], 0, {}, {}
    return removed_anomaly, removed_count, unremoved_dict, \
        removed_unremoved


COMMON_MOTIFS_SCHEMA = (
    "conv_id string, metric string, candidate boolean, "
    "min_found int, max_found int, batch_index int, motif_id string, "
    "match_index int, distance double, motif_area double, "
    "subsequence_motif_area double, area_percent_diff double, "
    "match_type string, learn boolean, removed_count int, "
    "anomaly_n int")


def common_motifs(parsed: DataFrame, window_seconds: int = 604800,
                  pw_weeks: int = 4, batch_size: int = 6,
                  max_distance: float = 1.6,
                  max_area_percent_diff: float = 20.0,
                  context: str = "find_repetitive_patterns") -> DataFrame:
    """Per series: min-max the 5-week window, split anomaly / pw4,
    run the candidate gate and (when candidate) the common-motif
    sweep over pw4. One row per accepted (batch_index, match); one
    NULL-motif row per non-candidate or motif-less series."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__e", kind="stable")
        e = pdf["__e"].to_numpy(np.float64)
        v = pdf["value"].to_numpy(np.float64)
        head = float(e[-1])
        pw5 = e >= head - window_seconds * (pw_weeks + 1)
        e, v = e[pw5], v[pw5]
        sv = minmax_scale(v)
        anom = sv[e >= head - window_seconds]
        pw4 = sv[e <= head - window_seconds]
        base = {"conv_id": pdf["conv_id"].iloc[0],
                "metric": pdf["metric"].iloc[0],
                "batch_index": None, "motif_id": None,
                "match_index": None, "distance": None,
                "motif_area": None, "subsequence_motif_area": None,
                "area_percent_diff": None, "match_type": None,
                "learn": False, "removed_count": 0, "anomaly_n": 0}
        if anom.size == 0 or pw4.size == 0:
            return pd.DataFrame([{**base, "candidate": False,
                                  "min_found": 0, "max_found": 0}])
        gate = candidate_gate(anom, pw4, context=context)
        rows = []
        learn = False
        removed_count = 0
        if gate["candidate"]:
            motifs = remove_motifs(pw4, batch_size, max_distance,
                                   max_area_percent_diff)
            for bi, found in motifs.items():
                for mid, mm in found.items():
                    rows.append({
                        **base, "candidate": True,
                        "min_found": gate["min_found"],
                        "max_found": gate["max_found"],
                        "batch_index": int(bi), "motif_id": mid,
                        "match_index":
                            mm["match_sequence_start_index"],
                        "distance": mm["distance"],
                        "motif_area": mm["motif_area"],
                        "subsequence_motif_area":
                            mm["subsequence_motif_area"],
                        "area_percent_diff": mm["area_percent_diff"],
                        "match_type": mm["match_type"],
                    })
            if motifs:
                # the removal walk (common_motifs.py:2117-2258): each
                # common motif annihilates its matches in the anomaly
                # window; micro motifs mop up the remainder; LEARN when
                # the whole window is removed
                e_anom = e[e >= head - window_seconds]
                anom_pairs = list(zip(e_anom.tolist(), anom.tolist()))
                pw5_pairs = list(zip(e.tolist(), sv.tolist()))
                removed: list[int] = []
                anomaly_indices = list(range(len(anom_pairs)))
                for bi in motifs:
                    mvals = pw4[bi:bi + batch_size]
                    rset, _mm = motif_removed_timeseries_indices(
                        bi, mvals, anom, max_distance=max_distance)
                    removed = sorted(set(removed) | rset)
                    if removed == anomaly_indices:
                        break
                (_removed_ts, removed_count, _unrem,
                 _runrem) = remove_timeseries(
                    batch_size, anom_pairs, removed, pw5_pairs)
                learn = removed_count == len(anom_pairs)
        if not rows:
            rows.append({**base, "candidate": gate["candidate"],
                         "min_found": gate["min_found"],
                         "max_found": gate["max_found"]})
        for r in rows:
            r["learn"] = bool(learn)
            r["removed_count"] = int(removed_count)
            r["anomaly_n"] = int(anom.size)
        return pd.DataFrame(rows)

    proj = parsed.where(F.col("value").isNotNull()).select(
        "conv_id", "metric",
        F.col("ts").cast("timestamp").cast("double").alias("__e"),
        "value")
    return proj.groupBy("conv_id").applyInPandas(
        kernel, schema=COMMON_MOTIFS_SCHEMA)
