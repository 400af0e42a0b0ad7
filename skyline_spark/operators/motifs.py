"""Ionosphere motif inference — the MASS-based similar-motif match the
reference runs per anomaly against trained feature-profile timeseries.

Reference: skyline/ionosphere/inference.py:123-1228
(ionosphere_motif_inference), defaults skyline/settings.py:3440-3506,
match types skyline/motif_match_types.py. Behavior reproduced:

- the anomalous snippet is the LAST ``batch_size`` points
  (inference.py:545); range stats + padding quirks (``min_y_padded``
  only lowered when the lowered value stays positive; the equal-pad
  re-widening) (inference.py:549-566);
- candidate offsets: the mass2_batch path evaluates ONLY offsets at
  multiples of ``batch_size`` (mass-ts mass2_batch slices the fp series
  into batch_size chunks, and with chunk == query length each chunk
  yields exactly one aligned offset — inference.py:471 computes
  ``indices = range(0, n - batch_size + 1, batch_size)`` accordingly);
  fewer than 3 aligned offsets falls back to mass3 over ALL offsets
  (inference.py:468-477);
- the top_matches adjustment when the fp is short
  (inference.py:604-613, incl. the ``use_top_matches == 2 -> 1``
  quirk);
- the mass3 index-pairing quirk: distances (at offsets 0..n-qlen) are
  paired with indices ``batch_size-1 .. n-1`` — the subsequence END
  positions — so the downstream range/area checks read a window
  shifted by batch_size-1 (inference.py:713-742); reproduced verbatim;
- mass3 skip guards: fp too short for the pieces heuristic and the
  ten-percent-of-batch-size closeness guard (inference.py:664-693);
- the DIY exact-match sweep over every offset (mass2_batch cannot
  return exact matches) appending distance-0 motifs
  (inference.py:845-868, scan stops at index n-2);
- distance_valid filter ``not isnan(d) and d <= max_distance``
  (inference.py:889), candidates sorted by real distance with Python's
  stable sort (inference.py:899);
- per-candidate checks in that order: exact membership, all_in_range
  on the fp window [index : index+batch_size] (min/max within padded
  bounds AND touching both ``max_y - range_padding`` and
  ``min_y + range_padding``, inference.py:962-995), trapezoid-area
  percent-difference gate (inference.py:1010-1056 with
  functions/numpy/percent_different.py quirks: None -> 100, both-zero
  -> 0, zero base -> 100, result always positive), and the
  distance-0 + percent-0 exact override (inference.py:1080-1086);
- SINGLE_MATCH stops at the first accepted candidate
  (inference.py:1141-1142).

MASS distances are computed from scratch (no mass-ts in scope) with
the published MASS recurrences: rolling window mean/std via cumulative
sums (sigma^2 = E[x^2] - E[x]^2, population), correlation from the
sliding dot product, distance = sqrt(2 * (m - (QT - m*mu_q*mu_w) /
(sigma_q*sigma_w))) evaluated in the complex domain exactly as
mass-ts does — a negative radicand (rho marginally > 1) yields a
purely imaginary root whose REAL part (0.0) is what the reference
thresholds, and a zero sigma yields nan which distance_valid drops.
Candidate selection ties are broken by (re, im, offset) — documented
determinization of np.argpartition's unspecified tie order.

Scale: one applyInPandas over the per-series grouping every kernel
already uses; the config rides in the closure (dimension-sized).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skyline_spark.functions.spark_utils import epoch_seconds

_trapz = getattr(np, "trapezoid", None) or np.trapz

#: default inference settings, the reference grid rescaled to the
#: events cadence (settings.py:3440-3447 uses 1440/720/360/180 points
#: at 1-minute resolution; the events series carry a few hundred
#: points, so the grid scales to 90/45)
DEFAULT_MOTIF_SETTINGS = {
    90: {"top_matches": 50, "max_distance": 12,
         "max_area_percent_diff": 20.0, "range_padding_percent": 10.0,
         "find_exact_matches": False},
    45: {"top_matches": 50, "max_distance": 10,
         "max_area_percent_diff": 20.0, "range_padding_percent": 10.0,
         "find_exact_matches": True},
}

MOTIF_OUTPUT_SCHEMA = ("conv_id string, metric string, batch_size int, "
                       "fp_index int, distance double, match_type string, "
                       "matched boolean, motif_area double, "
                       "fp_motif_area double, area_percent_diff double, "
                       "mass_method string")


def get_percent_different(base_value, compare_value):
    """functions/numpy/percent_different.py quirks: invalid -> None,
    both zero -> 0, zero base -> None, result forced positive, nan ->
    0, inf -> None."""
    for v in (base_value, compare_value):
        try:
            fv = float(v)
        except (TypeError, ValueError):
            return None
        if math.isnan(fv) or math.isinf(fv):
            return None
    if base_value == 0 and compare_value == 0:
        return 0
    if base_value * 100.0 == 0:
        return None
    pd_ = (compare_value - base_value) / base_value * 100.0
    if pd_ < 0:
        pd_ = -pd_
    if math.isnan(pd_):
        return 0
    if math.isinf(pd_):
        return None
    return pd_


def mass_distances(fp: np.ndarray, query: np.ndarray,
                   offsets: np.ndarray) -> tuple:
    """(real, imag) MASS distances of ``query`` against the ``fp``
    windows starting at ``offsets``. Population sigma via the
    E[x^2]-E[x]^2 identity (MASS's rolling-stats form, and the form a
    SQL twin reproduces bit-for-bit); a negative radicand (rho
    marginally > 1) yields the purely imaginary root the complex-domain
    reference produces (real part 0); a ZERO sigma on either side is
    nan (dropped by distance_valid) — the one deliberate deviation from
    mass-ts, whose constant-window behavior is an accident of C99
    csqrt(-inf) (documented; the reference's isnan filter drops the
    sigma_w=0 case there too)."""
    m = len(query)
    mu_q = float(np.mean(query))
    var_q = max(float(np.mean(np.square(query)) - mu_q ** 2), 0.0)
    sig_q = math.sqrt(var_q)
    windows = np.lib.stride_tricks.sliding_window_view(fp, m)[offsets]
    mu_w = windows.mean(axis=1)
    var_w = np.maximum(np.square(windows).mean(axis=1) - np.square(mu_w),
                       0.0)
    sig_w = np.sqrt(var_w)
    dots = windows @ query
    denom = sig_w * sig_q
    re = np.full(len(offsets), np.nan)
    im = np.full(len(offsets), np.nan)
    ok = denom > 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        arg = 2.0 * (m - (dots[ok] - m * mu_w[ok] * mu_q) / denom[ok])
    re[ok] = np.where(arg >= 0, np.sqrt(np.maximum(arg, 0.0)), 0.0)
    im[ok] = np.where(arg >= 0, 0.0, np.sqrt(np.maximum(-arg, 0.0)))
    return re, im


def _infer_series(vals_full: np.ndarray, vals_fp: np.ndarray,
                  settings: dict, single_match: bool) -> list:
    """The per-series inference flow. Returns the CHECKED candidates in
    evaluation order as (batch_size, fp_index, distance_real,
    match_type, matched, motif_area, fp_motif_area, area_percent_diff,
    mass_method) tuples; under single_match the list stops at the first
    accepted candidate, as the reference loop does."""
    motifs = []          # (bs, idx, re, im, cfg, snippet, method, frm)
    exacts = set()       # (bs, idx) found by the DIY exact sweep
    n_fp = len(vals_fp)
    for batch_size, bcfg in settings.items():
        m = int(batch_size)
        snippet = vals_full[-m:]
        qlen = len(snippet)
        if qlen < 2 or n_fp < 2:
            continue
        top_matches = int(bcfg.get("top_matches", 50))
        max_distance = float(bcfg.get("max_distance", 20.0))
        rp_pct = float(bcfg.get("range_padding_percent", 10.0))
        max_apd = float(bcfg.get("max_area_percent_diff", 20.0))
        find_exact = bool(bcfg.get("find_exact_matches", False))

        max_y = float(np.max(snippet))
        min_y = float(np.min(snippet))
        rp = ((max_y - min_y) / 100.0) * rp_pct
        if min_y > 0 and (min_y - rp) > 0:
            min_pad = min_y - rp
        else:
            min_pad = min_y
        max_pad = max_y + rp
        if min_pad == max_pad:
            min_pad = min_pad - ((min_pad / 100.0) * rp_pct)
            max_pad = max_pad + ((max_pad / 100.0) * rp_pct)
        cfg = (max_distance, max_apd, max_y, min_y, rp, min_pad, max_pad)

        aligned = list(range(0, n_fp - m + 1, m))
        use_mass3 = len(aligned) < 3

        cands = []  # (idx, re, im)
        if not use_mass3:
            use_top = top_matches
            if (n_fp / m) <= top_matches:
                use_top = round(n_fp / m) - 2
                if use_top == 2:
                    use_top = 1
                if use_top < 1:
                    use_top = 1
            re, im = mass_distances(vals_fp, snippet, np.array(aligned))
            order = sorted(
                range(len(aligned)),
                key=lambda i: (
                    float("inf") if math.isnan(re[i]) else float(re[i]),
                    float("inf") if math.isnan(im[i]) else float(im[i]),
                    aligned[i]))
            cands = [(aligned[i], float(re[i]), float(im[i]))
                     for i in order[:use_top]]
            if not cands:
                continue
        else:
            # mass3 guards (inference.py:664-693)
            pieces = n_fp - qlen
            if pieces < qlen:
                pieces = qlen + 2
            if n_fp <= pieces:
                continue
            if (n_fp - int(m / 10)) < m:
                continue
            offs = np.arange(0, n_fp - qlen + 1)
            re, im = mass_distances(vals_fp, snippet, offs)
            # the reference pairs the profile with subsequence END
            # positions (inference.py:713-742)
            idxs = [i for i in range(n_fp) if i >= m - 1]
            if len(idxs) != len(re):
                idxs = [i for i in range(n_fp) if i >= qlen - 1]
            if len(idxs) != len(re):
                continue
            cands = [(idxs[i], float(re[i]), float(im[i]))
                     for i in range(len(re))]
            if not cands:
                continue

        for idx, re_, im_ in cands:
            motifs.append((m, idx, re_, im_, cfg, snippet,
                           "mass3" if use_mass3 else "mass2_batch"))

        if not use_mass3 and find_exact:
            # DIY exact sweep, scan stops at n_fp - 2 (inference.py:855)
            snip_list = list(snippet)
            for ci in range(0, n_fp - 1):
                if list(vals_fp[ci:ci + m]) == snip_list:
                    exacts.add((m, ci))
                    motifs.append((m, ci, 0.0, 0.0, cfg, snippet,
                                   "exact_sweep"))

    valid = [mo for mo in motifs
             if not math.isnan(mo[2]) and mo[2] <= mo[4][0]]
    valid.sort(key=lambda mo: mo[2])  # stable, distance only

    out = []
    for m, idx, re_, _im, cfg, snippet, method in valid:
        (max_distance, max_apd, max_y, min_y, rp, min_pad, max_pad) = cfg
        relate = vals_fp[int(idx):int(idx + m)]
        if len(relate) == 0:
            continue
        add_match = False
        match_type = None
        is_exact = method == "exact_sweep" or (
            re_ == 0.0 and (m, idx) in exacts)
        if is_exact:
            add_match = True
            match_type = "exact"
        else:
            all_in_range = True
            min_rel = float(np.min(relate))
            max_rel = float(np.max(relate))
            if min_rel < min_pad:
                all_in_range = False
            if max_rel > max_pad:
                all_in_range = False
            if all_in_range:
                if max_rel < (max_y - rp):
                    all_in_range = False
                if min_rel > (min_y + rp):
                    all_in_range = False
            if all_in_range:
                add_match = True
                match_type = "all_in_range"
            else:
                match_type = "not_in_range"

        compare_pd = 100.0
        motif_area = None
        fp_motif_area = None
        percent_different = None
        if add_match:
            motif_area = float(_trapz(np.asarray(snippet, dtype=float),
                                      dx=1))
            fp_motif_area = float(_trapz(np.asarray(relate, dtype=float),
                                         dx=1))
            percent_different = get_percent_different(fp_motif_area,
                                                      motif_area)
            if percent_different is None:
                percent_different = 100
            compare_pd = (-percent_different
                          if percent_different < 0
                          else float(percent_different))
            if compare_pd > max_apd:
                add_match = False
                match_type = "not_similar_enough"
        if compare_pd == 0 and re_ == 0:
            add_match = True
            match_type = "exact"
        out.append((m, int(idx), re_, match_type, add_match,
                    motif_area, fp_motif_area,
                    None if percent_different is None
                    else float(percent_different), method))
        if add_match and single_match:
            break
    return out


def ionosphere_motif_inference(series: DataFrame,
                               settings: dict | None = None,
                               train_frac: float = 0.6,
                               single_match: bool = True,
                               key_cols: tuple = ("conv_id", "metric"),
                               ts_col: str = "ts",
                               value_col: str = "value") -> DataFrame:
    """Run the motif inference per series: the trained fp timeseries is
    the series' first ``train_frac`` time window (the deterministic
    stand-in for a trained features-profile snapshot, as in the other
    ionosphere queries), the anomaly check window is the full series.
    Emits every candidate the reference's final loop CHECKS, with its
    disposition — accepted rows carry match_type exact/all_in_range,
    rejected ones not_in_range/not_similar_enough; under single_match
    the per-series output ends at the first accepted candidate."""
    cfg = settings or DEFAULT_MOTIF_SETTINGS
    eps = epoch_seconds(F.col(ts_col))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__es", kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=float)
        es = pdf["__es"].to_numpy(dtype=float)
        t0, t1 = es[0], es[-1]
        fp = vals[es <= t0 + train_frac * (t1 - t0)]
        rows = _infer_series(vals, fp, cfg, single_match)
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        return pd.DataFrame([{**keys,
                              "batch_size": r[0], "fp_index": r[1],
                              "distance": r[2], "match_type": r[3],
                              "matched": r[4], "motif_area": r[5],
                              "fp_motif_area": r[6],
                              "area_percent_diff": r[7],
                              "mass_method": r[8]} for r in rows],
                            columns=list(key_cols) + [
                                "batch_size", "fp_index", "distance",
                                "match_type", "matched", "motif_area",
                                "fp_motif_area", "area_percent_diff",
                                "mass_method"])

    return (series.withColumn("__es", eps)
            .groupBy(*key_cols)
            .applyInPandas(kernel, schema=MOTIF_OUTPUT_SCHEMA))
