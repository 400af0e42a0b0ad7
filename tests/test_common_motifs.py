"""common_motifs kernel pins: minmax scaling, the candidate gate, the
own stumpy.match (vs a direct z-norm brute force), and the
remove_motifs sweep's planted-pattern behaviour + rate-limit quirks."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from skyline_spark.operators.common_motifs import (
    candidate_gate,
    minmax_scale,
    remove_motifs,
    stumpy_match,
)

series = st.lists(
    st.floats(min_value=0, max_value=100,
              allow_nan=False, allow_infinity=False)
    .map(lambda x: round(x, 2)),
    min_size=20, max_size=80)


def test_minmax_scale():
    np.testing.assert_allclose(minmax_scale(np.array([1.0, 3.0, 2.0])),
                               [0.0, 1.0, 0.5])
    assert (minmax_scale(np.array([5.0, 5.0])) == 0).all()


def test_candidate_gate_branches():
    anom = np.array([0.2, 0.5, 0.9])
    # min 0.2 -> padded up to 0.22; max 0.9 -> padded down to 0.81
    pw4_yes = np.array([0.1, 0.15, 0.2, 0.85, 0.9, 0.95])
    g = candidate_gate(anom, pw4_yes)
    assert g["candidate"] and g["min_found"] == 3 and g["max_found"] == 3
    assert g["max_min_y"] == pytest.approx(0.22)
    assert g["min_max_y"] == pytest.approx(0.81)
    # only 2 lows -> not a candidate
    g2 = candidate_gate(anom, np.array([0.1, 0.2, 0.85, 0.9, 0.95]))
    assert not g2["candidate"] and g2["min_found"] == 2
    # learn_self_validation forces candidacy regardless
    g3 = candidate_gate(anom, np.array([0.5]),
                        context="learn_self_validation")
    assert g3["candidate"]
    # non-positive min/max: no padding applied
    g4 = candidate_gate(np.array([0.0, 0.5]),
                        np.array([0.0, 0.0, 0.0, 0.45, 0.46, 0.5]))
    assert g4["max_min_y"] == 0.0
    assert g4["min_max_y"] == pytest.approx(0.45)


def _znorm(w):
    s = w.std()
    if s == 0:
        return np.zeros_like(w)
    return (w - w.mean()) / s


def _brute_match(q, t, max_distance, max_matches=200):
    m = q.size
    d = np.array([np.linalg.norm(_znorm(t[i:i + m]) - _znorm(q))
                  for i in range(t.size - m + 1)])
    excl = int(np.ceil(m / 4.0))
    out = []
    d = d.copy()
    while len(out) < max_matches:
        i = int(np.argmin(d))
        if not np.isfinite(d[i]) or d[i] > max_distance:
            break
        out.append((float(d[i]), i))
        d[max(0, i - excl):min(d.size, i + excl + 1)] = np.inf
    return out


@given(series, st.integers(min_value=0, max_value=10))
@settings(max_examples=30, deadline=None)
def test_stumpy_match_equals_brute(v, start):
    t = np.asarray(v, dtype=np.float64)
    if t[start:start + 6].std() == 0 or t.std() == 0:
        return
    q = t[start:start + 6]
    if q.size < 6:
        return
    got = stumpy_match(q, t, max_distance=2.0)
    want = _brute_match(q, t, max_distance=2.0)
    # equal-distance picks can swap under the ~1e-8 MASS noise, which
    # shifts the greedy exclusion zones — compare the match SET (same
    # indices, same distances), and that both greedy orders are
    # distance-sorted
    gd = dict((i, d) for d, i in got)
    wd = dict((i, d) for d, i in want)
    if sorted(gd) != sorted(wd):
        # exclusion-zone divergence from a swapped tie: allow only if
        # some distances tie within tolerance
        ds = sorted(d for d, _ in want)
        assert any(abs(a - b) < 1e-6 for a, b in zip(ds, ds[1:]))
        return
    for i in gd:
        assert gd[i] == pytest.approx(wd[i], abs=1e-7)
    assert all(a <= b + 1e-7 for (a, _), (b, _) in zip(got, got[1:]))


def _planted_series(reps=8, period=24, noise_seed=5):
    """A sawtooth motif repeated every `period` steps on a noisy base —
    minmax-scaled like the orchestration does."""
    rng = np.random.RandomState(noise_seed)
    v = rng.uniform(40, 60, reps * period)
    motif = np.array([50, 80, 120, 80, 50, 45], dtype=np.float64)
    for r in range(reps):
        s = r * period
        v[s:s + 6] = motif + rng.uniform(-0.5, 0.5, 6)
    return minmax_scale(v)


def test_remove_motifs_planted_common_motif():
    sv = _planted_series()
    motifs = remove_motifs(sv)
    assert motifs, "planted repeated motif not found"
    assert all(len(found) >= 3 for found in motifs.values())
    # the plant windows themselves are found as common motifs, and
    # their matches point at OTHER plants (z-norm matching may also
    # surface recurring noise shapes — that is reference behaviour,
    # not asserted against)
    plant_idx = [bi for bi in motifs if bi % 24 == 0]
    assert len(plant_idx) >= 3
    for bi in plant_idx:
        hits = sum(1 for mm in motifs[bi].values()
                   if mm["match_sequence_start_index"] % 24 == 0)
        assert hits >= 3


def test_remove_motifs_rate_limit_quirks():
    """Accepted indices honour the one-motif-per-hour rule (next
    accepted >= last + 6) and the loop bound never scans the final
    batch_size+1 start offsets."""
    sv = _planted_series(reps=12, period=8)  # dense plants
    motifs = remove_motifs(sv)
    idx = sorted(motifs)
    assert all(b - a >= 6 for a, b in zip(idx, idx[1:]))
    n = sv.size
    assert all(i < (n - 1) - 6 for i in idx)


def test_removal_walk_learns_fully_repetitive_window():
    """An anomaly window that is entirely recurrences of pw4's common
    motif is fully annihilated -> learn (removed_count == window
    length); micro motifs mop up the sub-batch remainder."""
    from skyline_spark.operators.common_motifs import (
        motif_removed_timeseries_indices,
        remove_timeseries,
    )
    rng = np.random.RandomState(7)
    motif = np.array([0.5, 0.8, 1.0, 0.8, 0.5, 0.45])
    # pw4: the motif every 12 steps; anomaly window: 3 plants = 18 pts
    pw4 = rng.uniform(0.48, 0.52, 96)
    for s in range(0, 96, 12):
        pw4[s:s + 6] = motif + rng.uniform(-0.005, 0.005, 6)
    anom = np.concatenate([motif + rng.uniform(-0.005, 0.005, 6)
                           for _ in range(3)])
    removed, matched = motif_removed_timeseries_indices(
        0, pw4[0:6], anom, use_predictions=False)
    assert removed, "motif did not annihilate any anomaly indices"
    # timestamps 60 s apart -> the 600 s adjacency walk sees one run
    anom_pairs = [(1000 + 60 * i, float(v)) for i, v in enumerate(anom)]
    pw5_pairs = ([(0 + 60 * i, float(v)) for i, v in enumerate(pw4)]
                 + anom_pairs)
    _ts, removed_count, unrem, _ru = remove_timeseries(
        6, anom_pairs, sorted(removed), pw5_pairs)
    assert removed_count == len(anom_pairs)


def test_removal_walk_novel_anomaly_not_learned():
    """A window shape absent from pw4 is not annihilated."""
    from skyline_spark.operators.common_motifs import (
        motif_removed_timeseries_indices,
    )
    rng = np.random.RandomState(11)
    pw4 = rng.uniform(0.4, 0.5, 96)
    anom = np.array([0.4, 0.1, 0.95, 0.05, 0.9, 0.02] * 3)
    removed, _ = motif_removed_timeseries_indices(
        0, pw4[0:6], anom, use_predictions=False)
    assert len(removed) < anom.size


def test_remove_timeseries_all_zero_window_fails_like_reference():
    """An all-zero anomaly window crashes the reference's zero-value
    quirk (min of an empty positive list) — surfaced as the outer
    try's nothing-removed fallback."""
    from skyline_spark.operators.common_motifs import remove_timeseries
    anom_pairs = [(1000 + 60 * i, 0.0) for i in range(12)]
    out = remove_timeseries(6, anom_pairs, [], list(anom_pairs))
    assert out == ([], 0, {}, {})


def test_remove_motifs_prefilter_skips_unique_band():
    """A one-off excursion whose padded band contains < 3 windows is
    prefiltered before any matching."""
    rng = np.random.RandomState(3)
    v = rng.uniform(0.4, 0.5, 120)
    v[50:56] = [0.9, 0.95, 1.0, 0.95, 0.9, 0.85]  # single spike motif
    motifs = remove_motifs(np.asarray(v))
    assert all(not (44 <= bi <= 56) for bi in motifs)
