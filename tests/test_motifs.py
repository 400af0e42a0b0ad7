"""Branch-pinning tests for ionosphere motif inference
(operators/motifs.py) vs skyline/ionosphere/inference.py:123-1228: the
MASS distance identity, aligned-offset candidate generation, the
top_matches adjustment quirks, the mass3 end-index pairing quirk, the
DIY exact sweep + SINGLE_MATCH, the padded-range check and the
trapezoid-area percent-diff gate."""

from __future__ import annotations

import math

import numpy as np
import pytest

from skyline_spark.operators.motifs import (
    _infer_series,
    get_percent_different,
    mass_distances,
)


def _znorm_euclid(a, b):
    za = (a - a.mean()) / a.std()
    zb = (b - b.mean()) / b.std()
    return float(np.sqrt(np.sum(np.square(za - zb))))


def test_mass_distance_equals_znorm_euclid():
    rng = np.random.RandomState(3)
    fp = rng.rand(200) * 10
    q = rng.rand(30) * 10
    offs = np.arange(0, len(fp) - len(q) + 1, 7)
    re, im = mass_distances(fp, q, offs)
    for i, o in enumerate(offs):
        assert im[i] == 0.0
        assert re[i] == pytest.approx(_znorm_euclid(fp[o:o + 30], q),
                                      abs=1e-7)


def test_mass_distance_degenerate_windows():
    # constant window or constant query -> nan (dropped downstream)
    re, im = mass_distances(np.ones(50), np.arange(10.0), np.array([0, 5]))
    assert np.isnan(re).all()
    re, im = mass_distances(np.arange(50.0), np.ones(10), np.array([0]))
    assert np.isnan(re).all()


CFG45 = {45: {"top_matches": 5, "max_distance": 10,
              "max_area_percent_diff": 20.0,
              "range_padding_percent": 10.0,
              "find_exact_matches": True}}


def test_exact_sweep_and_single_match():
    rng = np.random.RandomState(1)
    motif = rng.rand(45) * 4 + 6
    full = np.concatenate([rng.rand(30) * 4 + 6, motif,
                           rng.rand(120) * 4 + 6, motif])
    fp = full[:int(len(full) * 0.6)]  # contains the motif at offset 30
    rows = _infer_series(full, fp, CFG45, single_match=True)
    matches = [r for r in rows if r[4]]
    assert len(matches) == 1
    bs, idx, dist, mtype, matched, ma, fpa, apd, method = matches[0]
    assert (idx, dist, mtype, method) == (30, 0.0, "exact", "exact_sweep")
    assert ma == fpa and apd == 0.0
    # single_match: the match is the LAST emitted row
    assert rows[-1][4] is True


def test_mass3_end_index_pairing_quirk():
    # fp short enough that aligned offsets < 3 -> mass3; the reference
    # pairs distance at offset o with index (batch_size - 1 + o)
    rng = np.random.RandomState(2)
    full = rng.rand(140) * 5 + 10
    fp = full[:100]
    cfg = {45: {"top_matches": 5, "max_distance": 1e9,
                "max_area_percent_diff": 1e9,
                "range_padding_percent": 10.0,
                "find_exact_matches": False}}
    rows = _infer_series(full, fp, cfg, single_match=False)
    assert rows and all(r[8] == "mass3" for r in rows)
    idxs = sorted(r[1] for r in rows)
    # offsets 0..(100-45) -> indices 44..99
    assert idxs[0] == 44 and idxs[-1] == 99


def test_top_matches_adjustment_quirk():
    # n_fp / m = 5 <= top_matches -> use_top = round(5) - 2 = 3
    rng = np.random.RandomState(4)
    full = rng.rand(300) * 5 + 10
    fp = full[:225]  # 5 aligned offsets at m=45
    cfg = {45: {"top_matches": 50, "max_distance": 1e9,
                "max_area_percent_diff": 1e9,
                "range_padding_percent": 10.0,
                "find_exact_matches": False}}
    rows = _infer_series(full, fp, cfg, single_match=False)
    assert len([r for r in rows if r[8] == "mass2_batch"]) == 3
    # n_fp / m = 4 -> round(4) - 2 = 2; the ==2 -> 1 quirk applies
    rows = _infer_series(full, full[:180], cfg, single_match=False)
    assert len([r for r in rows if r[8] == "mass2_batch"]) == 1


def test_area_gate_and_range_gate():
    # same shape scaled up: z-norm distance 0 -> candidate, but the
    # range check rejects (fp window far above the padded snippet range)
    base = np.sin(np.arange(45) * 0.3) + 2.0
    fp = np.concatenate([base * 10, base * 10, base * 10])
    full = np.concatenate([fp, base])
    cfg = {45: {"top_matches": 5, "max_distance": 10,
                "max_area_percent_diff": 20.0,
                "range_padding_percent": 10.0,
                "find_exact_matches": False}}
    rows = _infer_series(full, fp, cfg, single_match=False)
    assert rows and all(r[3] == "not_in_range" and not r[4] for r in rows)
    # same extremes (range check passes) but a different duty cycle:
    # the trapezoid-area gate rejects with not_similar_enough
    low_duty = np.where(np.arange(45) % 9 == 0, 3.0, 1.0)   # mean ~1.2
    high_duty = np.where(np.arange(45) % 9 == 0, 1.0, 3.0)  # mean ~2.8
    cfg2 = {45: {"top_matches": 5, "max_distance": 1e9,
                 "max_area_percent_diff": 20.0,
                 "range_padding_percent": 10.0,
                 "find_exact_matches": False}}
    fp2 = np.tile(low_duty, 3)
    rows2 = _infer_series(np.concatenate([fp2, high_duty]), fp2,
                          cfg2, False)
    assert rows2 and all(r[3] == "not_similar_enough" for r in rows2)


def test_percent_different_quirks():
    assert get_percent_different(0, 0) == 0
    assert get_percent_different(0, 5) is None        # zero base -> 100
    assert get_percent_different(10, 5) == 50.0       # always positive
    assert get_percent_different(10, 15) == 50.0
    assert get_percent_different(float("nan"), 1) is None
    assert get_percent_different(float("inf"), 1) is None


def test_spark_operator_matches_kernel(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from skyline_spark.operators.motifs import (
        DEFAULT_MOTIF_SETTINGS,
        ionosphere_motif_inference,
    )
    rng = np.random.RandomState(7)
    vals = rng.rand(250) * 20 + 5
    pdf = pd.DataFrame({
        "conv_id": "c1", "metric": "m",
        "ts": pd.date_range("2024-01-01", periods=250, freq="min"),
        "value": vals})
    out = ionosphere_motif_inference(spark.createDataFrame(pdf)) \
        .orderBy("batch_size", "fp_index", "distance").collect()
    es = pdf.ts.astype("int64").to_numpy() / 1e9
    fp = vals[es <= es[0] + 0.6 * (es[-1] - es[0])]
    want = _infer_series(vals, fp, DEFAULT_MOTIF_SETTINGS, True)
    got = sorted([(r.batch_size, r.fp_index, r.distance, r.match_type,
                   r.matched, r.mass_method) for r in out])
    want_s = sorted([(r[0], r[1], r[2], r[3], r[4], r[8]) for r in want])
    assert got == want_s


def test_degenerate_inputs_do_not_crash(spark):
    """Empty / single-point / constant series through the new operators
    (layers, motifs, packing, gopher) must yield sane output, not
    task failures."""
    import pandas as pd
    from pyspark.sql import functions as F
    from skyline_spark.functions.text import gopher_repetition_columns
    from skyline_spark.operators.layers import run_layer_algorithms
    from skyline_spark.operators.motifs import ionosphere_motif_inference
    from skyline_spark.operators.packing import pack_documents

    empty = spark.createDataFrame(
        [], schema="conv_id string, metric string, family string, "
                   "ts timestamp, value double")
    layers = spark.createDataFrame(
        [("f", 1, ">", 10.0, "none", 0.0, 0, "<", 5.0, 3)],
        schema="family string, layer_id int, d_condition string, "
               "d_boundary_limit double, d1_condition string, "
               "d1_boundary_limit double, d1_boundary_times int, "
               "e_condition string, e_boundary_limit double, "
               "e_boundary_times int")
    assert run_layer_algorithms(empty, layers, join_on="family") \
        .count() == 0
    assert ionosphere_motif_inference(
        empty.drop("family")).count() == 0

    one = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c"], "metric": ["f.m"],
                      "family": ["f"],
                      "ts": [pd.Timestamp("2024-01-01")],
                      "value": [5.0]}))
    r = run_layer_algorithms(one, layers, join_on="family").collect()
    assert len(r) == 1 and r[0].layer_matched  # 5 <= 5 via the <= quirk
    # single point: motifs skip (qlen < 2) -> no rows, no crash
    assert ionosphere_motif_inference(one.drop("family")).count() == 0

    # constant series: every MASS sigma is 0 -> all candidates nan ->
    # no checked candidates, no division crash
    const = spark.createDataFrame(pd.DataFrame({
        "conv_id": "c", "metric": "m",
        "ts": pd.date_range("2024-01-01", periods=200, freq="min"),
        "value": 7.0}))
    assert ionosphere_motif_inference(const).count() == 0

    # empty docs through gopher + packing
    edocs = spark.createDataFrame([], schema="doc_id long, text string")
    assert gopher_repetition_columns(edocs).count() == 0
    assert pack_documents(edocs).count() == 0
    # empty-string text: no tokens beyond the one empty split token
    d = spark.createDataFrame([(0, "")], schema="doc_id long, text string")
    g = gopher_repetition_columns(d).collect()[0]
    assert g.n_words == 1 and not g.gopher_pass


def test_ionosphere_stage_precedence(spark):
    """Planted series through the combined stage: a motif match wins
    over any other matcher; a layers-only match labels 'layers'; no
    match stays 'anomalous'."""
    import pandas as pd
    from pyspark.sql import functions as F
    from skyline_spark.operators.ionosphere import ionosphere_stage

    rng = np.random.RandomState(5)
    rows = []

    def add(conv, fam, vals):
        for j, v in enumerate(vals):
            rows.append((conv, f"{fam}.m", j,
                         pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=j),
                         float(v)))

    # A: an exact 45-point motif repeated inside the 60% head AND at
    # the tail -> the exact sweep matches (motif precedence)
    motif = rng.rand(45) * 4 + 6
    add("A", "fa", list(rng.rand(30) * 4 + 6) + list(motif)
        + list(rng.rand(150) * 4 + 6) + list(motif))
    # B: no motif (pure noise + a level shift killing fp), layer E
    # matches (all values <= 1e9)
    add("B", "fb", list(rng.rand(60) * 4 + 6)
        + list(rng.rand(40) * 4 + 500))
    # C: same shape as B but no layers config for family fc
    add("C", "fc", list(rng.rand(60) * 4 + 6)
        + list(rng.rand(40) * 4 + 500))

    valid = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "metric", "turn_idx",
                                    "ts", "value"]))
    layers = spark.createDataFrame(
        [("fa", 1, "==", -1.0, "none", 0.0, 0, "<", 1e9, 1),
         ("fb", 2, "==", -1.0, "none", 0.0, 0, "<", 1e9, 1)],
        schema="family string, layer_id int, d_condition string, "
               "d_boundary_limit double, d1_condition string, "
               "d1_boundary_limit double, d1_boundary_times int, "
               "e_condition string, e_boundary_limit double, "
               "e_boundary_times int")
    got = {r.conv_id: r for r in ionosphere_stage(
        valid, layers,
        motif_settings={45: {"top_matches": 5, "max_distance": 10,
                             "max_area_percent_diff": 20.0,
                             "range_padding_percent": 10.0,
                             "find_exact_matches": True}}).collect()}
    a, b, c = got["A"], got["B"], got["C"]
    assert a.motif_matched and a.layer_matched
    assert a.disposition == "motif"  # precedence over the layer match
    assert not b.motif_matched and b.layer_matched and not b.fp_matched
    assert b.disposition == "layers"
    assert not c.layer_matched and c.disposition in ("anomalous", "fp")
    assert not c.motif_matched
