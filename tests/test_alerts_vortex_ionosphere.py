"""Tests: alert throttle (S9), vortex ad-hoc ingest (S4),
ionosphere-lite feature profiles (X2)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_alert_throttle_exact_and_lag(spark):
    from skyline_spark.operators.alerts import (
        throttle_alerts_exact,
        throttle_alerts_lag,
    )
    rows = [
        # metric m1, expiration 100: anomalies at 0, 50, 90, 150, 260
        ("m1", 0.0, 100), ("m1", 50.0, 100), ("m1", 90.0, 100),
        ("m1", 150.0, 100), ("m1", 260.0, 100),
        ("m2", 10.0, 100),
    ]
    df = spark.createDataFrame(rows,
                               "metric string, last_ts double, expiration_time int")
    exact = throttle_alerts_exact(df).toPandas() \
        .sort_values(["metric", "last_ts"]).reset_index(drop=True)
    # exact semantics: emit 0; 50/90 suppressed; 150 emitted (>=0+100...
    # 150 >= 0+100 -> but last emitted stays 0 until re-emit); 260 emitted
    m1 = exact[exact.metric == "m1"].emit_alert.tolist()
    assert m1 == [True, False, False, True, True]
    assert exact[exact.metric == "m2"].emit_alert.tolist() == [True]
    lag = throttle_alerts_lag(df).toPandas() \
        .sort_values(["metric", "last_ts"]).reset_index(drop=True)
    # lag variant dedupes pairwise: 150-90=60 < 100 -> suppressed
    assert lag[lag.metric == "m1"].emit_alert.tolist() == \
        [True, False, False, False, True]


def test_vortex_json_csv(spark, tmp_path):
    from skyline_spark.operators.vortex import (
        analyze_vortex,
        read_vortex_csv,
        read_vortex_json,
    )
    n = 1000
    ts = [1_700_000_000 - (n - 1) + i for i in range(n)]
    vals = [1.0] * n
    vals[-1] = 1000.0
    jpath = str(tmp_path / "series.json")
    with open(jpath, "w") as fh:
        json.dump({"results": [[t, v] for t, v in zip(ts, vals)]}, fh)
    cpath = str(tmp_path / "series.csv")
    with open(cpath, "w") as fh:
        fh.writelines(f"{t},{v}\n" for t, v in zip(ts, vals))

    for reader, path in ((read_vortex_json, jpath), (read_vortex_csv, cpath)):
        series = reader(spark, path)
        assert series.count() == n
        verdict = analyze_vortex(series)
        assert verdict["anomalous"] is True
        assert verdict["datapoint"] == 1000.0


def test_feature_profiles_and_ionosphere_match(spark):
    from skyline_spark.operators.features_profile import (
        feature_profiles,
        ionosphere_match,
    )
    rng = np.random.RandomState(0)
    rows = []
    for conv, seed_shift in (("known", 0.0), ("novel", 50.0)):
        v = 100 + seed_shift + rng.normal(0, 1, 500)
        for i, x in enumerate(v):
            rows.append((conv, pd.Timestamp(1_700_000_000 + i, unit="s"), float(x)))
    parsed = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "value"]))
    profiles = feature_profiles(parsed)
    pdf = profiles.toPandas().set_index("conv_id")
    assert abs(pdf.loc["known"].f_mean - 100) < 1
    assert pdf.loc["known"].features_sum != pdf.loc["novel"].features_sum

    # trained profile == current profile for 'known' -> cancelled;
    # 'novel' has no trained profile -> stays anomalous
    anomalies = spark.createDataFrame(
        [("known", 123.0), ("novel", 160.0)], "conv_id string, datapoint double")
    trained = profiles.where(F.col("conv_id") == "known")
    out = ionosphere_match(anomalies, trained, profiles).toPandas() \
        .set_index("conv_id")
    assert out.loc["known"].final_disposition == "cancelled_known_pattern"
    assert out.loc["novel"].final_disposition == "anomalous"
