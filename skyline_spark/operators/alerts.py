"""Alert-path semantics (S9): the reference's alerters themselves
(smtp/slack/pagerduty, skyline/analyzer/alerters.py) are out of scope;
what matters to the pipeline is the EXPIRATION_TIME throttle/dedup —
one alert per metric per expiration window, keyed like the
``last_alert.<alerter>.<metric>`` Redis keys
(skyline/analyzer/analyzer.py:4364-4374).

Spark shape: window-dedup — Window.partitionBy(metric).orderBy(ts) with
a running "last emitted" watermark. An alert row is emitted iff no
prior alert for the same metric fired within expiration_time seconds.
Implemented as an in-group cummax scan (applyInPandas) because the
emit decision is sequentially dependent; groups are alert-cardinality
(small). A native lag-based approximation (dedupes only consecutive
pairs) is provided for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle_alerts_exact(alerts: DataFrame, expiration_col: str = "expiration_time",
                          key: str = "metric", ts_col: str = "last_ts"
                          ) -> DataFrame:
    """Exact reference semantics: scan each metric's anomaly stream in
    ts order, emit when now >= last_emitted + expiration."""
    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="stable")
        exp = float(pdf[expiration_col].iloc[0] or 0)
        out = np.zeros(len(pdf), dtype=bool)
        last = -np.inf
        for i, t in enumerate(pdf[ts_col].to_numpy(dtype=np.float64)):
            if t >= last + exp:
                out[i] = True
                last = t
        return pdf.assign(emit_alert=out)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in alerts.schema.fields) + ", emit_alert boolean"
    return alerts.groupBy(key).applyInPandas(emit, schema=schema)


def throttle_alerts_lag(alerts: DataFrame, expiration_col: str = "expiration_time",
                        key: str = "metric", ts_col: str = "last_ts"
                        ) -> DataFrame:
    """Native lag-based variant: suppress an alert when the PREVIOUS
    anomaly for the metric is within expiration_time (dedupes bursts
    pairwise; equal to the exact scan whenever gaps are monotone)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col).over(w)
    return alerts.withColumn(
        "emit_alert",
        prev.isNull() | (F.col(ts_col) - prev >= F.col(expiration_col)))
