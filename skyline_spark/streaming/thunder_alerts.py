"""Stateful Structured-Streaming form of the thunder alert-once /
recovery state machine.

Reference: the ``thunder.alert.<check_app>.<event_type>`` Redis keys
(skyline/functions/thunder/checks/app/up.py:151-214,
checks/analyzer/run_time.py:67-125,
checks/horizon/metrics_received.py:74-120 and
functions/thunder/check_thunder_failover_key.py): when a check goes
bad and no alert key exists, thunder sends an ALERT event and sets the
key with the check's ``expiry`` TTL; while the key lives, further bad
evaluations are suppressed (``still down but alert key exists so not
alerting``) — but the TTL means a still-bad check re-alerts once the
key expires; when the check recovers while the key exists, thunder
sends a RECOVERY notice and deletes the key.

In streaming that Redis key IS per-check group state:
``applyInPandasWithState`` keeps (alerted, last_alert_ts) per check
across micro-batches, so a flapping check split over many triggers
emits exactly the alert/recovery event sequence the reference's Redis
keys would produce.

Batch twin: skyline_spark.operators.thunder.thunder_alert_events_exact
(same sequential rule per check, state seeded per run) — the pytest
asserts streaming == batch across micro-batch splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("check_key string, ts_epoch double, bad boolean, "
              "event string")
STATE_SCHEMA = "alerted boolean, last_alert double"


def alert_event_walk(ts: list[float], bad: list[bool], expiry: float,
                     alerted: bool = False,
                     last_alert: float = float("-inf")
                     ) -> tuple[list[str | None], bool, float]:
    """The shared sequential rule (one check, chronological): returns
    (per-evaluation event in {'alert','recovery',None}, final state).
    An 'alerted' state lapses after ``expiry`` seconds (the Redis key
    TTL), so a still-bad check re-alerts then."""
    events: list[str | None] = []
    for t, b in zip(ts, bad):
        live = alerted and (t < last_alert + expiry)
        if b and not live:
            events.append("alert")
            alerted, last_alert = True, float(t)
        elif (not b) and live:
            events.append("recovery")
            alerted = False
        else:
            events.append(None)
            if not b:
                alerted = False  # lapsed key + healthy check: clean slate
    return events, alerted, last_alert


def _fn(expiry: float):
    def walk(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        alerted, last_alert = (state.get if state.exists
                               else (False, float("-inf")))
        check = key[0]
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_epoch", kind="stable")
            ts = pdf["ts_epoch"].astype(float).tolist()
            bad = pdf["bad"].astype(bool).tolist()
            events, alerted, last_alert = alert_event_walk(
                ts, bad, expiry, alerted, last_alert)
            yield pd.DataFrame({"check_key": check, "ts_epoch": ts,
                                "bad": bad, "event": events})
        state.update((bool(alerted), float(last_alert)))

    return walk


def streaming_thunder_alerts(checks: DataFrame, expiry: float,
                             key: str = "check_key",
                             ts_col: str = "ts",
                             bad_col: str = "bad") -> DataFrame:
    """check-evaluation stream -> (check_key, ts_epoch, bad, event)
    with the alert-once/recovery/TTL state persisted across
    micro-batches."""
    from pyspark.sql import functions as F
    proj = checks.select(
        F.col(key).alias("check_key"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_epoch"),
        F.col(bad_col).alias("bad"))
    return proj.groupBy("check_key").applyInPandasWithState(
        _fn(expiry),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
