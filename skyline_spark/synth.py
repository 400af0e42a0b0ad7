"""Deterministic synthetic transcripts generator (seed=42, pure function
of the seed — no wall clock).

Implements FIXTURES.md: the golden algorithm series
(/root/reference/tests/algorithms_test.py:42-60 — 86,401 points, 1 Hz,
value 1.0 except final 1000) plus the routing/exception fixture series,
all embedded as transcripts rows with the metric-event grammar inside
``text``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH0 = 1_700_000_000  # fixed base timestamp

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "exec", "db", "none"])


def _series_rows(conv_id: str, namespace: str, ts: np.ndarray,
                 values: np.ndarray, text_noise: bool = True) -> pd.DataFrame:
    n = ts.size
    turn_idx = np.arange(n, dtype=np.int32)
    role = ROLES[turn_idx % 3]
    tool = np.where(role == "tool",
                    TOOLS[(turn_idx + len(conv_id)) % 4], None)
    metric = f"{namespace}.turns.rate"
    # value formatting must be round-trippable: %.6f
    texts = [
        f"turn {i} of {conv_id} metric={metric} value={v:.6f} end"
        for i, v in zip(turn_idx, values)
    ]
    return pd.DataFrame({
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": texts,
        "tool": tool,
        "ts": pd.to_datetime(ts, unit="s", utc=True).tz_localize(None),
    })


def golden_series(n: int = 86401, resolution: int = 1
                  ) -> tuple[np.ndarray, np.ndarray]:
    """tests/algorithms_test.py:42-60."""
    ts = EPOCH0 - (n - 1) * resolution + np.arange(n, dtype=np.int64) * resolution
    values = np.ones(n)
    values[-1] = 1000.0
    return ts.astype(np.float64), values


def fixture_transcripts(seed: int = 42) -> pd.DataFrame:
    """The full routing-fixture table (FIXTURES.md §4). ``now`` is
    EPOCH0 == max(ts) across the table."""
    rng = np.random.RandomState(seed)
    frames: list[pd.DataFrame] = []

    # G1 golden anomalous, plain smtp namespace -> anomalous sink
    ts, v = golden_series()
    frames.append(_series_rows("conv-app.server-0001", "app.server", ts, v))

    # G2 golden anomalous, mirage namespace -> deferred sink
    frames.append(_series_rows("conv-stats.statsd-0002", "stats.statsd", ts, v))

    # N1 flat noise -> normal
    n = 7200
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    v = 100 + np.sin(np.arange(n) / 600) * 2 + rng.normal(0, 0.5, n)
    frames.append(_series_rows("conv-app.server-0003", "app.server", ts, v))

    # E1 too-short: 99 points
    n = 99
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    frames.append(_series_rows("conv-app.server-0004", "app.server", ts,
                               rng.normal(10, 1, n)))

    # E2 boring: 300 points, last 150 identical
    n = 300
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    v = np.concatenate([rng.normal(10, 1, n - 150), np.full(150, 5.0)])
    frames.append(_series_rows("conv-app.server-0005", "app.server", ts, v))

    # E3 stale: last ts = now - 501
    n = 2000
    ts = EPOCH0 - 501 - (n - 1) + np.arange(n, dtype=np.float64)
    frames.append(_series_rows("conv-app.server-0006", "app.server", ts,
                               rng.normal(10, 1, n)))

    # E4 empty: turns with no parsable metric events
    n = 50
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    e4 = _series_rows("conv-app.server-0007", "app.server", ts, np.zeros(n))
    e4["text"] = [f"free chat turn {i} with no events" for i in range(n)]
    frames.append(e4)

    # D1 counter with one reset; namespace flagged is_derivative
    n = 5000
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    increments = rng.poisson(5, n).astype(np.float64)
    counter = np.cumsum(increments)
    counter[2500:] = np.cumsum(increments[2500:])  # reset mid-way
    frames.append(_series_rows("conv-net.counters-0008", "net.counters", ts, counter))

    # U1 unordered + duplicated timestamps -> must equal its sorted twin
    n = 3000
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    v = 50 + rng.normal(0, 1, n)
    twin = _series_rows("conv-app.server-0009", "app.server", ts, v)
    frames.append(twin)
    shuffled = _series_rows("conv-app.server-0010", "app.server", ts, v)
    perm = rng.permutation(n)
    shuffled = shuffled.iloc[perm].reset_index(drop=True)
    shuffled["turn_idx"] = np.arange(n, dtype=np.int32)
    # duplicate two timestamps with different (later-turn) values — the
    # FIRST per ts must win (analyzer.py:575-581)
    dup = shuffled.iloc[:2].copy()
    dup["turn_idx"] = np.array([n, n + 1], dtype=np.int32)
    dup["text"] = dup["text"].str.replace(r"value=[-0-9.]+", "value=9999.000000",
                                          regex=True)
    frames.append(pd.concat([shuffled, dup], ignore_index=True))

    # V1 negatives: N1-like with golden-style spike AND negative values
    n = 7200
    ts = EPOCH0 - (n - 1) + np.arange(n, dtype=np.float64)
    v = np.ones(n)
    v[100:103] = -5.0
    v[-1] = 1000.0
    frames.append(_series_rows("conv-app.server-0011", "app.server", ts, v))

    out = pd.concat(frames, ignore_index=True)
    return out


def fixture_pipeline_config(**overrides):
    """PipelineConfig for the fixture table: the golden series
    (all-1s then 1000, reference tests/algorithms_test.py:42-60) is
    formally strictly-increasing, so the analyse_derivatives
    auto-detection would difference it — the reference's operator answer
    is NON_DERIVATIVE_MONOTONIC_METRICS, mirrored here."""
    from skyline_spark.config import PipelineConfig
    base = dict(non_derivative_metrics=(
        "app.server.turns.rate", "stats.statsd.turns.rate"))
    base.update(overrides)
    return PipelineConfig(**base)


def fixture_alert_config() -> pd.DataFrame:
    """FIXTURES.md §2 — mirrors the settings.ALERTS tuple schema
    (skyline/settings.py:1149-1177)."""
    rows = [
        # pattern, alerter, expiration, second_order_hours, is_derivative, custom_stale
        ("app.server", "smtp", 3600, None, False, None),
        ("stats.statsd", "smtp", 1800, 168, False, None),
        ("net.counters", "slack", 3600, None, True, None),
        ("db\\..*", "smtp", 7200, 168, False, 86400),
    ]
    return pd.DataFrame(rows, columns=[
        "namespace_pattern", "alerter", "expiration_time",
        "second_order_resolution_hours", "is_derivative",
        "custom_stale_period"])
