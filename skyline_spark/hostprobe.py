"""Shared /proc/stat + /proc/loadavg probe for the bench and scaling
harnesses (bench.py, scripts/scaling_job.py).

Every timed sample in the per-round artifacts is bracketed by a probe
pair so "host phase" vs "engine change" is decidable from the artifact
alone: steal_pct > 0 or a load1 far above our own concurrency means a
co-tenant burst, not a plan regression.

Field layout of the aggregate cpu line (proc(5)): user nice system
idle iowait irq softirq steal guest guest_nice. guest/guest_nice
jiffies are ALREADY accounted inside user/nice on Linux, so the
percentage denominator excludes them — summing all ten would understate
user_pct/steal_pct whenever guest time is nonzero.
"""

from __future__ import annotations

__all__ = ["host_probe", "host_delta"]


def host_probe() -> dict:
    with open("/proc/stat") as f:
        jiffies = [int(x) for x in f.readline().split()[1:11]]
    with open("/proc/loadavg") as f:
        la = f.read().split()
    return {"jiffies": jiffies, "load1": float(la[0]),
            "load5": float(la[1])}


def host_delta(a: dict, b: dict) -> dict:
    d = [y - x for x, y in zip(a["jiffies"], b["jiffies"])]
    user, nice, system, idle, iowait, irq, softirq = d[:7]
    steal = d[7] if len(d) > 7 else 0
    # exclude guest/guest_nice (d[8:]) — double-counted inside user/nice
    tot = float(user + nice + system + idle + iowait + irq + softirq
                + steal) or 1.0
    return {
        "user_pct": round(100 * (user + nice) / tot, 1),
        "system_pct": round(100 * (system + irq + softirq) / tot, 1),
        "idle_pct": round(100 * idle / tot, 1),
        "iowait_pct": round(100 * iowait / tot, 1),
        "steal_pct": round(100 * steal / tot, 1),
        "load1_start": a["load1"], "load1_end": b["load1"],
    }
