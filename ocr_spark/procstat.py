"""Hypervisor CPU-steal telemetry from /proc/stat.

Round-3 forensics showed hypervisor steal depressing wide-parallelism bench
legs by up to ~48% while narrow legs moved ~10% — a bad number is
uninterpretable without knowing how much CPU the host actually delivered
during the measurement. Every timed leg therefore samples aggregate
/proc/stat before and after and embeds the steal percentage in the emitted
JSON, so a regression can be adjudicated (plan change vs noisy neighbor)
from the artifact alone instead of a post-hoc forensic doc.

Fields of the aggregate ``cpu`` line (kernel doc order):
user nice system idle iowait irq softirq steal guest guest_nice.
Steal%% = delta(steal) / delta(sum of first 8 fields); guest time is
already folded into user/nice so it is excluded from the denominator.
"""

from __future__ import annotations

_STEAL_IDX = 7
_N_FIELDS = 8  # user..steal — the non-guest fields


def cpu_sample() -> list[int] | None:
    """Aggregate jiffy counters from the first /proc/stat line (None off-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return None
    if not parts or parts[0] != "cpu":
        return None
    return [int(x) for x in parts[1 : 1 + _N_FIELDS]]


def steal_pct(before: list[int] | None, after: list[int] | None) -> float | None:
    """Percentage of the interval's CPU jiffies stolen by the hypervisor."""
    if before is None or after is None:
        return None
    delta = [a - b for a, b in zip(after, before)]
    total = sum(delta)
    if total <= 0:
        return None
    return round(100.0 * delta[_STEAL_IDX] / total, 2)


class StealMeter:
    """Context-free sampler: ``m = StealMeter(); ...; m.pct()``."""

    def __init__(self) -> None:
        self._before = cpu_sample()

    def pct(self) -> float | None:
        return steal_pct(self._before, cpu_sample())
