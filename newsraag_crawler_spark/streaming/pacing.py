"""R5 — crawl-cycle pacing (SURVEY.md §2.7).

The reference's resident loop sleeps ``CRAWL_INTERVAL_SECONDS −
cycle_duration`` between cycles and a day between cleanups
(`/root/reference/main.py:57-58,571-649`). In this engine a "cycle" is one
batch wave commit (operators.wave.run_crawl) — three deployment shapes:

1. **cron / external scheduler** around ``spark-submit`` (the production
   recommendation: a 3-hour cadence does not justify a resident driver);
2. **Structured Streaming** ``trigger(processingTime=...)`` on the frontier
   stream (streaming/frontier_stream.py) when the frontier arrives as a
   stream;
3. **resident batch driver** — this module: the reference-shaped
   sleep-the-remainder loop, with clock and sleep injectable so the pacing
   arithmetic is unit-testable without wall-clock time.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

CRAWL_INTERVAL_S = 10_800.0  # reference main.py:57
CLEANUP_INTERVAL_S = 86_400.0  # reference main.py:58


@dataclass(frozen=True)
class CyclePacing:
    cycle: int
    duration_s: float
    slept_s: float


def paced_cycles(
    run_cycle: Callable[[int], object],
    interval_s: float = CRAWL_INTERVAL_S,
    max_cycles: int = 1,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
) -> list[CyclePacing]:
    """Run ``run_cycle(i)`` every ``interval_s`` seconds, sleeping only the
    REMAINDER after each cycle's own duration (reference main.py:583-649:
    ``sleep(10800 − elapsed)``, floored at 0 when a cycle overruns).

    No sleep after the final cycle (the reference exits its loop the same
    way on single_cycle mode, main.py:577-580).
    """
    clock = clock or time.monotonic
    sleep = sleep or time.sleep
    out: list[CyclePacing] = []
    for i in range(max_cycles):
        t0 = clock()
        run_cycle(i)
        duration = clock() - t0
        remainder = max(interval_s - duration, 0.0)
        if i < max_cycles - 1:
            sleep(remainder)
            out.append(CyclePacing(i, duration, remainder))
        else:
            out.append(CyclePacing(i, duration, 0.0))
    return out
